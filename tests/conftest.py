"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference validates numerics in float64 (SURVEY §4); we enable x64 and
force the CPU backend with 8 virtual devices so sharding tests exercise real
multi-device meshes without TPU hardware.  The axon TPU plugin (when
present) force-selects itself via ``jax.config``, so we override *after*
importing jax.
"""

import os

_FLAG = "--xla_force_host_platform_device_count=8"
if "xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    # Append rather than setdefault: a pre-set XLA_FLAGS (sitecustomize,
    # user dump flags) must not silently drop the virtual device count.
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " "
                               + _FLAG).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
