"""Device-mesh construction helpers.

Thin wrappers over ``jax.make_mesh`` fixing this library's axis convention:
the system's row dimension is sharded over the ``"rows"`` axis.  On a TPU
slice the mesh rides ICI; across hosts, ``jax.distributed.initialize`` makes
all devices visible and the same calls produce a DCN-spanning mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, AxisType

__all__ = ["make_mesh", "default_mesh", "device_mesh_info", "ROW_AXIS"]

ROW_AXIS = "rows"


def make_mesh(n_devices=None, axis_name=ROW_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    Axes are ``Auto``-typed: sharding propagates through the unchanged
    solver jits and XLA inserts the collectives (newer JAX defaults to
    Explicit sharding-in-types, which would require annotating every
    intermediate in the solver loops).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError("requested %d devices, only %d available"
                         % (n_devices, len(devs)))
    return jax.make_mesh((n_devices,), (axis_name,),
                         axis_types=(AxisType.Auto,),
                         devices=devs[:n_devices])


def default_mesh() -> Mesh:
    return make_mesh()


def device_mesh_info(mesh: Mesh) -> dict:
    """Host-side summary used by benchmarks and logs."""
    return {
        "axis_names": tuple(mesh.axis_names),
        "shape": dict(mesh.shape),
        "n_devices": mesh.size,
        "platform": mesh.devices.ravel()[0].platform,
    }
