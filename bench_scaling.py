"""Scaling evidence: weak-scaling CG over a device mesh + communication
volume accounting (BASELINE ">=75% weak-scaling efficiency").

Runs on whatever devices exist: a virtual 8-device CPU mesh by default
(the collectives are real; absolute times are not TPU times), or a real
slice with PYKRYLOV_REAL_MESH=1.  Writes one JSON report (stdout + file
given by --out) with:

  * weak-scaling curve: preconditioned halo-exchange CG on generated 3-D
    Poisson, fixed per-device load, 1..D devices — per-iteration time
    and efficiency vs 1 device;
  * communication accounting per matvec at each width: halo exchange
    volume (2·w·dtype per device) vs the generic all-gather volume, and
    the partition-time gather schedule's measured entries on a general
    matrix (jpwh_991 pattern) vs its all-gather fallback.

Usage: python bench_scaling.py [--out SCALING.json] [--scale N]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import jax as _jax
if not _os.environ.get("PYKRYLOV_REAL_MESH"):
    _jax.config.update("jax_platforms", "cpu")
    try:
        _jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass

import argparse
import json
import time

import numpy as np
import jax
import jnp_shim  # noqa: F401  (placeholder guard; removed below if absent)
