"""Reference import-path parity: every ``pykrylov.X`` import maps onto
``pykrylov_tpu.X`` (SURVEY §1 layer map)."""

import numpy as np
import jax.numpy as jnp


def test_reference_import_paths():
    from pykrylov_tpu.cg import CG
    from pykrylov_tpu.minres import Minres
    from pykrylov_tpu.symmlq import Symmlq
    from pykrylov_tpu.bicgstab import BiCGSTAB
    from pykrylov_tpu.cgs import CGS
    from pykrylov_tpu.tfqmr import TFQMR
    from pykrylov_tpu.lls import (LSQRFramework, LSMRFramework,
                                  CRAIGFramework, CRAIGMRFramework,
                                  symOrtho)
    from pykrylov_tpu.generic import KrylovMethod, null_log, SolveResult
    from pykrylov_tpu.linop import (LinearOperator, DiagonalOperator,
                                    BlockLinearOperator,
                                    InverseLBFGSOperator, ShapeError,
                                    linop_from_ndarray)
    from pykrylov_tpu.tools import (check_symmetric, machine_epsilon,
                                    roots_quadratic, allowed_types)
    from pykrylov_tpu.gallery import Poisson1dMatvec, Poisson2dMatvec

    for cls in (CG, Minres, Symmlq, BiCGSTAB, CGS, TFQMR,
                LSQRFramework, LSMRFramework, CRAIGFramework,
                CRAIGMRFramework):
        assert issubclass(cls, KrylovMethod)

    c, s, r = symOrtho(jnp.float64(3.0), jnp.float64(4.0))
    assert float(r) == 5.0


def test_top_level_surface():
    import pykrylov_tpu as pk
    assert callable(pk.solve)
    assert callable(pk.check_symmetric)
    for sub in ("solvers", "sparse", "parallel", "io", "gallery", "compat"):
        assert getattr(pk, sub) is not None
    assert hasattr(pk, "__version__")
    # Functional solver surface.
    for name in ("cg", "minres", "symmlq", "bicgstab", "cgs", "tfqmr",
                 "lsqr", "lsmr", "craig", "craigmr", "cg_pipelined",
                 "cg_solve"):
        assert callable(getattr(pk.solvers, name)), name
