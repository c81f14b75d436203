"""Per-iteration observability parity: show= tables and logger lines
(reference ``minres/minres.py:375-393``, ``lls/lsqr.py:168-174,406-434``,
``cg/cg.py:106-111,158``)."""

import logging
import re

import numpy as np
import pytest

import jax.numpy as jnp

import pykrylov_tpu as pk
from pykrylov_tpu.solvers.minres import minres, ISTOP_MSG as MINRES_MSG
from pykrylov_tpu.solvers.lsqr import lsqr, ISTOP_MSG as LSQR_MSG


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) * 0.1
    return a @ a.T + np.eye(n) * 3


def test_minres_show_table(capsys):
    n = 24
    a = _spd(n, 1)
    b = np.ones(n)
    res = minres(a, jnp.asarray(b), rtol=1e-10, show=True)
    outp = capsys.readouterr().out
    assert "Itn     x[0]     Compatible    LS" in outp
    assert "norm(A)  cond(A) gbar/|A|" in outp
    # one row per printed iteration: '     1  x.xxxxxe+00 ...'
    rows = [l for l in outp.splitlines()
            if re.match(r"\s+\d+ [ -]\d\.\d{5}e[+-]\d+", l)]
    assert len(rows) >= int(res.n_iter) - 1  # n<=40: all iterations print
    # final status block
    assert "istop   =" in outp and "Anorm   =" in outp
    assert "Arnorm  =" in outp
    assert MINRES_MSG[int(res.istop)] in outp


def test_minres_show_matches_info(capsys):
    n = 30
    a = _spd(n, 2)
    res = minres(a, jnp.ones(n), rtol=1e-8, show=True)
    outp = capsys.readouterr().out
    # the last table row's Anorm/Acond equal the result's final estimates
    assert ("%12.4e" % float(res.info["Anorm"])) in outp
    assert ("%12.4e" % float(res.info["Acond"])) in outp


def test_lsqr_show_table(capsys):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((40, 20))
    b = rng.standard_normal(40)
    res = lsqr(a, jnp.asarray(b), show=True)
    outp = capsys.readouterr().out
    assert "LSQR            Least-squares solution of  Ax = b" in outp
    assert "The matrix A has       40 rows and       20 cols" in outp
    assert "Itn      x(1)       r1norm     r2norm" in outp
    assert "LSQR finished" in outp
    assert "istop =" in outp and "xnorm  =" in outp
    assert LSQR_MSG[int(res.istop)] in outp
    # row 0 prints the pre-loop state (itn=0, x=0)
    assert re.search(r"^\s+0\s+0\.00000e\+00", outp, re.M)


def test_cg_compat_logger_lines():
    n = 32
    a = _spd(n, 4)
    rec = []

    class H(logging.Handler):
        def emit(self, r):
            rec.append(r.getMessage())

    lg = logging.getLogger("test-cg-show")
    lg.setLevel(logging.INFO)
    lg.addHandler(H())
    from pykrylov_tpu.compat import CG as CGClass
    solver = CGClass(pk.linop_from_ndarray(a, symmetric=True), logger=lg)
    solver.solve(np.ones(n))
    hdr = [l for l in rec if "Matvec" in l and "Curv" in l]
    assert hdr, rec
    rows = [l for l in rec if re.match(r"\s+\d+\s+\d\.\de[+-]\d\d\s+"
                                       r"[ -]\d\.\de[+-]\d\d", l)]
    assert len(rows) == solver.nIter
    # curvatures are positive for an SPD operator
    assert all(float(l.split()[2]) > 0 for l in rows)


def test_cg_null_logger_skips_replay():
    # with the default null logger no formatting work happens, but the
    # curvature telemetry is still recorded in the result
    n = 16
    a = _spd(n, 5)
    from pykrylov_tpu.compat import CG as CGClass
    solver = CGClass(pk.linop_from_ndarray(a, symmetric=True))
    res = solver.solve(np.ones(n))
    curv = np.asarray(res.info["curvatures"])
    nit = int(res.n_iter)
    assert np.all(np.isfinite(curv[1:nit + 1]))
    assert np.isnan(curv[0])


def test_lsmr_show_table(capsys):
    from pykrylov_tpu.solvers.lsmr import lsmr, ISTOP_MSG as LSMR_MSG
    rng = np.random.default_rng(6)
    a = rng.standard_normal((36, 18))
    b = rng.standard_normal(36)
    res = lsmr(a, jnp.asarray(b), show=True)
    outp = capsys.readouterr().out
    assert "LSMR            Least-squares solution of  Ax = b" in outp
    assert "norm r    norm Ar" in outp
    assert "LSMR finished" in outp
    assert LSMR_MSG[int(res.istop)] in outp
    assert "Estimated energy norm of x:" in outp
    # row 0 (pre-loop state) prints
    assert re.search(r"^\s+0\s+0\.00000e\+00", outp, re.M)


def test_craig_show_final_block(capsys):
    from pykrylov_tpu.solvers.craig import craig, ISTOP_MSG as CRAIG_MSG
    rng = np.random.default_rng(8)
    a = rng.standard_normal((20, 30))  # underdetermined, consistent
    b = a @ rng.standard_normal(30)
    res = craig(a, jnp.asarray(b), show=True)
    outp = capsys.readouterr().out
    assert "CRAIG           Least-squares solution of  Ax = b" in outp
    assert "CRAIG finished" in outp
    assert CRAIG_MSG[int(res.istop)] in outp
    assert "r1norm =" in outp and "r2norm =" in outp
