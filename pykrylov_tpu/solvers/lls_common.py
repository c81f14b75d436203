"""Shared plumbing for the least-squares (LLS) solver family.

The four LLS solvers (LSQR, LSMR, CRAIG, CRAIG-MR) all drive the same
Golub-Kahan bidiagonalization of A with optional *inner* preconditioners
M (on the m-side) and N (on the n-side):

    beta * M u = A v   - alpha * M u
    alpha * N v = A' u -  beta * N v

with M-weighted norms ``beta = sqrt(u' M u)`` and ``alpha = sqrt(v' N v)``
(reference: ``/root/reference/pykrylov/lls/lsqr.py:188-210,252-272`` and the
identical blocks in ``lsmr.py``, ``craig.py``, ``craigmr.py``).  This module
provides that step once, plus the stable Givens rotation ``sym_ortho``
(``lls/lsmr.py:500-519``), both as branch-free jnp code safe inside
``lax.while_loop``.

Note: M and N here act as *operators applying the inverse weight* (the
reference calls them as ``u = M(Mu)``), exactly like preconditioners.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import apply_op, apply_op_T

__all__ = ["sym_ortho", "gk_init", "gk_step"]


def sym_ortho(a, b):
    """Stable Givens rotation (c, s, r) with r = hypot(a, b).

    Branch-free version of the reference ``symOrtho``
    (``lls/lsmr.py:500-519``, after Choi's thesis), preserving its sign
    conventions: ``sign(0) == 1``.
    """
    dtype = jnp.result_type(a, b)
    one = jnp.ones((), dtype)

    def sign(x):
        return jnp.where(x < 0, -one, one)

    absa, absb = jnp.abs(a), jnp.abs(b)
    safe_a = jnp.where(a == 0, one, a)
    safe_b = jnp.where(b == 0, one, b)

    # |b| > |a| branch
    tau1 = a / safe_b
    s1 = sign(b) / jnp.sqrt(1 + tau1 * tau1)
    c1 = s1 * tau1
    r1 = b / s1
    # |a| >= |b| branch
    tau2 = b / safe_a
    c2 = sign(a) / jnp.sqrt(1 + tau2 * tau2)
    s2 = c2 * tau2
    r2 = a / c2

    big_b = absb > absa
    c = jnp.where(big_b, c1, c2)
    s = jnp.where(big_b, s1, s2)
    r = jnp.where(big_b, r1, r2)
    # a == 0 edge
    c = jnp.where(a == 0, jnp.zeros((), dtype), c)
    s = jnp.where(a == 0, sign(b), s)
    r = jnp.where(a == 0, absb, r)
    # b == 0 edge (takes precedence, as in the reference)
    c = jnp.where(b == 0, sign(a), c)
    s = jnp.where(b == 0, jnp.zeros((), dtype), s)
    r = jnp.where(b == 0, absa, r)
    return c, s, r


def _safe_div(a, d):
    return a / jnp.where(d == 0, jnp.ones((), jnp.result_type(d)), d)


def gk_init(A, b, M, N, n):
    """Initialize the bidiagonalization: ``beta M u = b, alpha N v = A'u``.

    Returns (u, Mu, v, Nv, alpha, beta).  When beta == 0 (zero rhs) or
    alpha == 0 (b orthogonal to range(A)) the vectors are left unnormalized,
    matching the reference's guarded normalizations (``lsqr.py:188-210``).
    """
    dtype = b.dtype
    Mu = b
    u = apply_op(M, Mu) if M is not None else Mu
    beta = jnp.sqrt(jnp.maximum(jnp.vdot(u, Mu).real.astype(dtype), 0))
    u = jnp.where(beta > 0, _safe_div(u, beta), u)
    Mu = jnp.where(beta > 0, _safe_div(Mu, beta), Mu)

    Nv = apply_op_T(A, u)
    v = apply_op(N, Nv) if N is not None else Nv
    alpha = jnp.sqrt(jnp.maximum(jnp.vdot(v, Nv).real.astype(dtype), 0))
    alpha = jnp.where(beta > 0, alpha, jnp.zeros((), dtype))
    v = jnp.where(alpha > 0, _safe_div(v, alpha), v)
    Nv = jnp.where(alpha > 0, _safe_div(Nv, alpha), Nv)
    return u, Mu, v, Nv, alpha, beta


def gk_step(A, M, N, v, Mu, Nv, alpha):
    """One bidiagonalization step; returns (u, Mu, v, Nv, alpha, beta).

    Mirrors the reference's guarded update (``lsqr.py:252-272``): when the
    new beta is zero the v/alpha update is skipped entirely and the old
    v, Nv are kept with alpha = 0 signalling termination upstream.
    """
    dtype = v.dtype
    Mu2 = apply_op(A, v) - alpha * Mu
    u2 = apply_op(M, Mu2) if M is not None else Mu2
    beta = jnp.sqrt(jnp.maximum(jnp.vdot(u2, Mu2).real.astype(dtype), 0))
    ok_b = beta > 0
    u2 = jnp.where(ok_b, _safe_div(u2, beta), u2)
    Mu2 = jnp.where(ok_b, _safe_div(Mu2, beta), Mu2)

    Nv2 = apply_op_T(A, u2) - beta * Nv
    v2 = apply_op(N, Nv2) if N is not None else Nv2
    alpha2 = jnp.sqrt(jnp.maximum(jnp.vdot(v2, Nv2).real.astype(dtype), 0))
    ok_a = ok_b & (alpha2 > 0)
    v2 = jnp.where(ok_a, _safe_div(v2, alpha2), v2)
    Nv2 = jnp.where(ok_a, _safe_div(Nv2, alpha2), Nv2)

    # If beta == 0 the reference leaves v/Nv/alpha untouched.
    v2 = jnp.where(ok_b, v2, v)
    Nv2 = jnp.where(ok_b, Nv2, Nv)
    alpha2 = jnp.where(ok_b, jnp.where(alpha2 > 0, alpha2,
                                       jnp.zeros((), dtype)),
                       alpha)
    return u2, Mu2, v2, Nv2, alpha2, beta
