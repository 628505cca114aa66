"""Kernel-safe inverse-trig approximations.

Mosaic (Pallas TPU) lowers sin/cos/pow/log/exp/sqrt but not
atan/atan2/acos, which the Mandelbulb distance estimator needs
(mandelbulb.comp:101-102).  These are minimax-polynomial implementations
built only from lowerable ops, accurate to ~2e-7 absolute (float32-ulp
class) — verified against numpy in tests/test_mandelbulb.py.

Backend-agnostic (xp = numpy or jax.numpy inside or outside kernels).
"""
from __future__ import annotations

import math

_PI = math.pi
_PI_2 = math.pi / 2.0


def atan(xp, x):
    """arctan via 11-term odd minimax polynomial on [-1, 1] with the
    reciprocal range reduction atan(x) = π/2·sign(x) − atan(1/x)."""
    ax = xp.abs(x)
    inv = ax > 1.0
    t = xp.where(inv, 1.0 / xp.maximum(ax, 1e-38), ax)
    s = t * t
    # Remez coefficients for atan(t)/t on [0,1]
    p = xp.asarray(-0.0117212, dtype=x.dtype)
    p = p * s + 0.05265332
    p = p * s + -0.11643287
    p = p * s + 0.19354346
    p = p * s + -0.33262348
    p = p * s + 0.99997726
    r = t * p
    r = xp.where(inv, _PI_2 - r, r)
    return xp.where(x < 0, -r, r)


def atan2(xp, y, x):
    """Quadrant-correct arctan(y/x) matching numpy.arctan2 conventions
    (including x == 0 and y == 0 edges to within the approximation)."""
    # keep x's SIGN when clamping denormals: a negative-denormal x
    # flushed to +1e-38 would land in the wrong quadrant (off by pi)
    safe_x = xp.where(xp.abs(x) < 1e-38,
                      xp.where(x < 0, xp.full_like(x, -1e-38),
                               xp.full_like(x, 1e-38)), x)
    base = atan(xp, y / safe_x)
    # quadrant fixup
    add = xp.where(y >= 0, _PI, -_PI)
    r = xp.where(x < 0, base + add, base)
    # x == 0 exactly → ±π/2 (sign of y)
    x_zero = x == 0
    r = xp.where(x_zero & (y > 0), xp.full_like(r, _PI_2), r)
    r = xp.where(x_zero & (y < 0), xp.full_like(r, -_PI_2), r)
    r = xp.where(x_zero & (y == 0), xp.zeros_like(r), r)
    return r


def acos(xp, x):
    """arccos(x) = atan2(sqrt(1-x²), x) for x in [-1, 1]."""
    xc = xp.clip(x, -1.0, 1.0)
    s = xp.sqrt(xp.maximum(1.0 - xc * xc, 0.0))
    return atan2(xp, s, xc)
