"""Double-double (two-float32) arithmetic for deep zoom.

TPU has no f64, so coordinates past f32 precision are carried as unevaluated
(hi, lo) f32 pairs — the same representation the reference's deep-zoom
shader uses (test_deep_zoom.comp:20-51), giving ~48 bits of mantissa.

The reference relies on GLSL fma for the product error (test_deep_zoom.comp:
40-47); TPU VPU ops are plain IEEE f32 mul/add without contraction inside
Pallas (verified empirically — kernels match numpy bit-for-bit), so the
product error term uses the Dekker/Veltkamp split instead.

All functions are backend-agnostic (xp = numpy or jax.numpy) and usable both
inside Pallas kernels and in plain jitted code.
"""
from __future__ import annotations

import math
from typing import Tuple

# Veltkamp split constant for f32: 2^12 + 1
_SPLIT = 4097.0


def f32(xp, v):
    return xp.asarray(v, dtype=xp.float32)


def two_sum(xp, a, b):
    """Knuth two-sum: a + b = s + err exactly (|err| <= ulp(s)/2)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def split(xp, a):
    """Veltkamp split of an f32 into 12+12-bit halves (hi + lo == a)."""
    c = f32(xp, _SPLIT) * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(xp, a, b):
    """a * b = p + err exactly, via Veltkamp/Dekker (no FMA needed)."""
    p = a * b
    ah, al = split(xp, a)
    bh, bl = split(xp, b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---------------------------------------------------------------------------
# dd scalar ops; a dd number is a tuple (hi, lo)
# ---------------------------------------------------------------------------

def dd_from_float(xp, v):
    return f32(xp, v), xp.zeros_like(f32(xp, v))


def _f32_round_fraction(frac) -> float:
    """Correctly-rounded (half-even) f32 of an exact Fraction.

    Routing through ``float(frac)`` first double-rounds: a value inside
    the f64 tie region of an f32 half-ulp boundary (needs > 53 bits to
    resolve) lands one f32 ulp off.  Rounding straight from the rational
    keeps hi canonical, so |lo| <= 0.5 ulp(hi) always holds."""
    import numpy as np
    from fractions import Fraction

    frac = Fraction(frac)
    if frac == 0:
        return 0.0
    sign = -1.0 if frac < 0 else 1.0
    m = abs(frac)
    k = m.numerator.bit_length() - m.denominator.bit_length()
    e = k if m >= Fraction(2) ** k else k - 1  # 2^e <= m < 2^(e+1)
    if e > 128:
        return float(np.float32(sign * np.inf))
    shift = (23 - e) if e >= -126 else 149  # subnormal grid at 2^-149
    scaled = m * (1 << shift) if shift >= 0 else m / (1 << -shift)
    n = scaled.numerator // scaled.denominator
    rem2 = 2 * (scaled - n)
    if rem2 > 1 or (rem2 == 1 and n % 2 == 1):
        n += 1
    # n <= 2^24, exactly representable in f64; scaling by a power of two
    # onto the f32 grid converts exactly
    return float(np.float32(sign * np.ldexp(np.float64(n), -shift)))


def dd_from_fraction(frac) -> Tuple[float, float]:
    """Exact rational → (hi, lo) f32 pair: hi is the correctly-rounded
    f32 of the value, lo the correctly-rounded f32 of the exact residual.
    The single split implementation behind dd_from_string/dd_from_double
    and the perturbation parameter packing."""
    import math
    from fractions import Fraction

    frac = Fraction(frac)
    hi = _f32_round_fraction(frac)
    if not math.isfinite(hi):
        return hi, 0.0
    lo = _f32_round_fraction(frac - Fraction(hi))
    return hi, lo


def dd_from_double(v: float) -> Tuple[float, float]:
    """Host-side split of a python double into f32 (hi, lo) — the packing
    the reference does on push constants (compute_effect_manager.h:247-261).
    v - hi is exact in f64 (Sterbenz), so this equals
    dd_from_fraction(Fraction(v)) bit-for-bit."""
    import numpy as np

    hi = np.float32(v)
    lo = np.float32(v - float(hi))
    return float(hi), float(lo)


def dd_from_string(s: str) -> Tuple[float, float]:
    """Decimal string → (hi, lo) with correct double-double rounding via
    integer arithmetic (beats going through one f64 when |s| has > 17
    significant digits)."""
    from fractions import Fraction

    return dd_from_fraction(Fraction(s))


def dd_add(xp, a, b):
    """(a_hi,a_lo) + (b_hi,b_lo) — matches dd_add_dd (test_deep_zoom.comp:30-38)."""
    ah, al = a
    bh, bl = b
    s = ah + bh
    v = s - ah
    t = ((bh - v) + (ah - (s - v))) + (al + bl)
    hi = s + t
    lo = t - (hi - s)
    return hi, lo


def dd_add_float(xp, a, b):
    """dd + f32 — matches dd_add_sf (test_deep_zoom.comp:20-28)."""
    ah, al = a
    t1 = ah + b
    e = t1 - ah
    t2 = ((b - e) + (ah - (t1 - e))) + al
    hi = t1 + t2
    lo = t2 - (hi - t1)
    return hi, lo


def dd_mul_float(xp, a, b):
    """dd * f32 — same structure as dd_mul_sf (test_deep_zoom.comp:40-47)
    with the fma error term replaced by a Dekker two-prod."""
    ah, al = a
    p, e = two_prod(xp, ah, b)
    lo = al * b + e
    hi = p + lo
    lo = lo - (hi - p)
    return hi, lo


def dd_mul(xp, a, b):
    """dd * dd (full product)."""
    ah, al = a
    bh, bl = b
    p, e = two_prod(xp, ah, bh)
    e = e + (ah * bl + al * bh)
    hi = p + e
    lo = e - (hi - p)
    return hi, lo


def dd_neg(xp, a):
    return -a[0], -a[1]

def dd_sub(xp, a, b):
    return dd_add(xp, a, dd_neg(xp, b))


def dd_to_float(xp, a):
    return a[0] + a[1]


# ---------------------------------------------------------------------------
# dd complex helpers for the dd escape kernel
# ---------------------------------------------------------------------------

def ddc_square_add(xp, zr, zi, cr, ci):
    """(zr + i zi)^2 + (cr + i ci) with every component a dd pair."""
    zr2 = dd_mul(xp, zr, zr)
    zi2 = dd_mul(xp, zi, zi)
    zrzi = dd_mul(xp, zr, zi)
    new_r = dd_add(xp, dd_sub(xp, zr2, zi2), cr)
    two_zrzi = (zrzi[0] * 2.0, zrzi[1] * 2.0)  # exact scale by 2
    new_i = dd_add(xp, two_zrzi, ci)
    return new_r, new_i


def ddc_mag2(xp, zr, zi):
    """|z|^2 as a plain f32 (enough for escape tests)."""
    return (zr[0] * zr[0] + zi[0] * zi[0]
            + 2.0 * (zr[0] * zr[1] + zi[0] * zi[1]))
