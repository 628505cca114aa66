"""Unit tests for the in-kernel floatexp arithmetic layer
(ops/perturbation._rfe_*/_cfe_*): dd mantissa + i32 exponent ops that
power the non-Mandelbrot scaled-delta recurrences.  The helpers are
plain jnp expressions, so they run directly on the CPU backend here;
reference values come from mpmath at 80 bits.
"""
import numpy as np
import pytest
from mpmath import mp, mpf

from fractalrenderer_tpu.ops import perturbation as P

mp.prec = 80


def _mk(v, shape=(4, 8)):
    """Build a NORMALIZED rfe from a python float-ish value (exact via
    frexp; zeros get E_ZERO — the invariant every kernel-internal rfe
    carries, which the shared-exponent alignment relies on)."""
    import math

    m, e = math.frexp(v)
    hi = np.float32(m)
    lo = np.float32(m - float(hi))
    import jax.numpy as jnp

    return P._rfe_norm((jnp.full(shape, hi), jnp.full(shape, lo)),
                       jnp.full(shape, e, jnp.int32))


def _val(fe):
    (mh, ml), ex = fe
    h = np.asarray(mh).ravel()[0]
    lo = np.asarray(ml).ravel()[0]
    e = int(np.asarray(ex).ravel()[0])
    if e == P.E_ZERO:
        return mpf(0)
    return (mpf(float(h)) + mpf(float(lo))) * mpf(2) ** e


CASES = [1.5, -0.375, 3.141592653589793, 1e-60, -2.5e-100, 7e80, -1e-300]


@pytest.mark.parametrize("a", CASES)
@pytest.mark.parametrize("b", CASES)
def test_rfe_add_mul_match_mpmath(a, b):
    fa, fb = _mk(a), _mk(b)
    s = _val(P._rfe_add(fa, fb))
    m = _val(P._rfe_mul(fa, fb))
    ref_s = mpf(a) + mpf(b)
    ref_m = mpf(a) * mpf(b)
    # dd mantissa: ~47-bit relative accuracy; alignment flushes terms
    # >126 binary decades below the larger operand (far below dd noise)
    tol = mpf(2) ** -44
    assert abs(s - ref_s) <= tol * max(abs(mpf(a)), abs(mpf(b))), (a, b)
    assert ref_m == 0 or abs(m - ref_m) <= tol * abs(ref_m), (a, b)


def test_rfe_zero_and_select():
    import jax.numpy as jnp

    z = P._rfe_norm((jnp.zeros((2, 2)), jnp.zeros((2, 2))), jnp.int32(5))
    assert int(np.asarray(z[1]).ravel()[0]) == P.E_ZERO
    x = _mk(2.5, (2, 2))
    assert float(_val(P._rfe_add(x, z))) == 2.5
    assert _val(P._rfe_mul(x, z)) == 0
    sel = P._rfe_select(jnp.full((2, 2), True), x, z)
    assert float(_val(sel)) == 2.5
    assert float(_val(P._rfe_scale_pow2(x, 3))) == 20.0
    assert _val(P._rfe_scale_pow2(z, 3)) == 0  # E_ZERO absorbs


@pytest.mark.parametrize("ar,ai,br,bi", [
    (1.5, -0.25, 3.0, 2.0),
    (1e-50, 2e-50, 3e-49, -1e-50),
    (1e-200, 1.0, 1.0, 1e-200),
    (7e30, -2e30, 1e-30, 5e-31),
])
def test_cfe_complex_ops_match_mpmath(ar, ai, br, bi):
    fa = P._cfe_from_rr(_mk(ar), _mk(ai))
    fb = P._cfe_from_rr(_mk(br), _mk(bi))

    def cval(c):
        mr, mi, ex = c
        return (_val((mr, ex)), _val((mi, ex)))

    sr, si = cval(P._cfe_add(fa, fb))
    pr, pi = cval(P._cfe_mul(fa, fb))
    ref_sr, ref_si = mpf(ar) + mpf(br), mpf(ai) + mpf(bi)
    ref_pr = mpf(ar) * mpf(br) - mpf(ai) * mpf(bi)
    ref_pi = mpf(ar) * mpf(bi) + mpf(ai) * mpf(br)
    scale_s = max(abs(mpf(ar)), abs(mpf(ai)), abs(mpf(br)), abs(mpf(bi)))
    scale_p = max(abs(ref_pr), abs(ref_pi))
    tol = mpf(2) ** -43
    assert abs(sr - ref_sr) <= tol * scale_s
    assert abs(si - ref_si) <= tol * scale_s
    assert abs(pr - ref_pr) <= tol * scale_p
    assert abs(pi - ref_pi) <= tol * scale_p


def test_cfe_mag2_lt_across_scales():
    a = P._cfe_from_rr(_mk(1e-60), _mk(0.0))
    b = P._cfe_from_rr(_mk(2e-60), _mk(0.0))
    c = P._cfe_from_rr(_mk(1e-10), _mk(1e-10))
    assert bool(np.asarray(P._cfe_mag2_lt(a, b)).ravel()[0])
    assert not bool(np.asarray(P._cfe_mag2_lt(b, a)).ravel()[0])
    assert bool(np.asarray(P._cfe_mag2_lt(b, c)).ravel()[0])


def test_dd_sign_nonneg_uses_lo_part():
    import jax.numpy as jnp

    z = jnp.zeros((2, 2))
    pos = P._dd_sign_nonneg((z + 1.0, z))
    neg = P._dd_sign_nonneg((z - 1.0, z))
    tiny_neg = P._dd_sign_nonneg((z, z - 1e-30))
    tiny_pos = P._dd_sign_nonneg((z, z + 1e-30))
    assert bool(np.asarray(pos).all())
    assert not bool(np.asarray(neg).any())
    assert not bool(np.asarray(tiny_neg).any())
    assert bool(np.asarray(tiny_pos).all())
