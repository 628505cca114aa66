"""Perturbation deep-zoom Pallas kernel.

TPU port of shaders/test_deep_zoom.comp with two deliberate fixes over the
reference (BASELINE.json demands a *correct, glitch-free* render):

1. Index-consistent escape test.  The reference tests
   ``z_full = orbit[i] + dz_{i+1}`` (test_deep_zoom.comp:165), mixing orbit
   step i with delta step i+1; we test against ``orbit[i+1]``.
2. Glitch detection (Pauldelbrot criterion): a pixel whose full value
   collapses to ``|z|^2 < glitch_tol * |Z_ref|^2`` (i.e. ``|z| <
   sqrt(glitch_tol) * |Z_ref|`` — the default 1e-6 is the standard 1e-3
   magnitude threshold) has lost all relative precision and is flagged;
   the deep-zoom model re-renders flagged pixels against a secondary
   reference orbit (models/deep_zoom.py).  The reference shipped
   detection only in its unused shader (mandelbrot_deep_zoom.comp:253-259).

Coordinate mapping (test_deep_zoom.comp:117-143): uv = texel/size;
``pixel_size = zoom * 4/height`` (note: the deep-zoom view spans 4*zoom
vertically, unlike the other fractals' 1*zoom — faithful);
``dc = pixel_size * ((uv-0.5)*aspect, uv-0.5)`` in double-double;
``delta = float(dc)``.

The reference orbit is shared by every pixel and consumed sequentially, so
it lives in SMEM and each iteration broadcasts two scalar reads.

After the orbit is exhausted (reference escaped before max_iter), pixels
continue with plain f32 iteration from the current full z
(test_deep_zoom.comp:175-203).
"""
from __future__ import annotations

import functools
from fractions import Fraction
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd
from .pallas_utils import cdiv, default_interpret, pick_tile

# params vector layout (f32, SMEM).  Q_PSH/Q_PSL hold the per-pixel step
# zoom*4/map_height^2 as dd (pre-scaled by 2^s in scaled-delta mode, with s
# in Q_SEXP) — the kernel maps pixel -> delta-c as step * (col - w/2) so the
# mapping carries full dd precision instead of routing through f32 uv.
(Q_CXH, Q_CXL, Q_CYH, Q_CYL, Q_PSH, Q_PSL, Q_LIMIT, Q_BAIL2, Q_REFLEN,
 Q_GLITCH_TOL, Q_SHIFTXH, Q_SHIFTXL, Q_SHIFTYH, Q_SHIFTYL, Q_OFFX,
 Q_OFFY, Q_AR, Q_AI, Q_BR, Q_BI, Q_CR, Q_CI, Q_NSKIP, Q_ROW0,
 Q_ARL, Q_AIL, Q_BRL, Q_BIL, Q_CRL, Q_CIL, Q_SEXP, Q_M0, Q_FIRST,
 Q_Z0XH, Q_Z0XL, Q_Z0YH, Q_Z0YL, Q_PP, Q_RR, Q_SE0, Q_AROW0) = range(41)
NQ = 41

MAX_ORBIT_SMEM = 32768  # f32 pairs; 256 KB of SMEM
HBM_ROW_W = 128         # padded row width of the pre-chunked HBM orbit

# exponent sentinel for a zero floatexp mantissa (far below any real scale
# but safe from i32 overflow when doubled)
E_ZERO = -(1 << 24)


def _pow2(k):
    """2^k as f32 for integer k (flushes to 0 below 2^-126) via exponent-
    field construction — exact, unlike exp2's polynomial."""
    kc = jnp.clip(k, -126, 127)
    f = jax.lax.bitcast_convert_type(((kc + 127) << 23).astype(jnp.int32),
                                     jnp.float32)
    return jnp.where(k < -126, jnp.float32(0.0), f)


def _expo(x):
    """Floor(log2 |x|) of a normal f32 via its exponent field (-127 for 0)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return ((bits >> 23) & 0xFF) - 127


def _n_orbit_streams(dd_delta: bool, scaled: bool, julia: bool = False):
    """Orbit table streams: re/im hi (2), + lo parts for dd/floatexp (4),
    + per-entry drift exponents for julia-scaled (6)."""
    if scaled and julia:
        return 6
    return 4 if (dd_delta or scaled) else 2


def _state_comps(dd_delta: bool, scaled: bool, phoenix: bool = False):
    """Per-pixel delta-state component names for rebasing IO."""
    if scaled:
        base = ["mrh", "mrl", "mih", "mil", "ex"]
        return base + (["prh", "prl", "pih", "pil", "pex"] if phoenix
                       else [])
    if dd_delta:
        base = ["dzrh", "dzrl", "dzih", "dzil"]
        return base + (["pzrh", "pzrl", "pzih", "pzil"] if phoenix
                       else [])
    return ["dzr", "dzi"] + (["pzr", "pzi"] if phoenix else [])


# ---- floatexp arithmetic (dd mantissa + i32 exponent) ---------------------
# The value of a real floatexp ("rfe") x = (m, ex) is dd_value(m) * 2^ex;
# a complex floatexp ("cfe") (mr, mi, ex) shares one exponent between its
# components (normalized on max(|mr|,|mi|)).  Exponent E_ZERO marks an
# exact zero.  These power the scaled-delta recurrences of the non-
# Mandelbrot deep-zoom families, where diffabs/drift terms live at wildly
# different binary scales; the Mandelbrot path keeps its hand-aligned
# three-term update (fewer renormalizations).


def _rfe_norm(m, ex):
    """Renormalize: mantissa hi -> [1, 2) (or exact zero -> E_ZERO)."""
    zero = m[0] == 0.0
    k = jnp.where(zero, 0, _expo(m[0]))
    f = _pow2(-k)
    nex = jnp.where(zero, E_ZERO, jnp.clip(ex + k, E_ZERO, 1 << 24))
    return (m[0] * f, m[1] * f), nex


def _rfe_from_dd(hi, lo=None):
    if lo is None:
        lo = jnp.zeros_like(hi)
    return _rfe_norm((hi, lo), jnp.int32(0))


def _rfe_add(a, b):
    (ma, ea), (mb, eb) = a, b
    em = jnp.maximum(ea, eb)
    fa = _pow2(ea - em)
    fb = _pow2(eb - em)
    m = dd.dd_add(jnp, (ma[0] * fa, ma[1] * fa), (mb[0] * fb, mb[1] * fb))
    return _rfe_norm(m, em)


def _rfe_mul(a, b):
    (ma, ea), (mb, eb) = a, b
    return _rfe_norm(dd.dd_mul(jnp, ma, mb), ea + eb)


def _rfe_neg(a):
    m, ex = a
    return (-m[0], -m[1]), ex


def _rfe_scale_pow2(a, k):
    """Exact multiply by 2^k (E_ZERO stays absorbing)."""
    m, ex = a
    return m, jnp.where(ex == E_ZERO, ex, ex + k)


def _rfe_select(cond, a, b):
    (ma, ea), (mb, eb) = a, b
    return ((jnp.where(cond, ma[0], mb[0]), jnp.where(cond, ma[1], mb[1])),
            jnp.where(cond, ea, eb))


def _rfe_to_f32(a):
    m, ex = a
    return dd.dd_to_float(jnp, m) * _pow2(ex)


def _cfe_norm(mr, mi, ex):
    mag = jnp.maximum(jnp.abs(mr[0]), jnp.abs(mi[0]))
    zero = mag == 0.0
    k = jnp.where(zero, 0, _expo(mag))
    f = _pow2(-k)
    nex = jnp.where(zero, E_ZERO, jnp.clip(ex + k, E_ZERO, 1 << 24))
    return (mr[0] * f, mr[1] * f), (mi[0] * f, mi[1] * f), nex


def _cfe_from_rr(x, y):
    """Join two real floatexps into one complex floatexp (shared exp)."""
    (mx, ex_), (my, ey) = x, y
    em = jnp.maximum(ex_, ey)
    fx = _pow2(ex_ - em)
    fy = _pow2(ey - em)
    return _cfe_norm((mx[0] * fx, mx[1] * fx), (my[0] * fy, my[1] * fy), em)


def _cfe_add(a, b):
    ar, ai, ea = a
    br, bi, eb = b
    em = jnp.maximum(ea, eb)
    fa = _pow2(ea - em)
    fb = _pow2(eb - em)
    mr = dd.dd_add(jnp, (ar[0] * fa, ar[1] * fa), (br[0] * fb, br[1] * fb))
    mi = dd.dd_add(jnp, (ai[0] * fa, ai[1] * fa), (bi[0] * fb, bi[1] * fb))
    return _cfe_norm(mr, mi, em)


def _cfe_mul(a, b):
    ar, ai, ea = a
    br, bi, eb = b
    mr = dd.dd_sub(jnp, dd.dd_mul(jnp, ar, br), dd.dd_mul(jnp, ai, bi))
    mi = dd.dd_add(jnp, dd.dd_mul(jnp, ar, bi), dd.dd_mul(jnp, ai, br))
    return _cfe_norm(mr, mi, ea + eb)


def _cfe_mag2_lt(a, b):
    """|a|^2 < |b|^2 for complex floatexps (hi-mantissa precision)."""
    ar, ai, ea = a
    br, bi, eb = b
    ma = ar[0] * ar[0] + ai[0] * ai[0]
    mb = br[0] * br[0] + bi[0] * bi[0]
    em = jnp.maximum(ea, eb)
    return ma * _pow2(2 * (ea - em)) < mb * _pow2(2 * (eb - em))


def _diffabs(xp, X, d):
    """|X+d| - |X| by sign cases (exact; the Burning Ship perturbation's
    key primitive)."""
    s = X + d
    return xp.where(X >= 0, xp.where(s >= 0, d, -(2.0 * X + d)),
                    xp.where(s >= 0, 2.0 * X + d, -d))


def _dd_sign_nonneg(v):
    """Sign of a dd value at full dd accuracy: the hi part decides unless
    it is exactly 0, then the lo part does (dd invariant: |lo| <= ulp(hi)/2,
    so a nonzero hi always dominates).  Boolean algebra, not a select —
    Mosaic cannot lower arith.select on i1 vectors."""
    return (v[0] > 0.0) | ((v[0] == 0.0) & (v[1] >= 0.0))


def _dd_diffabs(X, d):
    """dd |X+d| - |X|: the four case values are d, -(2X+d), 2X+d, -d.

    The branch selection decides the signs of X and X+d at FULL dd
    accuracy (previously f32 hi sums, wrong whenever |X+d| fell within
    f32 rounding of 0 — injecting ~1e-7·|X| absolute).  Note the armada
    dust residual is NOT driven by this: it is Lyapunov amplification of
    the dd/f64 precision floors, proven precision-bound in
    docs/DESIGN.md §8 — this fix is kept for being strictly more
    correct."""
    t = dd.dd_add(jnp, (X[0] * 2.0, X[1] * 2.0), d)
    s = dd.dd_add(jnp, X, d)
    xpos = _dd_sign_nonneg(X)
    spos = _dd_sign_nonneg(s)
    hi = jnp.where(xpos, jnp.where(spos, d[0], -t[0]),
                   jnp.where(spos, t[0], -d[0]))
    lo = jnp.where(xpos, jnp.where(spos, d[1], -t[1]),
                   jnp.where(spos, t[1], -d[1]))
    return hi, lo


def _make_kernel(width: int, height: int, map_height: int,
                 tile: Tuple[int, int], chunk: int,
                 float_continuation: bool, dd_delta: bool = False,
                 orbit_hbm: bool = False,
                 scaled: bool = False, rebase: bool = False,
                 julia: bool = False, ship: bool = False,
                 phoenix: bool = False, aa_stack=None,
                 inkernel_rounds: int = 0, track_err: bool = False):
    """``julia=True`` iterates the JULIA perturbation dz <- 2*Z*dz + dz^2
    (no +dc term — c is a shared constant; the reference orbit starts at
    the view center z0 instead of 0).  The orbit tables hold the DRIFT
    D_i = Z_i - Z_0 (host-computed in fixed point, so tiny drifts near a
    periodic start keep full precision); the kernel reconstructs
    Z = Z_0 + D in dd, rebasing assigns dz <- D + dz (cancellation-free)
    and the Zhuoran test compares |D + dz| against |dz|.  Beyond the
    reference, which only deep-zooms the Mandelbrot set.  Requires rebase
    mode; the f32/dd tiers only (zoom >= ~1e-25 — D's f32 hi/lo floor)."""

    """``dd_delta=True`` iterates the perturbation delta in double-double
    (two-f32) instead of plain f32 — f64-class mantissa for the delta, used
    in the QUAD precision mode (zoom < 1e-14).  ~6x the per-iteration cost;
    escape/glitch tests remain f32 on the composed z_full, which is all the
    coloring consumes.

    ``scaled=True`` (ARBITRARY mode, zoom < 1e-30) carries the delta as
    floatexp: dd mantissa + per-pixel i32 exponent, with delta-c pre-scaled
    by 2^s host-side.  This breaks the f32 exponent floor (~1e-38 absolute)
    entirely — depth is bounded only by the i32 exponent, i.e. ~1e-2500000.
    The recurrence dz <- 2*Z*dz + dz^2 + dc aligns the three terms to the
    max exponent with exact power-of-two factors (terms more than 2^126
    below the max flush to zero — far under the dd noise floor).

    ``rebase=True`` runs ONE PASS of Zhuoran-style per-pixel rebasing: a
    lane whose full value drops below its delta (|z| < |dz|), or that
    outlives the reference orbit with iteration budget left, freezes with
    delta <- z_full (dd-accurate) and raises a ``want`` flag; the caller
    (_pert_rebase_call) loops passes — every pass restarts flagged lanes
    at orbit index 0 (Z_0 = 0 for the critical orbit) — until no lane
    wants another.  One reference orbit serves the whole image with no
    glitches by construction; Pauldelbrot detection and float continuation
    are superseded (kernel inputs carry per-pixel live/nf/z/delta state;
    params[Q_M0] is the pass's starting orbit index: 1 first, 0 after).

    ``inkernel_rounds > 0`` (with rebase) moves the pass loop INSIDE the
    kernel: each tile runs its own rounds over the in-VMEM state until no
    lane wants a rebase (capped at inkernel_rounds), so finished tiles
    never re-enter and the per-pass full-grid rescan disappears — the
    multi-pass form spent 78% of config-4's device time re-scanning
    (371 ms pass 1, 1348 ms for 100 continuation passes of mostly
    per-tile setup).  No per-pixel state planes cross HBM: the call takes
    no state inputs and outputs (n, zx, zy, glitch, want, rounds); each
    lane's iteration sequence is bit-identical to the multi-pass form
    (round restart = the pass-2+ state0 carryover with i reset to 0)."""
    assert julia + ship + phoenix <= 1, \
        "julia/ship/phoenix are mutually exclusive families"
    assert not (julia or ship or phoenix) or rebase, \
        "the non-Mandelbrot deep-zoom families require rebase mode"
    # track_err: per-pixel absolute-error ledger (log2 domain) for the
    # Burning Ship dust tiers (dd and scaled/floatexp) — the carried delta
    # error amplifies by the local Jacobian ~2|z| per step (DESIGN.md §8's
    # Lyapunov trace); lanes whose ledger crosses the suspect threshold
    # re-render via the exact per-pixel HP fallback (models/deep_zoom
    # exact_dust).
    assert not track_err or (ship and (dd_delta or scaled) and rebase
                             and inkernel_rounds), \
        "track_err is the ship dd/scaled-tier in-kernel error ledger"
    th, tw = tile
    n_streams = _n_orbit_streams(dd_delta, scaled, julia)
    comps = _state_comps(dd_delta, scaled, phoenix)

    def kernel(params_ref, orbit_re_ref, orbit_im_ref, orbit_mag2_ref,
               orbit_re_lo_ref, orbit_im_lo_ref, orbit_re_ex_ref,
               orbit_im_ex_ref, *rest):
        if rebase and inkernel_rounds:
            # self-contained: no state inputs, rounds plane instead of the
            # nf/comps feedback outputs (+ the error-ledger plane when
            # track_err)
            n_fixed = 7 if track_err else 6
            (n_ref, zx_ref, zy_ref, glitch_ref, want_ref,
             rounds_ref, *err_out) = rest[:n_fixed]
            scratch = rest[n_fixed:]
        elif rebase:
            n_in = 4 + len(comps)  # live, nf, zfr, zfi, delta comps
            st_refs = rest[:n_in]
            out_refs = rest[n_in:n_in + 6 + len(comps)]
            scratch = rest[n_in + 6 + len(comps):]
            (n_ref, zx_ref, zy_ref, glitch_ref, want_ref,
             nf_ref, *comp_refs) = out_refs
        else:
            n_ref, zx_ref, zy_ref, glitch_ref = rest[:4]
            scratch = rest[4:]
        if orbit_hbm:
            # scratch: DOUBLE-BUFFERED per-stream SMEM row buffers + DMA
            # semaphores (2 slots x n_streams).  The orbit lives in HBM
            # pre-chunked into overlapping rows (row j = orbit[j*chunk :
            # j*chunk + chunk + 1], padded to a lane-friendly width) so
            # each round DMAs one row with a dynamic *leading* index — the
            # slice pattern Mosaic supports.  The iteration loop unrolls
            # two rounds per step so buffer parity is static: row j+1
            # prefetches into slot 1 while slot 0 computes, and vice versa
            # — the DMA latency hides behind the chunk compute.
            bufs = (scratch[:n_streams], scratch[n_streams:2 * n_streams])
            sems = scratch[2 * n_streams]
            hbm_srcs = [orbit_re_ref, orbit_im_ref,
                        orbit_re_lo_ref, orbit_im_lo_ref,
                        orbit_re_ex_ref, orbit_im_ex_ref][:n_streams]
            n_rows_tab = orbit_re_ref.shape[0]

            def _copies(j, slot):
                jc = jnp.minimum(j, n_rows_tab - 1)
                return [pltpu.make_async_copy(src.at[pl.ds(jc, 1)], dst,
                                              sems.at[slot, k])
                        for k, (src, dst) in enumerate(zip(hbm_srcs,
                                                           bufs[slot]))]

            def dma_start(j, slot):
                for c in _copies(j, slot):
                    c.start()

            def dma_wait(j, slot):
                for c in _copies(j, slot):
                    c.wait()

            def dma_sync(i0):
                j = jnp.minimum(i0 // chunk, n_rows_tab - 1)
                dma_start(j, 0)
                dma_wait(j, 0)
                return j * chunk

            def _make_rd(slot):
                b = bufs[slot]
                rd = {"re": lambda i, base: b[0][0, i - base],
                      "im": lambda i, base: b[1][0, i - base]}
                if n_streams >= 4:
                    rd["rel"] = lambda i, base: b[2][0, i - base]
                    rd["iml"] = lambda i, base: b[3][0, i - base]
                if n_streams >= 6:  # julia-scaled per-entry drift exponents
                    rd["reex"] = lambda i, base: b[4][0, i - base]
                    rd["imex"] = lambda i, base: b[5][0, i - base]
                rd["mag2"] = lambda i, base: (
                    rd["re"](i, base) * rd["re"](i, base)
                    + rd["im"](i, base) * rd["im"](i, base))
                return rd

            rd0, rd1 = _make_rd(0), _make_rd(1)
        else:
            def dma_sync(i0):
                return jnp.int32(0)

            rd0 = {"re": lambda i, base: orbit_re_ref[i],
                   "im": lambda i, base: orbit_im_ref[i],
                   "rel": lambda i, base: orbit_re_lo_ref[i],
                   "iml": lambda i, base: orbit_im_lo_ref[i],
                   "reex": lambda i, base: orbit_re_ex_ref[i],
                   "imex": lambda i, base: orbit_im_ex_ref[i],
                   "mag2": lambda i, base: orbit_mag2_ref[i]}
            rd1 = rd0
        tj = pl.program_id(1)
        ti = pl.program_id(0)
        row0 = params_ref[0, Q_ROW0].astype(jnp.int32)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                + ti * th + row0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tj * tw
        in_bounds = (rows < map_height) & (cols < width) \
            & (rows - row0 < height)
        if aa_stack is not None:
            # Supersampling folded into ONE kernel call: the map stacks
            # spp^2 segments of the logical image (or of a row band of
            # it) vertically, each padded to the tile height so a tile
            # never straddles segments and the segment index is a
            # per-tile SCALAR.  The subpixel offset is derived
            # arithmetically from the segment (exact dyadic floats for
            # power-of-two spp, so each segment's pixel mapping is
            # bit-identical to a sequential render with that offset).
            # aa_h is the segment's logical row count (the band height);
            # full_h is the full image height behind the pixel mapping,
            # with the band's global first row in Q_AROW0 (traced, so
            # every band of a giant shares one executable).
            spp, seg_h, aa_h, full_h = aa_stack
            seg = (ti * th + row0) // seg_h
            row_in = rows - seg * seg_h
            in_bounds = in_bounds & (row_in < aa_h)

        limit = params_ref[0, Q_LIMIT].astype(jnp.int32)
        limit_f = params_ref[0, Q_LIMIT]
        bail2 = params_ref[0, Q_BAIL2]
        ref_len = params_ref[0, Q_REFLEN].astype(jnp.int32)
        glitch_tol = params_ref[0, Q_GLITCH_TOL]

        # --- per-pixel delta c in double-double (comp:117-143) ----------
        # dc = (zoom*4/h) * (uv-0.5)*aspect algebraically equals
        # step * (col + off - w/2) with step = zoom*4/h^2 (host-computed in
        # exact rational arithmetic): (col - w/2) is exact in f32 for any
        # image <= 16k wide, so the mapping carries full dd precision —
        # routing through f32 uv as the reference shader does costs ~1e-7
        # relative error on dc, which flips boundary iteration counts.
        step = (params_ref[0, Q_PSH], params_ref[0, Q_PSL])
        half_w = jnp.float32(width * 0.5)
        if aa_stack is not None:
            offx = (seg % spp).astype(jnp.float32) / jnp.float32(spp)
            offy = (seg // spp).astype(jnp.float32) / jnp.float32(spp)
            nx = (cols.astype(jnp.float32) - half_w) + offx
            # (row_in + band_row0) is an exact-integer f32 sum, so the
            # banded mapping is bit-identical to a full-image render's
            # row arithmetic (band_row0 = 0.0 adds exactly nothing)
            ny = (row_in.astype(jnp.float32) + params_ref[0, Q_AROW0]
                  - jnp.float32(full_h * 0.5)) + offy
        else:
            half_h = jnp.float32(map_height * 0.5)
            nx = (cols.astype(jnp.float32) - half_w) + params_ref[0, Q_OFFX]
            ny = (rows.astype(jnp.float32) - half_h) + params_ref[0, Q_OFFY]
        dcx = dd.dd_mul_float(jnp, step, nx)
        dcy = dd.dd_mul_float(jnp, step, ny)
        # secondary-reference shift: delta relative to the re-centered orbit
        shift_x = (params_ref[0, Q_SHIFTXH], params_ref[0, Q_SHIFTXL])
        shift_y = (params_ref[0, Q_SHIFTYH], params_ref[0, Q_SHIFTYL])
        bs = jnp.broadcast_to
        dcx = dd.dd_add(jnp, dcx, (bs(shift_x[0], (th, tw)),
                                   bs(shift_x[1], (th, tw))))
        dcy = dd.dd_add(jnp, dcy, (bs(shift_y[0], (th, tw)),
                                   bs(shift_y[1], (th, tw))))
        delta_r = dd.dd_to_float(jnp, dcx)
        delta_i = dd.dd_to_float(jnp, dcy)
        s_exp = params_ref[0, Q_SEXP].astype(jnp.int32)  # scaled mode only
        # julia reference start Z_0 (0 for Mandelbrot's critical orbit)
        z0x_h, z0x_l = params_ref[0, Q_Z0XH], params_ref[0, Q_Z0XL]
        z0y_h, z0y_l = params_ref[0, Q_Z0YH], params_ref[0, Q_Z0YL]
        pp_ = params_ref[0, Q_PP]  # phoenix recurrence coefficients
        rr_ = params_ref[0, Q_RR]

        if scaled and ship:
            # true delta-c as real floatexps (mantissa = dc*2^s, exp -s)
            dc_fe_x = _rfe_norm(dcx, -s_exp)
            dc_fe_y = _rfe_norm(dcy, -s_exp)

        # full c in f32 for the float-continuation phase (comp:139-141)
        cx_dd = dd.dd_add(jnp, (params_ref[0, Q_CXH], params_ref[0, Q_CXL]),
                          dcx)
        cy_dd = dd.dd_add(jnp, (params_ref[0, Q_CYH], params_ref[0, Q_CYL]),
                          dcy)
        c_r = dd.dd_to_float(jnp, cx_dd)
        c_i = dd.dd_to_float(jnp, cy_dd)

        # --- phase 1: perturbation against the reference orbit ----------
        # Initial state via the series approximation
        # δ_{n0} = ((C·δc + B)·δc + A)·δc  (deepzoom/series.py); the default
        # coefficients A=1, B=C=0, n0=1 reduce exactly to the peeled
        # update 0 of the plain path (δ_1 = δc).
        n0 = params_ref[0, Q_NSKIP].astype(jnp.int32)
        if rebase and not inkernel_rounds:
            # pass-local starting orbit index: the first pass starts at the
            # series-skip index (the caller feeds Q_NSKIP into Q_M0),
            # rebased lanes restart at 0 on later passes (in-kernel rounds
            # read Q_NSKIP directly — round 2+ resets i itself)
            n0 = params_ref[0, Q_M0].astype(jnp.int32)
        ar, ai = params_ref[0, Q_AR], params_ref[0, Q_AI]
        br, bi = params_ref[0, Q_BR], params_ref[0, Q_BI]
        cr3, ci3 = params_ref[0, Q_CR], params_ref[0, Q_CI]
        # horner accumulator (hr/hi, NOT tr/ti: `ti` is the tile-row
        # program id above and must stay visible to later tile logic)
        hr, hi = cr3, ci3
        hr, hi = (hr * delta_r - hi * delta_i + br,
                  hr * delta_i + hi * delta_r + bi)
        hr, hi = (hr * delta_r - hi * delta_i + ar,
                  hr * delta_i + hi * delta_r + ai)
        dz0r = hr * delta_r - hi * delta_i
        dz0i = hr * delta_i + hi * delta_r
        # In rebase mode the iteration budget is tracked per pixel (nf),
        # not by the shared index, so the orbit range is the only cap.
        pert_end = (ref_len - 1) if rebase \
            else jnp.minimum(limit, ref_len - 1)
        if dd_delta or scaled:
            # series init in dd: horner with dd coefficients over dd delta-c
            # (scaled mode: the horner runs over the host-scaled dc mantissa
            # with coefficients pre-aligned to exponent Q_SE0 — the default
            # A'=1, B'=C'=0, e0=-s reduces exactly to delta_1 = dc·2^-s)
            a_dd = ((params_ref[0, Q_AR], params_ref[0, Q_ARL]),
                    (params_ref[0, Q_AI], params_ref[0, Q_AIL]))
            b_dd = ((params_ref[0, Q_BR], params_ref[0, Q_BRL]),
                    (params_ref[0, Q_BI], params_ref[0, Q_BIL]))
            c_dd = ((params_ref[0, Q_CR], params_ref[0, Q_CRL]),
                    (params_ref[0, Q_CI], params_ref[0, Q_CIL]))
            bt = lambda v: (jnp.broadcast_to(v[0], (th, tw)),
                            jnp.broadcast_to(v[1], (th, tw)))

            def cmul_dd(ar, ai, br, bi):
                rr = dd.dd_sub(jnp, dd.dd_mul(jnp, ar, br),
                               dd.dd_mul(jnp, ai, bi))
                ri = dd.dd_add(jnp, dd.dd_mul(jnp, ar, bi),
                               dd.dd_mul(jnp, ai, br))
                return rr, ri

            tr_dd, ti_dd = bt(c_dd[0]), bt(c_dd[1])
            tr_dd, ti_dd = cmul_dd(tr_dd, ti_dd, dcx, dcy)
            tr_dd = dd.dd_add(jnp, tr_dd, bt(b_dd[0]))
            ti_dd = dd.dd_add(jnp, ti_dd, bt(b_dd[1]))
            tr_dd, ti_dd = cmul_dd(tr_dd, ti_dd, dcx, dcy)
            tr_dd = dd.dd_add(jnp, tr_dd, bt(a_dd[0]))
            ti_dd = dd.dd_add(jnp, ti_dd, bt(a_dd[1]))
            dz0r_dd, dz0i_dd = cmul_dd(tr_dd, ti_dd, dcx, dcy)
        if scaled:
            # floatexp init: the dd horner value sits at exponent Q_SE0
            # (host-aligned); renormalize per-pixel into mantissa +
            # exponent exactly as the iteration loop does.  Composed f32
            # delta flushes to 0 below 2^-126: z1 ~= Z_{n0}.
            mag0 = jnp.maximum(jnp.abs(dz0r_dd[0]), jnp.abs(dz0i_dd[0]))
            zero0 = mag0 == 0.0
            k0 = jnp.where(zero0, 0, _expo(mag0))
            fN0 = _pow2(-k0)
            m0r = (dz0r_dd[0] * fN0, dz0r_dd[1] * fN0)
            m0i = (dz0i_dd[0] * fN0, dz0i_dd[1] * fN0)
            e0_ = params_ref[0, Q_SE0].astype(jnp.int32)
            ex0 = jnp.where(zero0, E_ZERO,
                            jnp.clip(e0_ + k0, E_ZERO, 1 << 24))
            dfac0 = _pow2(ex0)
            dz0r = dd.dd_to_float(jnp, m0r) * dfac0
            dz0i = dd.dd_to_float(jnp, m0i) * dfac0
        elif dd_delta:
            dz0r = dd.dd_to_float(jnp, dz0r_dd)
            dz0i = dd.dd_to_float(jnp, dz0i_dd)
        base0 = dma_sync(n0)
        if julia and scaled:
            # drift tables hold floatexp D; compose D_{n0} + dz_0 (both
            # tiny) in floatexp before adding the O(1) Z_0 (broadcast:
            # Mosaic's bitcast lowering needs vectors)
            bv0 = lambda v: jnp.broadcast_to(v, (th, tw))
            Dr0 = _rfe_norm((bv0(rd0["re"](n0, base0)),
                             bv0(rd0["rel"](n0, base0))),
                            bv0(rd0["reex"](n0, base0).astype(jnp.int32)))
            Di0 = _rfe_norm((bv0(rd0["im"](n0, base0)),
                             bv0(rd0["iml"](n0, base0))),
                            bv0(rd0["imex"](n0, base0).astype(jnp.int32)))
            z1r = z0x_h + (z0x_l + _rfe_to_f32(
                _rfe_add(Dr0, ((m0r[0], m0r[1]), ex0))))
            z1i = z0y_h + (z0y_l + _rfe_to_f32(
                _rfe_add(Di0, ((m0i[0], m0i[1]), ex0))))
        elif julia:  # z_0 = Z_0 + D_{n0} + dz_0 (tables hold the drift D)
            z1r = z0x_h + (z0x_l + (rd0["re"](n0, base0) + dz0r))
            z1i = z0y_h + (z0y_l + (rd0["im"](n0, base0) + dz0i))
        else:
            z1r = rd0["re"](n0, base0) + dz0r
            z1i = rd0["im"](n0, base0) + dz0i
        big = jnp.float32(3.4e38)
        state0 = {
            "zfr": jnp.where(in_bounds, z1r, big),
            "zfi": jnp.where(in_bounds, z1i, jnp.float32(0.0)),
            "nf": jnp.full((th, tw), (n0 - 1).astype(jnp.float32),
                           jnp.float32),
            "glitch": jnp.zeros((th, tw), jnp.float32),
            "i": n0,
        }
        if scaled:
            state0["mrh"], state0["mrl"] = m0r
            state0["mih"], state0["mil"] = m0i
            state0["ex"] = ex0
            if phoenix:  # delta_prev_1 = z_0 - Z_0 = 0
                z_ = jnp.zeros((th, tw), jnp.float32)
                state0["prh"] = state0["prl"] = z_
                state0["pih"] = state0["pil"] = z_
                state0["pex"] = jnp.full((th, tw), E_ZERO, jnp.int32)
            if track_err:
                dmag0 = 0.5 * jnp.log2(jnp.maximum(
                    m0r[0] * m0r[0] + m0i[0] * m0i[0],
                    jnp.float32(1e-76)))
                ex0b = jnp.broadcast_to(ex0, (th, tw))
                state0["errx"] = jnp.where(
                    in_bounds & (ex0b != E_ZERO),
                    dmag0 + ex0b.astype(jnp.float32) - 48.0,
                    jnp.float32(-200.0))
        elif dd_delta:
            state0["dzrh"], state0["dzrl"] = dz0r_dd
            state0["dzih"], state0["dzil"] = dz0i_dd
            if phoenix:  # delta_prev_1 = z_0 - Z_0 = 0
                z_ = jnp.zeros((th, tw), jnp.float32)
                state0["pzrh"] = state0["pzrl"] = z_
                state0["pzih"] = state0["pzil"] = z_
            if track_err:
                # ledger starts at the dd compose floor: 2^-48 relative
                # rounding on the initial delta
                state0["errx"] = jnp.where(
                    in_bounds,
                    0.5 * jnp.log2(jnp.maximum(
                        dz0r_dd[0] * dz0r_dd[0] + dz0i_dd[0] * dz0i_dd[0],
                        jnp.float32(1e-76))) - 48.0,
                    jnp.float32(-200.0))
        else:
            state0["dzr"] = dz0r
            state0["dzi"] = dz0i
            if phoenix:
                z_ = jnp.zeros((th, tw), jnp.float32)
                state0["pzr"] = z_
                state0["pzi"] = z_
        if rebase and inkernel_rounds:
            # round 1 starts every in-bounds lane; rounds 2+ revive want
            # lanes in-kernel (state never leaves VMEM)
            state0["live"] = in_bounds.astype(jnp.float32)
            state0["want"] = jnp.zeros((th, tw), jnp.float32)
        elif rebase:
            first = params_ref[0, Q_FIRST] > 0.5
            live_ref, nf_in_ref, zfr_in_ref, zfi_in_ref = st_refs[:4]
            comp_in = st_refs[4:]
            # select in f32 — Mosaic cannot lower arith.select on i1 vectors
            inb_f = in_bounds.astype(jnp.float32)
            state0["live"] = jnp.where(first, inb_f,
                                       live_ref[:, :] * inb_f)
            state0["want"] = jnp.zeros((th, tw), jnp.float32)
            # continuing passes: z/nf/delta come from the previous pass's
            # frozen state (dead lanes keep their values verbatim — the
            # live/want latches keep them out of the iteration)
            state0["zfr"] = jnp.where(first, state0["zfr"],
                                      zfr_in_ref[:, :])
            state0["zfi"] = jnp.where(first, state0["zfi"],
                                      zfi_in_ref[:, :])
            state0["nf"] = jnp.where(first, state0["nf"], nf_in_ref[:, :])
            for k_, c_ in enumerate(comps):
                v_in = comp_in[k_][:, :]
                if c_ in ("ex", "pex"):
                    state0[c_] = jnp.where(first, state0[c_],
                                           v_in.astype(jnp.int32))
                else:
                    state0[c_] = jnp.where(first, state0[c_], v_in)

        def pert_chunk(s, base, count, rd):
            def body(k, s):
                del k
                s = dict(s)
                i = s["i"]
                mag2 = s["zfr"] * s["zfr"] + s["zfi"] * s["zfi"]
                alive = (mag2 <= bail2) & (i < pert_end)
                if rebase:
                    alive = alive & (s["live"] > 0.5) \
                        & (s["want"] < 0.5) & (s["nf"] < limit_f)
                s["nf"] = s["nf"] + alive.astype(jnp.float32)
                zr = rd["re"](i, base)
                zi = rd["im"](i, base)
                if scaled:
                    # floatexp step: delta = m * 2^ex with dd mantissa m;
                    # per-family recurrences over the _rfe_*/_cfe_* ops (the
                    # Mandelbrot/Phoenix path keeps the cheaper hand-aligned
                    # multi-term update — one renormalization per step).
                    mr = (s["mrh"], s["mrl"])
                    mi = (s["mih"], s["mil"])
                    ex = s["ex"]
                    # Mosaic lowers the exponent-field bitcasts in the fe
                    # ops only on vectors — broadcast scalar orbit reads to
                    # the tile shape first.
                    bv = lambda v: jnp.broadcast_to(v, (th, tw))
                    if julia:
                        # Z = Z0 + D with D from the floatexp drift table;
                        # dz <- 2*Z*dz + dz^2 entirely in floatexp (Z itself
                        # can sit at delta scale when the orbit returns near
                        # the start, so no term may collapse to f32)
                        Dr = _rfe_norm(
                            (bv(zr), bv(rd["rel"](i, base))),
                            bv(rd["reex"](i, base).astype(jnp.int32)))
                        Di = _rfe_norm(
                            (bv(zi), bv(rd["iml"](i, base))),
                            bv(rd["imex"](i, base).astype(jnp.int32)))
                        Zc = _cfe_from_rr(
                            _rfe_add(_rfe_from_dd(bv(z0x_h), bv(z0x_l)),
                                     Dr),
                            _rfe_add(_rfe_from_dd(bv(z0y_h), bv(z0y_l)),
                                     Di))
                        Zc2 = (Zc[0], Zc[1],
                               jnp.where(Zc[2] == E_ZERO, Zc[2], Zc[2] + 1))
                        dz_c = (mr, mi, ex)
                        nmr, nmi, nex = _cfe_add(_cfe_mul(dz_c, Zc2),
                                                 _cfe_mul(dz_c, dz_c))
                    elif ship:
                        # Burning Ship diffabs in floatexp: da = |X+d|-|X|
                        # is +-d away from the axes and +-(2X+d) on a sign
                        # straddle — each case exactly representable as a
                        # floatexp at its own scale (ops/perturbation
                        # _diffabs cases, test_deep_zoom.comp-less: beyond
                        # the reference entirely)
                        X = (bv(zr), bv(rd["rel"](i, base)))
                        Y = (bv(zi), bv(rd["iml"](i, base)))
                        dxfe = (mr, ex)
                        dyfe = (mi, ex)
                        xpos = _dd_sign_nonneg(X)
                        ypos = _dd_sign_nonneg(Y)
                        absX = _rfe_from_dd(jnp.where(xpos, X[0], -X[0]),
                                            jnp.where(xpos, X[1], -X[1]))
                        absY = _rfe_from_dd(jnp.where(ypos, Y[0], -Y[0]),
                                            jnp.where(ypos, Y[1], -Y[1]))
                        ux = _rfe_add(_rfe_from_dd(X[0] * 2.0, X[1] * 2.0),
                                      dxfe)
                        uy = _rfe_add(_rfe_from_dd(Y[0] * 2.0, Y[1] * 2.0),
                                      dyfe)
                        sx = _rfe_add(_rfe_from_dd(X[0], X[1]),
                                      dxfe)[0][0] >= 0
                        sy = _rfe_add(_rfe_from_dd(Y[0], Y[1]),
                                      dyfe)[0][0] >= 0
                        da = _rfe_select(
                            xpos, _rfe_select(sx, dxfe, _rfe_neg(ux)),
                            _rfe_select(sx, ux, _rfe_neg(dxfe)))
                        db = _rfe_select(
                            ypos, _rfe_select(sy, dyfe, _rfe_neg(uy)),
                            _rfe_select(sy, uy, _rfe_neg(dyfe)))
                        A2 = _rfe_scale_pow2(absX, 1)
                        B2 = _rfe_scale_pow2(absY, 1)
                        # dx' = da(2|X|+da) - db(2|Y|+db) + dcx
                        # dy' = 2(|X| db + |Y| da + da db) + dcy
                        dxp = _rfe_add(_rfe_add(
                            _rfe_mul(da, _rfe_add(A2, da)),
                            _rfe_neg(_rfe_mul(db, _rfe_add(B2, db)))),
                            dc_fe_x)
                        dyp = _rfe_add(_rfe_scale_pow2(_rfe_add(
                            _rfe_add(_rfe_mul(absX, db),
                                     _rfe_mul(absY, da)),
                            _rfe_mul(da, db)), 1), dc_fe_y)
                        nmr, nmi, nex = _cfe_from_rr(dxp, dyp)
                    else:
                        # Mandelbrot / Phoenix: dz <- 2*Z*dz + dz^2 + dc
                        # (+ p*dz + r*dz_prev), terms at exponents ex / 2ex
                        # / -s / ex / pex aligned to their max by exact
                        # power-of-two factors (flush-to-zero below 2^-126
                        # drops only terms >2^126 under the max — far below
                        # the dd noise floor).
                        zr2 = (zr * 2.0, rd["rel"](i, base) * 2.0)  # 2Z
                        zi2 = (zi * 2.0, rd["iml"](i, base) * 2.0)
                        t1r = dd.dd_sub(jnp, dd.dd_mul(jnp, mr, zr2),
                                        dd.dd_mul(jnp, mi, zi2))
                        t1i = dd.dd_add(jnp, dd.dd_mul(jnp, mi, zr2),
                                        dd.dd_mul(jnp, mr, zi2))
                        sq_r = dd.dd_sub(jnp, dd.dd_mul(jnp, mr, mr),
                                         dd.dd_mul(jnp, mi, mi))
                        rz = dd.dd_mul(jnp, mr, mi)
                        sq_i = (rz[0] * 2.0, rz[1] * 2.0)
                        e2 = ex + ex
                        emax = jnp.maximum(jnp.maximum(ex, e2), -s_exp)
                        if phoenix:
                            pex_old = s["pex"]
                            # exclude the r*dz_prev term from the alignment
                            # when its coefficient is 0 — a stale pex would
                            # otherwise shift the real terms down
                            pex_t = jnp.where(rr_ == 0.0, E_ZERO, pex_old)
                            emax = jnp.maximum(emax, pex_t)
                        fA = _pow2(ex - emax)
                        fB = _pow2(e2 - emax)
                        scl = lambda v, f: (v[0] * f, v[1] * f)
                        nmr = dd.dd_add(jnp, scl(t1r, fA), scl(sq_r, fB))
                        nmi = dd.dd_add(jnp, scl(t1i, fA), scl(sq_i, fB))
                        fC = _pow2(-s_exp - emax)
                        nmr = dd.dd_add(jnp, nmr, scl(dcx, fC))
                        nmi = dd.dd_add(jnp, nmi, scl(dcy, fC))
                        if phoenix:
                            # dd_mul_float keeps the two-prod error term:
                            # a componentwise (pp_*hi, pp_*lo) product
                            # would degrade p*dz and r*dz_prev to f32
                            # (~2^-24) relative accuracy — the same error
                            # class the dd tier exists to prevent
                            nmr = dd.dd_add(jnp, nmr, scl(
                                dd.dd_mul_float(jnp, mr, pp_), fA))
                            nmi = dd.dd_add(jnp, nmi, scl(
                                dd.dd_mul_float(jnp, mi, pp_), fA))
                            fR = _pow2(pex_old - emax)
                            nmr = dd.dd_add(jnp, nmr, scl(
                                dd.dd_mul_float(
                                    jnp, (s["prh"], s["prl"]), rr_), fR))
                            nmi = dd.dd_add(jnp, nmi, scl(
                                dd.dd_mul_float(
                                    jnp, (s["pih"], s["pil"]), rr_), fR))
                        # renormalize mantissa hi into [1, 2)
                        mag = jnp.maximum(jnp.abs(nmr[0]), jnp.abs(nmi[0]))
                        zero = mag == 0.0
                        k = jnp.where(zero, 0, _expo(mag))
                        fN = _pow2(-k)
                        nmr = scl(nmr, fN)
                        nmi = scl(nmi, fN)
                        nex = jnp.where(zero, E_ZERO,
                                        jnp.clip(emax + k, E_ZERO, 1 << 24))
                    if julia:
                        # compose rel = D_{i+1} + dz in floatexp; z_full =
                        # Z0 + rel; Zhuoran metric |rel| < |dz| at full
                        # floatexp precision
                        D1r = _rfe_norm(
                            (bv(rd["re"](i + 1, base)),
                             bv(rd["rel"](i + 1, base))),
                            bv(rd["reex"](i + 1, base).astype(jnp.int32)))
                        D1i = _rfe_norm(
                            (bv(rd["im"](i + 1, base)),
                             bv(rd["iml"](i + 1, base))),
                            bv(rd["imex"](i + 1, base).astype(jnp.int32)))
                        rel_r = _rfe_add(D1r, (nmr, nex))
                        rel_i = _rfe_add(D1i, (nmi, nex))
                        rel_c = _cfe_from_rr(rel_r, rel_i)
                        nzfr = z0x_h + (z0x_l + _rfe_to_f32(rel_r))
                        nzfi = z0y_h + (z0y_l + _rfe_to_f32(rel_i))
                        if rebase:
                            want_now = alive & (
                                _cfe_mag2_lt(rel_c, (nmr, nmi, nex))
                                | (i + 1 >= pert_end)) \
                                & (s["nf"] < limit_f)
                            nmr = (jnp.where(want_now, rel_c[0][0], nmr[0]),
                                   jnp.where(want_now, rel_c[0][1], nmr[1]))
                            nmi = (jnp.where(want_now, rel_c[1][0], nmi[0]),
                                   jnp.where(want_now, rel_c[1][1], nmi[1]))
                            nex = jnp.where(want_now, rel_c[2], nex)
                            s["want"] = jnp.maximum(
                                s["want"], want_now.astype(jnp.float32))
                    else:
                        # compose z_full = Z + m*2^ex (0 when the delta
                        # underflows f32 — invisible next to Z by >38
                        # decades)
                        dfac = _pow2(nex)
                        nzfr = ((rd["re"](i + 1, base) + nmr[0] * dfac)
                                + (rd["rel"](i + 1, base) + nmr[1] * dfac))
                        nzfi = ((rd["im"](i + 1, base) + nmi[0] * dfac)
                                + (rd["iml"](i + 1, base) + nmi[1] * dfac))
                        if rebase:
                            zm2 = nzfr * nzfr + nzfi * nzfi
                            dm2 = (nmr[0] * nmr[0] + nmi[0] * nmi[0]) \
                                * _pow2(nex + nex)
                            want_now = alive & ((zm2 < dm2)
                                                | (i + 1 >= pert_end)) \
                                & (s["nf"] < limit_f)
                            # rebased delta <- z_full - Z_0 as dd, exp 0
                            zr_fu = dd.dd_add(jnp, (rd["re"](i + 1, base),
                                                    rd["rel"](i + 1, base)),
                                              (nmr[0] * dfac,
                                               nmr[1] * dfac))
                            zi_fu = dd.dd_add(jnp, (rd["im"](i + 1, base),
                                                    rd["iml"](i + 1, base)),
                                              (nmi[0] * dfac,
                                               nmi[1] * dfac))
                            nmr = (jnp.where(want_now, zr_fu[0], nmr[0]),
                                   jnp.where(want_now, zr_fu[1], nmr[1]))
                            nmi = (jnp.where(want_now, zi_fu[0], nmi[0]),
                                   jnp.where(want_now, zi_fu[1], nmi[1]))
                            nex = jnp.where(want_now, 0, nex)
                            s["want"] = jnp.maximum(
                                s["want"], want_now.astype(jnp.float32))
                            if phoenix:
                                # dz_prev advances to the old dz; a rebased
                                # lane gets the absolute z_i (dd, exp 0)
                                dfo = _pow2(ex)
                                zar = dd.dd_add(
                                    jnp, (zr, rd["rel"](i, base)),
                                    (mr[0] * dfo, mr[1] * dfo))
                                zai = dd.dd_add(
                                    jnp, (zi, rd["iml"](i, base)),
                                    (mi[0] * dfo, mi[1] * dfo))
                                npr = (jnp.where(want_now, zar[0], mr[0]),
                                       jnp.where(want_now, zar[1], mr[1]))
                                npi = (jnp.where(want_now, zai[0], mi[0]),
                                       jnp.where(want_now, zai[1], mi[1]))
                                npex = jnp.where(want_now, 0, ex)
                                s["prh"] = jnp.where(alive, npr[0],
                                                     s["prh"])
                                s["prl"] = jnp.where(alive, npr[1],
                                                     s["prl"])
                                s["pih"] = jnp.where(alive, npi[0],
                                                     s["pih"])
                                s["pil"] = jnp.where(alive, npi[1],
                                                     s["pil"])
                                s["pex"] = jnp.where(alive, npex, pex_old)
                        if track_err:
                            # scaled-tier error ledger (see the dd branch
                            # below): amplification ~2|z_full| per step —
                            # mag2 is the composed full z BEFORE this
                            # update; floor at fresh dd rounding of the
                            # new delta |nm|*2^nex (post-rebase values;
                            # E_ZERO = exact zero, no floor contribution)
                            amp = 0.5 * jnp.log2(jnp.maximum(
                                4.0 * mag2, jnp.float32(1e-38)))
                            dmag = 0.5 * jnp.log2(jnp.maximum(
                                nmr[0] * nmr[0] + nmi[0] * nmi[0],
                                jnp.float32(1e-76)))
                            floor_ = jnp.where(
                                nex == E_ZERO, jnp.float32(-1e9),
                                dmag + nex.astype(jnp.float32) - 48.0)
                            s["errx"] = jnp.where(
                                alive,
                                jnp.maximum(s["errx"] + amp, floor_),
                                s["errx"])
                    s["mrh"] = jnp.where(alive, nmr[0], mr[0])
                    s["mrl"] = jnp.where(alive, nmr[1], mr[1])
                    s["mih"] = jnp.where(alive, nmi[0], mi[0])
                    s["mil"] = jnp.where(alive, nmi[1], mi[1])
                    s["ex"] = jnp.where(alive, nex, ex)
                elif dd_delta:
                    dzr = (s["dzrh"], s["dzrl"])
                    dzi = (s["dzih"], s["dzil"])
                    # the orbit itself is dd in this mode — the f32-rounded
                    # Z error would otherwise dominate the dd delta
                    if ship:
                        X = (zr, rd["rel"](i, base))
                        Y = (zi, rd["iml"](i, base))
                        da = _dd_diffabs(X, dzr)
                        db = _dd_diffabs(Y, dzi)
                        xpos = _dd_sign_nonneg(X)
                        ypos = _dd_sign_nonneg(Y)
                        A2 = (jnp.where(xpos, X[0], -X[0]) * 2.0,
                              jnp.where(xpos, X[1], -X[1]) * 2.0)
                        B2 = (jnp.where(ypos, Y[0], -Y[0]) * 2.0,
                              jnp.where(ypos, Y[1], -Y[1]) * 2.0)
                        ndzr = dd.dd_add(jnp, dd.dd_sub(
                            jnp,
                            dd.dd_mul(jnp, da, dd.dd_add(jnp, A2, da)),
                            dd.dd_mul(jnp, db, dd.dd_add(jnp, B2, db))),
                            dcx)
                        # 2(|X| db + |Y| da + da db) == A2*db + B2*da
                        #                              + 2*da*db
                        dadb = dd.dd_mul(jnp, da, db)
                        t2 = dd.dd_add(jnp,
                                       dd.dd_add(
                                           jnp,
                                           dd.dd_mul(jnp,
                                                     (A2[0] * 0.5,
                                                      A2[1] * 0.5), db),
                                           dd.dd_mul(jnp,
                                                     (B2[0] * 0.5,
                                                      B2[1] * 0.5), da)),
                                       dadb)
                        ndzi = dd.dd_add(jnp, (t2[0] * 2.0, t2[1] * 2.0),
                                         dcy)
                    else:
                        if julia:  # tables hold D = Z - Z0; Z = Z0 + D
                            zjr = dd.dd_add(jnp, (z0x_h, z0x_l),
                                            (zr, rd["rel"](i, base)))
                            zji = dd.dd_add(jnp, (z0y_h, z0y_l),
                                            (zi, rd["iml"](i, base)))
                            zr_dd = (zjr[0] * 2.0, zjr[1] * 2.0)
                            zi_dd = (zji[0] * 2.0, zji[1] * 2.0)
                        else:
                            zr_dd = (zr * 2.0, rd["rel"](i, base) * 2.0)
                            zi_dd = (zi * 2.0, rd["iml"](i, base) * 2.0)
                        # dz <- 2*Z*dz + dz^2 + delta, all components dd
                        t1r = dd.dd_sub(jnp, dd.dd_mul(jnp, dzr, zr_dd),
                                        dd.dd_mul(jnp, dzi, zi_dd))
                        t1i = dd.dd_add(jnp, dd.dd_mul(jnp, dzi, zr_dd),
                                        dd.dd_mul(jnp, dzr, zi_dd))
                        sq_r = dd.dd_sub(jnp, dd.dd_mul(jnp, dzr, dzr),
                                         dd.dd_mul(jnp, dzi, dzi))
                        rziv = dd.dd_mul(jnp, dzr, dzi)
                        sq_i = (rziv[0] * 2.0, rziv[1] * 2.0)
                        ndzr = dd.dd_add(jnp, t1r, sq_r)
                        ndzi = dd.dd_add(jnp, t1i, sq_i)
                        if not julia:
                            ndzr = dd.dd_add(jnp, ndzr, dcx)
                            ndzi = dd.dd_add(jnp, ndzi, dcy)
                        if phoenix:
                            ndzr = dd.dd_add(jnp, ndzr, dd.dd_add(
                                jnp, dd.dd_mul_float(jnp, dzr, pp_),
                                dd.dd_mul_float(
                                    jnp, (s["pzrh"], s["pzrl"]), rr_)))
                            ndzi = dd.dd_add(jnp, ndzi, dd.dd_add(
                                jnp, dd.dd_mul_float(jnp, dzi, pp_),
                                dd.dd_mul_float(
                                    jnp, (s["pzih"], s["pzil"]), rr_)))
                    # rel = D + dz (julia: rebased delta & Zhuoran metric,
                    # no cancellation; Mandelbrot: this IS z_full)
                    rel_r = ((rd["re"](i + 1, base) + ndzr[0])
                             + (rd["rel"](i + 1, base) + ndzr[1]))
                    rel_i = ((rd["im"](i + 1, base) + ndzi[0])
                             + (rd["iml"](i + 1, base) + ndzi[1]))
                    if julia:
                        nzfr = z0x_h + (z0x_l + rel_r)
                        nzfi = z0y_h + (z0y_l + rel_i)
                    else:
                        nzfr = rel_r
                        nzfi = rel_i
                    if rebase:
                        zm2 = rel_r * rel_r + rel_i * rel_i
                        dm2 = ndzr[0] * ndzr[0] + ndzi[0] * ndzi[0]
                        want_now = alive & ((zm2 < dm2)
                                            | (i + 1 >= pert_end)) \
                            & (s["nf"] < limit_f)
                        zr_fu = dd.dd_add(jnp, (rd["re"](i + 1, base),
                                                rd["rel"](i + 1, base)),
                                          ndzr)
                        zi_fu = dd.dd_add(jnp, (rd["im"](i + 1, base),
                                                rd["iml"](i + 1, base)),
                                          ndzi)
                        ndzr = (jnp.where(want_now, zr_fu[0], ndzr[0]),
                                jnp.where(want_now, zr_fu[1], ndzr[1]))
                        ndzi = (jnp.where(want_now, zi_fu[0], ndzi[0]),
                                jnp.where(want_now, zi_fu[1], ndzi[1]))
                        s["want"] = jnp.maximum(
                            s["want"], want_now.astype(jnp.float32))
                        if phoenix:
                            # rebased dz_prev = absolute z_i in dd
                            zar = dd.dd_add(jnp, (rd["re"](i, base),
                                                  rd["rel"](i, base)), dzr)
                            zai = dd.dd_add(jnp, (rd["im"](i, base),
                                                  rd["iml"](i, base)), dzi)
                            for nm_, cur_, reb_ in (
                                    ("pzrh", dzr[0], zar[0]),
                                    ("pzrl", dzr[1], zar[1]),
                                    ("pzih", dzi[0], zai[0]),
                                    ("pzil", dzi[1], zai[1])):
                                v = jnp.where(want_now, reb_, cur_)
                                s[nm_] = jnp.where(alive, v, s[nm_])
                    if track_err:
                        # absolute-error ledger (log2): the carried error
                        # amplifies by the local Jacobian ~2|z| per step,
                        # floored at fresh dd rounding (2^-48 relative) of
                        # the new delta.  Rebasing replaces the delta but
                        # not its accumulated error, so the ledger carries
                        # through unchanged.  (X/Y are the dd full-z parts
                        # of the ship branch; the assert ties track_err to
                        # ship + dd.)
                        fxr = X[0] + dzr[0]
                        fxi = Y[0] + dzi[0]
                        amp = 0.5 * jnp.log2(jnp.maximum(
                            4.0 * (fxr * fxr + fxi * fxi),
                            jnp.float32(1e-38)))
                        # fresh rounding floor: 2^-48 relative on the new
                        # delta (the dd table's per-entry emission error
                        # is independent per step and does not compound
                        # through the delta recurrence; the table's OWN
                        # recurrence error is handled by the raised orbit
                        # precision — models/deep_zoom exact_dust)
                        floor_ = 0.5 * jnp.log2(jnp.maximum(
                            ndzr[0] * ndzr[0] + ndzi[0] * ndzi[0],
                            jnp.float32(1e-76))) - 48.0
                        s["errx"] = jnp.where(
                            alive,
                            jnp.maximum(s["errx"] + amp, floor_),
                            s["errx"])
                    s["dzrh"] = jnp.where(alive, ndzr[0], dzr[0])
                    s["dzrl"] = jnp.where(alive, ndzr[1], dzr[1])
                    s["dzih"] = jnp.where(alive, ndzi[0], dzi[0])
                    s["dzil"] = jnp.where(alive, ndzi[1], dzi[1])
                else:
                    dzr, dzi = s["dzr"], s["dzi"]
                    # dz <- 2*Z*dz + dz^2 (+ delta for Mandelbrot, where c
                    # varies per pixel; julia's c is shared)  (comp:156-163)
                    if julia:  # tables hold D = Z - Z0
                        zr = z0x_h + zr
                        zi = z0y_h + zi
                    if ship:
                        # Burning Ship (x' = x^2-y^2+cx, y' = 2|xy|+cy):
                        # with a = |X+dx| = |X|+da, da = diffabs(X, dx):
                        #   dx' = da(2|X|+da) - db(2|Y|+db) + dcx
                        #   dy' = 2(|X| db + |Y| da + da db) + dcy
                        da = _diffabs(jnp, zr, dzr)
                        db = _diffabs(jnp, zi, dzi)
                        Aa = jnp.abs(zr)
                        Bb = jnp.abs(zi)
                        ndzr = (da * (2.0 * Aa + da)
                                - db * (2.0 * Bb + db) + delta_r)
                        ndzi = (2.0 * (Aa * db + Bb * da + da * db)
                                + delta_i)
                    else:
                        t1r = 2.0 * (zr * dzr - zi * dzi)
                        t1i = 2.0 * (zr * dzi + zi * dzr)
                        t2r = dzr * dzr - dzi * dzi
                        t2i = (2.0 * dzr) * dzi
                        if phoenix:
                            # dz' = 2Z dz + dz^2 + dc + p dz + r dz_prev
                            ndzr = (t1r + t2r + delta_r + pp_ * dzr
                                    + rr_ * s["pzr"])
                            ndzi = (t1i + t2i + delta_i + pp_ * dzi
                                    + rr_ * s["pzi"])
                        elif julia:
                            ndzr = t1r + t2r
                            ndzi = t1i + t2i
                        else:
                            ndzr = t1r + t2r + delta_r
                            ndzi = t1i + t2i + delta_i
                    # julia: rel = D_{i+1} + dz — the rebased delta AND the
                    # Zhuoran distance-to-Z0, with no cancellation
                    relr = rd["re"](i + 1, base) + ndzr
                    reli = rd["im"](i + 1, base) + ndzi
                    if julia:
                        nzfr = z0x_h + relr
                        nzfi = z0y_h + reli
                    else:
                        nzfr = relr
                        nzfi = reli
                    if rebase:
                        zm2 = relr * relr + reli * reli
                        dm2 = ndzr * ndzr + ndzi * ndzi
                        want_now = alive & ((zm2 < dm2)
                                            | (i + 1 >= pert_end)) \
                            & (s["nf"] < limit_f)
                        ndzr = jnp.where(want_now, relr, ndzr)
                        ndzi = jnp.where(want_now, reli, ndzi)
                        s["want"] = jnp.maximum(
                            s["want"], want_now.astype(jnp.float32))
                        if phoenix:
                            # rebased dz_prev = absolute z_i (Z_{-1} = 0)
                            npzr = jnp.where(want_now,
                                             rd["re"](i, base) + dzr, dzr)
                            npzi = jnp.where(want_now,
                                             rd["im"](i, base) + dzi, dzi)
                            s["pzr"] = jnp.where(alive, npzr, s["pzr"])
                            s["pzi"] = jnp.where(alive, npzi, s["pzi"])
                    s["dzr"] = jnp.where(alive, ndzr, dzr)
                    s["dzi"] = jnp.where(alive, ndzi, dzi)
                s["zfr"] = jnp.where(alive, nzfr, s["zfr"])
                s["zfi"] = jnp.where(alive, nzfi, s["zfi"])
                if not rebase:
                    # Pauldelbrot glitch criterion on the live full value
                    # (rebasing supersedes it: |z| < |dz| fires first and
                    # the lane restarts on a fresh orbit index)
                    zmag2 = nzfr * nzfr + nzfi * nzfi
                    bad = alive & (zmag2
                                   < glitch_tol * rd["mag2"](i + 1, base))
                    s["glitch"] = jnp.maximum(s["glitch"],
                                              bad.astype(jnp.float32))
                s["i"] = i + 1
                return s

            return jax.lax.fori_loop(0, count, body, s)

        def cond1(carry):
            s, keep = carry
            return (s["i"] < pert_end) & keep

        def _keep(s):
            act = s["zfr"] * s["zfr"] + s["zfi"] * s["zfi"] <= bail2
            if rebase:
                # dead/frozen lanes may hold |z| <= bail forever
                act = act & (s["live"] > 0.5) & (s["want"] < 0.5) \
                    & (s["nf"] < limit_f)
            return jnp.any(act)

        if orbit_hbm:
            # HBM rows hold [j*chunk, j*chunk+chunk]; rounds must stay
            # row-aligned, so run a partial round up to the next boundary
            # (the series skip can start anywhere).
            align = (chunk - (n0 % chunk)) % chunk
            align = jnp.minimum(align, jnp.maximum(pert_end - n0, 0))
            state0 = pert_chunk(state0, base0, align, rd0)
            # loop invariant: the current row sits in slot 0, waited
            dma_sync(state0["i"])

            def body1(carry):
                # two rounds per step with static buffer parity; each
                # row's DMA is issued before the other slot's compute and
                # waited after it — latency hides behind the chunk math
                s, _ = carry
                j = s["i"] // chunk
                dma_start(j + 1, 1)
                s = pert_chunk(s, j * chunk, chunk, rd0)
                dma_wait(j + 1, 1)
                dma_start(j + 2, 0)
                s = pert_chunk(s, (j + 1) * chunk, chunk, rd1)
                dma_wait(j + 2, 0)
                return s, _keep(s)
        else:
            def body1(carry):
                s, _ = carry
                s = pert_chunk(s, jnp.int32(0), chunk, rd0)
                return s, _keep(s)

        s, _ = jax.lax.while_loop(cond1, body1, (state0, jnp.bool_(True)))

        rounds = jnp.int32(1)
        if rebase and inkernel_rounds:
            # --- in-kernel rounds: revive want lanes at orbit index 0 ---
            # Exactly the multi-pass boundary (live' = want, want' = 0,
            # i' = 0, z/nf/delta carry over verbatim), but per tile and
            # without the state round-trip through HBM.
            def rcond(carry):
                s_, r_ = carry
                return (r_ < inkernel_rounds) & jnp.any(s_["want"] > 0.5)

            def rbody(carry):
                s_, r_ = carry
                s_ = dict(s_)
                s_["live"] = s_["want"]
                s_["want"] = jnp.zeros_like(s_["want"])
                s_["i"] = jnp.int32(0)
                if orbit_hbm:
                    # restore the loop invariant "row of i sits in slot 0,
                    # waited" for the restart (align is 0 at i = 0)
                    dma_sync(jnp.int32(0))
                s_, _ = jax.lax.while_loop(cond1, body1,
                                           (s_, jnp.bool_(True)))
                return s_, r_ + 1

            s, rounds = jax.lax.while_loop(rcond, rbody, (s, rounds))

        if not float_continuation and not rebase:
            # Deep mode: a pixel still alive when the reference orbit ran
            # out cannot be finished in f32 — flag it for a secondary
            # reference (models/deep_zoom.py) instead of iterating garbage.
            # (Rebase mode flags these lanes as `want` in-loop instead.)
            alive_end = (s["zfr"] * s["zfr"] + s["zfi"] * s["zfi"] <= bail2)
            starved = alive_end & (pert_end < limit)
            s["glitch"] = jnp.maximum(s["glitch"],
                                      starved.astype(jnp.float32))

        # --- phase 2: float continuation past the orbit end -------------
        # (comp:181-203) — continue z <- z^2 + c from the current full z.
        def cont_chunk(s):
            def body(k, s):
                del k
                s = dict(s)
                i = s["i"]
                zfr, zfi = s["zfr"], s["zfi"]
                mag2 = zfr * zfr + zfi * zfi
                alive = (mag2 <= bail2) & (i < limit)
                s["nf"] = s["nf"] + alive.astype(jnp.float32)
                x = zfr * zfr - zfi * zfi + c_r
                y = (2.0 * zfr) * zfi + c_i
                s["zfr"] = jnp.where(alive, x, zfr)
                s["zfi"] = jnp.where(alive, y, zfi)
                s["i"] = i + 1
                return s

            return jax.lax.fori_loop(0, chunk, body, s)

        def cond2(carry):
            s, keep = carry
            return (s["i"] < limit) & keep

        def body2(carry):
            s, _ = carry
            s = cont_chunk(s)
            keep = jnp.any(s["zfr"] * s["zfr"] + s["zfi"] * s["zfi"] <= bail2)
            return s, keep

        if float_continuation:
            s, _ = jax.lax.while_loop(cond2, body2, (s, jnp.bool_(True)))

        if rebase:
            # interior means the per-pixel budget ran out (want lanes keep
            # a provisional n; the next pass overwrites it)
            interior = (s["nf"] >= limit_f) & in_bounds
        else:
            interior = (s["zfr"] * s["zfr"]
                        + s["zfi"] * s["zfi"] <= bail2) & in_bounds
        n = jnp.where(interior, limit,
                      jnp.maximum(s["nf"], 0.0).astype(jnp.int32)
                      * in_bounds.astype(jnp.int32))
        n_ref[:, :] = n
        zx_ref[:, :] = s["zfr"]
        zy_ref[:, :] = s["zfi"]
        glitch_ref[:, :] = s["glitch"] * in_bounds.astype(jnp.float32)
        if rebase and inkernel_rounds:
            want_ref[:, :] = s["want"]
            rounds_ref[:, :] = jnp.broadcast_to(
                rounds.astype(jnp.float32), (th, tw))
            if track_err:
                err_out[0][:, :] = s["errx"]
        elif rebase:
            want_ref[:, :] = s["want"]
            nf_ref[:, :] = s["nf"]
            for r_, c_ in zip(comp_refs, comps):
                v = s[c_]
                if c_ in ("ex", "pex"):
                    v = v.astype(jnp.float32)
                r_[:, :] = v

    return kernel


def _pallas_pert(rebase, *, width, height, map_height, orbit_cap, tile,
                 chunk, interpret, float_continuation, dd_delta, orbit_hbm,
                 scaled, julia=False, ship=False, phoenix=False,
                 aa_stack=None, inkernel_rounds=0, track_err=False):
    th, tw = tile
    grid = (cdiv(height, th), cdiv(width, tw))
    # orbit_cap is NOT consumed by the kernel body (the orbit bound comes
    # from the operand shapes and Q_REFLEN); it stays a jit static only so
    # the cache key names the bucket explicitly.
    kernel = _make_kernel(width, height, map_height, tile, chunk,
                          float_continuation, dd_delta, orbit_hbm,
                          scaled, rebase, julia, ship, phoenix,
                          aa_stack, inkernel_rounds, track_err)
    comps = _state_comps(dd_delta, scaled, phoenix)
    n_state = 4 + len(comps) if (rebase and not inkernel_rounds) else 0
    f32s = jax.ShapeDtypeStruct((height, width), jnp.float32)
    if rebase and inkernel_rounds:
        # n, zx, zy, glitch, want, rounds (+ errx under track_err) — no
        # feedback planes
        out_shapes = ((jax.ShapeDtypeStruct((height, width), jnp.int32),)
                      + (f32s,) * (6 if track_err else 5))
    else:
        out_shapes = (
            (jax.ShapeDtypeStruct((height, width), jnp.int32),)
            + (f32s,) * (3 + ((2 + len(comps)) if rebase else 0)))
    out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    n_streams = _n_orbit_streams(dd_delta, scaled, julia)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [pl.BlockSpec(memory_space=(pl.ANY if orbit_hbm
                                                else pltpu.SMEM))] * 7
                  + [out_spec] * n_state),
        out_specs=tuple(out_spec for _ in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.SMEM((1, HBM_ROW_W), jnp.float32)
             for _ in range(2 * n_streams)]
            + [pltpu.SemaphoreType.DMA((2, n_streams))]
            if orbit_hbm else []),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "map_height", "orbit_cap", "tile",
                     "chunk", "interpret", "float_continuation", "dd_delta",
                     "orbit_hbm", "scaled", "julia", "ship", "phoenix",
                     "aa_stack"))
def _pert_call(params, orbit_re, orbit_im, orbit_mag2, orbit_re_lo,
               orbit_im_lo, orbit_re_ex, orbit_im_ex, *, width, height,
               map_height, orbit_cap, tile, chunk, interpret,
               float_continuation, dd_delta=False, orbit_hbm=False,
               scaled=False, julia=False, ship=False, phoenix=False,
               aa_stack=None):
    call = _pallas_pert(False, width=width, height=height,
                        map_height=map_height, orbit_cap=orbit_cap,
                        tile=tile, chunk=chunk, interpret=interpret,
                        float_continuation=float_continuation,
                        dd_delta=dd_delta, orbit_hbm=orbit_hbm,
                        scaled=scaled, julia=julia, ship=ship,
                        phoenix=phoenix, aa_stack=aa_stack)
    return call(params, orbit_re, orbit_im, orbit_mag2, orbit_re_lo,
                orbit_im_lo, orbit_re_ex, orbit_im_ex)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "map_height", "orbit_cap", "tile",
                     "chunk", "interpret", "dd_delta", "orbit_hbm",
                     "scaled", "max_passes", "julia", "ship", "phoenix",
                     "aa_stack", "inkernel", "track_err"))
def _pert_rebase_call(params, orbit_re, orbit_im, orbit_mag2, orbit_re_lo,
                      orbit_im_lo, orbit_re_ex, orbit_im_ex, *, width,
                      height, map_height, orbit_cap,
                      tile, chunk, interpret, dd_delta=False,
                      orbit_hbm=False, scaled=False, max_passes=256,
                      julia=False, ship=False, phoenix=False,
                      aa_stack=None, inkernel=True, track_err=False):
    """Device-resident rebasing passes.  Default (``inkernel``): ONE
    kernel call runs each tile's rounds over in-VMEM state until no lane
    wants a rebase — finished tiles never re-enter, and no per-pixel
    state crosses HBM.  ``inkernel=False`` selects the multi-pass form (a
    lax.while_loop re-launching the kernel with the frozen per-pixel
    state fed back as inputs — bit-identical, kept as the comparison
    oracle and measurement baseline: 1.72 s device time on config 4 vs
    the in-kernel form's single pass)."""
    if inkernel:
        call = _pallas_pert(True, width=width, height=height,
                            map_height=map_height, orbit_cap=orbit_cap,
                            tile=tile, chunk=chunk, interpret=interpret,
                            float_continuation=False, dd_delta=dd_delta,
                            orbit_hbm=orbit_hbm, scaled=scaled, julia=julia,
                            ship=ship, phoenix=phoenix, aa_stack=aa_stack,
                            inkernel_rounds=int(max_passes),
                            track_err=track_err)
        outs = call(
            params, orbit_re, orbit_im, orbit_mag2, orbit_re_lo,
            orbit_im_lo, orbit_re_ex, orbit_im_ex)
        n, zx, zy, gl, want, rounds = outs[:6]
        # the per-tile rounds PLANE rides along with its max: the plane
        # is already a kernel output (the max was just a reduce of it),
        # and bench_all config4's pass histogram reads it — the Mosaic
        # kernel HLO is unchanged
        ret = (n, zx, zy, gl, want, jnp.max(rounds).astype(jnp.int32),
               rounds)
        return ret + ((outs[6],) if track_err else ())
    assert not track_err, "track_err requires the in-kernel rounds form"
    call = _pallas_pert(True, width=width, height=height,
                        map_height=map_height, orbit_cap=orbit_cap,
                        tile=tile, chunk=chunk, interpret=interpret,
                        float_continuation=False, dd_delta=dd_delta,
                        orbit_hbm=orbit_hbm, scaled=scaled, julia=julia,
                        ship=ship, phoenix=phoenix, aa_stack=aa_stack)
    comps = _state_comps(dd_delta, scaled, phoenix)
    z = jnp.zeros((height, width), jnp.float32)

    def run(m0, first, live, nf, zfr, zfi, comp_vals):
        p2 = params.at[0, Q_M0].set(m0).at[0, Q_FIRST].set(first)
        return call(p2, orbit_re, orbit_im, orbit_mag2, orbit_re_lo,
                    orbit_im_lo, orbit_re_ex, orbit_im_ex, live, nf,
                    zfr, zfi, *comp_vals)

    # first pass starts at the series-skip index (1 when no series;
    # 0 for julia, whose delta_0 references Z_0 directly)
    outs0 = run(params[0, Q_NSKIP], jnp.float32(1.0), z + 1.0, z, z, z,
                [z] * len(comps))

    def cond(c):
        k, outs = c
        want = outs[4]
        return (k < max_passes) & jnp.any(want > 0.5)

    def body(c):
        k, outs = c
        n, zx, zy, gl, want, nf, *comp_vals = outs
        return k + 1, run(jnp.float32(0.0), jnp.float32(0.0), want, nf,
                          zx, zy, comp_vals)

    k, outs = jax.lax.while_loop(cond, body, (jnp.int32(1), outs0))
    n, zx, zy, gl, want, nf, *_ = outs
    return n, zx, zy, gl, want, k


def perturbation_fields(orbit: np.ndarray, width: int, height: int, *,
                        center_x_dd: Tuple[float, float],
                        center_y_dd: Tuple[float, float],
                        zoom_dd: Tuple[float, float] = (0.0, 0.0),
                        max_iter: int, bailout: float = 4.0,
                        glitch_tol: float = 1e-6,
                        ref_shift_x: Tuple[float, float] = (0.0, 0.0),
                        ref_shift_y: Tuple[float, float] = (0.0, 0.0),
                        offset: Tuple[float, float] = (0.0, 0.0),
                        iter_limit=None, tile=None, chunk: int = 16,
                        float_continuation: bool = True,
                        series=None, row0=0.0,
                        map_height: Optional[int] = None,
                        dd_delta: bool = False,
                        scaled_delta: bool = False,
                        zoom_frac: Union[str, Fraction, None] = None,
                        ref_shift_x_frac: Union[str, Fraction, None] = None,
                        ref_shift_y_frac: Union[str, Fraction, None] = None,
                        rebase: bool = False, max_passes: int = 256,
                        rebase_inkernel: bool = True,
                        julia: bool = False, julia_z0=None,
                        ship: bool = False, phoenix: bool = False,
                        phoenix_p: float = 0.0, phoenix_r: float = 0.0,
                        interpret: Optional[bool] = None,
                        aa_spp: int = 1,
                        orbit_exp: Optional[np.ndarray] = None,
                        track_err: bool = False,
                        _build_only: bool = False):
    """Run the perturbation kernel against a precomputed reference orbit
    ((L, 2) float64 from deepzoom.orbit).  Returns n/zx/zy/glitch fields.

    ``orbit_exp`` (julia + scaled_delta only): per-entry binary exponents
    for a floatexp-emitted drift table (compute_orbit(emit_fx=True) —
    ``orbit`` then holds frexp mantissas).  Lifts the ~1e-290 f64
    drift-emission floor: the exponent stream carries magnitudes f64
    cannot represent.

    ``ref_shift_*`` is (scene_center - orbit_center) as dd, used when
    re-rendering glitched pixels against a secondary reference.

    ``scaled_delta=True`` (ARBITRARY tier) iterates floatexp deltas (dd
    mantissa + per-pixel exponent); because zoom/shift magnitudes underflow
    f32 pairs at those depths, pass them as exact decimal strings or
    Fractions via ``zoom_frac`` / ``ref_shift_*_frac`` instead of dd.
    """
    if interpret is None:
        interpret = default_interpret()
    if tile is None:
        # (16,128) measured best at 1080p/1e-12 under IN-KERNEL rounds
        # (1061 ms vs 1130 for (32,128), 1582 for (64,128), 1338 for
        # (8,128), trace-timed on v5e): per-tile state setup runs once
        # per tile instead of once per pass there, so shrinking the tile
        # buys divergence locality nearly for free.  The MULTI-PASS and
        # non-rebasing forms keep the (64,128)-era tuning (17.4 vs
        # 14.5 Mpix/s over (64,256)) — they re-enter every tile per
        # pass, where small tiles quadruple the dominant setup cost.
        # Interpret mode also keeps the big tile: the Python interpreter
        # pays per GRID STEP, not per divergent lane, and results are
        # tile-independent (pinned by the band/mono equality tests).
        small = rebase and rebase_inkernel and not interpret
        tile = pick_tile(height, width, max_tile=(16, 128)) if small \
            else pick_tile(height, width)
    if iter_limit is None:
        iter_limit = max_iter
    aa_spp = int(aa_spp)
    aa_stack = None
    out_h = height
    if aa_spp > 1:
        # Device-batched supersampling: spp^2 tile-aligned segments stack
        # vertically in ONE kernel call sharing the orbit operands and the
        # rebase passes; each segment's mapping is bit-identical to a
        # sequential render at that subpixel offset (VERDICT r2 item 3).
        # Composes with banded rendering (row0/map_height): the segments
        # then stack spp^2 copies of the BAND, each mapped against the
        # full map_height image at the band's global row offset — giant
        # supersampled deep zooms share rebase passes per band.
        assert rebase, "aa_spp > 1 requires the rebasing pipeline"
        assert aa_spp & (aa_spp - 1) == 0,             "aa_spp must be a power of two (exact dyadic offsets)"
        assert offset == (0.0, 0.0),             "aa_spp supersedes the offset parameter"
        seg_h = -(-height // tile[0]) * tile[0]
        aa_stack = (aa_spp, seg_h, height,
                    int(map_height if map_height is not None else height))
        out_h = aa_spp * aa_spp * seg_h
    map_h = int(map_height if map_height is not None else height)
    # the pixel step always derives from the LOGICAL image height (= map_h
    # for banded renders, = the un-stacked height for stacked AA)
    step_h = map_h
    if aa_stack is not None:
        map_h = out_h
    if scaled_delta:
        assert not float_continuation, \
            "float continuation is meaningless at scaled-delta depths"
        assert not dd_delta, "scaled_delta supersedes dd_delta"
        if series is not None and series.n_skip > 1:
            # scaled mode needs floatexp coefficients (A/B/C overflow f64
            # at these depths) — deepzoom.series.compute_series_skip_fx
            from ..deepzoom.series import SeriesSkipFX
            assert isinstance(series, SeriesSkipFX), \
                "scaled-delta series skip requires SeriesSkipFX " \
                "(compute_series_skip_fx)"
    if rebase:
        assert not float_continuation, \
            "rebasing supersedes float continuation"
        # series IS supported with rebasing: the first pass starts at the
        # skip index (Q_M0 <- n_skip); later passes start at 0.
    if julia or ship or phoenix:
        assert not float_continuation, \
            "the non-Mandelbrot families have no float-continuation path"
        assert series is None or series.n_skip <= 1, \
            "series skip is Mandelbrot-only"
        assert rebase, \
            "the non-Mandelbrot families require the rebasing pipeline"
    # exact per-pixel step = zoom * 4 / map_height^2 (see _make_kernel)
    if zoom_frac is not None:
        zoom_fr = Fraction(zoom_frac)
    else:
        zoom_fr = Fraction(zoom_dd[0]) + Fraction(zoom_dd[1])
    if julia and scaled_delta and orbit_exp is None \
            and 0 < zoom_fr < Fraction(1, 10 ** 290):
        # a plain f64-emitted drift table (compute_orbit emit_rel without
        # emit_fx) ends near 1e-308; drifts at pixel scale below that
        # collapse to 0.  The model layer always passes the floatexp
        # emission (orbit_exp) here — this guards direct callers.
        raise ValueError(
            "deep-zoom julia below ~1e-290 needs the floatexp drift "
            "emission: compute_orbit(emit_fx=True) + orbit_exp=")
    if orbit_exp is not None and not (julia and scaled_delta):
        # Only the julia floatexp path consumes exponent streams; anywhere
        # else the [0.5,1) mantissas would silently render as literal
        # drift values.
        raise ValueError(
            "orbit_exp is only valid with julia=True and scaled_delta="
            "True (the floatexp drift-table path); pass a plain f64 "
            "orbit table otherwise")
    step_fr = zoom_fr * 4 / (step_h * step_h)
    s_exp = 0
    if scaled_delta:
        if step_fr == 0:
            raise ValueError("scaled_delta requires a nonzero zoom")
        # scale so step' ~ 2^-14: delta-c mantissas land in [2^-14, ~2]
        # for any image up to 32k wide
        s_exp = -14 - (step_fr.numerator.bit_length()
                       - step_fr.denominator.bit_length())
        step_fr *= Fraction(2) ** s_exp

    from .dd import dd_from_fraction as frac_to_dd

    step_dd = frac_to_dd(step_fr)
    if scaled_delta:
        sh_x = Fraction(ref_shift_x_frac) if ref_shift_x_frac is not None \
            else Fraction(0)
        sh_y = Fraction(ref_shift_y_frac) if ref_shift_y_frac is not None \
            else Fraction(0)
        two_s = Fraction(2) ** s_exp
        ref_shift_x = frac_to_dd(sh_x * two_s)
        ref_shift_y = frac_to_dd(sh_y * two_s)
    if max_iter >= 1 << 24:
        # per-pixel counters (and LIMIT/REFLEN params) are f32: n+1 == n
        # past 2^24, which would wedge the interior latch
        raise ValueError("max_iter must be < 2^24 (f32 counter precision)")
    if iter_limit is not None and int(iter_limit) >= 1 << 24:
        # the f32 Q_LIMIT slot / nf counter saturate at 2^24: in rebase
        # mode a stalled nf would then never reach the limit and every
        # interior lane would burn max_passes before the HP fallback
        raise ValueError("iter_limit must be < 2^24 (f32 counter "
                         "precision)")
    if series is not None and max(bailout, 2.0) < 4.0:
        raise ValueError(
            "series skip requires bailout >= 4 (its escape-exactness "
            "proof needs |z| <= |Z| + |delta| < bailout over the skipped "
            "range; see deepzoom/series.py)")
    # Orbits beyond the SMEM budget stream from HBM per iteration chunk.
    # The budget is per-STREAM bytes: julia-scaled tables carry 6 streams
    # (mantissa hi/lo + exponent per component) vs the validated 4, so
    # its cap shrinks proportionally to keep total SMEM at the proven
    # 4-stream maximum.
    smem_cap = (MAX_ORBIT_SMEM * 4) // 6 if (julia and scaled_delta) \
        else MAX_ORBIT_SMEM
    orbit_hbm = max_iter + 1 > smem_cap
    bailout = max(2.0, float(bailout))  # comp:114

    if orbit_hbm:
        cap = int(max(max_iter + 1, 2))
    else:
        # Bucket the SMEM orbit cap to a power of two (bounded by the
        # SMEM budget): cap is a static kernel argument, so without
        # bucketing every max_iter change recompiles an identical kernel
        # (the iteration bound itself is the TRACED Q_LIMIT param and
        # zeros past the stored orbit are the normal trimmed-orbit case).
        b = 256
        while b < max_iter + 1:
            b *= 2
        cap = int(min(b, smem_cap))
    # Clamp to cap: reusing one deep orbit across frames with smaller
    # iteration caps legitimately passes len(orbit) > max_iter + 1.
    L = int(min(len(orbit), cap))
    julia_fx = julia and scaled_delta
    orbit_re = np.zeros(cap, np.float32)
    orbit_im = np.zeros(cap, np.float32)
    orbit_re_ex = np.zeros(1, np.float32)
    orbit_im_ex = np.zeros(1, np.float32)
    if julia_fx:
        # Per-entry floatexp drift tables: each drift D becomes a dd
        # mantissa (hi+lo f32) + per-component exponent stream, so drifts
        # at pixel scale (the orbit returning near its start) keep full
        # relative precision — f32-pair tables underflow at 1e-38 and
        # floored the julia tier at ~1e-25.  With orbit_exp (floatexp
        # emission from the bignum engine) the table is exact at ANY
        # depth; the frexp fallback covers f64-emitted tables (identical
        # bits in f64's normal range).
        def fx_streams(vals, exps=None):
            if exps is None:
                m, e = np.frexp(vals)  # D = m * 2^e, |m| in [0.5, 1)
            else:
                m, e = vals, exps.astype(np.int64)
            hi = m.astype(np.float32)
            lo = (m - hi.astype(np.float64)).astype(np.float32)
            ex = np.where(m == 0.0, float(E_ZERO),
                          e.astype(np.float64)).astype(np.float32)
            return hi, lo, ex

        orbit_re_lo = np.zeros(cap, np.float32)
        orbit_im_lo = np.zeros(cap, np.float32)
        orbit_re_ex = np.full(cap, float(E_ZERO), np.float32)
        orbit_im_ex = np.full(cap, float(E_ZERO), np.float32)
        (orbit_re[:L], orbit_re_lo[:L],
         orbit_re_ex[:L]) = fx_streams(
             orbit[:L, 0], None if orbit_exp is None else orbit_exp[:L, 0])
        (orbit_im[:L], orbit_im_lo[:L],
         orbit_im_ex[:L]) = fx_streams(
             orbit[:L, 1], None if orbit_exp is None else orbit_exp[:L, 1])
    else:
        orbit_re[:L] = orbit[:L, 0].astype(np.float32)
        orbit_im[:L] = orbit[:L, 1].astype(np.float32)
        if dd_delta or scaled_delta:
            # hi/lo split of the f64 orbit — the dd/floatexp loops need
            # dd-accurate Z
            orbit_re_lo = np.zeros(cap, np.float32)
            orbit_im_lo = np.zeros(cap, np.float32)
            orbit_re_lo[:L] = (orbit[:L, 0] - orbit_re[:L]
                               .astype(np.float64)).astype(np.float32)
            orbit_im_lo[:L] = (orbit[:L, 1] - orbit_im[:L]
                               .astype(np.float64)).astype(np.float32)
        else:
            orbit_re_lo = np.zeros(1, np.float32)
            orbit_im_lo = np.zeros(1, np.float32)
    # In HBM mode the glitch threshold is recomputed from the streamed
    # values, so the precomputed |Z|^2 table is a dummy (julia-fx tables
    # hold mantissas; mag2 is only consumed by the Pauldelbrot path,
    # which julia's mandatory rebasing supersedes).
    mag2 = np.zeros(1, np.float32) if orbit_hbm \
        else orbit_re * orbit_re + orbit_im * orbit_im

    if orbit_hbm:
        # Pre-chunk into overlapping rows: row j = orbit[j*chunk : +chunk+1]
        # padded to HBM_ROW_W so the kernel DMAs one row per round with a
        # dynamic leading index.
        assert chunk + 1 <= HBM_ROW_W

        def rows_of(flat):
            n_rows = -(-cap // chunk)
            padded = np.zeros(n_rows * chunk + chunk + 1, np.float32)
            padded[:len(flat)] = flat
            out = np.zeros((n_rows, HBM_ROW_W), np.float32)
            for j in range(n_rows):
                out[j, :chunk + 1] = padded[j * chunk:j * chunk + chunk + 1]
            return out

        orbit_re = rows_of(orbit_re)
        orbit_im = rows_of(orbit_im)
        if dd_delta or scaled_delta:
            orbit_re_lo = rows_of(orbit_re_lo)
            orbit_im_lo = rows_of(orbit_im_lo)
        if julia_fx:
            # zero-padded rows read as mantissa 0 -> exact-zero drift
            orbit_re_ex = rows_of(orbit_re_ex)
            orbit_im_ex = rows_of(orbit_im_ex)

    params = np.zeros((1, NQ), np.float32)
    params[0, Q_CXH], params[0, Q_CXL] = center_x_dd
    params[0, Q_CYH], params[0, Q_CYL] = center_y_dd
    params[0, Q_PSH], params[0, Q_PSL] = step_dd
    params[0, Q_SEXP] = s_exp
    params[0, Q_LIMIT] = max(1, int(iter_limit))
    params[0, Q_BAIL2] = bailout * bailout
    params[0, Q_REFLEN] = L
    params[0, Q_GLITCH_TOL] = glitch_tol
    params[0, Q_SHIFTXH], params[0, Q_SHIFTXL] = ref_shift_x
    params[0, Q_SHIFTYH], params[0, Q_SHIFTYL] = ref_shift_y
    params[0, Q_OFFX], params[0, Q_OFFY] = offset
    def put_dd(hi_idx, lo_idx, value):
        from .dd import dd_from_double

        params[0, hi_idx], params[0, lo_idx] = dd_from_double(value)

    def _series_f32_representable(s) -> bool:
        # The non-floatexp branch ships raw f64 coefficient magnitudes in
        # f32 SMEM params.  B/C legitimately reach 1e40+ at QUAD-tier
        # depths on chaotic references (positive Lyapunov growth) — a
        # float32 cast would turn them into inf/NaN and corrupt every
        # pixel, so such a series is silently dropped (the skip is an
        # optimization; correctness never depends on it).  The floatexp
        # branch pre-aligns exponents and has no such limit.
        vals = (s.a.real, s.a.imag, s.b.real, s.b.imag, s.c.real, s.c.imag)
        return all(abs(v) < 1e36 and v == v for v in vals)

    if series is not None and series.n_skip > 1 and series.n_skip < L \
            and scaled_delta:
        # Floatexp coefficients, pre-aligned to a shared exponent e0 so the
        # kernel's dd horner over the SCALED dc mantissa (= δc·2^s) yields
        # the delta mantissa at exponent e0:
        #   T_k value = coeff_k · δc^k = (coeff_k·2^(e_k - k·s - e0)) ·
        #               dc_m^k · 2^e0
        # e0 = max_k (e_k - k·s) bounds every per-pixel mantissa by ~1
        # (|dc_m| <= 1 by the host step scaling); terms more than ~126
        # binary decades below e0 flush to 0 — far under the dd noise.
        import math as _math

        fx = [(series.a, series.a_e, 1), (series.b, series.b_e, 2),
              (series.c, series.c_e, 3)]
        e0 = max(e - k * s_exp for m, e, k in fx if m != 0)
        slots = ((Q_AR, Q_ARL, Q_AI, Q_AIL), (Q_BR, Q_BRL, Q_BI, Q_BIL),
                 (Q_CR, Q_CRL, Q_CI, Q_CIL))
        for (m, e, k), (rh, rl, ih, il) in zip(fx, slots):
            d = (e - k * s_exp) - e0
            if m == 0 or d < -1070:
                continue  # zeros are the params default
            put_dd(rh, rl, _math.ldexp(m.real, d))
            put_dd(ih, il, _math.ldexp(m.imag, d))
        params[0, Q_NSKIP] = series.n_skip
        params[0, Q_SE0] = e0
    elif series is not None and series.n_skip > 1 and series.n_skip < L \
            and _series_f32_representable(series):
        put_dd(Q_AR, Q_ARL, series.a.real)
        put_dd(Q_AI, Q_AIL, series.a.imag)
        put_dd(Q_BR, Q_BRL, series.b.real)
        put_dd(Q_BI, Q_BIL, series.b.imag)
        put_dd(Q_CR, Q_CRL, series.c.real)
        put_dd(Q_CI, Q_CIL, series.c.imag)
        params[0, Q_NSKIP] = series.n_skip
    else:
        # julia iterates from index 0 (delta_0 = dc references Z_0, the
        # view center); Mandelbrot peels update 0 (delta_1 = dc, Z_0 = 0)
        params[0, Q_AR], params[0, Q_NSKIP] = 1.0, (0.0 if julia else 1.0)
        # scaled default: A'=1 at e0=-s reduces the init horner to
        # delta_1 = dc_m · 2^-s exactly
        params[0, Q_SE0] = -s_exp
    params[0, Q_FIRST] = 1.0
    if julia:
        # the orbit tables hold the drift D = Z - Z0, so the reference
        # start Z0 must come from the caller
        assert julia_z0 is not None, "julia mode requires julia_z0"
        put_dd(Q_Z0XH, Q_Z0XL, float(julia_z0[0]))
        put_dd(Q_Z0YH, Q_Z0YL, float(julia_z0[1]))
    params[0, Q_PP] = phoenix_p
    params[0, Q_RR] = phoenix_r
    if aa_stack is not None:
        # the stacked map is self-contained (segments start at stacked
        # row 0); the band's global first row only enters the pixel
        # mapping, via Q_AROW0
        params[0, Q_ROW0] = 0.0
        params[0, Q_AROW0] = row0
    else:
        params[0, Q_ROW0] = row0

    operands = (jnp.asarray(params), jnp.asarray(orbit_re),
                jnp.asarray(orbit_im), jnp.asarray(mag2),
                jnp.asarray(orbit_re_lo), jnp.asarray(orbit_im_lo),
                jnp.asarray(orbit_re_ex), jnp.asarray(orbit_im_ex))
    call_kw = dict(
        width=width, height=out_h, map_height=map_h,
        orbit_cap=cap, tile=tuple(tile), chunk=chunk,
        interpret=bool(interpret),
        float_continuation=bool(float_continuation),
        dd_delta=bool(dd_delta), orbit_hbm=bool(orbit_hbm),
        scaled=bool(scaled_delta), julia=bool(julia), ship=bool(ship),
        phoenix=bool(phoenix), aa_stack=aa_stack)
    def _unstack(arr):
        # (S*seg_h, W) -> (S, height, W): drop each segment's tile padding
        if aa_stack is None:
            return arr
        spp_, seg_h_, aa_h_, _fullh = aa_stack
        return jnp.reshape(arr, (spp_ * spp_, seg_h_, width))[:, :aa_h_]

    if track_err:
        assert ship and (dd_delta or scaled_delta) and rebase \
            and rebase_inkernel, \
            "track_err is the ship dd/scaled-tier error ledger " \
            "(rebase in-kernel)"
    if rebase:
        call_kw.pop("float_continuation")
        call_kw["max_passes"] = int(max_passes)
        call_kw["inkernel"] = bool(rebase_inkernel)
        if track_err:
            call_kw["track_err"] = True
        if _build_only:
            return operands, call_kw
        outs = _pert_rebase_call(*operands, **call_kw)
        n, zx, zy, glitch, want, passes = outs[:6]
        res = {"n": _unstack(n), "zx": _unstack(zx), "zy": _unstack(zy),
               "glitch": _unstack(glitch), "want": _unstack(want),
               "passes": passes}
        k = 6
        if call_kw.get("inkernel", True):
            res["rounds_plane"] = outs[6]  # per-tile in-kernel rounds
            k = 7
        if track_err:
            res["errx"] = _unstack(outs[k])
        return res
    if _build_only:
        return operands, call_kw
    n, zx, zy, glitch = _pert_call(*operands, **call_kw)
    return {"n": n, "zx": zx, "zy": zy, "glitch": glitch}
