"""Pallas escape-time field kernels — the TPU replacement for the reference's
GLSL compute shaders (shaders/mandelbrot.comp, julia.comp, burning_ship.comp,
phoenix.comp; dispatch geometry: src/compute_effect_manager.h:462-467).

Design (SURVEY.md §7):
- One kernel skeleton parameterized by a per-family iteration *step*,
  gridded over VMEM-resident pixel tiles.
- Masked early exit: a tile iterates in CHUNK-sized bursts of predicated
  updates and stops as soon as every pixel in it has escaped — exterior
  tiles finish in a few bursts while interior tiles run to max_iter, which
  is what makes the 1 Gpix/s target reachable on the VPU.
- Escaped pixels freeze their (n, z, aux) state via selects, matching the
  per-thread early `break` of the GPU shaders bit-for-bit; iteration counts
  are tested for exact integer equality against reference/golden.py.
- All pixel math is f32 with the shaders' operation order (see ops/mapping).

Outputs per pixel:
  n  (int32) — index of the escaping update, or max_iter if never escaped
  zx, zy (f32) — z after the escaping update (or after max_iter updates)
  trap (f32, optional) — orbit-trap minimum (family-specific definition)
  stripe (f32, optional) — burning-ship stripe accumulator
  dzx, dzy (f32, optional) — derivative dz/dc at escape (mandelbrot only;
      dz <- 2*z*dz + 1, the distance-estimation tracking of the reference's
      debug shader, mandelbrot_debug.comp:114-137)

With ``fused_color`` set the kernel instead emits color planes r/g/b
(coloring + optionally the post chain run in the kernel epilogue on the
VMEM-resident tile — see escape_fields).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mapping
from .pallas_utils import cdiv, default_interpret, pick_tile

# Scalar-parameter vector layout (SMEM). One flat f32 vector keeps the kernel
# signature uniform across families.
P_CX, P_CY, P_ZOOM, P_OFFX, P_OFFY, P_BAIL2, P_LIMIT = range(7)
P_A0, P_A1, P_A2, P_A3 = 7, 8, 9, 10
P_ROW0 = 11  # global row of this shard's first output row (multi-chip)
# fused-coloring dynamic params (only read when fused_color is set)
P_COFF, P_CSCALE, P_BRIGHT, P_SAT, P_CONTRAST, P_BAILOUT = range(12, 18)
P_STRIPE = 18  # phoenix flow-stripe control (stripe_density, fused path)
NPARAMS = 19

FAMILIES = ("mandelbrot", "julia", "burning_ship", "phoenix")


def _iter_chunk(family: str, track_trap: bool, track_stripe: bool,
                track_deriv: bool,
                chunk: int, state: dict, consts):
    """Run `chunk` predicated iterations over a dict-shaped carry.

    Formulation (chosen for minimum VPU ops per iteration):
    - ``sqx``/``sqy`` carry the squares of the current z, so the escape
      magnitude is one add and the next update reuses them.
    - The escape latch is ``sqx + sqy <= bail2`` on the *frozen* state: the
      escaping update is applied while the pre-update z was still inside, and
      afterwards the frozen z keeps the predicate false forever — bit-exact
      GLSL early-`break` semantics with no separate alive bookkeeping.
    - ``nf`` counts survived steps as f32; the caller peels update 0 (always
      applied per the shaders) and fixes up interior pixels to ``limit``.
    - All loop-carried vectors are f32 (Mosaic cannot carry i1 vectors).
    """
    cr, ci, add_re, add_im, bail2, limit, pp, rr, trap_r, stripe_d = consts

    def body(k, s):
        del k
        s = dict(s)
        zx, zy, sqx, sqy, i = s["zx"], s["zy"], s["sqx"], s["sqy"], s["i"]
        mag2 = sqx + sqy
        alive = (mag2 <= bail2) & (i < limit)
        s["nf"] = s["nf"] + alive.astype(jnp.float32)

        if family == "burning_ship":
            # traps/stripes use the PRE-update z (burning_ship.comp:228-238)
            if track_trap:
                dist = jnp.sqrt(mag2)
                t = jnp.abs(dist - trap_r)
                s["trap"] = jnp.where(alive, jnp.minimum(s["trap"], t),
                                      s["trap"])
            if track_stripe:
                s["stripe"] = jnp.where(
                    alive, s["stripe"] + jnp.sin(zy * stripe_d), s["stripe"])
            # |zx|^2 == zx^2 and (2|zx|)|zy| == 2|zx*zy| bit-exactly (the
            # scale by 2 is exact), so the abs folds into one op on the
            # product.
            x = sqx - sqy + cr
            y = jnp.abs((2.0 * zx) * zy) + ci
        elif family == "phoenix":
            # phoenix.comp:63-67 — two-term recurrence
            x = sqx - sqy + add_re + rr * s["px"] + pp * zx
            y = (2.0 * zx) * zy + add_im + rr * s["py"] + pp * zy
            s["px"] = jnp.where(alive, zx, s["px"])
            s["py"] = jnp.where(alive, zy, s["py"])
        else:  # mandelbrot / julia: z <- z^2 + c
            x = sqx - sqy + cr
            y = (2.0 * zx) * zy + ci

        if track_deriv:
            # dz <- 2*z*dz + 1 with the PRE-update z (debug shader DE)
            ndx = 2.0 * (zx * s["dzx"] - zy * s["dzy"]) + 1.0
            ndy = 2.0 * (zx * s["dzy"] + zy * s["dzx"])
            s["dzx"] = jnp.where(alive, ndx, s["dzx"])
            s["dzy"] = jnp.where(alive, ndy, s["dzy"])

        zx = jnp.where(alive, x, zx)
        zy = jnp.where(alive, y, zy)

        if family == "mandelbrot" and track_trap:
            # combined trap on the updated z (mandelbrot.comp:162-166)
            nsqx = zx * zx
            nsqy = zy * zy
            mag = jnp.sqrt(nsqx + nsqy)
            d_axes = jnp.minimum(jnp.abs(zx), jnp.abs(zy))
            dxc = zx - cr
            dyc = zy - ci
            d_c = jnp.sqrt(dxc * dxc + dyc * dyc)
            t = jnp.minimum(mag, jnp.minimum(d_axes, d_c))
            s["trap"] = jnp.where(alive, jnp.minimum(s["trap"], t), s["trap"])
            s["sqx"] = nsqx
            s["sqy"] = nsqy
        else:
            s["sqx"] = zx * zx
            s["sqy"] = zy * zy
        s["zx"] = zx
        s["zy"] = zy
        s["i"] = i + 1
        return s

    return jax.lax.fori_loop(0, chunk, body, state)


def _cardioid_or_bulb(cr, ci):
    """Analytic main-cardioid / period-2-bulb membership (exact interior:
    these points mathematically never escape).  q = (x-1/4)^2 + y^2;
    cardioid: q*(q + (x-1/4)) <= y^2/4; bulb: (x+1)^2 + y^2 <= 1/16."""
    xq = cr - 0.25
    y2 = ci * ci
    q = xq * xq + y2
    in_cardioid = q * (q + xq) <= 0.25 * y2
    xb = cr + 1.0
    in_bulb = xb * xb + y2 <= 0.0625
    return in_cardioid | in_bulb


def _make_kernel(family: str, width: int, height: int, map_height: int,
                 max_iter_cap: int,
                 track_trap: bool, track_stripe: bool, use_julia: bool,
                 tile: Tuple[int, int], chunk: int,
                 interior_skip: bool = False, track_deriv: bool = False,
                 fused_color=None):
    """``height`` is the local output extent (a row band when sharded);
    ``map_height`` is the full image height used by the pixel→plane mapping
    and bounds; params[P_ROW0] carries the band's global first row."""
    th, tw = tile

    def kernel(params_ref, *out_refs):
        tj = pl.program_id(1)
        ti = pl.program_id(0)
        row0 = params_ref[0, P_ROW0].astype(jnp.int32)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                + ti * th + row0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tj * tw
        pyf = rows.astype(jnp.float32)
        pxf = cols.astype(jnp.float32)

        cx = params_ref[0, P_CX]
        cy = params_ref[0, P_CY]
        zoom = params_ref[0, P_ZOOM]
        offx = params_ref[0, P_OFFX]
        offy = params_ref[0, P_OFFY]
        bail2 = params_ref[0, P_BAIL2]
        # the static cap is REAL: the traced limit is clamped to it (and
        # to the f32 counter ceiling), so an oversized iter_limit can't
        # saturate the f32 nf counter into wrong counts
        limit_f = jnp.minimum(
            params_ref[0, P_LIMIT],
            jnp.float32(min(max_iter_cap, (1 << 24) - 1)))
        limit = limit_f.astype(jnp.int32)
        a0 = params_ref[0, P_A0]
        a1 = params_ref[0, P_A1]
        a2 = params_ref[0, P_A2]
        a3 = params_ref[0, P_A3]

        if family == "mandelbrot":
            cr, ci = mapping.map_centered(jnp, pxf, pyf, width, map_height,
                                          cx, cy, zoom, offx, offy)
            zx0 = jnp.zeros((th, tw), jnp.float32)
            zy0 = jnp.zeros((th, tw), jnp.float32)
            add_re = add_im = jnp.float32(0.0)
        elif family == "julia":
            zr, zi = mapping.map_uv(jnp, pxf, pyf, width, map_height,
                                    cx, cy, zoom, offx, offy)
            zx0, zy0 = zr, zi
            cr = jnp.broadcast_to(a0, (th, tw))
            ci = jnp.broadcast_to(a1, (th, tw))
            add_re = add_im = jnp.float32(0.0)
        else:  # burning_ship / phoenix: c from pixel via uv mapping
            cr, ci = mapping.map_uv(jnp, pxf, pyf, width, map_height,
                                    cx, cy, zoom, offx, offy)
            zx0 = jnp.zeros((th, tw), jnp.float32)
            zy0 = jnp.zeros((th, tw), jnp.float32)
            if family == "phoenix" and use_julia:
                # Julia mode ignores the pixel constant (phoenix.comp:64-65)
                add_re, add_im = a0, a1
            else:
                add_re, add_im = cr, ci

        pp = a2 if family == "phoenix" else jnp.float32(0.0)
        rr = a3 if family == "phoenix" else jnp.float32(0.0)
        trap_r = a0 if family == "burning_ship" else jnp.float32(0.0)
        stripe_d = a1 if family == "burning_ship" else jnp.float32(0.0)
        consts = (cr, ci, add_re, add_im, bail2, limit, pp, rr, trap_r,
                  stripe_d)

        # ---- Peel update 0: the shaders always apply the first update
        # before any escape check, even when |z0| is already past bailout
        # (julia.comp:230-241).
        sqx0 = zx0 * zx0
        sqy0 = zy0 * zy0
        if family == "burning_ship":
            x1 = sqx0 - sqy0 + cr
            y1 = jnp.abs((2.0 * zx0) * zy0) + ci
        elif family == "phoenix":
            x1 = sqx0 - sqy0 + add_re + rr * 0.0 + pp * zx0
            y1 = (2.0 * zx0) * zy0 + add_im + rr * 0.0 + pp * zy0
        else:
            x1 = sqx0 - sqy0 + cr
            y1 = (2.0 * zx0) * zy0 + ci

        # Out-of-bounds lanes (partial edge tiles / padded shard rows) get
        # poisoned squares so the escape latch is false from step 1.
        in_bounds = (rows < map_height) & (cols < width) \
            & (rows - row0 < height)
        live0 = in_bounds
        if interior_skip:
            # Provably-interior pixels (main cardioid / period-2 bulb) skip
            # all iteration; they are restored as n=limit, z=0 at the end.
            # Only enabled when nothing downstream consumes interior z
            # (no stripes / orbit traps / trap-glow interior).
            skip = _cardioid_or_bulb(cr, ci)
            live0 = live0 & ~skip
        big = jnp.float32(3.4e38)
        # Dead lanes must be poisoned through Z ITSELF, not just the
        # squares: the loop body recomputes sqx/sqy from the frozen z every
        # step, so poisoning only sq is washed out after one iteration and
        # in-set skip/OOB lanes would rejoin and iterate to the limit
        # (correct output — the epilogue fixups mask them — but the entire
        # interior-skip saving silently vanishes).  zx=big makes the
        # recomputed sqx overflow to +inf, which latches the lane dead
        # forever.
        state0 = {
            "zx": jnp.where(live0, x1, big),
            "zy": jnp.where(live0, y1, jnp.float32(0.0)),
            "sqx": jnp.where(live0, x1 * x1, big),
            "sqy": jnp.where(live0, y1 * y1, big),
            "nf": jnp.zeros((th, tw), jnp.float32),
            "i": jnp.int32(1),
        }
        if family == "phoenix":
            state0["px"] = zx0
            state0["py"] = zy0
        if track_trap:
            if family == "mandelbrot":
                # trap of update 0 (on z1), mandelbrot.comp:162-166
                mag = jnp.sqrt(x1 * x1 + y1 * y1)
                d_axes = jnp.minimum(jnp.abs(x1), jnp.abs(y1))
                dxc = x1 - cr
                dyc = y1 - ci
                d_c = jnp.sqrt(dxc * dxc + dyc * dyc)
                state0["trap"] = jnp.minimum(
                    jnp.full((th, tw), 1e20, jnp.float32),
                    jnp.minimum(mag, jnp.minimum(d_axes, d_c)))
            else:
                # burning ship pre-update-0 trap on z0 = 0:
                # min(1e10, |sqrt(0) - r|) = |r| (burning_ship.comp:230-233)
                state0["trap"] = jnp.full((th, tw), 1.0, jnp.float32) * \
                    jnp.minimum(jnp.float32(1e10), jnp.abs(0.0 - trap_r))
        if track_stripe:
            # pre-update-0 stripe term sin(0 * d) = 0
            state0["stripe"] = jnp.zeros((th, tw), jnp.float32)
        if track_deriv:
            # after update 0: dz_1 = 2*z0*dz0 + 1 = 1 (z0 = dz0 = 0)
            state0["dzx"] = jnp.ones((th, tw), jnp.float32)
            state0["dzy"] = jnp.zeros((th, tw), jnp.float32)

        def cond(carry):
            s, keep = carry
            return (s["i"] < limit) & keep

        def body(carry):
            s, _ = carry
            s = _iter_chunk(family, track_trap, track_stripe, track_deriv,
                            chunk, s, consts)
            return s, jnp.any(s["sqx"] + s["sqy"] <= bail2)

        s, _ = jax.lax.while_loop(cond, body, (state0, jnp.bool_(True)))

        # Interior pixels (never escaped) report n = limit; escaped pixels
        # report the survived-step count, which equals the GLSL loop index at
        # break.  OOB lanes report 0 (their writes are clipped anyway).
        interior = (s["sqx"] + s["sqy"] <= bail2) & in_bounds
        n = jnp.where(interior, limit,
                      s["nf"].astype(jnp.int32) * in_bounds.astype(jnp.int32))
        zx_out = s["zx"]
        zy_out = s["zy"]
        if interior_skip:
            skip = _cardioid_or_bulb(cr, ci) & in_bounds
            n = jnp.where(skip, limit, n)
            zx_out = jnp.where(skip, jnp.float32(0.0), zx_out)
            zy_out = jnp.where(skip, jnp.float32(0.0), zy_out)

        if fused_color is not None:
            # In-kernel coloring (no trap/stripe paths): the planar colorers
            # run the exact per-channel math of the XLA path on the VMEM-
            # resident tile, so the n/zx/zy fields never round-trip HBM.
            # with_post also applies enhance/ACES/gamma (single-AA-sample
            # renders — the post chain follows the sample average, so AA>1
            # emits pre-post-chain sample planes instead).
            from . import coloring as _col

            palette_mode, interior_style, clamp_mins, with_post = fused_color
            # the clamped limit, matching the n the loop produced — an
            # oversized traced limit must not unmoor the interior test
            cp = _col.ColorParams(
                max_iterations=limit_f,
                bailout=params_ref[0, P_BAILOUT],
                palette_mode=palette_mode,
                color_offset=params_ref[0, P_COFF],
                color_scale=params_ref[0, P_CSCALE],
                interior_style=interior_style,
                phoenix_stripe_control=params_ref[0, P_STRIPE])
            if family == "mandelbrot":
                r, g, b = _col.color_mandelbrot_planar(
                    jnp, n, zx_out, zy_out,
                    jnp.full((th, tw), 1e20, jnp.float32), cp)
            elif family == "burning_ship":
                r, g, b = _col.color_burning_ship_planar(
                    jnp, n, zx_out, zy_out,
                    jnp.full((th, tw), 1e10, jnp.float32),
                    jnp.zeros((th, tw), jnp.float32), cp)
            elif family == "phoenix":
                # flow stripes via the polynomial atan2 (ops/trig.py) —
                # the unfused XLA path uses the same expression
                r, g, b = _col.color_phoenix_planar(jnp, n, zx_out, zy_out,
                                                    cp)
            else:  # julia
                r, g, b = _col.color_julia_planar(jnp, n, zx_out, zy_out, cp)
            if with_post:
                r, g, b = _col.post_chain_planar(
                    jnp, r, g, b, params_ref[0, P_BRIGHT],
                    params_ref[0, P_SAT], params_ref[0, P_CONTRAST],
                    clamp_mins=clamp_mins)
            it = iter(out_refs)
            next(it)[:, :] = r
            next(it)[:, :] = g
            next(it)[:, :] = b
            return

        it = iter(out_refs)
        next(it)[:, :] = n
        next(it)[:, :] = zx_out
        next(it)[:, :] = zy_out
        if track_trap:
            next(it)[:, :] = s["trap"]
        if track_stripe:
            next(it)[:, :] = s["stripe"]
        if track_deriv:
            next(it)[:, :] = s["dzx"]
            next(it)[:, :] = s["dzy"]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("family", "width", "height", "map_height",
                     "max_iter_cap",
                     "track_trap", "track_stripe", "use_julia", "tile",
                     "chunk", "interpret", "interior_skip", "track_deriv",
                     "fused_color"))
def _escape_call(params, *, family: str, width: int, height: int,
                 map_height: int,
                 max_iter_cap: int, track_trap: bool, track_stripe: bool,
                 use_julia: bool, tile: Tuple[int, int], chunk: int,
                 interpret: bool, interior_skip: bool, track_deriv: bool,
                 fused_color=None):
    th, tw = tile
    grid = (cdiv(height, th), cdiv(width, tw))
    kernel = _make_kernel(family, width, height, map_height, max_iter_cap,
                          track_trap, track_stripe, use_julia, tile, chunk,
                          interior_skip, track_deriv, fused_color)

    if fused_color is not None:
        out_shapes = [jax.ShapeDtypeStruct((height, width), jnp.float32)
                      for _ in range(3)]  # r, g, b
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((height, width), jnp.int32),   # n
            jax.ShapeDtypeStruct((height, width), jnp.float32),  # zx
            jax.ShapeDtypeStruct((height, width), jnp.float32),  # zy
        ]
    if track_trap:
        out_shapes.append(jax.ShapeDtypeStruct((height, width), jnp.float32))
    if track_stripe:
        out_shapes.append(jax.ShapeDtypeStruct((height, width), jnp.float32))
    if track_deriv:
        out_shapes.append(jax.ShapeDtypeStruct((height, width), jnp.float32))
        out_shapes.append(jax.ShapeDtypeStruct((height, width), jnp.float32))

    out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    flops_per_iter = {"mandelbrot": 10, "julia": 10, "burning_ship": 12,
                      "phoenix": 14}[family]
    cost = pl.CostEstimate(
        flops=width * height * max_iter_cap * flops_per_iter,
        bytes_accessed=width * height * 4 * len(out_shapes),
        transcendentals=(width * height * max_iter_cap
                         if track_stripe else 0),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(out_spec for _ in out_shapes),
        out_shape=tuple(out_shapes),
        cost_estimate=cost,
        interpret=interpret,
    )(params)


def escape_fields(family: str, width: int, height: int, *,
                  center_x, center_y, zoom, max_iter: int,
                  bailout=4.0, offset=(0.0, 0.0),
                  julia_c=(0.0, 0.0), phoenix_p=0.0, phoenix_r=0.0,
                  use_julia: bool = False,
                  trap_radius=0.5, stripe_density=10.0,
                  track_trap: bool = False, track_stripe: bool = False,
                  iter_limit=None, tile=None, chunk: int = 16,
                  row0=0.0, map_height: Optional[int] = None,
                  interior_skip: bool = False, track_deriv: bool = False,
                  fused_color=None, color_offset=0.0, color_scale=1.0,
                  brightness=1.0, saturation=1.2, contrast=1.1,
                  interpret=None) -> Dict[str, jax.Array]:
    """Compute escape-time fields for one AA sample.

    ``max_iter`` is the static compile-time cap; ``iter_limit`` (traced,
    defaults to max_iter) allows batched renders with per-frame iteration
    counts without recompiling.  For multi-chip row-band sharding pass the
    band's global first row as ``row0`` (traced) and the full image height
    as ``map_height``; the output still covers ``height`` local rows.

    ``fused_color``: a static ``(palette_mode, interior_style, clamp_mins,
    with_post)`` tuple enabling in-kernel coloring (all four 2D families;
    no trap/stripe/deriv tracking) — the kernel then returns
    color planes {"r","g","b"} instead of fields, and the n/zx/zy arrays
    never round-trip HBM.  ``with_post`` (default True if the tuple has 3
    elements) additionally applies enhance/ACES/gamma in the kernel —
    correct ONLY for single-AA-sample renders; multi-sample callers MUST
    pass with_post=False and run the post chain after averaging the sample
    planes.  ``color_offset``/``color_scale`` and the enhance scalars feed
    this path (traced).
    """
    if fused_color is not None:
        assert family in FAMILIES \
            and not track_trap and not track_stripe and not track_deriv, \
            "fused coloring needs a plain (no trap/stripe/deriv) render"
        assert not (family == "mandelbrot" and int(fused_color[1]) == 2), \
            "mandelbrot interior_style 2 (trap glow) reads the tracked " \
            "trap field — the fused path feeds a placeholder; use the " \
            "unfused pipeline (models/common gates this automatically)"
        fused_color = (int(fused_color[0]), int(fused_color[1]),
                       bool(fused_color[2]),
                       bool(fused_color[3]) if len(fused_color) > 3
                       else True)
    if family not in FAMILIES:
        raise ValueError(f"unknown family {family!r}")
    if max_iter >= 1 << 24:
        # the per-pixel counter nf is f32: n+1 == n past 2^24
        raise ValueError("max_iter must be < 2^24 (f32 counter precision)")
    if interpret is None:
        interpret = default_interpret()
    if tile is None:
        # Mandelbrot's analytic interior skip makes in-tile divergence
        # cheap, so eliminating the padded partial grid row wins there
        # (see pick_tile); dust-like families keep the divergence-tuned
        # base tile.
        tile = pick_tile(height, width,
                         prefer_divisor=(family == "mandelbrot"))
    if iter_limit is None:
        iter_limit = max_iter

    if family == "phoenix":
        bail2 = 4.0  # fixed bailout (phoenix.comp:77)
        a = (julia_c[0], julia_c[1], phoenix_p, phoenix_r)
    elif family == "julia":
        bail2 = jnp.float32(bailout) * jnp.float32(bailout)
        a = (julia_c[0], julia_c[1], 0.0, 0.0)
    elif family == "burning_ship":
        bail2 = jnp.float32(bailout) * jnp.float32(bailout)
        a = (trap_radius, stripe_density, 0.0, 0.0)
    else:
        bail2 = jnp.float32(bailout) * jnp.float32(bailout)
        a = (0.0, 0.0, 0.0, 0.0)

    params = jnp.stack([
        jnp.float32(center_x), jnp.float32(center_y), jnp.float32(zoom),
        jnp.float32(offset[0]), jnp.float32(offset[1]),
        jnp.float32(bail2),
        # the kernel unconditionally applies update 0 (as the shaders do),
        # so a limit below 1 is meaningless
        jnp.maximum(jnp.asarray(iter_limit, jnp.float32), 1.0),
        jnp.float32(a[0]), jnp.float32(a[1]), jnp.float32(a[2]),
        jnp.float32(a[3]), jnp.asarray(row0, jnp.float32),
        jnp.float32(color_offset), jnp.float32(color_scale),
        jnp.float32(brightness), jnp.float32(saturation),
        jnp.float32(contrast), jnp.float32(bailout),
        jnp.float32(stripe_density),
    ]).reshape(1, NPARAMS)

    outs = _escape_call(
        params, family=family, width=width, height=height,
        map_height=int(map_height if map_height is not None else height),
        max_iter_cap=int(max_iter), track_trap=track_trap,
        track_stripe=track_stripe, use_julia=use_julia,
        tile=tuple(tile), chunk=chunk, interpret=bool(interpret),
        interior_skip=bool(interior_skip and family == "mandelbrot"),
        track_deriv=bool(track_deriv and family == "mandelbrot"),
        fused_color=fused_color)

    if fused_color is not None:
        return dict(zip(("r", "g", "b"), outs))
    names = ["n", "zx", "zy"]
    if track_trap:
        names.append("trap")
    if track_stripe:
        names.append("stripe")
    if track_deriv and family == "mandelbrot":
        names += ["dzx", "dzy"]
    return dict(zip(names, outs))
