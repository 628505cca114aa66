"""Pallas Mandelbulb march kernel — per-tile raymarching with local early
exit.

The XLA lax-loop implementation (models/mandelbulb.py) synchronizes its
march and DE loops at *image* granularity: every step runs until the
slowest pixel of the whole frame converges, and every intermediate array
round-trips HBM.  This kernel marches a (th, tw) VMEM tile instead, so a
tile of sky pixels exits after a handful of steps while bulb-surface tiles
keep stepping — the same divergence argument as ops/escape.py, applied to
raymarching.

Inverse trig inside the kernel uses ops/trig.py approximations (~2e-6 abs)
because Mosaic does not lower atan/atan2/acos.

Outputs: hit (f32 0/1), t, d_hit, esc_hit, and (with in_kernel_shading)
normals + ambient occlusion — leaving only the palette/lighting arithmetic
(pure elementwise) to XLA.  The 11 extra DE evaluations for normals/AO are
cheap in-kernel: non-hit lanes' DE escapes in a couple of iterations, and
hit-heavy tiles amortize like the march itself.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bulb_math as bm
from . import trig
from .pallas_utils import cdiv, default_interpret

(B_ROX, B_ROY, B_ROZ, B_FOV, B_POWER, B_LIMIT, B_OFFX, B_OFFY,
 B_ROW0) = range(9)
NB = 9


DE_CHUNK = 4  # DE iterations per cross-lane any() check

# Over-relaxed sphere tracing (Keinert et al., "Enhanced Sphere Tracing"):
# while far from the surface, step OMEGA x the reference's conservative
# 0.5*d radius; if the consecutive safe spheres fail to overlap
# (step > r_prev + r_cur) the gap may hide a surface crossing, so the lane
# reverts to the conservative position and latches relaxation OFF — from
# that point its trajectory is exactly the reference march.  Relaxation is
# only attempted while d > RELAX_CUTOFF x the hit threshold, so the final
# surface approach (which sets hit t / d_hit / esc_hit) is always taken at
# reference step sizes.
OMEGA = 1.6
RELAX_CUTOFF = 8.0


def _step_fn(int_power):
    """DE step selector: static integer powers (the default — the animated
    camera's dynamic power is integer whenever time == 0) run the trig-free
    complex-squaring step; otherwise the ops/trig polynomial path.  The
    returned step accepts the carried |z| as ``r`` (see _de_tile)."""
    if int_power is not None:
        return lambda zx, zy, zz, dr, px, py, pz, power, act, r=None: \
            bm.de_step_int(jnp, zx, zy, zz, dr, px, py, pz, int_power,
                           act, r=r)
    acos_fn = lambda v: trig.acos(jnp, v)
    atan2_fn = lambda a, b: trig.atan2(jnp, a, b)
    return lambda zx, zy, zz, dr, px, py, pz, power, act, r=None: \
        bm.de_step(jnp, zx, zy, zz, dr, px, py, pz, power, act,
                   acos_fn, atan2_fn, r=r)


def _de_tile(px, py, pz, power, limit, int_power=None, work=None):
    """In-kernel DE + escape iteration over a tile.

    ``work`` (stats only): a per-lane f32 accumulator of USEFUL (active)
    iterations; when passed, the return gains ``work + own_active_iters``
    — the per-lane ideal-cost numerator for the divergence-waste ratio.

    No boolean loop carries (Mosaic cannot yield i1 vectors): the active
    mask is *derived* each step from the frozen z — once |z| leaves
    [1e-4, 2] the freeze makes the predicate latch — and the escape
    iteration uses a -1 sentinel instead of a carried flag.  Iterations run
    in chunks of DE_CHUNK per while round so the cross-lane any()
    reduction amortizes (the per-step mask predication makes overshoot
    iterations no-ops)."""
    shape = px.shape
    step_fn = _step_fn(int_power)

    # |z| is CARRIED between iterations: the activity mask, the step's
    # spherical math, and the escape test all need it, and recomputing it
    # in each place cost three sqrt+reductions per iteration.  The carried
    # value equals the recomputed one bit-for-bit (same frozen z).
    def act_of(i, r):
        return (r <= 2.0) & (r >= 1e-4) & (i < limit)

    def cond(s):
        i, zx, zy, zz, dr, esc, r = s[:7]
        return (i < limit) & jnp.any(act_of(i, r))

    def body(s):
        def step(_, s):
            i, zx, zy, zz, dr, esc, r = s[:7]
            act = act_of(i, r)
            nzx, nzy, nzz, dr, _ = step_fn(zx, zy, zz, dr, px, py,
                                           pz, power, act, r)
            # Record the escape in the SAME step whose update created it —
            # recording at the top of the next step (as the golden loop is
            # written) made the value depend on whether other lanes kept
            # the loop alive.  Cap at limit-1 to match the golden loop's
            # last top-of-iteration check.
            rn = jnp.sqrt(nzx * nzx + nzy * nzy + nzz * nzz)
            esc = jnp.where((esc < 0.0) & act & (rn > 2.0)
                            & (i + 1 < limit),
                            (i + 1).astype(jnp.float32), esc)
            nxt = (i + 1, nzx, nzy, nzz, dr, esc, rn)
            if len(s) > 7:   # per-lane useful-work counter (stats)
                nxt = nxt + (s[7] + act.astype(jnp.float32),)
            return nxt

        return jax.lax.fori_loop(0, DE_CHUNK, step, s)

    r0 = jnp.sqrt(px * px + py * py + pz * pz)
    # initial visibility (golden records escaped_now at top of step 0)
    esc0 = jnp.where(r0 > 2.0, jnp.zeros(shape, jnp.float32),
                     jnp.full(shape, -1.0, jnp.float32))
    s0 = (jnp.int32(0), px, py, pz, jnp.ones(shape, jnp.float32), esc0,
          r0)
    if work is not None:
        s0 = s0 + (jnp.zeros(shape, jnp.float32),)
    fin = jax.lax.while_loop(cond, body, s0)
    i, zx, zy, zz, dr, esc, r = fin[:7]
    # never-recorded lanes (non-escaping, or first visible at i == limit)
    # report limit — identical to the golden/_de_jax init value
    esc = jnp.where(esc < 0.0, limit.astype(jnp.float32), esc)
    if work is not None:
        return bm.de_finish(jnp, r, dr), esc, i, work + fin[7]
    return bm.de_finish(jnp, r, dr), esc, i


def _de_tile_multi(ps, power, limit, int_power=None):
    """Fused multi-point DE: every position's orbit iterates in ONE while
    loop (state is the concatenation of all orbits), so P sequential
    tile-local loops — each paying its own any() reductions and slowest-
    lane wait — collapse into one loop bounded by the slowest lane overall.
    Used for the 4 normal-difference and 8 AO evaluations of in-kernel
    shading.  Returns the list of DE values (no escape tracking — the
    march already recorded esc_hit).

    dr-overflow exit (EXACT): once dr reaches f32 +inf it stays +inf
    while the lane is active (the recurrence dr ← p·r^(p-1)·dr + 1 has
    p·r^(p-1) ≥ 8e-28 > 0 for active r ∈ [1e-4, 2]), and de_finish then
    returns 0.5·log(r)·r/inf = ±0 REGARDLESS of how r evolves after —
    and no consumer here distinguishes -0.0 from +0.0 (normals subtract
    zeros; AO computes exp(-10·±0) = 1).  Freezing the lane at overflow
    is therefore bit-identical to running it to the limit, and it cuts
    the slowest near-surface orbits (which never escape and previously
    always ran all ``limit`` iterations) to the ~26-70 iterations dr
    takes to overflow.  The march's _de_tile can NOT use this: its
    accepted eval's escape iteration feeds the surface color, so the
    orbit must run to escape-or-limit."""
    step_fn = _step_fn(int_power)
    P_ = len(ps)

    def act_of(i, r, dr):
        return (r <= 2.0) & (r >= 1e-4) & (i < limit) & (dr < jnp.inf)

    def cond(s):
        i = s[0]
        any_act = jnp.bool_(False)
        for k in range(P_):
            zx, zy, zz, dr, r = s[1 + k]
            any_act |= jnp.any(act_of(i, r, dr))
        return (i < limit) & any_act

    def body(s):
        def step(_, s):
            i = s[0]
            out = [i + 1]
            for k in range(P_):
                zx, zy, zz, dr, r = s[1 + k]
                act = act_of(i, r, dr)
                zx, zy, zz, dr, _ = step_fn(
                    zx, zy, zz, dr, ps[k][0], ps[k][1], ps[k][2],
                    power, act, r)
                rn = jnp.sqrt(zx * zx + zy * zy + zz * zz)
                out.append((zx, zy, zz, dr, rn))
            return tuple(out)

        return jax.lax.fori_loop(0, DE_CHUNK, step, s)

    shape = ps[0][0].shape
    s0 = tuple([jnp.int32(0)]
               + [(px, py, pz, jnp.ones(shape, jnp.float32),
                   jnp.sqrt(px * px + py * py + pz * pz))
                  for (px, py, pz) in ps])
    s = jax.lax.while_loop(cond, body, s0)
    out = []
    for k in range(P_):
        zx, zy, zz, dr, r = s[1 + k]
        out.append(bm.de_finish(jnp, r, dr))
    return out, s[0]


# cone-pass params: the shared 9 plus the coarse pixel stride and the
# cone half-angle (radians per unit t of block radius)
C_STEP, C_BETA = 9, 10
NCB = 11


def _make_cone_kernel(width: int, map_height: int, tile: Tuple[int, int],
                      int_power=None):
    """Coarse cone-march prepass: ONE ray per (cs x cs) pixel block,
    marched with the hit threshold inflated to max(thr(t), 3·beta·t)
    where beta bounds the angular radius of the block's ray bundle.

    Sphere-tracing safety argument: along the coarse trajectory every
    eval satisfied d(s) > 3·beta·s, and any full-res ray in the block
    sits within beta·s of the coarse ray at parameter s, so its own DE
    is > 2·beta·s > its hit threshold (beta > 1e-3 at real block sizes)
    — the full-res ray provably cannot hit before the cone's stop t.
    Full-res rays therefore START at the cone's stop t, skipping the
    far-field steps (whose short escape orbits still cost whole-tile
    DE-loop trips).  NaN stops fall back to t = 0.001 (full march).

    The prepass runs the same tile/band hooks as the main kernel (row0
    in units of COARSE rows), so banded giants and shard_map bands see
    bit-identical coarse inputs to the monolithic render.

    FLAT schedule (round 5): one while loop carries each coarse lane's
    own orbit and restarts it — with the full cone-march update — the
    moment that orbit finishes, exactly like _flat_march vs the nested
    march-step x _de_tile form.  Per-lane trajectories are unchanged
    (same eval positions, same stop logic, MAX_STEPS eval cap per lane
    == the nested global trip cap since every active lane evals once
    per nested trip).  The orbit activity test additionally freezes a
    lane once dr overflows to +inf: de_finish then returns ±0 no matter
    how the orbit evolves (the dr recurrence keeps dr at +inf while
    active — see _de_tile_multi), and the consumers here (isfinite,
    d < thr, d > MAX_DIST, d*0.5 on non-stopped lanes) cannot
    distinguish ±0, so the early exit is bit-exact while cutting
    near-surface orbits from ``limit`` to the ~26-70 steps dr takes to
    overflow."""
    th, tw = tile

    def kernel(params_ref, t0_ref):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        row0 = params_ref[0, B_ROW0]
        cs = params_ref[0, C_STEP]
        beta = params_ref[0, C_BETA]
        # int iota + convert: Mosaic's tpu.iota only produces integers
        rows = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                + ti * th).astype(jnp.float32)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
                + tj * tw).astype(jnp.float32)
        ro = (params_ref[0, B_ROX], params_ref[0, B_ROY],
              params_ref[0, B_ROZ])
        fov = params_ref[0, B_FOV]
        power = params_ref[0, B_POWER]
        limit_f = params_ref[0, B_LIMIT]
        # block-center pixel coordinates in FULL-image units
        pxf = cols * cs + params_ref[0, B_OFFX] + (cs - 1.0) * 0.5
        pyf = (rows + row0) * cs + params_ref[0, B_OFFY] + (cs - 1.0) * 0.5
        rdx, rdy, rdz = bm.ray_dirs(jnp, pxf, pyf, width, map_height,
                                    ro, fov)
        step_fn = _step_fn(int_power)
        shape = (th, tw)

        def orbit_act(done_f, oi, r, dr):
            return (done_f == 0.0) & (r <= 2.0) & (r >= 1e-4) \
                & (oi < limit_f) & (dr < jnp.inf)

        def cond(s):
            done_f = s[2]
            return jnp.any(done_f == 0.0)

        def body(s):
            (mstep, t, done_f, bad_f, oi, ozx, ozy, ozz, odr, orr,
             opx, opy, opz) = s

            def ostep(_, os_):
                oi, zx, zy, zz, dr, r = os_
                act = orbit_act(done_f, oi, r, dr)
                zx, zy, zz, dr, _ = step_fn(zx, zy, zz, dr, opx, opy,
                                            opz, power, act, r)
                rn = jnp.sqrt(zx * zx + zy * zy + zz * zz)
                oi = oi + act.astype(jnp.float32)
                return (oi, zx, zy, zz, dr, rn)

            oi, ozx, ozy, ozz, odr, orr = jax.lax.fori_loop(
                0, DE_CHUNK, ostep, (oi, ozx, ozy, ozz, odr, orr))

            ofin = (done_f == 0.0) & ~orbit_act(done_f, oi, orr, odr)
            d = bm.de_finish(jnp, orr, odr)
            bad = ~jnp.isfinite(d)
            thr = jnp.maximum(jnp.maximum(jnp.float32(1e-4), 1e-3 * t),
                              3.0 * beta * t)
            stop = ofin & (bad | (d < thr) | (t > bm.MAX_DIST)
                           | (d > bm.MAX_DIST))
            bad_f = jnp.maximum(bad_f, (ofin & bad).astype(jnp.float32))
            mstep = mstep + ofin.astype(jnp.float32)
            done_f = jnp.maximum(
                done_f,
                (stop | (ofin & (mstep >= jnp.float32(bm.MAX_STEPS))))
                .astype(jnp.float32))
            still = ofin & ~stop
            t = jnp.where(still, t + jnp.maximum(d * 0.5, 0.0005), t)
            # restart the orbit at the stepped position
            cont = ofin & (done_f == 0.0)
            opx = jnp.where(cont, ro[0] + rdx * t, opx)
            opy = jnp.where(cont, ro[1] + rdy * t, opy)
            opz = jnp.where(cont, ro[2] + rdz * t, opz)
            r0 = jnp.sqrt(opx * opx + opy * opy + opz * opz)
            ozx = jnp.where(cont, opx, ozx)
            ozy = jnp.where(cont, opy, ozy)
            ozz = jnp.where(cont, opz, ozz)
            odr = jnp.where(cont, jnp.float32(1.0), odr)
            oi = jnp.where(cont, jnp.float32(0.0), oi)
            orr = jnp.where(cont, r0, orr)
            return (mstep, t, done_f, bad_f, oi, ozx, ozy, ozz, odr,
                    orr, opx, opy, opz)

        z = jnp.zeros(shape, jnp.float32)
        t0 = jnp.full(shape, 0.001, jnp.float32)
        px0 = ro[0] + rdx * t0
        py0 = ro[1] + rdy * t0
        pz0 = ro[2] + rdz * t0
        r0 = jnp.sqrt(px0 * px0 + py0 * py0 + pz0 * pz0)
        s0 = (z, t0, z, z, z, px0, py0, pz0,
              jnp.ones(shape, jnp.float32), r0, px0, py0, pz0)
        fin = jax.lax.while_loop(cond, body, s0)
        t, bad_f = fin[1], fin[3]
        t0_ref[:, :] = jnp.where(bad_f > 0.0, jnp.float32(0.001), t)

    return kernel


@functools.partial(jax.jit, static_argnames=("width", "map_height",
                                             "coarse_h", "coarse_w",
                                             "tile", "interpret",
                                             "int_power"))
def _cone_call(params, *, width, map_height, coarse_h, coarse_w, tile,
               interpret, int_power=None):
    th, tw = tile
    grid = (cdiv(coarse_h, th), cdiv(coarse_w, tw))
    kernel = _make_cone_kernel(width, map_height, tile, int_power)
    out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((coarse_h, coarse_w), jnp.float32),
        interpret=interpret,
    )(params)


def _flat_march(tile, ro, rd, t_init, in_bounds, power, limit,
                int_power=None):
    """Flattened sphere-trace: one while loop, each lane carrying its own
    orbit (position, z, dr, per-lane iteration index) and restarting it —
    with the full march/relaxation update — the moment the orbit ends.

    Per-lane trajectories are IDENTICAL to the nested march-step x
    _de_tile form (same positions, same frozen-z latching, same
    relax/overshoot state machine), so outputs are bit-equal; only the
    cross-lane schedule changes.  The tile's loop trip count drops from
    Σ_steps max-lane(orbit length) to max-lane(Σ own orbit lengths) —
    the measured 2.13x divergence waste of the nested form (bench
    round 5).

    March orbits additionally take the EXACT dr-overflow exit (round 5):
    once dr reaches f32 +inf it stays +inf while active, so de_finish
    returns ±0 regardless of how the orbit would have continued — and
    every consumer of d here (isfinite, the d < threshold hit test, the
    d > MAX_DIST out test, rad = 0.5*d, the step max(d*0.5, 0.0005))
    treats -0.0 and +0.0 alike, so the t/hit trajectory is bit-equal to
    full-length orbits.  The march therefore does NOT track escape
    iterations (the one thing the overflow exit changes): the caller
    recovers esc_hit by re-running ONE full-length orbit at the accepted
    hit position (_de_tile — same function, same input, same esc), which
    costs one tile-loop instead of paying full-length orbits at EVERY
    near-surface march eval.

    Returns (t, hit_f, d_hit)."""
    th, tw = tile
    rdx, rdy, rdz = rd
    step_fn = _step_fn(int_power)
    limit_f = limit.astype(jnp.float32)
    shape = (th, tw)

    def orbit_act(done_f, oi, r, dr):
        return (done_f == 0.0) & (r <= 2.0) & (r >= 1e-4) \
            & (oi < limit_f) & (dr < jnp.inf)

    def cond(s):
        done_f = s[2]
        return jnp.any(done_f == 0.0)

    def body(s):
        (mstep, t, done_f, hit_f, d_hit, prev_step, prev_rad,
         relax_f, rel_prev, oi, ozx, ozy, ozz, odr, orr,
         opx, opy, opz) = s

        def ostep(_, os_):
            oi, zx, zy, zz, dr, r = os_
            act = orbit_act(done_f, oi, r, dr)
            zx, zy, zz, dr, _ = step_fn(zx, zy, zz, dr, opx, opy, opz,
                                        power, act, r)
            # inactive lanes keep frozen z (step_fn where-masks), so rn
            # equals their carried r bit-for-bit — same as _de_tile
            rn = jnp.sqrt(zx * zx + zy * zy + zz * zz)
            oi = oi + act.astype(jnp.float32)
            return (oi, zx, zy, zz, dr, rn)

        oi, ozx, ozy, ozz, odr, orr = jax.lax.fori_loop(
            0, DE_CHUNK, ostep, (oi, ozx, ozy, ozz, odr, orr))

        # lanes whose orbit just finished process their march update
        ofin = (done_f == 0.0) & ~orbit_act(done_f, oi, orr, odr)
        d = bm.de_finish(jnp, orr, odr)
        bad = ~jnp.isfinite(d)
        rad = 0.5 * d
        over_b = ofin & (rel_prev > 0.0) \
            & (bad | (prev_step > prev_rad + rad))
        usable = ofin & ~over_b
        threshold = jnp.maximum(jnp.float32(1e-4), 1e-3 * t)
        hit_now = usable & ~bad & (d < threshold)
        hit_f = jnp.maximum(hit_f, hit_now.astype(jnp.float32))
        d_hit = jnp.where(hit_now, d, d_hit)
        out = (t > bm.MAX_DIST) | (d > bm.MAX_DIST)
        ended = hit_now | (usable & (bad | out))
        mstep = mstep + ofin.astype(jnp.float32)
        # per-lane MAX_STEPS cap == the nested loop's global bound: every
        # lane there performs at most MAX_STEPS evals, hit processed on
        # the last one before the cap applies
        capped = usable & ~ended & (mstep >= jnp.float32(bm.MAX_STEPS))
        done_f = jnp.maximum(done_f,
                             (ended | capped).astype(jnp.float32))
        still = usable & ~ended & ~capped
        relax_now = (relax_f > 0.0) & (d > RELAX_CUTOFF * threshold)
        step_n = jnp.maximum(jnp.where(relax_now, OMEGA * rad, rad),
                             jnp.float32(0.0005))
        t = jnp.where(still, t + step_n,
                      jnp.where(over_b, t - prev_step + prev_rad, t))
        prev_step = jnp.where(still, step_n,
                              jnp.where(over_b, prev_rad, prev_step))
        prev_rad = jnp.where(still, rad, prev_rad)
        relax_f = jnp.where(over_b, jnp.zeros_like(relax_f), relax_f)
        rel_prev = jnp.where(
            still, relax_now.astype(jnp.float32),
            jnp.where(over_b, jnp.zeros_like(rel_prev), rel_prev))

        # restart the orbit at the new position for lanes still marching
        cont = ofin & (done_f == 0.0)
        opx = jnp.where(cont, ro[0] + rdx * t, opx)
        opy = jnp.where(cont, ro[1] + rdy * t, opy)
        opz = jnp.where(cont, ro[2] + rdz * t, opz)
        r0 = jnp.sqrt(opx * opx + opy * opy + opz * opz)
        ozx = jnp.where(cont, opx, ozx)
        ozy = jnp.where(cont, opy, ozy)
        ozz = jnp.where(cont, opz, ozz)
        odr = jnp.where(cont, jnp.float32(1.0), odr)
        oi = jnp.where(cont, jnp.float32(0.0), oi)
        orr = jnp.where(cont, r0, orr)
        return (mstep, t, done_f, hit_f, d_hit, prev_step,
                prev_rad, relax_f, rel_prev, oi, ozx, ozy, ozz, odr,
                orr, opx, opy, opz)

    done0 = jnp.where(in_bounds, 0.0, 1.0).astype(jnp.float32)
    px0 = ro[0] + rdx * t_init
    py0 = ro[1] + rdy * t_init
    pz0 = ro[2] + rdz * t_init
    r0 = jnp.sqrt(px0 * px0 + py0 * py0 + pz0 * pz0)
    z = jnp.zeros(shape, jnp.float32)
    s0 = (z, t_init, done0, z, z,
          z, jnp.full(shape, jnp.inf, jnp.float32),
          jnp.ones(shape, jnp.float32), z,
          z, px0, py0, pz0, jnp.ones(shape, jnp.float32), r0,
          px0, py0, pz0)
    fin = jax.lax.while_loop(cond, body, s0)
    return fin[1], fin[3], fin[4]


def _flat_shade(h, d0, ks, power, limit, hitm, int_power=None):
    """Flattened shading: each HIT lane walks its 11 shading orbits —
    3 normal-difference taps then 8 AO taps — SEQUENTIALLY in ONE while
    loop (a phase counter selects the tap), computing its normal the
    moment phase 2 completes and accumulating exp(-10*d_k) in k order
    through phases 3-10.  Returns (nx, ny, nz, ao).

    vs the round-4 schedule (fused 3-orbit normal group, then a separate
    8-phase AO walk): the fused group issues 3 x max(len) orbit steps
    per lane where sum(len) is needed, and the two loops serialize —
    max-lane(normal sum) + max-lane(AO sum).  One 11-phase walk runs
    max-lane(TOTAL sum): strictly fewer tile trips, same per-trip cost.

    Per-tap orbit math, freeze semantics (incl. the dr-overflow exact
    exit shared with _de_tile_multi), tap-start positions (the fused
    form's exact expressions: h + eps basis offsets, then h + n*k), the
    normal finite-difference/normalize expressions, and the k-ordered
    accumulation all match the fused forms, so nx/ny/nz/ao are
    BIT-IDENTICAL on every HIT lane (asserted in
    tests/test_mandelbulb.py::test_flat_paths_match_nested).

    Non-hit lanes never enter the loop: parked at (3,0,0) their orbits
    are all dead on arrival, so the fused forms give every non-hit lane
    one constant pseudo-normal and AO — replicated here as a scalar
    chain (within 1 ulp of the vector form's transcendentals; the
    values are never consumed: sky pixels take the sky color)."""
    hx, hy, hz = h
    step_fn = _step_fn(int_power)
    limit_f = limit.astype(jnp.float32)
    P_ = 3 + len(ks)
    shape = hx.shape
    eps = jnp.float32(1e-3)
    # normal-tap positions: the fused form's exact expressions
    ntaps = [(hx + eps, hy, hz), (hx, hy + eps, hz), (hx, hy, hz + eps)]

    def orbit_act(phase, oi, r, dr):
        return (phase < float(P_)) & (r <= 2.0) & (r >= 1e-4) \
            & (oi < limit_f) & (dr < jnp.inf)

    def cond(s):
        phase = s[0]
        return jnp.any(phase < float(P_))

    def body(s):
        (phase, dxp, dyp, dzp, nx, ny, nz, ao,
         opx, opy, opz, ozx, ozy, ozz, odr, orr, oi) = s

        def ostep(_, os_):
            oi, zx, zy, zz, dr, r = os_
            act = orbit_act(phase, oi, r, dr)
            zx, zy, zz, dr, _ = step_fn(zx, zy, zz, dr, opx, opy, opz,
                                        power, act, r)
            rn = jnp.sqrt(zx * zx + zy * zy + zz * zz)
            oi = oi + act.astype(jnp.float32)
            return (oi, zx, zy, zz, dr, rn)

        oi, ozx, ozy, ozz, odr, orr = jax.lax.fori_loop(
            0, DE_CHUNK, ostep, (oi, ozx, ozy, ozz, odr, orr))

        ofin = (phase < float(P_)) & ~orbit_act(phase, oi, orr, odr)
        d = bm.de_finish(jnp, orr, odr)
        dxp = jnp.where(ofin & (phase == 0.0), d, dxp)
        dyp = jnp.where(ofin & (phase == 1.0), d, dyp)
        dzp = jnp.where(ofin & (phase == 2.0), d, dzp)
        ao = jnp.where(ofin & (phase >= 3.0), ao + jnp.exp(-10.0 * d),
                       ao)
        phase = phase + ofin.astype(jnp.float32)
        # lanes whose phase just became 3 have all three difference DEs:
        # compute their normal with the fused form's expressions
        nsel = ofin & (phase == 3.0)
        nxr = dxp - d0
        nyr = dyp - d0
        nzr = dzp - d0
        nl = jnp.sqrt(nxr * nxr + nyr * nyr + nzr * nzr)
        fb = nl < 1e-4
        nl = jnp.maximum(nl, 1e-12)
        nx = jnp.where(nsel,
                       jnp.where(fb, jnp.zeros_like(nxr), nxr / nl), nx)
        ny = jnp.where(nsel,
                       jnp.where(fb, jnp.ones_like(nyr), nyr / nl), ny)
        nz = jnp.where(nsel,
                       jnp.where(fb, jnp.zeros_like(nzr), nzr / nl), nz)
        # next tap position by phase: normal basis offsets, then h + n*k
        cont = ofin & (phase < float(P_))
        tx, ty, tz = ntaps[0]
        for i in range(1, 3):
            sel = phase >= float(i)
            tx = jnp.where(sel, ntaps[i][0], tx)
            ty = jnp.where(sel, ntaps[i][1], ty)
            tz = jnp.where(sel, ntaps[i][2], tz)
        for i, kk in enumerate(ks):
            sel = phase >= float(3 + i)
            kf = jnp.float32(kk)
            tx = jnp.where(sel, hx + nx * kf, tx)
            ty = jnp.where(sel, hy + ny * kf, ty)
            tz = jnp.where(sel, hz + nz * kf, tz)
        opx = jnp.where(cont, tx, opx)
        opy = jnp.where(cont, ty, opy)
        opz = jnp.where(cont, tz, opz)
        r0 = jnp.sqrt(opx * opx + opy * opy + opz * opz)
        ozx = jnp.where(cont, opx, ozx)
        ozy = jnp.where(cont, opy, ozy)
        ozz = jnp.where(cont, opz, ozz)
        odr = jnp.where(cont, jnp.float32(1.0), odr)
        orr = jnp.where(cont, r0, orr)
        oi = jnp.where(cont, jnp.float32(0.0), oi)
        return (phase, dxp, dyp, dzp, nx, ny, nz, ao,
                opx, opy, opz, ozx, ozy, ozz, odr, orr, oi)

    px0, py0, pz0 = ntaps[0]
    r0 = jnp.sqrt(px0 * px0 + py0 * py0 + pz0 * pz0)
    phase0 = jnp.where(hitm, 0.0, float(P_)).astype(jnp.float32)
    z = jnp.zeros(shape, jnp.float32)
    s0 = (phase0, z, z, z, z, jnp.ones(shape, jnp.float32), z, z,
          px0, py0, pz0, px0, py0, pz0, jnp.ones(shape, jnp.float32),
          r0, z)
    fin = jax.lax.while_loop(cond, body, s0)
    nx_hit, ny_hit, nz_hit, ao_hit = fin[4], fin[5], fin[6], fin[7]
    # Non-hit constant, replicated expression-for-expression: parked at
    # (3,0,0) with d0 = d_hit = 0, the normal-difference orbits are all
    # dead on arrival (r0 > 2 -> d = de_finish(r0, 1)), giving every
    # non-hit lane the SAME pseudo-normal; each tap then sits at
    # (3,0,0) + n*k, also dead on arrival.  The k-ordered sequential
    # sum of constants equals the fused form's per-lane sum bit-for-bit.
    far = jnp.float32(3.0)
    zero = jnp.float32(0.0)
    eps = jnp.float32(1e-3)
    one = jnp.float32(1.0)

    def dead_de(px, py, pz):
        return bm.de_finish(
            jnp, jnp.sqrt(px * px + py * py + pz * pz), one)

    nxr = dead_de(far + eps, zero, zero) - zero
    nyr = dead_de(far, zero + eps, zero) - zero
    nzr = dead_de(far, zero, zero + eps) - zero
    nl = jnp.sqrt(nxr * nxr + nyr * nyr + nzr * nzr)
    fb = nl < 1e-4
    nl = jnp.maximum(nl, 1e-12)
    nxc = jnp.where(fb, zero, nxr / nl)
    nyc = jnp.where(fb, one, nyr / nl)
    nzc = jnp.where(fb, zero, nzr / nl)
    ao_far = jnp.float32(0.0)
    for kk in ks:
        kf = jnp.float32(kk)
        ao_far = ao_far + jnp.exp(-10.0 * dead_de(
            far + nxc * kf, zero + nyc * kf, zero + nzc * kf))
    return (jnp.where(hitm, nx_hit, nxc), jnp.where(hitm, ny_hit, nyc),
            jnp.where(hitm, nz_hit, nzc), jnp.where(hitm, ao_hit, ao_far))


def _make_kernel(width: int, height: int, map_height: int,
                 tile: Tuple[int, int],
                 shade: bool = False, int_power=None, stats: bool = False,
                 has_t0: bool = False):
    """``map_height``: full-image height for the camera mapping;
    ``height``: rows this call renders.  A row-band shard passes its global
    first row in B_ROW0 (same hooks as ops/escape.py) — gather-free
    multi-chip decomposition.

    ``stats``: emit cost instrumentation (per-lane march end step, per-tile
    DE-loop trip totals for march and shading) — the tile-granularity cost
    model is trips x tile lanes, so these outputs measure divergence waste
    directly (DESIGN.md roofline section)."""
    th, tw = tile

    def kernel(params_ref, *out_refs):
        if has_t0:
            t0_ref, out_refs = out_refs[0], out_refs[1:]
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        row0 = params_ref[0, B_ROW0].astype(jnp.int32)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                + ti * th + row0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tj * tw
        in_bounds = (rows < map_height) & (cols < width) \
            & (rows - row0 < height)

        ro = (params_ref[0, B_ROX], params_ref[0, B_ROY],
              params_ref[0, B_ROZ])
        fov = params_ref[0, B_FOV]
        power = params_ref[0, B_POWER]
        limit = params_ref[0, B_LIMIT].astype(jnp.int32)

        pxf = cols.astype(jnp.float32) + params_ref[0, B_OFFX]
        pyf = rows.astype(jnp.float32) + params_ref[0, B_OFFY]
        # shared camera-basis math: models/mandelbulb rebuilds hit
        # positions from the kernel's t via the same helper, so the two
        # must stay bit-identical
        rdx, rdy, rdz = bm.ray_dirs(jnp, pxf, pyf, width, map_height,
                                    ro, fov)

        # f32 status flags instead of bool carries (Mosaic i1 limitation):
        # hit_f: 1.0 once converged; done_f: 1.0 once terminated (hit, NaN,
        # or out of range).
        def cond(s):
            step, t, hit_f, done_f, d_hit, esc_hit = s[:6]
            return (step < bm.MAX_STEPS) & jnp.any(done_f == 0.0)

        def body(s):
            (step, t, hit_f, done_f, d_hit, esc_hit, prev_step, prev_rad,
             relax_f, rel_prev) = s[:10]
            work = None
            if stats:
                de_trips, mstep, work = s[10:]
            act = done_f == 0.0
            # Done lanes park at r=3 (inactive from DE step 0, like the
            # shading evals) instead of sitting at their hit position —
            # a hit lane's near-surface orbit never escapes, so ONE hit
            # lane used to force every later march step's DE loop to the
            # full iteration limit for the whole tile.  d/esc of non-act
            # lanes are ignored below, so this is semantically free.
            far = jnp.float32(3.0)
            de_out = _de_tile(jnp.where(act, ro[0] + rdx * t, far),
                              jnp.where(act, ro[1] + rdy * t, 0.0),
                              jnp.where(act, ro[2] + rdz * t, 0.0),
                              power, limit, int_power, work=work)
            d, esc, de_i = de_out[:3]
            if stats:
                work = de_out[3]
            bad = ~jnp.isfinite(d)
            rad = 0.5 * d
            # Overshoot: the previous RELAXED step (rel_prev latched when
            # it was taken — the 0.0005 minimum step must never trip
            # this) jumped farther than the two safe spheres cover.
            # Revert to the conservative position, discard this eval (its
            # position may sit PAST the surface — a hit test there would
            # latch a back-face hit), and latch relaxation off for this
            # lane.  NaN d on a relaxed step also reverts (the reference
            # march never visited that position, so its NaN-break must
            # not apply); NaN on a conservative step ends the lane
            # exactly as the reference does.
            over_b = act & (rel_prev > 0.0) \
                & (bad | (prev_step > prev_rad + rad))
            usable = act & ~over_b
            threshold = jnp.maximum(jnp.float32(1e-4), 1e-3 * t)
            hit_now = usable & ~bad & (d < threshold)
            hit_f = jnp.maximum(hit_f, hit_now.astype(jnp.float32))
            d_hit = jnp.where(hit_now, d, d_hit)
            esc_hit = jnp.where(hit_now, esc, esc_hit)
            out = (t > bm.MAX_DIST) | (d > bm.MAX_DIST)
            ended = hit_now | (usable & (bad | out))
            done_f = jnp.maximum(done_f, ended.astype(jnp.float32))
            still = usable & ~ended
            # next step: relaxed while comfortably far from the surface,
            # else the reference's conservative safe radius
            relax_now = (relax_f > 0.0) & (d > RELAX_CUTOFF * threshold)
            step_n = jnp.maximum(jnp.where(relax_now, OMEGA * rad, rad),
                                 jnp.float32(0.0005))
            t = jnp.where(still, t + step_n,
                          jnp.where(over_b, t - prev_step + prev_rad, t))
            prev_step = jnp.where(still, step_n,
                                  jnp.where(over_b, prev_rad, prev_step))
            prev_rad = jnp.where(still, rad, prev_rad)
            relax_f = jnp.where(over_b, jnp.zeros_like(relax_f), relax_f)
            rel_prev = jnp.where(
                still, relax_now.astype(jnp.float32),
                jnp.where(over_b, jnp.zeros_like(rel_prev), rel_prev))
            nxt = (step + 1, t, hit_f, done_f, d_hit, esc_hit, prev_step,
                   prev_rad, relax_f, rel_prev)
            if stats:
                mstep = jnp.where(ended & (mstep < 0.0),
                                  (step + 1).astype(jnp.float32), mstep)
                nxt = nxt + (de_trips + de_i, mstep, work)
            return nxt

        t_init = (jnp.maximum(t0_ref[:, :], jnp.float32(0.001))
                  if has_t0 else jnp.full((th, tw), 0.001, jnp.float32))
        if not stats:
            # FLAT march (round 5): ONE while loop carries each lane's
            # own orbit and restarts it the moment IT finishes, instead
            # of the nested march-step x DE-loop whose inner loop runs
            # to the slowest lane at EVERY march step.  The per-lane
            # eval positions, orbit math, and march updates are the
            # nested form's exactly (verified bit-identical on the
            # validation scenes), but the tile's trip count drops from
            # sum-over-steps of max-lane orbit length to max-lane TOTAL
            # work — measured 2.13x issued/ideal waste in the nested
            # form at 1080p/100.  The stats variant keeps the nested
            # loop (its per-step instrumentation defines the waste
            # metric this replaces).
            t, hit_f, d_hit = _flat_march(
                (th, tw), ro, (rdx, rdy, rdz), t_init, in_bounds, power,
                limit, int_power)
            # esc recovery: march orbits take the exact dr-overflow
            # exit and drop escape tracking (see _flat_march), so the
            # accepted eval's escape iteration is recomputed by ONE
            # full-length orbit at the hit position — the same function
            # (_de_tile) on the same input the nested march's accepted
            # eval ran, hence the same esc bit-for-bit.  Non-hit lanes
            # park at r=3 (dead on arrival, esc 0 == the nested init).
            hitm0 = hit_f > 0.5
            far0 = jnp.float32(3.0)
            _, esc_rec, _ = _de_tile(
                jnp.where(hitm0, ro[0] + rdx * t, far0),
                jnp.where(hitm0, ro[1] + rdy * t, jnp.float32(0.0)),
                jnp.where(hitm0, ro[2] + rdz * t, jnp.float32(0.0)),
                power, limit, int_power)
            esc_hit = jnp.where(hitm0, esc_rec,
                                jnp.zeros((th, tw), jnp.float32))
        else:
            s0 = (jnp.int32(0), t_init,
                  jnp.zeros((th, tw), jnp.float32),
                  jnp.where(in_bounds, 0.0, 1.0).astype(jnp.float32),
                  jnp.zeros((th, tw), jnp.float32),
                  jnp.zeros((th, tw), jnp.float32),
                  jnp.zeros((th, tw), jnp.float32),
                  jnp.full((th, tw), jnp.inf, jnp.float32),
                  jnp.ones((th, tw), jnp.float32),
                  jnp.zeros((th, tw), jnp.float32))
            s0 = s0 + (jnp.int32(0), jnp.full((th, tw), -1.0, jnp.float32),
                       jnp.zeros((th, tw), jnp.float32))
            fin = jax.lax.while_loop(cond, body, s0)
            (mst, t, hit_f, _, d_hit, esc_hit) = (
                fin[0], fin[1], fin[2], fin[3], fin[4], fin[5])
            de_trips, mstep, work_pl = fin[10:]
            mstep = jnp.where(mstep < 0.0, mst.astype(jnp.float32), mstep)

        it = iter(out_refs)
        next(it)[:, :] = hit_f
        next(it)[:, :] = t
        next(it)[:, :] = d_hit
        next(it)[:, :] = esc_hit

        if shade:
            # Shading DE positions are masked to HIT lanes (non-hit lanes
            # move to r=3 where the orbit is inactive from step 0).  The
            # production path walks all 11 shading orbits (3 normal taps
            # + 8 AO taps) per lane sequentially in ONE flat loop
            # (_flat_shade); the stats path keeps the round-4 fused
            # multi-point groups (_de_tile_multi) as the instrumented
            # baseline the flat walk is asserted bit-identical against.
            hitm = hit_f > 0.5
            far = jnp.float32(3.0)
            hx = jnp.where(hitm, ro[0] + rdx * t, far)
            hy = jnp.where(hitm, ro[1] + rdy * t, jnp.float32(0.0))
            hz = jnp.where(hitm, ro[2] + rdz * t, jnp.float32(0.0))
            eps = jnp.float32(1e-3)
            # The base DE d0 = DE(hit pos) is NOT re-evaluated: the march
            # recorded d_hit from the accepted eval at this exact
            # position, so d0 == d_hit bit-for-bit — and that orbit is
            # the group's slowest (a hit-position orbit never escapes,
            # running to the full iteration limit), so dropping it also
            # unbinds the loop trip counts.
            d0 = d_hit
            # AO loop (mandelbulb.comp:156-157): the shader's f32
            # accumulation for(k=0.01; k<0.15; k+=0.02) runs EIGHT taps —
            # the last k is 0.14999998f, still < 0.15f — at the
            # accumulated (slightly drifted) f32 offsets; mirror both.
            ks = []
            k = np.float32(0.01)
            while k < np.float32(0.15):
                ks.append(float(k))
                k = np.float32(k + np.float32(0.02))
            if stats:
                # normals by forward differences (mandelbulb.comp:113-123)
                (dxp, dyp, dzp), n_i = _de_tile_multi(
                    [(hx + eps, hy, hz), (hx, hy + eps, hz),
                     (hx, hy, hz + eps)], power, limit, int_power)
                nx = dxp - d0
                ny = dyp - d0
                nz = dzp - d0
                nl = jnp.sqrt(nx * nx + ny * ny + nz * nz)
                fb = nl < 1e-4
                nl = jnp.maximum(nl, 1e-12)
                nx = jnp.where(fb, jnp.zeros_like(nx), nx / nl)
                ny = jnp.where(fb, jnp.ones_like(ny), ny / nl)
                nz = jnp.where(fb, jnp.zeros_like(nz), nz / nl)
                ds, ao_i = _de_tile_multi(
                    [(hx + nx * jnp.float32(kk), hy + ny * jnp.float32(kk),
                      hz + nz * jnp.float32(kk)) for kk in ks],
                    power, limit, int_power)
                ao = jnp.zeros((th, tw), jnp.float32)
                for dk in ds:
                    ao = ao + jnp.exp(-10.0 * dk)
            else:
                # flat sequential 11-tap walk — bit-identical on hit
                # lanes, one loop instead of two serialized groups
                nx, ny, nz, ao = _flat_shade(
                    (hx, hy, hz), d0, ks, power, limit, hitm, int_power)
            next(it)[:, :] = nx
            next(it)[:, :] = ny
            next(it)[:, :] = nz
            next(it)[:, :] = ao

        if stats:
            # per-tile scalars broadcast over the tile: march DE-loop
            # trips (x tile lanes = predicated orbit-step cost) and the
            # shading groups' orbit-step cost (3 normal + 8 AO orbits);
            # ``work`` is the per-LANE useful (active) march iteration
            # count — max-over-tile(work) vs de_trips is the issued/ideal
            # divergence-waste ratio that decides scheduling changes
            next(it)[:, :] = jnp.full((th, tw), 1.0, jnp.float32) \
                * de_trips.astype(jnp.float32)
            next(it)[:, :] = mstep
            next(it)[:, :] = work_pl
            if shade:
                next(it)[:, :] = jnp.full((th, tw), 1.0, jnp.float32) \
                    * n_i.astype(jnp.float32)
                next(it)[:, :] = jnp.full((th, tw), 1.0, jnp.float32) \
                    * ao_i.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("width", "height",
                                             "map_height",
                                             "tile", "interpret", "shade",
                                             "int_power", "stats"))
def _march_call(params, t0=None, *, width, height, map_height, tile,
                interpret, shade=False, int_power=None, stats=False):
    th, tw = tile
    grid = (cdiv(height, th), cdiv(width, tw))
    kernel = _make_kernel(width, height, map_height, tile,
                          shade, int_power, stats, has_t0=t0 is not None)
    n_out = (8 if shade else 4) + ((5 if shade else 3) if stats else 0)
    out_shapes = tuple(jax.ShapeDtypeStruct((height, width), jnp.float32)
                       for _ in range(n_out))
    out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = (params,)
    if t0 is not None:
        in_specs.append(out_spec)
        args = (params, t0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_spec for _ in out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)


def march_fields(width: int, height: int, *, ro, fov, power, max_iter: int,
                 offset=(0.0, 0.0), tile=(64, 128), shade: bool = False,
                 row0=0.0, map_height: Optional[int] = None,
                 int_power="auto", cone: int = 8,
                 interpret: Optional[bool] = None, stats: bool = False):
    """Tile-local raymarch; returns dict(hit, t, d, esc [, nx, ny, nz, ao])
    as f32 fields.  ``row0`` may be a traced scalar (shard_map band
    rendering); static params stay a host numpy array.

    ``cone``: coarse block size for the cone-march prepass (0 disables).
    One conservatively-thresholded coarse ray per cone x cone block gives
    every full-res ray a provably-safe starting depth (_make_cone_kernel
    docstring has the bound), skipping the far-field march steps.  The
    coarse grid is IMAGE-aligned (block row index floor(global_row/cone)),
    so row bands at any offset reproduce the monolithic render's coarse
    inputs exactly and banded exports stay band-size-invariant.

    ``stats`` adds cost instrumentation fields: ``de_trips`` (per-tile
    march DE-loop iterations, broadcast over the tile — x tile lanes =
    predicated orbit-step cost), ``msteps`` (per-lane march steps), and
    with ``shade`` also ``n_trips``/``ao_trips`` (normal-/AO-group loop
    iterations, per tile) and ``work`` (per-lane useful iterations)."""
    if interpret is None:
        interpret = default_interpret()
    # ro/fov/power/row0 may be traced scalars (one compile serves a whole
    # animation); the layout matches (B_ROX..B_ROW0) = range(9)
    params_dev = jnp.stack([
        jnp.asarray(ro[0], jnp.float32), jnp.asarray(ro[1], jnp.float32),
        jnp.asarray(ro[2], jnp.float32), jnp.asarray(fov, jnp.float32),
        jnp.asarray(power, jnp.float32),
        jnp.float32(max(1, int(max_iter))),
        jnp.asarray(offset[0], jnp.float32),
        jnp.asarray(offset[1], jnp.float32),
        jnp.asarray(row0, jnp.float32),
    ]).reshape(1, NB)
    if int_power == "auto":
        # Static integer powers (2..16, the clamp range) take the trig-free
        # DE step — the default scene (power 8, time 0) always does.  Only
        # decidable for a host-float power; traced callers pass their own
        # static int_power (or None).
        pw = float(power)
        int_power = int(pw) if pw.is_integer() and 2.0 <= pw <= 16.0             else None
    map_h = int(map_height if map_height is not None else height)
    t0 = None
    cone = int(cone)
    if cone:
        cs = jnp.float32(cone)
        row0f = jnp.asarray(row0, jnp.float32)
        start_c = jnp.floor(row0f / cs)
        beta = (jnp.asarray(fov, jnp.float32)
                * jnp.float32((0.75 * cone + 1.0) / map_h))
        coarse_w = cdiv(width, cone)
        coarse_h = cdiv(height, cone) + 1  # +1: band start inside a block
        cone_params = jnp.concatenate([
            params_dev[0, :B_ROW0],
            jnp.stack([start_c, cs, beta])]).reshape(1, NCB)
        tc = _cone_call(
            cone_params, width=width, map_height=map_h,
            coarse_h=coarse_h, coarse_w=coarse_w,
            tile=(64, 128), interpret=bool(interpret),
            int_power=int_power)
        # expand to the band's full resolution (image-aligned indices)
        frac = row0f - start_c * cs  # row0 mod cone, exact for int rows
        ridx = ((frac + jnp.arange(height, dtype=jnp.float32))
                // cs).astype(jnp.int32)
        cidx = jnp.arange(width) // cone
        t0 = tc[ridx][:, cidx]
    outs = _march_call(
        params_dev, t0, width=width, height=height,
        map_height=map_h,
        tile=tuple(tile),
        interpret=bool(interpret), shade=bool(shade), int_power=int_power,
        stats=bool(stats))
    names = ["hit", "t", "d", "esc"] + (["nx", "ny", "nz", "ao"]
                                        if shade else [])
    if stats:
        names += ["de_trips", "msteps", "work"] \
            + (["n_trips", "ao_trips"] if shade else [])
    return dict(zip(names, outs))
