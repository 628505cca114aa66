"""Deep-zoom renderer: host HP reference orbit + TPU perturbation kernel +
glitch-correcting secondary references.

Pipeline (config #4 of BASELINE.md):
1. Compute the reference orbit at the scene center in arbitrary precision
   (deepzoom/orbit.py — native C++ fixed-point or Python bignum).
2. Run the perturbation kernel (ops/perturbation.py); every pixel iterates
   only its low-precision delta on the VPU.
3. Pixels flagged by the Pauldelbrot glitch criterion are re-rendered
   against secondary reference orbits centered on a glitched pixel, up to
   ``max_references`` rounds — the correct version of what the reference
   left unwired (mandelbrot_deep_zoom.comp:253-259).
4. Color with the deep-zoom palette set (test_deep_zoom.comp:73-103); the
   reference's deep-zoom shader applies no enhance/ACES post chain.

Supersampling: scene.samples_per_pixel (1/2/4, fractal_state.h:91) renders
s^2 jittered samples per pixel with uniform subpixel offsets.
"""
from __future__ import annotations

import functools
import math
from fractions import Fraction
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..deepzoom import orbit as orbit_mod
from ..deepzoom.hp import HPFloat, precision_mode_for_zoom_frac
from ..ops import coloring
from ..ops.coloring import ColorParams
from ..ops.dd import dd_from_string
from ..ops.perturbation import perturbation_fields
from ..scene import Scene


def _dd_of(value, fallback: float) -> Tuple[float, float]:
    if value is not None:
        return dd_from_string(str(value))
    return dd_from_string(repr(float(fallback)))


def _scene_coords(scene: Scene):
    cx = scene.hp_center_x if scene.hp_center_x is not None else scene.center_x
    cy = scene.hp_center_y if scene.hp_center_y is not None else scene.center_y
    zoom = scene.hp_zoom if scene.hp_zoom is not None else scene.zoom
    return cx, cy, zoom


# Suspect threshold for the exact-dust tier: flag a pixel when its
# error ledger (log2 absolute error, ops/perturbation track_err) exceeds
# 2^-8 — an 11-bit margin below the smallest observed count-flipping
# error (errx >= 3.8 at the 1e-10/400 dust benchmark; correct pixels
# top out at 1.6).  Flags ~13% of that maximally-chaotic viewport.
_DUST_SUSPECT_LOG2 = -8.0


def render_fields(scene: Scene, width: int, height: int,
                  max_references: int = 16, glitch_tol: float = 1e-6,
                  offset: Tuple[float, float] = (0.0, 0.0),
                  force_python_orbit: bool = False,
                  orbit_cache: dict = None, mesh=None,
                  ref_center: Tuple[str, str] = None,
                  rebasing: bool = True, max_passes: int = 256,
                  aa_spp: int = 1,
                  row_band: Tuple[int, int] = None,
                  keep_device: bool = False,
                  exact_dust: bool = False,
                  debug_rounds: bool = False):
    """Returns (n, zx, zy, glitch_remaining, info dict).

    ``debug_rounds``: include the per-tile in-kernel rounds plane in
    ``info["rounds_plane"]`` (a DEVICE array — diagnostics like the
    bench_all config4 pass histogram fetch it themselves; production
    callers leave this off so info stays plain-JSON-serializable).

    ``keep_device`` (rebasing only): when no lane needs the host HP
    fallback (the normal case — rebasing is glitch-free by construction),
    return ``n/zx/zy`` as DEVICE arrays instead of fetching them to host
    (``glitch_remaining`` is then an all-False host array).  Callers that
    only need colored output keep the whole pipeline on device
    (color_fields_device below) and fetch 3 RGB planes instead of
    4·spp² field planes — the deep-zoom wall time past the kernel is
    transfer-bound over thin links.  If any fallback lane exists the
    call transparently falls back to the host (numpy) return.

    ``row_band``: optional (row0, band_h) — render only ``band_h`` rows of
    the full ``height``-tall image starting at global row ``row0`` (the
    pixel mapping, series bound, and HP fallback all keep the full-image
    geometry).  The giant-still exporter (parallel/tiled.py) streams
    poster-size deep zooms band by band through this, sharing one
    reference orbit via ``orbit_cache``.

    ``orbit_cache``: optional dict keyed by HP center strings; lets
    supersampled renders and zoom animations reuse reference orbits across
    calls (the reference recomputes only when dirty —
    deep_zoom_system.cpp:363).
    ``mesh``: a jax Mesh with a 'rows' axis routes every kernel pass through
    the gather-free row-band sharding (parallel/tiled.py).
    ``ref_center``: optional (cx, cy) decimal strings — compute/reuse the
    reference orbit at THIS point instead of the scene center and render
    via the shift mechanism (c = ref + pixel-delta + (center - ref)).
    Zoom-path animations pass the final (deepest) center here so one orbit
    serves every frame (the reference recomputes per frame,
    deep_zoom_system.cpp:454-559).
    ``rebasing`` (default): Zhuoran per-pixel rebasing — ONE reference
    orbit, no glitches by construction (device-resident multi-pass, see
    ops/perturbation._pert_rebase_call).  False selects the round-1
    pipeline: Pauldelbrot detection + secondary references + HP fallback."""
    aa_spp = int(aa_spp)
    if exact_dust:
        # Opt-in Burning Ship dust tier (DESIGN.md §8): the kernel keeps
        # a per-pixel error ledger; lanes whose carried delta error could
        # have flipped their count re-render via the exact per-pixel HP
        # fallback — oracle-exact by construction, at a host cost
        # proportional to the flagged fraction (~13% of maximally-chaotic
        # dust, ~5k px/s/400-iter on the native engine).
        if not (getattr(scene, "deep_zoom_ship", False) and rebasing):
            raise ValueError("exact_dust is the Burning Ship dust tier "
                             "(deep_zoom_ship scenes, rebasing pipeline)")
        if mesh is not None:
            raise ValueError("exact_dust does not compose with mesh "
                             "sharding yet (host fallback is per-pixel)")
    if aa_spp > 1:
        assert rebasing and offset == (0.0, 0.0), \
            "aa_spp needs the rebasing pipeline and the default offset"
        # aa_spp composes with row_band AND with mesh sharding: the
        # kernel stacks spp^2 copies of the band (or of each device's
        # band), each mapped against the full image at its global row
        # offset (ops/perturbation.py Q_AROW0 /
        # parallel/tiled.perturbation_fields_sharded)
    band_kw = {}
    row_off = 0
    if row_band is not None:
        row_off, band_h = int(row_band[0]), int(row_band[1])
        band_kw = {"row0": float(row_off), "map_height": height}
    else:
        band_h = height
    if mesh is not None:
        import functools

        from ..parallel.tiled import perturbation_fields_sharded

        # keep_device lets the sharded producer skip the numpy gather so
        # coloring/quantization stay on device (fields remain row-sharded)
        field_fn = functools.partial(perturbation_fields_sharded, mesh=mesh,
                                     keep_device=keep_device)
    else:
        field_fn = perturbation_fields
    cx, cy, zoom = _scene_coords(scene)
    zoom_fr = Fraction(str(zoom))
    zoom_f = float(zoom_fr)
    mode, bits = precision_mode_for_zoom_frac(zoom_fr)
    # Bucket the orbit precision UP to the next 64-bit step: the formula
    # (calculate_precision_bits_for_zoom) grows with every decimal digit
    # of zoom, so an interactive descent would otherwise recompute its
    # reference orbit every ~3 frames (a fresh key per bits value); the
    # bucketed orbit is computed at >= the required bits — never less
    # accurate — and one orbit serves ~19 digits of descent.
    bits = -(-bits // 64) * 64
    if exact_dust:
        # DESIGN.md §8's escalation table: dust counts pin only over a
        # high-precision orbit (96-bit deltas over a 160-bit table →
        # 6/6); the table's own recurrence error amplifies chaotically
        # just like the delta's, so the standard zoom-scaled bits are
        # not enough in this regime.  Host-side scalar cost only.
        bits = max(bits + 96, 160)
    max_iter = scene.max_iterations

    center_x_dd = _dd_of(cx, 0.0)
    center_y_dd = _dd_of(cy, 0.0)
    zoom_dd = _dd_of(zoom, 0.0)

    # Past ~1e-7 the f32 continuation c is meaningless; starved pixels are
    # flagged and re-referenced instead (see ops/perturbation.py).
    # Rebasing replaces continuation entirely (starved lanes restart on
    # orbit index 0).
    float_cont = (zoom_f > 1e-7) and not rebasing
    # Deltas iterate in double-double (f64-class mantissa) whenever f32
    # would be boundary-noisy: the reference's deep-zoom shader is dd at
    # EVERY depth (test_deep_zoom.comp:20-51), so past the f32-continuation
    # regime (1e-7) we match its precision; shallower views keep cheap f32
    # deltas (f32's 2^-24 relative error is below pixel scale there).
    # ARBITRARY mode (zoom < 1e-30, deep_zoom_system.cpp:226-249) switches
    # to floatexp deltas (dd mantissa + per-pixel exponent), which the
    # reference's MPFR tier only reached on the CPU; here the whole image
    # stays on the TPU.
    scaled = mode.name == "ARBITRARY"
    dd_delta = (zoom_f <= 1e-7) and not scaled
    # Deep Julia (beyond reference): the reference orbit starts at the view
    # center with the scene's shared c; only the rebasing algorithm
    # supports it (no Pauldelbrot/secondary-reference path).
    julia = bool(getattr(scene, "deep_zoom_julia", False))
    ship = bool(getattr(scene, "deep_zoom_ship", False))
    phoenix = bool(getattr(scene, "deep_zoom_phoenix", False))
    assert julia + ship + phoenix <= 1, \
        "pick ONE of deep_zoom_julia / _ship / _phoenix"
    # Every family reaches the floatexp (ARBITRARY) tier: Mandelbrot and
    # Phoenix via scaled deltas over absolute dd orbit tables, Burning
    # Ship via floatexp diffabs, Julia via per-entry floatexp drift
    # tables emitted as mantissa+exponent straight from the bignum engine
    # (compute_orbit emit_fx) — no depth floor for any family.
    if julia:
        assert rebasing, "deep-zoom julia requires the rebasing pipeline"
    if ship:
        assert rebasing, "deep-zoom ship requires the rebasing pipeline"
        # the armada dust flips f32-tier counts even at 1e-5 — always dd
        dd_delta = not scaled
        float_cont = False
    if phoenix:
        assert rebasing, "deep-zoom phoenix requires the rebasing pipeline"
        float_cont = False
    jc = (repr(float(scene.julia_c_real)), repr(float(scene.julia_c_imag)))

    # +1: the kernel's index-consistent escape test reads orbit[i+1], so a
    # full-strength (interior) reference needs max_iter+1 stored entries.
    def _ckey(v):
        # exact cache identity: str(HPFloat) truncates to ~24 decimal
        # digits, which collides for secondary-reference candidates whose
        # centers differ only beyond that (zoom < ~1e-21) — the probe
        # loop would then pair one candidate's orbit with another's
        # coordinates and the shift would disagree with the orbit used.
        # Strings key by exact VALUE (hp_zoomed rewrites coordinates with
        # zoom-dependent digit counts; the same center must hit the same
        # orbit across representations).
        return (v.man, v.bits) if isinstance(v, HPFloat) \
            else Fraction(str(v))

    def cached_orbit(ocx, ocy):
        # the orbit depends on the recurrence too: kind (ship/phoenix)
        # and the phoenix coefficients must key the cache, or a shared
        # orbit_cache reused across families/parameters silently serves
        # the wrong reference orbit
        key = (_ckey(ocx), _ckey(ocy), bits, max_iter, julia, jc if julia
               else None, ship, phoenix,
               (float(scene.phoenix_p), float(scene.phoenix_r))
               if phoenix else None,
               scaled if julia else None)  # drift emission format
        if orbit_cache is not None and key in orbit_cache:
            return orbit_cache[key]
        if julia:
            # julia reference: z0 = the point itself, c = the shared julia
            # constant; the table holds the drift D = Z - Z0 so tiny
            # excursions near periodic points keep full precision.  At the
            # scaled (ARBITRARY) tier the drift is emitted as floatexp
            # (mantissa, exponent) pairs straight from fixed point, so no
            # zoom depth can underflow it.
            o = orbit_mod.compute_orbit(jc[0], jc[1], bits, max_iter + 1,
                                        force_python=force_python_orbit,
                                        z0x=ocx, z0y=ocy, emit_rel=True,
                                        emit_fx=scaled)
        else:
            o = orbit_mod.compute_orbit(
                ocx, ocy, bits, max_iter + 1,
                force_python=force_python_orbit,
                kind=1 if ship else (2 if phoenix else 0),
                pp=float(scene.phoenix_p), rr=float(scene.phoenix_r))
        if orbit_cache is not None:
            orbit_cache[key] = o
        return o

    hp_bits = max(bits, 128)
    digs = max(40, int(hp_bits * 0.302) + 12)
    shift_kw = {}
    if ref_center is not None:
        # One shared orbit at ref_center; the pixel deltas pick up
        # shift = (scene center - ref), exactly like a secondary reference.
        rcx_s, rcy_s = ref_center
        orbit = cached_orbit(rcx_s, rcy_s)
        center_x_dd = dd_from_string(rcx_s)
        center_y_dd = dd_from_string(rcy_s)
        sx_s = (HPFloat(str(cx), hp_bits)
                - HPFloat(rcx_s, hp_bits)).to_string(digs)
        sy_s = (HPFloat(str(cy), hp_bits)
                - HPFloat(rcy_s, hp_bits)).to_string(digs)
        shift_kw = dict(ref_shift_x=dd_from_string(sx_s),
                        ref_shift_y=dd_from_string(sy_s),
                        ref_shift_x_frac=sx_s, ref_shift_y_frac=sy_s)
        orbit_center = (rcx_s, rcy_s)
    else:
        orbit = cached_orbit(cx, cy)
        orbit_center = (cx, cy)
    # emit_fx orbits come back as (mantissas, exponents); plain ones bare.
    orbit, orbit_exp = orbit if isinstance(orbit, tuple) else (orbit, None)

    series = None
    if scene.use_series_approximation and max(scene.bailout, 2.0) >= 4.0 \
            and ref_center is None and not julia \
            and not ship and not phoenix:
        aspect = width / height
        # +1/height: subpixel AA offsets (sequential or stacked) push |dc|
        # up to one pixel past the geometric corner; the series exactness
        # bound must cover them
        corner = math.hypot(0.5 * aspect + 1.0 / height, 0.5 + 1.0 / height)
        if scaled:
            # zoom may underflow f64 here — dc_max stays exact-rational and
            # the coefficients accumulate in floatexp
            from ..deepzoom.series import compute_series_skip_fx

            dc_max_fr = zoom_fr * 4 * Fraction(corner) / height
            series = compute_series_skip_fx(orbit, dc_max_fr)
        else:
            from ..deepzoom.series import compute_series_skip

            dc_max = zoom_f * 4.0 / height * corner
            series = compute_series_skip(orbit, dc_max)

    f = field_fn(
        orbit, width, band_h, center_x_dd=center_x_dd,
        center_y_dd=center_y_dd, zoom_dd=zoom_dd, max_iter=max_iter,
        bailout=scene.bailout, glitch_tol=glitch_tol, offset=offset,
        float_continuation=(float_cont and not julia), series=series,
        dd_delta=dd_delta, scaled_delta=scaled, zoom_frac=str(zoom),
        rebase=rebasing, max_passes=max_passes, julia=julia, ship=ship,
        phoenix=phoenix, phoenix_p=float(scene.phoenix_p),
        phoenix_r=float(scene.phoenix_r),
        julia_z0=((float(Fraction(str(orbit_center[0]))),
                   float(Fraction(str(orbit_center[1]))))
                  if julia else None),
        **({"orbit_exp": orbit_exp} if orbit_exp is not None else {}),
        **({"track_err": True} if exact_dust else {}),
        **({"aa_spp": aa_spp} if aa_spp > 1 else {}), **band_kw, **shift_kw)
    if keep_device and rebasing and not exact_dust \
            and not isinstance(f["n"], np.ndarray):
        # One scalar crosses the link; if the render is already complete
        # (always, barring a pathological max_passes exhaustion) the field
        # planes stay on device for the caller to color there.  The
        # isinstance guard skips producers that already returned host
        # arrays (perturbation_fields_sharded gathers to numpy — counting
        # `want` via jnp would re-UPLOAD a plane on the link-bound path).
        if int(jnp.sum(f["want"] > 0.5)) == 0:
            info = {"precision_mode": mode.name, "precision_bits": bits,
                    "dd_delta": dd_delta, "scaled_delta": scaled,
                    "deep_zoom_julia": julia, "deep_zoom_ship": ship,
                    "deep_zoom_phoenix": phoenix, "algorithm": "rebase",
                    "rebase_passes": int(f["passes"]),
                    "reference_iterations": len(orbit),
                    "references_used": 1,
                    "series_skip": series.n_skip if series else 0,
                    "glitched_pixels_initial": 0, "fallback_pixels": 0,
                    "glitched_pixels_remaining": 0, "fields_on_device": True}
            if debug_rounds and "rounds_plane" in f:
                info["rounds_plane"] = f["rounds_plane"]
            glitch0 = np.zeros(tuple(f["n"].shape), bool)
            return f["n"], f["zx"], f["zy"], glitch0, info
    n = np.array(f["n"])
    zx = np.array(f["zx"])
    zy = np.array(f["zy"])
    # In rebase mode any lane still wanting a pass after max_passes (a
    # pathological short-orbit case) routes to the HP fallback below;
    # otherwise the render is glitch-free by construction.
    if rebasing:
        glitch = np.asarray(f["want"]) > 0.5
    else:
        glitch = np.asarray(f["glitch"]) > 0.5
    dust_suspect = 0
    if exact_dust:
        # precision-starved dust lanes join the HP-fallback set: the
        # per-pixel orbit below pins their counts exactly
        suspect = np.asarray(f["errx"]) > _DUST_SUSPECT_LOG2
        dust_suspect = int(suspect.sum())
        glitch = glitch | suspect
    info = {"precision_mode": mode.name, "precision_bits": bits,
            "dd_delta": dd_delta, "scaled_delta": scaled,
            "deep_zoom_julia": julia, "deep_zoom_ship": ship,
            "deep_zoom_phoenix": phoenix,
            "algorithm": "rebase" if rebasing else "secondary_refs",
            "rebase_passes": int(f["passes"]) if rebasing else 0,
            "reference_iterations": len(orbit), "references_used": 1,
            "series_skip": series.n_skip if series else 0,
            "dust_suspect_pixels": dust_suspect,
            "glitched_pixels_initial": int(glitch.sum())}
    if debug_rounds and "rounds_plane" in f:
        info["rounds_plane"] = f["rounds_plane"]

    # ---- secondary references for glitched pixels ----------------------
    hp_bits = max(bits, 128)
    cx_hp = HPFloat(str(cx), hp_bits)
    cy_hp = HPFloat(str(cy), hp_bits)
    # Exact-rational pixel mapping, identical to the kernel's
    # dc = step * (p - size/2) with step = zoom*4/height^2 — so secondary
    # references and the HP fallback sample the same c the kernel does.
    step_fr = Fraction(str(zoom)) * 4 / (height * height)

    def pixel_c(py, px, off=None):
        # py is band-local when row_band is set; the mapping is global
        off = offset if off is None else off
        dcx = step_fr * (Fraction(px + off[0]) - Fraction(width, 2))
        dcy = step_fr * (Fraction(py + row_off + off[1])
                         - Fraction(height, 2))
        return (cx_hp + HPFloat(dcx, hp_bits), cy_hp + HPFloat(dcy, hp_bits))

    refs = 1
    prev_glitched = None
    while not rebasing and glitch.any() and refs < max_references:
        remaining = int(glitch.sum())
        if prev_glitched is not None and remaining >= prev_glitched:
            break  # no progress — bail rather than loop on hopeless pixels
        prev_glitched = remaining
        ys, xs = np.nonzero(glitch)
        # Probe a spread of flagged pixels and adopt the one whose orbit
        # runs deepest — ideally an interior pixel whose orbit never
        # escapes, which resolves every starved pixel at once.  Orbit
        # probes are cheap (native engine, ~2M iter/s).
        n_cand = min(12, len(ys))
        idxs = np.linspace(0, len(ys) - 1, n_cand).astype(int)
        best = None
        for k in idxs:
            cxy = pixel_c(int(ys[k]), int(xs[k]))
            o = cached_orbit(cxy[0], cxy[1])
            if best is None or len(o) > len(best[0]):
                best = (o, cxy)
            if len(o) >= max_iter + 1:
                break  # non-escaping reference found
        orbit2, (ref_cx, ref_cy) = best
        # delta relative to the new reference needs shift = center - ref;
        # enough decimal digits for full dd-relative precision at depth
        digs = max(40, int(hp_bits * 0.302) + 12)
        sx_str = (cx_hp - ref_cx).to_string(digs)
        sy_str = (cy_hp - ref_cy).to_string(digs)
        f2 = field_fn(
            orbit2, width, band_h,
            center_x_dd=dd_from_string(ref_cx.to_string(40)),
            center_y_dd=dd_from_string(ref_cy.to_string(40)),
            zoom_dd=zoom_dd, max_iter=max_iter, bailout=scene.bailout,
            glitch_tol=glitch_tol,
            ref_shift_x=dd_from_string(sx_str),
            ref_shift_y=dd_from_string(sy_str),
            offset=offset, float_continuation=float_cont, dd_delta=dd_delta,
            scaled_delta=scaled, zoom_frac=str(zoom),
            ref_shift_x_frac=sx_str, ref_shift_y_frac=sy_str, **band_kw)
        n2 = np.asarray(f2["n"])
        zx2 = np.asarray(f2["zx"])
        zy2 = np.asarray(f2["zy"])
        g2 = np.asarray(f2["glitch"]) > 0.5
        fix = glitch & ~g2
        n[fix] = n2[fix]
        zx[fix] = zx2[fix]
        zy[fix] = zy2[fix]
        glitch = glitch & g2
        refs += 1

    # ---- guaranteed fallback: direct HP iteration of survivors ---------
    # The secondary-reference loop can exit with stragglers (no-progress
    # bailout above).  Each survivor gets its own exact orbit from the
    # native HP engine — the pixel IS the reference, so by construction it
    # cannot glitch.  Survivor counts are tiny (tens of pixels) and the
    # native engine runs ~2M iter/s, so this is milliseconds of host work;
    # config #4's "correct (glitch-free)" ends at exactly 0 flagged pixels.
    info["fallback_pixels"] = int(glitch.sum())
    if glitch.any():
        bail = max(2.0, float(scene.bailout))
        bail2 = bail * bail
        if n.ndim == 3:  # stacked AA: per-sample subpixel offsets
            idxs = [(int(s), int(y), int(x))
                    for s, y, x in np.argwhere(glitch)]
        else:
            idxs = [(None, int(y), int(x)) for y, x in zip(*np.nonzero(glitch))]
        for smp, y, x in idxs:
            if smp is None:
                off_s = offset
            else:
                off_s = ((smp % aa_spp) / aa_spp, (smp // aa_spp) / aa_spp)
            pcx, pcy = pixel_c(y, x, off_s)
            if julia:
                o = orbit_mod.compute_orbit(
                    jc[0], jc[1], hp_bits, max_iter + 1,
                    escape_mag_sq=bail2, force_python=force_python_orbit,
                    z0x=pcx, z0y=pcy)
            else:
                o = orbit_mod.compute_orbit(
                    pcx, pcy, hp_bits, max_iter + 1, escape_mag_sq=bail2,
                    force_python=force_python_orbit,
                    kind=1 if ship else (2 if phoenix else 0),
                    pp=float(scene.phoenix_p), rr=float(scene.phoenix_r))
            zfx, zfy = float(o[-1, 0]), float(o[-1, 1])
            escaped = zfx * zfx + zfy * zfy > bail2
            # kernel count convention: n = #{i >= 1 : |z_i| <= bail} — the
            # first escaped index k gives n = k - 1 (see ops/perturbation
            # pert_chunk); interior pixels report the limit.
            at = (y, x) if smp is None else (smp, y, x)
            n[at] = (len(o) - 2) if escaped else max_iter
            zx[at] = zfx
            zy[at] = zfy
        glitch = np.zeros_like(glitch)

    info["references_used"] = refs
    info["glitched_pixels_remaining"] = int(glitch.sum())
    return n, zx, zy, glitch, info


@functools.partial(jax.jit, static_argnames=("mode",))
def _color_dz_jit(n, zx, zy, max_iter, coff, cscale, mode):
    # bailout is unused by the deep-zoom colorer (no post chain —
    # test_deep_zoom.comp writes raw palette colors); the constant keeps
    # ColorParams well-formed without baking a traced value
    p = ColorParams(max_iterations=max_iter, bailout=4.0,
                    palette_mode=int(mode), color_offset=coff,
                    color_scale=cscale)
    return coloring.color_deep_zoom(jnp, n, zx, zy, p)


@functools.partial(jax.jit, static_argnames=("mode", "nsamp"))
def _color_dz_avg_jit(n, zx, zy, max_iter, coff, cscale, mode, nsamp):
    p = ColorParams(max_iterations=max_iter, bailout=4.0,
                    palette_mode=int(mode), color_offset=coff,
                    color_scale=cscale)
    # accumulate in sample order with f32 adds, then divide — the exact
    # expression the host path uses, so device and host averages of
    # identical per-sample colors are bit-identical
    acc = coloring.color_deep_zoom(jnp, n[0], zx[0], zy[0], p)
    for s in range(1, int(nsamp)):
        acc = acc + coloring.color_deep_zoom(jnp, n[s], zx[s], zy[s], p)
    return acc / jnp.float32(nsamp)


def color_fields_device(n, zx, zy, p: ColorParams):
    """Color deep-zoom field planes ON DEVICE (the same
    ops.coloring.color_deep_zoom expression with xp=jnp) and return an
    (H, W, 3) f32 device array — the render(...) pipeline fetches 3 RGB
    planes instead of the 4 field planes.  Offset/scale/max_iter are
    traced (a live-session palette tweak does not recompile); only
    palette_mode is static (it selects the palette expression)."""
    return _color_dz_jit(n, zx, zy, float(p.max_iterations),
                         float(p.color_offset), float(p.color_scale),
                         mode=int(p.palette_mode))


def color_avg_device(n, zx, zy, p: ColorParams, nsamp: int):
    """Color all ``nsamp`` stacked AA sample planes on device and return
    their average — one (H, W, 3) fetch for an spp²-sample render."""
    return _color_dz_avg_jit(n, zx, zy, float(p.max_iterations),
                             float(p.color_offset), float(p.color_scale),
                             mode=int(p.palette_mode), nsamp=int(nsamp))


def color_stacked_samples(n, zx, zy, p: ColorParams, nsamp: int):
    """Average the colored samples of a stacked (nsamp, H, W) field
    render -> (avg, on_device).  Device planes color/average on device;
    numpy planes (HP-fallback renders) color on host with the identical
    expression and accumulation order."""
    if isinstance(n, np.ndarray):
        acc = np.zeros(n.shape[1:] + (3,), np.float32)
        for s in range(nsamp):
            acc += np.asarray(
                coloring.color_deep_zoom(np, n[s], zx[s], zy[s], p))
        return acc / np.float32(nsamp), False
    return color_avg_device(n, zx, zy, p, nsamp), True


class SampleAccumulator:
    """Shared host-or-device coloring policy for SEQUENTIAL AA sample
    loops (render() and the giant band producer).  Colored samples
    accumulate incrementally — never more than one plane beyond the
    accumulator is alive, on either side — staying on device while every
    sample arrives as device planes and switching permanently to host
    the first time one comes back as numpy (an HP-fallback render).  f32
    adds run in identical sample order on both sides, so the final
    average is the same bits wherever the switch happens."""

    def __init__(self, p: ColorParams):
        self._p = p
        self._acc = None
        self._host = False

    def add(self, n, zx, zy):
        if isinstance(n, np.ndarray):
            c = coloring.color_deep_zoom(np, n, zx, zy, self._p)
            if self._acc is not None and not self._host:
                self._acc = np.asarray(self._acc)
            self._host = True
        else:
            c = color_fields_device(n, zx, zy, self._p)
            if self._host:
                c = np.asarray(c)
        self._acc = c if self._acc is None else self._acc + c

    def average(self, nsamp: int):
        """-> (avg, on_device): the f32 mean plane."""
        if self._host:
            return np.asarray(self._acc) / np.float32(nsamp), False
        return self._acc / jnp.float32(nsamp), True


def render(scene: Scene, width: int, height: int,
           return_info: bool = False, orbit_cache: dict = None,
           quantize: int = 0, **kw):
    """``quantize``: 0 returns f32 [0,1]; 8/16 quantizes to uint8/uint16
    with the PNG writer's exact expression — ON DEVICE when the fields
    stayed there, so frame sequences (zoom paths, animations) fetch 1-2 B
    per channel instead of 4."""
    p = ColorParams(
        max_iterations=scene.max_iterations, bailout=scene.bailout,
        palette_mode=scene.palette_mode, color_offset=scene.color_offset,
        color_scale=scene.color_scale)
    spp = max(int(scene.samples_per_pixel), 1)
    infos = []
    cache = orbit_cache if orbit_cache is not None else {}
    stacked = (spp > 1 and (spp & (spp - 1)) == 0
               and kw.get("rebasing", True))
    # keep_device: coloring runs on device whenever the render needs no
    # host HP fallback (always, with rebasing) — only the final RGB image
    # crosses the link.  Fallback renders return numpy and color on host.
    if stacked:
        # ONE kernel invocation renders all spp^2 subpixel samples as
        # stacked segments sharing the orbit operands and rebase passes
        # (segment mappings bit-identical to the sequential offsets)
        n, zx, zy, _, info = render_fields(scene, width, height,
                                           orbit_cache=cache, aa_spp=spp,
                                           keep_device=True, **kw)
        img, on_dev = color_stacked_samples(n, zx, zy, p, spp * spp)
        info = dict(info, aa_samples=spp * spp, aa_batched=True)
        infos.append(info)
    else:
        accu = SampleAccumulator(p)
        for sy in range(spp):
            for sx in range(spp):
                off = (sx / spp, sy / spp) if spp > 1 else (0.0, 0.0)
                n, zx, zy, _, info = render_fields(scene, width, height,
                                                   offset=off,
                                                   orbit_cache=cache,
                                                   keep_device=True, **kw)
                accu.add(n, zx, zy)
                infos.append(info)
        img, on_dev = accu.average(spp * spp)
    if quantize in (8, 16):
        from . import common

        if on_dev:
            img = common.quantize_image(img, bit_depth=quantize)
        else:  # identical host expression (byte-identical PNGs)
            img = np.clip(img, 0.0, 1.0)
            img = ((img * 255.0 + 0.5).astype(np.uint8) if quantize == 8
                   else (img * 65535.0 + 0.5).astype(np.uint16))
    if on_dev:
        # ascontiguousarray: a TPU fetch can carry a non-default layout,
        # which numpy ufuncs would propagate into PNG writers
        img = np.ascontiguousarray(img)
    if return_info:
        return img, infos[0]
    return img
