"""Shared render pipeline for the 2D escape-time families.

Pipeline per frame (mirrors the shader main() structure):
  for each AA offset: escape kernel → per-sample coloring
  average samples → enhance/ACES/gamma post chain

The pipeline is compiled once per *static configuration* (family, size, AA,
palette, effect toggles) and re-used across any number of frames with traced
dynamic parameters (center/zoom/colors/...) — the functional replacement for
the reference's push-constant dirty-checking (src/compute_effect_manager.h:
80-433).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import coloring, mapping
from ..ops.coloring import ColorParams
from ..ops.escape import escape_fields
from ..scene import Scene


@dataclass(frozen=True)
class StaticCfg:
    family: str
    width: int
    height: int
    max_iter: int
    aa: int
    palette_mode: int
    interior_style: int
    orbit_trap_enabled: bool
    stripe_enabled: bool
    use_julia: bool
    clamp_mins: bool          # julia/bs/phoenix clamp brightness/sat/contrast
    aa_convention: str        # 'centered' (mandelbrot) or 'uv'
    tile: Optional[Tuple[int, int]] = None
    chunk: int = 16
    interpret: Optional[bool] = None


# fractal type → (kernel family, AA convention, post-chain clamp) for the
# four 2D escape-time families (mandelbulb/deep-zoom have their own models).
def family_map():
    from ..scene import FractalType

    return {
        FractalType.MANDELBROT: ("mandelbrot", "centered", False),
        FractalType.JULIA: ("julia", "uv", True),
        FractalType.BURNING_SHIP: ("burning_ship", "uv", True),
        FractalType.PHOENIX: ("phoenix", "uv", True),
    }


# Dynamic parameter pytree: plain dict of f32 scalars.
DYN_KEYS = ("center_x", "center_y", "zoom", "bailout", "iter_limit",
            "julia_c_real", "julia_c_imag", "phoenix_p", "phoenix_r",
            "color_offset", "color_scale", "orbit_trap_radius",
            "stripe_density", "brightness", "saturation", "contrast")


def _iter_bucket(max_iter: int) -> int:
    """Round the static compile cap up to a power of two (min 256).

    The escape kernel's loop is bounded by the TRACED iter_limit; the
    static max_iter only feeds the Pallas cost estimate, so every
    iteration count in a bucket shares ONE compiled executable — the
    viewer's [ / ] hotkeys (±64/step) and auto-iteration ladders would
    otherwise recompile an identical kernel on every step (the tunneled
    compile service costs seconds-to-minutes per executable)."""
    b = 256
    while b < max_iter:
        b *= 2
    # the kernel layer rejects caps >= 2^24 (f32 counter exactness); a
    # legal max_iterations in (2^23, 2^24) must not bucket into the
    # rejected value
    return min(b, (1 << 24) - 1)


def scene_static_cfg(scene: Scene, width: int, height: int,
                     family: str, aa_convention: str, clamp_mins: bool,
                     **kw) -> StaticCfg:
    return StaticCfg(
        family=family, width=width, height=height,
        max_iter=_iter_bucket(int(scene.max_iterations)),
        aa=max(int(scene.antialiasing_samples), 1),
        palette_mode=int(scene.palette_mode),
        interior_style=int(scene.interior_style),
        orbit_trap_enabled=bool(scene.orbit_trap_enabled),
        stripe_enabled=bool(scene.stripe_enabled),
        use_julia=bool(scene.use_julia_set),
        clamp_mins=clamp_mins, aa_convention=aa_convention, **kw)


def scene_dyn_params(scene: Scene) -> dict:
    """Extract the dynamic (traced) parameter dict; keys == DYN_KEYS."""
    return {
        "center_x": scene.center_x, "center_y": scene.center_y,
        "zoom": scene.zoom, "bailout": scene.bailout,
        "iter_limit": float(scene.max_iterations),
        "julia_c_real": scene.julia_c_real, "julia_c_imag": scene.julia_c_imag,
        "phoenix_p": scene.phoenix_p, "phoenix_r": scene.phoenix_r,
        "color_offset": scene.color_offset, "color_scale": scene.color_scale,
        "orbit_trap_radius": scene.orbit_trap_radius,
        "stripe_density": scene.stripe_density,
        "brightness": scene.color_brightness,
        "saturation": scene.color_saturation,
        "contrast": scene.color_contrast,
    }


assert set(scene_dyn_params(Scene())) == set(DYN_KEYS), \
    "DYN_KEYS out of sync with scene_dyn_params"


def _track_flags(cfg: StaticCfg) -> Tuple[bool, bool]:
    if cfg.family == "mandelbrot":
        track_trap = cfg.orbit_trap_enabled or cfg.interior_style == 2
        return track_trap, False
    if cfg.family == "burning_ship":
        track_trap = cfg.orbit_trap_enabled
        track_stripe = cfg.stripe_enabled and cfg.interior_style == 2
        return track_trap, track_stripe
    return False, False


def _color_params(cfg: StaticCfg, dyn: dict) -> ColorParams:
    # Traced floats are fine inside ColorParams for the jnp backend.
    # max_iterations follows the (possibly per-frame) iteration limit, not
    # the static compile cap, so batched animation frames color correctly —
    # clamped to the cap exactly like the kernel clamps n, so an oversized
    # limit can't make the interior test (n >= max_iterations) unreachable.
    return ColorParams(
        max_iterations=jnp.minimum(jnp.asarray(dyn["iter_limit"],
                                               jnp.float32),
                                   jnp.float32(cfg.max_iter)),
        bailout=dyn["bailout"],
        palette_mode=cfg.palette_mode,
        color_offset=dyn["color_offset"],
        color_scale=dyn["color_scale"],
        interior_style=cfg.interior_style,
        orbit_trap_enabled=cfg.orbit_trap_enabled,
        orbit_trap_radius=dyn["orbit_trap_radius"],
        stripe_enabled=cfg.stripe_enabled,
        stripe_density=dyn["stripe_density"],
        phoenix_stripe_control=dyn["stripe_density"],
    )


def _interior_skip_ok(cfg: StaticCfg) -> bool:
    """Analytic interior skip is exact for n but zeroes the interior z,
    so it is only safe when nothing reads interior z (see ops/escape.py).
    Also the mandelbrot fused-coloring eligibility condition — one
    predicate, shared, so the two can never drift apart."""
    return (cfg.family == "mandelbrot"
            and not cfg.stripe_enabled
            and not cfg.orbit_trap_enabled
            and cfg.interior_style != 2)


def _fused_ok(cfg: StaticCfg) -> bool:
    """The in-kernel fused-coloring eligibility predicate (see
    band_render_fn): no trap/stripe consumers and no interior-z reader.
    Julia and phoenix fuse unconditionally (julia's interior is a plain
    black mask; phoenix's flow stripes use the kernel-safe polynomial
    atan2 from ops/trig.py on both the fused and unfused paths)."""
    track_trap, track_stripe = _track_flags(cfg)
    return (cfg.family in ("julia", "phoenix")
            or _interior_skip_ok(cfg)
            or (cfg.family == "burning_ship"
                and not track_trap and not track_stripe))


def planar_export_ok(cfg: StaticCfg) -> bool:
    """True when the config can export as quantized PLANAR planes
    (3, H, W): the fused kernel emits per-channel sRGB planes, and with a
    single AA sample the post chain already ran in the kernel — so
    quantization consumes the planes directly and the interleaved
    (H, W, 3) layout never materializes on device (~40 us of pure layout
    copy per 1080p frame).  Callers interleave on host after the fetch
    (PNG row prep copies anyway)."""
    return _fused_ok(cfg) and cfg.aa == 1


def band_render_fn(cfg: StaticCfg, band_h: int, full_h: int,
                   planar_quantize: int = 0):
    """Build fn(dyn, row0) rendering ``band_h`` local rows whose global
    first row is the traced scalar ``row0`` — the single pipeline behind
    whole-frame renders (row0=0) and multi-chip row-band shards
    (parallel/tiled.py).

    ``planar_quantize``: 8/16 returns quantized (3, band_h, W) planes
    instead of f32 (band_h, W, 3) — only valid when
    ``planar_export_ok(cfg)``."""
    if planar_quantize and not planar_export_ok(cfg):
        raise ValueError("planar_quantize requires a fused single-sample "
                         "config (planar_export_ok)")
    track_trap, track_stripe = _track_flags(cfg)
    if cfg.aa_convention == "centered":
        offsets = mapping.aa_offsets_centered(cfg.aa)
    else:
        offsets = mapping.aa_offsets_uv(cfg.aa, cfg.width)
    interior_skip = _interior_skip_ok(cfg)

    # In-kernel fused coloring: with no trap/stripe consumers, the kernel
    # colors its VMEM tile and emits sRGB planes — the n/zx/zy fields never
    # round-trip HBM (~25% frame-time tax at 1080p/256).  Identical
    # per-channel math (planar colorers).  With one AA sample the kernel
    # also applies the post chain; AA>1 emits pre-post-chain sample planes
    # which are averaged here before the shared post chain (matching the
    # unfused pipeline's sample-average-then-enhance order).
    # mandelbrot eligibility == the interior-skip safety condition: both
    # require that nothing reads interior z / the trap field / arctan2
    # (unsupported in Mosaic) at coloring time.
    # trap/stripe interior styles read the tracked fields — _fused_ok
    # centralizes the predicate (shared with planar_export_ok)
    fused = _fused_ok(cfg)
    if fused:
        with_post = len(offsets) == 1

        def fn(dyn, row0):
            acc = jnp.zeros((band_h, cfg.width, 3), jnp.float32)
            planes = None
            for off in offsets:
                f = escape_fields(
                    cfg.family, cfg.width, band_h,
                    center_x=dyn["center_x"], center_y=dyn["center_y"],
                    zoom=dyn["zoom"], max_iter=cfg.max_iter,
                    bailout=dyn["bailout"], offset=off,
                    julia_c=(dyn["julia_c_real"], dyn["julia_c_imag"]),
                    phoenix_p=dyn["phoenix_p"], phoenix_r=dyn["phoenix_r"],
                    stripe_density=dyn["stripe_density"],
                    use_julia=cfg.use_julia,
                    iter_limit=dyn["iter_limit"], tile=cfg.tile,
                    chunk=cfg.chunk, row0=row0, map_height=full_h,
                    interior_skip=interior_skip,
                    fused_color=(cfg.palette_mode, cfg.interior_style,
                                 cfg.clamp_mins, with_post),
                    color_offset=dyn["color_offset"],
                    color_scale=dyn["color_scale"],
                    brightness=dyn["brightness"],
                    saturation=dyn["saturation"],
                    contrast=dyn["contrast"], interpret=cfg.interpret)
                if planar_quantize:
                    # single sample (planar_export_ok): quantize fuses
                    # into the plane concatenation — (H, W, 3) never
                    # materializes on device
                    planes = jnp.stack([f["r"], f["g"], f["b"]], axis=0)
                else:
                    acc = acc + jnp.stack([f["r"], f["g"], f["b"]],
                                          axis=-1)
            if planar_quantize:
                return quantize_image(planes, bit_depth=planar_quantize)
            if with_post:
                return acc
            return coloring.post_chain_traced(
                jnp, acc / jnp.float32(len(offsets)), dyn["brightness"],
                dyn["saturation"], dyn["contrast"],
                clamp_mins=cfg.clamp_mins)

        return fn

    def fn(dyn, row0):
        p = _color_params(cfg, dyn)
        acc = jnp.zeros((band_h, cfg.width, 3), jnp.float32)
        for off in offsets:
            f = escape_fields(
                cfg.family, cfg.width, band_h,
                center_x=dyn["center_x"], center_y=dyn["center_y"],
                zoom=dyn["zoom"], max_iter=cfg.max_iter,
                bailout=dyn["bailout"], offset=off,
                julia_c=(dyn["julia_c_real"], dyn["julia_c_imag"]),
                phoenix_p=dyn["phoenix_p"], phoenix_r=dyn["phoenix_r"],
                use_julia=cfg.use_julia,
                trap_radius=dyn["orbit_trap_radius"],
                stripe_density=dyn["stripe_density"],
                track_trap=track_trap, track_stripe=track_stripe,
                iter_limit=dyn["iter_limit"], tile=cfg.tile, chunk=cfg.chunk,
                row0=row0, map_height=full_h, interior_skip=interior_skip,
                interpret=cfg.interpret)
            if cfg.family == "mandelbrot":
                trap = f.get("trap", jnp.full_like(f["zx"], 1e20))
                acc = acc + coloring.color_mandelbrot(jnp, f["n"], f["zx"],
                                                      f["zy"], trap, p)
            elif cfg.family == "julia":
                acc = acc + coloring.color_julia(jnp, f["n"], f["zx"],
                                                 f["zy"], p)
            elif cfg.family == "burning_ship":
                trap = f.get("trap", jnp.full_like(f["zx"], 1e10))
                stripe = f.get("stripe", jnp.zeros_like(f["zx"]))
                acc = acc + coloring.color_burning_ship(
                    jnp, f["n"], f["zx"], f["zy"], trap, stripe, p)
            elif cfg.family == "phoenix":
                acc = acc + coloring.color_phoenix(jnp, f["n"], f["zx"],
                                                   f["zy"], p)
            else:
                raise ValueError(cfg.family)

        # julia.comp:319-322 clamp floors live inside post_chain_traced
        return coloring.post_chain_traced(
            jnp, acc / jnp.float32(len(offsets)), dyn["brightness"],
            dyn["saturation"], dyn["contrast"], clamp_mins=cfg.clamp_mins)

    return fn


def _render_impl(cfg: StaticCfg, dyn: dict) -> jax.Array:
    return band_render_fn(cfg, cfg.height, cfg.height)(dyn, jnp.float32(0.0))


@functools.lru_cache(maxsize=256)
def compiled_render_fn(cfg: StaticCfg):
    """A jitted render(dyn_params) -> rgb for one static configuration."""

    def fn(dyn):
        dyn = {k: jnp.asarray(v, jnp.float32) for k, v in dyn.items()}
        return _render_impl(cfg, dyn)

    return jax.jit(fn)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def quantize_image(img, *, bit_depth: int):
    """Clip/scale/round an f32 [0,1] image to uint8/uint16 ON DEVICE —
    the exact utils.png._prepare_rows expression, so a device-quantized
    frame produces byte-identical PNGs while crossing the link at 1-2 B
    per channel instead of 4 (frame exports are link-bound on thin
    device links)."""
    img = jnp.clip(img, 0.0, 1.0)
    if bit_depth == 8:
        return (img * 255.0 + 0.5).astype(jnp.uint8)
    return (img * 65535.0 + 0.5).astype(jnp.uint16)


@functools.lru_cache(maxsize=64)
def compiled_planar_render_fn(cfg: StaticCfg, quantize: int = 8):
    """A jitted single-frame render(dyn) -> (3, H, W) uint8/16 planes —
    the live session's pixel-frame path: fused kernel + in-kernel post
    chain + device quantization, fetching 1-2 B/px/channel instead of 4
    (keypress-to-frame is fetch-bound over the tunneled link).  Requires
    ``planar_export_ok(cfg)``."""
    if not planar_export_ok(cfg):
        raise ValueError("compiled_planar_render_fn requires "
                         "planar_export_ok(cfg)")
    band = band_render_fn(cfg, cfg.height, cfg.height,
                          planar_quantize=quantize)

    def fn(dyn):
        dyn = {k: jnp.asarray(v, jnp.float32) for k, v in dyn.items()}
        return band(dyn, jnp.float32(0.0))

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def compiled_batch_render_fn(cfg: StaticCfg, quantize: int = 0,
                             planar: bool = False):
    """A jitted render of a whole frame batch: dict of (B,)-shaped dynamic
    params → (B, H, W, 3).  Frames run sequentially on-device (each frame
    already saturates the chip), but batching removes per-frame host
    dispatch — essential under high-latency device links.

    ``quantize``: 0 returns f32 [0,1]; 8/16 applies quantize_image's
    clip/scale/round in the same jit so the batch fetch moves uint8/16.

    ``planar``: with quantize set and ``planar_export_ok(cfg)``, frames
    come back as (B, 3, H, W) planes — the interleaved layout never
    materializes on device (~40 us/frame of layout copy at 1080p); the
    caller moveaxis-es after the fetch (PNG row prep copies anyway)."""
    if planar and not (quantize and planar_export_ok(cfg)):
        raise ValueError("planar batch export requires quantize=8|16 and "
                         "planar_export_ok(cfg)")

    def fn(dyn_batch):
        dyn_batch = {k: jnp.asarray(v, jnp.float32)
                     for k, v in dyn_batch.items()}
        if planar:
            band = band_render_fn(cfg, cfg.height, cfg.height,
                                  planar_quantize=quantize)
            return jax.lax.map(lambda d: band(d, jnp.float32(0.0)),
                               dyn_batch)
        out = jax.lax.map(lambda d: _render_impl(cfg, d), dyn_batch)
        if quantize:
            out = quantize_image(out, bit_depth=quantize)
        return out

    return jax.jit(fn)


def render_scene(scene: Scene, width: int, height: int, family: str,
                 aa_convention: str, clamp_mins: bool, **kw) -> jax.Array:
    cfg = scene_static_cfg(scene, width, height, family, aa_convention,
                           clamp_mins, **kw)
    return compiled_render_fn(cfg)(scene_dyn_params(scene))
