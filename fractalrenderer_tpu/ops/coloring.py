"""Field → RGB coloring and the post-processing chain, backend-agnostic.

The escape-time kernels produce per-pixel *fields* (iteration count, final z,
orbit-trap minimum, stripe accumulator).  These functions turn fields into
colors exactly as the reference shaders do, and are shared between the numpy
golden reference and the jitted TPU render path (pass ``xp`` = numpy or
jax.numpy).

Sources:
- mandelbrot coloring: shaders/mandelbrot.comp:172-207
- julia coloring:      shaders/julia.comp:238-249
- burning-ship:        shaders/burning_ship.comp:250-308
- phoenix:             shaders/phoenix.comp:69-146
- deep zoom:           shaders/test_deep_zoom.comp:73-103
- post chain:          shaders/mandelbrot.comp:233-235 (enhance → ACES → gamma)
"""
from __future__ import annotations

import math

import numpy as np
from dataclasses import dataclass

from . import palettes as pal

_LOG2 = math.log(2.0)


def _f32(xp, v):
    return xp.asarray(v, dtype=xp.float32)


def _mix_scalar(a: float, b: float, t):
    return a * (1.0 - t) + b * t


# ---------------------------------------------------------------------------
# Smooth iteration counts
# ---------------------------------------------------------------------------

def smooth_nu_loglog(xp, n, zx, zy, max_iter):
    """mandelbrot.comp:172-177 / phoenix.comp:80-83: nu = n + 1 -
    log2(log2(|z|)) with |z| from the final (escaped) z; interior keeps n."""
    nf = n.astype(xp.float32)
    mag2 = zx * zx + zy * zy
    log_zn = xp.log(xp.maximum(mag2, 1e-38)) / 2.0
    mu = xp.log(xp.maximum(log_zn, 1e-38) / _LOG2) / _LOG2
    return xp.where(nf < max_iter, nf + 1.0 - mu, nf)


def smooth_nu_bailout(xp, n, zx, zy, max_iter, bailout):
    """julia.comp:238 / burning_ship.comp:252: smooth = n + 1 -
    log(log(|z|^2)/log(bailout))/log(2); interior keeps 0 (never used)."""
    nf = n.astype(xp.float32)
    len_sq = zx * zx + zy * zy
    # Escaped pixels always have len_sq > bailout^2 so the inner quotient is
    # > 2; the max() only silences NaNs on interior pixels, which the where()
    # below discards anyway.
    quot = xp.log(xp.maximum(len_sq, 1e-38)) / xp.log(_f32(xp, bailout))
    smooth = nf + 1.0 - xp.log(xp.maximum(quot, 1e-38)) / _LOG2
    return xp.where(nf < max_iter, smooth, nf)


# ---------------------------------------------------------------------------
# Post-processing chain
# ---------------------------------------------------------------------------

def enhance_color_planar(xp, r, g, b, brightness, saturation, contrast):
    """Planar enhance (see enhance_color); channel math identical."""
    out = []
    rgb = [(ch * brightness - 0.5) * contrast + 0.5 for ch in (r, g, b)]
    gray = rgb[0] * 0.299 + rgb[1] * 0.587 + rgb[2] * 0.114
    for ch in rgb:
        out.append(xp.clip(gray * (1.0 - saturation) + ch * saturation,
                           0.0, 1.0))
    return tuple(out)


def enhance_color(xp, color, brightness, saturation, contrast):
    """mandelbrot.comp:48-54 — brightness, then contrast, then saturation."""
    color = color * brightness
    color = (color - 0.5) * contrast + 0.5
    gray = (color[..., 0] * 0.299 + color[..., 1] * 0.587
            + color[..., 2] * 0.114)[..., None]
    color = gray * (1.0 - saturation) + color * saturation
    return xp.clip(color, 0.0, 1.0)


def aces_tonemap(xp, color):
    """mandelbrot.comp:38-45.  Works on stacked colors and single planes."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return xp.clip((color * (a * color + b)) / (color * (c * color + d) + e),
                   0.0, 1.0)


def gamma_correct(xp, color, gamma: float = 2.2):
    return xp.power(xp.maximum(color, 0.0), _f32(xp, 1.0 / gamma))


def post_chain_traced(xp, color, brightness, saturation, contrast,
                      clamp_mins: bool = False):
    """Stacked enhance → ACES → gamma accepting traced enhance scalars
    (clamp floors via xp.maximum; post_chain's float() clamps are for the
    static/golden path).  The single shared implementation behind both the
    fused and unfused jitted pipelines."""
    if clamp_mins:
        brightness = xp.maximum(_f32(xp, brightness), 0.1)
        saturation = xp.maximum(_f32(xp, saturation), 0.0)
        contrast = xp.maximum(_f32(xp, contrast), 0.1)
    color = enhance_color(xp, color, brightness, saturation, contrast)
    return gamma_correct(xp, aces_tonemap(xp, color))


def post_chain_planar(xp, r, g, b, brightness, saturation, contrast,
                      clamp_mins: bool = False):
    """Planar enhance → ACES → gamma with possibly-traced enhance scalars.
    ``clamp_mins`` applies the julia/burning-ship floors via xp.maximum so
    traced values stay traced (models/common.py does the same)."""
    if clamp_mins:
        brightness = xp.maximum(_f32(xp, brightness), 0.1)
        saturation = xp.maximum(_f32(xp, saturation), 0.0)
        contrast = xp.maximum(_f32(xp, contrast), 0.1)
    r, g, b = enhance_color_planar(xp, r, g, b, brightness, saturation,
                                   contrast)
    return tuple(gamma_correct(xp, aces_tonemap(xp, ch)) for ch in (r, g, b))


def post_chain(xp, color, brightness, saturation, contrast,
               clamp_mins: bool = False):
    """enhance → ACES → gamma.  ``clamp_mins`` mirrors julia/burning-ship
    main() which clamps brightness ≥ 0.1, saturation ≥ 0, contrast ≥ 0.1
    (julia.comp:319-322); the mandelbrot shader does not."""
    if clamp_mins:
        brightness = max(float(brightness), 0.1)
        saturation = max(float(saturation), 0.0)
        contrast = max(float(contrast), 0.1)
    color = enhance_color(xp, color, brightness, saturation, contrast)
    color = aces_tonemap(xp, color)
    return gamma_correct(xp, color)


# ---------------------------------------------------------------------------
# Per-family sample coloring (pre-post-chain; applied per AA sample)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ColorParams:
    max_iterations: int
    bailout: float
    palette_mode: int
    color_offset: float
    color_scale: float
    interior_style: int = 0
    orbit_trap_enabled: bool = False
    orbit_trap_radius: float = 0.5
    stripe_enabled: bool = False
    stripe_density: float = 10.0
    phoenix_stripe_control: float = 0.0


def color_mandelbrot_planar(xp, n, zx, zy, min_trap, p: ColorParams):
    """Planar mandelbrot.comp:172-207 — returns (r, g, b) planes.

    The planar form lets the Pallas escape kernel fuse coloring in VMEM
    (a trailing size-3 axis would pad TPU lanes 3→128); stacking it is
    bit-identical to the old stacked implementation.  ``palette_mode``
    must be a static int on this path.
    """
    max_iter = _f32(xp, p.max_iterations)
    nu = smooth_nu_loglog(xp, n, zx, zy, max_iter)
    t = xp.clip(nu / max_iter * p.color_scale, 0.0, 1.0)
    rgb = list(pal.palette_color_planar(xp, t + p.color_offset,
                                        p.palette_mode, "classic"))

    interior = n.astype(xp.float32) >= max_iter
    if p.interior_style == 1:
        interior_rgb = [xp.zeros_like(c) for c in rgb]
    elif p.interior_style == 2:
        r2 = xp.maximum(_f32(xp, p.orbit_trap_radius), 1e-6)
        trap_factor = xp.exp(-min_trap * 6.0 / r2)
        interior_rgb = list(pal.palette_color_planar(
            xp, p.color_offset + trap_factor * 0.3, p.palette_mode,
            "classic"))
    else:
        interior_rgb = None  # style 0 falls through to the exterior path

    if p.orbit_trap_enabled:
        r = xp.maximum(_f32(xp, p.orbit_trap_radius), 1e-6)
        trap_factor = xp.exp(-min_trap * 4.0 / r)
        w = xp.clip(trap_factor * 0.8, 0.0, 1.0)
        for ch, tc in enumerate((1.0, 0.8, 0.4)):
            rgb[ch] = rgb[ch] * (1.0 - w) + _f32(xp, tc) * w

    if p.stripe_enabled:
        angle = xp.arctan2(zy, zx)
        stripes = 0.5 + 0.5 * xp.sin(angle * p.stripe_density + nu * 0.3)
        m = _mix_scalar(0.7, 1.3, stripes)
        rgb = [c * m for c in rgb]

    if interior_rgb is not None:
        rgb = [xp.where(interior, ic, c) for ic, c in zip(interior_rgb, rgb)]
    return tuple(c.astype(xp.float32) for c in rgb)


def color_mandelbrot(xp, n, zx, zy, min_trap, p: ColorParams):
    """mandelbrot.comp:172-207."""
    if not isinstance(p.palette_mode, (int, np.integer)):
        # traced palette mode (interactive sweeps): lax.switch over the
        # stacked palette table; otherwise share the planar path
        return _color_mandelbrot_traced(xp, n, zx, zy, min_trap, p)
    return xp.stack(color_mandelbrot_planar(xp, n, zx, zy, min_trap, p),
                    axis=-1).astype(xp.float32)


def _color_mandelbrot_traced(xp, n, zx, zy, min_trap, p: ColorParams):
    max_iter = _f32(xp, p.max_iterations)
    nu = smooth_nu_loglog(xp, n, zx, zy, max_iter)
    t = xp.clip(nu / max_iter * p.color_scale, 0.0, 1.0)
    color = pal.palette_color(xp, t + p.color_offset, p.palette_mode, "classic")

    interior = n.astype(xp.float32) >= max_iter
    if p.interior_style == 1:
        interior_color = xp.zeros_like(color)
    elif p.interior_style == 2:
        r2 = xp.maximum(_f32(xp, p.orbit_trap_radius), 1e-6)
        trap_factor = xp.exp(-min_trap * 6.0 / r2)
        interior_color = pal.palette_color(
            xp, p.color_offset + trap_factor * 0.3, p.palette_mode, "classic")
    else:
        interior_color = None  # style 0 falls through to the exterior path

    if p.orbit_trap_enabled:
        r = xp.maximum(_f32(xp, p.orbit_trap_radius), 1e-6)
        trap_factor = xp.exp(-min_trap * 4.0 / r)
        trap_color = pal._vec3(xp, 1.0, 0.8, 0.4)
        w = xp.clip(trap_factor * 0.8, 0.0, 1.0)[..., None]
        color = color * (1.0 - w) + trap_color * w

    if p.stripe_enabled:
        angle = xp.arctan2(zy, zx)
        stripes = 0.5 + 0.5 * xp.sin(angle * p.stripe_density + nu * 0.3)
        color = color * _mix_scalar(0.7, 1.3, stripes)[..., None]

    if interior_color is not None:
        color = xp.where(interior[..., None], interior_color, color)
    return color.astype(xp.float32)


def color_julia_planar(xp, n, zx, zy, p: ColorParams):
    """Planar julia.comp:238-249 (static palette mode)."""
    max_iter = _f32(xp, p.max_iterations)
    smooth = smooth_nu_bailout(xp, n, zx, zy, max_iter, p.bailout)
    t = p.color_offset + (smooth / max_iter) * p.color_scale
    rgb = pal.palette_color_planar(xp, t, p.palette_mode, "enhanced")
    interior = n.astype(xp.float32) >= max_iter
    return tuple(xp.where(interior, xp.zeros_like(c), c).astype(xp.float32)
                 for c in rgb)


def color_julia(xp, n, zx, zy, p: ColorParams):
    """julia.comp:238-249 — interior is black; t = offset + smooth/max * scale."""
    if not isinstance(p.palette_mode, (int, np.integer)):
        max_iter = _f32(xp, p.max_iterations)
        smooth = smooth_nu_bailout(xp, n, zx, zy, max_iter, p.bailout)
        t = p.color_offset + (smooth / max_iter) * p.color_scale
        color = pal.palette_color(xp, t, p.palette_mode, "enhanced")
        interior = (n.astype(xp.float32) >= max_iter)[..., None]
        return xp.where(interior, xp.zeros_like(color), color).astype(xp.float32)
    return xp.stack(color_julia_planar(xp, n, zx, zy, p),
                    axis=-1).astype(xp.float32)


def color_burning_ship_planar(xp, n, zx, zy, min_trap, stripe_acc,
                              p: ColorParams):
    """Planar burning_ship.comp:250-308 (static palette mode)."""
    max_iter = _f32(xp, p.max_iterations)
    smooth = smooth_nu_bailout(xp, n, zx, zy, max_iter, p.bailout)
    t = p.color_offset + (smooth / max_iter) * p.color_scale
    rgb = list(pal.palette_color_planar(xp, t, p.palette_mode, "enhanced"))

    if p.orbit_trap_enabled:
        trap_influence = 1.0 - xp.clip(min_trap * 2.0, 0.0, 1.0)
        trap_rgb = pal.palette_color_planar(xp, trap_influence,
                                            p.palette_mode, "enhanced")
        w = trap_influence * 0.3
        rgb = [c * (1.0 - w) + tc * w for c, tc in zip(rgb, trap_rgb)]

    # Interior styles (burning_ship.comp:259-292)
    if p.interior_style == 1 and p.orbit_trap_enabled:
        ti = 1.0 - xp.clip(min_trap * 5.0, 0.0, 1.0)
        interior_rgb = [c * 0.5 for c in pal.palette_color_planar(
            xp, ti, p.palette_mode, "enhanced")]
    elif p.interior_style == 2 and p.stripe_enabled:
        sv = stripe_acc / max_iter
        ti = (sv + 1.0) * 0.5
        interior_rgb = [c * 0.3 for c in pal.palette_color_planar(
            xp, ti, p.palette_mode, "enhanced")]
    elif p.interior_style == 3:
        dist = xp.sqrt(zx * zx + zy * zy)
        ti = xp.clip(dist * 0.5, 0.0, 1.0)
        interior_rgb = [c * 0.4 for c in pal.palette_color_planar(
            xp, ti, p.palette_mode, "enhanced")]
    else:
        interior_rgb = [xp.zeros_like(c) for c in rgb]

    interior = n.astype(xp.float32) >= max_iter
    return tuple(xp.where(interior, ic, c).astype(xp.float32)
                 for ic, c in zip(interior_rgb, rgb))


def color_burning_ship(xp, n, zx, zy, min_trap, stripe_acc, p: ColorParams):
    """burning_ship.comp:250-308 — 4 interior styles + orbit-trap blend."""
    if isinstance(p.palette_mode, (int, np.integer)):
        return xp.stack(
            color_burning_ship_planar(xp, n, zx, zy, min_trap, stripe_acc,
                                      p), axis=-1).astype(xp.float32)
    max_iter = _f32(xp, p.max_iterations)
    smooth = smooth_nu_bailout(xp, n, zx, zy, max_iter, p.bailout)
    t = p.color_offset + (smooth / max_iter) * p.color_scale
    color = pal.palette_color(xp, t, p.palette_mode, "enhanced")

    if p.orbit_trap_enabled:
        trap_influence = 1.0 - xp.clip(min_trap * 2.0, 0.0, 1.0)
        trap_color = pal.palette_color(xp, trap_influence, p.palette_mode,
                                       "enhanced")
        w = (trap_influence * 0.3)[..., None]
        color = color * (1.0 - w) + trap_color * w

    # Interior styles (burning_ship.comp:259-292)
    if p.interior_style == 1 and p.orbit_trap_enabled:
        ti = 1.0 - xp.clip(min_trap * 5.0, 0.0, 1.0)
        interior_color = pal.palette_color(xp, ti, p.palette_mode, "enhanced") * 0.5
    elif p.interior_style == 2 and p.stripe_enabled:
        sv = stripe_acc / max_iter
        ti = (sv + 1.0) * 0.5
        interior_color = pal.palette_color(xp, ti, p.palette_mode, "enhanced") * 0.3
    elif p.interior_style == 3:
        dist = xp.sqrt(zx * zx + zy * zy)
        ti = xp.clip(dist * 0.5, 0.0, 1.0)
        interior_color = pal.palette_color(xp, ti, p.palette_mode, "enhanced") * 0.4
    else:
        interior_color = xp.zeros_like(color)

    interior = (n.astype(xp.float32) >= max_iter)[..., None]
    return xp.where(interior, interior_color, color).astype(xp.float32)


def color_phoenix_planar(xp, n, zx, zy, p: ColorParams):
    """Planar phoenix.comp:89-146 (static palette mode).

    The flow-stripe angle uses the kernel-safe polynomial atan2
    (ops/trig.py — Mosaic has no atan2 lowering), so the fused Pallas
    epilogue and the unfused XLA pipeline share ONE bit-identical
    expression; the numpy golden oracle keeps true arctan2 and is
    tolerance-tested (the polynomial is f32-ulp-class, ~2e-7)."""
    from . import trig

    max_iter = _f32(xp, p.max_iterations)
    smooth = smooth_nu_loglog(xp, n, zx, zy, max_iter)
    t = xp.power(xp.clip(smooth / max_iter, 0.0, None), _f32(xp, 0.8))

    control = p.phoenix_stripe_control
    try:
        static_off = float(control) <= 0.01
    except Exception:
        static_off = False
    base = pal.palette_color_planar(xp, t, p.palette_mode, "classic")
    if static_off:
        return tuple(c.astype(xp.float32) for c in base)

    control = xp.maximum(_f32(xp, control), 0.0)
    stripe_amplitude = xp.clip(control * 0.05, 0.0, 1.0)
    angle = trig.atan2(xp, zy, zx)
    stripe_mod = 0.5 + 0.5 * xp.sin(angle * control + smooth * 0.25)
    adaptive = stripe_amplitude * (1.0 - xp.exp(-0.004 * smooth * smooth))
    t2 = pal._fract(xp, t + 0.1 * stripe_mod)
    stripe = pal.palette_color_planar(xp, t2, p.palette_mode, "classic")
    w = adaptive * stripe_mod * (control > 0.01)
    return tuple((b * (1.0 - w) + s * w).astype(xp.float32)
                 for b, s in zip(base, stripe))


def color_phoenix(xp, n, zx, zy, p: ColorParams):
    """phoenix.comp:89-146 — pow(t, 0.8) gradient + adaptive flow stripes.

    Phoenix's smooth value comes from smooth_nu_loglog with the fixed
    bailout of 4 (phoenix.comp:77-83); interior pixels use smooth = max_iter.

    The jitted (non-numpy) static-palette path delegates to the planar
    colorer so the unfused XLA pipeline is bit-identical to the fused
    in-kernel epilogue (models/common._fused_ok includes phoenix).
    """
    if xp is not np and isinstance(p.palette_mode, (int, np.integer)):
        return xp.stack(color_phoenix_planar(xp, n, zx, zy, p),
                        axis=-1).astype(xp.float32)
    max_iter = _f32(xp, p.max_iterations)
    smooth = smooth_nu_loglog(xp, n, zx, zy, max_iter)
    t = xp.power(xp.clip(smooth / max_iter, 0.0, None), _f32(xp, 0.8))

    # The stripe gate (phoenix.comp:124) is a static branch when the density
    # is a concrete Python float (golden path); with a traced density (jitted
    # render path) the gate is folded into the blend weight, which reproduces
    # the branch exactly since w == 0 when control <= 0.01.
    control = p.phoenix_stripe_control
    try:
        static_off = float(control) <= 0.01
    except Exception:
        static_off = False
    if static_off:
        color = pal.palette_color(xp, t, p.palette_mode, "classic")
        return color.astype(xp.float32)

    control = xp.maximum(_f32(xp, control), 0.0)
    stripe_amplitude = xp.clip(control * 0.05, 0.0, 1.0)
    angle = xp.arctan2(zy, zx)
    stripe_mod = 0.5 + 0.5 * xp.sin(angle * control + smooth * 0.25)
    adaptive = stripe_amplitude * (1.0 - xp.exp(-0.004 * smooth * smooth))
    t2 = pal._fract(xp, t + 0.1 * stripe_mod)
    base = pal.palette_color(xp, t, p.palette_mode, "classic")
    stripe = pal.palette_color(xp, t2, p.palette_mode, "classic")
    w = (adaptive * stripe_mod * (control > 0.01))[..., None]
    color = base * (1.0 - w) + stripe * w
    return color.astype(xp.float32)


# NOTE: the reference phoenix shader only ships palette 0 (ultra_fire,
# phoenix.comp:34-42) and routes every mode to it.  ultra_fire is numerically
# identical to classic fire, so color_phoenix uses the classic family; we
# intentionally honor palette_mode instead of hard-wiring 0 (superset).


def distance_estimate(xp, n, zx, zy, dzx, dzy, max_iterations):
    """Exterior distance estimate d = |z|·ln|z| / |dz| from the derivative
    field (the quantity mandelbrot_debug.comp:114-137 tracks).  Interior
    pixels report 0."""
    max_iter = _f32(xp, max_iterations)
    zmag = xp.sqrt(zx * zx + zy * zy)
    dmag = xp.maximum(xp.sqrt(dzx * dzx + dzy * dzy), 1e-30)
    d = zmag * xp.log(xp.maximum(zmag, 1e-30)) / dmag
    return xp.where(n.astype(xp.float32) >= max_iter, xp.zeros_like(d),
                    xp.maximum(d, 0.0))


def color_deep_zoom(xp, n, zx, zy, p: ColorParams):
    """test_deep_zoom.comp:73-103.  No post chain (the reference's deep-zoom
    shader writes raw palette colors)."""
    import contextlib

    import numpy as _np

    # Interior lanes carry poison-latched |z| ~ f32-max; their inf/NaN
    # smooth values are masked by `inside` below, but host numpy warns on
    # the way there (the device path is warning-free).  Keep the exact
    # sqrt(x^2+y^2) formula (hypot would differ by ulps from the shader's
    # f32 length()) and silence only the numpy path.
    ctx = _np.errstate(over="ignore", invalid="ignore") \
        if xp is _np else contextlib.nullcontext()
    with ctx:
        return _color_deep_zoom(xp, n, zx, zy, p)


def _color_deep_zoom(xp, n, zx, zy, p: ColorParams):
    max_iter = _f32(xp, p.max_iterations)
    nf = n.astype(xp.float32)
    lenz = xp.maximum(xp.sqrt(zx * zx + zy * zy), 1e-12)
    log_zn = xp.log(lenz)
    nu = xp.log(xp.maximum(log_zn, 1e-38) / _LOG2) / _LOG2
    smooth = nf + 1.0 - nu
    t = smooth * p.color_scale + p.color_offset
    color = pal.deepzoom_color(xp, t, int(p.palette_mode))
    inside = (nf >= max_iter - 0.5)[..., None]
    return xp.where(inside, xp.zeros_like(color), color).astype(xp.float32)
