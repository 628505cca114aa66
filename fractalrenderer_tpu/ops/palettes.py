"""Color palettes, vectorized and backend-agnostic (numpy or jax.numpy).

Every palette in the reference's GLSL shaders is ported as an elementwise
function of a scalar field ``t`` producing an RGB array with a trailing axis
of size 3.  Families:

- ``classic``  (6): shaders/mandelbrot.comp:60-141 — fire, electric,
  grayscale, nebula, solar, ocean.
- ``enhanced`` (10): shaders/julia.comp:20-181 == shaders/burning_ship.comp —
  ultra_fire, electric, ocean_enhanced, sunset, cosmic, gold, vaporwave,
  forest, lava, grayscale.
- ``deepzoom`` (4): shaders/test_deep_zoom.comp:73-103 — hsv, blue, fire,
  gray (these consume the raw ``t``; scaling happens in the caller).
- ``bulb``     (6): shaders/mandelbulb.comp:34-75 — procedural dynamic /
  fire_and_ice / lava / neon with hash noise.

All functions take ``xp`` (numpy or jax.numpy) as the first argument so the
CPU golden reference and the TPU render path share one implementation.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _f32(xp, v):
    return xp.asarray(v, dtype=xp.float32)


def _vec3(xp, r, g, b):
    return xp.asarray([r, g, b], dtype=xp.float32)


def _mix(a, b, t):
    """GLSL mix(a, b, t) with ``t`` broadcast onto the color axis."""
    t = t[..., None]
    return a * (1.0 - t) + b * t


def _fract(xp, t):
    return t - xp.floor(t)


def _clamp(xp, t, lo, hi):
    return xp.minimum(xp.maximum(t, lo), hi)


def _smoothstep(xp, t):
    t = _clamp(xp, t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _piecewise5_planar(xp, t, cols: Sequence[Tuple[float, float, float]],
                       bounds: Sequence[float]):
    """Planar 5-stop gradient: returns (r, g, b) planes shaped like ``t``.

    Channel math is identical to the stacked form (scalar stop constants,
    same mix/select order), so stack(planar) is bit-identical to the old
    vec3 formulation — the planar form exists so Pallas kernels can fuse
    coloring without materializing a trailing size-3 axis (which would pad
    TPU lanes 3→128)."""
    out = [xp.full(t.shape, _f32(xp, cols[-1][ch]), dtype=xp.float32)
           for ch in range(3)]
    # Build from the last segment backwards so earlier segments win.
    for i in reversed(range(len(bounds) - 1)):
        lo, hi = bounds[i], bounds[i + 1]
        f = (t - lo) / (hi - lo)
        sel = t < hi
        for ch in range(3):
            seg = _f32(xp, cols[i][ch]) * (1.0 - f) \
                + _f32(xp, cols[i + 1][ch]) * f
            out[ch] = xp.where(sel, seg, out[ch])
    return tuple(o.astype(xp.float32) for o in out)


def _piecewise5(xp, t, cols: Sequence[Tuple[float, float, float]],
                bounds: Sequence[float]):
    """5-stop gradient: segment i spans [bounds[i], bounds[i+1]) mixing
    cols[i]→cols[i+1]; t >= bounds[-1] returns cols[-1]."""
    return xp.stack(_piecewise5_planar(xp, t, cols, bounds),
                    axis=-1).astype(xp.float32)


# ---------------------------------------------------------------------------
# classic family (mandelbrot.comp)
# ---------------------------------------------------------------------------

# Gradient specs shared by the stacked and planar evaluators:
# (pre-transform key, stops, bounds).  Pre-transforms: a (kind, value)
# tag interpreted by _pre (pow / smoothstep / fract / fract-then-pow).
_CLASSIC_SPECS = (
    # mandelbrot.comp:60-72
    (("pow", 0.7),
     [(0.0, 0.0, 0.1), (0.8, 0.0, 0.0), (1.0, 0.3, 0.0),
      (1.0, 0.9, 0.0), (1.0, 1.0, 0.95)],
     [0.0, 0.2, 0.4, 0.6, 0.8]),
    # mandelbrot.comp:74-85
    (("smoothstep", None),
     [(0.0, 0.0, 0.05), (0.0, 0.1, 0.4), (0.0, 0.5, 1.0),
      (0.3, 0.8, 1.0), (0.8, 1.0, 1.0)],
     [0.0, 0.25, 0.5, 0.75, 1.0]),
    # mandelbrot.comp:87-89 — grayscale, no gradient
    (("gray", None), None, None),
    # mandelbrot.comp:91-102
    (("fract", None),
     [(0.02, 0.00, 0.05), (0.15, 0.00, 0.25), (0.00, 0.40, 0.60),
      (0.00, 0.90, 1.00), (0.90, 0.95, 1.00)],
     [0.0, 0.25, 0.5, 0.75, 1.0]),
    # mandelbrot.comp:104-115
    (("fract_pow", 0.9),
     [(0.1, 0.0, 0.1), (0.5, 0.0, 0.2), (0.9, 0.3, 0.0),
      (1.0, 0.8, 0.3), (1.0, 1.0, 0.9)],
     [0.0, 0.25, 0.5, 0.75, 1.0]),
    # mandelbrot.comp:117-128
    (("fract_pow", 0.85),
     [(0.0, 0.05, 0.08), (0.0, 0.3, 0.5), (0.0, 0.7, 0.9),
      (0.2, 0.9, 1.0), (0.9, 1.0, 1.0)],
     [0.0, 0.25, 0.5, 0.75, 1.0]),
)


def _pre(xp, t, tag):
    kind, val = tag
    if kind == "pow":
        return xp.power(t, _f32(xp, val))
    if kind == "smoothstep":
        return _smoothstep(xp, t)
    if kind == "fract":
        return _fract(xp, t)
    if kind == "fract_pow":
        return xp.power(_fract(xp, t), _f32(xp, val))
    return t  # "gray" / identity


def _spec_planar(xp, t, spec):
    tag, cols, bounds = spec
    t = _pre(xp, t, tag)
    if cols is None:  # grayscale
        t = t.astype(xp.float32)
        return t, t, t
    return _piecewise5_planar(xp, t, cols, bounds)


def _spec_color(xp, t, spec):
    return xp.stack(_spec_planar(xp, t, spec), axis=-1).astype(xp.float32)


def classic_fire(xp, t):
    return _spec_color(xp, t, _CLASSIC_SPECS[0])


def classic_electric(xp, t):
    return _spec_color(xp, t, _CLASSIC_SPECS[1])


def classic_grayscale(xp, t):
    return _spec_color(xp, t, _CLASSIC_SPECS[2])


def classic_nebula(xp, t):
    return _spec_color(xp, t, _CLASSIC_SPECS[3])


def classic_solar(xp, t):
    return _spec_color(xp, t, _CLASSIC_SPECS[4])


def classic_ocean(xp, t):
    return _spec_color(xp, t, _CLASSIC_SPECS[5])


CLASSIC_PALETTES = (classic_fire, classic_electric, classic_grayscale,
                    classic_nebula, classic_solar, classic_ocean)
CLASSIC_NAMES = ("fire", "electric", "grayscale", "nebula", "solar", "ocean")


# ---------------------------------------------------------------------------
# enhanced family (julia.comp / burning_ship.comp)
# ---------------------------------------------------------------------------

_ENHANCED_SPECS = (
    # julia.comp:20-34 — ultra_fire
    (("pow", 0.7),
     [(0.0, 0.0, 0.1), (0.8, 0.0, 0.0), (1.0, 0.3, 0.0),
      (1.0, 0.9, 0.0), (1.0, 1.0, 0.95)],
     [0.0, 0.2, 0.4, 0.6, 0.8]),
    # julia.comp:37-50 — electric (same as classic)
    _CLASSIC_SPECS[1],
    # julia.comp:53-66 — ocean
    (("smoothstep", None),
     [(0.0, 0.0, 0.1), (0.0, 0.1, 0.3), (0.0, 0.4, 0.7),
      (0.0, 0.7, 1.0), (0.5, 1.0, 1.0)],
     [0.0, 0.25, 0.5, 0.75, 1.0]),
    # julia.comp:69-81 — sunset
    (("id", None),
     [(0.1, 0.0, 0.2), (0.5, 0.1, 0.3), (1.0, 0.3, 0.2),
      (1.0, 0.7, 0.3), (1.0, 0.95, 0.7)],
     [0.0, 0.2, 0.4, 0.6, 0.8]),
    # julia.comp:84-97 — cosmic, non-uniform breakpoints
    (("pow", 0.8),
     [(0.0, 0.0, 0.0), (0.2, 0.0, 0.4), (0.4, 0.0, 0.6),
      (0.8, 0.3, 0.9), (1.0, 0.7, 1.0)],
     [0.0, 0.3, 0.5, 0.7, 1.0]),
    # julia.comp:100-113 — gold
    (("smoothstep", None),
     [(0.1, 0.05, 0.0), (0.4, 0.2, 0.0), (0.8, 0.5, 0.1),
      (1.0, 0.8, 0.3), (1.0, 1.0, 0.9)],
     [0.0, 0.25, 0.5, 0.75, 1.0]),
    # julia.comp:116-127 — vaporwave
    (("id", None),
     [(0.1, 0.0, 0.2), (0.5, 0.0, 0.5), (1.0, 0.0, 0.8),
      (0.0, 0.8, 1.0), (1.0, 0.5, 1.0)],
     [0.0, 0.25, 0.5, 0.75, 1.0]),
    # julia.comp:130-141 — forest
    (("id", None),
     [(0.0, 0.05, 0.0), (0.0, 0.2, 0.1), (0.1, 0.5, 0.2),
      (0.3, 0.8, 0.4), (0.8, 1.0, 0.6)],
     [0.0, 0.25, 0.5, 0.75, 1.0]),
    # julia.comp:144-157 — lava, segment spans 0.2/0.2/0.3/0.3
    (("pow", 0.6),
     [(0.1, 0.0, 0.0), (0.6, 0.0, 0.0), (1.0, 0.2, 0.0),
      (1.0, 0.6, 0.0), (1.0, 1.0, 0.5)],
     [0.0, 0.2, 0.4, 0.7, 1.0]),
    # julia.comp:160-162 — grayscale
    _CLASSIC_SPECS[2],
)


def enhanced_ultra_fire(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[0])


def enhanced_electric(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[1])


def enhanced_ocean(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[2])


def enhanced_sunset(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[3])


def enhanced_cosmic(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[4])


def enhanced_gold(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[5])


def enhanced_vaporwave(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[6])


def enhanced_forest(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[7])


def enhanced_lava(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[8])


def enhanced_grayscale(xp, t):
    return _spec_color(xp, t, _ENHANCED_SPECS[9])


ENHANCED_PALETTES = (enhanced_ultra_fire, enhanced_electric, enhanced_ocean,
                     enhanced_sunset, enhanced_cosmic, enhanced_gold,
                     enhanced_vaporwave, enhanced_forest, enhanced_lava,
                     enhanced_grayscale)
ENHANCED_NAMES = ("ultra_fire", "electric", "ocean", "sunset", "cosmic",
                  "gold", "vaporwave", "forest", "lava", "grayscale")


# ---------------------------------------------------------------------------
# deep-zoom family (test_deep_zoom.comp:73-103)
# ---------------------------------------------------------------------------

def hsv2rgb(xp, h, s, v):
    """test_deep_zoom.comp:65-69 (the vec4-K formulation)."""
    kx, ky, kz, kw = 1.0, 2.0 / 3.0, 1.0 / 3.0, 3.0
    px = xp.abs(_fract(xp, h + kx) * 6.0 - kw)
    py = xp.abs(_fract(xp, h + ky) * 6.0 - kw)
    pz = xp.abs(_fract(xp, h + kz) * 6.0 - kw)
    p = xp.stack([px, py, pz], axis=-1)
    one = xp.ones_like(p)
    rgb = one * (1.0 - s[..., None]) + _clamp(xp, p - 1.0, 0.0, 1.0) * s[..., None]
    return (v[..., None] * rgb).astype(xp.float32)


def deepzoom_color(xp, t, mode: int):
    """Palette switch of test_deep_zoom.comp:86-100 for a concrete mode."""
    if mode == 0:
        hue = _fract(xp, t * 0.05)
        return hsv2rgb(xp, hue, xp.full_like(hue, 0.8), xp.full_like(hue, 0.9))
    if mode == 1:
        s = _fract(xp, t * 0.03)
        return _mix(_vec3(xp, 0.0, 0.1, 0.3), _vec3(xp, 1.0, 1.0, 1.0), s)
    if mode == 2:
        s = _fract(xp, t * 0.04)
        return _mix(_vec3(xp, 0.1, 0.0, 0.0), _vec3(xp, 1.0, 0.8, 0.0), s)
    s = _fract(xp, t * 0.02)
    return xp.broadcast_to(s[..., None], s.shape + (3,)).astype(xp.float32)


# ---------------------------------------------------------------------------
# mandelbulb family (mandelbulb.comp:17-75)
# ---------------------------------------------------------------------------

def _bulb_hsv2rgb(xp, h, s, v):
    # mandelbulb.comp:17-20 (mod-based formulation)
    base = xp.stack([h * 6.0 + 0.0, h * 6.0 + 4.0, h * 6.0 + 2.0], axis=-1)
    rgb = _clamp(xp, xp.abs(xp.mod(base, 6.0) - 3.0) - 1.0, 0.0, 1.0)
    one = xp.ones_like(rgb)
    return (v[..., None] * (one * (1.0 - s[..., None]) + rgb * s[..., None])).astype(xp.float32)


def _hash(xp, px, py):
    # mandelbulb.comp:25
    return _fract(xp, xp.sin(px * 127.1 + py * 311.7) * 43758.5453123)


def _noise(xp, px, py):
    # mandelbulb.comp:26-32
    ix, iy = xp.floor(px), xp.floor(py)
    fx, fy = px - ix, py - iy
    a = _hash(xp, ix, iy)
    b = _hash(xp, ix + 1.0, iy)
    c = _hash(xp, ix, iy + 1.0)
    d = _hash(xp, ix + 1.0, iy + 1.0)
    ux = fx * fx * (3.0 - 2.0 * fx)
    uy = fy * fy * (3.0 - 2.0 * fy)
    return (a * (1.0 - ux) + b * ux) + (c - a) * uy * (1.0 - ux) + (d - b) * ux * uy


def bulb_dynamic(xp, t):
    # mandelbulb.comp:34-39
    hue = _fract(xp, t + 0.3 * xp.sin(t * 12.0))
    sat = 0.6 + 0.4 * xp.sin(t * 7.0)
    val = xp.power(t, _f32(xp, 0.4))
    return _bulb_hsv2rgb(xp, hue, sat, val)


def bulb_fire_and_ice(xp, t):
    # mandelbulb.comp:41-46
    blend = _smoothstep(xp, t)
    fire = xp.stack([xp.power(blend, _f32(xp, 2.0)), blend * 0.5,
                     xp.zeros_like(blend)], axis=-1)
    ice = xp.stack([xp.zeros_like(blend), 0.5 + 0.5 * blend,
                    xp.ones_like(blend)], axis=-1)
    return _mix(fire * 1.0, ice * 1.0, _fract(xp, t * 3.0)).astype(xp.float32)


def bulb_lava(xp, t):
    # mandelbulb.comp:48-55
    return _piecewise5(
        xp, t,
        [(0.1, 0.0, 0.0), (0.8, 0.1, 0.0), (1.0, 0.5, 0.0),
         (1.0, 0.9, 0.3), (1.0, 1.0, 0.8)],
        [0.0, 0.25, 0.5, 0.75, 1.0],
    )


def bulb_neon(xp, t):
    # mandelbulb.comp:57-61
    c1, c2 = _vec3(xp, 0.0, 0.0, 0.1), _vec3(xp, 0.0, 0.2, 0.6)
    c3, c4 = _vec3(xp, 0.0, 0.8, 1.0), _vec3(xp, 0.5, 1.0, 1.0)
    lo = _mix(c1, c2, t)
    hi = _mix(c3, c4, t)
    return _mix(lo, hi, xp.power(t, _f32(xp, 2.0))).astype(xp.float32)


def bulb_color(xp, t, mode: int):
    """mandelbulb.comp:63-75 — fract, add hash noise, dispatch."""
    t = _fract(xp, t)
    n = _noise(xp, t * 100.0, t * 57.0) * 0.02
    if mode == 0:
        return bulb_dynamic(xp, t + n)
    if mode == 1:
        return bulb_fire_and_ice(xp, t + n)
    if mode == 2:
        return bulb_lava(xp, t + n)
    if mode == 3:
        return bulb_neon(xp, t + n)
    if mode == 4:
        return bulb_dynamic(xp, xp.power(t, _f32(xp, 0.5)) + n)
    if mode == 5:
        return bulb_fire_and_ice(xp, xp.power(t, _f32(xp, 0.6)) + n)
    return bulb_dynamic(xp, t + n)


# ---------------------------------------------------------------------------
# dispatchers
# ---------------------------------------------------------------------------

def palette_color(xp, t, mode, family: str = "classic"):
    """GLSL get_palette_color: fract(t) then dispatch by palette mode.

    ``mode`` may be a Python int (numpy or jax) or a traced scalar (jax only,
    lowered to ``lax.switch``).
    """
    table = {"classic": CLASSIC_PALETTES, "enhanced": ENHANCED_PALETTES}[family]
    tf = _fract(xp, t)
    if isinstance(mode, (int, np.integer)):
        idx = int(mode)
        fn = table[idx] if 0 <= idx < len(table) else table[0]
        return fn(xp, tf)
    # Traced mode: only meaningful under JAX.
    import jax

    idx = xp.clip(mode, 0, len(table) - 1).astype(xp.int32)
    return jax.lax.switch(idx, [lambda tt, f=f: f(xp, tt) for f in table], tf)


def palette_color_planar(xp, t, mode: int, family: str = "classic"):
    """Planar get_palette_color for a STATIC mode: fract(t), then the
    palette's planar gradient — returns (r, g, b) planes.  stack(planar)
    is bit-identical to palette_color; Pallas kernels use this form to
    fuse coloring without a trailing size-3 axis."""
    specs = {"classic": _CLASSIC_SPECS, "enhanced": _ENHANCED_SPECS}[family]
    idx = int(mode)
    spec = specs[idx] if 0 <= idx < len(specs) else specs[0]
    return _spec_planar(xp, _fract(xp, t), spec)


def num_palettes(family: str) -> int:
    return {"classic": 6, "enhanced": 10, "deepzoom": 4, "bulb": 6}[family]
