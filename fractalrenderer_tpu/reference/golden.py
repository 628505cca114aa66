"""CPU golden reference — pure NumPy float32 escape-time implementations with
the exact operation order of the reference's GLSL shaders.

This is the bit-consistency oracle demanded by BASELINE.json: the Pallas
kernels' integer iteration counts must equal these, and colors must match to
float tolerance.  Loop structure mirrors the shaders:

- mandelbrot.comp:147-207 — update z, track traps on the NEW z, then check
  ``|z|^2 > bailout^2``; the loop index at break is the iteration count.
- julia.comp:222-249 — same counting, interior black.
- burning_ship.comp:217-308 — traps/stripes on the PRE-update z, then
  ``z = abs(z)``, update, check.
- phoenix.comp:63-84 — two-term recurrence with fixed bailout 4.

Vectorized over pixels with an alive mask; escaped pixels freeze their
(n, z, aux) fields, matching per-thread early exit on the GPU.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..ops import coloring, mapping
from ..ops.coloring import ColorParams

F32 = np.float32


def _alive_loop_mandelbrot(cr, ci, max_iter: int, bailout: float, xp=np):
    """Returns (n, zx, zy, min_trap)."""
    shape = cr.shape
    zx = xp.zeros(shape, F32)
    zy = xp.zeros(shape, F32)
    n = xp.zeros(shape, np.int32)
    min_trap = xp.full(shape, 1e20, F32)
    alive = xp.ones(shape, bool)
    bail2 = F32(bailout) * F32(bailout)
    for _ in range(max_iter):
        if xp is np and not alive.any():
            break
        x = zx * zx - zy * zy + cr
        y = (F32(2.0) * zx) * zy + ci
        zx = xp.where(alive, x, zx)
        zy = xp.where(alive, y, zy)
        # Combined orbit trap on the updated z (mandelbrot.comp:162-166)
        dist_origin = xp.sqrt(zx * zx + zy * zy)
        dist_axes = xp.minimum(xp.abs(zx), xp.abs(zy))
        dist_c = xp.sqrt((zx - cr) ** 2 + (zy - ci) ** 2)
        trap = xp.minimum(dist_origin, xp.minimum(dist_axes, dist_c))
        min_trap = xp.where(alive, xp.minimum(min_trap, trap), min_trap)
        escaped = alive & (zx * zx + zy * zy > bail2)
        n = xp.where(alive & ~escaped, n + 1, n)
        alive &= ~escaped
    return n, zx, zy, min_trap


def _alive_loop_julia(zx0, zy0, c_re: float, c_im: float, max_iter: int,
                      bailout: float, xp=np):
    zx = xp.asarray(zx0, F32)
    zy = xp.asarray(zy0, F32)
    shape = zx.shape
    n = xp.zeros(shape, np.int32)
    alive = xp.ones(shape, bool)
    bail2 = F32(bailout) * F32(bailout)
    cr = F32(c_re)
    ci = F32(c_im)
    for _ in range(max_iter):
        if xp is np and not alive.any():
            break
        x = zx * zx - zy * zy + cr
        y = (F32(2.0) * zx) * zy + ci
        zx = xp.where(alive, x, zx)
        zy = xp.where(alive, y, zy)
        escaped = alive & (zx * zx + zy * zy > bail2)
        n = xp.where(alive & ~escaped, n + 1, n)
        alive &= ~escaped
    return n, zx, zy


def _alive_loop_burning_ship(cr, ci, max_iter: int, bailout: float,
                             orbit_trap: bool, trap_radius: float,
                             stripe: bool, stripe_density: float,
                             interior_style: int, xp=np):
    shape = cr.shape
    zx = xp.zeros(shape, F32)
    zy = xp.zeros(shape, F32)
    n = xp.zeros(shape, np.int32)
    min_trap = xp.full(shape, 1e10, F32)
    stripe_acc = xp.zeros(shape, F32)
    alive = xp.ones(shape, bool)
    bail2 = F32(bailout) * F32(bailout)
    track_stripe = stripe and interior_style == 2
    for _ in range(max_iter):
        if xp is np and not alive.any():
            break
        if orbit_trap:  # pre-abs z (burning_ship.comp:230-233)
            dist = xp.sqrt(zx * zx + zy * zy)
            min_trap = xp.where(
                alive, xp.minimum(min_trap, xp.abs(dist - F32(trap_radius))),
                min_trap)
        if track_stripe:  # burning_ship.comp:236-238
            stripe_acc = xp.where(
                alive, stripe_acc + xp.sin(zy * F32(stripe_density)), stripe_acc)
        ax = xp.abs(zx)
        ay = xp.abs(zy)
        x = ax * ax - ay * ay + cr
        y = (F32(2.0) * ax) * ay + ci
        zx = xp.where(alive, x, zx)
        zy = xp.where(alive, y, zy)
        escaped = alive & (zx * zx + zy * zy > bail2)
        n = xp.where(alive & ~escaped, n + 1, n)
        alive &= ~escaped
    return n, zx, zy, min_trap, stripe_acc


def _alive_loop_phoenix(cr, ci, max_iter: int, julia_c: Tuple[float, float],
                        use_julia: bool, p: float, r: float, xp=np):
    shape = cr.shape
    zx = xp.zeros(shape, F32)
    zy = xp.zeros(shape, F32)
    px_ = xp.zeros(shape, F32)
    py_ = xp.zeros(shape, F32)
    n = xp.zeros(shape, np.int32)
    alive = xp.ones(shape, bool)
    add_re = F32(julia_c[0]) if use_julia else cr
    add_im = F32(julia_c[1]) if use_julia else ci
    pf = F32(p)
    rf = F32(r)
    for _ in range(max_iter):
        if xp is np and not alive.any():
            break
        x = zx * zx - zy * zy + add_re + rf * px_ + pf * zx
        y = (F32(2.0) * zx) * zy + add_im + rf * py_ + pf * zy
        px_ = xp.where(alive, zx, px_)
        py_ = xp.where(alive, zy, py_)
        zx = xp.where(alive, x, zx)
        zy = xp.where(alive, y, zy)
        escaped = alive & (zx * zx + zy * zy > F32(4.0))
        n = xp.where(alive & ~escaped, n + 1, n)
        alive &= ~escaped
    return n, zx, zy


def _pixel_coords(width: int, height: int):
    py, px = np.mgrid[0:height, 0:width]
    return px.astype(F32), py.astype(F32)


# ---------------------------------------------------------------------------
# Field renderers (one AA sample)
# ---------------------------------------------------------------------------

def mandelbrot_fields(width, height, cx, cy, zoom, max_iter, bailout,
                      off=(0.0, 0.0), xp=np):
    px, py = _pixel_coords(width, height)
    cr, ci = mapping.map_centered(xp, xp.asarray(px), xp.asarray(py), width,
                                  height, cx, cy, zoom, off[0], off[1])
    return _alive_loop_mandelbrot(cr, ci, max_iter, bailout, xp=xp)


def julia_fields(width, height, cx, cy, zoom, c_re, c_im, max_iter, bailout,
                 off=(0.0, 0.0), xp=np):
    px, py = _pixel_coords(width, height)
    zr, zi = mapping.map_uv(xp, xp.asarray(px), xp.asarray(py), width, height,
                            cx, cy, zoom, off[0], off[1])
    return _alive_loop_julia(zr, zi, c_re, c_im, max_iter, bailout, xp=xp)


def burning_ship_fields(width, height, cx, cy, zoom, max_iter, bailout,
                        orbit_trap, trap_radius, stripe, stripe_density,
                        interior_style, off=(0.0, 0.0), xp=np):
    px, py = _pixel_coords(width, height)
    cr, ci = mapping.map_uv(xp, xp.asarray(px), xp.asarray(py), width, height,
                            cx, cy, zoom, off[0], off[1])
    return _alive_loop_burning_ship(cr, ci, max_iter, bailout, orbit_trap,
                                    trap_radius, stripe, stripe_density,
                                    interior_style, xp=xp)


def phoenix_fields(width, height, cx, cy, zoom, max_iter, julia_c, use_julia,
                   p, r, off=(0.0, 0.0), xp=np):
    px, py = _pixel_coords(width, height)
    cr, ci = mapping.map_uv(xp, xp.asarray(px), xp.asarray(py), width, height,
                            cx, cy, zoom, off[0], off[1])
    return _alive_loop_phoenix(cr, ci, max_iter, julia_c, use_julia, p, r,
                               xp=xp)


# ---------------------------------------------------------------------------
# Full renders (AA + coloring + post chain)
# ---------------------------------------------------------------------------

def render_scene(scene, width: int, height: int) -> np.ndarray:
    """Render a Scene to f32 RGB [0,1] exactly as the reference would."""
    from ..scene import FractalType

    p = ColorParams(
        max_iterations=scene.max_iterations,
        bailout=scene.bailout,
        palette_mode=scene.palette_mode,
        color_offset=scene.color_offset,
        color_scale=scene.color_scale,
        interior_style=scene.interior_style,
        orbit_trap_enabled=scene.orbit_trap_enabled,
        orbit_trap_radius=scene.orbit_trap_radius,
        stripe_enabled=scene.stripe_enabled,
        stripe_density=scene.stripe_density,
        # Phoenix receives stripe_density unconditionally
        # (compute_effect_manager.h:227-231 packs it regardless of the
        # stripe_enabled flag; phoenix.comp:97 gates on density > 0.01 only).
        phoenix_stripe_control=scene.stripe_density,
    )
    aa = max(scene.antialiasing_samples, 1)
    ft = scene.fractal_type
    acc = np.zeros((height, width, 3), F32)

    if ft == FractalType.MANDELBROT:
        for off in mapping.aa_offsets_centered(aa):
            n, zx, zy, trap = mandelbrot_fields(
                width, height, scene.center_x, scene.center_y, scene.zoom,
                scene.max_iterations, scene.bailout, off)
            acc += coloring.color_mandelbrot(np, n, zx, zy, trap, p)
        color = acc / F32(aa * aa)
        return coloring.post_chain(np, color, scene.color_brightness,
                                   scene.color_saturation, scene.color_contrast)

    if ft == FractalType.JULIA:
        for off in mapping.aa_offsets_uv(aa, width):
            n, zx, zy = julia_fields(
                width, height, scene.center_x, scene.center_y, scene.zoom,
                scene.julia_c_real, scene.julia_c_imag,
                scene.max_iterations, scene.bailout, off)
            acc += coloring.color_julia(np, n, zx, zy, p)
        color = acc / F32(aa * aa)
        return coloring.post_chain(np, color, scene.color_brightness,
                                   scene.color_saturation,
                                   scene.color_contrast, clamp_mins=True)

    if ft == FractalType.BURNING_SHIP:
        for off in mapping.aa_offsets_uv(aa, width):
            n, zx, zy, trap, stripe = burning_ship_fields(
                width, height, scene.center_x, scene.center_y, scene.zoom,
                scene.max_iterations, scene.bailout,
                scene.orbit_trap_enabled, scene.orbit_trap_radius,
                scene.stripe_enabled, scene.stripe_density,
                scene.interior_style, off)
            acc += coloring.color_burning_ship(np, n, zx, zy, trap, stripe, p)
        color = acc / F32(aa * aa)
        return coloring.post_chain(np, color, scene.color_brightness,
                                   scene.color_saturation,
                                   scene.color_contrast, clamp_mins=True)

    if ft == FractalType.PHOENIX:
        for off in mapping.aa_offsets_uv(aa, width):
            n, zx, zy = phoenix_fields(
                width, height, scene.center_x, scene.center_y, scene.zoom,
                scene.max_iterations,
                (scene.julia_c_real, scene.julia_c_imag),
                scene.use_julia_set, scene.phoenix_p, scene.phoenix_r, off)
            acc += coloring.color_phoenix(np, n, zx, zy, p)
        color = acc / F32(aa * aa)
        return coloring.post_chain(np, color, scene.color_brightness,
                                   scene.color_saturation,
                                   scene.color_contrast, clamp_mins=True)

    raise NotImplementedError(f"golden render for {ft}")
