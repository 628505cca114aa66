"""Mandelbrot renderer — Pallas port of shaders/mandelbrot.comp.

z <- z^2 + c escape loop with combined orbit trap, smooth log-log coloring,
6 classic palettes, interior styles, stripes, NxN supersampling and the
enhance/ACES/gamma post chain.
"""
from __future__ import annotations

from .common import render_scene
from ..scene import Scene


def render(scene: Scene, width: int, height: int, **kw):
    return render_scene(scene, width, height, family="mandelbrot",
                        aa_convention="centered", clamp_mins=False, **kw)


def distance_field(scene: Scene, width: int, height: int):
    """Exterior distance-estimate field (pixels → distance to the set) via
    derivative tracking — the capability of the reference's unwired debug
    shader (mandelbrot_debug.comp).  Useful for contouring, adaptive AA and
    boundary-following."""
    import numpy as np

    from ..ops.coloring import distance_estimate
    from ..ops.escape import escape_fields

    f = escape_fields(
        "mandelbrot", width, height, center_x=scene.center_x,
        center_y=scene.center_y, zoom=scene.zoom,
        max_iter=scene.max_iterations, bailout=scene.bailout,
        track_deriv=True)
    import jax.numpy as jnp

    return np.asarray(distance_estimate(jnp, f["n"], f["zx"], f["zy"],
                                        f["dzx"], f["dzy"],
                                        scene.max_iterations))


def render_dd(scene: Scene, width: int, height: int):
    """Double-double precision variant (precision tier 2, ops/dd_escape.py):
    same viewport/coloring semantics as render() but with ~2^-48 coordinate
    precision, covering zooms past f32 without a reference orbit.  Uses the
    scene's hp_* strings when present."""
    import jax.numpy as jnp
    import numpy as np

    from ..ops import coloring
    from ..ops.coloring import ColorParams
    from ..ops.dd import dd_from_string
    from ..ops.dd_escape import dd_escape_fields

    def dd_of(hp, plain):
        return dd_from_string(str(hp) if hp is not None else repr(plain))

    f = dd_escape_fields(
        width, height,
        center_x_dd=dd_of(scene.hp_center_x, scene.center_x),
        center_y_dd=dd_of(scene.hp_center_y, scene.center_y),
        zoom_dd=dd_of(scene.hp_zoom, scene.zoom),
        max_iter=scene.max_iterations, bailout=scene.bailout)
    p = ColorParams(
        max_iterations=scene.max_iterations, bailout=scene.bailout,
        palette_mode=scene.palette_mode, color_offset=scene.color_offset,
        color_scale=scene.color_scale, interior_style=scene.interior_style)
    color = coloring.color_mandelbrot(
        jnp, f["n"], f["zx"], f["zy"],
        jnp.full_like(f["zx"], 1e20), p)
    color = coloring.post_chain(jnp, color, scene.color_brightness,
                                scene.color_saturation, scene.color_contrast)
    return np.asarray(color)
