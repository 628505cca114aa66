"""Fractal family renderers — the TPU replacement for the reference's
ComputeEffectManager dispatch (src/compute_effect_manager.h:435-468).

Each family module exposes ``render(scene, width, height)`` returning an f32
RGB array in [0, 1]; ``models.render`` dispatches on ``scene.fractal_type``.
"""
from __future__ import annotations

from ..scene import FractalType, Scene


def render(scene: Scene, width: int, height: int, **kw):
    from ..utils.diag import validate_scene

    scene = validate_scene(scene)  # compute_effect_manager.h:335-345 repairs
    ft = scene.fractal_type
    if ft == FractalType.MANDELBROT:
        from . import mandelbrot

        return mandelbrot.render(scene, width, height, **kw)
    if ft == FractalType.JULIA:
        from . import julia

        return julia.render(scene, width, height, **kw)
    if ft == FractalType.BURNING_SHIP:
        from . import burning_ship

        return burning_ship.render(scene, width, height, **kw)
    if ft == FractalType.PHOENIX:
        from . import phoenix

        return phoenix.render(scene, width, height, **kw)
    if ft == FractalType.MANDELBULB:
        from . import mandelbulb

        return mandelbulb.render(scene, width, height, **kw)
    if ft == FractalType.DEEP_ZOOM:
        from . import deep_zoom

        return deep_zoom.render(scene, width, height, **kw)
    raise NotImplementedError(ft)
