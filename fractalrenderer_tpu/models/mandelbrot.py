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
