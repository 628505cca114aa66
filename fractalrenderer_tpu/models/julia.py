"""Julia-set renderer — Pallas port of shaders/julia.comp.

z0 = pixel, constant c; smooth bailout-relative coloring; 10 enhanced
palettes; black interior; supersampling with the reference's uv-space
offsets; clamped post chain (julia.comp:319-322).
"""
from __future__ import annotations

from .common import render_scene
from ..scene import Scene


def render(scene: Scene, width: int, height: int, **kw):
    return render_scene(scene, width, height, family="julia",
                        aa_convention="uv", clamp_mins=True, **kw)
