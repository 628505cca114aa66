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


def render_c_sweep(scene: Scene, c_values, width: int, height: int):
    """Batched c-parameter sweep (BASELINE config #2): render the same
    viewport for a batch of Julia c constants in one device dispatch.

    ``c_values``: sequence of (re, im) pairs → (N, H, W, 3) f32 array.
    The reference's equivalent is interactively dragging the c sliders
    (ui_manager.cpp Julia panel) one frame at a time.
    """
    import numpy as np

    from .common import (compiled_batch_render_fn, scene_dyn_params,
                         scene_static_cfg)

    cfg = scene_static_cfg(scene, width, height, "julia", "uv", True)
    fn = compiled_batch_render_fn(cfg)
    base = scene_dyn_params(scene)
    batch = {k: np.full(len(c_values), v, np.float32)
             for k, v in base.items()}
    batch["julia_c_real"] = np.asarray([c[0] for c in c_values], np.float32)
    batch["julia_c_imag"] = np.asarray([c[1] for c in c_values], np.float32)
    return fn(batch)
