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


def render_preview_cpu(scene: Scene, width: int, height: int):
    """First-visible-frame fallback: the IDENTICAL render pipeline
    compiled on the local XLA **CPU** backend (Pallas interpret mode).

    The reference shows pixels milliseconds after launch because its
    SPIR-V ships prebuilt (compute_effect_manager.cpp:120-138); a fresh
    TPU process instead blocks on a remote XLA compile that can take
    minutes.  The CPU compile is local and fast (~1.5 s cold for 1080p,
    measured), and interpret mode runs the same kernel math — callers
    serve this frame immediately and swap in the device frame when its
    compile lands (cli.render, live first frame).

    Returns an (H, W, 3) f32 numpy image, or None for families without a
    cheap CPU path (the mandelbulb raymarch and deep zoom — deep zoom
    already shows orbit progress, and its kernels are depth-bound either
    way).  Inputs are committed to the CPU device explicitly (device_put)
    rather than via a process-global default-device switch, so a
    concurrent TPU render in another thread is unaffected."""
    import jax
    import numpy as np

    from ..utils.diag import validate_scene
    from . import common

    scene = validate_scene(scene)
    fam = common.family_map().get(scene.fractal_type)
    if fam is None:
        return None
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return None
    family, conv, clamp = fam
    cfg = common.scene_static_cfg(scene, width, height, family, conv,
                                  clamp, interpret=True)
    dyn = {k: jax.device_put(np.float32(v), cpu)
           for k, v in common.scene_dyn_params(scene).items()}
    return np.asarray(common.compiled_render_fn(cfg)(dyn))
