"""fractalrenderer_tpu — a TPU-native fractal rendering framework.

A ground-up JAX / Pallas / shard_map re-design of franklynch/FractalRenderer
(C++20 / Vulkan compute / ImGui): escape-time fractals as Pallas kernels over
VMEM-tiled pixel blocks, a functional Scene pytree instead of mutable engine
state, keyframe animation with batched multi-frame rendering, double-double +
perturbation deep zoom, and gather-free multi-chip image sharding.

See SURVEY.md at the repo root for the full reference analysis.
"""

from .utils.compile_cache import configure_persistent_cache

configure_persistent_cache()

from .scene import FractalType, InteriorStyle, Scene
from . import presets

__version__ = "0.1.0"

__all__ = ["Scene", "FractalType", "InteriorStyle", "presets", "render",
           "render_numpy"]


def render(scene, width, height, **kw):
    """Render a Scene on the default JAX backend → f32 RGB array (H, W, 3)."""
    from .models import render as _render

    return _render(scene, width, height, **kw)


def render_numpy(scene, width, height):
    """CPU golden-reference render (slow; for verification)."""
    from .reference import golden

    return golden.render_scene(scene, width, height)
