"""Device-mesh construction for multi-chip rendering.

The reference is strictly single-GPU/single-queue (SURVEY.md §2.4: the
dedicated compute-queue fields in vk_engine.h:140-146 are dead code).  The
TPU-native scaling axes are:

- ``rows``: the image's row-block axis — a gather-free spatial decomposition
  (each chip owns a contiguous horizontal band; no cross-chip traffic except
  the optional final assembly).
- ``frames``: the animation/batch axis — Julia c-sweeps (BASELINE config #2)
  and .franim frames shard trivially.

Collectives ride ICI by keeping the mesh one-dimensional per axis; with no
gathers in the render path the only communication is output assembly.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_render_mesh(n_devices: Optional[int] = None,
                     frames: int = 1) -> Mesh:
    """Build a (frames, rows) mesh over available devices.  With frames=1
    the mesh is purely spatial."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if n % frames != 0:
        raise ValueError(f"{n} devices not divisible by frames={frames}")
    rows = n // frames
    arr = np.array(devs).reshape(frames, rows)
    return Mesh(arr, axis_names=("frames", "rows"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard an (H, W, ...) image over its row axis."""
    return NamedSharding(mesh, P("rows"))


def frame_row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard an (N_frames, H, W, ...) batch over frames × rows."""
    return NamedSharding(mesh, P("frames", "rows"))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
