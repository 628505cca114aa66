"""Shared Pallas/TPU helpers: interpret-mode selection and tiling math."""
from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=None)
def default_interpret() -> bool:
    """Run Pallas kernels in interpreter mode when the default backend is not
    a TPU (CPU tests / virtual-device meshes)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pick_tile(height: int, width: int, max_tile=(64, 128),
              prefer_divisor: bool = False) -> tuple:
    """Pick a VMEM tile shape: last dim a multiple of 128, second-to-last a
    multiple of 8, no larger than the (padded) image.

    The base (64, 128) was tuned on TPU v5e at 1080p/256-iter Mandelbrot:
    small tiles minimize divergence waste (a tile iterates until its slowest
    pixel escapes), and below (64, 128) grid overhead starts to dominate —
    (64,128) ≈ 1.34 Gpix/s vs (256,512) ≈ 0.45 Gpix/s.

    ``prefer_divisor``: when a slightly-taller tile divides the image height
    exactly, take it — the padded partial grid row costs real iterations.
    Worth it only when in-tile divergence is cheap (Mandelbrot with its
    analytic interior skip: (72,128) divides 1080 into 15 exact tiles,
    640 us/frame vs 682 us for (64,128)'s 17-row padded grid, trace-timed
    on v5e); for dust-like workloads (Julia) the taller tile's divergence
    waste outweighs the padding (736 → 800 us/frame), so it is opt-in."""
    th = min(max_tile[0], max(8, ((height + 7) // 8) * 8))
    tw = min(max_tile[1], max(128, ((width + 127) // 128) * 128))
    if prefer_divisor and height % th:
        # exact-dividing heights, multiples of 8, within ~1.5x of the base
        for cand in range(th + 8, th + th // 2 + 1, 8):
            if height % cand == 0:
                return cand, tw
    return th, tw
