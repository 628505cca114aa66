"""Pixel → complex-plane mapping, shared by the Pallas kernels and the CPU
golden reference so both see bit-identical f32 coordinates.

Two conventions exist in the reference shaders:

- *centered*: mandelbrot.comp:149-151 — ``uv = (pixel_pos - 0.5*res)/res.y``,
  ``c = center + uv*zoom`` (pixel_pos carries the AA offset, offsets are
  ``(sx, sy)/aa``, mandelbrot.comp:222-226).
- *uv*: julia.comp:222-264 / burning_ship.comp:318-343 / phoenix.comp:101-110
  — ``uv = texel/size (+ aa offset)``, ``x = cx + (uv.x-0.5)*zoom*aspect``,
  ``y = cy + (uv.y-0.5)*zoom``.

AA offsets for the *uv* convention replicate the reference exactly
(julia.comp:253-259): ``so = (1/width)/aa``;
``offset = (sx,sy)*so - so*(aa-1)/2``; ``sample_uv = uv + offset/size``.

All arithmetic is f32 with the reference's operation order.
"""
from __future__ import annotations

from typing import Tuple


def map_centered(xp, px, py, width: int, height: int,
                 cx, cy, zoom, off_x: float, off_y: float):
    """mandelbrot.comp mapping.  px/py are f32 integer pixel coordinates."""
    w = xp.float32(width)
    h = xp.float32(height)
    ux = (px + xp.float32(off_x) - xp.float32(0.5) * w) / h
    uy = (py + xp.float32(off_y) - xp.float32(0.5) * h) / h
    re = xp.float32(cx) + ux * xp.float32(zoom)
    im = xp.float32(cy) + uy * xp.float32(zoom)
    return re, im


def map_uv(xp, px, py, width: int, height: int,
           cx, cy, zoom, off_x: float, off_y: float):
    """julia/burning-ship/phoenix mapping.  ``off_*`` are the precomputed AA
    offsets in uv space *before* the division by size (see aa_offsets_uv).

    Algebraically identical to the shader's ``(uv.x-0.5)*zoom*aspect`` but
    factored as ``(px - 0.5*w)/h * zoom``: aspect/w == 1/h, so the only
    division is by the height.  Mosaic lowers division to reciprocal-
    multiply, which is exact only for power-of-two divisors — the /w form
    broke TPU↔golden bit-equality for any non-power-of-two width (found by
    the tpu_checks.py exactness lane).

    After that factoring the arithmetic is identical to map_centered, so
    this delegates — the two conventions differ only in their AA-offset
    precomputation (aa_offsets_uv vs aa_offsets_centered)."""
    return map_centered(xp, px, py, width, height, cx, cy, zoom,
                        off_x, off_y)


def aa_offsets_centered(aa: int) -> Tuple[Tuple[float, float], ...]:
    """mandelbrot.comp:222-226: offset = (sx, sy)/aa in pixel units."""
    aa = max(aa, 1)
    return tuple((sx / aa, sy / aa) for sy in range(aa) for sx in range(aa))


def aa_offsets_uv(aa: int, width: int) -> Tuple[Tuple[float, float], ...]:
    """julia.comp:253-259 — offsets in the shader's raw units (they get
    divided by size when applied; we fold that division into map_uv)."""
    aa = max(aa, 1)
    if aa <= 1:
        return ((0.0, 0.0),)
    pixel_size = 1.0 / width
    so = pixel_size / aa
    return tuple(
        (sx * so - so * (aa - 1) * 0.5, sy * so - so * (aa - 1) * 0.5)
        for sx in range(aa) for sy in range(aa)
    )
