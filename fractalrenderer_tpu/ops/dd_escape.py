"""Direct double-double Mandelbrot escape kernel — precision tier 2.

The reference's precision ladder (SURVEY.md §5) is f32 shader → dd shader →
MPFR + perturbation; its dd-iterated fallback lived in the unwired
mandelbrot_deep_zoom.comp (dd struct arithmetic, :27-100 — checked-in text
corrupt, design intent only).  This kernel realizes that tier properly:
every pixel iterates z <- z^2 + c entirely in double-double (two-f32,
~2^-48 relative precision), covering zooms ~1e-6 … 1e-12 without a
reference orbit.

Mapping matches the standard mandelbrot centered convention
(mandelbrot.comp:149-151) evaluated in dd: c = center_dd + uv * zoom_dd.
Escape/count semantics are identical to ops/escape.py (peeled update 0,
survivor counting, interior fixup), tested against an f64 oracle.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd
from .pallas_utils import cdiv, default_interpret, pick_tile

(D_CXH, D_CXL, D_CYH, D_CYL, D_ZH, D_ZL, D_LIMIT, D_BAIL2, D_OFFX,
 D_OFFY, D_ROW0) = range(11)
ND = 11


def _make_kernel(width: int, height: int, map_height: int,
                 tile: Tuple[int, int], chunk: int):
    th, tw = tile

    def kernel(params_ref, n_ref, zx_ref, zy_ref):
        tj = pl.program_id(1)
        ti = pl.program_id(0)
        row0 = params_ref[0, D_ROW0].astype(jnp.int32)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                + ti * th + row0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tj * tw
        in_bounds = (rows < map_height) & (cols < width) \
            & (rows - row0 < height)

        limit = params_ref[0, D_LIMIT].astype(jnp.int32)
        bail2 = params_ref[0, D_BAIL2]

        # centered mapping in dd: uv = (pix + off - 0.5*size)/size.y
        wf = jnp.float32(width)
        hf = jnp.float32(map_height)
        ux = (cols.astype(jnp.float32) + params_ref[0, D_OFFX]
              - 0.5 * wf) / hf
        uy = (rows.astype(jnp.float32) + params_ref[0, D_OFFY]
              - 0.5 * hf) / hf
        zoom_dd = (params_ref[0, D_ZH], params_ref[0, D_ZL])
        cr = dd.dd_add(jnp, (params_ref[0, D_CXH], params_ref[0, D_CXL]),
                       dd.dd_mul_float(jnp, zoom_dd, ux))
        ci = dd.dd_add(jnp, (params_ref[0, D_CYH], params_ref[0, D_CYL]),
                       dd.dd_mul_float(jnp, zoom_dd, uy))

        # peel update 0: z1 = c
        big = jnp.float32(3.4e38)
        state0 = {
            "zrh": cr[0], "zrl": cr[1], "zih": ci[0], "zil": ci[1],
            "nf": jnp.zeros((th, tw), jnp.float32),
            "mag": jnp.where(in_bounds, dd.ddc_mag2(jnp, cr, ci), big),
            "i": jnp.int32(1),
        }

        def chunk_body(s):
            def body(k, s):
                del k
                s = dict(s)
                i = s["i"]
                alive = (s["mag"] <= bail2) & (i < limit)
                s["nf"] = s["nf"] + alive.astype(jnp.float32)
                zr = (s["zrh"], s["zrl"])
                zi = (s["zih"], s["zil"])
                nzr, nzi = dd.ddc_square_add(jnp, zr, zi, cr, ci)
                s["zrh"] = jnp.where(alive, nzr[0], s["zrh"])
                s["zrl"] = jnp.where(alive, nzr[1], s["zrl"])
                s["zih"] = jnp.where(alive, nzi[0], s["zih"])
                s["zil"] = jnp.where(alive, nzi[1], s["zil"])
                nmag = dd.ddc_mag2(jnp, (s["zrh"], s["zrl"]),
                                   (s["zih"], s["zil"]))
                s["mag"] = jnp.where(alive, nmag, s["mag"])
                s["i"] = i + 1
                return s

            return jax.lax.fori_loop(0, chunk, body, s)

        def cond(c):
            s, keep = c
            return (s["i"] < limit) & keep

        def body(c):
            s, _ = c
            s = chunk_body(s)
            return s, jnp.any(s["mag"] <= bail2)

        s, _ = jax.lax.while_loop(cond, body, (state0, jnp.bool_(True)))

        interior = (s["mag"] <= bail2) & in_bounds
        n = jnp.where(interior, limit,
                      s["nf"].astype(jnp.int32) * in_bounds.astype(jnp.int32))
        n_ref[:, :] = n
        zx_ref[:, :] = s["zrh"] + s["zrl"]
        zy_ref[:, :] = s["zih"] + s["zil"]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "map_height", "tile", "chunk",
                     "interpret"))
def _dd_call(params, *, width, height, map_height, tile, chunk, interpret):
    th, tw = tile
    grid = (cdiv(height, th), cdiv(width, tw))
    kernel = _make_kernel(width, height, map_height, tile, chunk)
    out_shapes = (
        jax.ShapeDtypeStruct((height, width), jnp.int32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
    )
    out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(out_spec for _ in out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )(params)


def dd_escape_fields(width: int, height: int, *,
                     center_x_dd: Tuple[float, float],
                     center_y_dd: Tuple[float, float],
                     zoom_dd: Tuple[float, float],
                     max_iter: int, bailout: float = 4.0,
                     offset: Tuple[float, float] = (0.0, 0.0),
                     iter_limit=None, row0=0.0,
                     map_height: Optional[int] = None,
                     tile=None, chunk: int = 16,
                     interpret: Optional[bool] = None
                     ) -> Dict[str, jax.Array]:
    if interpret is None:
        interpret = default_interpret()
    if tile is None:
        tile = pick_tile(height, width)
    if max_iter >= 1 << 24:
        # the per-pixel counter nf is f32: n+1 == n past 2^24
        raise ValueError("max_iter must be < 2^24 (f32 counter precision)")
    if iter_limit is None:
        iter_limit = max_iter
    params = np.zeros((1, ND), np.float32)
    params[0, D_CXH], params[0, D_CXL] = center_x_dd
    params[0, D_CYH], params[0, D_CYL] = center_y_dd
    params[0, D_ZH], params[0, D_ZL] = zoom_dd
    params[0, D_LIMIT] = max(1, int(iter_limit))
    params[0, D_BAIL2] = float(bailout) * float(bailout)
    params[0, D_OFFX], params[0, D_OFFY] = offset
    params[0, D_ROW0] = row0
    n, zx, zy = _dd_call(
        jnp.asarray(params), width=width, height=height,
        map_height=int(map_height if map_height is not None else height),
        tile=tuple(tile), chunk=chunk, interpret=bool(interpret))
    return {"n": n, "zx": zx, "zy": zy}
