"""Mandelbulb renderer — distance-estimator raymarcher
(shaders/mandelbulb.comp), the one 3D family.

The DE/camera/shading math lives in ops/bulb_math (backend-agnostic); this
module supplies two march drivers over it:

- the default Pallas tile-local march (ops/bulb_kernel.py): a VMEM tile
  exits as soon as *its* pixels converge instead of synchronizing march/DE
  loops at image granularity like plain XLA loops do.
- a jitted XLA path (pallas_march=False) with exact inverse trig, and a
  numpy golden twin (`render_numpy`) with identical masked-update
  semantics for tests.

AA: N×N subpixel offsets (sx, sy)/aa like the 2D centered convention
(mandelbulb.comp:201-205), averaged before the enhance/ACES/gamma chain.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bulb_math as bm
from ..ops import coloring
from ..scene import Scene


def _bulb_params(scene: Scene) -> bm.BulbParams:
    return bm.BulbParams(
        camera_distance=scene.camera_distance,
        rotation_y=scene.rotation_y,
        power=scene.mandelbulb_power,
        max_iterations=scene.max_iterations,
        color_offset=scene.color_offset,
        color_scale=scene.color_scale,
        palette_mode=scene.palette_mode,
        time=scene.time,
        fov=scene.fov,
        brightness=scene.color_brightness,
        saturation=scene.color_saturation,
        contrast=scene.color_contrast,
        aa_samples=max(scene.antialiasing_samples, 1),
    ).clamped()


# ---------------------------------------------------------------------------
# DE evaluation (shared structure, xp-specific loop driver)
# ---------------------------------------------------------------------------

def _de_jax(px, py, pz, power, max_iter):
    """DE + escape iteration via lax.while_loop (escape latch masked)."""
    shape = px.shape
    z = (px, py, pz)
    dr = jnp.ones(shape, jnp.float32)
    esc = jnp.full(shape, float(max_iter), jnp.float32)
    r = jnp.sqrt(px * px + py * py + pz * pz)

    def cond(s):
        i, zx, zy, zz, dr, r, esc, active = s
        return (i < max_iter) & jnp.any(active)

    def body(s):
        i, zx, zy, zz, dr, r, esc, active = s
        r = jnp.sqrt(zx * zx + zy * zy + zz * zz)
        escaped_now = active & (r > 2.0)
        esc = jnp.where(escaped_now, i.astype(jnp.float32), esc)
        active = active & (r <= 2.0) & (r >= 1e-4)
        zx, zy, zz, dr, _ = bm.de_step(jnp, zx, zy, zz, dr, px, py, pz,
                                       power, active)
        return (i + 1, zx, zy, zz, dr, r, esc, active)

    active0 = jnp.ones(shape, bool)
    i, zx, zy, zz, dr, r, esc, active = jax.lax.while_loop(
        cond, body, (jnp.int32(0), px, py, pz, dr, r, esc, active0))
    r = jnp.sqrt(zx * zx + zy * zy + zz * zz)
    return bm.de_finish(jnp, r, dr), esc


def _de_numpy(px, py, pz, power, max_iter):
    shape = px.shape
    zx, zy, zz = px.copy(), py.copy(), pz.copy()
    dr = np.ones(shape, np.float32)
    esc = np.full(shape, float(max_iter), np.float32)
    active = np.ones(shape, bool)
    r = np.sqrt(zx * zx + zy * zy + zz * zz)
    for i in range(max_iter):
        if not active.any():
            break
        r = np.sqrt(zx * zx + zy * zy + zz * zz)
        escaped_now = active & (r > 2.0)
        esc = np.where(escaped_now, np.float32(i), esc)
        active = active & (r <= 2.0) & (r >= 1e-4)
        zx, zy, zz, dr, _ = bm.de_step(np, zx, zy, zz, dr, px, py, pz,
                                       np.float32(power), active)
    r = np.sqrt(zx * zx + zy * zy + zz * zz)
    return bm.de_finish(np, r, dr), esc


def _march(xp, de_fn, ro, rdx, rdy, rdz, power, max_iter):
    """Raymarch (mandelbulb.comp:133-167 loop): returns
    (hit mask, t, d_at_hit, escape_iter)."""
    shape = rdx.shape
    f32 = lambda v: xp.asarray(v, xp.float32)

    def pos(t):
        return ro[0] + rdx * t, ro[1] + rdy * t, ro[2] + rdz * t

    if xp is np:
        t = np.full(shape, 0.001, np.float32)
        hit = np.zeros(shape, bool)
        active = np.ones(shape, bool)
        d_hit = np.zeros(shape, np.float32)
        esc_hit = np.zeros(shape, np.float32)
        for _ in range(bm.MAX_STEPS):
            if not active.any():
                break
            d, esc = de_fn(*pos(t), power, max_iter)
            bad = ~np.isfinite(d)
            threshold = np.maximum(1e-4, 1e-3 * t)
            hit_now = active & ~bad & (d < threshold)
            hit |= hit_now
            d_hit = np.where(hit_now, d, d_hit)
            esc_hit = np.where(hit_now, esc, esc_hit)
            out = (t > bm.MAX_DIST) | (d > bm.MAX_DIST)
            active = active & ~hit_now & ~bad & ~out
            t = np.where(active, t + np.maximum(d * 0.5, 0.0005), t)
        return hit, t, d_hit, esc_hit

    def cond(s):
        step, t, hit, active, d_hit, esc_hit = s
        return (step < bm.MAX_STEPS) & jnp.any(active)

    def body(s):
        step, t, hit, active, d_hit, esc_hit = s
        d, esc = de_fn(*pos(t), power, max_iter)
        bad = ~jnp.isfinite(d)
        threshold = jnp.maximum(f32(1e-4), 1e-3 * t)
        hit_now = active & ~bad & (d < threshold)
        hit = hit | hit_now
        d_hit = jnp.where(hit_now, d, d_hit)
        esc_hit = jnp.where(hit_now, esc, esc_hit)
        out = (t > bm.MAX_DIST) | (d > bm.MAX_DIST)
        active = active & ~hit_now & ~bad & ~out
        t = jnp.where(active, t + jnp.maximum(d * 0.5, 0.0005), t)
        return (step + 1, t, hit, active, d_hit, esc_hit)

    s0 = (jnp.int32(0), jnp.full(shape, 0.001, jnp.float32),
          jnp.zeros(shape, bool), jnp.ones(shape, bool),
          jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    _, t, hit, _, d_hit, esc_hit = jax.lax.while_loop(cond, body, s0)
    return hit, t, d_hit, esc_hit


def _finish_sample(xp, de_fn, ro, rdx, rdy, rdz, hit, t, d_hit, esc_hit,
                   p: bm.BulbParams, dyn_power):
    """Shading after the march: normals, AO, palettes, sky."""
    hx = ro[0] + rdx * t
    hy = ro[1] + rdy * t
    hz = ro[2] + rdz * t
    # normal by forward differences (mandelbulb.comp:113-123)
    eps = 1e-3
    d0, _ = de_fn(hx, hy, hz, dyn_power, p.max_iterations)
    dxp, _ = de_fn(hx + eps, hy, hz, dyn_power, p.max_iterations)
    dyp, _ = de_fn(hx, hy + eps, hz, dyn_power, p.max_iterations)
    dzp, _ = de_fn(hx, hy, hz + eps, dyn_power, p.max_iterations)
    nx, ny, nz = dxp - d0, dyp - d0, dzp - d0
    nl = xp.sqrt(nx * nx + ny * ny + nz * nz)
    fallback = nl < 1e-4
    nl = xp.maximum(nl, 1e-12)
    nx = xp.where(fallback, xp.zeros_like(nx), nx / nl)
    ny = xp.where(fallback, xp.ones_like(ny), ny / nl)
    nz = xp.where(fallback, xp.zeros_like(nz), nz / nl)

    # AO samples (mandelbulb.comp:156-157): the shader's f32 loop runs
    # EIGHT taps (last k = 0.14999998f < 0.15f) at the accumulated f32
    # offsets; mirror its arithmetic exactly.
    de_ao = []
    k = np.float32(0.01)
    while k < np.float32(0.15):
        kk = float(k)
        dk, _ = de_fn(hx + nx * kk, hy + ny * kk, hz + nz * kk, dyn_power,
                      p.max_iterations)
        de_ao.append(dk)
        k = np.float32(k + np.float32(0.02))

    hit_color = bm.shade_hit(xp, (hx, hy, hz), (nx, ny, nz),
                             (rdx, rdy, rdz), d_hit, esc_hit, t, p,
                             dyn_power, de_ao)
    sky = bm.sky_color(xp, (rdx, rdy, rdz))
    return xp.where(hit[..., None], hit_color, sky)


def _render_sample(xp, de_fn, width, height, p: bm.BulbParams,
                   off=(0.0, 0.0), pallas_march: bool = False,
                   kernel_shading: bool = False, row0=None,
                   map_height=None, int_power="auto"):
    """``row0``/``map_height``: render a row band of a taller image
    (shard_map band decomposition; row0 may be traced).  ``p``'s camera
    and color fields may be traced scalars; ``int_power`` is the static
    trig-free-DE decision (pass explicitly when power is traced)."""
    ro, dyn_power = bm.camera_setup(xp, p)
    mh = map_height if map_height is not None else height
    if xp is np:
        pyg, pxg = np.mgrid[0:height, 0:width].astype(np.float32)
    else:
        pyg = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
        pxg = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    pxg = pxg + xp.float32(off[0])
    pyg = pyg + xp.float32(off[1])
    if row0 is not None:
        pyg = pyg + row0
    rdx, rdy, rdz = bm.ray_dirs(xp, pxg, pyg, width, mh, ro, p.fov)

    if pallas_march:
        from ..ops.bulb_kernel import march_fields

        # In-kernel shading (fused multi-point DE, hit-masked) vs XLA
        # shading is decided by the caller's kernel_shading flag.
        f = march_fields(width, height, ro=ro, fov=p.fov, power=dyn_power,
                         max_iter=p.max_iterations, offset=off,
                         row0=(0.0 if row0 is None else row0),
                         map_height=mh, shade=kernel_shading,
                         int_power=int_power)
        hit = f["hit"] > 0.5
        t, d_hit, esc_hit = f["t"], f["d"], f["esc"]
        if kernel_shading:
            hx = ro[0] + rdx * t
            hy = ro[1] + rdy * t
            hz = ro[2] + rdz * t
            hit_color = bm.shade_hit(xp, (hx, hy, hz),
                                     (f["nx"], f["ny"], f["nz"]),
                                     (rdx, rdy, rdz), d_hit, esc_hit, t, p,
                                     dyn_power, ao_sum=f["ao"])
            sky = bm.sky_color(xp, (rdx, rdy, rdz))
            return xp.where(hit[..., None], hit_color, sky)
        return _finish_sample(xp, de_fn, ro, rdx, rdy, rdz, hit, t, d_hit,
                              esc_hit, p, dyn_power)
    hit, t, d_hit, esc_hit = _march(xp, de_fn, ro, rdx, rdy, rdz,
                                    dyn_power, p.max_iterations)
    return _finish_sample(xp, de_fn, ro, rdx, rdy, rdz, hit, t, d_hit,
                          esc_hit, p, dyn_power)


# Camera/power/color fields are traced so one compile serves a whole
# animation (time/rotation vary per frame); only loop bounds, the palette
# dispatch, AA, and the trig-free-DE specialization are static.
_DYN_FIELDS = ("camera_distance", "rotation_y", "power", "time", "fov",
               "rotation_speed", "color_offset", "color_scale",
               "brightness", "saturation", "contrast")


@functools.lru_cache(maxsize=32)
def _compiled(width: int, height: int, max_iterations: int,
              palette_mode: int, aa_samples: int, int_power,
              pallas_march: bool = True, kernel_shading: bool = True):
    def fn(dyn):
        p = bm.BulbParams(
            max_iterations=max_iterations, palette_mode=palette_mode,
            aa_samples=aa_samples,
            **{k: jnp.asarray(dyn[k], jnp.float32) for k in _DYN_FIELDS})
        acc = jnp.zeros((height, width, 3), jnp.float32)
        aa = aa_samples
        for sy in range(aa):
            for sx in range(aa):
                acc = acc + _render_sample(
                    jnp, _de_jax, width, height, p, (sx / aa, sy / aa),
                    pallas_march=pallas_march,
                    kernel_shading=pallas_march and kernel_shading,
                    int_power=int_power)
        color = acc / jnp.float32(aa * aa)
        color = coloring.enhance_color(jnp, color, p.brightness,
                                       p.saturation, p.contrast)
        color = coloring.aces_tonemap(jnp, color)
        return coloring.gamma_correct(jnp, color)

    return jax.jit(fn)


def _static_int_power(p: bm.BulbParams):
    """The host-side trig-free-DE gate: the kernel specializes on integer
    DYNAMIC power (power + 0.5*sin(0.7*time)), decidable only from host
    floats."""
    dyn_power = p.power + 0.5 * math.sin(p.time * 0.7)
    return int(dyn_power) if float(dyn_power).is_integer()         and 2.0 <= dyn_power <= 16.0 else None


def render(scene: Scene, width: int, height: int,
           pallas_march: bool = True, kernel_shading: bool = True, **kw):
    """pallas_march=True uses the tile-local Pallas raymarcher
    (ops/bulb_kernel.py); False forces the plain XLA march (exact trig,
    image-global loop sync).  kernel_shading keeps normals/AO inside the
    march kernel (hit-masked fused multi-point DE).  Integer powers run a
    trig-free DE step (complex binary exponentiation, bulb_math.de_step_int)
    — 0.087 s at 1080p on TPU v5e vs 0.227 s for the polynomial-trig step
    (2.6x, both warm/kernel-shaded/scalar-fetch timed); non-integer dynamic
    powers (time != 0) keep the ~2e-6 ops/trig approximations.  Camera,
    power, and color values are traced, so an animation's frames share ONE
    compile."""
    p = _bulb_params(scene)
    fn = _compiled(width, height, p.max_iterations, p.palette_mode,
                   p.aa_samples, _static_int_power(p),
                   bool(pallas_march), bool(kernel_shading))
    return fn({k: getattr(p, k) for k in _DYN_FIELDS})


def band_render_fn(scene: Scene, width: int, band_h: int, full_h: int,
                   pallas_march: bool = True):
    """Build ``fn(dyn, row0)`` rendering ``band_h`` local rows whose global
    first row is the traced scalar ``row0`` — the same signature as
    models.common.band_render_fn, so the mesh shards (render_sharded) and
    the giant-still exporter (parallel/tiled.py) drive the bulb through
    the identical band pipeline as the 2D families.  ``dyn`` is the
    traced-f32 dict from :func:`dyn_params`."""
    p = _bulb_params(scene)
    int_power = _static_int_power(p)

    def fn(dyn, row0):
        # identical traced-f32 parameter plumbing to the single-device
        # _compiled path, so banded output stays bit-comparable to it
        pt = bm.BulbParams(
            max_iterations=p.max_iterations, palette_mode=p.palette_mode,
            aa_samples=p.aa_samples,
            **{k: jnp.asarray(dyn[k], jnp.float32) for k in _DYN_FIELDS})
        acc = jnp.zeros((band_h, width, 3), jnp.float32)
        aa = p.aa_samples
        for sy in range(aa):
            for sx in range(aa):
                acc = acc + _render_sample(
                    jnp, _de_jax, width, band_h, pt, (sx / aa, sy / aa),
                    pallas_march=pallas_march,
                    kernel_shading=pallas_march, row0=row0,
                    map_height=full_h, int_power=int_power)
        color = acc / jnp.float32(aa * aa)
        color = coloring.enhance_color(jnp, color, pt.brightness,
                                       pt.saturation, pt.contrast)
        color = coloring.aces_tonemap(jnp, color)
        return coloring.gamma_correct(jnp, color)

    return fn


def dyn_params(scene: Scene) -> dict:
    """The traced-parameter dict consumed by :func:`band_render_fn` (host
    floats; callers lift to jnp.float32)."""
    p = _bulb_params(scene)
    return {k: float(getattr(p, k)) for k in _DYN_FIELDS}


def render_sharded(scene: Scene, width: int, height: int, mesh=None,
                   pallas_march: bool = True) -> np.ndarray:
    """Row-band-sharded bulb render (gather-free, same decomposition as the
    2D families in parallel/tiled.py): each device raymarches and shades
    its own contiguous band; only the final assembly crosses chips."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import make_render_mesh, pad_to_multiple
    from ..utils.diag import validate_scene

    scene = validate_scene(scene)  # parity with models.render dispatch
    if mesh is None:
        mesh = make_render_mesh()
    n_rows = mesh.shape["rows"]
    h_pad = pad_to_multiple(height, n_rows)
    band_h = h_pad // n_rows
    band_fn = band_render_fn(scene, width, band_h, height,
                             pallas_march=pallas_march)

    def shard_body(dyn):
        ridx = jax.lax.axis_index("rows")
        row0 = (ridx * band_h).astype(jnp.float32)
        return band_fn(dyn, row0)

    fn = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=({k: P() for k in _DYN_FIELDS},),
        out_specs=P("rows"), check_vma=False))
    out = fn({k: jnp.float32(v) for k, v in dyn_params(scene).items()})
    return np.asarray(out)[:height]


def render_numpy(scene: Scene, width: int, height: int) -> np.ndarray:
    p = _bulb_params(scene)
    aa = p.aa_samples
    acc = np.zeros((height, width, 3), np.float32)
    for sy in range(aa):
        for sx in range(aa):
            acc += _render_sample(np, _de_numpy, width, height, p,
                                  (sx / aa, sy / aa))
    color = acc / np.float32(aa * aa)
    color = coloring.enhance_color(np, color, p.brightness, p.saturation,
                                   p.contrast)
    color = coloring.aces_tonemap(np, color)
    return coloring.gamma_correct(np, color)
