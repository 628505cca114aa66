"""Mandelbulb math — distance estimator, camera, shading — backend-agnostic
(xp = numpy or jax.numpy) so the Pallas kernel and the numpy golden twin
share one implementation.

Ports shaders/mandelbulb.comp:
- DE: power-θφ triplex formula with derivative tracking (:96-108)
- camera: y-rotated orbit with animated distance/power (:192-198)
- shading: Phong + rim + glow + filament + AO + depth fog (:133-167)
"""
from __future__ import annotations

import math
from dataclasses import dataclass

from . import palettes as pal

MAX_STEPS = 200
MAX_DIST = 10.0


@dataclass(frozen=True)
class BulbParams:
    camera_distance: float = 3.0
    rotation_y: float = 0.0
    power: float = 8.0
    max_iterations: int = 256
    color_offset: float = 0.0
    color_scale: float = 1.0
    palette_mode: int = 0
    time: float = 0.0
    fov: float = 1.0
    rotation_speed: float = 0.3
    brightness: float = 1.0
    saturation: float = 1.0
    contrast: float = 1.0
    aa_samples: int = 1

    def clamped(self) -> "BulbParams":
        """Input clamps from mandelbulb.comp:177-190."""
        from dataclasses import replace

        return replace(
            self,
            camera_distance=max(self.camera_distance, 0.1),
            power=min(max(self.power, 2.0), 16.0),
            max_iterations=min(max(self.max_iterations, 1), 1024),
            color_scale=max(self.color_scale, 0.1),
            palette_mode=min(max(self.palette_mode, 0), 5),
            fov=min(max(self.fov, 0.1), 3.0),
            rotation_speed=self.rotation_speed if self.rotation_speed != 0.0
            else 0.3,
            brightness=max(self.brightness, 0.1),
            saturation=max(self.saturation, 0.0),
            contrast=max(self.contrast, 0.1),
        )


def camera_setup(xp, p: BulbParams):
    """Animated camera origin + dynamic power (mandelbulb.comp:192-198).
    xp-generic so camera fields may be traced scalars (one compile serves
    a whole animation)."""
    rotation = p.rotation_y + p.rotation_speed * p.time
    dyn_dist = p.camera_distance * (1.0 + 0.3 * xp.sin(
        xp.asarray(p.time, xp.float32) * 0.5))
    # ro = rot_y(rotation) @ (0, 0, dyn_dist).  The GLSL mat3(c,0,s,
    # 0,1,0, -s,0,c) is COLUMN-major, so its third column (-s, 0, c)
    # multiplies dyn_dist: ro.x is -s*d, not +s*d (a sign slip here
    # spins every animated camera the wrong way vs the reference, and
    # the world-fixed light breaks the mirror symmetry).
    rot = xp.asarray(rotation, xp.float32)
    c, s = xp.cos(rot), xp.sin(rot)
    ro = (-s * dyn_dist, xp.zeros_like(c), c * dyn_dist)
    dyn_power = p.power + 0.5 * xp.sin(xp.asarray(p.time, xp.float32) * 0.7)
    return ro, dyn_power


def ray_dirs(xp, px, py, width, height, ro, fov):
    """Per-pixel ray directions (mandelbulb.comp:204-209).  ``ro``/``fov``
    may be traced scalars; the degenerate camera-overhead case clamps the
    basis length (same guard as the Pallas kernel, which shares this
    helper)."""
    ux = (px - width * 0.5) / height
    uy = (py - height * 0.5) / height
    rox, roy, roz = ro
    rlen = xp.sqrt(xp.asarray(rox * rox + roy * roy + roz * roz,
                              xp.float32))
    fwd = (-rox / rlen, -roy / rlen, -roz / rlen)
    # right = normalize(cross((0,1,0), forward)); up = cross(forward, right)
    rx, ry, rz = fwd[2], 0.0, -fwd[0]
    rl = xp.maximum(xp.sqrt(xp.asarray(rx * rx + rz * rz, xp.float32)),
                    1e-12)
    right = (rx / rl, 0.0, rz / rl)
    up = (fwd[1] * right[2] - fwd[2] * right[1],
          fwd[2] * right[0] - fwd[0] * right[2],
          fwd[0] * right[1] - fwd[1] * right[0])
    dx = fwd[0] + right[0] * ux * fov + up[0] * uy * fov
    dy = fwd[1] + right[1] * ux * fov + up[1] * uy * fov
    dz = fwd[2] + right[2] * ux * fov + up[2] * uy * fov
    inv = 1.0 / xp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv, dy * inv, dz * inv


def de_step(xp, zx, zy, zz, dr, px, py, pz, power, active,
            acos_fn=None, atan2_fn=None, r=None):
    """One DE iteration (mandelbulb.comp:98-104), masked by ``active``.

    ``acos_fn``/``atan2_fn`` default to the backend's exact functions; the
    Pallas kernel passes ops.trig approximations (Mosaic lowers neither).
    ``r`` optionally supplies the precomputed |z| (the kernel carries it
    between iterations — same value, one sqrt instead of three)."""
    acos_fn = acos_fn or (lambda v: xp.arccos(v))
    atan2_fn = atan2_fn or (lambda a, b: xp.arctan2(a, b))
    if r is None:
        r = xp.sqrt(zx * zx + zy * zy + zz * zz)
    rs = xp.maximum(r, 1e-12)
    theta = acos_fn(xp.clip(zz / rs, -1.0, 1.0))
    phi = atan2_fn(zy, zx)
    r_pow = xp.power(rs, power - 1.0)
    ndr = r_pow * power * dr + 1.0
    zr = xp.power(rs, power)
    th = theta * power
    ph = phi * power
    st = xp.sin(th)
    nzx = zr * (st * xp.cos(ph)) + px
    nzy = zr * (xp.sin(ph) * st) + py
    nzz = zr * xp.cos(th) + pz
    zx = xp.where(active, nzx, zx)
    zy = xp.where(active, nzy, zy)
    zz = xp.where(active, nzz, zz)
    dr = xp.where(active, ndr, dr)
    return zx, zy, zz, dr, r


def _cpow_int(xp, cr, ci, p: int):
    """(cr + i·ci)^p for a static integer p >= 1, square-and-multiply
    (statically unrolled — p is a Python int)."""
    rr = ri = None
    br, bi = cr, ci
    while p:
        if p & 1:
            if rr is None:
                rr, ri = br, bi
            else:
                rr, ri = rr * br - ri * bi, rr * bi + ri * br
        p >>= 1
        if p:
            # (a-b)(a+b) avoids the a²-b² cancellation near |a| == |b|
            br, bi = (br - bi) * (br + bi), 2.0 * br * bi
    return rr, ri


def _rpow_int(xp, r, r2, k: int):
    """r^k from r and r² with a static square-multiply chain."""
    if k == 1:
        return r
    if k == 2:
        return r2
    h = _rpow_int(xp, r, r2, k // 2)
    h = h * h
    return h * r if k & 1 else h


def de_step_int(xp, zx, zy, zz, dr, px, py, pz, p: int, active,
                r=None):
    """One DE iteration for a static integer power — identical math to
    de_step but trig-free: in spherical coords the triplex power is
    r^p·(sin pθ cos pφ, sin pφ sin pθ, cos pθ), and with u = zz + i·m
    (|u| = r, arg u = π/2 - ... — precisely u^p = r^p·e^{ipθ} since
    cos θ = zz/r, sin θ = m/r) and ŵ = (zx + i·zy)/m the unit horizontal
    direction, every trig term is a static chain of complex squarings.
    On TPU this replaces ~10 software-polynomial transcendentals per
    iteration (acos/atan2/2×pow/4×sincos) with ~3 rsqrt/div ops.

    The animated camera (time != 0) makes the dynamic power non-integer
    (mandelbulb.comp:198) — callers fall back to de_step there.  ``r``
    optionally supplies the precomputed |z| (kernel loop carry)."""
    m2 = zx * zx + zy * zy
    r2 = m2 + zz * zz
    if r is None:
        r = xp.sqrt(r2)
    # unit e^{iφ}; φ = 0 on the axis m = 0 (atan2(0,0) convention)
    zero_m = m2 <= 0.0
    inv_m = 1.0 / xp.sqrt(xp.where(zero_m, xp.ones_like(m2), m2))
    cph = xp.where(zero_m, xp.ones_like(zx), zx * inv_m)
    sph = xp.where(zero_m, xp.zeros_like(zy), zy * inv_m)
    m = xp.where(zero_m, xp.zeros_like(m2), m2 * inv_m)
    # u^p = (r^p cos pθ, r^p sin pθ);  (cos pφ, sin pφ) from the unit ŵ
    upr, upi = _cpow_int(xp, zz, m, p)
    cpp, spp = _cpow_int(xp, cph, sph, p)
    r_pow = _rpow_int(xp, r, r2, p - 1)
    ndr = r_pow * float(p) * dr + 1.0
    nzx = upi * cpp + px
    nzy = spp * upi + py
    nzz = upr + pz
    zx = xp.where(active, nzx, zx)
    zy = xp.where(active, nzy, zy)
    zz = xp.where(active, nzz, zz)
    dr = xp.where(active, ndr, dr)
    return zx, zy, zz, dr, r


def de_finish(xp, r, dr):
    """DE return value (mandelbulb.comp:106-107)."""
    de = 0.5 * xp.log(xp.maximum(r, 1e-12)) * r / xp.maximum(dr, 1e-12)
    return xp.where((r < 1e-4) | (dr < 1e-4), xp.zeros_like(de), de)


def shade_hit(xp, pos, normal, rd, d_at_hit, escape_iter, t, params, dyn_power,
              de_at_offsets=None, ao_sum=None):
    """Hit shading (mandelbulb.comp:141-160).  Pass either
    ``de_at_offsets`` (the DE values at pos + normal*k, k = 0.01..0.13) or a
    precomputed ``ao_sum`` = Σ exp(-10·DE_k) from the kernel."""
    p = params
    nx, ny, nz = normal
    ll = math.sqrt(1.0 + 1.0 + 0.8 * 0.8)
    lx, ly, lz = 1.0 / ll, 1.0 / ll, 0.8 / ll
    diffuse = xp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    ambient = 0.15
    vx, vy, vz = -rd[0], -rd[1], -rd[2]
    # reflect(-light, normal) = -l + 2(n·l)n
    ndl = nx * lx + ny * ly + nz * lz
    rx = -lx + 2.0 * ndl * nx
    ry = -ly + 2.0 * ndl * ny
    rz = -lz + 2.0 * ndl * nz
    spec = xp.power(xp.maximum(vx * rx + vy * ry + vz * rz, 0.0), 64.0)
    rim = xp.power(1.0 - xp.maximum(nx * vx + ny * vy + nz * vz, 0.0), 2.0)
    glow = xp.exp(-8.0 * d_at_hit)
    filament = xp.exp(-30.0 * d_at_hit)

    pr = xp.sqrt(pos[0] ** 2 + pos[1] ** 2 + pos[2] ** 2)
    log_pr = xp.log(xp.maximum(pr, 1e-12))
    it = escape_iter + 1.0 - xp.log(xp.maximum(log_pr, 1e-12)) \
        / xp.log(xp.asarray(dyn_power, xp.float32) + 1e-4)
    it = it / float(p.max_iterations)
    it = pal._fract(xp, p.color_offset
                    + xp.power(xp.maximum(it, 0.0), 0.6) * p.color_scale)
    base = pal.bulb_color(xp, it, p.palette_mode)
    alt = pal.bulb_color(xp, pal._fract(xp, it + 0.33),
                         (p.palette_mode + 1) % 6)
    mixw = 0.3 + 0.3 * xp.sin(xp.asarray(p.time, xp.float32) * 0.5)
    color = base * (1.0 - mixw) + alt * mixw

    shade = (ambient + diffuse * 0.9)[..., None]
    color = color * shade
    color = color + spec[..., None] * 0.5
    color = color + rim[..., None] * 0.25
    color = color + glow[..., None] * 0.5
    fil = filament[..., None]
    color = color + xp.stack([xp.ones_like(filament),
                              xp.full_like(filament, 0.8),
                              xp.full_like(filament, 0.5)], axis=-1) * fil * 0.5
    if ao_sum is None:
        ao_sum = xp.zeros_like(d_at_hit)
        for de_k in de_at_offsets:
            ao_sum = ao_sum + xp.exp(-10.0 * de_k)
    ao = 1.0 - ao_sum / 8.0
    color = color * (ao * 0.8 + 0.2)[..., None]
    dist_factor = xp.clip(t / MAX_DIST, 0.0, 1.0)
    fog = (dist_factor * 0.6)[..., None]
    sky_blue = pal._vec3(xp, 0.0, 0.0, 0.1)
    return color * (1.0 - fog) + sky_blue * fog


def sky_color(xp, rd):
    """Miss shading (mandelbulb.comp:165-166)."""
    sky = xp.clip(rd[1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    dark = pal._vec3(xp, 0.02, 0.02, 0.05)
    light = pal._vec3(xp, 0.5, 0.6, 0.8)
    return dark * (1.0 - sky) + light * sky
