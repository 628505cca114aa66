import jax
import numpy as np
import pytest

from fractalrenderer_tpu.models import mandelbulb
from fractalrenderer_tpu.ops import bulb_math as bm
from fractalrenderer_tpu.scene import FractalType, Scene


def test_clamps_match_reference():
    # mandelbulb.comp:177-190
    p = bm.BulbParams(camera_distance=0.01, power=99.0, max_iterations=9999,
                      color_scale=0.0, palette_mode=42, fov=10.0,
                      rotation_speed=0.0, brightness=0.0, saturation=-1.0,
                      contrast=0.0).clamped()
    assert p.camera_distance == 0.1
    assert p.power == 16.0
    assert p.max_iterations == 1024
    assert p.color_scale == 0.1
    assert p.palette_mode == 5
    assert p.fov == 3.0
    assert p.rotation_speed == 0.3  # zero → default 0.3
    assert p.brightness == 0.1 and p.saturation == 0.0 and p.contrast == 0.1


def test_camera_setup():
    p = bm.BulbParams(camera_distance=3.0, rotation_y=0.0, time=0.0)
    ro, power = bm.camera_setup(np, p)
    assert tuple(map(float, ro)) == pytest.approx((0.0, 0.0, 3.0))
    assert power == pytest.approx(8.0)
    p2 = bm.BulbParams(time=1.0)
    ro2, power2 = bm.camera_setup(np, p2)
    assert power2 == pytest.approx(8.0 + 0.5 * np.sin(0.7))


def test_de_sphere_behaviour():
    # Far from the set the DE must be positive and roughly the distance.
    px = np.array([3.0], np.float32)
    py = np.array([0.0], np.float32)
    pz = np.array([0.0], np.float32)
    d, esc = mandelbulb._de_numpy(px, py, pz, 8.0, 64)
    assert d[0] > 0.1
    # Inside (origin): z stays tiny, DE ~ 0
    d0, _ = mandelbulb._de_numpy(np.zeros(1, np.float32),
                                 np.zeros(1, np.float32),
                                 np.zeros(1, np.float32), 8.0, 64)
    assert d0[0] == pytest.approx(0.0, abs=1e-3)


def test_render_numpy_structure():
    s = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=24)
    img = mandelbulb.render_numpy(s, 64, 36)
    assert img.shape == (36, 64, 3)
    assert np.isfinite(img).all()
    assert img.std() > 0.02  # bulb vs sky


def test_render_jax_matches_numpy():
    s = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=24)
    a = mandelbulb.render_numpy(s, 48, 27)
    # exact-trig XLA path: near-identical (transcendental ulps only)
    c = np.asarray(mandelbulb.render(s, 48, 27, pallas_march=False))
    assert np.abs(a - c).mean() < 1e-3
    assert ((np.abs(a - c) > 0.05).any(axis=-1)).mean() < 0.02
    # Pallas march path: ~2e-6 inverse-trig approximations shift raymarch
    # hit boundaries on a few % of edge pixels
    b = np.asarray(mandelbulb.render(s, 48, 27, pallas_march=True))
    assert np.abs(a - b).mean() < 0.01
    assert ((np.abs(a - b) > 0.05).any(axis=-1)).mean() < 0.08


def test_dispatch_and_aa():
    import fractalrenderer_tpu as fr

    s = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=16,
              antialiasing_samples=2)
    img = np.asarray(fr.render(s, 32, 18))
    assert img.shape == (18, 32, 3) and np.isfinite(img).all()


def test_power_presets_render_differently():
    base = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=16)
    img8 = mandelbulb.render_numpy(base, 32, 18)
    img4 = mandelbulb.render_numpy(base.with_(mandelbulb_power=4.0), 32, 18)
    assert np.abs(img8 - img4).max() > 0.05


def test_trig_approximations():
    from fractalrenderer_tpu.ops import trig

    x = np.linspace(-40, 40, 30001).astype(np.float32)
    assert np.abs(trig.atan(np, x) - np.arctan(x)).max() < 5e-6
    ys, xs = np.meshgrid(np.linspace(-2, 2, 201), np.linspace(-2, 2, 201))
    e = np.abs(trig.atan2(np, ys.astype(np.float32), xs.astype(np.float32))
               - np.arctan2(ys, xs))
    assert e.max() < 5e-6
    xc = np.linspace(-1, 1, 20001).astype(np.float32)
    assert np.abs(trig.acos(np, xc) - np.arccos(xc)).max() < 5e-6


def test_de_step_int_matches_trig_step():
    # The trig-free integer-power step (complex binary exponentiation) is
    # the same function as the spherical-coords step; vs an f64 ground
    # truth it is strictly MORE accurate than the f32 trig path.
    rng = np.random.default_rng(7)
    N = 4096
    zx, zy, zz, px, py, pz = (
        rng.uniform(-1.5, 1.5, N).astype(np.float32) for _ in range(6))
    dr = rng.uniform(1, 100, N).astype(np.float32)
    act = np.ones(N, bool)
    for p in (2, 3, 7, 8, 16):
        t64 = bm.de_step(np, *(v.astype(np.float64) for v in
                               (zx, zy, zz, dr, px, py, pz)),
                         float(p), act)
        trig = bm.de_step(np, zx, zy, zz, dr, px, py, pz, np.float32(p), act)
        fast = bm.de_step_int(np, zx, zy, zz, dr, px, py, pz, p, act)
        for k in range(4):
            sc = np.maximum(np.abs(t64[k]), 1.0)
            e_trig = (np.abs(trig[k] - t64[k]) / sc).max()
            e_fast = (np.abs(fast[k] - t64[k]) / sc).max()
            assert e_fast <= max(e_trig * 1.5, 1e-6), \
                f"p={p} comp{k}: int {e_fast:.2e} vs trig {e_trig:.2e}"


def test_de_step_int_axis_degeneracy():
    # m = 0 (on the z axis): φ defaults to 0 like atan2(0, 0)
    z0 = np.zeros(3, np.float32)
    zz = np.array([0.5, -0.5, 1.5], np.float32)
    one = np.ones(3, np.float32)
    a = bm.de_step(np, z0, z0, zz, one, z0, z0, zz, np.float32(8.0),
                   np.ones(3, bool))
    b = bm.de_step_int(np, z0, z0, zz, one, z0, z0, zz, 8,
                       np.ones(3, bool))
    for va, vb in zip(a, b):
        np.testing.assert_allclose(vb, va, atol=1e-5)


def test_noninteger_power_uses_trig_path():
    # time != 0 makes the dynamic power non-integer → the kernel falls
    # back to the ops/trig polynomial step and still matches the golden
    s = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=16,
              time=1.0)
    _, dyn_power = bm.camera_setup(np, mandelbulb._bulb_params(s))
    assert not float(dyn_power).is_integer()
    a = mandelbulb.render_numpy(s, 32, 18)
    b = np.asarray(mandelbulb.render(s, 32, 18, pallas_march=True))
    assert np.abs(a - b).mean() < 0.01


def test_animation_frames_share_one_compile():
    # Camera/power/colors are traced: frames differing only in time (every
    # bulb animation frame) must hit the same compiled function instead of
    # recompiling the whole pipeline per frame.
    mandelbulb._compiled.cache_clear()
    s = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=12,
              time=0.25)
    a = np.asarray(mandelbulb.render(s, 32, 18))
    b = np.asarray(mandelbulb.render(s.with_(time=0.5, rotation_y=0.3),
                                     32, 18))
    info = mandelbulb._compiled.cache_info()
    assert info.misses == 1 and info.hits == 1, info
    assert np.abs(a - b).mean() > 1e-4  # the frames genuinely differ


def test_flat_paths_match_nested():
    """The flat march (_flat_march) and flat shading walk (_flat_shade)
    are schedule changes, not math changes: every output plane is
    bit-equal to the nested/fused form (stats=True path) — except
    nx/ny/nz/ao on NON-hit lanes, where the flat form substitutes a
    closed-form constant for orbits that are dead on arrival (within
    1 ulp of the vector chain; sky pixels never read them)."""
    from fractalrenderer_tpu.ops import bulb_kernel

    for cone in (8, 0):
        # tile shape is TPU-legal so the hardware lane runs this too
        kw = dict(ro=(0.0, 0.0, 2.7), fov=1.5, power=8.0, max_iter=48,
                  int_power=8, tile=(8, 128), cone=cone)
        flat = bulb_kernel.march_fields(128, 64, shade=True, **kw)
        nest = bulb_kernel.march_fields(128, 64, shade=True, stats=True,
                                        **kw)
        for k in ("hit", "t", "d", "esc"):
            assert np.array_equal(np.asarray(flat[k]),
                                  np.asarray(nest[k])), (cone, k)
        hit = np.asarray(flat["hit"]) > 0.5
        assert hit.any() and (~hit).any()
        on_tpu = jax.default_backend() == "tpu"
        for k in ("nx", "ny", "nz", "ao"):
            a, b = np.asarray(flat[k]), np.asarray(nest[k])
            if k == "ao" and not on_tpu:
                # On TPU the plane is bit-equal (Mosaic does not
                # contract f32 mul+add; asserted on the hardware lane,
                # tpu_checks.py).  XLA:CPU contracts the AO tap
                # position hx + nx*k to an FMA in one loop shape but
                # not the other; the 1-ulp position shift diverges a
                # handful of chaotic-boundary tap orbits (~1% of
                # lanes), each bounded by one exp() term.
                d = np.abs(a[hit] - b[hit])
                assert (d > 1e-5).mean() < 0.02, (cone, k)
                assert d.max() < 1.0, (cone, k)
            else:
                assert np.array_equal(a[hit], b[hit]), (cone, k)
            assert np.abs(a[~hit] - b[~hit]).max() < 1e-6, (cone, k)
