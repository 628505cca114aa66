"""Fuzz: random scene configurations through the full render path must
produce finite, in-range images (no NaN poisoning, no crashes) — the
analog of the reference's defensive clamps (compute_effect_manager.h:
335-345), exercised instead of hoped for."""
import numpy as np
import pytest

import fractalrenderer_tpu as fr


def _random_scene(rng) -> fr.Scene:
    ft = rng.choice([fr.FractalType.MANDELBROT, fr.FractalType.JULIA,
                     fr.FractalType.BURNING_SHIP, fr.FractalType.PHOENIX])
    return fr.Scene(
        fractal_type=ft,
        center_x=float(rng.uniform(-2.5, 1.5)),
        center_y=float(rng.uniform(-2, 2)),
        zoom=float(10 ** rng.uniform(-6, 1.2)),
        max_iterations=int(rng.integers(1, 300)),
        bailout=float(rng.uniform(-1.0, 64.0)),  # invalid values too
        antialiasing_samples=int(rng.choice([1, 2])),
        palette_mode=int(rng.integers(-2, 12)),  # out-of-range modes
        color_offset=float(rng.uniform(-3, 3)),
        color_scale=float(rng.uniform(-2, 5)),
        interior_style=int(rng.integers(0, 4)),
        orbit_trap_enabled=bool(rng.integers(0, 2)),
        orbit_trap_radius=float(rng.uniform(-0.5, 2.0)),
        stripe_enabled=bool(rng.integers(0, 2)),
        stripe_density=float(rng.uniform(0, 30)),
        color_brightness=float(rng.uniform(0, 3)),
        color_saturation=float(rng.uniform(0, 3)),
        color_contrast=float(rng.uniform(0, 3)),
        julia_c_real=float(rng.uniform(-2, 2)),
        julia_c_imag=float(rng.uniform(-2, 2)),
        phoenix_p=float(rng.uniform(-1, 1)),
        phoenix_r=float(rng.uniform(-1, 1)),
        use_julia_set=bool(rng.integers(0, 2)),
    )


def test_fuzz_2d_families_finite():
    rng = np.random.default_rng(20260816)
    for k in range(24):
        s = _random_scene(rng)
        img = np.asarray(fr.render(s, 32, 16))
        assert img.shape == (16, 32, 3), s
        assert np.isfinite(img).all(), s
        assert (img >= 0).all() and (img <= 1).all(), s


def test_fuzz_random_configs_match_golden_counts():
    """Randomized golden-equality sweep: iteration counts from the Pallas
    kernel must stay consistent with the numpy golden (exact on TPU,
    boundary-ulp fraction off-TPU) across random families, viewports,
    bailouts, and AA offsets — not just the handful of hand-picked
    configs in test_golden_vs_kernel.py."""
    from fractalrenderer_tpu.ops.escape import escape_fields
    from fractalrenderer_tpu.reference import golden
    import jax

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(20260819)
    W, H = 48, 32  # power-of-two height: exact-mapping regime
    for k in range(10):
        fam = ["mandelbrot", "julia", "burning_ship", "phoenix"][k % 4]
        cx = float(rng.uniform(-2.0, 1.0))
        cy = float(rng.uniform(-1.5, 1.5))
        zoom = float(10 ** rng.uniform(-4, 0.8))
        mi = int(rng.integers(32, 200))
        bail = float(rng.uniform(2.0, 16.0))
        off = (float(rng.choice([0.0, 0.25, -0.25])),
               float(rng.choice([0.0, 0.25])))
        kw = dict(center_x=cx, center_y=cy, zoom=zoom, max_iter=mi,
                  offset=off)
        if fam == "mandelbrot":
            f = escape_fields(fam, W, H, bailout=bail, **kw)
            n, *_ = golden.mandelbrot_fields(W, H, cx, cy, zoom, mi, bail,
                                             off=off)
        elif fam == "julia":
            c = (float(rng.uniform(-1, 1)), float(rng.uniform(-1, 1)))
            f = escape_fields(fam, W, H, bailout=bail, julia_c=c, **kw)
            n, *_ = golden.julia_fields(W, H, cx, cy, zoom, c[0], c[1],
                                        mi, bail, off=off)
        elif fam == "burning_ship":
            style = int(rng.integers(0, 4))
            f = escape_fields(fam, W, H, bailout=bail, **kw)
            n, *_ = golden.burning_ship_fields(W, H, cx, cy, zoom, mi,
                                               bail, False, 0.5, False,
                                               10.0, style, off=off)
        else:
            pp = float(rng.uniform(-0.6, 0.6))
            pr = float(rng.uniform(-0.6, 0.6))
            c = (float(rng.uniform(-1, 1)), float(rng.uniform(-1, 1)))
            f = escape_fields(fam, W, H, julia_c=c, phoenix_p=pp,
                              phoenix_r=pr, use_julia=False, **kw)
            n, *_ = golden.phoenix_fields(W, H, cx, cy, zoom, mi, c,
                                          False, pp, pr, off=off)
        mism = (np.asarray(f["n"]) != n).mean()
        cfg = (fam, cx, cy, zoom, mi, bail, off)
        if on_tpu:
            assert mism == 0.0, cfg
        else:
            # chaotic-boundary-heavy random views flip more ulp pixels
            # than the curated configs; the contract off-TPU is the
            # FRACTION stays small
            assert mism <= 0.02, (mism, cfg)


def test_fuzz_extreme_view_params():
    # zero/NaN zoom, huge centers — the validator must repair them
    for kw in (dict(zoom=0.0), dict(zoom=float("nan")),
               dict(zoom=1e30), dict(center_x=1e20),
               dict(bailout=float("nan")), dict(max_iterations=0)):
        s = fr.Scene(**kw)
        img = np.asarray(fr.render(s, 16, 8))
        assert np.isfinite(img).all(), kw


def test_fuzz_deep_zoom_families_finite():
    """Random deep-zoom scenes across every family and precision tier
    (f32 / dd / floatexp) render finite images with zero remaining
    glitches — the rebasing pipeline's correctness-by-construction
    promise under fuzzed parameters."""
    from fractalrenderer_tpu.models import deep_zoom

    rng = np.random.default_rng(20260817)
    centers = [("-0.74364388703715158", "0.13182590420531198", {}),
               ("1.484292748140190509", "-0.137230514250178732",
                dict(deep_zoom_julia=True, julia_c_real=-0.7,
                     julia_c_imag=0.27015)),
               ("-2", "0", dict(deep_zoom_ship=True)),
               ("0.5334632772339566", "0.05",
                dict(deep_zoom_phoenix=True, phoenix_p=0.0,
                     phoenix_r=-0.5))]
    for k in range(8):
        cx, cy, fam = centers[k % len(centers)]
        zoom = f"1e-{int(rng.integers(5, 45))}"
        s = fr.Scene(
            fractal_type=fr.FractalType.DEEP_ZOOM,
            hp_center_x=cx, hp_center_y=cy, hp_zoom=zoom,
            max_iterations=int(rng.integers(16, 120)),
            palette_mode=int(rng.integers(-1, 11)),
            samples_per_pixel=int(rng.choice([1, 2])),
            use_perturbation=True, **fam)
        img, info = deep_zoom.render(s, 10, 6, return_info=True)
        img = np.asarray(img)
        assert img.shape == (6, 10, 3), (s, zoom)
        assert np.isfinite(img).all(), (s, zoom)
        assert info["glitched_pixels_remaining"] == 0, (s, zoom)


def test_fuzz_deep_zoom_below_f64_floor_finite():
    """Depths past f64's entire range (zoom < ~5e-324) stay finite and
    glitch-free for EVERY family — mandelbrot/ship/phoenix (scaled
    deltas over absolute orbit tables) and julia (floatexp drift
    emission)."""
    from fractalrenderer_tpu.models import deep_zoom

    rng = np.random.default_rng(20260818)
    for fam in ({}, dict(deep_zoom_julia=True, julia_c_real=-0.7,
                         julia_c_imag=0.27015),
                dict(deep_zoom_ship=True),
                dict(deep_zoom_phoenix=True, phoenix_p=0.0,
                     phoenix_r=-0.5)):
        zoom = f"1e-{int(rng.integers(310, 340))}"
        s = fr.Scene(
            fractal_type=fr.FractalType.DEEP_ZOOM,
            hp_center_x="0", hp_center_y="1", hp_zoom=zoom,
            max_iterations=int(rng.integers(16, 120)),
            use_perturbation=True, **fam)
        img, info = deep_zoom.render(s, 10, 6, return_info=True)
        img = np.asarray(img)
        assert info["precision_mode"] == "ARBITRARY", (fam, zoom)
        assert np.isfinite(img).all(), (fam, zoom)
        assert info["glitched_pixels_remaining"] == 0, (fam, zoom)


def test_fuzz_planar_export_matches_interleaved_bytes():
    """Random fused-eligible configs across the four 2D families: the
    planar (3, H, W) quantized export must carry exactly the interleaved
    path's bytes (the animate batch path relies on this)."""
    import jax.numpy as jnp

    from fractalrenderer_tpu.models import common

    rng = np.random.default_rng(20260819)
    tried = 0
    for _ in range(40):
        s = _random_scene(rng)
        cfg = common.scene_static_cfg(
            s, 24, 16,
            {fr.FractalType.MANDELBROT: "mandelbrot",
             fr.FractalType.JULIA: "julia",
             fr.FractalType.BURNING_SHIP: "burning_ship",
             fr.FractalType.PHOENIX: "phoenix"}[s.fractal_type],
            "centered" if s.fractal_type == fr.FractalType.MANDELBROT
            else "uv",
            s.fractal_type != fr.FractalType.MANDELBROT)
        if not common.planar_export_ok(cfg):
            continue
        tried += 1
        dyn = {k: np.float32(v)
               for k, v in common.scene_dyn_params(s).items()}
        # Compare at IDENTICAL kernel granularity (eager band fn on both
        # sides → the same standalone kernel executable): on the CPU
        # interpret lane the "kernel" is plain XLA ops, so wrapping one
        # side in an extra outer jit can shift transcendentals by 1 ulp
        # and flip a quantization bucket — a fusion-granularity artifact,
        # not a layout bug (on TPU the Pallas kernel is opaque to fusion).
        f32 = np.asarray(common.band_render_fn(cfg, 16, 16)(
            dyn, jnp.float32(0.0)))
        depth = 8 if tried % 2 else 16
        planes = np.asarray(common.band_render_fn(
            cfg, 16, 16, planar_quantize=depth)(dyn, jnp.float32(0.0)))
        scale = 255.0 if depth == 8 else 65535.0
        dt = np.uint8 if depth == 8 else np.uint16
        ref = (np.clip(f32, 0.0, 1.0) * scale + 0.5).astype(dt)
        np.testing.assert_array_equal(np.moveaxis(planes, 0, 2), ref)
        if tried >= 8:
            break
    assert tried >= 4  # the fuzz actually exercised fused configs


def test_production_compiled_fn_matches_planar_export():
    """The PRODUCTION path (compiled_render_fn, outer-jit) vs the planar
    quantized export, fixed config: the fuzz above compares at eager band
    granularity, so this single case keeps the outer-jit production path
    itself guarded.  On the CPU interpret lane XLA fusion differences can
    shift transcendentals by 1 ulp, flipping a quantization bucket —
    allow exactly that (1 bucket), nothing more."""
    import jax.numpy as jnp

    from fractalrenderer_tpu.models import common

    s = fr.Scene(fractal_type=fr.FractalType.MANDELBROT,
                 max_iterations=64)
    cfg = common.scene_static_cfg(s, 24, 16, "mandelbrot", "centered",
                                  False)
    assert common.planar_export_ok(cfg)
    dyn = {k: np.float32(v) for k, v in common.scene_dyn_params(s).items()}
    f32 = np.asarray(common.compiled_render_fn(cfg)(dyn))
    planes = np.asarray(common.band_render_fn(
        cfg, 16, 16, planar_quantize=8)(dyn, jnp.float32(0.0)))
    ref = (np.clip(f32, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    got = np.moveaxis(planes, 0, 2).astype(np.int16)
    assert np.abs(got - ref.astype(np.int16)).max() <= 1
