"""Kernel ↔ golden-reference consistency.

Contract (see BASELINE.md):
- On TPU, iteration counts and final z are bit-exact vs the numpy golden for
  power-of-two heights (where the pixel→plane mapping involves only exact
  f32 ops); trap/stripe fields match to transcendental tolerance.
- On CPU (interpret mode / CI), XLA contracts mul+add chains into FMA with
  context-dependent choices, so we assert near-exactness instead: ≥ 99.5 %
  of pixels bit-equal, the rest within ±1 iteration (boundary ulp flips).
"""
import jax
import numpy as np
import pytest

from fractalrenderer_tpu.ops.escape import escape_fields
from fractalrenderer_tpu.reference import golden

ON_TPU = jax.default_backend() == "tpu"

W, H = 96, 64
ITERS = 96


def assert_counts_consistent(n_kernel, n_golden, cpu_frac=0.005):
    n_kernel = np.asarray(n_kernel)
    mism = n_kernel != n_golden
    frac = mism.mean()
    if ON_TPU:
        assert frac == 0.0, f"{int(mism.sum())} iteration-count mismatches"
    else:
        # CPU/interpret: XLA's context-dependent FMA contraction perturbs c
        # and the orbit by ~1 ulp; on the fractal escape boundary that can
        # shift counts arbitrarily for a small set of pixels, so only the
        # mismatch *fraction* is meaningful off-TPU.
        assert frac <= cpu_frac, f"mismatch fraction {frac}"


def test_mandelbrot_counts_and_fields():
    f = escape_fields("mandelbrot", W, H, center_x=-0.5, center_y=0.0,
                      zoom=3.0, max_iter=ITERS, track_trap=True)
    n, zx, zy, trap = golden.mandelbrot_fields(W, H, -0.5, 0.0, 3.0, ITERS, 4.0)
    assert_counts_consistent(f["n"], n)
    if ON_TPU:
        assert np.array_equal(np.asarray(f["zx"]), zx)
        assert np.array_equal(np.asarray(f["zy"]), zy)
    if ON_TPU:  # off-TPU the orbits themselves differ (FMA contraction)
        same = np.asarray(f["n"]) == n
        np.testing.assert_allclose(np.asarray(f["trap"])[same], trap[same],
                                   rtol=1e-4, atol=1e-5)
    assert np.isfinite(np.asarray(f["trap"])).all()


def test_mandelbrot_deep_preset_counts():
    # Seahorse Valley (fractal_state.h:175)
    f = escape_fields("mandelbrot", W, H, center_x=-0.743643887037151,
                      center_y=0.13182590420533, zoom=0.008, max_iter=256)
    n, *_ = golden.mandelbrot_fields(W, H, -0.743643887037151,
                                     0.13182590420533, 0.008, 256, 4.0)
    # Zoomed-in views sit on the chaotic boundary — allow a larger fraction
    # of ulp-flip pixels off-TPU.
    assert_counts_consistent(f["n"], n, cpu_frac=0.08)


def test_julia_counts():
    f = escape_fields("julia", W, H, center_x=0.0, center_y=0.0, zoom=3.0,
                      max_iter=ITERS, julia_c=(-0.7, 0.27015))
    n, zx, zy = golden.julia_fields(W, H, 0.0, 0.0, 3.0, -0.7, 0.27015,
                                    ITERS, 4.0)
    assert_counts_consistent(f["n"], n)
    if ON_TPU:
        assert np.array_equal(np.asarray(f["zx"]), zx)


def test_julia_presets_counts():
    from fractalrenderer_tpu.presets import JULIA_PRESETS

    for name, (cr, ci) in JULIA_PRESETS.items():
        f = escape_fields("julia", 64, 32, center_x=0.0, center_y=0.0,
                          zoom=3.0, max_iter=64, julia_c=(cr, ci))
        n, *_ = golden.julia_fields(64, 32, 0.0, 0.0, 3.0, cr, ci, 64, 4.0)
        assert_counts_consistent(f["n"], n)


def test_burning_ship_counts_and_aux():
    f = escape_fields("burning_ship", W, H, center_x=-0.5, center_y=-0.6,
                      zoom=2.0, max_iter=ITERS, track_trap=True,
                      track_stripe=True, trap_radius=0.5, stripe_density=10.0)
    n, zx, zy, trap, stripe = golden.burning_ship_fields(
        W, H, -0.5, -0.6, 2.0, ITERS, 4.0, True, 0.5, True, 10.0, 2)
    # The ship's chaotic boundary is long at this framing.
    assert_counts_consistent(f["n"], n, cpu_frac=0.05)
    if ON_TPU:
        same = np.asarray(f["n"]) == n
        np.testing.assert_allclose(np.asarray(f["trap"])[same], trap[same],
                                   rtol=1e-4, atol=1e-5)
        # stripe accumulates sin() over up to ITERS terms — transcendental
        # approximation differences accumulate linearly
        np.testing.assert_allclose(np.asarray(f["stripe"])[same],
                                   stripe[same], rtol=1e-3,
                                   atol=2e-4 * ITERS)
    assert np.isfinite(np.asarray(f["trap"])).all()
    assert np.isfinite(np.asarray(f["stripe"])).all()


def test_phoenix_counts():
    f = escape_fields("phoenix", W, H, center_x=0.0, center_y=0.0, zoom=3.0,
                      max_iter=ITERS, julia_c=(0.5667, 0.0),
                      phoenix_p=0.0, phoenix_r=-0.5, use_julia=False)
    n, zx, zy = golden.phoenix_fields(W, H, 0.0, 0.0, 3.0, ITERS,
                                      (0.5667, 0.0), False, 0.0, -0.5)
    assert_counts_consistent(f["n"], n)


def test_phoenix_julia_mode_uniform():
    # phoenix.comp:63-67 in Julia mode ignores the pixel constant entirely —
    # every pixel iterates the same orbit (faithful reference quirk).
    f = escape_fields("phoenix", 32, 16, center_x=0.0, center_y=0.0, zoom=3.0,
                      max_iter=64, julia_c=(0.3, 0.2), phoenix_p=0.1,
                      phoenix_r=-0.3, use_julia=True)
    n = np.asarray(f["n"])
    assert (n == n[0, 0]).all()
    ng, *_ = golden.phoenix_fields(32, 16, 0.0, 0.0, 3.0, 64, (0.3, 0.2),
                                   True, 0.1, -0.3)
    assert_counts_consistent(n, ng)


def test_iter_limit_dynamic():
    # iter_limit below the static cap must freeze n at the limit
    f_lim = escape_fields("mandelbrot", 64, 32, center_x=-0.5, center_y=0.0,
                          zoom=3.0, max_iter=128, iter_limit=40)
    f_ref = escape_fields("mandelbrot", 64, 32, center_x=-0.5, center_y=0.0,
                          zoom=3.0, max_iter=40)
    np.testing.assert_array_equal(np.asarray(f_lim["n"]),
                                  np.asarray(f_ref["n"]))
    assert int(np.asarray(f_lim["n"]).max()) == 40


def test_partial_tiles():
    # Sizes that do not divide the tile shape exercise edge masking.
    f = escape_fields("mandelbrot", 37, 23, center_x=-0.5, center_y=0.0,
                      zoom=3.0, max_iter=32)
    n, *_ = golden.mandelbrot_fields(37, 23, -0.5, 0.0, 3.0, 32, 4.0)
    assert_counts_consistent(f["n"], n)
    assert np.asarray(f["n"]).min() >= 0  # no OOB sentinel leaked


def test_full_render_close_to_golden():
    from fractalrenderer_tpu import Scene, render, render_numpy

    s = Scene(max_iterations=64, antialiasing_samples=2)
    img = np.asarray(render(s, 64, 32))
    ref = render_numpy(s, 64, 32)
    # Colors agree except on count-flip pixels; allow a small bad fraction.
    bad = (np.abs(img - ref) > 2e-2).any(axis=-1)
    assert bad.mean() < 0.01, f"bad color fraction {bad.mean()}"


def test_render_all_families_finite():
    from fractalrenderer_tpu import FractalType, Scene, render

    for ft in (FractalType.MANDELBROT, FractalType.JULIA,
               FractalType.BURNING_SHIP, FractalType.PHOENIX):
        img = np.asarray(render(Scene(fractal_type=ft, max_iterations=32),
                                48, 24))
        assert img.shape == (24, 48, 3)
        assert np.isfinite(img).all()
        assert (img >= 0).all() and (img <= 1).all()


def test_julia_c_sweep_batch():
    # BASELINE config #2: batch of c values in one dispatch
    from fractalrenderer_tpu.models.julia import render_c_sweep
    from fractalrenderer_tpu.presets import JULIA_PRESETS
    from fractalrenderer_tpu import Scene, FractalType, render

    s = Scene(fractal_type=FractalType.JULIA, max_iterations=32, zoom=3.0)
    cs = list(JULIA_PRESETS.values())
    out = np.asarray(render_c_sweep(s, cs, 48, 24))
    assert out.shape == (len(cs), 24, 48, 3)
    # each sweep entry equals the single render with that c (tiny fp
    # differences off-TPU from batching context; exact on TPU)
    for i, (cr, ci) in enumerate(cs):
        ref = np.asarray(render(s.with_(julia_c_real=cr, julia_c_imag=ci),
                                48, 24))
        if ON_TPU:
            np.testing.assert_array_equal(out[i], ref)
        else:
            np.testing.assert_allclose(out[i], ref, atol=1e-5)


def test_distance_estimate_field():
    # mandelbrot_debug.comp capability: derivative-based exterior DE
    from fractalrenderer_tpu.models.mandelbrot import distance_field
    from fractalrenderer_tpu import Scene

    s = Scene(max_iterations=128, zoom=3.0)
    d = distance_field(s, 96, 64)
    assert d.shape == (64, 96) and np.isfinite(d).all()
    # interior reports 0; far exterior has large distance
    assert (d >= 0).all()
    assert d[0, 0] > 0.1          # far corner is far from the set
    assert d.min() == 0.0          # interior present at zoom 3
    # DE must shrink toward the boundary: compare the far corner with a
    # pixel adjacent to an interior pixel
    ys, xs = np.nonzero(d == 0)
    y, x = ys[len(ys) // 2], xs[len(xs) // 2]
    if 0 < x < 95:
        near = max(d[y, x - 1], d[y, x + 1])
        assert near < d[0, 0]


def test_jit_cache_discipline():
    # SURVEY §5: dynamic-parameter changes must NOT recompile; structural
    # changes must compile a separate executable.
    from fractalrenderer_tpu.models import common
    from fractalrenderer_tpu import Scene

    s = Scene(max_iterations=24)
    cfg = common.scene_static_cfg(s, 32, 16, "mandelbrot", "centered", False)
    fn = common.compiled_render_fn(cfg)
    base = fn._cache_size()
    for z in (3.0, 1.5, 0.7, 0.31):
        np.asarray(fn(common.scene_dyn_params(s.with_(zoom=z))))
    assert fn._cache_size() == max(base, 1)  # one executable for all zooms

    # a palette change is structural → a different compiled fn
    cfg2 = common.scene_static_cfg(s.with_(palette_mode=3), 32, 16,
                                   "mandelbrot", "centered", False)
    assert common.compiled_render_fn(cfg2) is not fn
    # same cfg → same cached fn object
    assert common.compiled_render_fn(cfg) is fn


def test_iter_bucket_stays_below_f32_ceiling():
    # a legal max_iterations in (2^23, 2^24) must not bucket into the
    # rejected 2^24 cap (regression: _iter_bucket(9M) returned 1<<24,
    # which escape_fields rejects)
    from fractalrenderer_tpu import Scene
    from fractalrenderer_tpu.models import common

    assert common._iter_bucket(9_000_000) == (1 << 24) - 1
    # renders (all-escaping viewport so the 9M limit costs nothing)
    s = Scene(max_iterations=9_000_000, center_x=10.0, center_y=10.0)
    cfg = common.scene_static_cfg(s, 16, 8, "mandelbrot", "centered", False)
    out = np.asarray(common.compiled_render_fn(cfg)(
        common.scene_dyn_params(s)))
    assert np.isfinite(out).all()


def test_oversized_iter_limit_colors_interior_consistently():
    # coloring clamps max_iterations exactly like the kernel clamps n:
    # a frame whose iter_limit exceeds the static cap must color interior
    # pixels identically to the in-cap limit, not route them through the
    # exterior path
    from fractalrenderer_tpu import Scene
    from fractalrenderer_tpu.models import common

    s = Scene(max_iterations=96)
    cfg = common.scene_static_cfg(s, 32, 16, "mandelbrot", "centered",
                                  False)
    fn = common.compiled_render_fn(cfg)
    dyn_ok = common.scene_dyn_params(s)
    dyn_over = dict(dyn_ok, iter_limit=float(cfg.max_iter) + 1000.0)
    np.testing.assert_array_equal(
        np.asarray(fn(dyn_over)),
        np.asarray(fn(dict(dyn_ok, iter_limit=float(cfg.max_iter)))))


def test_oversized_iter_limit_clamps_to_static_cap():
    # the traced limit is clamped in-kernel to the static cap (and the
    # f32 counter ceiling), so an oversized iter_limit cannot saturate
    # the f32 counter into wrong counts
    f = escape_fields("mandelbrot", 32, 16, center_x=-0.5, center_y=0.0,
                      zoom=3.0, max_iter=96, iter_limit=10 ** 8)
    n = np.asarray(f["n"])
    assert n.max() == 96
    f2 = escape_fields("mandelbrot", 32, 16, center_x=-0.5, center_y=0.0,
                       zoom=3.0, max_iter=96)
    np.testing.assert_array_equal(n, np.asarray(f2["n"]))


def test_iteration_counts_share_compile_bucket():
    # the static compile cap is bucketed (the kernel loop is bounded by
    # the TRACED iter_limit) so the viewer's [ / ] steps and ladders
    # reuse one executable per power-of-two bucket; counts still honor
    # the exact limit
    from fractalrenderer_tpu import Scene
    from fractalrenderer_tpu.models import common

    fns = {id(common.compiled_render_fn(common.scene_static_cfg(
        Scene(max_iterations=mi), 32, 16, "mandelbrot", "centered", False)))
        for mi in (300, 364, 428, 492)}
    assert len(fns) == 1
    f = escape_fields("mandelbrot", 48, 32, center_x=-0.5, center_y=0.0,
                      zoom=3.0, max_iter=512, iter_limit=300)
    n = np.asarray(f["n"])
    assert n.max() == 300  # interior reports the exact traced limit
    from fractalrenderer_tpu.reference import golden
    nref, *_ = golden.mandelbrot_fields(48, 32, -0.5, 0.0, 3.0, 300, 4.0)
    assert_counts_consistent(f["n"], nref)


@pytest.mark.parametrize("scene_kw", [
    dict(orbit_trap_enabled=True, orbit_trap_radius=0.3),
    dict(stripe_enabled=True, stripe_density=7.0),
    dict(interior_style=1),
    dict(interior_style=2, orbit_trap_enabled=True),
    dict(color_offset=0.37, color_scale=2.5, palette_mode=4),
    dict(color_brightness=1.4, color_saturation=0.6, color_contrast=1.2),
])
def test_mandelbrot_effects_match_golden(scene_kw):
    from fractalrenderer_tpu import Scene, render, render_numpy

    s = Scene(max_iterations=48, zoom=2.8, **scene_kw)
    img = np.asarray(render(s, 48, 32))
    ref = render_numpy(s, 48, 32)
    bad = (np.abs(img - ref) > 2e-2).any(axis=-1)
    assert bad.mean() < 0.02, f"bad frac {bad.mean()} for {scene_kw}"


@pytest.mark.parametrize("scene_kw", [
    dict(interior_style=1, orbit_trap_enabled=True),
    dict(interior_style=2, stripe_enabled=True, stripe_density=12.0),
    dict(interior_style=3),
])
def test_burning_ship_interior_styles_match_golden(scene_kw):
    from fractalrenderer_tpu import FractalType, Scene, render, render_numpy

    s = Scene(fractal_type=FractalType.BURNING_SHIP, center_x=-0.5,
              center_y=-0.6, zoom=2.0, max_iterations=48, **scene_kw)
    img = np.asarray(render(s, 48, 32))
    ref = render_numpy(s, 48, 32)
    bad = (np.abs(img - ref) > 2e-2).any(axis=-1)
    assert bad.mean() < 0.06, f"bad frac {bad.mean()} for {scene_kw}"


def test_phoenix_julia_param_render_matches_golden():
    from fractalrenderer_tpu import FractalType, Scene, render, render_numpy

    s = Scene(fractal_type=FractalType.PHOENIX, zoom=3.0, max_iterations=48,
              phoenix_p=0.2, phoenix_r=-0.3, stripe_density=5.0)
    img = np.asarray(render(s, 48, 32))
    ref = render_numpy(s, 48, 32)
    bad = (np.abs(img - ref) > 2e-2).any(axis=-1)
    assert bad.mean() < 0.03


def test_aa_offsets_formulas():
    from fractalrenderer_tpu.ops import mapping

    # centered: (sx, sy)/aa (mandelbrot.comp:222-226)
    offs = mapping.aa_offsets_centered(2)
    assert offs == ((0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5))
    # uv: so = (1/W)/aa; off = (s)*so - so*(aa-1)/2 (julia.comp:253-259)
    offs = mapping.aa_offsets_uv(2, 100)
    so = (1 / 100) / 2
    want0 = (0 * so - so * 0.5, 0 * so - so * 0.5)
    assert offs[0] == pytest.approx(want0)
    assert len(offs) == 4
    assert mapping.aa_offsets_uv(1, 100) == ((0.0, 0.0),)


@pytest.mark.parametrize("family,kw", [
    ("mandelbrot", {}),
    ("mandelbrot", dict(fused=(3, 1, False), color_offset=0.25,
                        color_scale=2.0)),
    ("julia", dict(fused=(4, 0, True), julia_c=(-0.7, 0.27015),
                   use_julia=True, cx=0.0, cy=0.0, zoom=3.0)),
    ("burning_ship", dict(fused=(5, 3, True), cx=-0.5, cy=-0.6, zoom=2.0,
                          color_offset=0.1, color_scale=1.5)),
    # phoenix: flow stripes on (control > 0.01 → polynomial atan2 in both
    # paths) and off (static gate)
    ("phoenix", dict(fused=(2, 0, True), cx=0.0, cy=0.0, zoom=3.0,
                     phoenix_p=0.1, phoenix_r=-0.4, stripe_density=8.0,
                     color_offset=0.05, color_scale=1.2)),
    ("phoenix", dict(fused=(0, 0, True), cx=0.0, cy=0.0, zoom=3.0,
                     phoenix_p=0.0, phoenix_r=-0.5, stripe_density=0.0)),
])
def test_fused_coloring_matches_unfused(family, kw):
    # The in-kernel fused coloring path (planar colorers + post chain in
    # VMEM) must reproduce the field-output + XLA coloring pipeline.
    # Tolerance covers operator-fusion float differences only (<1e-5 —
    # below one 16-bit quantization step, 1/65535).
    import jax.numpy as jnp

    from fractalrenderer_tpu.ops import coloring
    from fractalrenderer_tpu.ops.escape import escape_fields

    kw = dict(kw)
    fused = kw.pop("fused", (0, 0, False))
    base = dict(center_x=kw.pop("cx", -0.5), center_y=kw.pop("cy", 0.0),
                zoom=kw.pop("zoom", 3.0), max_iter=96, bailout=4.0)
    coff = kw.pop("color_offset", 0.0)
    cscale = kw.pop("color_scale", 1.0)
    bri, sat, con = 1.05, 1.2, 1.1
    W, H = 96, 80

    f = escape_fields(family, W, H, **base, **kw)
    p = coloring.ColorParams(
        max_iterations=float(base["max_iter"]), bailout=base["bailout"],
        palette_mode=fused[0], color_offset=coff, color_scale=cscale,
        interior_style=fused[1],
        phoenix_stripe_control=kw.get("stripe_density", 0.0))

    def color_unfused():
        if family == "mandelbrot":
            return coloring.color_mandelbrot(
                jnp, f["n"], f["zx"], f["zy"], jnp.full_like(f["zx"], 1e20),
                p)
        if family == "burning_ship":
            return coloring.color_burning_ship(
                jnp, f["n"], f["zx"], f["zy"], jnp.full_like(f["zx"], 1e10),
                jnp.zeros_like(f["zx"]), p)
        if family == "phoenix":
            return coloring.color_phoenix(jnp, f["n"], f["zx"], f["zy"], p)
        return coloring.color_julia(jnp, f["n"], f["zx"], f["zy"], p)

    color = color_unfused()
    b2, s2, c2 = (max(bri, 0.1), max(sat, 0.0), max(con, 0.1)) \
        if fused[2] else (bri, sat, con)
    color = coloring.enhance_color(jnp, color, b2, s2, c2)
    ref = np.asarray(coloring.gamma_correct(
        jnp, coloring.aces_tonemap(jnp, color)))

    g = escape_fields(family, W, H, fused_color=fused, color_offset=coff,
                      color_scale=cscale, brightness=bri, saturation=sat,
                      contrast=con, **base, **kw)
    img = np.stack([np.asarray(g[c]) for c in "rgb"], axis=-1)
    np.testing.assert_allclose(img, ref, rtol=0, atol=1e-5)

    # with_post=False (the AA>1 sample-plane mode): kernel output must be
    # the pre-post-chain palette color
    raw = color_unfused()
    g2 = escape_fields(family, W, H, fused_color=fused + (False,),
                       color_offset=coff, color_scale=cscale,
                       brightness=bri, saturation=sat, contrast=con,
                       **base, **kw)
    img2 = np.stack([np.asarray(g2[c]) for c in "rgb"], axis=-1)
    np.testing.assert_allclose(img2, np.asarray(raw), rtol=0, atol=1e-5)
