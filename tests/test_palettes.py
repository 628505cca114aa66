import numpy as np
import pytest

from fractalrenderer_tpu.ops import palettes as pal


ALL_FAMILIES = [
    ("classic", pal.CLASSIC_PALETTES),
    ("enhanced", pal.ENHANCED_PALETTES),
]


@pytest.mark.parametrize("family,table", ALL_FAMILIES)
def test_palettes_finite_and_in_range(family, table):
    t = np.linspace(0, 1, 513, dtype=np.float32)[:-1]  # [0, 1)
    for fn in table:
        c = fn(np, t)
        assert c.shape == (512, 3)
        assert c.dtype == np.float32
        assert np.isfinite(c).all()
        assert (c >= -1e-6).all() and (c <= 1.0 + 1e-6).all()


def test_classic_fire_endpoints():
    # mandelbrot.comp:60-72: t=0 → c1, t>=0.8 → c5
    c = pal.classic_fire(np, np.array([0.0, 0.95], np.float32))
    np.testing.assert_allclose(c[0], [0.0, 0.0, 0.1], atol=1e-6)
    np.testing.assert_allclose(c[1], [1.0, 1.0, 0.95], atol=1e-6)


def test_classic_fire_midsegment():
    # t such that pow(t,0.7)=0.3 → mix(c2,c3,0.5)
    t = np.array([0.3 ** (1 / 0.7)], np.float32)
    c = pal.classic_fire(np, t)
    np.testing.assert_allclose(c[0], [0.9, 0.15, 0.0], atol=1e-5)


def test_enhanced_lava_nonuniform_segments():
    # julia.comp:144-157 has segment spans 0.2/0.2/0.3/0.3
    def glsl_lava(t):
        t = t ** 0.6
        c = [(0.1, 0, 0), (0.6, 0, 0), (1, 0.2, 0), (1, 0.6, 0), (1, 1, 0.5)]
        c = [np.array(x) for x in c]
        if t < 0.2:
            return c[0] + (c[1] - c[0]) * (t * 5)
        if t < 0.4:
            return c[1] + (c[2] - c[1]) * ((t - 0.2) * 5)
        if t < 0.7:
            return c[2] + (c[3] - c[2]) * ((t - 0.4) / 0.3)
        return c[3] + (c[4] - c[3]) * ((t - 0.7) / 0.3)

    ts = np.array([0.05, 0.21, 0.5, 0.8, 0.99], np.float32)
    got = pal.enhanced_lava(np, ts)
    want = np.stack([glsl_lava(float(t)) for t in ts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_enhanced_cosmic_nonuniform_segments():
    # julia.comp:84-97 breakpoints 0.3/0.5/0.7
    def glsl_cosmic(t):
        t = t ** 0.8
        c = [(0, 0, 0), (0.2, 0, 0.4), (0.4, 0, 0.6), (0.8, 0.3, 0.9),
             (1, 0.7, 1)]
        c = [np.array(x) for x in c]
        if t < 0.3:
            return c[0] + (c[1] - c[0]) * (t / 0.3)
        if t < 0.5:
            return c[1] + (c[2] - c[1]) * ((t - 0.3) / 0.2)
        if t < 0.7:
            return c[2] + (c[3] - c[2]) * ((t - 0.5) / 0.2)
        return c[3] + (c[4] - c[3]) * ((t - 0.7) / 0.3)

    ts = np.array([0.1, 0.35, 0.6, 0.9], np.float32)
    got = pal.enhanced_cosmic(np, ts)
    want = np.stack([glsl_cosmic(float(t)) for t in ts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_palette_color_fracts():
    t = np.array([1.25], np.float32)
    a = pal.palette_color(np, t, 0, "classic")
    b = pal.palette_color(np, np.array([0.25], np.float32), 0, "classic")
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_palette_color_mode_out_of_range_defaults():
    t = np.array([0.4], np.float32)
    a = pal.palette_color(np, t, 99, "enhanced")
    b = pal.palette_color(np, t, 0, "enhanced")
    np.testing.assert_allclose(a, b)


def test_hsv2rgb_primary_colors():
    h = np.array([0.0, 1 / 3, 2 / 3], np.float32)
    s = np.ones(3, np.float32)
    v = np.ones(3, np.float32)
    rgb = pal.hsv2rgb(np, h, s, v)
    np.testing.assert_allclose(rgb[0], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(rgb[1], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(rgb[2], [0, 0, 1], atol=1e-5)


def test_deepzoom_palettes():
    t = np.linspace(0, 100, 64, dtype=np.float32)
    for mode in range(4):
        c = pal.deepzoom_color(np, t, mode)
        assert c.shape == (64, 3) and np.isfinite(c).all()


def test_bulb_palettes():
    t = np.linspace(0, 1, 64, dtype=np.float32)
    for mode in range(6):
        c = pal.bulb_color(np, t, mode)
        assert c.shape == (64, 3) and np.isfinite(c).all()


def test_traced_palette_switch_matches_static():
    import jax.numpy as jnp

    t = np.linspace(0, 1, 33, dtype=np.float32)
    for mode in (0, 3, 5):
        static = pal.palette_color(jnp, jnp.asarray(t), mode, "classic")
        traced = pal.palette_color(jnp, jnp.asarray(t), jnp.int32(mode),
                                   "classic")
        np.testing.assert_allclose(np.asarray(static), np.asarray(traced),
                                   atol=1e-6)


def _glsl_4seg(t, cols, pre=None):
    import numpy as np

    c = [np.array(x, np.float64) for x in cols]
    if pre:
        t = pre(t)
    if t < 0.25:
        return c[0] + (c[1] - c[0]) * (t * 4)
    if t < 0.5:
        return c[1] + (c[2] - c[1]) * ((t - 0.25) * 4)
    if t < 0.75:
        return c[2] + (c[3] - c[2]) * ((t - 0.5) * 4)
    return c[3] + (c[4] - c[3]) * ((t - 0.75) * 4)


def test_classic_nebula_solar_ocean_segments():
    # mandelbrot.comp:91-128 exact stops and pre-transforms
    ts = np.array([0.1, 0.3, 0.6, 0.9], np.float32)
    neb = pal.classic_nebula(np, ts)
    want = np.stack([_glsl_4seg(float(t), [(0.02, 0, 0.05), (0.15, 0, 0.25),
                                           (0, 0.4, 0.6), (0, 0.9, 1),
                                           (0.9, 0.95, 1)]) for t in ts])
    np.testing.assert_allclose(neb, want, atol=1e-5)

    sol = pal.classic_solar(np, ts)
    want = np.stack([_glsl_4seg(float(t) ** 0.9,
                                [(0.1, 0, 0.1), (0.5, 0, 0.2), (0.9, 0.3, 0),
                                 (1, 0.8, 0.3), (1, 1, 0.9)]) for t in ts])
    np.testing.assert_allclose(sol, want, atol=1e-5)

    oc = pal.classic_ocean(np, ts)
    want = np.stack([_glsl_4seg(float(t) ** 0.85,
                                [(0, 0.05, 0.08), (0, 0.3, 0.5), (0, 0.7, 0.9),
                                 (0.2, 0.9, 1), (0.9, 1, 1)]) for t in ts])
    np.testing.assert_allclose(oc, want, atol=1e-5)


def test_enhanced_gold_vaporwave_forest_segments():
    # julia.comp:100-141
    def smoothstep(t):
        t = min(max(t, 0.0), 1.0)
        return t * t * (3 - 2 * t)

    ts = np.array([0.15, 0.4, 0.65, 0.95], np.float32)
    gold = pal.enhanced_gold(np, ts)
    want = np.stack([_glsl_4seg(smoothstep(float(t)),
                                [(0.1, 0.05, 0), (0.4, 0.2, 0), (0.8, 0.5, 0.1),
                                 (1, 0.8, 0.3), (1, 1, 0.9)]) for t in ts])
    np.testing.assert_allclose(gold, want, atol=1e-5)

    vap = pal.enhanced_vaporwave(np, ts)
    want = np.stack([_glsl_4seg(float(t),
                                [(0.1, 0, 0.2), (0.5, 0, 0.5), (1, 0, 0.8),
                                 (0, 0.8, 1), (1, 0.5, 1)]) for t in ts])
    np.testing.assert_allclose(vap, want, atol=1e-5)

    forest = pal.enhanced_forest(np, ts)
    want = np.stack([_glsl_4seg(float(t),
                                [(0, 0.05, 0), (0, 0.2, 0.1), (0.1, 0.5, 0.2),
                                 (0.3, 0.8, 0.4), (0.8, 1, 0.6)]) for t in ts])
    np.testing.assert_allclose(forest, want, atol=1e-5)
