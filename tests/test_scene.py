import pytest

from fractalrenderer_tpu import FractalType, Scene, presets


def test_defaults_match_reference():
    # src/fractal_state.h:18-91
    s = Scene()
    assert s.center_x == -0.5 and s.center_y == 0.0 and s.zoom == 3.0
    assert s.max_iterations == 256
    assert s.julia_c_real == pytest.approx(-0.7)
    assert s.julia_c_imag == pytest.approx(0.27015)
    assert s.bailout == 4.0 and s.antialiasing_samples == 1
    assert s.palette_mode == 0 and s.color_scale == 1.0
    assert s.mandelbulb_power == 8.0
    assert s.phoenix_p == 0.0 and s.phoenix_r == -0.5
    assert s.orbit_trap_radius == 0.5 and s.stripe_density == 10.0


def test_reset_matches_reference():
    # src/fractal_state.h:135-153 — reset() uses zoom 1.5
    s = Scene(zoom=1e-8, center_x=0.3, max_iterations=4096,
              color_brightness=2.0).reset()
    assert s.zoom == 1.5 and s.center_x == -0.5
    assert s.max_iterations == 256 and s.color_brightness == 1.0


def test_json_roundtrip():
    s = Scene(fractal_type=FractalType.BURNING_SHIP, zoom=0.02,
              orbit_trap_enabled=True, hp_center_x="-0.75000000000000001")
    s2 = Scene.from_json(s.to_json())
    assert s2 == s


def test_from_dict_rejects_unknown():
    with pytest.raises(ValueError):
        Scene.from_dict({"no_such_field": 1})


def test_fractal_type_parse():
    assert FractalType.parse("burning-ship") == FractalType.BURNING_SHIP
    assert FractalType.parse("Julia Set") == FractalType.JULIA
    with pytest.raises(ValueError):
        FractalType.parse("mandelbox")


def test_zoom_helpers_match_reference():
    # src/vk_engine.cpp:1731-1794
    s = Scene(zoom=1.0)
    z = s.zoomed(zoom_in=True)
    assert z.zoom == pytest.approx(0.8)
    assert z.max_iterations == 1024  # zoom < 1.0 bucket
    z2 = s.zoomed(zoom_in=False)
    assert z2.zoom == pytest.approx(1.25)
    assert z2.max_iterations == 512  # zoom < 10 bucket

    # zoom_to_point keeps the world point under the cursor fixed
    s = Scene(center_x=-0.5, center_y=0.0, zoom=2.0)
    w, h = 800, 600
    px, py = 200, 150
    aspect = w / h
    nx, ny = px / w - 0.5, py / h - 0.5
    wx = s.center_x + nx * s.zoom * aspect
    wy = s.center_y + ny * s.zoom
    z = s.zoom_to_point(px, py, w, h, zoom_in=True)
    assert z.zoom == pytest.approx(1.4)
    assert wx == pytest.approx(z.center_x + nx * z.zoom * aspect)
    assert wy == pytest.approx(z.center_y + ny * z.zoom)


def test_from_dict_rejects_wrong_types():
    # untrusted scene JSON: wrong-typed values raise ValueError at load
    # time, not a shape error deep inside a later render (the reference
    # validates parsed inputs, ui_manager.cpp:100-129)
    import pytest

    from fractalrenderer_tpu.scene import Scene

    with pytest.raises(ValueError):
        Scene.from_dict([])  # not an object
    with pytest.raises(ValueError):
        Scene.from_dict({"zoom": {"a": 1}})
    with pytest.raises(ValueError):
        Scene.from_dict({"max_iterations": "many"})
    with pytest.raises(ValueError):
        Scene.from_dict({"hp_zoom": [1, 2]})
    with pytest.raises(ValueError):
        Scene.from_dict({"nonexistent_field": 1})
    # benign coercions keep working: JSON strings for numbers, numbers
    # for hp strings
    s = Scene.from_dict({"zoom": "1e-3", "max_iterations": 128,
                         "hp_zoom": 1e-12})
    assert s.zoom == 1e-3 and s.hp_zoom == "1e-12"


def test_presets_tables():
    # src/fractal_state.h:171-189
    assert len(presets.MANDELBROT_PRESETS) == 6
    assert len(presets.BURNING_SHIP_PRESETS) == 5
    sea = presets.find_preset("Seahorse Valley")
    assert sea.center_x == pytest.approx(-0.743643887037151)
    assert sea.iterations == 1024
    s = sea.apply(Scene())
    assert s.zoom == 0.008
    assert presets.JULIA_PRESETS["Douady's Rabbit"] == (-0.123, 0.745)
    assert presets.PHOENIX_PRESETS["Classic Phoenix"] == (0.0, -0.5)
    assert presets.PRINT_SIZE_PRESETS["40x60 @ 300 DPI"] == (12000, 18000)
    assert len(presets.DEEP_ZOOM_PRESETS) == 3


def test_metadata_summary():
    s = Scene(zoom=0.015, max_iterations=768, orbit_trap_enabled=True)
    md = s.metadata_summary()
    assert md["Zoom"] == "0.015000000"
    assert md["Iterations"] == "768"
    assert md["Orbit Trap"] == "Enabled"


def test_hp_camera_exact_navigation():
    # HP camera ops are exact rationals — navigation works at depths where
    # f64 zoom math would collapse (beyond-reference capability).
    from fractions import Fraction

    from fractalrenderer_tpu.scene import FractalType, Scene

    s = Scene(fractal_type=FractalType.DEEP_ZOOM,
              hp_center_x="-0.74364388703715158",
              hp_center_y="0.13182590420531198", hp_zoom="1e-40",
              max_iterations=500)
    z = s.hp_zoomed(True)
    assert abs(Fraction(z.hp_zoom) / (Fraction("1e-40") * Fraction(4, 5))
               - 1) < Fraction(1, 10 ** 20)
    assert Fraction(z.hp_center_x) == Fraction(s.hp_center_x)

    # zoom-to-point keeps the chosen world point EXACTLY fixed
    W, H = 192, 108
    px, py = 31.0, 77.0
    t = s.hp_zoom_to_point(px, py, W, H, True)
    def world(sc):
        cx, cy, zm = sc._hp_coords_frac()
        step = zm * 4 / (H * H)
        return (cx + step * (Fraction(px) - Fraction(W, 2)),
                cy + step * (Fraction(py) - Fraction(H, 2)))
    wx0, wy0 = world(s)
    wx1, wy1 = world(t)
    # exact up to the serialized digit budget (far below pixel scale)
    assert abs(wx1 - wx0) < Fraction(10) ** -55
    assert abs(wy1 - wy0) < Fraction(10) ** -55
    assert abs(Fraction(t.hp_zoom) / (Fraction("1e-40") * Fraction(7, 10))
               - 1) < Fraction(1, 10 ** 20)

    # fifty consecutive zooms stay precise (f64 would have died at ~1e-15)
    d = s
    for _ in range(50):
        d = d.hp_zoomed(True)
    want = Fraction("1e-40") * Fraction(4, 5) ** 50
    assert abs(Fraction(d.hp_zoom) / want - 1) < Fraction(1, 10 ** 18)


def test_hp_camera_from_float_scene():
    # starting from a plain f64 scene, hp navigation promotes to strings
    from fractalrenderer_tpu.scene import FractalType, Scene

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, zoom=1e-3)
    z = s.hp_zoomed(True)
    assert z.hp_zoom is not None and float(z.hp_zoom) > 0
    assert z.zoom == float(z.hp_zoom)


def test_hp_panned_exact_and_below_f64_range():
    from fractions import Fraction

    from fractalrenderer_tpu.scene import FractalType, Scene

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, hp_center_x="-0.5",
              hp_center_y="0.25", hp_zoom="1e-30")
    p = s.hp_panned(0.5, -0.25)
    assert (Fraction(p.hp_center_x) - Fraction("-0.5")
            == Fraction("1e-30") * Fraction("0.5"))
    assert (Fraction(p.hp_center_y) - Fraction("0.25")
            == Fraction("1e-30") * Fraction("-0.25"))
    # float mirrors track for the status line
    assert p.center_x == float(Fraction(p.hp_center_x))
    # below f64's range the exact pan still moves the center
    deep = Scene(fractal_type=FractalType.DEEP_ZOOM, hp_center_x="0",
                 hp_center_y="0", hp_zoom="1e-400")
    d = deep.hp_panned(1.0, 0.0)
    assert Fraction(d.hp_center_x) == Fraction("1e-400")
    assert Fraction(d.hp_center_x) != 0
