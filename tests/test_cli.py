import json
import os

import numpy as np
import pytest

from fractalrenderer_tpu import cli
from fractalrenderer_tpu.scene import FractalType
from fractalrenderer_tpu.utils.png import read_png


def test_render_basic(tmp_path, capsys):
    out = str(tmp_path / "m.png")
    rc = cli.main(["render", "--width", "48", "--height", "24",
                   "--iters", "32", "--out", out])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (24, 48, 3)
    assert "Rendered 48x24 Mandelbrot" in capsys.readouterr().out


def test_render_preset_and_metadata(tmp_path):
    out = str(tmp_path / "sea.png")
    rc = cli.main(["render", "--preset", "Seahorse Valley", "--width", "32",
                   "--height", "16", "--iters", "32", "--out", out,
                   "--bit-depth", "16"])
    assert rc == 0
    raw = open(out, "rb").read()
    assert b"Zoom\x000.008000000" in raw
    assert read_png(out).dtype == np.uint16


def test_render_scene_file_and_overrides(tmp_path):
    sf = tmp_path / "s.json"
    sf.write_text(json.dumps({"fractal_type": "julia", "zoom": 2.0,
                              "max_iterations": 16}))
    out = str(tmp_path / "j.png")
    rc = cli.main(["render", "--scene", str(sf), "--width", "32",
                   "--height", "16", "--julia-preset", "San Marco",
                   "--out", out])
    assert rc == 0
    assert read_png(out).shape == (16, 32, 3)


def test_center_pair_flag(tmp_path):
    # --center X Y is a convenience alias for --center-x/--center-y (and
    # keeps the bare '--center' prefix unambiguous for argparse).
    out = tmp_path / "c.png"
    cli.main(["render", "--type", "mandelbrot", "--center", "-0.7435",
              "0.1318", "--zoom", "0.01", "--iters", "64", "--width", "32",
              "--height", "24", "--out", str(out)])
    assert out.exists()


def test_scene_from_args_mapping():
    args = cli.build_parser().parse_args(
        ["render", "--type", "phoenix", "--phoenix-p", "0.2",
         "--phoenix-r", "-0.3", "--stripes", "--stripe-density", "5",
         "--iters", "77"])
    s = cli.scene_from_args(args)
    assert s.fractal_type == FractalType.PHOENIX
    assert s.phoenix_p == 0.2 and s.phoenix_r == -0.3
    assert s.stripe_enabled and s.stripe_density == 5
    assert s.max_iterations == 77


def test_export_print_cap(tmp_path, capsys):
    rc = cli.main(["export-print", "--width", "20000", "--height", "20000",
                   "--supersample", "--out", str(tmp_path / "x.png")])
    assert rc == 2
    assert "32000" in capsys.readouterr().err


def test_export_print_small(tmp_path):
    out = str(tmp_path / "p.png")
    rc = cli.main(["export-print", "--width", "32", "--height", "16",
                   "--iters", "16", "--out", out])
    assert rc == 0
    img = read_png(out)
    assert img.dtype == np.uint16 and img.shape == (16, 32, 3)
    raw = open(out, "rb").read()
    assert b"pHYs" in raw and b"Print Size (inches)" in raw


def test_animate_zoom(tmp_path):
    out_dir = str(tmp_path / "frames")
    rc = cli.main(["animate", "--zoom-to", "0.5", "--duration", "3",
                   "--fps", "1", "--width", "32", "--height", "16",
                   "--iters", "16", "--out-dir", out_dir])
    assert rc == 0
    files = sorted(os.listdir(out_dir))
    assert files == ["frame_000000.png", "frame_000001.png",
                     "frame_000002.png"]


def test_animate_franim(tmp_path):
    from fractalrenderer_tpu.anim import franim
    from fractalrenderer_tpu.anim.keyframes import Animation, Keyframe
    from fractalrenderer_tpu.scene import Scene

    a = Animation(duration=2.0, target_fps=1, export_width=32,
                  export_height=16)
    a.keyframes.append(Keyframe(0.0, Scene(max_iterations=16, zoom=2.0)))
    a.keyframes.append(Keyframe(2.0, Scene(max_iterations=16, zoom=0.5)))
    fpath = str(tmp_path / "z.franim")
    franim.save(a, fpath)
    out_dir = str(tmp_path / "frames")
    rc = cli.main(["animate", "--franim", fpath, "--out-dir", out_dir])
    assert rc == 0
    assert len(os.listdir(out_dir)) == 2


def test_presets_and_info(capsys):
    assert cli.main(["presets"]) == 0
    out = capsys.readouterr().out
    assert "Seahorse Valley" in out and "Douady's Rabbit" in out
    assert "40x60 @ 300 DPI" in out
    assert cli.main(["info"]) == 0
    out = capsys.readouterr().out
    assert "fractalrenderer_tpu" in out and "backend" in out


def test_encode_without_frames(tmp_path, capsys):
    rc = cli.main(["encode", str(tmp_path), "--out",
                   str(tmp_path / "o.mp4")])
    assert rc == 1


def test_giant_cli(tmp_path):
    out = str(tmp_path / "g.png")
    rc = cli.main(["giant", "--width", "64", "--height", "48",
                   "--band-rows", "16", "--iters", "16", "--out", out,
                   "--bit-depth", "8", "--tile-dir", str(tmp_path / "t")])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (48, 64, 3)


def test_render_dd_cli(tmp_path):
    out = str(tmp_path / "dd.png")
    rc = cli.main(["render", "--width", "32", "--height", "16",
                   "--iters", "24", "--precision", "dd", "--out", out,
                   "--debug"])
    assert rc == 0
    assert read_png(out).shape == (16, 32, 3)


def test_diag_selfcheck_and_validate():
    from fractalrenderer_tpu.utils.diag import (params_layout_selfcheck,
                                                scene_debug_summary,
                                                validate_scene)
    from fractalrenderer_tpu.scene import Scene

    assert params_layout_selfcheck()
    s = validate_scene(Scene(zoom=float("nan"), bailout=0.0,
                             max_iterations=0))
    assert s.zoom == 3.0 and s.bailout == 4.0 and s.max_iterations == 1
    txt = scene_debug_summary(Scene())
    assert "center=" in txt and "iterations=256" in txt


def test_device_seconds_from_trace():
    # Parse the committed config-1 profiler trace: 8 program executions of
    # ~870.85 us each on the 'XLA Modules' device lane.
    import os

    from fractalrenderer_tpu.utils.diag import device_seconds_from_trace
    trace_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "traces", "config1")
    if not os.path.isdir(trace_dir):
        pytest.skip("trace artifact missing")
    total = device_seconds_from_trace(trace_dir)
    assert abs(total - 8 * 870.85e-6) < 1e-5
    ops = device_seconds_from_trace(trace_dir, lane="XLA Ops")
    assert 0 < ops <= total + 1e-6


def test_measure_device_seconds_cpu():
    # The CPU backend also records a device lane ('/device:CPU:0'), so the
    # trace-based timer works in the CI environment end-to-end.
    import jax
    import jax.numpy as jnp

    from fractalrenderer_tpu.utils.diag import measure_device_seconds

    f = jax.jit(lambda x: jnp.sin(x).sum())
    x = jnp.arange(1 << 16, dtype=jnp.float32)
    float(f(x))  # compile outside the trace
    secs = measure_device_seconds(lambda: float(f(x)))
    assert secs > 0


def test_viewer_commands(tmp_path):
    from fractalrenderer_tpu.viewer import Viewer, ansi_render
    from fractalrenderer_tpu.scene import Scene, FractalType

    v = Viewer(Scene(max_iterations=16, zoom=2.5), cols=24, rows=8)
    assert v.handle("+") == ""
    assert v.scene.zoom == pytest.approx(2.0)
    assert v.scene.max_iterations == 512  # auto-iteration ladder
    v.handle("d")
    assert v.scene.center_x > -0.5
    v.handle("tab")
    assert v.scene.fractal_type == FractalType.JULIA
    v.handle("type burning-ship")
    assert v.scene.fractal_type == FractalType.BURNING_SHIP
    v.handle("p 3")
    assert v.scene.palette_mode == 3
    v.handle("preset Seahorse Valley")
    assert v.scene.zoom == 0.008
    msg = v.handle("coords")
    assert "zoom=" in msg
    assert "unknown command" in v.handle("bogus")
    assert v.handle("q") is None
    # frame produces ANSI half blocks with a status line
    v2 = Viewer(Scene(max_iterations=8), cols=16, rows=4)
    out = v2.frame()
    assert "▀" in out and "Mandelbrot" in out
    # save writes a PNG
    import os
    path = str(tmp_path / "shot.png")
    msg = v2.handle(f"save {path}")
    assert "saved" in msg and os.path.exists(path)


def test_sweep_cli(tmp_path):
    out_dir = str(tmp_path / "sw")
    rc = cli.main(["sweep", "--width", "32", "--height", "16",
                   "--iters", "16", "--count", "3", "--out-dir", out_dir])
    assert rc == 0
    assert sorted(os.listdir(out_dir)) == ["sweep_000.png", "sweep_001.png",
                                           "sweep_002.png"]


def test_animate_save_franim(tmp_path):
    fr_path = str(tmp_path / "zoom.franim")
    out_dir = str(tmp_path / "fr")
    rc = cli.main(["animate", "--zoom-to", "1.0", "--duration", "2",
                   "--fps", "1", "--width", "24", "--height", "12",
                   "--iters", "8", "--out-dir", out_dir,
                   "--save-franim", fr_path])
    assert rc == 0 and os.path.exists(fr_path)
    from fractalrenderer_tpu.anim import franim

    a = franim.load(fr_path)
    assert a.export_width == 24 and len(a.keyframes) == 2


def test_zoom_path_cli(tmp_path):
    out_dir = str(tmp_path / "zp")
    rc = cli.main(["zoom-path", "--preset-zoom", "Seahorse", "--frames", "2",
                   "--width", "24", "--height", "12", "--iters", "150",
                   "--out-dir", out_dir])
    assert rc == 0
    assert sorted(os.listdir(out_dir)) == ["frame_000000.png",
                                           "frame_000001.png"]


def test_zoom_path_custom_target(tmp_path):
    # the deep-zoom panel's typed Target X/Y/Zoom + Start Zoom Animation
    # (ui_manager.cpp:701-710): frame 0 is the current view, the last
    # frame is the typed target
    out_dir = str(tmp_path / "zpt")
    rc = cli.main(["zoom-path", "--target-x", "-0.745", "--target-y",
                   "0.113", "--target-zoom", "1e-6", "--frames", "2",
                   "--width", "24", "--height", "12", "--iters", "150",
                   "--out-dir", out_dir])
    assert rc == 0
    assert sorted(os.listdir(out_dir)) == ["frame_000000.png",
                                           "frame_000001.png"]
    # neither preset nor a full target is an error, not a hang
    assert cli.main(["zoom-path", "--target-x", "-0.5", "--frames", "2",
                     "--out-dir", out_dir]) == 2


def test_viewer_parameter_commands():
    # the per-family parameter sliders as session commands: julia c
    # (ui_manager.cpp:1239-1242), phoenix p/r + Julia Set Mode
    # (:1343-1375), and the bulb 3D Parameters panel (:1277-1310)
    from fractalrenderer_tpu.scene import FractalType, Scene
    from fractalrenderer_tpu.viewer import Viewer

    v = Viewer(Scene(max_iterations=8), cols=16, rows=4)
    v.handle("julia -0.42 0.61")
    assert v.scene.fractal_type == FractalType.JULIA
    assert (v.scene.julia_c_real, v.scene.julia_c_imag) == (-0.42, 0.61)
    v.handle("julia San Marco")  # preset names still work
    assert (v.scene.julia_c_real, v.scene.julia_c_imag) == (-0.75, 0.0)

    v.handle("phoenix 0.3 -0.4")
    assert v.scene.fractal_type == FractalType.PHOENIX
    assert (v.scene.phoenix_p, v.scene.phoenix_r) == (0.3, -0.4)
    v.handle("phoenix julia 0.56 -0.5")
    assert v.scene.use_julia_set
    assert (v.scene.julia_c_real, v.scene.julia_c_imag) == (0.56, -0.5)
    v.handle("phoenix julia")  # bare toggles the checkbox
    assert not v.scene.use_julia_set

    v.handle("bulb power 6")
    assert v.scene.fractal_type == FractalType.MANDELBULB
    assert v.scene.mandelbulb_power == 6.0
    v.handle("bulb dist 5.5")
    v.handle("bulb rot 1.25")
    v.handle("bulb fov 1.5")
    assert (v.scene.camera_distance, v.scene.rotation_y,
            v.scene.fov) == (5.5, 1.25, 1.5)
    v.handle("bulb resetcam")  # ui_manager.cpp:1287-1291
    assert (v.scene.camera_distance, v.scene.rotation_y) == (3.0, 0.0)
    assert v.scene.fov == 1.5  # reset touches only distance/rotation
    assert "unknown bulb control" in v.handle("bulb nope 1")


def test_live_spin_speed_command():
    # :spin [SPEED] = the Auto Rotate checkbox + Rotation Speed slider
    # (ui_manager.cpp:1302-1309), applied per frame like
    # vk_engine.cpp:713-714
    from fractalrenderer_tpu.live import LiveSession
    from fractalrenderer_tpu.scene import FractalType, Scene

    sess = LiveSession(Scene(fractal_type=FractalType.MANDELBULB,
                             max_iterations=8), cols=16, rows=4)
    assert not sess.spin and sess.spin_speed == 0.5  # fractal_state.h:68
    sess.command("spin 1.5")
    assert sess.spin and sess.spin_speed == 1.5
    r0 = sess.scene.rotation_y
    sess.tick(now=0.0, dt=0.1)
    assert abs(sess.scene.rotation_y - (r0 + 1.5 * 0.1)) < 1e-6
    sess.command("spin")
    assert not sess.spin
    sess.command("spin 99")  # slider clamps to [0.1, 2.0]
    assert sess.spin_speed == 2.0
    sess.command("spin abc")
    assert "bad spin speed" in sess.message


def test_nonpositive_sizes_are_clean_errors(tmp_path):
    # a zero/negative --width/--height must exit 2 with a message, not
    # die on a kernel-shape TypeError; same for the session export
    # (the reference's panel clamps its inputs, ui_manager.cpp:617-618)
    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.viewer import Viewer

    out = str(tmp_path / "x.png")
    assert cli.main(["render", "--width", "0", "--height", "32",
                     "--out", out]) == 2
    assert cli.main(["export-print", "--width", "-4", "--height", "8",
                     "--out", out]) == 2
    assert cli.main(["giant", "--width", "16", "--height", "0",
                     "--out", out]) == 2
    v = Viewer(Scene(max_iterations=8), cols=8, rows=2)
    assert "bad export size" in v.handle("export 0 0 z.png")
    assert "bad export size" in v.handle("export -4 8 z.png")


def test_viewer_command_fuzz(tmp_path, monkeypatch):
    # the REPL is the reference's safe_invoke surface (ui_manager.h:222-241
    # wraps every UI callback in try/catch): no command line, however
    # malformed, may escape handle() as an exception.  Fuzz the whole
    # vocabulary with junk/extreme args; only 'q' may return None.
    import random

    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.viewer import Viewer

    monkeypatch.chdir(tmp_path)
    rng = random.Random(1234)
    words = ["julia", "phoenix", "bulb", "p", "i", "aa", "spp", "style",
             "trap", "stripes", "enhance", "preset", "type", "key",
             "anim", "scene", "click", "rclick", "w", "a", "s", "d",
             "tab", "+", "-", "e", "r", "coords", "export", "h",
             "spinx", "", "nope"]
    argpool = ["", "0", "1", "-1", "2.5", "-0.7", "1e9", "-1e-9", "inf",
               "nan", "junk", "auto", "julia", "resetcam", "dist", "rot",
               "power", "fov", "add", "list", "del", "clear", "save",
               "load", "seek", "interp", "fps", "dur", "info",
               str(tmp_path / "f.json"), "San Marco", "0.5"]
    v = Viewer(Scene(max_iterations=8), cols=8, rows=2)
    for _ in range(400):
        line = " ".join([rng.choice(words)]
                        + [rng.choice(argpool)
                           for _ in range(rng.randrange(4))])
        out = v.handle(line)
        assert isinstance(out, str), f"{line!r} -> {out!r}"
    # the scene object must still be a usable Scene (frozen dataclass
    # fields intact), whatever state the fuzz drove it into
    assert isinstance(v.scene.max_iterations, int)


def test_viewer_minimap():
    from fractalrenderer_tpu.viewer import Viewer
    from fractalrenderer_tpu.scene import Scene

    v = Viewer(Scene(max_iterations=16, zoom=0.05,
                     center_x=-0.745, center_y=0.113), cols=24, rows=8)
    out = v.handle("minimap")
    assert "▀" in out and "center marker" in out


def test_viewer_screen_y_conventions():
    # The display is the vertical flip of the render (+imag at the top):
    # 'w' must pan toward +imag (up on screen), and a click near the top
    # of the DISPLAYED view must move the center toward +imag.
    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.viewer import Viewer

    v = Viewer(Scene(max_iterations=16, zoom=2.0), cols=24, rows=8)
    y0 = v.scene.center_y
    v.handle("w")
    assert v.scene.center_y > y0
    v = Viewer(Scene(max_iterations=16, zoom=2.0), cols=24, rows=8)
    v.handle("click 12 0")  # top row of the displayed image
    assert v.scene.center_y > 0.0


def test_viewer_keyframe_capture_workflow(tmp_path):
    """The reference's timeline UI semantics (capture keyframe from the
    current view, list, delete, save .franim — ui_manager.cpp:760-1220)
    as REPL commands shared by the REPL and the live ':' line."""
    from fractalrenderer_tpu.anim import franim
    from fractalrenderer_tpu.viewer import Viewer

    v = Viewer()
    assert "no keyframes" in v.handle("key list")
    assert "t=0s" in v.handle("key add")
    v.handle("+")                       # zoom, then capture again
    msg = v.handle("key add")
    assert "keyframe 1" in msg and "t=2s" in msg
    v.handle("key add 5.5")
    lst = v.handle("key list")
    assert lst.count("[") == 3 and "t=5.5s" in lst
    v.handle("key del 2")
    assert v.handle("key list").count("[") == 2
    assert "fps=30" in v.handle("anim fps 30")
    assert "loop on" in v.handle("anim loop")
    assert v._anim().loop
    assert "loop off" in v.handle("anim loop")

    path = str(tmp_path / "session.franim")
    msg = v.handle(f"anim save {path}")
    assert "2 keyframes" in msg
    anim = franim.load(path)
    assert len(anim.keyframes) == 2
    assert anim.target_fps == 30
    # the captured zooms differ (first at 2.5, second after one zoom-in)
    assert anim.keyframes[0].scene.zoom != anim.keyframes[1].scene.zoom

    v2 = Viewer()
    assert "2 keyframes" in v2.handle(f"anim load {path}")
    assert "fps=30" in v2.handle("anim info")


def test_viewer_anim_render_from_session(tmp_path):
    """':anim render DIR [W H]' — the timeline's export button: render
    the captured keyframes to frames, encodable with the built-in
    qtpng codec."""
    from fractalrenderer_tpu.anim import video
    from fractalrenderer_tpu.utils.png import read_png
    from fractalrenderer_tpu.viewer import Viewer

    v = Viewer()
    v.scene = v.scene.with_(max_iterations=24)
    v.handle("key add 0")
    v.handle("+")
    v.handle("key add 0.05")
    v.handle("anim fps 40")
    v.handle("anim dur 0.05")  # 0.05s * 40 fps = 2 frames
    out = str(tmp_path / "fr")
    msg = v.handle(f"anim render {out} 32 16")
    assert "-> " in msg and "2 frames" in msg
    files = sorted(os.listdir(out))
    assert files == ["frame_000000.png", "frame_000001.png"]
    assert read_png(os.path.join(out, files[0])).shape == (16, 32, 3)
    enc = video.VideoEncoder()
    assert enc.encode(out, video.VideoEncodeSettings(
        output_filename=str(tmp_path / "clip.mov"),
        codec=video.VideoCodec.QTPNG, fps=40))


def test_keyframe_update_jump_commands():
    """'key update N' / 'key jump N' — the timeline context menu's
    "Update with current view" / "Jump to this keyframe"
    (ui_manager.cpp:981-993)."""
    from fractalrenderer_tpu.viewer import Viewer

    v = Viewer(cols=24, rows=12)
    v.handle("key add 0")
    v.handle("+")
    v.handle("key add 4")
    z1 = v._anim().keyframes[1].scene.zoom
    v.handle("+")                        # zoom further, then overwrite kf 1
    assert "updated" in v.handle("key update 1")
    assert v._anim().keyframes[1].scene.zoom != z1
    assert v._anim().keyframes[1].time == 4.0   # time preserved
    # jump restores the view of keyframe 0
    assert "jumped" in v.handle("key jump 0")
    assert v.scene.zoom == v._anim().keyframes[0].scene.zoom
    assert "no keyframe 7" in v.handle("key jump 7")
    assert "no keyframe 7" in v.handle("key update 7")


def test_auto_iterations_enhance_and_hp_coords():
    """'i auto' (the slider's Auto button), 'enhance reset' and slider
    sets (ui_manager.cpp:447-451, 517-522), and hp-string 'coords' for
    deep zoom (the Copy Coordinates export)."""
    from fractalrenderer_tpu.viewer import Viewer
    from fractalrenderer_tpu.scene import Scene, FractalType

    v = Viewer(Scene(zoom=1e-5, max_iterations=64), cols=16, rows=8)
    assert "auto" in v.handle("i auto")
    auto_iters = v.scene.max_iterations
    assert auto_iters > 64  # deep view raises the ladder
    assert v.scene.zoom == 1e-5  # unlike the reference's zoom-in/out trick

    v.handle("enhance brightness 1.5")
    v.handle("enhance contrast 0.8")
    assert v.scene.color_brightness == 1.5 and v.scene.color_contrast == 0.8
    assert "unknown" in v.handle("enhance gamma 2")
    assert "reset" in v.handle("enhance reset")
    assert (v.scene.color_brightness, v.scene.color_saturation,
            v.scene.color_contrast) == (1.0, 1.0, 1.0)

    d = Viewer(Scene(fractal_type=FractalType.DEEP_ZOOM,
                     hp_center_x="-0.74364388703715158",
                     hp_center_y="0.13182590420531198",
                     hp_zoom="1e-32"), cols=16, rows=8)
    msg = d.handle("coords")
    assert "-0.74364388703715158" in msg and "1e-32" in msg


def test_viewer_export_command(tmp_path, monkeypatch):
    # the in-app high-res export panel (ui_manager.cpp:590-655) as a
    # session command: 16-bit PNG with metadata; 'ss' supersamples 2x and
    # box-downsamples, matching export-print --supersample --downsample
    import numpy as np

    from fractalrenderer_tpu import models
    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.utils.image import downsample2x
    from fractalrenderer_tpu.utils.png import read_png
    from fractalrenderer_tpu.viewer import Viewer

    monkeypatch.chdir(tmp_path)
    v = Viewer(Scene(max_iterations=16), cols=16, rows=4)
    msg = v.handle("export 48 32 out.png")
    assert "exported" in msg
    img = read_png("out.png")
    assert img.shape == (32, 48, 3) and img.dtype == np.uint16
    ref = np.asarray(models.render(v.scene, 48, 32))[::-1]
    np.testing.assert_array_equal(
        img, (np.clip(ref, 0, 1) * 65535 + 0.5).astype(np.uint16))

    msg = v.handle("export 48 32 ss ss.png")
    assert "exported" in msg
    ref2 = downsample2x(np.asarray(models.render(v.scene, 96, 64)))[::-1]
    np.testing.assert_array_equal(
        read_png("ss.png"),
        (np.clip(ref2, 0, 1) * 65535 + 0.5).astype(np.uint16))

    assert "32000 cap" in v.handle("export 40000 2 x.png")


def test_viewer_effects_commands():
    # the advanced-effects panel sliders (ui_manager.cpp:539-566) and
    # palette offset/scale (ui_manager.cpp:470-515) as session commands
    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.viewer import Viewer

    v = Viewer(Scene(max_iterations=8), cols=16, rows=4)
    v.handle("p 4 0.25 2.0")
    assert (v.scene.palette_mode, v.scene.color_offset,
            v.scene.color_scale) == (4, 0.25, 2.0)
    v.handle("style 2")
    assert v.scene.interior_style == 2
    v.handle("trap 0.75")
    assert v.scene.orbit_trap_enabled and v.scene.orbit_trap_radius == 0.75
    v.handle("trap")
    assert not v.scene.orbit_trap_enabled
    v.handle("stripes 6.5")
    assert v.scene.stripe_enabled and v.scene.stripe_density == 6.5
    v.handle("stripes")
    assert not v.scene.stripe_enabled


def test_render_sharded_flag(tmp_path):
    # `render --sharded` must equal the single-device render exactly for
    # a device family, the bulb, and a deep-zoom scene
    import numpy as np

    from fractalrenderer_tpu.cli import main
    from fractalrenderer_tpu.utils.png import read_png

    for extra, name in (
            (["--type", "julia"], "julia"),
            (["--type", "mandelbulb", "--iters", "12"], "bulb"),
            (["--type", "deep-zoom", "--zoom", "1e-8", "--iters", "200"],
             "deep")):
        a = str(tmp_path / f"{name}_1.png")
        b = str(tmp_path / f"{name}_s.png")
        base = ["render", "--width", "48", "--height", "32",
                "--iters", "24"] + extra
        assert main(base + ["--out", a]) == 0
        assert main(base + ["--sharded", "--out", b]) == 0
        np.testing.assert_array_equal(read_png(a), read_png(b),
                                      err_msg=name)


def test_viewer_anim_encode(tmp_path, monkeypatch):
    # the timeline's one-click "Render & Encode"
    # (ui_manager.cpp:1123-1136) from the session: render frames, then
    # encode with the pure-Python qtpng muxer (no ffmpeg needed)
    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.viewer import Viewer

    monkeypatch.chdir(tmp_path)
    v = Viewer(Scene(max_iterations=8, zoom=2.5), cols=16, rows=4)
    v.handle("key add 0")
    v.handle("+")
    v.handle("key add 1")
    v.handle("anim fps 2")
    v.handle("anim dur 1")
    msg = v.handle("anim render frames 32 16")
    assert "frames" in msg
    msg = v.handle("anim encode frames clip.mov")
    assert "encoded" in msg, msg
    import os
    assert os.path.exists("clip.mov") and os.path.getsize("clip.mov") > 100


def test_viewer_anim_seek():
    # the timeline scrub slider (ui_manager.cpp:838-852): seeking jumps
    # the view to the interpolated state (log-zoom midpoint) w/o playing
    import math

    import pytest as _pytest

    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.viewer import Viewer

    v = Viewer(Scene(max_iterations=8, zoom=4.0), cols=16, rows=4)
    v.handle("key add 0")
    v.scene = v.scene.with_(zoom=1.0)
    v.handle("key add 10")
    assert "t=5" in v.handle("anim seek 5")
    assert v.scene.zoom == _pytest.approx(math.sqrt(4.0 * 1.0))


def test_viewer_key_interp():
    # the per-keyframe interpolation combo: easing is chosen by the
    # SECOND keyframe of a segment (animation_system.cpp:107-122), so
    # switching key 1 to linear changes the midpoint zoom
    import math

    import pytest as _pytest

    from fractalrenderer_tpu.anim.keyframes import InterpolationType
    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.viewer import Viewer

    v = Viewer(Scene(max_iterations=8, zoom=4.0), cols=16, rows=4)
    v.handle("key add 0")
    v.scene = v.scene.with_(zoom=1.0)
    v.handle("key add 10")
    msg = v.handle("key interp 1 linear")
    assert "LINEAR" in msg
    assert v._anim().keyframes[1].interp_type == InterpolationType.LINEAR
    # linear easing at t=2.5 -> log-zoom at raw 0.25
    v.handle("anim seek 2.5")
    assert v.scene.zoom == _pytest.approx(
        math.exp(math.log(4.0) + 0.25 * (math.log(1.0) - math.log(4.0))))
    assert "unknown interpolation" in v.handle("key interp 1 bogus")


def test_cli_cpu_flag(tmp_path):
    # global --cpu forces the CPU backend via the config call (reliable
    # even when a TPU plugin is registered, unlike JAX_PLATFORMS alone)
    import subprocess
    import sys as _sys

    from tests._cpu_env import cpu_subprocess_env

    out = str(tmp_path / "c.png")
    p = subprocess.run(
        [_sys.executable, "-m", "fractalrenderer_tpu.cli", "--cpu",
         "render", "--width", "32", "--height", "16", "--iters", "16",
         "--out", out],
        env=cpu_subprocess_env(), capture_output=True, text=True,
        timeout=240)
    assert p.returncode == 0, p.stderr
    import os
    assert os.path.exists(out)


# ---- first-frame-fast cold start ------------------------------------------

def test_render_preview_cpu_matches_render():
    """The CPU first-frame fallback runs the identical pipeline (interpret
    mode on the local CPU backend) — same image as the device path within
    the fused/unfused float contract."""
    from fractalrenderer_tpu import Scene, models

    s = Scene(max_iterations=32)
    pv = models.render_preview_cpu(s, 48, 24)
    dev = np.asarray(models.render(s, 48, 24))
    assert pv.shape == dev.shape
    np.testing.assert_allclose(pv, dev, atol=1e-5)
    # unsupported families return None (no cheap CPU path)
    s3d = Scene(fractal_type=FractalType.MANDELBULB)
    assert models.render_preview_cpu(s3d, 8, 8) is None


def test_render_cli_first_frame_preview(tmp_path, capsys, monkeypatch):
    """With a slow device compile, `render` serves a correct frame at
    --out within the preview window, then swaps in the device frame."""
    import time as _time

    from fractalrenderer_tpu import models

    monkeypatch.setattr(cli, "_PREVIEW_AFTER_S", 0.1)
    real_render = models.render
    seen = {}

    def slow_render(scene, w, h, **kw):
        _time.sleep(1.5)  # a "cold compile"
        return real_render(scene, w, h, **kw)

    monkeypatch.setattr(models, "render", slow_render)
    out = str(tmp_path / "cold.png")

    # watch the out file from a side thread to prove the preview landed
    # complete BEFORE the device frame
    import threading

    def watcher():
        end = _time.time() + 10
        while _time.time() < end:
            try:
                with open(out, "rb") as fh:
                    fh.seek(-8, 2)
                    if fh.read(8) == b"IEND\xaeB`\x82":
                        seen["t"] = _time.time()
                        return
            except OSError:
                pass
            _time.sleep(0.02)

    t0 = _time.time()
    th = threading.Thread(target=watcher)
    th.start()
    rc = cli.main(["render", "--width", "48", "--height", "24",
                   "--iters", "32", "--out", out])
    th.join()
    assert rc == 0
    assert "first frame ready" in capsys.readouterr().out
    assert seen.get("t", 1e18) - t0 < 1.5  # preview beat the device frame
    assert read_png(out).shape == (24, 48, 3)  # final device frame on disk


def test_render_cli_no_preview_on_fast_device(tmp_path, capsys):
    """A warm device render never triggers the preview path."""
    out = str(tmp_path / "warm.png")
    rc = cli.main(["render", "--width", "32", "--height", "16",
                   "--iters", "16", "--out", out])
    assert rc == 0
    assert "first frame ready" not in capsys.readouterr().out


def test_render_exact_dust_requires_deep_ship(tmp_path, capsys):
    """--exact-dust on a non-ship scene is a clean CLI error, not a
    silently-ignored flag or a raw traceback."""
    rc = cli.main(["render", "--width", "16", "--height", "8",
                   "--exact-dust", "--out", str(tmp_path / "x.png")])
    assert rc == 2
    assert "deep-ship" in capsys.readouterr().err
    rc = cli.main(["render", "--type", "deep-zoom", "--perturbation",
                   "--hp-zoom", "1e-10", "--exact-dust",
                   "--width", "16", "--height", "8",
                   "--out", str(tmp_path / "y.png")])
    assert rc == 2  # deep-zoom but not --deep-ship
