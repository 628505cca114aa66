import json
import math
import os

import numpy as np
import pytest

from fractalrenderer_tpu.anim import franim, video
from fractalrenderer_tpu.anim.keyframes import (Animation, InterpolationType,
                                                Keyframe, Playback,
                                                apply_easing)
from fractalrenderer_tpu.scene import FractalType, Scene


def make_zoom_anim():
    a = Animation(duration=10.0, target_fps=30)
    a.keyframes.append(Keyframe(0.0, Scene(center_x=-0.5, zoom=2.5,
                                           max_iterations=256),
                                InterpolationType.LINEAR))
    a.keyframes.append(Keyframe(10.0, Scene(center_x=-0.74, zoom=0.008,
                                            max_iterations=1024),
                                InterpolationType.LINEAR))
    return a


def test_easing_matches_reference():
    # animation_system.cpp:200-212
    assert apply_easing(0.25, InterpolationType.EASE_IN_OUT) == pytest.approx(
        2 * 0.25 * 0.25)
    assert apply_easing(0.75, InterpolationType.EASE_IN_OUT) == pytest.approx(
        1 - (-2 * 0.75 + 2) ** 2 / 2)
    assert apply_easing(0.5, InterpolationType.EASE_IN) == 0.25
    assert apply_easing(0.5, InterpolationType.EASE_OUT) == 0.75
    assert apply_easing(0.5, InterpolationType.EXPONENTIAL) == 0.25
    assert apply_easing(0.3, InterpolationType.LINEAR) == 0.3


def test_log_zoom_interpolation():
    # animation_system.cpp:131-145
    a = make_zoom_anim()
    s = a.interpolate(5.0)
    want = math.exp(math.log(2.5) + 0.5 * (math.log(0.008) - math.log(2.5)))
    assert s.zoom == pytest.approx(want)
    assert s.center_x == pytest.approx(-0.5 + 0.5 * (-0.74 + 0.5))


def test_stepped_iterations():
    # animation_system.cpp:147-161: buckets at t<0.33 / <0.67 / else
    a = make_zoom_anim()
    assert a.interpolate(1.0).max_iterations == 256
    assert a.interpolate(5.0).max_iterations == 640  # midpoint
    assert a.interpolate(9.0).max_iterations == 1024


def test_palette_switch_at_half():
    a = Animation(duration=2.0)
    a.keyframes.append(Keyframe(0.0, Scene(palette_mode=1),
                                InterpolationType.LINEAR))
    a.keyframes.append(Keyframe(2.0, Scene(palette_mode=4),
                                InterpolationType.LINEAR))
    assert a.interpolate(0.9).palette_mode == 1
    assert a.interpolate(1.1).palette_mode == 4


def test_key1_fields_and_close_keyframes():
    a = Animation(duration=1.0)
    a.keyframes.append(Keyframe(0.0, Scene(bailout=8.0, antialiasing_samples=4,
                                           orbit_trap_enabled=True,
                                           julia_c_real=0.123)))
    a.keyframes.append(Keyframe(1.0, Scene(bailout=2.0)))
    s = a.interpolate(0.7)
    # bailout/AA/orbit trap come from key1 (animation_system.cpp:175-178);
    # julia c inherited from key1 (our deviation, see keyframes.py docstring)
    assert s.bailout == 8.0 and s.antialiasing_samples == 4
    assert s.orbit_trap_enabled and s.julia_c_real == 0.123
    # too-close keyframes return key1 (:96-100)
    b = Animation(duration=1.0)
    b.keyframes.append(Keyframe(0.5, Scene(zoom=1.0)))
    b.keyframes.append(Keyframe(0.5004, Scene(zoom=99.0)))
    assert b.interpolate(0.5002).zoom == 1.0


def test_add_keyframe_sorts_and_extends_duration():
    a = Animation(duration=1.0)
    a.add_keyframe(5.0, Scene())
    a.add_keyframe(2.0, Scene())
    assert [k.time for k in a.keyframes] == [2.0, 5.0]
    assert a.duration == 6.0  # time + 1 (animation_system.cpp:20-22)


def test_playback_loop_and_stop():
    a = make_zoom_anim()
    a.loop = False
    p = Playback(a)
    p.play()
    assert p.playing
    p.update(12.0)
    assert not p.playing and p.current_time == a.duration
    a.loop = True
    p2 = Playback(a)
    p2.play()
    p2.update(12.0)
    assert p2.playing and p2.current_time == pytest.approx(2.0)


def test_franim_roundtrip(tmp_path):
    a = make_zoom_anim()
    a.name = "test"
    a.export_width, a.export_height = 640, 360
    path = str(tmp_path / "a.franim")
    franim.save(a, path)
    b = franim.load(path)
    assert b.name == "test" and b.duration == 10.0
    assert b.export_width == 640
    assert len(b.keyframes) == 2
    assert b.keyframes[1].scene.zoom == pytest.approx(0.008)
    assert b.keyframes[1].scene.max_iterations == 1024
    # file contains the reference's exact field names
    d = json.loads(open(path).read())
    kf = d["keyframes"][0]
    for f in ("center_x", "center_y", "zoom", "max_iterations",
              "palette_mode", "color_offset", "color_scale", "time",
              "interp_type", "bailout", "antialiasing_samples",
              "orbit_trap_enabled", "orbit_trap_radius"):
        assert f in kf, f


def test_franim_malformed_inputs_raise_valueerror(tmp_path):
    # structurally wrong .franim data must be ValueError (the session's
    # error guard, matching the reference's try/catch around its
    # nlohmann parse, animation_system.cpp:272-313) — never an
    # AttributeError escaping from inside the loader
    for bad in ('{"keyframes": "x"}', "[1, 2, 3]", '"str"',
                '{"keyframes": [{"zoom": "abc", "time": 0}]}',
                '{"keyframes": [{"time": 0, "extra": 7}]}',
                '{"keyframes": [{"zoom": 1.0}]}',        # missing time
                '{"keyframes": [{"time": 0, "extra": '
                '{"fractal_type": "nope"}}]}'):
        p = tmp_path / "bad.franim"
        p.write_text(bad)
        with pytest.raises(ValueError):
            franim.load(str(p))
    # well-formed minimal file still loads
    p = tmp_path / "ok.franim"
    p.write_text('{"keyframes": [{"time": 0.0, "zoom": 2.0},'
                 ' {"time": 1.0, "zoom": 1.0}]}')
    a = franim.load(str(p))
    assert len(a.keyframes) == 2 and a.keyframes[0].scene.zoom == 2.0


def test_franim_loads_reference_sample():
    # The sample shipped at the reference repo root (6 keyframes, 20 s,
    # 2560x1440 @ 120 fps)
    path = "/root/reference/FractalRenderer/.franim"
    if not os.path.exists(path):
        pytest.skip("reference sample not available")
    a = franim.load(path)
    assert a.duration == 20.0
    assert a.target_fps == 120
    assert (a.export_width, a.export_height) == (2560, 1440)
    assert len(a.keyframes) == 6
    s = a.interpolate(2.5)
    assert 0.008 < s.zoom < 2.5
    assert a.total_frames == 2400


def test_render_animation_frames_cpu():
    from fractalrenderer_tpu.anim.renderer import render_animation_frames

    a = make_zoom_anim()
    a.export_width, a.export_height = 48, 24
    a.target_fps = 1  # 10 frames
    out = render_animation_frames(a, frames=[0, 5, 9])
    assert out.shape == (3, 24, 48, 3)
    assert np.isfinite(out).all()
    # zooming in changes the image
    assert np.abs(out[0] - out[2]).max() > 0.05


def test_animation_renderer_writes_pngs(tmp_path):
    from fractalrenderer_tpu.anim.renderer import (AnimationRenderer,
                                                   RenderStatus)
    from fractalrenderer_tpu.utils.png import read_png

    a = make_zoom_anim()
    a.duration, a.target_fps = 4.0, 1  # 4 frames
    a.export_width, a.export_height = 48, 24
    r = AnimationRenderer(batch_size=3)
    seen = []
    r.on_frame_complete = lambda f, total: seen.append(f)
    ok = r.start_render(a, str(tmp_path))
    assert ok and r.progress.status == RenderStatus.COMPLETE
    assert sorted(seen) == [0, 1, 2, 3]
    img = read_png(str(tmp_path / "frame_000000.png"))
    assert img.shape == (24, 48, 3)


def test_animation_renderer_needs_two_keyframes(tmp_path):
    from fractalrenderer_tpu.anim.renderer import AnimationRenderer

    a = Animation()
    a.keyframes.append(Keyframe(0.0, Scene()))
    errs = []
    r = AnimationRenderer()
    r.on_render_error = errs.append
    assert not r.start_render(a, str(tmp_path))
    assert errs and "2 keyframes" in errs[0]


def test_ffmpeg_command_matrix():
    # video_encoder.cpp:82-224
    s = video.VideoEncodeSettings(output_filename="out.mp4",
                                  codec=video.VideoCodec.H264,
                                  quality=video.VideoQuality.HIGH, crf=20,
                                  fps=30)
    cmd = video.build_ffmpeg_command("frames", s)
    assert cmd[:5] == ["ffmpeg", "-y", "-framerate", "30", "-i"]
    assert cmd[5].endswith("frame_%06d.png")
    assert ["-c:v", "libx264"] == cmd[6:8]
    assert "-crf" in cmd and cmd[cmd.index("-crf") + 1] == "20"
    assert "yuv420p" in cmd
    # progress/loglevel flags must precede the output file or ffmpeg
    # ignores them (reference bug video_encoder.cpp:218-222, fixed here)
    assert cmd[-5:] == ["-progress", "pipe:1", "-loglevel", "warning",
                        "out.mp4"]

    s.codec, s.quality = video.VideoCodec.VP9, video.VideoQuality.LOSSLESS
    cmd = video.build_ffmpeg_command("frames", s)
    assert "libvpx-vp9" in cmd and "-lossless" in cmd and "-row-mt" in cmd

    s.codec, s.quality = video.VideoCodec.PRORES, video.VideoQuality.DRAFT
    cmd = video.build_ffmpeg_command("frames", s)
    assert "prores_ks" in cmd and "yuv422p10le" in cmd

    s.codec, s.quality = video.VideoCodec.AV1, video.VideoQuality.GOOD
    cmd = video.build_ffmpeg_command("frames", s)
    assert "libaom-av1" in cmd and "-cpu-used" in cmd

    s.codec, s.quality = video.VideoCodec.H265, video.VideoQuality.LOSSLESS
    cmd = video.build_ffmpeg_command("frames", s)
    assert "libx265" in cmd and "lossless=1" in cmd


def test_encoder_graceful_without_frames(tmp_path):
    enc = video.VideoEncoder()
    s = video.VideoEncodeSettings(output_filename=str(tmp_path / "o.mp4"))
    ok = enc.encode(str(tmp_path), s)
    assert not ok
    assert enc.progress.finished
    assert ("No frames" in enc.progress.error
            or "FFmpeg not found" in enc.progress.error)


def test_palette_switch_splits_groups(tmp_path):
    # A mid-timeline palette change recompiles once per group, not per frame
    from fractalrenderer_tpu.anim.renderer import AnimationRenderer
    from fractalrenderer_tpu.utils.png import read_png

    a = Animation(duration=4.0, target_fps=1, export_width=32,
                  export_height=16)
    a.keyframes.append(Keyframe(0.0, Scene(max_iterations=16, palette_mode=0),
                                InterpolationType.LINEAR))
    a.keyframes.append(Keyframe(4.0, Scene(max_iterations=16, palette_mode=3),
                                InterpolationType.LINEAR))
    r = AnimationRenderer(batch_size=4)
    assert r.start_render(a, str(tmp_path))
    first = read_png(str(tmp_path / "frame_000000.png"))
    last = read_png(str(tmp_path / "frame_000003.png"))
    # palette switch at t=0.5 -> visibly different colors
    assert np.abs(first.astype(int) - last.astype(int)).max() > 20


def test_mandelbulb_animation_fallback(tmp_path):
    from fractalrenderer_tpu.anim.renderer import AnimationRenderer

    a = Animation(duration=2.0, target_fps=1, export_width=24,
                  export_height=12)
    a.keyframes.append(Keyframe(0.0, Scene(
        fractal_type=FractalType.MANDELBULB, max_iterations=8,
        rotation_y=0.0)))
    a.keyframes.append(Keyframe(2.0, Scene(
        fractal_type=FractalType.MANDELBULB, max_iterations=8,
        rotation_y=1.0)))
    r = AnimationRenderer()
    assert r.start_render(a, str(tmp_path))
    assert len(os.listdir(tmp_path)) == 2


def test_mixed_family_animation_routes_per_frame(tmp_path):
    # A .franim may change fractal_type across keyframes; a mixed sequence
    # must take the per-frame path rather than crash in the 2D batcher.
    from fractalrenderer_tpu.anim.renderer import AnimationRenderer

    a = Animation(duration=0.2, target_fps=10, export_width=24,
                  export_height=16)
    a.keyframes.append(Keyframe(0.0, Scene(fractal_type=FractalType.MANDELBROT,
                                           max_iterations=32),
                                InterpolationType.LINEAR))
    a.keyframes.append(Keyframe(0.2, Scene(fractal_type=FractalType.MANDELBULB,
                                           max_iterations=16),
                                InterpolationType.LINEAR))
    r = AnimationRenderer()
    out = tmp_path / "mixed"
    assert r.start_render(a, str(out))
    files = sorted(os.listdir(out))
    assert len(files) == a.total_frames


# ---------------------------------------------------------------------------
# end-to-end VideoEncoder.encode against a fake ffmpeg binary
# (the image ships no ffmpeg; this exercises spawn, -progress pipe:1
# parsing, audio mux args, exit codes, and frame cleanup —
# video_encoder.cpp:360-487)
# ---------------------------------------------------------------------------

_FAKE_FFMPEG = r'''#!/usr/bin/env python3
import os, sys, time
args = sys.argv[1:]
# minimal arg validation: input pattern, -progress pipe:1 before output
assert "-i" in args, args
pattern = args[args.index("-i") + 1]
assert pattern.endswith("frame_%06d.png"), pattern
assert "-progress" in args and args[args.index("-progress") + 1] == "pipe:1"
out = args[-1]
assert not out.startswith("-"), f"output must be last: {args}"
if os.environ.get("FAKE_FFMPEG_FAIL"):
    sys.stderr.write("boom\n")
    sys.exit(1)
folder = os.path.dirname(pattern)
frames = sorted(f for f in os.listdir(folder) if f.startswith("frame_"))
for k in range(len(frames)):
    sys.stdout.write(f"frame={k + 1}\nfps={42.5}\nprogress=continue\n")
    sys.stdout.flush()
sys.stdout.write("progress=end\n")
with open(out, "wb") as fh:
    fh.write(b"\x00\x00\x00\x18ftypmp42fake")
sys.exit(0)
'''


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "ffmpeg"
    exe.write_text(_FAKE_FFMPEG)
    exe.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ.get('PATH', '')}")
    return exe


def _write_frames(folder, n=5):
    os.makedirs(folder, exist_ok=True)
    for k in range(n):
        with open(os.path.join(folder, f"frame_{k:06d}.png"), "wb") as fh:
            fh.write(b"\x89PNG fake")


def test_video_encoder_end_to_end(fake_ffmpeg, tmp_path):
    frames = str(tmp_path / "frames")
    _write_frames(frames, 5)
    out = str(tmp_path / "out.mp4")
    enc = video.VideoEncoder()
    seen = []
    enc.on_progress = lambda p: seen.append((p.current_frame, p.fps))
    ok = enc.encode(frames, video.VideoEncodeSettings(output_filename=out))
    assert ok and enc.progress.success and enc.progress.finished
    assert os.path.exists(out)
    # progress lines were parsed live, not ignored (reference bug put
    # -progress after the output file and never saw them)
    assert enc.progress.current_frame == 5
    assert enc.progress.fps == pytest.approx(42.5)
    assert enc.progress.progress == pytest.approx(1.0)
    assert any(f == 3 for f, _ in seen)
    # frames kept by default
    assert len(os.listdir(frames)) == 5


def test_video_encoder_cleanup_and_failure(fake_ffmpeg, tmp_path,
                                           monkeypatch):
    frames = str(tmp_path / "frames")
    _write_frames(frames, 3)
    out = str(tmp_path / "v.mp4")
    enc = video.VideoEncoder()
    ok = enc.encode(frames, video.VideoEncodeSettings(
        output_filename=out, cleanup_frames=True,
        codec=video.VideoCodec.VP9, quality=video.VideoQuality.DRAFT))
    assert ok
    assert os.listdir(frames) == []  # video_encoder.cpp:323-331

    _write_frames(frames, 3)
    monkeypatch.setenv("FAKE_FFMPEG_FAIL", "1")
    enc2 = video.VideoEncoder()
    ok2 = enc2.encode(frames, video.VideoEncodeSettings(
        output_filename=str(tmp_path / "v2.mp4")))
    assert not ok2 and not enc2.progress.success
    assert "exited with code 1" in enc2.progress.error
    assert len(os.listdir(frames)) == 3  # no cleanup on failure


def test_deep_zoom_animation_shares_reference_orbit(tmp_path):
    # A deep-zoom .franim sequence computes ONE reference orbit (at the
    # deepest frame's center) for the whole render, not one per frame.
    from fractalrenderer_tpu.anim.renderer import AnimationRenderer
    from fractalrenderer_tpu.models import deep_zoom

    a = Animation(duration=0.3, target_fps=10, export_width=24,
                  export_height=16)
    a.keyframes.append(Keyframe(0.0, Scene(
        fractal_type=FractalType.DEEP_ZOOM, center_x=-0.7436438870371,
        center_y=0.1318259042053, zoom=1e-5, max_iterations=300),
        InterpolationType.LINEAR))
    a.keyframes.append(Keyframe(0.3, Scene(
        fractal_type=FractalType.DEEP_ZOOM, center_x=-0.74364388703715,
        center_y=0.13182590420531, zoom=1e-8, max_iterations=300),
        InterpolationType.LINEAR))

    calls = []
    orig = deep_zoom.orbit_mod.compute_orbit

    def counting(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    deep_zoom.orbit_mod.compute_orbit = counting
    try:
        r = AnimationRenderer()
        assert r.start_render(a, str(tmp_path / "dz"))
    finally:
        deep_zoom.orbit_mod.compute_orbit = orig
    assert len(calls) <= 2, f"{len(calls)} orbit computations"
    assert len(os.listdir(tmp_path / "dz")) == a.total_frames


def test_animation_resume_skips_complete_frames(tmp_path):
    # Interrupted sequence renders resume: complete frames are skipped,
    # missing AND truncated ones re-render (the reference restarts from
    # frame zero, animation_renderer.cpp:75).
    import os

    from fractalrenderer_tpu.anim.renderer import AnimationRenderer
    from fractalrenderer_tpu.anim.keyframes import Animation, Keyframe
    from fractalrenderer_tpu.scene import Scene

    a = Animation(duration=4.0, target_fps=1, export_width=32,
                  export_height=16)
    a.keyframes.append(Keyframe(0.0, Scene(max_iterations=16, zoom=2.0)))
    a.keyframes.append(Keyframe(4.0, Scene(max_iterations=16, zoom=0.5)))
    out = str(tmp_path / "frames")
    r = AnimationRenderer(batch_size=2)
    assert r.start_render(a, out)
    total = a.total_frames
    paths = [os.path.join(out, f"frame_{f:06d}.png") for f in range(total)]
    originals = [open(q, "rb").read() for q in paths]

    # corrupt frame 1 (truncate) and delete frame 2
    with open(paths[1], "wb") as f:
        f.write(originals[1][:20])
    os.remove(paths[2])
    mtime0 = os.path.getmtime(paths[0])

    rendered = []
    r2 = AnimationRenderer(batch_size=2)
    r2.on_frame_complete = lambda f, t: rendered.append(f)
    assert r2.start_render(a, out, resume=True)
    assert set(rendered) == {1, 2}  # only the broken frames re-rendered
    assert os.path.getmtime(paths[0]) == mtime0  # untouched
    for q, orig in zip(paths, originals):
        assert open(q, "rb").read() == orig  # bit-identical results


def test_interpolate_hp_fields_move_per_frame():
    # Deep-zoom scenes carry hp_* strings that the renderer PREFERS over
    # the f64 fields; interpolation must move them per frame (centers as
    # exact rationals, zoom in log space), not inherit key1's verbatim.
    from fractions import Fraction

    from fractalrenderer_tpu.anim.keyframes import (Animation,
                                                    InterpolationType,
                                                    Keyframe)
    from fractalrenderer_tpu.scene import FractalType, Scene

    s1 = Scene(fractal_type=FractalType.DEEP_ZOOM, hp_center_x="-0.75",
               hp_center_y="0.1", hp_zoom="1e-8", max_iterations=500)
    s2 = s1.with_(hp_center_x="-0.7500000000000001", hp_zoom="1e-12")
    a = Animation(duration=2.0, target_fps=1)
    a.keyframes.append(Keyframe(0.0, s1, InterpolationType.LINEAR))
    a.keyframes.append(Keyframe(2.0, s2, InterpolationType.LINEAR))

    mid = a.interpolate(1.0)
    assert mid.hp_zoom not in (s1.hp_zoom, s2.hp_zoom)
    # log-space midpoint of 1e-8..1e-12 is 1e-10 (to f64 relative precision)
    zt = float(Fraction(mid.hp_zoom))
    assert abs(zt - 1e-10) / 1e-10 < 1e-12
    # center lerp is exact-rational: midpoint of the 1-ulp move
    cx = Fraction(mid.hp_center_x)
    assert cx == (Fraction("-0.75") + Fraction("-0.7500000000000001")) / 2
    # endpoints reproduce the keyframes
    assert float(Fraction(a.interpolate(0.0).hp_zoom)) == 1e-8
    assert abs(float(Fraction(a.interpolate(2.0).hp_zoom)) - 1e-12) < 1e-27


def test_interpolate_clamps_outside_keyframe_span():
    # Keyframes that don't span [0, duration]: times before the first hold
    # the first scene, times after the last hold the last (no eased-t
    # extrapolation, which is non-monotonic outside [0,1]).
    from fractalrenderer_tpu.anim.keyframes import (Animation,
                                                    InterpolationType,
                                                    Keyframe)
    from fractalrenderer_tpu.scene import Scene

    a = Animation(duration=10.0, target_fps=1)
    a.keyframes.append(Keyframe(5.0, Scene(zoom=2.0, center_x=-1.0),
                                InterpolationType.EASE_IN_OUT))
    a.keyframes.append(Keyframe(8.0, Scene(zoom=0.5, center_x=0.5),
                                InterpolationType.EASE_IN_OUT))
    before = a.interpolate(0.0)
    assert before.zoom == 2.0 and before.center_x == -1.0
    after = a.interpolate(10.0)
    assert after.zoom == 0.5 and after.center_x == 0.5


def test_franim_roundtrip_preserves_hp_fields(tmp_path):
    # .franim must carry the deep-zoom hp strings — they are the
    # authoritative view past f64 precision.
    from fractalrenderer_tpu.anim import franim
    from fractalrenderer_tpu.anim.keyframes import Animation, Keyframe
    from fractalrenderer_tpu.scene import FractalType, Scene

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x="-0.743643887037151001882355212130",
              hp_center_y="0.131825904205311970493132056385",
              hp_zoom="1e-25", max_iterations=5000)
    a = Animation(duration=1.0, target_fps=1)
    a.keyframes.append(Keyframe(0.0, s))
    a.keyframes.append(Keyframe(1.0, s.with_(hp_zoom="1e-26")))
    path = str(tmp_path / "deep.franim")
    franim.save(a, path)
    b = franim.load(path)
    r = b.keyframes[0].scene
    assert r.hp_center_x == s.hp_center_x
    assert r.hp_center_y == s.hp_center_y
    assert r.hp_zoom == "1e-25" and r.use_perturbation
    assert b.keyframes[1].scene.hp_zoom == "1e-26"


def test_batch_render_fn_quantize_matches_host():
    """compiled_batch_render_fn(quantize=8/16) must produce exactly the
    bytes utils.png._prepare_rows derives from the f32 batch — frames
    quantized on device write byte-identical PNGs."""
    from fractalrenderer_tpu.models import common
    from fractalrenderer_tpu.scene import Scene

    s = Scene(max_iterations=48)
    cfg = common.scene_static_cfg(s, 32, 24, "mandelbrot", "pixel", False)
    dyn = common.scene_dyn_params(s)
    batch = {k: np.asarray([v, v], np.float32) for k, v in dyn.items()}
    f32 = np.asarray(common.compiled_batch_render_fn(cfg)(batch))
    for depth, dt, scale in ((8, np.uint8, 255.0), (16, np.uint16, 65535.0)):
        q = np.asarray(common.compiled_batch_render_fn(
            cfg, quantize=depth)(batch))
        assert q.dtype == dt
        ref = (np.clip(f32, 0.0, 1.0) * scale + 0.5).astype(dt)
        np.testing.assert_array_equal(q, ref)
        # planar export: same bytes, (B, 3, H, W) layout (the animate
        # batch path moveaxis-es on host)
        assert common.planar_export_ok(cfg)
        qp = np.asarray(common.compiled_batch_render_fn(
            cfg, quantize=depth, planar=True)(batch))
        assert qp.shape == (2, 3, 24, 32) and qp.dtype == dt
        np.testing.assert_array_equal(np.moveaxis(qp, 1, 3), ref)


def test_planar_export_eligibility_and_band_fn():
    """planar_quantize is refused off the fused single-sample path and
    matches the interleaved quantized render where allowed."""
    import pytest

    from fractalrenderer_tpu.models import common
    from fractalrenderer_tpu.scene import Scene

    trap = Scene(max_iterations=32, orbit_trap_enabled=True)
    cfg_trap = common.scene_static_cfg(trap, 16, 8, "mandelbrot", "pixel",
                                       False)
    assert not common.planar_export_ok(cfg_trap)
    with pytest.raises(ValueError):
        common.band_render_fn(cfg_trap, 8, 8, planar_quantize=8)
    with pytest.raises(ValueError):
        common.compiled_batch_render_fn(cfg_trap, quantize=8, planar=True)
    aa = Scene(max_iterations=32, antialiasing_samples=2)
    cfg_aa = common.scene_static_cfg(aa, 16, 8, "mandelbrot", "pixel",
                                     False)
    assert not common.planar_export_ok(cfg_aa)

    s = Scene(max_iterations=32)
    cfg = common.scene_static_cfg(s, 16, 8, "mandelbrot", "pixel", False)
    dyn = {k: np.float32(v) for k, v in common.scene_dyn_params(s).items()}
    import jax.numpy as jnp

    f32 = np.asarray(common.compiled_render_fn(cfg)(dyn))
    planes = np.asarray(common.band_render_fn(
        cfg, 8, 8, planar_quantize=16)(dyn, jnp.float32(0.0)))
    ref = (np.clip(f32, 0.0, 1.0) * 65535.0 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(np.moveaxis(planes, 0, 2), ref)


def test_per_frame_animation_quantizes_like_f32(tmp_path):
    """The per-frame animation path (deep-zoom/bulb .franim sequences)
    writes the same PNG bytes whether frames quantize on device or the
    writer quantizes host f32."""
    from fractalrenderer_tpu import models
    from fractalrenderer_tpu.anim.keyframes import Animation, Keyframe
    from fractalrenderer_tpu.anim.renderer import AnimationRenderer
    from fractalrenderer_tpu.scene import FractalType, Scene
    from fractalrenderer_tpu.utils.image import to_export_orientation
    from fractalrenderer_tpu.utils.png import read_png, write_png

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x="-0.743643887037151",
              hp_center_y="0.13182590420533",
              hp_zoom="1e-8", max_iterations=200)
    a = Animation(duration=1.0, target_fps=2)
    a.keyframes.append(Keyframe(0.0, s))
    a.keyframes.append(Keyframe(1.0, s.with_(hp_zoom="5e-9")))
    out = str(tmp_path / "frames")
    r = AnimationRenderer()
    assert r.start_render(a, out, 20, 12)
    got = read_png(os.path.join(out, "frame_000000.png"))
    ref_f32 = np.asarray(models.render(s, 20, 12))
    ref_path = str(tmp_path / "ref.png")
    write_png(ref_path, to_export_orientation(ref_f32), bit_depth=8)
    np.testing.assert_array_equal(got, read_png(ref_path))
