"""Live raw-terminal viewer (live.py): input parsing, continuous-input
semantics vs the reference (src/input_handler.h), and a pty-driven
end-to-end session.
"""
import json
import os
import pty
import select
import subprocess
import sys
import time

import numpy as np
import pytest

from fractalrenderer_tpu import live
from fractalrenderer_tpu.live import LiveSession, compose_frame, parse_input
from fractalrenderer_tpu.scene import FractalType, Scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---- byte-stream parsing -------------------------------------------------

def test_parse_plain_keys():
    ev, rest = parse_input(b"wq e")
    assert ev == [("key", "w"), ("key", "q"), ("key", " "), ("key", "e")]
    assert rest == b""


def test_parse_arrows_and_specials():
    ev, _ = parse_input(b"\x1b[A\x1b[B\x1b[C\x1b[D\t\r\x7f\x03")
    assert ev == [("key", "up"), ("key", "down"), ("key", "right"),
                  ("key", "left"), ("key", "tab"), ("key", "enter"),
                  ("key", "backspace"), ("key", "ctrl-c")]


def test_parse_sgr_mouse():
    ev, _ = parse_input(b"\x1b[<0;10;5M\x1b[<0;10;5m\x1b[<32;11;6M"
                        b"\x1b[<64;2;2M\x1b[<65;2;2M\x1b[<2;7;7M")
    assert ev == [("mouse", 0, 9, 4, "press"),
                  ("mouse", 0, 9, 4, "release"),
                  ("mouse", 0, 10, 5, "motion"),
                  ("mouse", 0, 1, 1, "wheelup"),
                  ("mouse", 1, 1, 1, "wheeldown"),
                  ("mouse", 2, 6, 6, "press")]


def test_parse_split_sequence_resumes():
    ev, rest = parse_input(b"a\x1b[<0;3")
    assert ev == [("key", "a")] and rest == b"\x1b[<0;3"
    ev2, rest2 = parse_input(rest + b";4M")
    assert ev2 == [("mouse", 0, 2, 3, "press")] and rest2 == b""


def test_parse_esc_prefix_vs_key():
    # ESC followed by a non-CSI byte is the Esc key + that byte
    ev, rest = parse_input(b"\x1bq")
    assert ev == [("key", "esc"), ("key", "q")] and rest == b""
    # a lone trailing ESC is deferred (TermUI flushes it on quiet)
    ev, rest = parse_input(b"\x1b")
    assert ev == [] and rest == b"\x1b"


def test_parse_and_handle_fuzz():
    # Hostile terminals: random byte soup must never raise out of
    # parse_input, must always make progress (no infinite remainder
    # growth), and every event it produces must be handled by the
    # session without an exception — the raw-mode analog of the
    # reference's safe_invoke guard around input callbacks.
    import random

    rng = random.Random(99)
    sess = LiveSession(Scene(zoom=2.0, max_iterations=8), cols=16, rows=4)
    # input handling is under test, not the render stack: a random 'S'
    # keypress must not spend seconds on a real screenshot render
    sess.screenshot = lambda: "stubbed shot"
    carry = b""
    now = 0.0
    for _ in range(300):
        chunk = bytes(rng.randrange(256) for _ in range(rng.randrange(24)))
        events, carry = parse_input(carry + chunk)
        assert len(carry) < 64  # a remainder is only a split sequence
        now += 0.01
        for ev in events:
            if ev == ("key", "esc") or ev == ("key", "ctrl-c"):
                continue  # quit keys end a real session; keep fuzzing
            sess.handle_event(ev, now)
        sess.tick(now, 0.01)
    # structured fuzz: syntactically valid SGR reports with extreme
    # coordinates and button bits
    for _ in range(200):
        btn = rng.randrange(256)
        cx, cy = rng.randrange(0, 9999), rng.randrange(0, 9999)
        fin = rng.choice(b"Mm")
        events, rest = parse_input(
            f"\x1b[<{btn};{cx};{cy}{chr(fin)}".encode())
        assert rest == b""
        now += 0.01
        for ev in events:
            sess.handle_event(ev, now)
    assert isinstance(sess.scene.zoom, float)


# ---- continuous-input semantics (input_handler.h:211-248) ---------------

def _sess(**kw):
    return LiveSession(Scene(zoom=2.0, max_iterations=64, **kw),
                       cols=40, rows=10)


def test_pan_speed_is_zoom_proportional():
    s = _sess()
    s.handle_event(("key", "w"), 0.0)
    s.tick(0.01, 0.016)
    dy1 = s.scene.center_y - 0.0
    assert dy1 == pytest.approx(2.0 * 0.016 * 2.0)  # zoom * dt * 2
    # at 10x smaller zoom the same dt pans 10x less
    z = _sess()
    z.scene = z.scene.with_(zoom=0.2)
    z.handle_event(("key", "w"), 0.0)
    z.tick(0.01, 0.016)
    assert (z.scene.center_y - 0.0) == pytest.approx(dy1 / 10)


def test_pan_directions_and_aspect():
    s = _sess()
    aspect = s.width / s.height
    for key, dx_sign, dy_sign in (("a", -1, 0), ("d", 1, 0),
                                  ("left", -1, 0), ("right", 1, 0),
                                  ("w", 0, 1), ("s", 0, -1),
                                  ("up", 0, 1), ("down", 0, -1)):
        t = _sess()
        t.handle_event(("key", key), 0.0)
        t.tick(0.01, 0.02)
        pan = 2.0 * 0.02 * 2.0
        assert t.scene.center_x - (-0.5) == pytest.approx(
            dx_sign * pan * aspect), key
        assert t.scene.center_y == pytest.approx(dy_sign * pan), key


def test_continuous_zoom_dt_scaled_with_iteration_ladder():
    s = _sess()
    s.handle_event(("key", "e"), 0.0)
    s.tick(0.01, 1.0 / 60.0)  # exactly one reference frame
    assert s.scene.zoom == pytest.approx(2.0 * 0.8)
    assert s.scene.max_iterations == 512  # zoom < 10 rung
    s2 = _sess()
    s2.handle_event(("key", "q"), 0.0)
    s2.tick(0.01, 1.0 / 60.0)
    assert s2.scene.zoom == pytest.approx(2.0 * 1.25)


def test_tap_vs_held_windows():
    s = _sess()
    s.handle_event(("key", "e"), 0.0)
    assert s.held["e"] == pytest.approx(live._TAP_S)
    # an autorepeat within the detect window widens the hold
    s.handle_event(("key", "e"), 0.3)
    assert s.held["e"] == pytest.approx(0.3 + live._HOLD_S)
    # key expires after the window with no repeats
    s.tick(5.0, 0.016)
    assert "e" not in s.held


def test_stalled_frame_does_not_teleport():
    s = _sess()
    s.handle_event(("key", "w"), 0.0)
    s.tick(0.01, 3.0)  # a 3-second frame stall
    assert abs(s.scene.center_y) <= 2.0 * 0.25 * 2.0 + 1e-9


# ---- hotkeys (input_handler.h:165-209) ----------------------------------

def test_hotkeys_iterations_palette_type_reset():
    s = _sess()
    s.handle_event(("key", "]"), 0.0)
    assert s.scene.max_iterations == 128
    s.handle_event(("key", "["), 0.0)
    s.handle_event(("key", "["), 0.0)
    assert s.scene.max_iterations == 64  # clamped at 64
    s.handle_event(("key", "4"), 0.0)
    assert s.scene.palette_mode == 3
    s.handle_event(("key", "tab"), 0.0)
    assert s.scene.fractal_type == FractalType.JULIA
    s.handle_event(("key", "r"), 0.0)
    assert s.scene.zoom == 1.5  # reference reset quirk


def test_deep_zoom_preset_hotkeys():
    s = _sess()
    s.handle_event(("key", "x"), 0.0)
    assert s.scene.fractal_type == FractalType.DEEP_ZOOM
    assert float(s.scene.hp_zoom) == pytest.approx(1e-8)
    assert s.scene.max_iterations >= 1024


def test_auto_rotate_toggle_and_spin():
    s = _sess()
    s.handle_event(("key", "tab"), 0.0)  # julia
    s.scene = s.scene.with_(fractal_type=FractalType.MANDELBULB)
    s.handle_event(("key", "o"), 0.0)
    assert s.spin
    r0 = s.scene.rotation_y
    s.tick(0.1, 0.2)
    assert s.scene.rotation_y == pytest.approx(r0 + 0.5 * 0.2)  # speed 0.5
    s.handle_event(("key", "o"), 0.2)
    s.tick(0.3, 0.2)
    assert s.scene.rotation_y == pytest.approx(r0 + 0.1)  # spin off


def test_fullscreen_toggle_changes_render_size():
    s = _sess()
    w0, h0 = s.width, s.height
    s.handle_event(("key", "f"), 0.0)
    assert s.fullscreen and (s.width, s.height) != (w0, h0)
    s.handle_event(("key", "f"), 0.0)
    assert (s.width, s.height) == (w0, h0)


# ---- mouse (input_handler.h:101-163) ------------------------------------

def test_mouse_wheel_zoom_2d_and_bulb_camera():
    s = _sess()
    s.handle_event(("mouse", 0, 5, 5, "wheelup"), 0.0)
    assert s.scene.zoom == pytest.approx(2.0 * 0.8)
    b = _sess()
    b.scene = b.scene.with_(fractal_type=FractalType.MANDELBULB,
                            camera_distance=1.05)
    b.handle_event(("mouse", 0, 5, 5, "wheelup"), 0.0)
    assert b.scene.camera_distance == pytest.approx(1.0)  # clamp [1, 10]


def test_mouse_drag_pans_and_rotates_bulb():
    s = _sess()
    s.handle_event(("mouse", 0, 10, 5, "press"), 0.0)
    s.handle_event(("mouse", 0, 12, 4, "motion"), 0.1)
    aspect = s.width / s.height
    assert s.scene.center_x == pytest.approx(
        -0.5 - 2 / s.width * 2.0 * aspect)
    assert s.scene.center_y == pytest.approx(0.0 + (-2) / s.height * 2.0)
    s.handle_event(("mouse", 0, 12, 4, "release"), 0.2)
    s.handle_event(("mouse", 0, 20, 8, "motion"), 0.3)  # not dragging
    assert s.scene.center_x == pytest.approx(
        -0.5 - 2 / s.width * 2.0 * aspect)
    b = _sess()
    b.scene = b.scene.with_(fractal_type=FractalType.MANDELBULB)
    b.handle_event(("mouse", 0, 10, 5, "press"), 0.0)
    b.handle_event(("mouse", 0, 15, 5, "motion"), 0.1)
    assert b.scene.rotation_y == pytest.approx(5 * 0.01)  # :149


def test_double_click_zooms_in_right_click_out():
    s = _sess()
    z0 = s.scene.zoom
    s.handle_event(("mouse", 0, 10, 5, "press"), 0.0)
    s.handle_event(("mouse", 0, 10, 5, "press"), 0.1)  # double
    assert s.scene.zoom < z0
    r = _sess()
    r.handle_event(("mouse", 2, 10, 5, "press"), 0.0)
    assert r.scene.zoom > 2.0
    # two slow clicks are a drag start, not a double-click
    t = _sess()
    t.handle_event(("mouse", 0, 10, 5, "press"), 0.0)
    t.handle_event(("mouse", 0, 10, 5, "press"), 1.0)
    assert t.scene.zoom == pytest.approx(2.0)


# ---- command line & overlays --------------------------------------------

def test_cmdline_modal_consumes_burst(tmp_path):
    s = _sess()
    path = tmp_path / "live.json"
    for ch in f":scene save {path}\r":
        key = "enter" if ch == "\r" else ch
        s.handle_event(("key", key), 0.0)
    assert s.cmdline is None
    assert path.exists()
    d = json.loads(path.read_text())
    assert d["zoom"] == 2.0
    # none of the burst's 's'/'e'/'c' chars acted as hotkeys
    assert s.scene.fractal_type == FractalType.MANDELBROT
    assert not s.held
    # and load restores
    s.handle_event(("key", "5"), 1.0)
    for ch in f":scene load {path}\r":
        s.handle_event(("key", "enter" if ch == "\r" else ch), 1.0)
    assert s.scene.palette_mode == 0


def test_cmdline_esc_cancels_not_quits():
    s = _sess()
    s.handle_event(("key", ":"), 0.0)
    s.handle_event(("key", "q"), 0.0)
    s.handle_event(("key", "esc"), 0.0)
    assert s.cmdline is None and s.running


def test_compose_frame_overlays():
    s = _sess()
    img = np.zeros((s.height, s.width, 3), np.float32)
    base = compose_frame(s, img)
    assert "\x1b[H" in base and "\x1b[7m" in base
    s.handle_event(("key", "h"), 0.0)
    assert "auto-rotate" in compose_frame(s, img)
    s.handle_event(("key", "h"), 0.0)
    s.handle_event(("key", " "), 0.0)  # status off
    assert "\x1b[7m" not in compose_frame(s, img)
    s.handle_event(("key", ":"), 0.0)
    s.handle_event(("key", "c"), 0.0)
    assert compose_frame(s, img).endswith(":c\x1b[K\x1b[J")


def test_coords_copies_via_osc52():
    """`:coords` puts the coordinate string on the system clipboard via
    OSC 52 (the reference's "Copy Coordinates" SDL_SetClipboardText,
    vk_engine.cpp:1048-1055) — the escape rides the next frame write and
    its base64 payload decodes to exactly the status-line string."""
    import base64

    s = _sess()
    for ch in ":coords\r":
        s.handle_event(("key", "enter" if ch == "\r" else ch), 0.0)
    assert s.message.startswith("center=")
    img = np.zeros((s.height, s.width, 3), np.float32)
    frame = compose_frame(s, img)
    start = frame.index("\x1b]52;c;") + len("\x1b]52;c;")
    end = frame.index("\x1b\\", start)
    decoded = base64.standard_b64decode(frame[start:end]).decode()
    assert decoded == s.message
    # one-shot: the escape does not repeat on the next frame
    assert "\x1b]52;" not in compose_frame(s, img)


def test_quit_keys():
    s = _sess()
    s.handle_event(("key", "esc"), 0.0)
    assert not s.running
    s2 = _sess()
    s2.handle_event(("key", "ctrl-c"), 0.0)
    assert not s2.running


# ---- pty end-to-end ------------------------------------------------------

def test_session_auto_persist_and_resume(tmp_path, monkeypatch):
    """The imgui.ini analog: a live session persists its Scene on exit and
    the next default launch resumes it (cli: default on, --fresh off)."""
    sess_file = tmp_path / "last_session.json"
    monkeypatch.setenv("FRACTAL_TPU_SESSION_FILE", str(sess_file))

    def run(data: bytes, **kw):
        r, w = os.pipe()
        os.write(w, data)
        os.close(w)
        with open(r, "rb", buffering=0) as fin, \
                open(os.devnull, "w") as fout:
            live.run_live(infile=fin, outfile=fout, cols=16, rows=5, **kw)

    run(b"eee\x1b", persist=True)          # zoom in, quit
    saved = json.loads(sess_file.read_text())
    assert saved["zoom"] < Scene().zoom    # the zooms persisted
    # next launch with no explicit view resumes the saved state
    run(b"\x1b", resume_last=True, persist=True, max_frames=1)
    resumed = json.loads(sess_file.read_text())
    assert resumed["zoom"] == saved["zoom"]
    # a missing/corrupt file falls back to the default scene
    sess_file.write_text("{not json")
    assert live.load_last_session() is None


def test_ctrl_c_quits_cleanly_and_persists(tmp_path, monkeypatch):
    """tty.setcbreak keeps ISIG, so ^C raises KeyboardInterrupt inside the
    event loop — run_live must treat it as quit (return 0) and still
    persist the session (the reference writes imgui.ini on any exit)."""
    sess_file = tmp_path / "last.json"
    monkeypatch.setenv("FRACTAL_TPU_SESSION_FILE", str(sess_file))

    calls = {"n": 0}
    orig_poll = live.TermUI.poll

    def poll(self, timeout):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise KeyboardInterrupt
        return orig_poll(self, timeout)

    monkeypatch.setattr(live.TermUI, "poll", poll)
    r, w = os.pipe()
    os.close(w)
    with open(r, "rb", buffering=0) as fin, open(os.devnull, "w") as fout:
        rc = live.run_live(infile=fin, outfile=fout, cols=8, rows=4,
                           persist=True)
    assert rc == 0
    assert json.loads(sess_file.read_text())["zoom"] > 0


def test_live_session_over_pty(tmp_path):
    """Boot the real CLI live loop on a pty, steer it, persist the scene,
    and quit — the reference's interactive session end to end."""
    from _cpu_env import cpu_subprocess_env

    env = cpu_subprocess_env()
    env["PYTHONPATH"] = REPO
    env["FRACTAL_TPU_SESSION_FILE"] = str(tmp_path / "pty_last.json")
    scene_file = tmp_path / "sess.json"
    err_file = tmp_path / "stderr.txt"
    m, sl = pty.openpty()
    with open(err_file, "wb") as ef:
        p = subprocess.Popen(
            [sys.executable, "-m", "fractalrenderer_tpu.cli", "interactive",
             "--live", "--cols", "30", "--rows", "6", "--iters", "32"],
            stdin=sl, stdout=sl, stderr=ef, env=env,
            cwd=str(tmp_path))
    os.close(sl)
    out = b""

    def drain(seconds):
        nonlocal out
        end = time.time() + seconds
        while time.time() < end:
            r, _, _ = select.select([m], [], [], 0.05)
            if r:
                try:
                    out += os.read(m, 65536)
                except OSError:
                    return

    try:
        # first frame (includes the CPU-interpret compile)
        end = time.time() + 120
        while b"\x1b[7m" not in out and time.time() < end:
            drain(0.5)
        def ctx():
            # on a flaky failure, show what the session actually said
            try:
                err = err_file.read_bytes()[-1500:]
            except OSError:
                err = b"<unreadable>"
            return (f"poll={p.poll()!r} out_tail={out[-300:]!r} "
                    f"stderr_tail={err!r}")

        assert b"\x1b[?1049h" in out, ctx()   # alternate screen
        assert b"\x1b[?1006h" in out, ctx()   # SGR mouse reporting
        assert b"\x1b[7m" in out, ctx()       # status bar drawn
        os.write(m, b"e")              # zoom tick
        drain(2.0)
        os.write(m, f":scene save {scene_file}\r".encode())
        end = time.time() + 60
        while not scene_file.exists() and time.time() < end:
            drain(0.5)
        assert scene_file.exists(), ctx()
        os.write(m, b"\x1b")           # quit
        end = time.time() + 30
        while p.poll() is None and time.time() < end:
            drain(0.2)
        if p.poll() is None:
            # under heavy suite load a render/draw turn can outlast the
            # first window; one more Esc is idempotent (a second quit
            # request of an already-exiting session is ignored)
            os.write(m, b"\x1b")
            end = time.time() + 90
            while p.poll() is None and time.time() < end:
                drain(0.2)
        assert p.poll() == 0, ctx()
        end = time.time() + 10         # restore flushes at process exit;
        while b"\x1b[?1049l" not in out and time.time() < end:
            drain(0.2)                 # the pty buffer may lag it briefly
        assert b"\x1b[?1049l" in out, ctx()   # terminal restored
        d = json.loads(scene_file.read_text())
        assert d["zoom"] < 2.5, ctx()  # the 'e' zoomed in
    finally:
        if p.poll() is None:
            p.kill()
        os.close(m)


def test_deep_zoom_dispatch_reuses_orbit_cache():
    """Live deep-zoom sessions keep one orbit cache: zooming about the
    same center reuses the reference orbit instead of recomputing the HP
    loop every frame."""
    # max_iterations already at the ladder value, so a zoom step keeps
    # the same orbit requirements (a raised cap would legitimately need
    # a longer orbit)
    s = LiveSession(Scene(fractal_type=FractalType.DEEP_ZOOM,
                          hp_center_x="-0.74364388703715158",
                          hp_center_y="0.13182590420531198",
                          hp_zoom="1e-9", max_iterations=2048,
                          use_perturbation=True), cols=8, rows=4)
    img1 = s.dispatch()
    assert img1 is not None and len(s._orbit_cache) == 1
    s.handle_event(("key", "+"), 0.0)   # hp zoom step, same center
    assert s.scene.max_iterations == 2048
    img2 = s.dispatch()
    assert img2 is not None and len(s._orbit_cache) == 1  # orbit reused


def test_parse_wheel_with_modifier_bits():
    """Shift/ctrl-modified wheel events are still wheels, not clicks;
    horizontal wheel is ignored (review finding)."""
    ev, _ = parse_input(b"\x1b[<68;3;3M\x1b[<69;3;3M\x1b[<80;3;3M"
                        b"\x1b[<66;3;3M\x1b[<67;3;3M")
    kinds = [e[4] for e in ev]
    assert kinds == ["wheelup", "wheeldown", "wheelup"]


def test_screenshot_is_uppercase_s(monkeypatch):
    """'S' screenshots; lowercase 's' pans (the reference fires both off
    one key — a quirk we split)."""
    s = _sess()
    called = []
    monkeypatch.setattr(LiveSession, "screenshot",
                        lambda self: called.append(1) or "saved x")
    s.handle_event(("key", "s"), 0.0)
    assert not called and "s" in s.held
    s.handle_event(("key", "S"), 0.0)
    assert called == [1]


def test_deep_zoom_pan_moves_hp_center():
    """Held-key pan on a deep-zoom scene moves the hp camera (a float
    center shift is invisible to the renderer there — review finding)."""
    from fractions import Fraction

    s = LiveSession(Scene(fractal_type=FractalType.DEEP_ZOOM,
                          hp_center_x="-0.5", hp_center_y="0",
                          hp_zoom="1e-20", max_iterations=64,
                          use_perturbation=True), cols=40, rows=10)
    cx0 = Fraction(s.scene.hp_center_x)
    s.handle_event(("key", "d"), 0.0)
    s.tick(0.01, 0.016)
    cx1 = Fraction(s.scene.hp_center_x)
    aspect = s.width / s.height
    expect = Fraction("1e-20") * Fraction(repr(float(0.016 * 2.0 * aspect)))
    assert cx1 - cx0 == expect
    # mouse drag too
    s.handle_event(("mouse", 0, 10, 5, "press"), 1.0)
    s.handle_event(("mouse", 0, 12, 5, "motion"), 1.1)
    assert Fraction(s.scene.hp_center_x) != cx1


def test_anim_playback_in_live_session():
    """':anim play' follows the session timeline (AnimationSystem::play,
    animation_system.cpp:40-80); any keystroke stops it."""
    s = _sess()
    s.command("key add 0")
    s.command("anim play")
    assert not s.playing and "need" in s.message  # 1 keyframe: refuses
    s.handle_event(("key", "e"), 0.0)
    s.tick(0.01, 1 / 60)
    s.held.clear()
    s.command("key add 4")
    s.command("anim play")
    assert s.playing and s.play_t == 0.0
    z0 = s.scene.zoom
    s.tick(0.1, 2.0)  # halfway
    assert s.playing and s.scene.zoom != z0
    zmid = s.scene.zoom
    for _ in range(40):  # dt clamps at 0.25 s; walk past the 5 s end
        s.tick(0.2, 0.25)
    assert not s.playing and "done" in s.message
    assert s.scene.zoom != zmid
    # keystroke stops playback
    s.command("anim play")
    assert s.playing
    s.handle_event(("key", "w"), 1.0)
    assert not s.playing and not s.held


def test_anim_playback_loop_mouse_and_bad_time():
    """Looping timelines wrap (keyframes.Playback semantics), mouse input
    stops playback like a keystroke, and a non-numeric start time is a
    message, not a crash."""
    s = _sess()
    s.command("key add 0")
    s.handle_event(("key", "e"), 0.0)
    s.tick(0.01, 1 / 60)
    s.held.clear()
    s.command("key add 4")
    # non-numeric seek: friendly message, session intact
    s.command("anim play now")
    assert not s.playing and "bad start time" in s.message
    # loop=True wraps instead of freezing at the end
    s.viewer._anim().loop = True
    s.command("anim play")
    for _ in range(40):  # 10 s of 0.25 s ticks over a 5 s timeline
        s.tick(0.2, 0.25)
    assert s.playing  # still looping
    assert 0.0 <= s.play_t <= s.playback.animation.duration
    # mouse input hands control back, and the event is swallowed
    z = s.scene.zoom
    s.handle_event(("mouse", 64, 10, 5, "press"), 1.0)  # wheel up
    assert not s.playing and "stopped" in s.message
    assert s.scene.zoom == z


def test_anim_pause_resume():
    """':anim pause' keeps the clock; bare ':anim play' resumes from it
    (the timeline's play/pause toggle, ui_manager.cpp:817-834)."""
    s = _sess()
    s.command("key add 0")
    s.handle_event(("key", "e"), 0.0)
    s.tick(0.01, 1 / 60)
    s.held.clear()
    s.command("key add 4")
    s.command("anim pause")
    assert "nothing playing" in s.message
    s.command("anim play")
    for _ in range(10):                  # dt clamps; walk the clock to 2 s
        s.tick(0.1, 0.2)
    s.command("anim pause")
    assert not s.playing and "paused at 2.0" in s.message
    t_paused = s.play_t
    z = s.scene.zoom
    s.tick(0.2, 0.5)                     # paused: clock and scene hold
    assert s.play_t == t_paused and s.scene.zoom == z
    assert "paused" in s.status_line()
    s.handle_event(("key", "]"), 1.0)    # hotkeys work while paused
    assert s.playback is not None
    s.command("anim play")
    assert s.playing and "resumed at 2.0" in s.message
    for _ in range(40):  # default 10 s timeline from t=2
        s.tick(0.2, 0.25)
    assert not s.playing and s.playback is None and "done" in s.message


def test_live_first_frame_preview(monkeypatch):
    """A cold device compile blocks the first dispatch for seconds; the
    session draws a CPU-preview frame in the meantime instead of a blank
    screen (the reference shows pixels in ms via prebuilt SPIR-V)."""
    import io
    import time as _time

    real_dispatch = live.LiveSession.dispatch

    def slow_dispatch(self):
        _time.sleep(2.0)  # a "cold compile" inside the first dispatch
        return real_dispatch(self)

    monkeypatch.setattr(live.LiveSession, "dispatch", slow_dispatch)
    r, w = os.pipe()
    out = io.StringIO()
    try:
        with open(r, "rb", buffering=0) as fin:
            live.run_live(Scene(max_iterations=16), infile=fin, outfile=out,
                          cols=90, rows=6, max_frames=1)
    finally:
        os.close(w)
    s = out.getvalue()
    assert "CPU preview" in s          # the fallback frame was drawn
    assert "▀" in s                    # with actual pixels, not just text


def test_live_deep_zoom_descent_to_1e20():
    """Interactive descent PAST the dd threshold: continuous 'e' from
    2e-14 down through 1e-20 — the hp camera steps exactly, the status
    bar shows the precision-tier promotion (DOUBLE→QUAD) as it happens,
    ONE reference orbit per tier serves the whole descent (no per-frame
    HP recompute stalls), and hp drag-pan works at depth."""
    import time as _time
    from fractions import Fraction

    s = Scene(fractal_type=FractalType.DEEP_ZOOM,
              hp_center_x="-0.74364388703715158",
              hp_center_y="0.13182590420531198",
              hp_zoom="2e-14", max_iterations=256, use_perturbation=True)
    sess = LiveSession(s, cols=12, rows=5)
    assert "DOUBLE:64b" in sess.status_line()
    iters0 = sess.scene.max_iterations

    frame_s = []
    now = 0.0
    for step in range(200):
        if Fraction(str(sess.scene.hp_zoom)) <= Fraction(1, 10 ** 20):
            break
        sess.handle_event(("key", "e"), now)
        sess.tick(now + 0.001, 1 / 60)
        t0 = _time.monotonic()
        img = sess.dispatch()
        assert np.isfinite(np.asarray(img)).all()
        frame_s.append(_time.monotonic() - t0)
        now += 0.1
    assert Fraction(str(sess.scene.hp_zoom)) <= Fraction(1, 10 ** 20)
    # tier promoted mid-session (QUAD bits scale with depth, ~194b here)
    assert "QUAD:" in sess.status_line()
    assert sess.scene.max_iterations > iters0  # auto-iteration ladder
    # orbits recompute only on 64-bit precision buckets / ladder rungs,
    # never per frame (the unbucketed formula recomputed every ~3 frames)
    assert len(sess._orbit_cache) <= 6, len(sess._orbit_cache)
    # no per-frame stalls: after the first frame of each tier (compile +
    # orbit), every frame is a cheap cached-kernel dispatch.  5 s bounds
    # a stall on the loaded CI CPU; on TPU these frames are ~10 ms.
    steady = sorted(frame_s)[: len(frame_s) - 2]
    assert max(steady) < 5.0, f"stalls: {sorted(frame_s)[-4:]}"

    # hp drag-pan at 1e-20: press, move, release — the exact-rational
    # camera shifts and the next frame still renders
    cx_before = sess.scene.hp_center_x
    sess.handle_event(("mouse", 0, 4, 2, "press"), now)
    sess.handle_event(("mouse", 32, 6, 3, "motion"), now + 0.05)
    sess.handle_event(("mouse", 0, 6, 3, "release"), now + 0.1)
    assert sess.scene.hp_center_x != cx_before
    assert np.isfinite(np.asarray(sess.dispatch())).all()
