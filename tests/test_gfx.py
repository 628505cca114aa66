"""Pixel-frame graphics backends (gfx.py) + the live session's gfx path —
the in-band replacement for the reference's 1700×900 SDL window
(src/vk_engine.cpp:630-733, src/vk_engine.h:74)."""
import base64
import io
import os
import pty
import re
import struct
import tty

import numpy as np

from fractalrenderer_tpu import Scene, gfx, live
from fractalrenderer_tpu.live import LiveSession, compose_frame


def _kitty_payload(out: str) -> bytes:
    """Reassemble the base64 payload of the first kitty image in ``out``."""
    parts = re.findall(r"\x1b_G([^;\x1b]*);([^\x1b]*)\x1b\\", out)
    payload = ""
    started = False
    for ctrl, data in parts:
        keys = dict(kv.split("=") for kv in ctrl.split(",") if "=" in kv)
        if keys.get("a") == "T":
            started = True
            payload = data
            if keys.get("m", "0") == "0":
                break
        elif started:
            payload += data
            if keys.get("m") == "0":
                break
    assert started, f"no kitty transmit found in {out[:200]!r}"
    return base64.standard_b64decode(payload)


def _png_dims(png: bytes):
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    return struct.unpack(">II", png[16:24])


# ---- emit_frame ------------------------------------------------------------

def test_kitty_emit_chunking_round_trips():
    info = gfx.GfxInfo("kitty", None)
    blob = os.urandom(9000)  # b64 ≈ 12000 > 2 chunks
    out = gfx.emit_frame(info, blob, cols=80, rows=24)
    assert out.startswith("\x1b_G")
    # first escape carries the control data incl. PNG format + placement
    head = out[: out.index(";")]
    for want in ("a=T", "f=100", "q=2", "z=-1", "c=80", "r=24", "m=1"):
        assert want in head, head
    assert _kitty_payload(out) == blob
    # small payload: single unchunked escape
    small = gfx.emit_frame(info, b"x" * 10, cols=2, rows=2)
    assert small.count("\x1b_G") == 1 and "m=" not in small.split(";")[0]


def test_iterm_emit():
    info = gfx.GfxInfo("iterm", None)
    blob = b"png-bytes-here"
    out = gfx.emit_frame(info, blob, cols=10, rows=5)
    assert out.startswith("\x1b]1337;File=inline=1")
    assert f"size={len(blob)}" in out and "width=10" in out
    assert out.endswith("\x07")
    assert base64.standard_b64decode(out.split(":")[-1][:-1]) == blob


# ---- detection -------------------------------------------------------------

def test_detect_forced_and_off(monkeypatch):
    assert gfx.detect(None, None, force="kitty").kind == "kitty"
    assert gfx.detect(None, None, force="iterm").kind == "iterm"
    assert gfx.detect(None, None, force="off") is None
    monkeypatch.setenv("FRACTAL_TPU_GFX", "kitty")
    assert gfx.detect(None, None).kind == "kitty"
    monkeypatch.setenv("FRACTAL_TPU_GFX", "off")
    assert gfx.detect(None, None) is None


def test_detect_iterm_env(monkeypatch):
    monkeypatch.delenv("FRACTAL_TPU_GFX", raising=False)
    monkeypatch.setenv("TERM_PROGRAM", "iTerm.app")
    assert gfx.detect(io.BytesIO(), io.StringIO()).kind == "iterm"


def test_detect_non_tty_returns_none(monkeypatch):
    """Pipes (tests, scripts) never handshake — fallback unchanged."""
    monkeypatch.delenv("FRACTAL_TPU_GFX", raising=False)
    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    monkeypatch.delenv("LC_TERMINAL", raising=False)
    r, w = os.pipe()
    try:
        with open(r, "rb", buffering=0) as fin:
            assert gfx.detect(fin, io.StringIO()) is None
    finally:
        os.close(w)


def test_detect_handshake_on_pty(monkeypatch):
    """A terminal answering the kitty query before DA1 is detected, and
    the CSI 14 t pixel report sets the render size."""
    monkeypatch.delenv("FRACTAL_TPU_GFX", raising=False)
    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    monkeypatch.delenv("LC_TERMINAL", raising=False)
    m, sl = pty.openpty()
    tty.setraw(sl)
    try:
        # pre-load the terminal's answers (readable on the slave side)
        os.write(m, b"\x1b_Gi=31;OK\x1b\\\x1b[4;320;640t\x1b[?62;c")
        with open(sl, "rb", buffering=0, closefd=False) as fin, \
                open(sl, "w", closefd=False) as fout:
            info = gfx.detect(fin, fout, timeout=2.0)
        assert info is not None and info.kind == "kitty"
        assert info.term_px == (640, 320)
        # 640x320 window, 80x24 cells, 23 image rows -> 8x13.33 px cells
        w, h = gfx.pick_render_size(info, 80, 24, 23)
        assert w == 640 and h == int(23 * (320 / 24)) // 2 * 2
        # no kitty answer -> None (plain terminal)
        os.write(m, b"\x1b[?62;c")
        with open(sl, "rb", buffering=0, closefd=False) as fin, \
                open(sl, "w", closefd=False) as fout:
            assert gfx.detect(fin, fout, timeout=2.0) is None
    finally:
        os.close(m)
        os.close(sl)


def test_detect_pushes_back_typeahead(monkeypatch):
    """Keystrokes arriving during the handshake window (after the DA1
    reply) are handed back to the caller instead of vanishing."""
    monkeypatch.delenv("FRACTAL_TPU_GFX", raising=False)
    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    monkeypatch.delenv("LC_TERMINAL", raising=False)
    m, sl = pty.openpty()
    tty.setraw(sl)
    got = []
    try:
        os.write(m, b"\x1b_Gi=31;OK\x1b\\\x1b[?62;c" b"eee")  # user held 'e'
        with open(sl, "rb", buffering=0, closefd=False) as fin, \
                open(sl, "w", closefd=False) as fout:
            info = gfx.detect(fin, fout, timeout=2.0,
                              pushback=got.append)
        assert info is not None and info.kind == "kitty"
        assert got == [b"eee"]
    finally:
        os.close(m)
        os.close(sl)


def test_pick_render_size_defaults_and_caps():
    info = gfx.GfxInfo("kitty", None)  # unreported window: 8x16 cells
    assert gfx.pick_render_size(info, 120, 35, 34) == (960, 544)
    big = gfx.GfxInfo("kitty", (10000, 8000))
    w, h = gfx.pick_render_size(big, 500, 100, 99)
    assert (w, h) == (1920, 1080)  # capped


# ---- live-session gfx path --------------------------------------------------

def test_live_session_gfx_frame_bytes(monkeypatch):
    """run_live with a forced kitty backend emits protocol-correct PNG
    frames at pixel resolution, with the status bar below the image."""
    monkeypatch.setenv("COLUMNS", "24")
    monkeypatch.setenv("LINES", "9")
    monkeypatch.setenv("FRACTAL_TPU_GFX", "kitty")
    r, w = os.pipe()  # stays open: max_frames exits the loop, not EOF
    out = io.StringIO()
    try:
        with open(r, "rb", buffering=0) as fin:
            live.run_live(Scene(max_iterations=24), infile=fin, outfile=out,
                          max_frames=1)
    finally:
        os.close(w)
    s = out.getvalue()
    png = _kitty_payload(s)
    w_px, h_px = _png_dims(png)
    # 24 cols x 8 image rows at the default 8x16 cell -> 192x128 pixels
    assert (w_px, h_px) == (192, 128)
    head = s[s.index("\x1b_G"):].split(";")[0]
    assert "c=24" in head and "r=8" in head  # placed over the cell grid
    # status bar on the row below the image
    assert "\x1b[9;1H" in s and "\x1b[7m" in s
    # session cleanup deletes the placements before leaving alt screen
    assert "\x1b_Ga=d,d=A" in s


def test_live_session_gfx_mouse_scaling(monkeypatch):
    """Mouse cells map through px_per_cell: a double-click at the window
    center zooms to the view center (not to cell coordinates)."""
    monkeypatch.setenv("COLUMNS", "20")
    monkeypatch.setenv("LINES", "11")
    sess = LiveSession(Scene(max_iterations=16))
    sess.enable_gfx(gfx.GfxInfo("kitty", None))
    assert (sess.viewer.width, sess.viewer.height) == (160, 160)
    assert sess.px_per_cell == (8.0, 16.0)
    c0 = sess.scene.center_x
    # double-click at cell (10, 5) == pixel (80, 80) == image center
    sess.handle_event(("mouse", 0, 10, 5, "press"), 1.0)
    sess.handle_event(("mouse", 0, 10, 5, "press"), 1.1)
    assert sess.scene.zoom < Scene().zoom       # zoomed in
    assert abs(sess.scene.center_x - c0) < 0.05  # about the center


def test_live_session_gfx_overlays(monkeypatch):
    """Help draws over the image as text; the minimap clears the image
    (kitty delete-all) and falls back to the text composer."""
    monkeypatch.setenv("COLUMNS", "20")
    monkeypatch.setenv("LINES", "6")
    sess = LiveSession(Scene(max_iterations=16))
    sess.enable_gfx(gfx.GfxInfo("kitty", None))
    img = np.zeros((sess.height, sess.width, 3), np.float32)
    sess.show_help = True
    s = compose_frame(sess, img)
    assert "\x1b_G" in s and "w a s d" in s
    sess.show_help = False
    sess.show_minimap = True
    s2 = compose_frame(sess, img)
    assert "\x1b_Ga=d,d=A" in s2          # image deleted
    assert "\x1b_Ga=T" not in s2          # no frame placed under the map
    # png cache: recomposing the same frame reuses the encoded bytes
    sess.show_minimap = False
    compose_frame(sess, img)
    key, blob = sess._png_cache
    compose_frame(sess, img)
    assert sess._png_cache == (key, blob)


# ---- sixel -----------------------------------------------------------------

def _decode_sixel(s: str, w: int, h: int) -> np.ndarray:
    """Minimal sixel decoder (palette defs + color runs) — the oracle for
    the encoder's round-trip test."""
    assert s.startswith("\x1bP0;1;0q") and s.endswith("\x1b\\")
    body = s[len("\x1bP0;1;0q"):-2]
    assert body.startswith(f'"1;1;{w};{h}')
    body = body[len(f'"1;1;{w};{h}'):]
    pal = {}
    img = np.zeros((h, w, 3), np.uint8)
    i = 0
    y0 = 0
    x = 0
    color = 0
    while i < len(body):
        ch = body[i]
        if ch == "#":
            j = i + 1
            while j < len(body) and body[j].isdigit():
                j += 1
            idx = int(body[i + 1:j])
            if j < len(body) and body[j] == ";":
                # palette definition #i;2;r;g;b (percent)
                parts = []
                k = j
                for _ in range(4):
                    k2 = k + 1
                    while k2 < len(body) and body[k2].isdigit():
                        k2 += 1
                    parts.append(int(body[k + 1:k2]))
                    k = k2
                assert parts[0] == 2
                pal[idx] = tuple(round(p * 255 / 100) for p in parts[1:])
                i = k
            else:
                color = idx
                i = j
            continue
        if ch == "$":
            x = 0
            i += 1
            continue
        if ch == "-":
            y0 += 6
            x = 0
            i += 1
            continue
        if ch == "!":
            j = i + 1
            while body[j].isdigit():
                j += 1
            n = int(body[i + 1:j])
            bits = ord(body[j]) - 63
            i = j + 1
        else:
            n = 1
            bits = ord(ch) - 63
            i += 1
        for k in range(6):
            if bits & (1 << k) and y0 + k < h:
                img[y0 + k, x:x + n] = pal[color]
        x += n
    return img


def test_sixel_round_trip():
    rng = np.random.default_rng(7)
    img8 = rng.integers(0, 256, (20, 33, 3), np.uint8)
    info = gfx.GfxInfo("sixel", None)
    s = gfx.encode_frame(info, img8, 33, 4)
    dec = _decode_sixel(s, 33, 20)
    # the decoder reproduces the encoder's 6x7x6 quantization exactly
    r = img8[..., 0].astype(np.int32) * 6 // 256
    g = img8[..., 1].astype(np.int32) * 7 // 256
    b = img8[..., 2].astype(np.int32) * 6 // 256
    def chan(v, levels):
        pct = np.round(v * 100 / (levels - 1)).astype(int)
        return np.round(pct * 255 / 100).astype(int)

    want = np.stack([chan(r, 6), chan(g, 7), chan(b, 6)], axis=-1)
    np.testing.assert_array_equal(dec, want)


def test_sixel_native_matches_numpy():
    """native/sixel.cpp and the numpy fallback emit BYTE-identical
    sequences — same quantization, RLE rule (n >= 4), trailing-'?' trim,
    '$'/'-' structure — across noise (dense, every color present) and
    smooth (long runs) frames plus a non-multiple-of-6 height."""
    lib = gfx._load_sixel_native()
    if lib is None:
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:32, 0:57]
    frames = [
        rng.integers(0, 256, (20, 33, 3), np.uint8),
        np.stack([(xx * 4 % 256).astype(np.uint8),
                  (yy * 7 % 256).astype(np.uint8),
                  np.full_like(xx, 9, np.uint8)], -1),
        np.zeros((7, 130, 3), np.uint8),
    ]
    for img8 in frames:
        h, w = img8.shape[:2]
        s = gfx.sixel_frame(img8)   # native path (lib present)
        r = img8[..., 0].astype(np.int32) * 6 // 256
        g = img8[..., 1].astype(np.int32) * 7 // 256
        b = img8[..., 2].astype(np.int32) * 6 // 256
        body_np = gfx._sixel_body_numpy(r * 42 + g * 6 + b, h, w)
        prefix = "\x1bP0;1;0q" + f'"1;1;{w};{h}' + gfx._SIXEL_PALETTE
        assert s.startswith(prefix) and s.endswith("\x1b\\")
        assert s[len(prefix):-2] == body_np


def test_detect_sixel_via_da1(monkeypatch):
    """A terminal with no kitty reply but DA1 capability 4 is sixel."""
    monkeypatch.delenv("FRACTAL_TPU_GFX", raising=False)
    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    monkeypatch.delenv("LC_TERMINAL", raising=False)
    m, sl = pty.openpty()
    tty.setraw(sl)
    try:
        os.write(m, b"\x1b[4;240;480t\x1b[6;20;10t\x1b[?62;4;22c")
        with open(sl, "rb", buffering=0, closefd=False) as fin, \
                open(sl, "w", closefd=False) as fout:
            info = gfx.detect(fin, fout, timeout=2.0)
        assert info is not None and info.kind == "sixel"
        assert info.term_px == (480, 240)
        assert info.cell_px == (10.0, 20.0)  # CSI 16 t cell report
        # capability 44 (not 4) must NOT match
        os.write(m, b"\x1b[?62;44;22c")
        with open(sl, "rb", buffering=0, closefd=False) as fin, \
                open(sl, "w", closefd=False) as fout:
            assert gfx.detect(fin, fout, timeout=2.0) is None
    finally:
        os.close(m)
        os.close(sl)


def test_live_session_sixel_frame(monkeypatch):
    monkeypatch.setenv("COLUMNS", "20")
    monkeypatch.setenv("LINES", "7")
    monkeypatch.setenv("FRACTAL_TPU_GFX", "sixel")
    r, w = os.pipe()
    out = io.StringIO()
    try:
        with open(r, "rb", buffering=0) as fin:
            live.run_live(Scene(max_iterations=16), infile=fin, outfile=out,
                          max_frames=1)
    finally:
        os.close(w)
    s = out.getvalue()
    assert "\x1bP0;1;0q" in s and s.count("\x1b\\") >= 1
    # 20 cols x 6 image rows at 8x16 -> a 160x96 raster header
    assert '"1;1;160;96' in s


def test_gfx_interactive_degradation(monkeypatch):
    """Big pixel windows render HALF resolution while keys are held (the
    terminal scales the placement; the fetch drops 4x) and snap back to
    full resolution on the settle frame after input goes quiet."""
    monkeypatch.setenv("COLUMNS", "120")
    monkeypatch.setenv("LINES", "35")
    sess = LiveSession(Scene(max_iterations=16))
    sess.enable_gfx(gfx.GfxInfo("kitty", None))
    assert (sess.viewer.width, sess.viewer.height) == (960, 544)
    # quiet: full resolution
    img = np.asarray(sess.dispatch())
    assert img.shape == (3, 544, 960)
    # held key: half resolution
    sess.handle_event(("key", "e"), 0.0)
    sess.tick(0.01, 0.016)
    assert sess._gfx_scale() == 2
    img2 = np.asarray(sess.dispatch())
    assert img2.shape == (3, 272, 480)
    # key expires -> the settle tick marks dirty and scale returns to 1
    sess.dirty = False
    sess.tick(10.0, 0.016)
    assert sess.dirty and sess._gfx_scale() == 1
    # small windows never degrade
    monkeypatch.setenv("COLUMNS", "20")
    monkeypatch.setenv("LINES", "8")
    small = LiveSession(Scene(max_iterations=16))
    small.enable_gfx(gfx.GfxInfo("kitty", None))
    small.handle_event(("key", "e"), 0.0)
    assert small._gfx_scale() == 1
    # sixel never degrades (no terminal-side scaling) — and because its
    # frames were never degraded, the settle tick must NOT schedule a
    # redundant full re-render after the key expires
    monkeypatch.setenv("COLUMNS", "120")
    monkeypatch.setenv("LINES", "35")
    six = LiveSession(Scene(max_iterations=16))
    six.enable_gfx(gfx.GfxInfo("sixel", None))
    six.handle_event(("key", "e"), 0.0)
    assert six._gfx_scale() == 1
    six.tick(0.01, 0.016)
    six.dirty = False
    six.tick(10.0, 0.016)  # key expired; last frame was full-res
    assert not six.dirty


def test_gfx_degradation_applies_to_deep_zoom(monkeypatch):
    """Deep-zoom dispatch also renders half-res during interaction (its
    frames are the heaviest; the orbit is resolution-free)."""
    monkeypatch.setenv("COLUMNS", "24")
    monkeypatch.setenv("LINES", "9")
    monkeypatch.setattr(live, "_DEGRADE_MIN_PIXELS", 1000)
    sess = LiveSession(Scene(
        fractal_type=live.FractalType.DEEP_ZOOM,
        hp_center_x="-0.74364388703715158",
        hp_center_y="0.13182590420531198",
        hp_zoom="1e-8", max_iterations=300, use_perturbation=True))
    sess.enable_gfx(gfx.GfxInfo("kitty", None))
    assert (sess.viewer.width, sess.viewer.height) == (192, 128)
    img = np.asarray(sess.dispatch())
    assert img.shape == (128, 192, 3) and img.dtype == np.uint8
    sess.handle_event(("key", "e"), 0.0)
    sess.tick(0.01, 0.016)
    img2 = np.asarray(sess.dispatch())
    assert img2.shape == (64, 96, 3)  # half-res interactive deep frame
    assert len(sess._orbit_cache) >= 1  # one orbit serves both sizes
