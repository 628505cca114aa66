"""Pure-Python PNG-in-MOV muxer (anim/qtpng.py) + the 'qtpng' codec path
of the video encoder — the no-external-binary lossless video output the
reference cannot produce (it degrades to nothing without ffmpeg).
"""
import io
import os
import struct

import numpy as np
import pytest

from fractalrenderer_tpu.anim import qtpng, video
from fractalrenderer_tpu.utils.png import write_png


def _frames(folder, n=5, w=32, h=20):
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(3)
    paths = []
    for k in range(n):
        p = os.path.join(folder, f"frame_{k:06d}.png")
        write_png(p, rng.random((h, w, 3)).astype(np.float32))
        paths.append(p)
    return paths


def _walk_atoms(buf, start=0, end=None):
    """Yield (type, payload_start, payload_end) of top-level atoms."""
    end = len(buf) if end is None else end
    pos = start
    while pos + 8 <= end:
        size, tag = struct.unpack(">I4s", buf[pos:pos + 8])
        if size < 8:
            break
        yield tag, pos + 8, pos + size
        pos += size


def _find(buf, path, start=0, end=None):
    """Resolve a nested atom path like [b'moov', b'trak', ...]."""
    for tag, a, b in _walk_atoms(buf, start, end):
        if tag == path[0]:
            if len(path) == 1:
                return a, b
            return _find(buf, path[1:], a, b)
    raise KeyError(path)


def test_mov_structure_and_sample_tables(tmp_path):
    paths = _frames(tmp_path / "f", n=5)
    out = str(tmp_path / "clip.mov")
    info = qtpng.write_mov(out, paths, fps=30)
    assert info["frames"] == 5 and (info["width"], info["height"]) == (32, 20)
    assert info["duration_s"] == pytest.approx(5 / 30, rel=1e-3)
    buf = open(out, "rb").read()
    assert len(buf) == info["bytes"]
    tags = [t for t, _, _ in _walk_atoms(buf)]
    assert tags == [b"ftyp", b"mdat", b"moov"]

    # stsz sizes match the PNG files; stco offsets land on PNG signatures
    a, b = _find(buf, [b"moov", b"trak", b"mdia", b"minf", b"stbl",
                       b"stsz"])
    fixed, count = struct.unpack(">II", buf[a + 4:a + 12])
    assert fixed == 0 and count == 5
    sizes = struct.unpack(">5I", buf[a + 12:a + 32])
    assert list(sizes) == [os.path.getsize(p) for p in paths]
    a, b = _find(buf, [b"moov", b"trak", b"mdia", b"minf", b"stbl",
                       b"stco"])
    (count,) = struct.unpack(">I", buf[a + 4:a + 8])
    offsets = struct.unpack(f">{count}I", buf[a + 8:a + 8 + 4 * count])
    for off in offsets:
        assert buf[off:off + 8] == b"\x89PNG\r\n\x1a\n"
    # first sample must byte-equal the first frame file
    assert buf[offsets[0]:offsets[0] + sizes[0]] == open(paths[0],
                                                         "rb").read()

    # sample description advertises the 'png ' codec at the right size
    a, b = _find(buf, [b"moov", b"trak", b"mdia", b"minf", b"stbl",
                       b"stsd"])
    assert b"png " in buf[a:b]
    # ImageDescription: 6 reserved + 2 dataref + 2 ver + 2 rev + 4 vendor
    # + 8 quality = 24 bytes before width/height
    pay = buf.index(b"png ", a) + 4
    w, h = struct.unpack(">HH", buf[pay + 24:pay + 28])
    assert (w, h) == (32, 20)


def test_mov_byte_level_round_trip(tmp_path):
    """read_mov demuxes the samples back: every embedded PNG byte-equals
    its source file AND decodes to the source pixels — the encoder is
    end-to-end proven with no external tool."""
    from fractalrenderer_tpu.utils.png import read_png

    paths = _frames(tmp_path / "f", n=6, w=40, h=24)
    out = str(tmp_path / "clip.mov")
    qtpng.write_mov(out, paths, fps=24)
    dec = qtpng.read_mov(out)
    assert (dec["width"], dec["height"]) == (40, 24)
    assert dec["fps"] == pytest.approx(24.0)
    assert dec["duration_s"] == pytest.approx(6 / 24, rel=1e-3)
    assert len(dec["frames"]) == 6
    for sample, p in zip(dec["frames"], paths):
        assert sample == open(p, "rb").read()  # exact container bytes
        back = tmp_path / "back.png"
        back.write_bytes(sample)
        np.testing.assert_array_equal(read_png(str(back)),
                                      read_png(p))  # decoded pixels


def test_read_mov_rejects_corruption(tmp_path):
    paths = _frames(tmp_path / "f", n=3)
    out = str(tmp_path / "clip.mov")
    qtpng.write_mov(out, paths, fps=30)
    buf = bytearray(open(out, "rb").read())
    # flip one byte inside the first sample's PNG signature
    a, _ = _find(bytes(buf), [b"moov", b"trak", b"mdia", b"minf", b"stbl",
                              b"stco"])
    (off,) = struct.unpack(">I", bytes(buf[a + 8:a + 12]))
    buf[off] ^= 0xFF
    bad = tmp_path / "bad.mov"
    bad.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="not a complete PNG"):
        qtpng.read_mov(str(bad))
    # truncated container: atom grammar violation is caught
    trunc = tmp_path / "trunc.mov"
    trunc.write_bytes(bytes(buf[:-20]))
    with pytest.raises(ValueError):
        qtpng.read_mov(str(trunc))


def test_encoder_qtpng_codec_path(tmp_path):
    _frames(tmp_path / "frames", n=4)
    enc = video.VideoEncoder()
    seen = []
    enc.on_progress = lambda p: seen.append(p.current_frame)
    ok = enc.encode(str(tmp_path / "frames"), video.VideoEncodeSettings(
        output_filename=str(tmp_path / "out.mp4"),  # extension corrected
        codec=video.VideoCodec.QTPNG, fps=24, cleanup_frames=True))
    assert ok and enc.progress.success
    assert enc.progress.current_frame == 4
    out = str(tmp_path / "out.mov")
    assert os.path.exists(out)
    assert os.listdir(tmp_path / "frames") == []  # cleanup honored
    assert open(out, "rb").read(12)[4:] == b"ftypqt  "


def test_cli_animate_encode_qtpng(tmp_path):
    """animate --encode --codec qtpng: full pipeline with no ffmpeg."""
    from fractalrenderer_tpu import cli

    out_dir = str(tmp_path / "frames")
    video_out = str(tmp_path / "zoom.mov")
    rc = cli.main(["animate", "--width", "48", "--height", "24",
                   "--iters", "24", "--zoom-to", "1.0",
                   "--duration", "0.05", "--fps", "60",
                   "--out-dir", out_dir, "--encode",
                   "--video-out", video_out, "--codec", "qtpng"])
    assert rc == 0
    buf = open(video_out, "rb").read()
    assert buf[4:12] == b"ftypqt  "
    assert b"moov" in buf and b"png " in buf


def test_qtpng_rejects_garbage(tmp_path):
    bad = tmp_path / "x.png"
    bad.write_bytes(b"not a png")
    with pytest.raises(ValueError):
        qtpng.write_mov(str(tmp_path / "o.mov"), [str(bad)], 30)
    enc = video.VideoEncoder()
    ok = enc.encode(str(tmp_path), video.VideoEncodeSettings(
        codec=video.VideoCodec.QTPNG,
        output_filename=str(tmp_path / "o.mov")))
    assert not ok and "No frames" in enc.progress.error


def test_mov_rejects_over_4gib(tmp_path, monkeypatch):
    """stco/mdat are 32-bit in this writer; past 4 GiB the muxer raises
    a clear ValueError (caught by the encoder) instead of struct.error."""
    paths = _frames(tmp_path / "f", n=2)
    monkeypatch.setattr(os.path, "getsize", lambda p: 3 << 30)
    with pytest.raises(ValueError, match="GiB"):
        qtpng.write_mov(str(tmp_path / "big.mov"), paths, 30)
