import numpy as np
import pytest

from fractalrenderer_tpu.utils import png


def test_roundtrip_8bit(tmp_path, rng):
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    path = tmp_path / "a.png"
    png.write_png(str(path), img, bit_depth=8)
    back = png.read_png(str(path))
    np.testing.assert_array_equal(back, img)


def test_roundtrip_16bit(tmp_path, rng):
    img = rng.integers(0, 65536, (9, 11, 3), dtype=np.uint16)
    path = tmp_path / "b.png"
    png.write_png(str(path), img, bit_depth=16)
    back = png.read_png(str(path))
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, img)


def test_float_input_quantization(tmp_path):
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [1.0, 0.5, 0.0]
    path = tmp_path / "c.png"
    png.write_png(str(path), img, bit_depth=16)
    back = png.read_png(str(path))
    assert back[0, 0, 0] == 65535
    assert back[0, 0, 1] == int(0.5 * 65535 + 0.5)
    assert back[0, 0, 2] == 0


def test_streaming_writer_matches_oneshot(tmp_path, rng):
    img = rng.random((40, 16, 3)).astype(np.float32)
    p1 = tmp_path / "one.png"
    p2 = tmp_path / "two.png"
    png.write_png(str(p1), img)
    with open(p2, "wb") as fp:
        with png.PNGWriter(fp, 16, 40, bit_depth=8, channels=3) as w:
            w.write_rows(img[:13])
            w.write_rows(img[13:27])
            w.write_rows(img[27:])
    np.testing.assert_array_equal(png.read_png(str(p1)), png.read_png(str(p2)))


def test_streaming_writer_row_mismatch_raises(tmp_path):
    import io

    buf = io.BytesIO()
    w = png.PNGWriter(buf, 8, 10)
    w.write_rows(np.zeros((4, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        w.close()


def test_metadata_and_phys_chunks(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    path = tmp_path / "meta.png"
    png.write_png(str(path), img, bit_depth=16,
                  metadata={"Software": "fractalrenderer_tpu",
                            "Center": "(-0.5, 0.0)"},
                  dpi=300.0)
    raw = path.read_bytes()
    assert b"tEXt" in raw and b"pHYs" in raw and b"gAMA" in raw
    assert b"sRGB" in raw and b"tIME" in raw
    assert b"Software\x00fractalrenderer_tpu" in raw
    # 300 DPI → 11811 pixels/metre (vk_engine.cpp:2149-2152)
    import struct

    idx = raw.index(b"pHYs") + 4
    ppm_x, ppm_y, unit = struct.unpack(">IIB", raw[idx:idx + 9])
    assert ppm_x == ppm_y == 11811 and unit == 1


# ---- scanline unfiltering (native/pngfilter.cpp + NumPy fallback) ----

def _forward_filter(rows: np.ndarray, bpp: int, ftypes) -> bytes:
    """Encode scanlines with the given per-row PNG filter types (the
    inverse of png._unfilter), in plain int arithmetic."""
    H, stride = rows.shape
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(H):
        ftype = ftypes[y % len(ftypes)]
        rec = rows[y].astype(np.int32)
        left = np.zeros(stride, np.int32)
        left[bpp:] = rec[:-bpp]
        upleft = np.zeros(stride, np.int32)
        upleft[bpp:] = prev[:-bpp]
        if ftype == 0:
            enc = rec
        elif ftype == 1:
            enc = rec - left
        elif ftype == 2:
            enc = rec - prev
        elif ftype == 3:
            enc = rec - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = rec - pred
        raw.append(ftype)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = rec
    return bytes(raw)


@pytest.mark.parametrize("bpp", [1, 3, 4, 6])
def test_unfilter_all_types_roundtrip(rng, bpp):
    H, W = 13, 37
    rows = rng.integers(0, 256, (H, W * bpp), dtype=np.uint8)
    for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        raw = _forward_filter(rows, bpp, ftypes)
        dec = png._unfilter(raw, H, W * bpp, bpp)
        np.testing.assert_array_equal(dec, rows)


def test_unfilter_python_fallback_matches_native(rng, monkeypatch):
    H, W, bpp = 9, 33, 3
    rows = rng.integers(0, 256, (H, W * bpp), dtype=np.uint8)
    raw = _forward_filter(rows, bpp, [4, 3, 1, 2, 0])
    native = png._unfilter(raw, H, W * bpp, bpp)
    monkeypatch.setattr(png, "_load_pngfilter", lambda: None)
    fallback = png._unfilter(raw, H, W * bpp, bpp)
    np.testing.assert_array_equal(native, rows)
    np.testing.assert_array_equal(fallback, rows)


def test_unfilter_rejects_bad_input():
    with pytest.raises(ValueError, match="truncated"):
        png._unfilter(b"\x00" * 5, 2, 8, 3)
    bad = b"\x07" + b"\x00" * 8
    with pytest.raises(ValueError, match="filter"):
        png._unfilter(bad, 1, 8, 3)


def test_unfilter_wide_scanline_fast(rng):
    """16K-wide RGB16 filtered scanlines decode in milliseconds (the
    giant-still resume path against foreign-encoder tiles)."""
    import time
    if png._load_pngfilter() is None:
        pytest.skip("native pngfilter unavailable")
    H, W, bpp = 32, 16384, 6
    rows = rng.integers(0, 256, (H, W * bpp), dtype=np.uint8)
    raw = _forward_filter(rows, bpp, [4])
    t0 = time.perf_counter()
    dec = png._unfilter(raw, H, W * bpp, bpp)
    dt = time.perf_counter() - t0
    np.testing.assert_array_equal(dec, rows)
    assert dt < 1.0, f"unfilter of 32 16K Paeth rows took {dt:.2f}s"
