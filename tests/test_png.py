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
