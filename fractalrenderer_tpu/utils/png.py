"""Dependency-free PNG writer: 8-bit and 16-bit RGB(A), metadata chunks, and
a streaming row-band API for giant stills.

Replaces the reference's stb_image_write 8-bit path (src/vk_engine.cpp:33-34,
src/animation_renderer.cpp:13) and the libpng 16-bit print-export path with
gAMA / sRGB / pHYs(DPI) / tEXt / tIME chunks (src/vk_engine.cpp:2106-2223).
"""
from __future__ import annotations

import struct
import time
import zlib
from typing import BinaryIO, Dict, Optional

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _ihdr(width: int, height: int, bit_depth: int, color_type: int) -> bytes:
    return _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, bit_depth,
                                       color_type, 0, 0, 0))


def _text_chunks(metadata: Optional[Dict[str, str]]) -> bytes:
    if not metadata:
        return b""
    out = b""
    for key, value in metadata.items():
        k = key.encode("latin-1", "replace")[:79]
        v = str(value).encode("latin-1", "replace")
        out += _chunk(b"tEXt", k + b"\x00" + v)
    return out


def _time_chunk(t: Optional[float] = None) -> bytes:
    tm = time.gmtime(t)
    return _chunk(b"tIME", struct.pack(">HBBBBB", tm.tm_year, tm.tm_mon,
                                       tm.tm_mday, tm.tm_hour, tm.tm_min,
                                       tm.tm_sec))


def _phys_chunk(dpi: float) -> bytes:
    ppm = int(dpi / 0.0254 + 0.5)  # vk_engine.cpp:2149-2152
    return _chunk(b"pHYs", struct.pack(">IIB", ppm, ppm, 1))


def _prepare_rows(image: np.ndarray, bit_depth: int) -> np.ndarray:
    """Convert an image array to the raw byte matrix (one row per scanline,
    no filter byte yet).  Accepts f32 [0,1], uint8, or uint16."""
    if image.ndim == 2:
        image = image[:, :, None]
    if image.dtype in (np.float32, np.float64):
        image = np.clip(image, 0.0, 1.0)
        if bit_depth == 8:
            image = (image * 255.0 + 0.5).astype(np.uint8)
        else:
            image = (image * 65535.0 + 0.5).astype(np.uint16)
    if bit_depth == 8:
        data = np.ascontiguousarray(image.astype(np.uint8, copy=False))
        return data.reshape(data.shape[0], -1)
    # ascontiguousarray: numpy ufuncs/astype PRESERVE input layout, and a
    # TPU-fetched array can arrive with a non-default (non-C) layout —
    # view(uint8) requires the last axis contiguous
    data = np.ascontiguousarray(
        image.astype(np.uint16, copy=False)).byteswap()  # big-endian
    return data.view(np.uint8).reshape(data.shape[0], -1)


class PNGWriter:
    """Streaming PNG writer — feed row bands incrementally so a 16K×16K
    export never materializes fully on host (SURVEY.md §7 'Giant-still
    memory')."""

    def __init__(self, fp: BinaryIO, width: int, height: int,
                 bit_depth: int = 8, channels: int = 3,
                 metadata: Optional[Dict[str, str]] = None,
                 dpi: Optional[float] = None, srgb: bool = True,
                 compress_level: int = 6):
        assert bit_depth in (8, 16)
        assert channels in (1, 3, 4)
        self.fp = fp
        self.width = width
        self.height = height
        self.bit_depth = bit_depth
        self.channels = channels
        self.compress_level = compress_level
        self._rows_written = 0
        color_type = {1: 0, 3: 2, 4: 6}[channels]
        fp.write(_SIG)
        fp.write(_ihdr(width, height, bit_depth, color_type))
        if srgb:
            # gAMA 1/2.2 + sRGB perceptual intent (vk_engine.cpp:2144-2146)
            fp.write(_chunk(b"gAMA", struct.pack(">I", int(100000 / 2.2))))
            fp.write(_chunk(b"sRGB", b"\x00"))
        if dpi is not None:
            fp.write(_phys_chunk(dpi))
        fp.write(_text_chunks(metadata))
        fp.write(_time_chunk())
        self._comp = zlib.compressobj(compress_level)

    def write_rows(self, band: np.ndarray) -> None:
        rows = _prepare_rows(band, self.bit_depth)
        expected = self.width * self.channels * (self.bit_depth // 8)
        if rows.shape[1] != expected:
            raise ValueError(
                f"band row size {rows.shape[1]} != expected {expected}")
        # Filter type 0 (None) per scanline.
        filtered = np.concatenate(
            [np.zeros((rows.shape[0], 1), np.uint8), rows], axis=1)
        payload = self._comp.compress(filtered.tobytes())
        if payload:
            self.fp.write(_chunk(b"IDAT", payload))
        self._rows_written += rows.shape[0]

    def close(self) -> None:
        if self._rows_written != self.height:
            raise ValueError(
                f"wrote {self._rows_written} rows, expected {self.height}")
        tail = self._comp.flush()
        if tail:
            self.fp.write(_chunk(b"IDAT", tail))
        self.fp.write(_chunk(b"IEND", b""))

    def __enter__(self):
        return self

    def __exit__(self, et, ev, tb):
        if et is None:
            self.close()


def band_raw_bytes(band: np.ndarray, bit_depth: int) -> bytes:
    """Filtered scanline bytes of a band (filter type 0 per row) — the raw
    deflate input the parallel writer's workers consume."""
    rows = _prepare_rows(band, bit_depth)
    filtered = np.concatenate(
        [np.zeros((rows.shape[0], 1), np.uint8), rows], axis=1)
    return filtered.tobytes()


def deflate_chunk(raw: bytes, compress_level: int = 6) -> bytes:
    """Raw-deflate ``raw`` ending in a Z_FULL_FLUSH (empty stored block +
    window reset) so independently-compressed chunks concatenate into one
    valid zlib stream — the pigz trick, here for PNG IDAT."""
    c = zlib.compressobj(compress_level, zlib.DEFLATED, -15)
    return c.compress(raw) + c.flush(zlib.Z_FULL_FLUSH)


class ParallelPNGWriter(PNGWriter):
    """PNGWriter variant whose IDAT stream is assembled from chunks
    deflated *in parallel* by the caller (one zlib header + concatenated
    full-flushed raw-deflate chunks + final empty block + adler32).

    Protocol per band, in scanline order:
        raw = band_raw_bytes(band, bit_depth)   # main thread or worker
        payload = deflate_chunk(raw, level)     # worker thread, any order
        w.write_deflated(raw_len=len(raw), n_rows=..., payload=payload,
                         adler_of=raw)          # main thread, in order
    """

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._comp = None  # superseded
        self._adler = 1
        self.fp.write(_chunk(b"IDAT", b"\x78\x9c"))  # zlib header

    def write_rows(self, band: np.ndarray) -> None:
        raw = band_raw_bytes(band, self.bit_depth)
        self.write_deflated(band.shape[0],
                            deflate_chunk(raw, self.compress_level), raw)

    def write_deflated(self, n_rows: int, payload: bytes,
                       adler_of: bytes) -> None:
        self._adler = zlib.adler32(adler_of, self._adler)
        self.fp.write(_chunk(b"IDAT", payload))
        self._rows_written += n_rows

    def close(self) -> None:
        if self._rows_written != self.height:
            raise ValueError(
                f"wrote {self._rows_written} rows, expected {self.height}")
        c = zlib.compressobj(self.compress_level, zlib.DEFLATED, -15)
        fin = c.compress(b"") + c.flush(zlib.Z_FINISH)  # final empty block
        self.fp.write(_chunk(b"IDAT",
                             fin + struct.pack(">I", self._adler)))
        self.fp.write(_chunk(b"IEND", b""))


def write_png(path: str, image: np.ndarray, bit_depth: int = 8,
              metadata: Optional[Dict[str, str]] = None,
              dpi: Optional[float] = None, srgb: bool = True,
              compress_level: int = 6) -> None:
    """One-shot write of an (H, W, C) image (f32 in [0,1], uint8 or uint16)."""
    image = np.asarray(image)
    channels = 1 if image.ndim == 2 else image.shape[2]
    with open(path, "wb") as fp:
        with PNGWriter(fp, image.shape[1], image.shape[0], bit_depth,
                       channels, metadata, dpi, srgb, compress_level) as w:
            w.write_rows(image)


def encode_png(image: np.ndarray, bit_depth: int = 8,
               metadata: Optional[Dict[str, str]] = None,
               srgb: bool = True, compress_level: int = 1) -> bytes:
    """In-memory PNG encode of an (H, W, C) image — the live session's
    pixel-frame path (gfx.py) streams these in-band per frame, so the
    default deflate level is 1 (interiors are flat; speed wins)."""
    import io

    image = np.asarray(image)
    channels = 1 if image.ndim == 2 else image.shape[2]
    buf = io.BytesIO()
    with PNGWriter(buf, image.shape[1], image.shape[0], bit_depth,
                   channels, metadata, None, srgb, compress_level) as w:
        w.write_rows(image)
    return buf.getvalue()


def _load_pngfilter():
    """Load native/libpngfilter.so via the shared loader; None when the
    toolchain is unavailable — callers fall back to NumPy loops."""
    import ctypes

    from .native_build import load_native_lib

    def configure(lib):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [u8p, ctypes.c_int64, u8p,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int]

    return load_native_lib("libpngfilter", configure)


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering → (height, stride) uint8.

    Native C++ loop when available (filters 1/3/4 carry a left-neighbor
    recurrence — 16K-wide filtered scanlines decode in milliseconds);
    NumPy fallback vectorizes what it can (0/2 fully, 1 via cumsum) and
    loops per byte only for 3/4.
    """
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    lib = _load_pngfilter()
    if lib is not None:
        import ctypes

        src = np.frombuffer(raw, np.uint8, count=height * (stride + 1))
        out = np.empty(height * stride, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        rc = lib.png_unfilter(src.ctypes.data_as(u8p), src.size,
                              out.ctypes.data_as(u8p), height, stride, bpp)
        if rc == 0:
            return out.reshape(height, stride)
        if rc == -1:
            raise ValueError("unsupported filter type in PNG stream")
        raise ValueError("truncated PNG pixel data")
    lines = np.frombuffer(raw, np.uint8, count=height * (stride + 1))
    lines = lines.reshape(height, stride + 1)
    ftypes = lines[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError(
            f"unsupported filter {int(ftypes.max())}")
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        ftype = int(ftypes[y])
        line = lines[y, 1:].astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:
            # rec[i] = (line[i] + rec[i-bpp]) mod 256: per byte-channel a
            # prefix sum mod 256, and mod distributes over the cumsum.
            cols = line.reshape(stride // bpp, bpp)
            rec = (np.cumsum(cols, axis=0, dtype=np.int64) & 0xFF)
            rec = rec.reshape(stride).astype(np.int32)
        elif ftype == 2:
            rec = (line + prev) & 0xFF
        elif ftype == 3:
            rec = line.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        else:  # ftype == 4 (Paeth)
            rec = line.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader (filter types 0-4, 8/16-bit, gray/RGB/RGBA) used by
    tests and the video-encode smoke checks.  Not a general-purpose decoder."""
    with open(path, "rb") as fp:
        if fp.read(8) != _SIG:
            raise ValueError("not a PNG")
        idat = b""
        width = height = bit_depth = color_type = None
        while True:
            head = fp.read(8)
            if len(head) < 8:
                break
            (length,), tag = struct.unpack(">I", head[:4]), head[4:]
            payload = fp.read(length)
            fp.read(4)  # crc
            if tag == b"IHDR":
                width, height, bit_depth, color_type = struct.unpack(
                    ">IIBB", payload[:10])
            elif tag == b"IDAT":
                idat += payload
            elif tag == b"IEND":
                break
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    bpp = channels * (bit_depth // 8)
    stride = width * bpp
    out = _unfilter(raw, height, stride, bpp)
    img = out.reshape(height, width, bpp)
    if bit_depth == 16:
        img = img.reshape(height, width, channels, 2)
        img = (img[..., 0].astype(np.uint16) << 8) | img[..., 1]
        return img
    return img.reshape(height, width, channels)
