"""Dependency-free video container: QuickTime MOV with PNG-coded frames.

The reference can only encode through an external ffmpeg binary and
degrades to nothing without one (video_encoder.cpp:230-238); this muxer
writes a playable, lossless .mov from the rendered PNG sequence in pure
Python — each frame's PNG bytes become one sample of a 'png ' video
track (a standard QuickTime codec; QuickTime/VLC/ffmpeg all read it).

Layout: ftyp + mdat (concatenated PNG frames) + moov (sample tables
pointing into mdat).  Atoms follow the QTFF/ISO-BMFF box grammar:
[u32 size][4cc type][payload].
"""
from __future__ import annotations

import os
import struct
from typing import List, Tuple

_TIMESCALE = 60000  # NTSC-friendly: 24/25/30/60 fps all divide evenly


def _atom(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _atom(tag, struct.pack(">B3s", version,
                                  flags.to_bytes(3, "big")) + payload)


def _png_size(path: str) -> Tuple[int, int]:
    with open(path, "rb") as fh:
        head = fh.read(26)
    if head[:8] != b"\x89PNG\r\n\x1a\n" or head[12:16] != b"IHDR":
        raise ValueError(f"{path} is not a PNG")
    w, h = struct.unpack(">II", head[16:24])
    return w, h


def _matrix_identity() -> bytes:
    # 3x3 QT transform: a b u / c d v / x y w (16.16 / 2.30 fixed)
    return struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                       0x40000000)


def _hdlr_data() -> bytes:
    """Data-handler declaration (QT expects one inside minf)."""
    return _full(b"hdlr", 0, 0,
                 b"dhlr" + b"alis" + b"\x00" * 12 + b"\x0bDataHandler")


def write_mov(out_path: str, frame_paths: List[str], fps: float) -> dict:
    """Mux PNG frames into a .mov; returns {frames, width, height,
    duration_s, bytes}."""
    if not frame_paths:
        raise ValueError("no frames to mux")
    width, height = _png_size(frame_paths[0])
    per = max(1, int(round(_TIMESCALE / float(fps))))
    n = len(frame_paths)
    duration = per * n

    ftyp = _atom(b"ftyp", b"qt  " + struct.pack(">I", 0x200) + b"qt  ")

    sizes = []
    offsets = []
    # mdat payload begins after ftyp + mdat header (8 bytes)
    pos = len(ftyp) + 8
    for p in frame_paths:
        sz = os.path.getsize(p)
        sizes.append(sz)
        offsets.append(pos)
        pos += sz
    if pos >= 1 << 32:
        # stco offsets and the mdat size field are 32-bit in this writer
        raise ValueError(
            f"muxed output would be {pos / 2**30:.1f} GiB — past the "
            "32-bit stco/mdat limit; encode fewer frames per file or use "
            "an ffmpeg codec")

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, _TIMESCALE, duration)
        + struct.pack(">I", 0x00010000)      # rate 1.0
        + struct.pack(">H", 0x0100)          # volume 1.0
        + b"\x00" * 10 + _matrix_identity()
        + b"\x00" * 24                        # QT preview/poster/selection
        + struct.pack(">I", 2))               # next track id

    tkhd = _full(b"tkhd", 0, 0x7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration)      # ctime mtime id rsvd duration
        + b"\x00" * 8                         # reserved
        + struct.pack(">hhhH", 0, 0, 0, 0)   # layer alt-group volume rsvd
        + _matrix_identity()
        + struct.pack(">II", width << 16, height << 16))

    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, _TIMESCALE, duration, 0x55C4, 0))  # lang 'und'
    hdlr = _full(b"hdlr", 0, 0,
                 b"mhlr" + b"vide" + b"\x00" * 12
                 + b"\x0aVideoTrack")          # pascal-string name (10 ch)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"alis", 0, 1, b""))  # self-contained
    dinf = _atom(b"dinf", dref)

    # 'png ' video sample description (QTFF ImageDescription)
    desc = (b"\x00" * 6 + struct.pack(">H", 1)          # dataref index
            + struct.pack(">HH", 0, 0)                   # version revision
            + b"\x00" * 4                                # vendor
            + struct.pack(">II", 512, 512)               # temporal/spatial q
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + struct.pack(">I", 0)                       # data size
            + struct.pack(">H", 1)                       # frames/sample
            + b"\x03png" + b"\x00" * 28                  # compressor name
            + struct.pack(">hh", 24, -1))                # depth, clut id
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _atom(b"png ", desc))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, per))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">I", n)
                 + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _atom(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _atom(b"minf", vmhd + _hdlr_data() + dinf + stbl)
    mdia = _atom(b"mdia", mdhd + hdlr + minf)
    trak = _atom(b"trak", tkhd + mdia)
    moov = _atom(b"moov", mvhd + trak)

    total = 0
    with open(out_path, "wb") as out:
        out.write(ftyp)
        out.write(struct.pack(">I", 8 + sum(sizes)) + b"mdat")
        for p in frame_paths:
            with open(p, "rb") as fh:
                out.write(fh.read())
        out.write(moov)
        total = out.tell()
    return {"frames": n, "width": width, "height": height,
            "duration_s": duration / _TIMESCALE, "bytes": total}

