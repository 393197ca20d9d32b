"""Minimal ISO-BMFF (MP4) CONTAINER codec — stdlib struct only.

Scope, from the public spec (ISO/IEC 14496-12 box structure):

- mux: `ftyp` + `moov` ( `mvhd` timescale/duration + `trak` ( `tkhd`
  with 16.16 fixed-point width/height + `mdia`/`mdhd`/`hdlr('vide')` ) )
  + `mdat` carrying the (opaque) coded video payload.  Every box is a
  real length-prefixed ISO box; a conforming reader walks this file.
- demux: strict box walk with size bounds, requiring ftyp/moov/mvhd/
  tkhd/mdat; returns movie duration (mvhd duration/timescale) and track
  pixel dimensions (tkhd 16.16 → int).

The H.264 BITSTREAM inside mdat is not decodable in-sandbox (no codec
libs; a from-scratch AVC decoder is out of scope) — payload bytes are a
deterministic opaque pattern, clearly documented, exactly like the Opus
packets in gx_spark/oggopus.py.  The validation engine certifies video
rows at the container level: box structure, mvhd duration vs the
n_frames/fps metadata columns, tkhd dimensions vs width/height.

No upstream analog (reference mount empty; SURVEY.md §0).
"""

from __future__ import annotations

import struct
import zlib

_TIMESCALE = 1000  # mvhd/mdhd clock: 1 tick = 1 ms


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), tag) + payload


def mp4_encode(
    vid_id: str, n_frames: int, fps: float, width: int, height: int,
) -> bytes:
    """Mux a structurally valid MP4 whose CONTAINER metadata describes an
    `n_frames`-frame clip at `fps` with `width`x`height` video: real box
    tree, opaque deterministic mdat payload (no AVC encoder in-sandbox).
    """
    dur = int(round(n_frames * _TIMESCALE / fps)) if fps > 0 else 0
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _box(b"mvhd", struct.pack(
        ">B3sIIII", 0, b"\0\0\0", 0, 0, _TIMESCALE, dur)
        + struct.pack(">iH2s", 0x00010000, 0x0100, b"\0\0")
        + b"\0" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\0" * 24 + struct.pack(">I", 2))
    tkhd = _box(b"tkhd", struct.pack(
        ">B3sIIIII", 0, b"\0\0\7", 0, 0, 1, 0, dur)
        + b"\0" * 8 + struct.pack(">hhhH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _box(b"mdhd", struct.pack(
        ">B3sIIIIHH", 0, b"\0\0\0", 0, 0, _TIMESCALE, dur, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">B3sI4s", 0, b"\0\0\0", 0, b"vide")
                + b"\0" * 12 + b"gx\0")
    mdia = _box(b"mdia", mdhd + hdlr)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    seed = zlib.crc32((vid_id + "h264").encode())
    frame = struct.pack("<I", seed & 0xFFFFFFFF) * 16  # 64 opaque bytes
    mdat = _box(b"mdat", frame * max(1, n_frames))
    return ftyp + moov + mdat


def _walk(b: bytes, start: int, end: int):
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size, tag = struct.unpack(">I4s", b[pos:pos + 8])
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size for {tag!r}")
        yield tag, pos + 8, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing bytes after last box")


def mp4_parse(b: bytes) -> dict:
    """Demux + verify: strict box walk (sizes bounded, no trailing junk),
    ftyp/moov/mvhd/tkhd/mdat required.  Returns {"dur_ms", "width",
    "height", "n_tracks"}; raises ValueError on malformed structure."""
    tags = []
    dur_ms = width = height = None
    n_tracks = 0
    for tag, s, e in _walk(b, 0, len(b)):
        tags.append(tag)
        if tag == b"moov":
            for t2, s2, e2 in _walk(b, s, e):
                if t2 == b"mvhd":
                    # bounds BEFORE the byte read: an empty-payload mvhd at
                    # the buffer end must raise ValueError, not IndexError
                    # (image.py's flags UDF catches only ValueError)
                    if e2 - s2 < 20:
                        raise ValueError("bad mvhd")
                    ver = b[s2]
                    if ver != 0:
                        raise ValueError("bad mvhd")
                    timescale, dur = struct.unpack(">II", b[s2 + 12:s2 + 20])
                    if timescale <= 0:
                        raise ValueError("bad mvhd timescale")
                    dur_ms = dur * 1000 // timescale
                elif t2 == b"trak":
                    n_tracks += 1
                    t_w = t_h = None
                    is_vide = False
                    for t3, s3, e3 in _walk(b, s2, e2):
                        if t3 == b"tkhd":
                            if e3 - s3 < 84:
                                raise ValueError("short tkhd")
                            w16, h16 = struct.unpack(">II", b[e3 - 8:e3])
                            t_w, t_h = w16 >> 16, h16 >> 16
                        elif t3 == b"mdia":
                            for t4, s4, e4 in _walk(b, s3, e3):
                                # hdlr payload: ver(1)+flags(3)+
                                # pre_defined(4)+handler_type(4)
                                if t4 == b"hdlr" and e4 - s4 >= 12:
                                    is_vide = b[s4 + 8:s4 + 12] == b"vide"
                    # dims come from the VIDEO track (hdlr=='vide'), not
                    # whichever trak happens to be last — a trailing audio
                    # trak with 0x0 tkhd dims must not win.  Fallback for
                    # hdlr-less files: first track with nonzero dims.
                    if t_w is not None and (
                            is_vide or (width is None and t_w > 0)):
                        width, height = t_w, t_h
    if b"ftyp" not in tags or b"moov" not in tags or b"mdat" not in tags:
        raise ValueError("missing required top-level box")
    if dur_ms is None or width is None or n_tracks == 0:
        raise ValueError("missing mvhd/tkhd")
    return {"dur_ms": int(dur_ms), "width": int(width),
            "height": int(height), "n_tracks": n_tracks}
