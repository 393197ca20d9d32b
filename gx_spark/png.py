"""Pure stdlib-zlib + numpy PNG codec (no PIL/libpng in this sandbox).

Implements the subset a validation engine needs to REALLY decode payloads
instead of trusting container magic: 8-bit-depth, non-interlaced PNGs in
grayscale / gray+alpha / RGB / RGBA (color types 0/4/2/6), all five
scanline filters (None/Sub/Up/Average/Paeth), CRC-checked chunks.
Palette (color type 3), 16-bit depth and Adam7 interlace raise ValueError —
the flags UDF then reports the payload undecodable rather than guessing.

Spec: PNG (Second Edition), W3C/ISO 15948 — public knowledge; the filter
inverses follow the spec's recon() definitions directly.

Performance shape: Sub rows invert via a per-lane cumsum and Up rows via
wrapping uint8 adds (one numpy op per row); Average/Paeth have a true
serial dependency on the left-neighbour RECONSTRUCTED byte, so those rows
fall back to a per-byte loop. Encoding always emits filter 0, so
round-trips inside the engine stay on the vectorized path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, level: int = 6) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes (8-bit, filter 0 rows)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(arr: np.ndarray, w: int, channels: int) -> np.ndarray:
    """(h, 1+stride) filtered scanlines -> (h, stride) reconstructed bytes."""
    h = arr.shape[0]
    stride = w * channels
    bpp = channels
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(arr[y, 0])
        r = arr[y, 1:]
        if f == 0:
            rec = r.copy()
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] — cumsum per lane
            lanes = r.reshape(w, bpp).astype(np.uint64)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up (uint8 adds wrap mod 256, exactly the spec's recon)
            rec = r + prev
        elif f == 3:  # Average: serial on reconstructed left neighbour
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(r[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth: serial on reconstructed left neighbour
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(r[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad scanline filter type {f}")
        out[y] = rec
        prev = rec
    return out


def png_decode(b: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8.  Raises ValueError on malformed,
    truncated, CRC-corrupt, or unsupported-feature payloads."""
    b = bytes(b)
    if b[:8] != _SIG:
        raise ValueError("not a png payload")
    pos = 8
    ihdr: bytes | None = None
    idat: list[bytes] = []
    while pos + 12 <= len(b):
        ln, tag = struct.unpack(">I4s", b[pos : pos + 8])
        end = pos + 8 + ln
        if end + 4 > len(b):
            raise ValueError("truncated chunk")
        data = b[pos + 8 : end]
        (crc,) = struct.unpack(">I", b[end : end + 4])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"crc mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos = end + 4
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("missing or malformed IHDR")
    if not idat:
        raise ValueError("missing IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if w == 0 or h == 0:
        raise ValueError("zero image dimension")
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced png unsupported")
    channels = _CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed scanline size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    return _unfilter(arr, w, channels).reshape(h, w, channels)


def png_encode_filtered(pixels: np.ndarray, filter_type: int, level: int = 6) -> bytes:
    """Encode with one fixed scanline filter (0-4) on every row — exercises
    the decoder's filter inverses in tests.  Filters are computed from the
    ORIGINAL pixel bytes (the reconstructed values by construction), so the
    encode side is fully vectorized for all five types."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    bpp = c
    rows = px.reshape(h, w * c)
    up = np.vstack([np.zeros((1, w * c), np.uint8), rows[:-1]])
    left = np.zeros_like(rows)
    left[:, bpp:] = rows[:, :-bpp]
    upleft = np.zeros_like(rows)
    upleft[:, bpp:] = up[:, :-bpp]
    if filter_type == 0:
        enc = rows
    elif filter_type == 1:
        enc = rows - left
    elif filter_type == 2:
        enc = rows - up
    elif filter_type == 3:
        enc = rows - ((left.astype(np.uint16) + up) >> 1).astype(np.uint8)
    elif filter_type == 4:
        a = left.astype(np.int32)
        b = up.astype(np.int32)
        cc = upleft.astype(np.int32)
        p = a + b - cc
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
        enc = rows - pred.astype(np.uint8)
    else:
        raise ValueError(f"bad filter type {filter_type}")
    raw = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), enc], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )
