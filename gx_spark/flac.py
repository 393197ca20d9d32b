"""Spec-conformant FLAC subset codec (stdlib + numpy, no external libs).

Scope — honest subset of the public FLAC format (RFC 9639), 16-bit mono:

- encoder: STREAMINFO + frames with VERBATIM subframes, correct frame-header
  CRC-8 and frame CRC-16, MD5 signature in STREAMINFO.  Verbatim subframes
  are legal FLAC (any conforming decoder reads these files); they trade
  compression for a decode path that is pure `np.frombuffer` — the samples
  of a byte-aligned verbatim mono-16 subframe are a big-endian int16 run.
- decoder: CONSTANT and VERBATIM subframes, fixed or explicit blocksizes,
  sample rate from STREAMINFO or frame header.  FIXED/LPC-predicted
  subframes raise NotImplementedError (Rice-coded residual decode is
  bit-serial — the wrong shape for a vectorized validation hot path).
  Frame-header CRC-8 is always verified (few bytes); full frame CRC-16 and
  the STREAMINFO MD5 are verified when `verify=True` (test/strict mode) —
  the validation engine's SNR-vs-reference check subsumes payload
  integrity on the hot path.

Upstream great_expectations has no audio codec layer (the reference mount
is empty; SURVEY.md §0) — this exists for the north-rule audio payload
checks (BASELINE.json input_hint: decoded-PCM SNR >= 30 dB).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"
_BLOCKSIZE = 4096

# ---------------------------------------------------------------------------
# CRCs (FLAC frame CRC-8 poly 0x07, frame CRC-16 poly 0x8005, both init 0)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        c = byte << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if (c & top) else (c << 1)
        table.append(c & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    t = _CRC8_TABLE
    for b in data:
        c = t[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    t = _CRC16_TABLE
    for b in data:
        c = t[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _utf8_code(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame/sample numbers (up to 36 bits).

    A k-byte code carries (7-k) payload bits in the lead byte (k leading
    ones, then a zero) plus 6 bits per continuation byte."""
    if n < 0x80:
        return bytes([n])
    for k in range(2, 8):
        if n < (1 << ((7 - k) + 6 * (k - 1))):
            lead = ((0xFF << (8 - k)) & 0xFF) | (n >> (6 * (k - 1)))
            cont = [
                0x80 | ((n >> (6 * (k - 1 - i))) & 0x3F) for i in range(1, k)
            ]
            return bytes([lead] + cont)
    raise ValueError("frame number too large")


def _utf8_decode(b: bytes, pos: int) -> tuple[int, int]:
    lead = b[pos]
    if lead < 0x80:
        return lead, pos + 1
    k = 0
    while k < 8 and (lead << k) & 0x80:
        k += 1
    if k < 2 or k > 7 or pos + k > len(b):
        raise ValueError("invalid UTF-8 coded number")
    n = lead & (0xFF >> (k + 1))
    for i in range(1, k):
        c = b[pos + i]
        if (c & 0xC0) != 0x80:
            raise ValueError("invalid UTF-8 continuation")
        n = (n << 6) | (c & 0x3F)
    return n, pos + k


# blocksize code -> samples (codes 2..5 and 8..15 are fixed tables;
# 6/7 read 8/16-bit (blocksize-1) from the end of the header)
_BS_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
             8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
             13: 8192, 14: 16384, 15: 32768}
_BS_CODE = {v: k for k, v in _BS_FIXED.items()}


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def flac_encode(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Encode int16 mono PCM as a FLAC stream (verbatim subframes)."""
    pcm = np.asarray(pcm, dtype=np.int16)
    n = len(pcm)
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    # STREAMINFO: min/max blocksize u16, min/max framesize u24 (0 = unknown),
    # then sr(20) | channels-1(3) | bps-1(5) | total_samples(36) packed big-endian
    packed = (sr_hz << 44) | (0 << 41) | (15 << 36) | (n & ((1 << 36) - 1))
    streaminfo = (
        struct.pack(">HH", min(_BLOCKSIZE, max(n, 16)), _BLOCKSIZE)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + md5
    )
    out = [_MAGIC, bytes([0x80, 0, 0, 34]), streaminfo]
    frame_no = 0
    for start in range(0, n, _BLOCKSIZE):
        block = pcm[start : start + _BLOCKSIZE]
        bs = len(block)
        bs_code = _BS_CODE.get(bs, 7)  # partial last block -> explicit u16
        header = bytearray()
        header += b"\xff\xf8"  # sync(14) + reserved 0 + fixed blocking
        header.append((bs_code << 4) | 0)  # sample rate: from STREAMINFO
        header.append((0 << 4) | (0b100 << 1))  # mono | 16 bps | reserved
        header += _utf8_code(frame_no)
        if bs_code == 6:
            header.append(bs - 1)
        elif bs_code == 7:
            header += struct.pack(">H", bs - 1)
        header.append(crc8(bytes(header)))
        body = b"\x02" + block.astype(">i2").tobytes()  # verbatim subframe
        frame = bytes(header) + body
        out.append(frame + struct.pack(">H", crc16(frame)))
        frame_no += 1
    return b"".join(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def flac_decode(b: bytes, verify: bool = False) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream -> (sample_rate, int16 mono pcm).

    Raises ValueError on malformed/corrupt input, NotImplementedError on
    FIXED/LPC-predicted subframes (outside this subset)."""
    if len(b) < 42 or b[:4] != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = None
    total = None
    md5_expected = None
    # metadata blocks
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated metadata")
        last = b[pos] & 0x80
        btype = b[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        body = b[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            packed = int.from_bytes(body[10:18], "big")
            sr = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            md5_expected = body[18:34]
            if channels != 1 or bps != 16:
                raise NotImplementedError("subset decoder: 16-bit mono only")
        pos += 4 + blen
        if last:
            break
    if sr is None or sr == 0:
        raise ValueError("missing/invalid STREAMINFO")
    chunks: list[np.ndarray] = []
    got = 0
    while got < (total or 0) or (total == 0 and pos + 2 <= len(b)):
        if pos + 6 > len(b):
            raise ValueError("truncated frame")
        if b[pos] != 0xFF or (b[pos + 1] & 0xFE) != 0xF8:
            raise ValueError("bad frame sync")
        hstart = pos
        bs_code = b[pos + 2] >> 4
        sr_code = b[pos + 2] & 0x0F
        chan = b[pos + 3] >> 4
        bps_code = (b[pos + 3] >> 1) & 0x7
        if chan != 0 or bps_code != 0b100:
            raise NotImplementedError("subset decoder: 16-bit mono only")
        _, pos2 = _utf8_decode(b, pos + 4)
        if bs_code == 6:
            bs = b[pos2] + 1
            pos2 += 1
        elif bs_code == 7:
            bs = struct.unpack(">H", b[pos2 : pos2 + 2])[0] + 1
            pos2 += 2
        elif bs_code in _BS_FIXED:
            bs = _BS_FIXED[bs_code]
        else:
            raise ValueError("reserved blocksize code")
        frame_sr = sr
        if sr_code == 12:
            frame_sr = b[pos2] * 1000
            pos2 += 1
        elif sr_code in (13, 14):
            v = struct.unpack(">H", b[pos2 : pos2 + 2])[0]
            frame_sr = v if sr_code == 13 else v * 10
            pos2 += 2
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        if pos2 >= len(b):
            raise ValueError("truncated frame header")
        if crc8(b[hstart:pos2]) != b[pos2]:
            raise ValueError("frame header CRC-8 mismatch")
        pos2 += 1
        # subframe header
        sf = b[pos2]
        if sf & 0x80 or sf & 0x01:
            raise ValueError("bad subframe header (reserved/wasted bits)")
        sf_type = (sf >> 1) & 0x3F
        pos2 += 1
        if sf_type == 0:  # constant
            if pos2 + 2 > len(b):
                raise ValueError("truncated constant subframe")
            val = struct.unpack(">h", b[pos2 : pos2 + 2])[0]
            chunk = np.full(bs, val, dtype=np.int16)
            pos2 += 2
        elif sf_type == 1:  # verbatim: byte-aligned big-endian int16 run
            end = pos2 + 2 * bs
            if end > len(b):
                raise ValueError("truncated verbatim subframe")
            chunk = np.frombuffer(b[pos2:end], dtype=">i2").astype(np.int16)
            pos2 = end
        elif 8 <= sf_type <= 12 or sf_type >= 32:
            raise NotImplementedError(
                "subset decoder: FIXED/LPC-predicted subframes not supported"
            )
        else:
            raise ValueError("reserved subframe type")
        if pos2 + 2 > len(b):
            raise ValueError("truncated frame CRC")
        if verify and crc16(b[hstart:pos2]) != struct.unpack(
            ">H", b[pos2 : pos2 + 2]
        )[0]:
            raise ValueError("frame CRC-16 mismatch")
        pos = pos2 + 2
        chunks.append(chunk)
        got += bs
        if frame_sr != sr:
            raise ValueError("frame/STREAMINFO sample rate mismatch")
        if total and got >= total:
            break
    pcm = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int16)
    if total:
        pcm = pcm[:total]
    if verify and md5_expected and md5_expected != b"\x00" * 16:
        if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != md5_expected:
            raise ValueError("MD5 signature mismatch")
    return sr, pcm
