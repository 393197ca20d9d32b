"""Baseline + progressive JPEG codec from the public spec (ITU-T T.81 /
JFIF), stdlib + numpy only — no libjpeg in this sandbox.

Scope:
- decoder: baseline sequential DCT (SOF0), 8-bit, 1-component grayscale or
  3-component YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers,
  standard or custom Huffman/quant tables.  Returns (h, w, c) uint8.
  r5: progressive DCT (SOF2, T.81 Annex G) — spectral selection AND
  successive approximation: interleaved DC first/refine scans,
  non-interleaved AC band scans with EOB-run coding, AC refinement with
  correction bits; restart markers reset DC predictors and EOB runs.
- encoder: baseline 4:4:4 (or grayscale), Annex K quantization tables
  scaled by a quality factor (IJG curve) and Annex K typical Huffman
  tables.  Output decodes in any standard viewer.  r5:
  jpeg_encode_progressive emits a real multi-scan SOF2 stream (DC
  first+refine, per-component spectral AC bands at Al=1, AC refinement
  scans to Al=0 with buffered correction bits — the full Annex G
  encoding surface), coefficient-identical to the baseline encoding of
  the same pixels, so progressive-decode(progressive-encode(x)) ==
  baseline-decode(baseline-encode(x)) exactly (pinned in tests).

The Huffman bitstream is inherently serial, so entropy decode is a Python
loop per coefficient; the block transforms (IDCT/FDCT, dequantize, color
convert, upsample) are batched numpy over all blocks at once.  That makes
this codec correct and fast *enough* for validation workloads (small
thumbnails, spot checks); swap in libjpeg-turbo in production — callers
(gx_spark/image.py) only see decode_image().

Upstream great_expectations has no image codec layer (reference mount is
empty; SURVEY.md §0) — this closes the VERDICT r2 "real codec decode"
gap alongside gx_spark/png.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# 8x8 DCT basis (orthonormal DCT-II matrix): forward F = T @ X @ T.T,
# inverse X = T.T @ F @ T — batched over blocks with einsum
# ---------------------------------------------------------------------------

_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16)
_T *= np.sqrt(2.0 / 8.0)
_T[0] *= np.sqrt(0.5)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1/K.2 quantization tables (luminance, chrominance), raster order
_Q_LUMA_RASTER = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_Q_CHROMA_RASTER = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """(length, code) pairs in symbol order for a DHT bits table."""
    out = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((ln, code))
            code += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical-Huffman decode via the T.81 F.2.2.3 mincode/maxcode walk."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.huffval = huffval
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.read_bit()
        ln = 1
        while code > self.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("invalid Huffman code")
            code = (code << 1) | br.read_bit()
        return self.huffval[self.valptr[ln] + code - self.mincode[ln]]


class _BitReader:
    """MSB-first reader over an entropy-coded segment with 0xFF00 stuffing
    removed up-front; restart markers split segments before construction."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map the s-bit magnitude code to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def jpeg_header_scan(b: bytes) -> tuple[int, int, int]:
    """Structural validation WITHOUT entropy decode: walk every marker
    checking SOI, marker framing, segment lengths, exactly one SOFn,
    SOS before entropy data, byte-stuffing in the scan, and EOI
    reachability.  Returns (h, w, n_components) from the SOF header.

    This is the honesty boundary for coding processes the in-sandbox
    decoder does not implement (arithmetic/12-bit/lossless — progressive
    decodes for real as of r5): a VALID such stream passes the scan —
    its container must not be called corrupt just because we cannot
    decode the pixels — while garbage behind a JPEG magic, a truncated
    stream, or a malformed marker walk raises ValueError exactly as
    jpeg_decode would."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    frame = None
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if frame is None:
                raise ValueError("EOI before SOF")
            return frame
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(b):
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(b):
            raise ValueError("truncated marker segment")
        seg = b[pos + 2 : pos + seglen]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            # any SOFn, including the non-baseline coding processes
            if frame is not None:
                raise ValueError("multiple SOF markers")
            if len(seg) < 6:
                raise ValueError("short SOF")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            nc = seg[5]
            if h == 0 or w == 0 or nc == 0 or len(seg) != 6 + 3 * nc:
                raise ValueError("malformed SOF")
            frame = (h, w, nc)
        pos += seglen
        if marker == 0xDA:  # SOS: skip entropy bytes to the next marker
            if frame is None:
                raise ValueError("SOS before SOF")
            while pos + 1 < len(b):
                if (b[pos] == 0xFF and b[pos + 1] != 0x00
                        and not 0xD0 <= b[pos + 1] <= 0xD7):
                    break
                pos += 1
            else:
                raise ValueError("unterminated scan")
    raise ValueError("no EOI")


def jpeg_decode(b: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JPEG -> (h, w, c) uint8
    (c = 1 or 3, RGB for 3).  Raises ValueError on malformed input,
    NotImplementedError on arithmetic / 12-bit / lossless streams."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    prog = None  # progressive state: per-component zigzag coef grids
    saw_eoi = False
    # 2-byte lookahead: EOI and other standalone markers occupy exactly two
    # bytes at the stream tail; requiring 4 here would skip the trailing
    # EOI and make completeness undecidable for multi-scan streams.
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(b):
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        seg = b[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated marker segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                if p + 64 > len(seg):
                    raise ValueError("short DQT")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                nval = sum(bits)
                huffval = list(seg[p : p + nval])
                if len(huffval) != nval:
                    raise ValueError("short DHT")
                p += nval
                htables[(tc, th)] = _HuffDecoder(bits, huffval)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError("1 or 3 components only")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-DCT/arithmetic/hierarchical JPEG unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0x0F})
            if not frame.get("progressive"):
                pos += seglen
                return _decode_scan(b, pos, frame, scan, qtables, htables,
                                    restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if prog is None:
                prog = _ProgressiveState(frame)
            pos += seglen
            pos = prog.decode_scan(b, pos, scan, ss, se, ahal >> 4,
                                   ahal & 0x0F, htables, restart_interval)
            continue
        pos += seglen
    if prog is not None:
        if not saw_eoi:
            # a stream cut between the last scan's entropy data and EOI
            # (or mid-marker) must not pass as a complete image
            raise ValueError("truncated progressive stream (no EOI)")
        return prog.reconstruct(qtables)
    raise ValueError("no SOS marker found")


def _split_entropy(b: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data starting at `pos`: strip 0xFF00 stuffing, split
    at restart markers.  Returns (segments, position of the terminating
    marker's 0xFF)."""
    segments = []
    cur = bytearray()
    p = pos
    while p < len(b):
        byte = b[p]
        if byte == 0xFF and p + 1 < len(b):
            nxt = b[p + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(byte)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _reconstruct(frame, blocks, qtables, hmax, vmax, mcux, mcuy):
    """Per-component natural-order coefficient grids -> (h, w, c) uint8
    (dequantize, batched IDCT, upsample, color convert)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table")
        deq = blocks[ci].astype(np.float32) * q.astype(np.float32)
        spatial = np.einsum("ij,bjk,kl->bil", _T.T, deq, _T) + 128.0
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU grid resolution
        if c["h"] < hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])
    img = np.stack(planes, axis=2)[:h, :w, :]
    if len(comps) == 3:  # JFIF YCbCr -> RGB
        y, cb, cr = img[..., 0], img[..., 1] - 128.0, img[..., 2] - 128.0
        img = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def _decode_scan(b, pos, frame, scan, qtables, htables, restart_interval):
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    segments, _ = _split_entropy(b, pos)
    scan_by_cs = {s["cs"]: s for s in scan}
    # per-component coefficient block grids
    blocks = []
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        blocks.append(np.zeros((bh * bw, 8, 8), dtype=np.int32))
    dc_pred = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segments[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing restart segment")
                br = _BitReader(segments[seg_idx])
                dc_pred = [0] * len(comps)
                mcu_in_seg = 0
            for ci, c in enumerate(comps):
                sc = scan_by_cs.get(c["id"])
                if sc is None:
                    raise ValueError("component missing from scan")
                dc_t = htables.get((0, sc["td"]))
                ac_t = htables.get((1, sc["ta"]))
                if dc_t is None or ac_t is None:
                    raise ValueError("missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        s = dc_t.decode(br)
                        if s > 11:
                            raise ValueError("invalid DC category")
                        diff = _extend(br.read_bits(s), s) if s else 0
                        dc_pred[ci] += diff
                        coef[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(br)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[k] = _extend(br.read_bits(size), size)
                            k += 1
                        row = (my * c["v"] + by) * (mcux * c["h"]) \
                            + (mx * c["h"] + bx)
                        g = np.zeros((8, 8), dtype=np.int32)
                        g.flat[_ZIGZAG] = coef
                        blocks[ci][row] = g
            mcu_in_seg += 1
    return _reconstruct(frame, blocks, qtables, hmax, vmax, mcux, mcuy)


class _ProgressiveState:
    """SOF2 multi-scan decoder state (T.81 Annex G.2).

    Coefficients accumulate per component in ZIGZAG order across scans:
    interleaved DC scans (first: Huffman diff << Al; refinement: one
    appended bit), then non-interleaved AC band scans (spectral selection
    Ss..Se) — first scans use EOB-run coding, refinement scans emit one
    correction bit per already-nonzero coefficient while inserting
    newly-nonzero ±(1<<Al) values.  Restart markers reset the DC
    predictors, the EOB run, and the bit phase, exactly as in sequential
    mode.  reconstruct() feeds the finished grids through the shared
    dequant/IDCT path, so progressive and baseline pixels are produced by
    the same math."""

    def __init__(self, frame) -> None:
        self.frame = frame
        self.hmax, self.vmax, self.mcux, self.mcuy = _frame_geometry(frame)
        self.coefs = []  # per component: (nblocks, 64) int32, zigzag order
        self.grid_w = []
        for c in frame["comps"]:
            gw, gh = self.mcux * c["h"], self.mcuy * c["v"]
            self.coefs.append(np.zeros((gh * gw, 64), dtype=np.int64))
            self.grid_w.append(gw)

    # -- scan dispatch ----------------------------------------------------

    def decode_scan(self, b, pos, scan, ss, se, ah, al, htables,
                    restart_interval) -> int:
        segments, end = _split_entropy(b, pos)
        comps = self.frame["comps"]
        ids = {c["id"]: ci for ci, c in enumerate(comps)}
        members = []
        for s in scan:
            if s["cs"] not in ids:
                raise ValueError("scan component not in frame")
            members.append((ids[s["cs"]], s))
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            self._dc_scan(segments, members, ah, al, htables,
                          restart_interval)
        else:
            if len(members) != 1:
                raise ValueError("AC scans must be non-interleaved")
            if not (0 < ss <= se <= 63):
                raise ValueError("bad spectral band")
            self._ac_scan(segments, members[0], ss, se, ah, al, htables,
                          restart_interval)
        return end

    def _dc_scan(self, segments, members, ah, al, htables, restart_interval):
        comps = self.frame["comps"]
        if len(members) == 1:
            # Non-interleaved (T.81 A.2.3): a single-component scan's MCU
            # is ONE data unit, traversing the component's nominal
            # (unpadded) block grid in raster order — not the padded
            # interleaved MCU grid.  Custom scan scripts (jpegtran/mozjpeg
            # style "0: 0 0 0 0;") emit DC scans in this shape.
            ci, sc = members[0]
            c = comps[ci]
            cbw, cbh = _nominal_blocks(self.frame["w"], self.frame["h"],
                                       c["h"], c["v"], self.hmax, self.vmax)
            dc_t = htables.get((0, sc["td"]))
            if ah == 0 and dc_t is None:
                raise ValueError("missing DC table")
            pred = 0
            seg_idx, unit_in_seg = 0, 0
            br = _BitReader(segments[0])
            for by in range(cbh):
                for bx in range(cbw):
                    if restart_interval and unit_in_seg == restart_interval:
                        seg_idx += 1
                        if seg_idx >= len(segments):
                            raise ValueError("missing restart segment")
                        br = _BitReader(segments[seg_idx])
                        pred = 0
                        unit_in_seg = 0
                    coef = self.coefs[ci][by * self.grid_w[ci] + bx]
                    if ah == 0:
                        s = dc_t.decode(br)
                        if s > 11:
                            raise ValueError("invalid DC category")
                        diff = _extend(br.read_bits(s), s) if s else 0
                        pred += diff
                        coef[0] = pred << al
                    else:
                        if br.read_bit():
                            coef[0] |= 1 << al
                    unit_in_seg += 1
            return
        dc_pred = [0] * len(comps)
        seg_idx, mcu_in_seg = 0, 0
        br = _BitReader(segments[0])
        for my in range(self.mcuy):
            for mx in range(self.mcux):
                if restart_interval and mcu_in_seg == restart_interval:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("missing restart segment")
                    br = _BitReader(segments[seg_idx])
                    dc_pred = [0] * len(comps)
                    mcu_in_seg = 0
                for ci, sc in members:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = (my * c["v"] + by) * self.grid_w[ci] \
                                + (mx * c["h"] + bx)
                            coef = self.coefs[ci][row]
                            if ah == 0:
                                dc_t = htables.get((0, sc["td"]))
                                if dc_t is None:
                                    raise ValueError("missing DC table")
                                s = dc_t.decode(br)
                                if s > 11:
                                    raise ValueError("invalid DC category")
                                diff = _extend(br.read_bits(s), s) if s else 0
                                dc_pred[ci] += diff
                                coef[0] = dc_pred[ci] << al
                            else:
                                if br.read_bit():
                                    coef[0] |= 1 << al
                mcu_in_seg += 1

    def _ac_scan(self, segments, member, ss, se, ah, al, htables,
                 restart_interval):
        ci, sc = member
        c = self.frame["comps"][ci]
        ac_t = htables.get((1, sc["ta"]))
        if ac_t is None:
            raise ValueError("missing AC table")
        # nominal (unpadded) block dims of this component (T.81 A.1.1)
        cbw, cbh = _nominal_blocks(self.frame["w"], self.frame["h"],
                                   c["h"], c["v"], self.hmax, self.vmax)
        seg_idx, unit_in_seg, eobrun = 0, 0, 0
        br = _BitReader(segments[0])
        for by in range(cbh):
            for bx in range(cbw):
                if restart_interval and unit_in_seg == restart_interval:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("missing restart segment")
                    br = _BitReader(segments[seg_idx])
                    eobrun = 0
                    unit_in_seg = 0
                coef = self.coefs[ci][by * self.grid_w[ci] + bx]
                if ah == 0:
                    eobrun = self._ac_first(br, ac_t, coef, ss, se, al,
                                            eobrun)
                else:
                    eobrun = self._ac_refine(br, ac_t, coef, ss, se, al,
                                             eobrun)
                unit_in_seg += 1

    @staticmethod
    def _ac_first(br, ac_t, coef, ss, se, al, eobrun) -> int:
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = ac_t.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: run of (1<<r)+bits blocks ends here
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read_bits(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            coef[k] = _extend(br.read_bits(s), s) << al
            k += 1
        return eobrun

    @staticmethod
    def _ac_refine(br, ac_t, coef, ss, se, al, eobrun) -> int:
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = ac_t.decode(br)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r < 15:  # EOBn: current block continues below
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    # r == 15: run of 16 zero-HISTORY coefficients
                else:
                    if s != 1:
                        raise ValueError("AC refinement size must be 1")
                    val = p1 if br.read_bit() else m1
                # advance over nonzero-history coefficients (each carries
                # a correction bit), counting down r zero-history slots
                while k <= se:
                    if coef[k] != 0:
                        if br.read_bit() and (coef[k] & p1) == 0:
                            coef[k] += p1 if coef[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    coef[k] = val
                k += 1
        if eobrun > 0:
            # rest of this block's band: correction bits only
            while k <= se:
                if coef[k] != 0:
                    if br.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    def reconstruct(self, qtables) -> np.ndarray:
        blocks = []
        for zz in self.coefs:
            nat = np.zeros_like(zz)
            nat[:, _ZIGZAG] = zz
            blocks.append(nat.reshape(-1, 8, 8).astype(np.int32))
        return _reconstruct(self.frame, blocks, qtables, self.hmax,
                            self.vmax, self.mcux, self.mcuy)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4 / grayscale, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _EntropyAssembler:
    """A _BitWriter that can be split at restart boundaries: restart()
    byte-aligns (1-fill pad per spec) and inserts the next RSTn marker
    (m cycles 0..7, T.81 B.2.1.2); finish() returns the assembled
    entropy-coded data for one scan."""

    def __init__(self) -> None:
        self.parts: list[bytes] = []
        self.bw = _BitWriter()
        self.n_rst = 0

    def write(self, value: int, length: int) -> None:
        self.bw.write(value, length)

    def restart(self) -> None:
        self.parts.append(self.bw.flush())
        self.parts.append(bytes([0xFF, 0xD0 + self.n_rst % 8]))
        self.n_rst += 1
        self.bw = _BitWriter()

    def finish(self) -> bytes:
        self.parts.append(self.bw.flush())
        return b"".join(self.parts)


def _quality_scale(q_base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = np.clip((q_base * scale + 50) // 100, 1, 255)
    return tbl.astype(np.int32)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _prepare_encode(pixels: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: color convert, subsample, FDCT,
    quantize.  Returns (h, w, nc, samp, q_raster, all_zz, grid_w, mcux,
    mcuy) where all_zz[ci] is the (nblocks, 64) ZIGZAG-ordered quantized
    coefficient grid — the identical coefficients baseline and
    progressive emission then serialize."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("1 or 3 channels only")
    if nc == 3:  # RGB -> YCbCr (JFIF)
        r, g, bl = (px[..., i].astype(np.float32) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * bl,
            -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0,
        ]
    else:
        planes = [px[..., 0].astype(np.float32)]
    sub = 2 if (subsample and nc == 3) else 1
    samp = [(sub, sub)] + [(1, 1)] * (nc - 1)  # (h, v) per component
    hmax = vmax = sub
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if sub == 2:  # box-filter chroma to half resolution
        for ci in (1, 2):
            p = np.pad(planes[ci], ((0, h % 2), (0, w % 2)), mode="edge")
            planes[ci] = (
                p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
    q_raster = [_quality_scale(_Q_LUMA_RASTER, quality)]
    if nc == 3:
        q_raster.append(_quality_scale(_Q_CHROMA_RASTER, quality))
    q_mats = [q.reshape(8, 8) for q in q_raster]

    # per-component quantized coefficient blocks on the MCU-aligned grid
    all_zz = []
    grid_w = []
    for ci, plane in enumerate(planes):
        ch, cv = samp[ci]
        gw, gh = mcux * ch, mcuy * cv  # grid in blocks
        ph, pw = plane.shape
        padded = np.pad(
            plane, ((0, gh * 8 - ph), (0, gw * 8 - pw)), mode="edge"
        )
        blocks = (
            padded.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8) - 128.0
        )
        coefs = np.einsum("ij,bjk,kl->bil", _T, blocks, _T.T)
        qi = q_mats[min(ci, len(q_mats) - 1)].astype(np.float32)
        quant = np.round(coefs / qi).astype(np.int32)
        all_zz.append(quant.reshape(-1, 64)[:, _ZIGZAG])
        grid_w.append(gw)
    return h, w, nc, samp, q_raster, all_zz, grid_w, mcux, mcuy


def _frame_headers(h, w, nc, samp, q_raster, sof_marker: bytes) -> bytearray:
    """SOI + APP0 + DQT + SOF segments shared by both encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0
    for tq, q in enumerate(q_raster):  # DQT (zigzag byte order)
        zz = q.reshape(8, 8).flatten()[_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(x) for x in zz
        )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        ch, cv = samp[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, min(ci, len(q_raster) - 1)])
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    return out


def jpeg_encode(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(h, w, c) uint8 (c = 1 or 3) -> baseline JFIF JPEG bytes.
    subsample=True emits 4:2:0 (2x2 luma sampling, box-filtered chroma)."""
    h, w, nc, samp, q_raster, all_zz, grid_w, mcux, mcuy = _prepare_encode(
        pixels, quality, subsample)
    dc_code = [dict(zip(_DC_LUMA[1], _canonical_codes(_DC_LUMA[0]))),
               dict(zip(_DC_CHROMA[1], _canonical_codes(_DC_CHROMA[0])))]
    ac_code = [dict(zip(_AC_LUMA[1], _canonical_codes(_AC_LUMA[0]))),
               dict(zip(_AC_CHROMA[1], _canonical_codes(_AC_CHROMA[0])))]

    bwr = _BitWriter()
    dc_pred = [0] * nc

    def emit_block(ci: int, bi: int) -> None:
        t = min(ci, 1)
        zz = all_zz[ci][bi]
        diff = int(zz[0]) - dc_pred[ci]
        dc_pred[ci] = int(zz[0])
        s = _category(diff)
        ln, code = dc_code[t][s]
        bwr.write(code, ln)
        if s:
            bwr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_code[t][0xF0]
                bwr.write(code, ln)
                run -= 16
            s = _category(v)
            ln, code = ac_code[t][(run << 4) | s]
            bwr.write(code, ln)
            bwr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            ln, code = ac_code[t][0x00]
            bwr.write(code, ln)

    for my in range(mcuy):  # MCU-interleaved emission (T.81 A.2.3)
        for mx in range(mcux):
            for ci in range(nc):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        emit_block(
                            ci,
                            (my * cv + by) * grid_w[ci] + mx * ch + bx,
                        )
    entropy = bwr.flush()

    out = _frame_headers(h, w, nc, samp, q_raster, b"\xff\xc0")
    for tc, tables in ((0, (_DC_LUMA, _DC_CHROMA)), (1, (_AC_LUMA, _AC_CHROMA))):
        for th in range(2 if nc == 3 else 1):
            bits, vals = tables[th]
            body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nc]) + b"".join(
        bytes([ci + 1, (min(ci, 1) << 4) | min(ci, 1)]) for ci in range(nc)
    ) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2, T.81 Annex G.1): DC first + refine, spectral
# AC bands at Al=1, AC refinement scans to Al=0 with buffered correction
# bits — same quantized coefficients as the baseline encoder.
# ---------------------------------------------------------------------------

# Near-flat Huffman table covering every (RRRR,SSSS) byte: progressive AC
# scans need EOBn symbols (0x10..0xE0) that Annex K's sequential tables
# lack; 128 codes at length 8 + 128 at length 9 is a valid canonical
# table per T.81 C.2 (DHT length counts are single bytes, so one flat
# length cannot hold all 256) and keeps the encoder static.  Larger
# output than optimized per-image tables — fixtures and validation
# probes, not archival.
_AC_FLAT = ([0] * 7 + [128, 128] + [0] * 7, list(range(256)))


def _nominal_blocks(w, h, ch, cv, hmax, vmax):
    cw = -(-w * ch // hmax)
    chh = -(-h * cv // vmax)
    return -(-cw // 8), -(-chh // 8)


def jpeg_encode_progressive(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, c) uint8 -> progressive (SOF2) JFIF JPEG.  Scan script:
    interleaved DC first (Al=1) + DC refine; per-component spectral AC
    bands (luma split 1-5 / 6-63) at Al=1; per-component AC refinement to
    Al=0.  Coefficient-identical to jpeg_encode at the same quality.
    `restart_interval` > 0 emits DRI + RSTn markers every that-many MCUs
    (interleaved scans) / blocks (AC scans), flushing the EOB run and
    resetting DC predictors at each boundary per T.81 — exercises the
    decoder's restart path."""
    h, w, nc, samp, q_raster, all_zz, grid_w, mcux, mcuy = _prepare_encode(
        pixels, quality, subsample)
    ri = max(0, int(restart_interval))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    dc_code = [dict(zip(_DC_LUMA[1], _canonical_codes(_DC_LUMA[0]))),
               dict(zip(_DC_CHROMA[1], _canonical_codes(_DC_CHROMA[0])))]
    ac_code = dict(zip(_AC_FLAT[1], _canonical_codes(_AC_FLAT[0])))

    out = _frame_headers(h, w, nc, samp, q_raster, b"\xff\xc2")
    for th in range(2 if nc == 3 else 1):  # DC tables (Annex K)
        bits, vals = (_DC_LUMA, _DC_CHROMA)[th]
        body = bytes([th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    body = bytes([0x10]) + bytes(_AC_FLAT[0]) + bytes(_AC_FLAT[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)

    def sos(members, ss, se, ah, al, entropy):
        nonlocal out
        hdr = bytes([len(members)])
        for ci, td, ta in members:
            hdr += bytes([ci + 1, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr
        out += entropy

    # -- scan 1: DC first, interleaved, Al=1 --
    al = 1
    bw = _EntropyAssembler()
    dc_pred = [0] * nc
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_i and mcu_i % ri == 0:
                bw.restart()
                dc_pred = [0] * nc
            mcu_i += 1
            for ci in range(nc):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * grid_w[ci] + mx * ch + bx
                        v = int(all_zz[ci][bi][0]) >> al  # arithmetic shift
                        diff = v - dc_pred[ci]
                        dc_pred[ci] = v
                        s = _category(diff)
                        ln, code = dc_code[min(ci, 1)][s]
                        bw.write(code, ln)
                        if s:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s)
    sos([(ci, min(ci, 1), 0) for ci in range(nc)], 0, 0, 0, al, bw.finish())

    # -- scan 2: DC refine to Al=0, interleaved (one bit per block) --
    bw = _EntropyAssembler()
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_i and mcu_i % ri == 0:
                bw.restart()
            mcu_i += 1
            for ci in range(nc):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * grid_w[ci] + mx * ch + bx
                        bw.write(int(all_zz[ci][bi][0]) & 1, 1)
    sos([(ci, 0, 0) for ci in range(nc)], 0, 0, 1, 0, bw.finish())

    # -- AC first scans, Al=1 (luma spectrally split, chroma full band) --
    bands = {0: [(1, 5), (6, 63)]}
    for ci in range(nc):
        for ss, se in bands.get(ci, [(1, 63)]):
            bw = _EntropyAssembler()
            _emit_ac_first(bw, ac_code, all_zz[ci], grid_w[ci],
                           *_nominal_blocks(w, h, *samp[ci], hmax, vmax),
                           ss, se, 1, ri)
            sos([(ci, 0, 0)], ss, se, 0, 1, bw.finish())

    # -- AC refinement scans to Al=0 --
    for ci in range(nc):
        bw = _EntropyAssembler()
        _emit_ac_refine(bw, ac_code, all_zz[ci], grid_w[ci],
                        *_nominal_blocks(w, h, *samp[ci], hmax, vmax),
                        1, 63, 0, ri)
        sos([(ci, 0, 0)], 1, 63, 1, 0, bw.finish())

    out += b"\xff\xd9"
    return bytes(out)


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: v / 2^Al truncated toward zero (T.81 G.1.2.2)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _emit_ac_first(bw, ac_code, zz, gw, cbw, cbh, ss, se, al,
                   restart_interval: int = 0) -> None:
    eobrun = 0
    unit = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun == 0:
            return
        r = eobrun.bit_length() - 1
        ln, code = ac_code[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(eobrun - (1 << r), r)
        eobrun = 0

    for by in range(cbh):
        for bx in range(cbw):
            if restart_interval and unit and unit % restart_interval == 0:
                flush_eob()
                bw.restart()
            unit += 1
            coef = zz[by * gw + bx]
            run = 0
            for k in range(ss, se + 1):
                t = _trunc_shift(int(coef[k]), al)
                if t == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    ln, code = ac_code[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = _category(t)
                ln, code = ac_code[(run << 4) | s]
                bw.write(code, ln)
                bw.write(t if t >= 0 else t + (1 << s) - 1, s)
                run = 0
            if run > 0:  # band ends in zeros -> block joins the EOB run
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def _emit_ac_refine(bw, ac_code, zz, gw, cbw, cbh, ss, se, al,
                    restart_interval: int = 0) -> None:
    """T.81 G.1.2.3 refinement emission (the shape libjpeg's jcphuff
    documents): newly-nonzero coefficients (|v|>>Al == 1) emit
    (run-of-zero-HISTORY, size=1) + a sign bit; already-nonzero ones
    contribute one correction bit.  TWO bit buffers reproduce the
    decoder's interleaved read order: `cur` holds the current block's
    bits since its last emitted symbol (flushed right after each symbol —
    the decoder reads them while advancing to the symbol's position);
    `eob_bits` holds completed EOB-run blocks' bits (flushed with the
    EOBn symbol — the decoder reads them while draining the run)."""
    eobrun = 0
    eob_bits: list[int] = []

    def flush_eob():
        nonlocal eobrun, eob_bits
        if eobrun == 0:
            return
        r = eobrun.bit_length() - 1
        ln, code = ac_code[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(eobrun - (1 << r), r)
        for bit in eob_bits:
            bw.write(bit, 1)
        eobrun = 0
        eob_bits = []

    unit = 0
    for by in range(cbh):
        for bx in range(cbw):
            if restart_interval and unit and unit % restart_interval == 0:
                flush_eob()
                bw.restart()
            unit += 1
            coef = zz[by * gw + bx]
            # span since the last emitted symbol, in k order:
            # None = zero-history slot, int = a history correction bit
            span: list = []
            for k in range(ss, se + 1):
                t = _trunc_shift(int(coef[k]), al)
                a = -t if t < 0 else t
                if a == 0:
                    span.append(None)
                    continue
                if a > 1:  # history coefficient: one correction bit
                    span.append(a & 1)
                    continue
                # newly nonzero at this precision
                flush_eob()
                nzero = sum(1 for x in span if x is None)
                while nzero > 15:
                    # ZRL window: the decoder consumes exactly 16
                    # zero-history slots, reading the correction bits it
                    # passes — emit ONLY that window's bits after the ZRL
                    ln, code = ac_code[0xF0]
                    bw.write(code, ln)
                    consumed = 0
                    while consumed < 16:
                        x = span.pop(0)
                        if x is None:
                            consumed += 1
                        else:
                            bw.write(x, 1)
                    nzero -= 16
                ln, code = ac_code[(nzero << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if t > 0 else 0, 1)
                for x in span:  # remaining bits up to this coefficient
                    if x is not None:
                        bw.write(x, 1)
                span = []
            if span:  # block tail joins the EOB run
                eobrun += 1
                eob_bits.extend(x for x in span if x is not None)
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
