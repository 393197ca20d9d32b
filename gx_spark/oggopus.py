"""Spec-conformant Ogg-Opus CONTAINER codec (stdlib + numpy-free).

Scope — the container layer only, from the public specs:

- RFC 3533 (Ogg): page framing, lacing, BOS/EOS flags, granule positions,
  and the Ogg CRC-32 (poly 0x04C11DB7, init 0, unreflected, no final
  xor, computed with the CRC field zeroed) — verified on every page.
- RFC 7845 (Ogg encapsulation for Opus): OpusHead (version, channels,
  pre-skip, input_sample_rate) + OpusTags headers, 48 kHz granule clock,
  duration = (last granule − pre-skip) / 48000.

- RFC 6716 §3 (Opus packet FRAMING): every audio packet is reassembled
  from the lacing values (including 255-continuation across pages) and
  its TOC byte + frame-count code + frame-length coding validated under
  the spec's R1-R7 malformed-packet rules; the per-packet TOC durations
  form an independent clock that must agree with the granule positions.

Only the frame CONTENTS (the CELT/SILK range-coded bitstream) stay
opaque — no entropy decoder in-sandbox — so the PCM SNR check is null
for opus rows (audio.py's decode path documents this split); everything
above that layer (pages, CRCs, OpusHead, packet framing, both duration
clocks, channel consistency) is verified for real.

No upstream analog (reference mount empty; SURVEY.md §0); exists for the
north-rule audio table's `codec='opus'` rows.
"""

from __future__ import annotations

import struct
import zlib

_OGG_MAGIC = b"OggS"
_HEAD_MAGIC = b"OpusHead"
_TAGS_MAGIC = b"OpusTags"
_GRANULE_HZ = 48_000  # RFC 7845 §4: granule clock is always 48 kHz

# RFC 6716 §3.1 Table 2: TOC config → (mode, bandwidth, frame duration ms).
# SILK configs 0-11, Hybrid 12-15, CELT 16-31.
_OPUS_CONFIGS: dict[int, tuple[str, str, float]] = {}
for _base, _mode, _bands, _sizes in (
    (0, "silk", ("nb", "mb", "wb"), (10.0, 20.0, 40.0, 60.0)),
    (12, "hybrid", ("swb", "fb"), (10.0, 20.0)),
    (16, "celt", ("nb", "wb", "swb", "fb"), (2.5, 5.0, 10.0, 20.0)),
):
    for _bi, _b in enumerate(_bands):
        for _si, _s in enumerate(_sizes):
            _OPUS_CONFIGS[_base + _bi * len(_sizes) + _si] = (_mode, _b, _s)


def opus_packet_parse(pkt: bytes) -> dict:
    """Parse one Opus packet's FRAMING layer (RFC 6716 §3 — TOC byte,
    frame-count codes 0-3, two-byte frame lengths, padding), enforcing
    the spec's R1-R7 malformed-packet rules.  Returns {"mode",
    "bandwidth", "frame_ms", "stereo", "n_frames", "dur_ms"}; raises
    ValueError on a malformed packet.  The frame CONTENTS (CELT/SILK
    range-coded bitstream) stay opaque — framing is exactly the layer a
    validation engine can certify without a full decoder."""
    if len(pkt) < 1:
        raise ValueError("empty Opus packet (R1)")
    toc = pkt[0]
    config, stereo, code = toc >> 3, bool(toc & 0x4), toc & 0x3
    mode, bandwidth, frame_ms = _OPUS_CONFIGS[config]
    body = pkt[1:]

    def _frame_len(buf: bytes, at: int) -> tuple[int, int]:
        # §3.2.1: 0..251 one byte; 252..255 -> second byte: len = b2*4 + b1
        if at >= len(buf):
            raise ValueError("truncated frame length")
        v = buf[at]
        if v < 252:
            return v, at + 1
        if at + 1 >= len(buf):
            raise ValueError("truncated two-byte frame length")
        return buf[at + 1] * 4 + v, at + 2

    if code == 0:
        n_frames, lens, pos = 1, [len(body)], len(body)
    elif code == 1:
        if len(body) % 2:
            raise ValueError("code-1 packet with odd payload (R3)")
        n_frames, lens, pos = 2, [len(body) // 2] * 2, len(body)
    elif code == 2:
        l1, pos = _frame_len(body, 0)
        if l1 > len(body) - pos:
            raise ValueError("code-2 first frame overruns packet (R4)")
        n_frames, lens = 2, [l1, len(body) - pos - l1]
        pos = len(body)
    else:  # code 3
        if not body:
            raise ValueError("code-3 packet without count byte (R6)")
        fc = body[0]
        n_frames = fc & 0x3F
        vbr, padded = bool(fc & 0x80), bool(fc & 0x40)
        if n_frames < 1:
            raise ValueError("code-3 packet with zero frames (R5)")
        pos = 1
        pad = 0
        if padded:
            while True:
                if pos >= len(body):
                    raise ValueError("truncated padding length")
                p = body[pos]
                pos += 1
                pad += p if p < 255 else 254
                if p != 255:
                    break
        avail = len(body) - pos - pad
        if avail < 0:
            raise ValueError("padding exceeds packet (R6)")
        if vbr:
            lens = []
            for _ in range(n_frames - 1):
                ln, pos = _frame_len(body, pos)
                lens.append(ln)
            last = len(body) - pos - pad - sum(lens)
            if last < 0:
                raise ValueError("VBR frames overrun packet (R7)")
            lens.append(last)
        else:
            if avail % n_frames:
                raise ValueError("CBR payload not divisible (R6)")
            lens = [avail // n_frames] * n_frames
    if any(ln > 1275 for ln in lens):
        raise ValueError("frame exceeds 1275 bytes (R2)")
    dur_ms = frame_ms * n_frames
    if dur_ms > 120.0:
        raise ValueError("packet exceeds 120 ms (R5)")
    return {"mode": mode, "bandwidth": bandwidth, "frame_ms": frame_ms,
            "stereo": stereo, "n_frames": n_frames, "dur_ms": dur_ms}


def opus_packet_encode(payload: bytes, config: int = 31,
                       stereo: bool = False) -> bytes:
    """One code-0 (single-frame) Opus packet: a real TOC byte (default
    config 31 = CELT fullband 20 ms) followed by the frame bytes."""
    if len(payload) > 1275:
        raise ValueError("frame exceeds 1275 bytes (R2)")
    return bytes([(config << 3) | (0x4 if stereo else 0)]) + payload


def _crc_table() -> list[int]:
    table = []
    for byte in range(256):
        c = byte << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) if (c & 0x80000000) else (c << 1)
        table.append(c & 0xFFFFFFFF)
    return table


_CRC = _crc_table()


def ogg_crc(data: bytes) -> int:
    c = 0
    t = _CRC
    for b in data:
        c = ((c << 8) & 0xFFFFFFFF) ^ t[((c >> 24) & 0xFF) ^ b]
    return c


def _lacing(sizes: list[int]) -> bytes:
    out = bytearray()
    for s in sizes:
        while s >= 255:
            out.append(255)
            s -= 255
        out.append(s)
    return bytes(out)


def _page(
    header_type: int, granule: int, serial: int, seq: int,
    packets: list[bytes],
) -> bytes:
    sizes = [len(p) for p in packets]
    lac = _lacing(sizes)
    if len(lac) > 255:
        raise ValueError("too many lacing values for one page")
    body = b"".join(packets)
    head = struct.pack(
        "<4sBBqIII", _OGG_MAGIC, 0, header_type,
        granule & 0xFFFFFFFFFFFFFFFF, serial, seq, 0,
    ) + bytes([len(lac)]) + lac
    crc = ogg_crc(head + body)
    head = head[:22] + struct.pack("<I", crc) + head[26:]
    return head + body


def ogg_opus_encode(
    clip_id: str, input_sr: int, dur_ms: int, serial: int | None = None,
    pre_skip: int = 0, corrupt_packet: bool = False,
) -> bytes:
    """Mux a valid Ogg-Opus stream whose CONTAINER metadata describes a
    clip of `dur_ms` at `input_sr`: OpusHead/OpusTags header pages + one
    EOS audio page of deterministic 20 ms packets with the correct final
    granule position.  Packet bytes are an opaque deterministic pattern
    (no CELT encoder in-sandbox) — every container field is real."""
    if serial is None:
        serial = zlib.crc32(clip_id.encode()) & 0x7FFFFFFF
    head = _HEAD_MAGIC + struct.pack(
        "<BBHIhB", 1, 1, pre_skip, input_sr, 0, 0)
    tags = _TAGS_MAGIC + struct.pack("<I", 8) + b"gx-spark" + struct.pack("<I", 0)
    pages = [
        _page(0x02, 0, serial, 0, [head]),   # BOS: OpusHead
        _page(0x00, 0, serial, 1, [tags]),   # OpusTags
    ]
    total_granule = pre_skip + (dur_ms * _GRANULE_HZ) // 1000
    n_packets = max(1, dur_ms // 20)
    seed = zlib.crc32((clip_id + "opus").encode())
    # real RFC 6716 framing: code-0 CELT-fullband-20ms TOC + 39 opaque
    # frame bytes (the range-coded frame CONTENTS are the only stub)
    packets = [
        opus_packet_encode(
            (struct.pack("<I", (seed + i) & 0xFFFFFFFF) * 10)[:39])
        for i in range(n_packets)
    ]
    if corrupt_packet:
        # a PACKET-level (not page-level) corruption: code-3 TOC whose
        # count byte declares zero frames — pages and CRCs stay valid, so
        # only the RFC 6716 framing check can catch it (test fodder)
        packets[0] = bytes([(31 << 3) | 3, 0x80])
    # one audio page per <=100 packets (lacing-table bound)
    seq = 2
    for i in range(0, len(packets), 100):
        chunk = packets[i:i + 100]
        last = i + len(chunk) == len(packets)
        granule = total_granule if last else (
            pre_skip + ((i + len(chunk)) * 20 * _GRANULE_HZ) // 1000)
        pages.append(_page(0x04 if last else 0x00, granule, serial, seq, chunk))
        seq += 1
    return b"".join(pages)


def ogg_opus_parse(b: bytes) -> dict:
    """Demux + verify an Ogg-Opus stream: every page magic and CRC
    checked, OpusHead parsed, and every audio PACKET's RFC 6716 framing
    validated (TOC config, frame-count codes, length coding, the R1-R7
    rules) after lacing/continuation reassembly.  Returns {"input_sr",
    "pre_skip", "dur_ms", "n_pages", "n_packets", "packet_dur_ms",
    "channels"} where packet_dur_ms sums the per-packet TOC durations —
    an independent clock the granule positions must agree with; raises
    ValueError on any malformed/corrupt structure, including a stereo
    packet inside a mono (OpusHead channels=1) stream."""
    pos = 0
    n_pages = 0
    input_sr = pre_skip = None
    channels = None
    last_granule = 0
    saw_eos = False
    n_packets = 0
    packet_dur_ms = 0.0
    pending = b""  # packet bytes continuing across lacing/page boundaries
    while pos < len(b):
        if b[pos:pos + 4] != _OGG_MAGIC:
            raise ValueError("bad Ogg capture pattern")
        if pos + 27 > len(b):
            raise ValueError("truncated page header")
        (magic, version, htype, granule, serial, seq, crc) = struct.unpack(
            "<4sBBqIII", b[pos:pos + 26])
        if version != 0:
            raise ValueError("bad Ogg version")
        n_seg = b[pos + 26]
        seg_end = pos + 27 + n_seg
        if seg_end > len(b):
            raise ValueError("truncated segment table")
        lac = b[pos + 27:seg_end]
        body_len = sum(lac)
        page_end = seg_end + body_len
        if page_end > len(b):
            raise ValueError("truncated page body")
        page = bytearray(b[pos:page_end])
        page[22:26] = b"\0\0\0\0"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        body = b[seg_end:page_end]
        if n_pages == 0:
            if not (htype & 0x02) or body[:8] != _HEAD_MAGIC:
                raise ValueError("first page is not an OpusHead BOS page")
            if len(body) < 19:
                raise ValueError("short OpusHead")
            ver, ch, pre_skip, input_sr, _gain, _fam = struct.unpack(
                "<BBHIhB", body[8:19])
            if ver not in (1,) or ch < 1:
                raise ValueError("bad OpusHead")
            channels = int(ch)
        elif n_pages == 1:
            if body[:8] != _TAGS_MAGIC:
                raise ValueError("second page is not OpusTags")
        else:
            last_granule = max(last_granule, granule)
            # packet reassembly (RFC 3533 lacing): values < 255 terminate
            # a packet, 255 continues it — across pages via the 0x01 flag
            if pending and not (htype & 0x01):
                raise ValueError("packet left open at page boundary")
            off = 0
            for lv in lac:
                pending += body[off:off + lv]
                off += lv
                if lv < 255:
                    pk = opus_packet_parse(pending)
                    if pk["stereo"] and channels == 1:
                        raise ValueError("stereo packet in a mono stream")
                    n_packets += 1
                    packet_dur_ms += pk["dur_ms"]
                    pending = b""
        if htype & 0x04:
            saw_eos = True
        n_pages += 1
        pos = page_end
    if n_pages < 3 or input_sr is None:
        raise ValueError("incomplete Ogg-Opus stream")
    if not saw_eos:
        raise ValueError("missing EOS page")
    if pending:
        raise ValueError("final packet left open (dangling continuation)")
    if n_packets == 0:
        raise ValueError("no audio packets")
    dur_ms = max(0, (last_granule - pre_skip) * 1000) // _GRANULE_HZ
    # the TOC-declared packet clock and the granule clock must agree to
    # within one packet (the last packet may be shorter via end-trimming,
    # RFC 7845 §4.5)
    if abs(packet_dur_ms - dur_ms) > 120.0:
        raise ValueError(
            f"packet durations ({packet_dur_ms} ms) disagree with granule "
            f"duration ({dur_ms} ms)")
    return {"input_sr": int(input_sr), "pre_skip": int(pre_skip),
            "dur_ms": int(dur_ms), "n_pages": n_pages,
            "n_packets": n_packets, "packet_dur_ms": float(packet_dur_ms),
            "channels": channels}
