"""Spec-conformant Ogg-Opus CONTAINER codec (stdlib + numpy-free).

Scope — the container layer only, from the public specs:

- RFC 3533 (Ogg): page framing, lacing, BOS/EOS flags, granule positions,
  and the Ogg CRC-32 (poly 0x04C11DB7, init 0, unreflected, no final
  xor, computed with the CRC field zeroed) — verified on every page.
- RFC 7845 (Ogg encapsulation for Opus): OpusHead (version, channels,
  pre-skip, input_sample_rate) + OpusTags headers, 48 kHz granule clock,
  duration = (last granule − pre-skip) / 48000.

The Opus PACKET payloads themselves (CELT/SILK bitstream) are NOT
decodable in-sandbox and are deterministic opaque bytes here; the
validation engine therefore certifies opus rows at the container level —
page CRC integrity, OpusHead sample-rate consistency with the metadata
column, and granule-position duration consistency — and leaves the PCM
SNR check null for them (audio.py's decode path documents this split).

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
    pre_skip: int = 0,
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
    packets = [
        struct.pack("<I", (seed + i) & 0xFFFFFFFF) * 10  # 40 opaque bytes
        for i in range(n_packets)
    ]
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
    """Demux + verify an Ogg-Opus stream: every page magic and CRC checked,
    OpusHead parsed.  Returns {"input_sr", "pre_skip", "dur_ms",
    "n_pages"}; raises ValueError on any malformed/corrupt structure."""
    pos = 0
    n_pages = 0
    input_sr = pre_skip = None
    last_granule = 0
    saw_eos = False
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
        elif n_pages == 1:
            if body[:8] != _TAGS_MAGIC:
                raise ValueError("second page is not OpusTags")
        else:
            last_granule = max(last_granule, granule)
        if htype & 0x04:
            saw_eos = True
        n_pages += 1
        pos = page_end
    if n_pages < 3 or input_sr is None:
        raise ValueError("incomplete Ogg-Opus stream")
    if not saw_eos:
        raise ValueError("missing EOS page")
    dur_ms = max(0, (last_granule - pre_skip) * 1000) // _GRANULE_HZ
    return {"input_sr": int(input_sr), "pre_skip": int(pre_skip),
            "dur_ms": int(dur_ms), "n_pages": n_pages}
