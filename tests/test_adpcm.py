"""IMA ADPCM codec (gx_spark/adpcm.py + WAV tag-0x11 container wiring in
gx_spark/audio.py): round-trip fidelity, exact block framing arithmetic,
block independence, container validation, and the transcode path."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.adpcm import (  # noqa: E402
    DEFAULT_BLOCK_ALIGN,
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_decode_blocks,
    adpcm_encode_blocks,
    samples_per_block,
)
from gx_spark.audio import decode_payload, encode_payload, snr_db  # noqa: E402

SR = 16000


def _tone(f: float, amp: float, n: int = 4800) -> np.ndarray:
    t = np.arange(n) / SR
    return np.rint(amp * 32767 * np.sin(2 * np.pi * f * t)).astype(np.int16)


def test_tables_are_the_public_ima_tables():
    # spot-pin the canonical 1992 tables (first/last entries + size)
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert STEP_TABLE[44] == 494
    assert list(INDEX_TABLE) == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_roundtrip_snr_and_exact_length():
    for f, amp in ((200.0, 0.3), (392.0, 0.2), (700.0, 0.1)):
        pcm = _tone(f, amp)
        b = encode_payload(pcm, SR, "adpcm_ima")
        sr2, dec = decode_payload(b, "adpcm_ima")
        assert sr2 == SR
        assert len(dec) == len(pcm)  # fact chunk trims the padded block
        assert snr_db(pcm, dec) > 25.0, (f, amp)


def test_payload_size_is_exact_block_arithmetic():
    # 4800 samples, 256-byte blocks, 505 samples/block -> 10 blocks
    # RIFF(12) + fmt hdr(8)+fmt(20) + fact(12) + data hdr(8) + 2560
    pcm = _tone(200.0, 0.3, 4800)
    b = encode_payload(pcm, SR, "adpcm_ima")
    assert samples_per_block(DEFAULT_BLOCK_ALIGN) == 505
    assert len(b) == 12 + 28 + 12 + 8 + 10 * 256 == 2620


def test_blocks_decode_independently():
    # drop the first block: the rest must still decode (header re-seeds)
    pcm = _tone(300.0, 0.3, 505 * 3)  # exactly 3 blocks
    stream = adpcm_encode_blocks(pcm)
    assert len(stream) == 3 * 256
    tail = adpcm_decode_blocks(stream[256:], 505 * 2)
    full = adpcm_decode_blocks(stream, 505 * 3)
    assert np.array_equal(tail, full[505:])


def test_encode_is_deterministic_and_state_carries():
    pcm = _tone(250.0, 0.25, 1200)
    assert adpcm_encode_blocks(pcm) == adpcm_encode_blocks(pcm)
    # second block's header index should be the carried encoder state,
    # not 0 (a steady tone drives the step index up)
    stream = adpcm_encode_blocks(pcm)
    _, idx1, _ = struct.unpack("<hBB", stream[256:260])
    assert idx1 > 0


def test_decode_validation_errors():
    with pytest.raises(ValueError):
        adpcm_decode_blocks(b"\x00" * 300, 100)  # not whole blocks
    with pytest.raises(ValueError):
        adpcm_decode_blocks(b"\x00" * 256, 1000)  # fact count too large
    bad = bytearray(adpcm_encode_blocks(_tone(200.0, 0.3, 505)))
    bad[2] = 99  # step index out of range
    with pytest.raises(ValueError):
        adpcm_decode_blocks(bytes(bad), 505)


def test_container_validation():
    pcm = _tone(200.0, 0.3, 1000)
    b = encode_payload(pcm, SR, "adpcm_ima")
    # mislabeled row must raise, both directions
    with pytest.raises(ValueError):
        decode_payload(b, "pcm_s16le")
    with pytest.raises(ValueError):
        decode_payload(encode_payload(pcm, SR, "pcm_s16le"), "adpcm_ima")
    # strip the fact chunk -> invalid compressed WAV
    no_fact = b[:48] + b[60:]
    patched = bytearray(no_fact)
    patched[4:8] = struct.pack("<I", len(no_fact) - 8)
    with pytest.raises(ValueError):
        decode_payload(bytes(patched), "adpcm_ima")


def test_silence_and_edge_lengths():
    for n in (1, 2, 505, 506, 1010):
        pcm = np.zeros(n, dtype=np.int16)
        sr2, dec = decode_payload(
            encode_payload(pcm, SR, "adpcm_ima"), "adpcm_ima")
        assert len(dec) == n
        assert np.array_equal(dec, pcm)  # silence is ADPCM-exact


def test_transcode_path(spark):
    from gx_spark.audio_ops import transcode_audio

    pcm = _tone(200.0, 0.3)
    df = spark.createDataFrame(
        [("c0", bytearray(encode_payload(pcm, SR, "flac")), "flac"),
         ("c_bad", bytearray(b"junk"), "pcm_s16le")],
        "clip_id string, bytes binary, codec string")
    out = {r["clip_id"]: r.asDict()
           for r in transcode_audio(df, "adpcm_ima").collect()}
    assert out["c_bad"]["bytes"] is None
    assert out["c0"]["codec"] == "adpcm_ima"
    sr2, dec = decode_payload(bytes(out["c0"]["bytes"]), "adpcm_ima")
    assert sr2 == SR and len(dec) == len(pcm)
    assert snr_db(pcm, dec) > 30.0
