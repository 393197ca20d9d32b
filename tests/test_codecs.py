"""From-scratch codec layer: FLAC subset (gx_spark/flac.py) and G.711
mu-law/A-law (gx_spark/g711.py) — round-trips, corruption detection,
container/label consistency, and flag integration."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.audio import (  # noqa: E402
    compute_flags_row,
    decode_payload,
    encode_payload,
    snr_db,
    synth_pcm,
    wav_encode,
)
from gx_spark.flac import crc8, crc16, flac_decode, flac_encode  # noqa: E402
from gx_spark.g711 import (  # noqa: E402
    ALAW_DECODE,
    MULAW_DECODE,
    alaw_decode,
    alaw_encode,
    mulaw_decode,
    mulaw_encode,
)


def test_crc_check_values():
    # published check values: CRC-8/0x07("123456789")=0xF4,
    # CRC-16/BUYPASS("123456789")=0xFEE8
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("n", [0, 1, 191, 4096, 4097, 12_345, 96_000])
def test_flac_roundtrip_bit_exact(n):
    rng = np.random.default_rng(n)
    pcm = rng.integers(-32768, 32768, size=n).astype(np.int16)
    sr, out = flac_decode(flac_encode(pcm, 44100), verify=True)
    assert sr == 44100
    assert np.array_equal(pcm, out)


def test_flac_corruption_detected():
    pcm = synth_pcm("clip_0000000042", 16000, 700)
    b = bytearray(flac_encode(pcm, 16000))
    flipped = bytearray(b)
    flipped[len(b) // 2] ^= 0x01
    with pytest.raises(ValueError):
        flac_decode(bytes(flipped), verify=True)  # frame CRC-16
    with pytest.raises(ValueError):
        flac_decode(bytes(b[: len(b) // 3]))  # structural truncation
    with pytest.raises(ValueError):
        flac_decode(b"fLaX" + bytes(b[4:]))  # bad magic


def test_g711_snr_and_tables():
    # G.711 companding keeps the synthetic mixture well above the 30 dB
    # north-rule gate (≈38 dB), and the decode tables span full scale
    pcm = synth_pcm("clip_0000000001", 16000, 1500)
    for enc, dec in ((mulaw_encode, mulaw_decode), (alaw_encode, alaw_decode)):
        out = dec(enc(pcm).tobytes())
        assert 33.0 < snr_db(pcm, out) < 45.0
    assert MULAW_DECODE.max() > 30000 and MULAW_DECODE.min() < -30000
    assert ALAW_DECODE.max() > 30000 and ALAW_DECODE.min() < -30000
    # idempotent quantization: decode->encode->decode is a fixed point
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(mulaw_decode(mulaw_encode(MULAW_DECODE[codes])),
                          MULAW_DECODE[codes])
    assert np.array_equal(alaw_decode(alaw_encode(ALAW_DECODE[codes])),
                          ALAW_DECODE[codes])


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac", "pcm_mulaw", "pcm_alaw"])
def test_payload_roundtrip_all_codecs(codec):
    pcm = synth_pcm("clip_0000000007", 22050, 900)
    sr, out = decode_payload(encode_payload(pcm, 22050, codec), codec)
    assert sr == 22050
    assert len(out) == len(pcm)
    if codec in ("pcm_s16le", "flac"):
        assert np.array_equal(pcm, out)  # lossless
    else:
        assert snr_db(pcm, out) >= 33.0  # G.711 companding noise only


def test_container_label_mismatch_rejected():
    pcm = synth_pcm("clip_0000000007", 16000, 400)
    mulaw_bytes = encode_payload(pcm, 16000, "pcm_mulaw")
    with pytest.raises(ValueError):
        decode_payload(mulaw_bytes, "pcm_s16le")  # fmt tag 7 != PCM label
    with pytest.raises(ValueError):
        decode_payload(wav_encode(pcm, 16000), "flac")  # WAV labeled flac


@pytest.mark.parametrize("codec", ["flac", "pcm_mulaw", "pcm_alaw"])
def test_flags_real_codecs(codec):
    clip = "clip_0000000011"
    sr, dur = 16000, 500
    pcm = synth_pcm(clip, sr, dur)
    good = encode_payload(pcm, sr, codec)
    f = compute_flags_row(clip, good, sr, dur, codec, None)
    assert f["decodable"] and f["header_sr_ok"] and f["dur_ok"]
    assert f["snr_db"] >= 33.0
    # header mismatch (violation class 5): encoded at 2x the metadata sr
    bad = encode_payload(pcm, sr * 2, codec)
    f = compute_flags_row(clip, bad, sr, dur, codec, None)
    assert f["decodable"] and f["header_sr_ok"] is False
    # truncation (class 6): 75% of samples
    trunc = encode_payload(pcm[: int(len(pcm) * 0.75)], sr, codec)
    f = compute_flags_row(clip, trunc, sr, dur, codec, None)
    assert f["decodable"] and f["dur_ok"] is False


# ---------------------------------------------------------------------------
# Ogg-Opus container (RFC 3533 / RFC 7845) — container-level validation
# ---------------------------------------------------------------------------


def test_oggopus_roundtrip_and_structure():
    from gx_spark.oggopus import ogg_opus_encode, ogg_opus_parse

    b = ogg_opus_encode("clip_0000000042", 16000, 1100)
    m = ogg_opus_parse(b)
    assert m["input_sr"] == 16000 and m["dur_ms"] == 1100
    assert m["n_pages"] == 3 and m["pre_skip"] == 0
    # deterministic: same clip -> identical bytes
    assert b == ogg_opus_encode("clip_0000000042", 16000, 1100)
    # long clip spans multiple audio pages, duration exact on the 48 kHz
    # granule clock
    m2 = ogg_opus_parse(ogg_opus_encode("clip_x", 48000, 60000))
    assert m2["dur_ms"] == 60000 and m2["n_pages"] > 3


def test_oggopus_rejects_corruption():
    import pytest

    from gx_spark.oggopus import ogg_opus_encode, ogg_opus_parse

    b = ogg_opus_encode("clip_0000000001", 16000, 400)
    for mutate in (
        lambda x: x[: len(x) // 2],                      # truncation
        lambda x: b"JUNK" + x[4:],                       # bad capture
        lambda x: x[:-3] + bytes([x[-3] ^ 0xFF]) + x[-2:],  # body flip -> CRC
    ):
        with pytest.raises(ValueError):
            ogg_opus_parse(mutate(b))
    # pre-skip is subtracted from the duration per RFC 7845
    m = ogg_opus_parse(ogg_opus_encode("c", 16000, 400, pre_skip=4800))
    assert m["dur_ms"] == 400 and m["pre_skip"] == 4800


def test_oggopus_roundtrip_property():
    """Property: any (clip_id, input_sr, dur_ms) muxes to a stream whose
    demux returns exactly the container metadata written, for durations
    across the packet/page boundaries (one packet, one page, many pages)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gx_spark.oggopus import ogg_opus_encode, ogg_opus_parse

    @settings(max_examples=60, deadline=None)
    @given(sr=st.integers(8000, 48000), dur=st.integers(20, 180_000),
           tag=st.integers(0, 10**6), pre=st.sampled_from([0, 312, 4800]))
    def prop(sr, dur, tag, pre):
        b = ogg_opus_encode(f"clip_{tag:010d}", sr, dur, pre_skip=pre)
        m = ogg_opus_parse(b)
        assert m["input_sr"] == sr
        assert m["pre_skip"] == pre
        # 48 kHz granule clock is exact for integer ms
        assert m["dur_ms"] == dur
        assert m["n_pages"] >= 3

    prop()


def test_isobmff_roundtrip_property():
    """Property: any (n_frames, fps, dims) muxes to an MP4 whose demux
    returns the written dims exactly and the duration to the mvhd
    millisecond-timescale rounding."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gx_spark.isobmff import mp4_encode, mp4_parse

    @settings(max_examples=60, deadline=None)
    @given(nf=st.integers(1, 5000),
           fps=st.sampled_from([10.0, 12.5, 24.0, 25.0, 29.97, 30.0, 60.0]),
           w=st.integers(1, 7680), h=st.integers(1, 4320),
           tag=st.integers(0, 10**6))
    def prop(nf, fps, w, h, tag):
        b = mp4_encode(f"vid_{tag:07d}", nf, fps, w, h)
        m = mp4_parse(b)
        assert m["width"] == w and m["height"] == h and m["n_tracks"] == 1
        assert abs(m["dur_ms"] - nf * 1000.0 / fps) <= 1.0  # ms timescale

    prop()


def test_mp4_dims_come_from_video_track():
    """A multi-track file whose LAST trak is a non-video (soun) track with
    0x0 tkhd dims must still report the video track's dimensions — dims
    are selected by hdlr=='vide', not by trak order."""
    import struct

    from gx_spark.isobmff import _box, mp4_encode, mp4_parse

    b = mp4_encode("vid_trackorder", 30, 30.0, 640, 480)
    # craft an audio trak: tkhd with 0x0 dims + mdia/hdlr('soun')
    dur = 1000
    tkhd = _box(b"tkhd", struct.pack(
        ">B3sIIIII", 0, b"\0\0\7", 0, 0, 2, 0, dur)
        + b"\0" * 8 + struct.pack(">hhhH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0))
    mdhd = _box(b"mdhd", struct.pack(
        ">B3sIIIIHH", 0, b"\0\0\0", 0, 0, 1000, dur, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">B3sI4s", 0, b"\0\0\0", 0, b"soun")
                + b"\0" * 12 + b"gx\0")
    audio_trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr))
    # splice the audio trak at the END of moov (after the video trak)
    size, tag = struct.unpack(">I4s", b[0:8])
    ftyp_end = size
    msize, mtag = struct.unpack(">I4s", b[ftyp_end:ftyp_end + 8])
    assert mtag == b"moov"
    moov_payload = b[ftyp_end + 8:ftyp_end + msize] + audio_trak
    rebuilt = b[:ftyp_end] + _box(b"moov", moov_payload) + b[ftyp_end + msize:]
    m = mp4_parse(rebuilt)
    assert m["n_tracks"] == 2
    assert (m["width"], m["height"]) == (640, 480)


def test_h264_sps_roundtrip_property():
    """Property: any (dims, fps, n_frames) muxes to an Annex-B stream
    whose SPS parse returns the written dims exactly, the VUI frame rate
    to float tolerance, and the VCL count == n_frames — including
    non-multiple-of-16 dims through the frame-cropping syntax."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gx_spark.h264 import annexb_encode, annexb_parse

    @settings(max_examples=80, deadline=None)
    @given(nf=st.integers(1, 300),
           fps=st.sampled_from([10.0, 12.5, 23.976, 24.0, 25.0, 29.97,
                                30.0, 60.0]),
           w=st.integers(1, 1920).map(lambda v: v * 2),
           h=st.integers(1, 1080).map(lambda v: v * 2),
           tag=st.integers(0, 10**6))
    def prop(nf, fps, w, h, tag):
        b = annexb_encode(f"vid_{tag:07d}", nf, fps, w, h)
        m = annexb_parse(b)
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, nf)
        assert abs(m["fps"] - fps) < 0.01
        assert m["profile_idc"] == 66

    prop()


def test_h264_rejects_corruption():
    import pytest

    from gx_spark.h264 import annexb_encode, annexb_parse, sps_parse

    b = annexb_encode("v", 10, 30.0, 640, 360)
    assert annexb_parse(b)["n_frames"] == 10
    with pytest.raises(ValueError):  # no start code at byte 0
        annexb_parse(b"\x42" + b)
    with pytest.raises(ValueError):  # SPS truncated mid-field
        annexb_parse(b[:10])
    with pytest.raises(ValueError):  # VCL NAL before any SPS
        annexb_parse(b"\x00\x00\x00\x01\x65\x10\x20")
    with pytest.raises(ValueError):  # forbidden_zero_bit
        annexb_parse(b"\x00\x00\x00\x01\xe7" + b[5:])
    with pytest.raises(ValueError):  # not an SPS NAL
        sps_parse(b"\x68\x00")


def test_h264_three_byte_start_codes_and_unescape():
    """3-byte start codes parse too, and emulation-prevention unescape is
    exercised: dims whose exp-golomb encoding forces 00 00 0x patterns
    still round-trip."""
    from gx_spark.h264 import (_escape_rbsp, _unescape_rbsp, annexb_encode,
                               annexb_parse)

    raw = b"\x00\x00\x00\x00\x01\x00\x00\x02\x00\x00\x03abc"
    assert _unescape_rbsp(_escape_rbsp(raw)) == raw
    b4 = annexb_encode("v3", 3, 24.0, 320, 240)
    # rewrite all 4-byte start codes as 3-byte form
    b3 = b4.replace(b"\x00\x00\x00\x01", b"\x00\x00\x01")
    m = annexb_parse(b3)
    assert (m["width"], m["height"], m["n_frames"]) == (320, 240, 3)


def test_opus_packet_framing():
    """RFC 6716 §3 framing: all four frame-count codes round-trip and the
    R1-R7 malformed rules raise."""
    import pytest

    from gx_spark.oggopus import opus_packet_encode, opus_packet_parse

    # code 0, CELT FB 20 ms mono (config 31)
    p = opus_packet_parse(opus_packet_encode(b"x" * 39))
    assert p == {"mode": "celt", "bandwidth": "fb", "frame_ms": 20.0,
                 "stereo": False, "n_frames": 1, "dur_ms": 20.0}
    # SILK WB 60 ms stereo (config 11), code 0
    p = opus_packet_parse(bytes([(11 << 3) | 0x4]) + b"y" * 10)
    assert (p["mode"], p["bandwidth"], p["frame_ms"],
            p["stereo"]) == ("silk", "wb", 60.0, True)
    # code 1: two equal CELT 10 ms frames (config 30) = 20 ms
    assert opus_packet_parse(
        bytes([(30 << 3) | 1]) + b"z" * 8)["dur_ms"] == 20.0
    with pytest.raises(ValueError):  # odd payload (R3)
        opus_packet_parse(bytes([(30 << 3) | 1]) + b"z" * 7)
    # code 2: explicit first-frame length
    p = opus_packet_parse(bytes([(30 << 3) | 2, 3]) + b"abc" + b"defg")
    assert p["n_frames"] == 2 and p["dur_ms"] == 20.0
    with pytest.raises(ValueError):  # first frame overruns (R4)
        opus_packet_parse(bytes([(30 << 3) | 2, 10]) + b"abc")
    # code 3 CBR: 4 x 10 ms frames with padding
    body = bytes([0x40 | 4, 2]) + b"ppQQRRSSTT"  # pad flag, pad len 2
    p = opus_packet_parse(bytes([(30 << 3) | 3]) + body)
    assert p["n_frames"] == 4 and p["dur_ms"] == 40.0
    # code 3 VBR: 2 frames, first length 1
    p = opus_packet_parse(bytes([(30 << 3) | 3, 0x80 | 2, 1]) + b"AZZ")
    assert p["n_frames"] == 2
    with pytest.raises(ValueError):  # zero frames (R5)
        opus_packet_parse(bytes([(30 << 3) | 3, 0x80]))
    with pytest.raises(ValueError):  # > 120 ms total (R5)
        opus_packet_parse(bytes([(11 << 3) | 3, 3]) + b"xxxxxx")
    with pytest.raises(ValueError):  # empty packet (R1)
        opus_packet_parse(b"")


def test_oggopus_packet_layer_in_parse():
    """ogg_opus_parse now validates every packet's framing and reports
    the TOC packet clock + channel count."""
    import struct

    import pytest

    from gx_spark.oggopus import ogg_opus_encode, ogg_opus_parse

    b = ogg_opus_encode("pk", 16000, 400)
    m = ogg_opus_parse(b)
    assert m["n_packets"] == 20 and m["packet_dur_ms"] == 400.0
    assert m["channels"] == 1 and m["dur_ms"] == 400
    # corrupt one packet's TOC into a stereo flag: mono stream must reject
    # (find the first audio page body and flip bit 2 of its first byte)
    import re

    pages = [mo.start() for mo in re.finditer(b"OggS", b)]
    page3 = pages[2]
    n_seg = b[page3 + 26]
    body_at = page3 + 27 + n_seg
    bad = bytearray(b)
    bad[body_at] |= 0x4
    # CRC now mismatches -> recompute it so ONLY the packet check fires
    from gx_spark.oggopus import ogg_crc

    page_end = pages[3] if len(pages) > 3 else len(bad)
    page = bytearray(bad[page3:page_end])
    page[22:26] = b"\0\0\0\0"
    struct.pack_into("<I", bad, page3 + 22, ogg_crc(bytes(page)))
    with pytest.raises(ValueError, match="stereo packet"):
        ogg_opus_parse(bytes(bad))


def test_opus_packet_framing_property():
    """Property: synthesize arbitrary VALID packets of every frame-count
    code and assert the parser recovers config/frames/duration exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gx_spark.oggopus import _OPUS_CONFIGS, opus_packet_parse

    def build(config, stereo, code, frames, pad):
        toc = (config << 3) | (0x4 if stereo else 0) | code
        if code == 0:
            return bytes([toc]) + frames[0]
        if code == 1:
            return bytes([toc]) + frames[0] + frames[0]
        if code == 2:
            # strategy keeps frames <= 60 bytes, so one-byte lengths apply
            return bytes([toc, len(frames[0])]) + frames[0] + frames[1]
        # code 3 VBR with optional padding
        fc = 0x80 | (0x40 if pad else 0) | len(frames)
        out = bytearray([toc, fc])
        if pad:
            out.append(2)  # 2 padding bytes
        for f in frames[:-1]:
            assert len(f) < 252
            out.append(len(f))
        for f in frames:
            out += f
        if pad:
            out += b"\0\0"
        return bytes(out)

    frame = st.binary(min_size=0, max_size=60)

    @settings(max_examples=120, deadline=None)
    @given(config=st.integers(0, 31), stereo=st.booleans(),
           code=st.integers(0, 3),
           frames=st.lists(frame, min_size=1, max_size=4),
           pad=st.booleans())
    def prop(config, stereo, code, frames, pad):
        mode, bw, fms = _OPUS_CONFIGS[config]
        if code in (0, 1):
            frames = frames[:1]
        elif code == 2:
            frames = (frames + [b""])[:2]
        n = {0: 1, 1: 2, 2: 2, 3: len(frames)}[code]
        if fms * n > 120.0:
            return  # R5 would reject — not a valid packet
        pkt = build(config, stereo, code, frames, pad)
        p = opus_packet_parse(pkt)
        assert (p["mode"], p["bandwidth"], p["frame_ms"]) == (mode, bw, fms)
        assert p["stereo"] == stereo and p["n_frames"] == n
        assert p["dur_ms"] == fms * n

    prop()
