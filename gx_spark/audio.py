"""Audio layer: numpy-only RIFF/WAVE PCM16 codec, deterministic reference
synthesis, and the vectorized pandas-UDF flag computation.

Sandbox has no soundfile/librosa (SURVEY.md §0) — only `codec='pcm_s16le'`
carries decodable bytes; other codecs get metadata-only checks and their
decode path is a clearly-marked NotImplementedError stub (the Spark-side
plumbing — schema, batching, UDF signature — is identical for all codecs).

Everything row-level runs inside ONE Arrow-batched pandas UDF
(`audio_flags_udf`) returning a struct column; per-row work is numpy over
int16 arrays, never row-at-a-time Python UDFs (BASELINE.json input_hint).
The deterministic synthesis convention here is THE reference for both the
fixture generator (tools/gen_audio.py) and the SNR / transcript checks, so
the per-row invariant "decoded PCM allclose (SNR>=30dB) + transcript
equality" is self-consistent.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# deterministic reference synthesis (FIXTURES.md §1)
# ---------------------------------------------------------------------------

_WORDS = [
    f"w{i:03d}" for i in range(224)
] + [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "zero", "one", "two", "three", "four", "five",
]
assert len(_WORDS) == 256

SR_CHOICES = [8000, 16000, 22050, 44100, 48000]
SR_WEIGHTS = [0.1, 0.4, 0.1, 0.2, 0.2]
CODECS = ("pcm_s16le", "flac", "opus")


def crc(s: str) -> int:
    return zlib.crc32(s.encode()) & 0xFFFFFFFF


def ref_frequencies(clip_id: str) -> tuple[float, float]:
    f1 = 200.0 + (crc(clip_id) % 1800)
    return f1, 2.37 * f1


def synth_pcm(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic reference signal, int16 PCM mono."""
    f1, f2 = ref_frequencies(clip_id)
    n = int(round(sr_hz * dur_ms / 1000.0))
    t = np.arange(n, dtype=np.float64) / sr_hz
    x = 0.6 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    return np.clip(x * 32767.0, -32768, 32767).astype(np.int16)


def ref_sr_hz(clip_id: str) -> int:
    r = (crc(clip_id + "sr") % 1000) / 1000.0
    cum = 0.0
    for sr, w in zip(SR_CHOICES, SR_WEIGHTS):
        cum += w
        if r < cum:
            return sr
    return SR_CHOICES[-1]


def ref_dur_ms(clip_id: str) -> int:
    return 200 + (crc(clip_id + "dur") % 1801)


def ref_codec(clip_id: str) -> str:
    r = crc(clip_id + "codec") % 100
    if r < 90:
        return "pcm_s16le"
    if r < 96:
        return "flac"
    return "opus"


def ref_transcript(clip_id: str) -> str:
    n_words = 3 + (crc(clip_id + "txn") % 10)
    return " ".join(_WORDS[crc(f"{clip_id}tx{k}") % 256] for k in range(n_words))


# ---------------------------------------------------------------------------
# RIFF/WAVE PCM16 codec (numpy-only)
# ---------------------------------------------------------------------------


def wav_encode(pcm: np.ndarray, sr_hz: int) -> bytes:
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr_hz, sr_hz * 2, 2, 16)
    size = 4 + (8 + len(fmt)) + (8 + len(data))
    return b"".join(
        [
            b"RIFF", struct.pack("<I", size), b"WAVE",
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
        ]
    )


def wav_decode(b: bytes) -> tuple[int, np.ndarray]:
    """Parse RIFF chunks → (sample_rate, int16 samples).  Raises ValueError
    on malformed input."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sr = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, channels, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV format (need PCM16 mono)")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sr, np.frombuffer(data, dtype="<i2")


def decode_payload(b: bytes, codec: str) -> tuple[int, np.ndarray]:
    """Decode a clip payload to (sample_rate, int16 pcm).

    Only pcm_s16le (WAV container) is decodable in-sandbox; flac/opus decode
    is stubbed (no codec libs in the container) — callers treat those as
    metadata-only."""
    if codec == "pcm_s16le":
        return wav_decode(b)
    raise NotImplementedError(f"no in-sandbox decoder for codec {codec!r}")


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """SNR of decoded vs the deterministic reference, in dB."""
    n = min(len(reference), len(decoded))
    if n == 0:
        return -np.inf
    ref = reference[:n].astype(np.float64)
    dec = decoded[:n].astype(np.float64)
    noise = ref - dec
    p_sig = float(np.sum(ref * ref))
    p_noise = float(np.sum(noise * noise))
    if p_noise == 0.0:
        return np.inf
    if p_sig == 0.0:
        return -np.inf
    return 10.0 * np.log10(p_sig / p_noise)


# ---------------------------------------------------------------------------
# vectorized flag computation (pandas UDF)
# ---------------------------------------------------------------------------

AUDIO_FLAGS_SCHEMA = (
    "decodable boolean, header_sr int, header_sr_ok boolean, dur_ok boolean, "
    "n_samples int, snr_db double, transcript_ok boolean"
)

# fraction tolerance on decoded-frames vs sr_hz*dur_ms (the truncation
# violation drops 25% of frames — far outside this band)
_DUR_TOL = 0.02


def compute_flags_row(
    clip_id: str, b: bytes | None, sr: int, dur: int, codec: str, transcript: str | None
) -> dict[str, Any]:
    out: dict[str, Any] = {
        "decodable": False, "header_sr": None, "header_sr_ok": None,
        "dur_ok": None, "n_samples": None, "snr_db": None, "transcript_ok": None,
    }
    if transcript is not None:
        out["transcript_ok"] = transcript == ref_transcript(clip_id)
    if b is None:
        return out
    if codec in ("flac", "opus"):
        # metadata-only path, ONLY for the known stub codecs (codec libs
        # absent in-sandbox, decode stubbed).  Sniff the container magic:
        # a RIFF/WAVE payload labeled flac/opus is a mislabeled row and must
        # be flagged, not waved through.
        if bytes(b[:4]) == b"RIFF":
            return out  # decodable=False → metadata_consistent violation
        out["decodable"] = True
        out["header_sr_ok"] = True
        out["dur_ok"] = True
        return out
    if codec != "pcm_s16le":
        # unrecognized codec label (e.g. 'mp3', corrupt value): we cannot
        # certify anything about the payload — decodable=False so the
        # metadata-consistency expectation flags the row
        return out
    try:
        hsr, pcm = wav_decode(bytes(b))
    except ValueError:
        return out
    out["decodable"] = True
    out["header_sr"] = hsr
    out["header_sr_ok"] = hsr == sr
    expected_n = int(round(sr * dur / 1000.0))
    out["n_samples"] = len(pcm)
    out["dur_ok"] = expected_n > 0 and abs(len(pcm) - expected_n) <= max(
        1, int(expected_n * _DUR_TOL)
    )
    ref = synth_pcm(clip_id, sr, dur)
    out["snr_db"] = float(snr_db(ref, pcm))
    return out


def make_audio_flags_udf():
    """Arrow-batched pandas UDF: (clip_id, bytes, sr_hz, dur_ms, codec,
    transcript) → flags struct.  Built lazily so importing gx_spark never
    requires an active Spark session.

    The worker-side body imports gx_spark by path (captured at define time)
    so local-mode executors work even when the driver put the repo on
    sys.path manually; under spark-submit --py-files the normal import
    succeeds first."""
    import os

    from pyspark.sql.functions import pandas_udf

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    @pandas_udf(AUDIO_FLAGS_SCHEMA)
    def audio_flags(
        clip_id: pd.Series, b: pd.Series, sr: pd.Series, dur: pd.Series,
        codec: pd.Series, transcript: pd.Series,
    ) -> pd.DataFrame:
        import sys

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from gx_spark.audio import compute_flags_row as _cfr

        rows = [
            _cfr(ci, bb, int(s) if s is not None else 0,
                 int(d) if d is not None else 0, cc, tx)
            for ci, bb, s, d, cc, tx in zip(clip_id, b, sr, dur, codec, transcript)
        ]
        return pd.DataFrame(rows)

    return audio_flags
