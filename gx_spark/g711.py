"""G.711 mu-law / A-law companding (numpy-only, fully vectorized).

Public-spec implementation (ITU-T G.711): the 256-entry DECODE tables are
built from the canonical expansion formulas; ENCODE quantizes each linear
sample to the nearest decode level via a binary search over the 256 sorted
levels (`np.searchsorted`) — a valid (indeed distortion-optimal) G.711
encoder whose output any standard decoder expands correctly.  Both
directions are single numpy expressions over the whole batch: no per-sample
Python.

Reference parity note: upstream great_expectations has no audio layer at
all; this backs the north-rule audio payload checks (BASELINE.json
input_hint) for the `pcm_mulaw` / `pcm_alaw` codec labels (WAV format tags
7 / 6).
"""

from __future__ import annotations

import numpy as np

_MU_BIAS = 0x84  # 132


def _mulaw_decode_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32)
    u = ~codes & 0xFF  # mu-law bytes are transmitted complemented
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + _MU_BIAS) << exp) - _MU_BIAS
    return np.where(sign, -x, x).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32)
    a = codes ^ 0x55  # even-bit inversion
    sign = (a & 0x80) != 0  # A-law: MSB set = positive sample
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    x = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, x, -x).astype(np.int16)


MULAW_DECODE = _mulaw_decode_table()
ALAW_DECODE = _alaw_decode_table()


def _nearest_encoder(decode_table: np.ndarray):
    """Build a vectorized nearest-level encoder for a 256-entry decode table."""
    order = np.argsort(decode_table.astype(np.int32), kind="stable")
    levels = decode_table.astype(np.int32)[order]
    # midpoints between consecutive levels: searchsorted boundary
    mids = (levels[:-1] + levels[1:] + 1) // 2

    def encode(pcm: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(mids, pcm.astype(np.int32), side="left")
        return order[idx].astype(np.uint8)

    return encode


mulaw_encode = _nearest_encoder(MULAW_DECODE)
alaw_encode = _nearest_encoder(ALAW_DECODE)


def mulaw_decode(b: np.ndarray | bytes) -> np.ndarray:
    u = np.frombuffer(b, dtype=np.uint8) if isinstance(b, (bytes, bytearray)) else b
    return MULAW_DECODE[u]


def alaw_decode(b: np.ndarray | bytes) -> np.ndarray:
    u = np.frombuffer(b, dtype=np.uint8) if isinstance(b, (bytes, bytearray)) else b
    return ALAW_DECODE[u]
