"""IMA ADPCM (DVI4) codec — numpy/stdlib only, public-spec implementation.

The 4-bit adaptive differential PCM scheme of the IMA Digital Audio
Focus Group ("Recommended Practices for Enhancing Digital Audio
Compatibility in Multimedia Systems", rev 3.00, 1992), as carried in
RIFF/WAVE format tag 0x11 (Microsoft "IMA ADPCM") and RTP's DVI4
payload (RFC 3551 §4.5.1).  89-entry step-size table, 8-entry index
adjust table, 4:1 compression of int16 mono.

Block layout (mono, the WAV tag-0x11 framing): each `block_align`-byte
block opens with a 4-byte state header — predictor int16 LE (this IS
the block's first output sample), step index uint8, reserved 0 — then
(block_align - 4) bytes of nibbles, low nibble first, so a block holds
samples_per_block = (block_align - 4) * 2 + 1 samples.  Every block is
independently decodable from its own header (the property streaming
and seek rely on); the encoder carries predictor/index state across
blocks and snapshots it into each header, which is what reference
encoders (e.g. the original IMA pseudo-code) do.

The per-sample quantizer feedback loop is inherently sequential, so
encode/decode iterate samples in Python within each block — unlike the
G.711/FLAC paths there is no whole-batch vectorization to be had; the
decode table lookups are O(1) and a 300 ms clip costs ~1 ms.  The
nibble unpack/repack and header parse ARE vectorized.

Reference parity note: upstream great_expectations has no audio layer;
this widens the north-rule payload-validation codec surface
(BASELINE.json input_hint) with a fourth real compressed format.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA 1992 tables (identical in RFC 3551 DVI4 and every WAV tag-0x11
# implementation)
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

DEFAULT_BLOCK_ALIGN = 256  # mono: 505 samples/block, the common choice


def samples_per_block(block_align: int) -> int:
    if block_align < 8:
        raise ValueError("block_align must be >= 8")
    return (block_align - 4) * 2 + 1


def _reconstruct(nibble: int, step: int) -> int:
    """Inverse-quantized difference for one 4-bit code (IMA pseudo-code:
    diff = (step/8) + (b2)*step + (b1)*step/2 + (b0)*step/4, negated on
    the sign bit)."""
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    return -diff if nibble & 8 else diff


def adpcm_encode_blocks(
    pcm: np.ndarray, block_align: int = DEFAULT_BLOCK_ALIGN,
) -> bytes:
    """Encode int16 mono PCM into tag-0x11 block stream (headers
    included).  The final partial block is zero-nibble padded; the
    container's fact chunk records the true sample count."""
    x = np.asarray(pcm, dtype=np.int16).astype(np.int32)
    spb = samples_per_block(block_align)
    n = len(x)
    if n == 0:
        return b""
    step_table = STEP_TABLE
    index_table = INDEX_TABLE
    out = bytearray()
    pred = 0
    index = 0
    pos = 0
    while pos < n:
        chunk = x[pos:pos + spb]
        # block header: predictor snapshot IS the first decoded sample
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(step_table[index])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # decoder-mirrored state update (quantizer feedback)
            pred += _reconstruct(nib, step)
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(index_table[nib & 7])))
            nibbles.append(nib)
        nibbles += [0] * (spb - 1 - len(nibbles))  # pad the final block
        arr = np.asarray(nibbles, dtype=np.uint8)
        out += (arr[0::2] | (arr[1::2] << 4)).tobytes()  # low nibble first
        pos += spb
    return bytes(out)


def adpcm_decode_blocks(
    data: bytes, n_samples: int, block_align: int = DEFAULT_BLOCK_ALIGN,
) -> np.ndarray:
    """Decode a tag-0x11 block stream to int16 mono PCM, trimmed to
    n_samples (the fact-chunk count).  Each block decodes independently
    from its own header."""
    spb = samples_per_block(block_align)
    n_blocks = len(data) // block_align
    if len(data) % block_align:
        raise ValueError("ADPCM data is not a whole number of blocks")
    if n_samples > n_blocks * spb:
        raise ValueError("fact-chunk sample count exceeds block capacity")
    step_table = STEP_TABLE
    index_table = INDEX_TABLE
    out = np.empty(n_blocks * spb, dtype=np.int16)
    for bi in range(n_blocks):
        blk = data[bi * block_align:(bi + 1) * block_align]
        pred, index, _ = struct.unpack("<hBB", blk[:4])
        if index > 88:
            raise ValueError(f"ADPCM step index {index} out of range")
        packed = np.frombuffer(blk[4:], dtype=np.uint8)
        nibbles = np.empty(2 * len(packed), dtype=np.uint8)
        nibbles[0::2] = packed & 0x0F
        nibbles[1::2] = packed >> 4
        base = bi * spb
        out[base] = pred
        pred = int(pred)
        index = int(index)
        for k, nib in enumerate(nibbles):
            step = int(step_table[index])
            pred += _reconstruct(int(nib), step)
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(index_table[nib & 7])))
            out[base + 1 + k] = pred
    return out[:n_samples]
