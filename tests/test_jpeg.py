"""Roundtrip tests for the pure-numpy baseline JPEG codec (gx_spark/jpeg.py).

Lossy codec, so correctness is pinned by PSNR against the source pixels —
the same invariant style the audio layer uses (SNR >= 30 dB)."""

import numpy as np
import pytest

from gx_spark.jpeg import jpeg_decode, jpeg_encode


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(d * d))
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _smooth_rgb(h, w, seed=7):
    # smooth gradient + low-amplitude noise: realistic photo-like content
    # (hard random noise is the codec's worst case and not the use case)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
            128 + 90 * np.cos(xx / 11.0),
            128 + 80 * np.sin((xx + yy) / 29.0),
        ],
        axis=-1,
    )
    noisy = base + rng.normal(0, 4, size=(h, w, 3))
    return np.clip(noisy, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality,min_psnr", [(95, 36.0), (85, 32.0), (60, 28.0)])
def test_rgb_roundtrip_psnr(quality, min_psnr):
    px = _smooth_rgb(48, 40)
    out = jpeg_decode(jpeg_encode(px, quality))
    assert out.shape == px.shape
    assert _psnr(px, out) >= min_psnr


def test_grayscale_roundtrip():
    px = _smooth_rgb(32, 32)[..., :1]
    out = jpeg_decode(jpeg_encode(px, 90))
    assert out.shape == px.shape
    assert _psnr(px, out) >= 34.0


def test_subsampled_420_roundtrip():
    px = _smooth_rgb(50, 38)  # non-multiple-of-16 dims exercise MCU padding
    enc = jpeg_encode(px, 88, subsample=True)
    out = jpeg_decode(enc)
    assert out.shape == px.shape
    # chroma is half-res, so the bar is lower but still photo-plausible
    assert _psnr(px, out) >= 27.0
    # 4:2:0 should be materially smaller than 4:4:4 at the same quality
    assert len(enc) < len(jpeg_encode(px, 88, subsample=False))


def test_non_block_aligned_dims():
    for h, w in [(9, 13), (8, 8), (17, 24), (1, 1)]:
        px = _smooth_rgb(h, w, seed=h * 100 + w)
        out = jpeg_decode(jpeg_encode(px, 92))
        assert out.shape == (h, w, 3)


def test_truncated_and_garbage():
    px = _smooth_rgb(16, 16)
    enc = jpeg_encode(px, 85)
    with pytest.raises(ValueError):
        jpeg_decode(enc[: len(enc) // 2])
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg at all")


# ---------------------------------------------------------------------------
# non-baseline (progressive) semantics — VERDICT r3 #10
# ---------------------------------------------------------------------------

def _synth_progressive_jpeg(w: int, h: int) -> bytes:
    """Structurally valid SOF2 (progressive) JPEG: real marker walk (DQT,
    SOF2, DHT, SOS), byte-stuff-clean entropy payload, EOI.  The entropy
    bytes are opaque — exactly the honesty boundary jpeg_header_scan
    validates (same pattern as the Opus/AVC container stubs)."""
    import struct

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x00]) + bytes(range(1, 65))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    bits = [0] * 16
    bits[0] = 1
    dht = bytes([0x00]) + bytes(bits) + bytes([0])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += b"\x12\x34\x00\x56" * 10  # no 0xFF -> byte-stuff clean
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_raises_not_implemented_but_scans():
    from gx_spark.jpeg import jpeg_header_scan

    b = _synth_progressive_jpeg(24, 16)
    with pytest.raises(NotImplementedError):
        jpeg_decode(b)
    assert jpeg_header_scan(b) == (16, 24, 3)


def test_progressive_flags_not_corrupt_dims_still_checked():
    """A VALID progressive JPEG must not be flagged corrupt (decodable is
    NULL = undecoded-but-container-consistent), while its SOF header dims
    still verify the metadata columns."""
    from gx_spark.image import compute_image_flags_row

    b = _synth_progressive_jpeg(24, 16)
    r = compute_image_flags_row(b, 24, 16, 3, "jpeg")
    assert r["decodable"] is None
    assert r["header_w"] == 24 and r["header_h"] == 16
    assert r["dims_ok"] is True
    # metadata that lies about width IS caught without decoding
    r2 = compute_image_flags_row(b, 25, 16, 3, "jpeg")
    assert r2["decodable"] is None and r2["dims_ok"] is False


def test_jpeg_magic_garbage_does_not_pass():
    """Garbage behind a JPEG magic must stay decodable=False (corrupt) —
    the structural scan is not a blind pass."""
    from gx_spark.image import compute_image_flags_row
    from gx_spark.jpeg import jpeg_header_scan

    rng = np.random.default_rng(3)
    garbage = b"\xff\xd8" + rng.integers(0, 255, 64, dtype=np.uint8).tobytes()
    with pytest.raises(ValueError):
        jpeg_header_scan(garbage)
    assert compute_image_flags_row(garbage, 8, 8, 3, "jpeg")["decodable"] is False
    # truncated progressive stream: also corrupt
    b = _synth_progressive_jpeg(24, 16)
    assert compute_image_flags_row(b[: len(b) // 2], 24, 16, 3,
                                   "jpeg")["decodable"] is False
