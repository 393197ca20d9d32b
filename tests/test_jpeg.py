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
