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
# progressive (SOF2): real decode as of r5 — VERDICT r4 #5
# ---------------------------------------------------------------------------

def _synth_progressive_jpeg(w: int, h: int) -> bytes:
    """REAL progressive JPEG of a deterministic smooth image (the r4
    opaque-entropy structural fixture is obsolete: SOF2 decodes now)."""
    from gx_spark.jpeg import jpeg_encode_progressive

    return jpeg_encode_progressive(_smooth_rgb(h, w), 85)


def _synth_arithmetic_sof9(w: int, h: int) -> bytes:
    """Structurally valid SOF9 (arithmetic-coded) JPEG with opaque
    entropy — the honesty boundary jpeg_header_scan still owns now that
    progressive decodes for real."""
    import struct

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x00]) + bytes(range(1, 65))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    out += b"\xff\xc9" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += b"\x12\x34\x00\x56" * 10  # no 0xFF -> byte-stuff clean
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("h,w,quality,subsample", [
    (16, 24, 85, False), (17, 13, 60, False), (33, 31, 50, True),
    (40, 40, 95, False), (20, 18, 85, True),
])
def test_progressive_decodes_identical_to_baseline(h, w, quality, subsample):
    """The progressive scan script (DC first+refine, spectral AC bands at
    Al=1, AC refinement to Al=0) serializes the SAME quantized
    coefficients as the baseline encoder, so both decodes must be
    bit-identical — pins every Annex G path against the shared
    dequant/IDCT math."""
    from gx_spark.jpeg import jpeg_encode_progressive

    px = _smooth_rgb(h, w)
    base = jpeg_decode(jpeg_encode(px, quality, subsample))
    prog = jpeg_decode(jpeg_encode_progressive(px, quality, subsample))
    assert np.array_equal(base, prog)


def test_progressive_noise_and_grayscale_roundtrip():
    from gx_spark.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    assert np.array_equal(
        jpeg_decode(jpeg_encode(noise, 85)),
        jpeg_decode(jpeg_encode_progressive(noise, 85)))
    gray = (np.arange(32 * 40).reshape(32, 40) % 256).astype(np.uint8)
    assert np.array_equal(
        jpeg_decode(jpeg_encode(gray, 85)),
        jpeg_decode(jpeg_encode_progressive(gray, 85)))


def test_progressive_flags_decode_for_real():
    """A valid progressive JPEG is now decodable=True with real pixel
    means; dims mismatches are caught from the decoded dimensions."""
    from gx_spark.image import compute_image_flags_row
    from gx_spark.jpeg import jpeg_header_scan

    b = _synth_progressive_jpeg(24, 16)
    assert jpeg_header_scan(b) == (16, 24, 3)
    r = compute_image_flags_row(b, 24, 16, 3, "jpeg")
    assert r["decodable"] is True and r["dims_ok"] is True
    assert r["mean_r"] is not None and 0.0 <= r["mean_r"] <= 255.0
    # decoded mean tracks the source image's actual mean
    src = _smooth_rgb(16, 24)
    assert abs(r["mean_r"] - float(src[..., 0].mean())) < 3.0
    r2 = compute_image_flags_row(b, 25, 16, 3, "jpeg")
    assert r2["decodable"] is True and r2["dims_ok"] is False


def test_arithmetic_sof9_flags_null_not_corrupt():
    """The undecoded-but-container-consistent NULL class now belongs to
    the arithmetic coding process (SOF9): structural scan passes, decode
    raises NotImplementedError, decodable stays NULL with header dims
    still checked."""
    from gx_spark.image import compute_image_flags_row
    from gx_spark.jpeg import jpeg_header_scan

    b = _synth_arithmetic_sof9(24, 16)
    with pytest.raises(NotImplementedError):
        jpeg_decode(b)
    assert jpeg_header_scan(b) == (16, 24, 3)
    r = compute_image_flags_row(b, 24, 16, 3, "jpeg")
    assert r["decodable"] is None and r["dims_ok"] is True
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


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_progressive_restart_markers_identical(ri):
    """DRI/RSTn in progressive scans: every restart byte-aligns, flushes
    the EOB run, and resets DC predictors — decode must stay bit-identical
    to baseline through the decoder's per-segment reset path."""
    from gx_spark.jpeg import jpeg_encode_progressive

    for h, w, sub in [(16, 24, False), (33, 31, True)]:
        px = _smooth_rgb(h, w)
        base = jpeg_decode(jpeg_encode(px, 75, sub))
        b = jpeg_encode_progressive(px, 75, sub, restart_interval=ri)
        assert b"\xff\xdd" in b  # DRI present
        assert np.array_equal(base, jpeg_decode(b))


def test_progressive_every_truncation_raises():
    """No strict prefix of a progressive stream may silently decode.  The
    decoder requires the trailing EOI: before r5's review fix, a cut
    leaving 1-3 bytes after a scan's entropy data slipped through the
    marker loop's 4-byte lookahead and returned a partial image."""
    from gx_spark.jpeg import jpeg_encode_progressive

    px = _smooth_rgb(24, 24)
    enc = jpeg_encode_progressive(px, 85, True)
    assert jpeg_decode(enc).shape == (24, 24, 3)
    for cut in range(len(enc) - 1):
        with pytest.raises((ValueError, NotImplementedError)):
            jpeg_decode(enc[:cut])


def test_progressive_single_component_dc_scans():
    """Spec-valid SOF2 whose DC coefficients arrive in three SINGLE-
    component scans (the shape jpegtran/mozjpeg custom scan scripts like
    '0: 0 0 0 0;' emit).  Per T.81 A.2.3 a one-component scan is
    non-interleaved: blocks traverse the component's nominal (unpadded)
    block grid in raster order — NOT the padded interleaved MCU grid.
    On a 24x24 4:2:0 frame the two grids differ (luma 3x3 nominal vs 4x4
    padded), so this pins the decoder's non-interleaved DC path.  Pixels
    must match the library's own interleaved-DC progressive stream (same
    quantized coefficients over the cropped area)."""
    import struct

    from gx_spark import jpeg as J

    px = _smooth_rgb(24, 24)
    quality, subsample = 85, True
    h, w, nc, samp, q_raster, all_zz, grid_w, mcux, mcuy = J._prepare_encode(
        px, quality, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    dc_code = [dict(zip(J._DC_LUMA[1], J._canonical_codes(J._DC_LUMA[0]))),
               dict(zip(J._DC_CHROMA[1], J._canonical_codes(J._DC_CHROMA[0])))]
    ac_code = dict(zip(J._AC_FLAT[1], J._canonical_codes(J._AC_FLAT[0])))

    out = J._frame_headers(h, w, nc, samp, q_raster, b"\xff\xc2")
    for th in range(2):
        bits, vals = (J._DC_LUMA, J._DC_CHROMA)[th]
        body = bytes([th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    body = bytes([0x10]) + bytes(J._AC_FLAT[0]) + bytes(J._AC_FLAT[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(members, ss, se, ah, al, entropy):
        nonlocal out
        hdr = bytes([len(members)])
        for ci, td, ta in members:
            hdr += bytes([ci + 1, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr
        out += entropy

    al = 1
    for ci in range(nc):  # DC first: one NON-interleaved scan per component
        cbw, cbh = J._nominal_blocks(w, h, *samp[ci], hmax, vmax)
        bw = J._EntropyAssembler()
        pred = 0
        for by in range(cbh):
            for bx in range(cbw):
                v = int(all_zz[ci][by * grid_w[ci] + bx][0]) >> al
                diff = v - pred
                pred = v
                s = J._category(diff)
                ln, code = dc_code[min(ci, 1)][s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        sos([(ci, min(ci, 1), 0)], 0, 0, 0, al, bw.finish())
    for ci in range(nc):  # DC refine to Al=0, still per component
        cbw, cbh = J._nominal_blocks(w, h, *samp[ci], hmax, vmax)
        bw = J._EntropyAssembler()
        for by in range(cbh):
            for bx in range(cbw):
                bw.write(int(all_zz[ci][by * grid_w[ci] + bx][0]) & 1, 1)
        sos([(ci, 0, 0)], 0, 0, 1, 0, bw.finish())
    for ci in range(nc):  # AC bands: same emitters the library encoder uses
        bw = J._EntropyAssembler()
        J._emit_ac_first(bw, ac_code, all_zz[ci], grid_w[ci],
                         *J._nominal_blocks(w, h, *samp[ci], hmax, vmax),
                         1, 63, 1, 0)
        sos([(ci, 0, 0)], 1, 63, 0, 1, bw.finish())
    for ci in range(nc):
        bw = J._EntropyAssembler()
        J._emit_ac_refine(bw, ac_code, all_zz[ci], grid_w[ci],
                          *J._nominal_blocks(w, h, *samp[ci], hmax, vmax),
                          1, 63, 0, 0)
        sos([(ci, 0, 0)], 1, 63, 1, 0, bw.finish())
    out += b"\xff\xd9"

    ref = jpeg_decode(J.jpeg_encode_progressive(px, quality, subsample))
    got = jpeg_decode(bytes(out))
    assert got.shape == ref.shape == (24, 24, 3)
    assert np.array_equal(got, ref)
