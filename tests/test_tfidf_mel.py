"""Round-5 extension ops: per-doc tf-idf top-k terms and log-mel
filterbank statistics."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402
from gx_spark.audio import encode_payload  # noqa: E402
from gx_spark.audio_ops import (  # noqa: E402
    compute_mel_row,
    hz_to_mel,
    mel_features,
    mel_filterbank,
    mel_to_hz,
)


# ---------------------------------------------------------------------------
# tfidf_topk
# ---------------------------------------------------------------------------


def _expected_tfidf(corpus: dict[str, str], k: int):
    """Hand evaluation of the sklearn smooth-idf formula + the op's
    (round(score,6) DESC, term ASC) ranking."""
    toks = {d: [w for w in t.strip().lower().split() if w]
            for d, t in corpus.items()}
    toks = {d: ws for d, ws in toks.items() if ws}
    n = len(toks)
    df: dict[str, int] = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    out = {}
    for d, ws in toks.items():
        scored = []
        for w in set(ws):
            tf = ws.count(w)
            idf = math.log((n + 1) / (df[w] + 1)) + 1.0
            scored.append((round(tf * idf, 6), w, tf))
        scored.sort(key=lambda t: (-t[0], t[1]))
        out[d] = [(w, tf, s, i + 1)
                  for i, (s, w, tf) in enumerate(scored[:k])]
    return out


def test_tfidf_matches_hand_formula(spark):
    corpus = {
        "d1": "apple banana apple cherry",
        "d2": "banana banana date",
        "d3": "cherry date elder fig",
        "d4": "  Apple  APPLE fig ",  # case/whitespace normalization
    }
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id string, text string")
    got = ops.tfidf_topk(df, "doc_id", "text", k=3).collect()
    by_doc: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r["doc_id"], r["rank"])):
        by_doc.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["score"], r["rank"]))
    exp = _expected_tfidf(corpus, 3)
    assert set(by_doc) == set(exp)
    for d in exp:
        assert by_doc[d] == [(w, tf, pytest.approx(s, abs=1e-6), rk)
                             for (w, tf, s, rk) in exp[d]], d


def test_tfidf_k_bounds_and_empty_docs(spark):
    df = spark.createDataFrame(
        [("d1", "a b c d e"), ("d2", "   "), ("d3", "")],
        "doc_id string, text string")
    got = ops.tfidf_topk(df, "doc_id", "text", k=2).collect()
    # empty/whitespace docs emit no rows; ranks are 1..k
    assert {r["doc_id"] for r in got} == {"d1"}
    assert sorted(r["rank"] for r in got) == [1, 2]
    with pytest.raises(ValueError):
        ops.tfidf_topk(df, "doc_id", "text", k=0)


def test_tfidf_tie_break_is_term_ascending(spark):
    # every term appears once in one doc -> identical scores, rank by term
    df = spark.createDataFrame([("d1", "zeta alpha mid")],
                               "doc_id string, text string")
    got = sorted(ops.tfidf_topk(df, "doc_id", "text", k=3).collect(),
                 key=lambda r: r["rank"])
    assert [r["term"] for r in got] == ["alpha", "mid", "zeta"]


def test_tfidf_parallelism_independent(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = ops.tfidf_topk(docs, "doc_id", "text", k=5)
    b = ops.tfidf_topk(docs.repartition(13), "doc_id", "text", k=5)
    ka = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
          for r in a.collect()}
    kb = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
          for r in b.collect()}
    assert ka == kb
    assert len(ka) > 0


# ---------------------------------------------------------------------------
# mel filterbank + mel_features
# ---------------------------------------------------------------------------


def _tone(freq: float, sr: int = 16000, dur_ms: int = 300,
          amp: float = 0.3) -> np.ndarray:
    t = np.arange(sr * dur_ms // 1000) / sr
    return np.rint(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(
        np.int16)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 100.0, 700.0, 4000.0, 7999.0])
    assert np.allclose(mel_to_hz(hz_to_mel(f)), f, atol=1e-9)
    assert hz_to_mel(1000.0) == pytest.approx(999.99, abs=0.3)  # ~1000 by design


def test_mel_filterbank_shape_and_support():
    sr, nfft, m = 16000, 512, 26
    fb = mel_filterbank(sr, nfft, m)
    assert fb.shape == (m, nfft // 2 + 1)
    assert (fb >= 0.0).all() and (fb <= 1.0).all()
    # centers are strictly increasing: argmax bin of each filter ascends
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) > 0).all()
    # interior of the band is covered: every bin strictly between the
    # first and last filter center gets nonzero total weight
    cov = fb.sum(axis=0)
    assert (cov[centers[0]:centers[-1] + 1] > 0).all()
    with pytest.raises(ValueError):
        mel_filterbank(sr, nfft, m, fmin=9000.0)


def test_mel_row_frame_arithmetic_and_tone_ordering():
    sr, dur = 16000, 300
    lo = compute_mel_row(encode_payload(_tone(300.0), sr, "pcm_s16le"),
                         "pcm_s16le")
    hi = compute_mel_row(encode_payload(_tone(6000.0), sr, "pcm_s16le"),
                         "pcm_s16le")
    n = sr * dur // 1000
    win, hop = sr * 25 // 1000, sr * 10 // 1000
    exp_frames = 1 + (n - win) // hop
    for r in (lo, hi):
        assert r["n_samples"] == n
        assert r["n_frames"] == exp_frames
        assert r["n_mels"] == 26
        assert r["mel_mean_db"] is not None
    # a higher tone lands in a strictly higher mel band
    assert 0 <= lo["dominant_mel"] < hi["dominant_mel"] <= 25
    # the dominant band is the bank's best filter for that frequency
    nfft = 1 << (win - 1).bit_length()
    fb = mel_filterbank(sr, nfft, 26)
    bin_lo = int(round(300.0 * nfft / sr))
    assert lo["dominant_mel"] == int(np.argmax(fb[:, bin_lo]))


def test_mel_row_edge_cases():
    sr = 16000
    # silence: frames exist, energy undefined
    r = compute_mel_row(
        encode_payload(np.zeros(4800, dtype=np.int16), sr, "pcm_s16le"),
        "pcm_s16le")
    assert r["n_frames"] > 0
    assert r["mel_mean_db"] is None and r["dominant_mel"] is None
    # clip shorter than one window: zero frames
    r = compute_mel_row(
        encode_payload(_tone(440.0)[:200], sr, "pcm_s16le"), "pcm_s16le")
    assert r["n_frames"] == 0 and r["dominant_mel"] is None
    # undecodable / null payloads
    assert compute_mel_row(b"notaudio", "pcm_s16le")["n_samples"] is None
    assert compute_mel_row(None, "pcm_s16le")["n_samples"] is None


def test_mel_features_distributed_matches_local(spark):
    sr = 16000
    rows, local = [], {}
    for i, (freq, codec) in enumerate(
            [(300.0, "pcm_s16le"), (1500.0, "flac"), (6000.0, "pcm_mulaw"),
             (440.0, "pcm_alaw")]):
        b = encode_payload(_tone(freq), sr, codec)
        rows.append((f"c{i}", bytearray(b), codec))
        local[f"c{i}"] = compute_mel_row(b, codec)
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, "
                                     "codec string").repartition(3)
    got = {r["clip_id"]: r.asDict()
           for r in mel_features(df, keep_cols=["clip_id"]).collect()}
    assert set(got) == set(local)
    for cid, exp in local.items():
        g = got[cid]
        assert g["n_samples"] == exp["n_samples"]
        assert g["n_frames"] == exp["n_frames"]
        assert g["dominant_mel"] == exp["dominant_mel"]
        assert g["mel_mean_db"] == pytest.approx(exp["mel_mean_db"],
                                                 abs=1e-9)


def test_mel_features_binary_pruned_map_only(spark):
    sr = 16000
    rows = [(f"c{i}", bytearray(encode_payload(_tone(440.0), sr,
                                               "pcm_s16le")), "pcm_s16le")
            for i in range(4)]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, "
                                     "codec string")
    out = mel_features(df, keep_cols=["clip_id"])
    assert "bytes" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle anywhere


def test_mel_oracle_literals_match_live_code():
    # the driver oracle pins the distributed mel result against committed
    # literals; this re-derives them from the live code so drift is caught
    import __spark_entry__ as se

    sr = 16000
    freqs = [300.0, 1500.0, 6000.0]
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    t = np.arange(sr * 300 // 1000) / sr
    for cls in range(9):
        f, c = freqs[cls % 3], codecs[cls // 3]
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        r = compute_mel_row(encode_payload(pcm, sr, c), c)
        assert r["n_samples"] == 4800 and r["n_frames"] == 28
        assert r["dominant_mel"] == se._MEL_CLASS_DOM[cls], cls
        assert r["mel_mean_db"] == pytest.approx(se._MEL_CLASS_DB[cls],
                                                 abs=1e-9), cls


# ---------------------------------------------------------------------------
# mfcc_features
# ---------------------------------------------------------------------------


def test_dct2_ortho_matrix():
    from gx_spark.audio_ops import dct2_ortho

    m = dct2_ortho(26, 26)
    assert np.allclose(m @ m.T, np.eye(26), atol=1e-12)
    # c0 of a constant vector = sqrt(n) * value (ortho DCT-II identity)
    v = np.full(26, 3.5)
    assert np.allclose(m @ v, [3.5 * np.sqrt(26)] + [0.0] * 25, atol=1e-12)


def test_mfcc_row_matches_hand_dct():
    """compute_mfcc_row == hand pipeline (frame -> hann -> pow2 rfft ->
    mel bank -> ln -> ortho DCT-II -> frame mean) on a real clip."""
    from gx_spark.audio_ops import compute_mfcc_row, dct2_ortho, mel_filterbank

    sr = 8000
    t = np.arange(sr // 5) / sr  # 200 ms
    pcm = np.rint(0.25 * 32767 * np.sin(2 * np.pi * 440.0 * t)).astype(
        np.int16)
    b = encode_payload(pcm, sr, "pcm_s16le")
    r = compute_mfcc_row(b, "pcm_s16le")
    win, hop = sr * 25 // 1000, sr * 10 // 1000
    nf = 1 + (len(pcm) - win) // hop
    assert (r["n_samples"], r["n_frames"], r["n_mfcc"]) == (len(pcm), nf, 13)
    x = pcm.astype(np.float64) / 32768.0
    idx = np.arange(nf)[:, None] * hop + np.arange(win)[None, :]
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    nfft = 1 << (win - 1).bit_length()
    pwr = np.abs(np.fft.rfft(x[idx] * hann, nfft, axis=1)) ** 2
    logmel = np.log(np.maximum(pwr @ mel_filterbank(sr, nfft, 26).T, 1e-10))
    cep = logmel @ dct2_ortho(13, 26).T
    for i, k in enumerate(("c0_mean", "c1_mean", "c2_mean")):
        assert r[k] == pytest.approx(float(cep.mean(axis=0)[i]), abs=1e-12)


def test_mfcc_row_edge_cases():
    from gx_spark.audio_ops import compute_mfcc_row

    assert compute_mfcc_row(None, "pcm_s16le")["n_samples"] is None
    assert compute_mfcc_row(b"garbage", "pcm_s16le")["n_frames"] is None
    # shorter than one frame -> 0 frames, null cepstra
    short = encode_payload(np.zeros(10, dtype=np.int16), 8000, "pcm_s16le")
    r = compute_mfcc_row(short, "pcm_s16le")
    assert r["n_frames"] == 0 and r["c0_mean"] is None


def test_mfcc_committed_driver_literals_rederive():
    """The _MFCC_CLASS_* literals in __spark_entry__ re-derive from live
    code, and the FLAC classes equal their pcm classes (losslessness)."""
    import __spark_entry__ as em
    from gx_spark.audio_ops import compute_mfcc_row

    sr = 16000
    freqs = [300.0, 1500.0, 6000.0]
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    t = np.arange(sr * 300 // 1000) / sr
    for cls in range(9):
        f, c = freqs[cls % 3], codecs[cls // 3]
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        r = compute_mfcc_row(encode_payload(pcm, sr, c), c)
        assert r["c0_mean"] == pytest.approx(em._MFCC_CLASS_C0[cls], abs=1e-9)
        assert r["c1_mean"] == pytest.approx(em._MFCC_CLASS_C1[cls], abs=1e-9)
        assert r["c2_mean"] == pytest.approx(em._MFCC_CLASS_C2[cls], abs=1e-9)
    assert em._MFCC_CLASS_C0[:3] == em._MFCC_CLASS_C0[3:6]  # flac == pcm


def test_mfcc_features_distributed(spark):
    from gx_spark.audio_ops import compute_mfcc_row, mfcc_features

    sr = 8000
    t = np.arange(sr // 10) / sr
    rows, local = [], {}
    for i, f in enumerate((250.0, 900.0, 3000.0)):
        pcm = np.rint(0.2 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        b = encode_payload(pcm, sr, "pcm_s16le")
        rows.append((f"c{i}", bytearray(b), "pcm_s16le"))
        local[f"c{i}"] = compute_mfcc_row(b, "pcm_s16le")
    rows.append(("c_null", None, "pcm_s16le"))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r["clip_id"]: r.asDict()
           for r in mfcc_features(df, keep_cols=["clip_id"]).collect()}
    assert set(got) == {"c0", "c1", "c2", "c_null"}
    assert got["c_null"]["c0_mean"] is None
    for cid, exp in local.items():
        for k in ("n_samples", "n_frames", "n_mfcc"):
            assert got[cid][k] == exp[k]
        for k in ("c0_mean", "c1_mean", "c2_mean"):
            assert got[cid][k] == pytest.approx(exp[k], abs=1e-12)
    assert "bytes" not in mfcc_features(df, keep_cols=["clip_id"]).columns
