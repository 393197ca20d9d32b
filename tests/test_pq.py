"""Product quantization ANN (Jégou et al., TPAMI 2011): codebook training,
map-side encode, ADC scoring, and the shortlist+exact-rerank composition.

Two pins:
- EXACTNESS: the ADC score is q · reconstruct(code) to fp epsilon (the
  approximation lives entirely in the quantizer, not the scorer).
- RECALL: shortlist-50 rerank reaches recall@10 >= 0.9 vs brute force on
  the near-uniform testdata embeddings (the hardest case for a quantizer).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def trained(emb):
    B = ops.train_pq_codebooks(emb, "embedding", m=8, k=256, seed=42)
    codes = ops.pq_encode(emb, "vec_id", "embedding", B).persist()
    codes.count()
    yield B, codes
    codes.unpersist()


def _query(emb, vid=0):
    return [float(x) for x in emb.where(F.col("vec_id") == vid)
            .select("embedding").first()[0]]


def test_codebook_shapes_and_codes(trained, emb):
    B, codes = trained
    assert B.shape == (8, 256, 8)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r["code"]) == 8
        assert all(0 <= c < 256 for c in r["code"])


def test_adc_score_is_exact_reconstruction_dot(trained, emb):
    B, codes = trained
    q = np.asarray(_query(emb), dtype=np.float64)
    q /= np.linalg.norm(q)
    scored = {r["id"]: r["approx_cosine"]
              for r in ops.pq_query(codes, B, list(q), k=500).collect()}
    for r in codes.limit(50).collect():
        rec = np.concatenate([B[j][r["code"][j]] for j in range(8)])
        assert abs(float(q @ rec) - scored[r["id"]]) < 1e-9


def test_pq_rerank_recall(trained, emb):
    B, codes = trained
    q = _query(emb)
    exact = {r["id"] for r in
             ops.cosine_topk(emb, "vec_id", "embedding", q, 10).collect()}
    got = {r["id"] for r in
           ops.pq_topk_rerank(emb, "vec_id", "embedding", codes, B, q,
                              k=10, shortlist=50).collect()}
    assert len(exact & got) / 10 >= 0.9


def test_pq_null_and_ragged_safe(spark):
    rows = [
        (0, [1.0] * 16),
        (1, None),          # null vector: dropped at encode
        (2, [1.0] * 7),     # ragged: dropped at encode
        (3, [0.5] * 16),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    B = ops.train_pq_codebooks(df, "embedding", m=4, k=2, seed=1)
    codes = ops.pq_encode(df, "vec_id", "embedding", B)
    ids = {r["id"] for r in codes.collect()}
    assert ids == {0, 3}
    out = ops.pq_query(codes, B, [1.0] * 16, k=5).collect()
    assert [r["id"] for r in out] and len(out) == 2


def test_one_shot_ann_topk_pq(emb):
    q = _query(emb, vid=1)
    out = ops.ann_topk_pq(emb, "vec_id", "embedding", q, k=10,
                          m=8, n_codes=64, seed=42)
    rows = out.collect()
    assert len(rows) == 10
    # self-match: the query vector's own code reconstructs closest to itself
    assert rows[0]["id"] == 1
