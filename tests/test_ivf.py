"""IVF (inverted-file) ANN: spherical-k-means coarse quantizer, map-side
cell assignment, nprobe cell scan — the 'IVF variant as the scale path'."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_centroids_shape_and_norm(spark, emb):
    C = ops.train_ivf_centroids(emb, "embedding", n_centroids=16, iters=5)
    assert C.shape[0] == 16
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)


def test_index_covers_corpus_and_cells_bounded(spark, emb):
    C = ops.train_ivf_centroids(emb, "embedding", n_centroids=16, iters=5)
    idx = ops.build_ivf_index(emb, "vec_id", "embedding", C)
    rows = idx.collect()
    assert len(rows) == emb.count()
    cells = {r["cell"] for r in rows}
    assert cells <= set(range(16))
    assert len(cells) > 1  # quantizer actually partitions the space
    # every stored vector is unit-norm
    assert abs(float(np.linalg.norm(rows[0]["vec"])) - 1.0) < 1e-9


def test_ivf_full_probe_is_exact(spark, emb):
    """nprobe == n_centroids scans everything -> identical to brute force."""
    q = [float(x) for x in emb.where("vec_id = 0").select("embedding").first()[0]]
    brute = [r["id"] for r in
             ops.cosine_topk(emb, "vec_id", "embedding", q, 10).collect()]
    C = ops.train_ivf_centroids(emb, "embedding", n_centroids=16, iters=5)
    idx = ops.build_ivf_index(emb, "vec_id", "embedding", C)
    got = [r["id"] for r in ops.ivf_query(idx, C, q, 10, nprobe=16).collect()]
    assert got == brute


def test_ivf_partial_probe_recall(spark, emb):
    """nprobe = 1/2 of cells must keep top-10 recall >= 0.8 on the
    near-uniform testdata embeddings (the hardest case for ANN)."""
    C = ops.train_ivf_centroids(emb, "embedding", n_centroids=16, iters=5)
    idx = ops.build_ivf_index(emb, "vec_id", "embedding", C).persist()
    idx.count()
    recalls = []
    for qid in (0, 1, 2, 3, 4):
        q = [float(x) for x in
             emb.where(f"vec_id = {qid}").select("embedding").first()[0]]
        brute = {r["id"] for r in
                 ops.cosine_topk(emb, "vec_id", "embedding", q, 10).collect()}
        got = {r["id"] for r in ops.ivf_query(idx, C, q, 10, nprobe=8).collect()}
        recalls.append(len(got & brute) / 10)
    idx.unpersist()
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ann_topk_ivf_one_shot(spark, emb):
    q = [float(x) for x in emb.where("vec_id = 0").select("embedding").first()[0]]
    rows = ops.ann_topk_ivf(emb, "vec_id", "embedding", q, k=5,
                            n_centroids=8, nprobe=8).collect()
    assert len(rows) == 5
    assert rows[0]["id"] == 0  # the query vector itself is its own 1-NN
    assert rows[0]["cosine"] == pytest.approx(1.0)
