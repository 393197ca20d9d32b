"""IVF-PQ (IVFADC, Jégou et al. TPAMI 2011 §V): written index partitioned
by coarse cell + residual PQ codes, pruned ADC probe, exact rerank.

Pins:
- LAYOUT: codes hive-partitioned by cell; centroids/codebooks round-trip.
- EXACTNESS: approx_cosine == q · (centroid[cell] + reconstructed residual)
  to fp epsilon — the approximation lives in the quantizers, not the scorer.
- PLAN: the probe scan over the read-back index carries PartitionFilters
  (a query reads nprobe/n_centroids of the files).
- RECALL: shortlist rerank reaches recall@10 >= 0.8 vs brute force on the
  near-uniform testdata embeddings at nprobe=half the cells.
"""

from __future__ import annotations

import os
import re
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
def written(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    C, B = ops.write_ivfpq_index(emb, "vec_id", "embedding", path,
                                 n_centroids=16, m=8, n_codes=64, iters=5)
    codes, C2, B2 = ops.read_ivfpq_index(spark, path)
    return path, C, B, codes, C2, B2


def _query(emb, vid=0):
    return [float(x) for x in emb.where(F.col("vec_id") == vid)
            .select("embedding").first()[0]]


def test_layout_and_roundtrip(written, emb):
    path, C, B, codes, C2, B2 = written
    assert np.allclose(C, C2) and np.allclose(B, B2)
    cells_on_disk = {d for d in os.listdir(f"{path}/index")
                     if d.startswith("cell=")}
    assert len(cells_on_disk) > 1
    assert codes.count() == emb.count()
    row = codes.first()
    assert len(row["code"]) == 8 and all(0 <= c < 64 for c in row["code"])


def test_adc_score_is_exact_reconstruction_dot(written, emb):
    _, C, B, codes, _, _ = written
    q = np.asarray(_query(emb), dtype=np.float64)
    q /= np.linalg.norm(q)
    nprobe = 16  # all cells: every row scored
    scored = {r["id"]: r["approx_cosine"] for r in
              ops.ivfpq_query(codes, C, B, list(q), k=600,
                              nprobe=nprobe).collect()}
    for r in codes.limit(50).collect():
        rec = C[int(r["cell"])] + np.concatenate(
            [B[j][r["code"][j]] for j in range(8)])
        assert abs(float(q @ rec) - scored[r["id"]]) < 1e-9


def test_probe_plans_partition_pruning(written, emb):
    from gx_spark.plancheck import formatted_plan

    _, C, B, codes, _, _ = written
    probe = ops.ivfpq_query(codes, C, B, _query(emb), k=10, nprobe=4)
    plan = formatted_plan(probe)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), f"no partition pruning:\n{plan}"


def test_ivfpq_rerank_recall(written, emb):
    _, C, B, codes, _, _ = written
    recalls = []
    for vid in (0, 3, 7):
        q = _query(emb, vid)
        exact = {r["id"] for r in
                 ops.cosine_topk(emb, "vec_id", "embedding", q, 10).collect()}
        got = {r["id"] for r in
               ops.ivfpq_topk_rerank(emb, "vec_id", "embedding", codes, C, B,
                                     q, k=10, nprobe=8,
                                     shortlist=50).collect()}
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_full_probe_full_shortlist_is_exact(written, emb):
    """nprobe = all cells and shortlist >= corpus makes the rerank a brute
    force: output must equal cosine_topk exactly."""
    _, C, B, codes, _, _ = written
    q = _query(emb, 5)
    want = [(r["id"], round(r["cosine"], 9)) for r in
            ops.cosine_topk(emb, "vec_id", "embedding", q, 10).collect()]
    got = [(r["id"], round(r["cosine"], 9)) for r in
           ops.ivfpq_topk_rerank(emb, "vec_id", "embedding", codes, C, B, q,
                                 k=10, nprobe=16, shortlist=10_000).collect()]
    assert got == want
