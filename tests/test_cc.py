"""Connected components (large-star/small-star, Kiveris SoCC'14) and the
full near-dup clustering op (pairs -> components -> canonical election).

Ground truth is a driver-side union-find over the same pair set — tiny
inputs here; the sf0.01 DuckDB recursive-CTE oracle is wired through
__spark_entry__.oracle_sql()['dedup_clusters_documents'].
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402

SF = "/root/testdata/sf0.001"


def _union_find(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id in the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), isolated pair
    pairs = [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (7, 8)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        (r["node"], r["component"])
        for r in ops.connected_components(df).collect()
    }
    nodes = sorted({x for p in pairs for x in p})
    want = set(_union_find(nodes, pairs).items())
    assert got == want


def test_connected_components_matches_union_find_random(spark):
    # deterministic pseudo-random graph: 300 nodes, ~200 edges via a
    # multiplicative hash (no RNG — keeps the test reproducible)
    edges = []
    for i in range(200):
        a = (i * 2654435761) % 300
        b = (i * 40503 + 17) % 300
        if a != b:
            edges.append((a, b))
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        (r["node"], r["component"])
        for r in ops.connected_components(df).collect()
    }
    nodes = sorted({x for e in edges for x in e})
    want = set(_union_find(nodes, edges).items())
    assert got == want


def test_dedup_clusters_end_to_end(spark):
    rows = [
        ("d1", "the quick brown fox jumps over the lazy dog"),
        ("d2", "the quick brown fox jumps over the lazy dog"),  # exact dup
        ("d3", "the quick brown fox jumps over the lazy dog !!"),  # near dup
        ("d4", "completely different text about spark engines"),
        ("d5", None),  # null text -> singleton, never canonical-blocks
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: (r["component"], r["is_canonical"])
        for r in ops.dedup_clusters(df, "doc_id", "text", threshold=0.8).collect()
    }
    assert len(out) == 5  # one row per document, singletons included
    # d1/d2/d3 cluster together under min-id label d1
    assert out["d1"][0] == out["d2"][0] == out["d3"][0] == "d1"
    # canonical = longest text (d3), exactly one per cluster
    assert out["d3"][1] and not out["d1"][1] and not out["d2"][1]
    # singletons are their own canonical component
    assert out["d4"] == ("d4", True)
    assert out["d5"] == ("d5", True)


def test_dedup_clusters_from_precomputed_pairs(spark):
    """pairs= path (the 100 TB shape: LSH-verified candidates instead of
    exact all-pairs) must produce identical clusters when the pair sets
    agree."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = ops.dedup_clusters(docs, "doc_id", "text", threshold=0.9)
    pairs = ops.word_jaccard_pairs(docs, "doc_id", "text", threshold=0.9)
    via_pairs = ops.dedup_clusters(docs, "doc_id", "text", pairs=pairs)
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, via_pairs.collect()))
    assert a == b


def test_dedup_clusters_documents_sf0001(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = ops.dedup_clusters(docs, "doc_id", "text", threshold=0.9)
    rows = out.collect()
    assert len(rows) == docs.count()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    # exactly one canonical per component, label is the min member id
    for comp, members in by_comp.items():
        assert sum(1 for m in members if m["is_canonical"]) == 1
        assert comp == min(m["id"] for m in members)
    # ground truth from the exact pair op + union-find
    pairs = [
        (r["id_a"], r["id_b"])
        for r in ops.word_jaccard_pairs(docs, "doc_id", "text", threshold=0.9)
        .collect()
    ]
    nodes = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = _union_find(nodes, pairs)
    got = {r["id"]: r["component"] for r in rows}
    assert got == want


def test_embedding_dedup_clusters_vs_union_find(spark):
    """Semantic dedup over the embeddings table: exact-mode clusters must
    match a driver-side union-find over the same exact cosine pair set,
    with canonical = min id per cluster."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = [
        (r["id_a"], r["id_b"]) for r in ops.cosine_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.4, mode="exact"
        ).collect()
    ]
    nodes = [r["vec_id"] for r in emb.select("vec_id").collect()]
    want = _union_find(nodes, pairs)
    out = {r["id"]: (r["component"], r["is_canonical"]) for r in
           ops.embedding_dedup_clusters(emb, "vec_id", "embedding",
                                        threshold=0.4).collect()}
    assert len(out) == len(nodes)
    for n in nodes:
        comp, canon = out[n]
        assert comp == want[n]
        assert canon == (n == want[n])


def test_embedding_dedup_clusters_null_vector_is_singleton(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.001]), (2, None), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["id"]: (r["component"], r["is_canonical"]) for r in
           ops.embedding_dedup_clusters(df, "vec_id", "embedding",
                                        threshold=0.9).collect()}
    assert out[2] == (2, True)          # null vector: own singleton cluster
    assert out[0] == (0, True) and out[1] == (0, False)
    assert out[3] == (3, True)
