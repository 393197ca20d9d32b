"""Context-window chunking (gx_spark.ops.chunk_documents): window/stride
arithmetic, overlap reconstruction, edge cases, and the zero-shuffle plan
shape.  The DuckDB oracle lives in
__spark_entry__.oracle_sql()['chunk_documents']."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import ops  # noqa: E402


def _collect(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ops.chunk_documents(df, **kw).collect()
    return sorted((r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
                  for r in out)


def test_chunk_window_arithmetic(spark):
    toks = [f"t{i}" for i in range(10)]
    got = _collect(spark, [(1, " ".join(toks))], chunk_tokens=4, overlap=1)
    # stride 3: [0,4) [3,7) [6,10) — ceil((10-4)/3)+1 = 3 chunks
    assert got == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_short_final_and_single(spark):
    toks = [f"t{i}" for i in range(9)]
    got = _collect(spark, [(1, " ".join(toks))], chunk_tokens=4, overlap=0)
    assert [g[2] for g in got] == [4, 4, 1]  # final chunk runs short
    assert got[-1][3] == "t8"
    # n <= chunk_tokens -> exactly one chunk, full text
    got = _collect(spark, [(2, "a b c")], chunk_tokens=8, overlap=2)
    assert got == [(2, 0, 3, "a b c")]


def test_chunk_overlap_reconstruction(spark):
    """Dropping each chunk's first `overlap` tokens (except chunk 0)
    reconstructs the original token sequence exactly."""
    toks = [f"w{i}" for i in range(101)]
    got = _collect(spark, [(1, " ".join(toks))], chunk_tokens=16, overlap=4)
    rebuilt = got[0][3].split(" ")
    for _, cid, _, text in got[1:]:
        rebuilt += text.split(" ")[4:]
    assert rebuilt == toks
    # every consecutive pair shares exactly the overlap suffix/prefix
    for (_, _, _, a), (_, _, _, b) in zip(got, got[1:]):
        assert a.split(" ")[-4:] == b.split(" ")[:4]


def test_chunk_edges(spark):
    got = _collect(spark, [(1, ""), (2, "   "), (3, "  a   b  ")],
                   chunk_tokens=4, overlap=1)
    # empty/whitespace docs dropped; runs of whitespace collapse,
    # case preserved
    assert got == [(3, 0, 2, "a b")]
    df = spark.range(1).selectExpr("id as doc_id", "'x' as text")
    with pytest.raises(ValueError):
        ops.chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        ops.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_plan_is_shuffle_free(spark):
    from gx_spark.plancheck import formatted_plan

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = formatted_plan(ops.chunk_documents(df, chunk_tokens=32,
                                              overlap=8))
    assert "Exchange" not in plan, f"chunking must not shuffle:\n{plan}"
    assert "InPandas" not in plan and "EvalPython" not in plan
