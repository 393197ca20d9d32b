"""Curation primitives: deterministic hash_split and per-group cap.

hash_split's DuckDB oracle is wired through
__spark_entry__.oracle_sql()['hash_split_documents'] (the '0x'||hex cast
reproduces Spark's conv(hex,16,10) exactly); these tests pin the
engine-side invariants the oracle can't see: partitioning-independence
and salt decorrelation.
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


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_split_partitioning_independent(docs):
    """The split must be a pure function of the key: identical assignment
    at 1 partition and 16 partitions (randomSplit/sample would differ)."""
    a = {r["doc_id"]: r["split"]
         for r in ops.hash_split(docs.coalesce(1), "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in ops.hash_split(docs.repartition(16), "doc_id").collect()}
    assert a == b
    assert set(a.values()) == {"train", "val"}


def test_hash_split_fraction_and_salt(docs):
    n = docs.count()
    out = ops.hash_split(docs, "doc_id", val_permille=200)
    nv = out.where("split = 'val'").count()
    # md5 buckets are uniform: 20% +- generous tolerance on 500 docs
    assert 0.10 <= nv / n <= 0.30
    # a different salt decorrelates the split: some doc changes side
    other = ops.hash_split(docs, "doc_id", val_permille=200, salt="fold2")
    joined = (
        out.select("doc_id", F.col("split").alias("s1"))
        .join(other.select("doc_id", F.col("split").alias("s2")), "doc_id")
    )
    assert joined.where("s1 != s2").count() > 0


def test_hash_split_matches_reference_hash(docs):
    """Spot-check the bucket arithmetic against python's int(hex, 16) on a
    few rows — the same arithmetic the DuckDB oracle uses."""
    import hashlib

    rows = ops.hash_split(docs, "doc_id", val_permille=100).limit(20).collect()
    for r in rows:
        h = hashlib.md5(f"gx_split{r['doc_id']}".encode()).hexdigest()
        want = "val" if int(h[:15], 16) % 1000 < 100 else "train"
        assert r["split"] == want, r


def test_group_cap_caps_and_keeps_best(docs):
    capped = ops.group_cap(docs, "source", "n_chars", cap=5,
                           id_col="doc_id")
    pdf = docs.select("doc_id", "source", "n_chars").toPandas()
    got = capped.select("doc_id", "source", "n_chars").toPandas()
    sizes = got.groupby("source").size()
    assert (sizes <= 5).all()
    # kept set per group == pandas nlargest with the same tie-break
    for src, grp in pdf.groupby("source"):
        want = set(
            grp.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .head(5)["doc_id"]
        )
        assert set(got[got["source"] == src]["doc_id"]) == want


def test_group_cap_preserves_columns(docs):
    capped = ops.group_cap(docs, "source", "n_chars", cap=3, id_col="doc_id")
    assert capped.columns == docs.columns


def test_mixture_sample_targets_and_determinism(docs):
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    budget = 3000
    out = ops.mixture_sample(docs, "source", weights, "n_chars",
                             budget, key_col="doc_id")
    pdf = out.select("source", "n_chars").toPandas()
    # unweighted sources are dropped entirely
    assert set(pdf["source"]) <= set(weights)
    tot = docs.select("source", "n_chars").toPandas()
    for src, w in weights.items():
        got = pdf[pdf["source"] == src]["n_chars"].sum()
        avail = tot[tot["source"] == src]["n_chars"].sum()
        target = min(avail, budget * w)
        # md5 buckets are uniform; with ~25 docs/source allow wide tolerance
        assert got <= avail
        assert abs(got - target) <= max(0.8 * target, 800), (src, got, target)
    # deterministic: identical row set at different partitioning
    again = ops.mixture_sample(docs.repartition(16), "source", weights,
                               "n_chars", budget, key_col="doc_id")
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_mixture_sample_caps_at_full_group(docs):
    # a weight whose target exceeds the group's token mass keeps ALL rows
    out = ops.mixture_sample(docs, "source", {"src0": 1.0}, "n_chars",
                             10**9, key_col="doc_id")
    n_src0 = docs.where("source = 'src0'").count()
    assert out.count() == n_src0


def test_token_shards_matches_serial_prefix_sum(docs):
    out = {r["id"]: r["shard"] for r in
           ops.token_shards(docs, "doc_id", "n_chars",
                            shard_tokens=1500).collect()}
    pdf = (docs.select("doc_id", "n_chars").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    run = 0
    for _, row in pdf.iterrows():
        assert out[row["doc_id"]] == int(run // 1500), row["doc_id"]
        run += row["n_chars"]
    assert len(out) == len(pdf)
    # shards are contiguous 0..max with every index present
    shards = sorted(set(out.values()))
    assert shards == list(range(shards[-1] + 1))


def test_token_shards_partitioning_independent(docs):
    a = {r["id"]: r["shard"] for r in
         ops.token_shards(docs.coalesce(1), "doc_id", "n_chars", 1000,
                          n_ranges=4).collect()}
    b = {r["id"]: r["shard"] for r in
         ops.token_shards(docs.repartition(16), "doc_id", "n_chars", 1000,
                          n_ranges=32).collect()}
    assert a == b


def test_token_shards_single_shuffle_plan(docs):
    """The numeric-id path must plan exactly ONE Exchange: the bucket
    repartition satisfies the window's required clustering, so Catalyst
    adds no second hashpartitioning exchange."""
    out = ops.token_shards(docs, "doc_id", "n_chars", 1500)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_hash_split_is_pure_map(docs):
    """hash_split must add ZERO exchanges: the assignment is a column
    expression, so the plan is scan -> project, nothing else."""
    out = ops.hash_split(docs, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_mixture_sample_broadcasts_group_totals(docs):
    """The per-group totals must come back as a BROADCAST join: the corpus
    side is never sort-merge-shuffled on the group key."""
    out = ops.mixture_sample(docs, "source", {"src0": 0.5}, "n_chars",
                             1000, key_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_group_cap_salted_identical_on_mega_group(docs, spark):
    """salt_buckets is the skew escape hatch: a pathological corpus where
    one group holds almost every row must (a) produce EXACTLY the unsalted
    output — the pre-phase may only drop rows the final rank drops anyway —
    and (b) bound any single window task's state to ~group/B rows (pinned
    by plan shape: the pre-phase partitions on (group, salt))."""
    mega = docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 97 == 0, F.col("source"))
        .otherwise(F.lit("megasrc")),
    )
    plain = ops.group_cap(mega, "source", "n_chars", cap=7, id_col="doc_id")
    salted = ops.group_cap(mega, "source", "n_chars", cap=7,
                           id_col="doc_id", salt_buckets=8)
    a = sorted(tuple(r) for r in
               plain.select("doc_id", "source", "n_chars").collect())
    b = sorted(tuple(r) for r in
               salted.select("doc_id", "source", "n_chars").collect())
    assert a == b and len(a) > 0
    # plan: the pre-phase window's partition spec includes the salt column,
    # so no task ever ranks a whole mega-group
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_gc_salt" in plan
    with pytest.raises(ValueError):
        ops.group_cap(mega, "source", "n_chars", cap=7, salt_buckets=8)
    # temp-name collision guard: a caller column named _gc_salt/_gc_rk
    # would be silently overwritten by the salted pre-phase — refuse it
    with pytest.raises(ValueError, match="_gc_salt"):
        ops.group_cap(mega.withColumn("_gc_salt", F.lit(1)),
                      "source", "n_chars", cap=7, id_col="doc_id",
                      salt_buckets=8)


def test_decontaminate_flags_planted_near_dups(docs, spark):
    """Decontamination (GPT-3 appendix-C n-gram filter): benchmark slice
    doc_id%10==7, train = rest.  Pins (a) pandas recompute of the exact
    per-doc distinct-5-gram totals and hit counts, (b) the planted
    near-dups are flagged, (c) bench-gram broadcast in the plan, and
    (d) short docs (<n words) are absent rather than zero-filled."""
    bench = docs.filter(F.col("doc_id") % 10 == 7)
    train = docs.filter(F.col("doc_id") % 10 != 7)
    out = ops.decontaminate(train, bench, "doc_id", "text", n=5)
    got = {r["doc_id"]: (r["n_ngrams"], r["n_hits"], r["contaminated"])
           for r in out.collect()}

    def grams(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 5]) for i in range(len(w) - 4)} \
            if len(w) >= 5 else set()

    pdf = docs.select("doc_id", "text").toPandas()
    bench_g = set()
    for _, row in pdf[pdf["doc_id"] % 10 == 7].iterrows():
        bench_g |= grams(row["text"])
    n_contam = 0
    for _, row in pdf[pdf["doc_id"] % 10 != 7].iterrows():
        g = grams(row["text"])
        if not g:
            assert row["doc_id"] not in got
            continue
        hits = len(g & bench_g)
        assert got[row["doc_id"]] == (len(g), hits, hits > 0), row["doc_id"]
        n_contam += hits > 0
    assert n_contam > 0, "corpus's planted near-dups must light up"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_decontaminate_totals_leg_never_exchanges_train_grams(docs, spark):
    """Scale-shape pin for the r5 rewrite: per-doc totals are a map-side
    size(array_distinct(...)) fold, so no Exchange partitioned on the doc
    key may carry an ngram attribute (the old countDistinct plan shuffled
    every distinct (doc, 13-gram) pair of the train corpus).  The only
    Exchange allowed to carry grams is the bench side's distinct — bounded
    by the (tiny) benchmark set, and broadcast after."""
    from gx_spark.plancheck import exchange_sections, formatted_plan

    bench = docs.filter(F.col("doc_id") % 10 == 7)
    train = docs.filter(F.col("doc_id") % 10 != 7)
    out = ops.decontaminate(train, bench, "doc_id", "text", n=5)
    plan = formatted_plan(out)
    exchanges = exchange_sections(plan)
    assert exchanges, "expected at least the bench-distinct exchange"
    for ex in exchanges:
        if "hashpartitioning(doc_id" in ex:
            assert "ngram" not in ex and "_grams" not in ex, (
                f"train grams entered a doc-keyed shuffle:\n{ex}")
    assert "array_distinct" in plan, "map-side totals fold missing"


def test_repetition_stats_matches_python_and_never_shuffles(docs, spark):
    """Gopher repetition signals: pandas recompute of dup-gram fractions
    and top-2-gram multiplicity, plus the zero-Exchange plan pin (every
    signal folds over the doc's own gram array — no groupBy anywhere)."""
    out = ops.repetition_stats(docs, "doc_id", "text")
    got = {r["doc_id"]: (r["n_words"], r["dup_2gram_frac"],
                         r["dup_3gram_frac"], r["top_2gram_count"])
           for r in out.collect()}
    from collections import Counter
    pdf = docs.select("doc_id", "text").toPandas()
    assert len(got) == len(pdf)
    for _, row in pdf.iterrows():
        w = row["text"].split(" ")
        g2 = [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]
        g3 = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]
        n_words, f2, f3, top = got[row["doc_id"]]
        assert n_words == len(w), row["doc_id"]
        assert top == (max(Counter(g2).values()) if g2 else 0), row["doc_id"]
        # fractions via approx, not rounded equality: Spark F.round is
        # HALF_UP while Python round() is banker's — an exact .5 at the
        # 6th decimal would flake an == on the two roundings
        assert f2 == pytest.approx(
            (1 - len(set(g2)) / len(g2)) if g2 else 0.0, abs=1e-6
        ), row["doc_id"]
        assert f3 == pytest.approx(
            (1 - len(set(g3)) / len(g3)) if g3 else 0.0, abs=1e-6
        ), row["doc_id"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
