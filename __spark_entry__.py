"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one implemented operator from SURVEY.md §2
THROUGH the gx_spark engine (or gx_spark.ops for the pipeline operators) and
returns its observed metrics as a small DataFrame; ``oracle_sql()`` holds the
ANSI-SQL equivalent DuckDB recomputes on the same parquet.  Column names and
dtypes are aligned on both sides (longs for counts, ROUND(x, 6) for floats)
so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gx_spark import EngineOptions, ExpectationSuite, validate
from gx_spark import ops

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _evr(spark: SparkSession, df: DataFrame, suite: ExpectationSuite, tables=None):
    return validate(
        spark, df, suite, EngineOptions(collect_violations=False), tables=tables
    ).suite_result.results


def _row(spark: SparkSession, schema: str, values: list) -> DataFrame:
    return spark.createDataFrame([tuple(values)], schema)


# ---------------------------------------------------------------------------
# engine-backed validation queries
# ---------------------------------------------------------------------------


def q_row_count_lineitem(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "lineitem"),
             ExpectationSuite("q").add("expect_table_row_count_to_be_between", min_value=0))
    return _row(spark, "observed long", [int(r[0].result["observed_value"])])


def q_not_null_orders_custkey(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "orders"),
             ExpectationSuite("q").add("expect_column_values_to_not_be_null", column="o_custkey"))
    res = r[0].result
    return _row(spark, "element_count long, unexpected_count long",
                [res["element_count"], res["unexpected_count"]])


def q_unique_orderkey_orders(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "orders"),
             ExpectationSuite("q").add("expect_column_values_to_be_unique", column="o_orderkey"))
    return _row(spark, "unexpected_count long", [r[0].result["unexpected_count"]])


def q_in_set_returnflag(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "lineitem"),
             ExpectationSuite("q").add("expect_column_values_to_be_in_set",
                                       column="l_returnflag", value_set=["A", "N", "R"]))
    res = r[0].result
    return _row(spark, "element_count long, unexpected_count long",
                [res["element_count"], res["unexpected_count"]])


def q_regex_event_type(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "events"),
             ExpectationSuite("q").add("expect_column_values_to_match_regex",
                                       column="event_type", regex="^[a-z]+$"))
    return _row(spark, "unexpected_count long", [r[0].result["unexpected_count"]])


def q_between_quantity(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "lineitem"),
             ExpectationSuite("q").add("expect_column_values_to_be_between",
                                       column="l_quantity", min_value=1, max_value=50))
    return _row(spark, "unexpected_count long", [r[0].result["unexpected_count"]])


def q_value_length_name(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "customer"),
             ExpectationSuite("q").add("expect_column_value_lengths_to_be_between",
                                       column="c_name", min_value=5, max_value=25))
    res = r[0].result
    return _row(spark, "element_count long, unexpected_count long",
                [res["element_count"], res["unexpected_count"]])


def q_mean_extendedprice(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "lineitem"),
             ExpectationSuite("q").add("expect_column_mean_to_be_between",
                                       column="l_extendedprice", min_value=0))
    return _row(spark, "mean_price double", [round(r[0].result["observed_value"], 6)])


def q_stdev_acctbal(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "customer"),
             ExpectationSuite("q").add("expect_column_stdev_to_be_between",
                                       column="c_acctbal", min_value=0))
    return _row(spark, "stdev double", [round(r[0].result["observed_value"], 6)])


def q_minmax_sum_tax(spark, sf_dir):
    df = _load(spark, sf_dir, "lineitem")
    rs = _evr(spark, df, ExpectationSuite("q")
              .add("expect_column_min_to_be_between", column="l_tax")
              .add("expect_column_max_to_be_between", column="l_tax")
              .add("expect_column_sum_to_be_between", column="l_tax"))
    return _row(spark, "min_tax double, max_tax double, sum_tax double",
                [rs[0].result["observed_value"], rs[1].result["observed_value"],
                 round(rs[2].result["observed_value"], 6)])


def q_distinct_count_mktsegment(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "customer"),
             ExpectationSuite("q").add("expect_column_unique_value_count_to_be_between",
                                       column="c_mktsegment", min_value=0))
    return _row(spark, "distinct_count long", [int(r[0].result["observed_value"])])


def q_quantiles_totalprice(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "orders"),
             ExpectationSuite("q").add(
                 "expect_column_quantile_values_to_be_between", column="o_totalprice",
                 quantile_ranges={"quantiles": [0.25, 0.5, 0.75]}))
    obs = r[0].result["observed_value"]
    rows = [(float(q), round(float(v), 6)) for q, v in zip(obs["quantiles"], obs["values"])]
    return spark.createDataFrame(rows, "quantile double, value double")


def q_value_counts_linestatus(spark, sf_dir):
    # the engine's value_counts shape: hash-groupBy with map-side combine
    return (
        _load(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def q_most_common_linestatus(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "lineitem"),
             ExpectationSuite("q").add("expect_column_most_common_value_to_be_in_set",
                                       column="l_linestatus", value_set=["F", "O"], ties_okay=True))
    modes = r[0].result["observed_value"]
    return _row(spark, "most_common string", [modes[0]])


def q_pair_ship_after_order(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_shipdate", "o_orderdate"
    )
    r = _evr(spark, joined,
             ExpectationSuite("q").add("expect_column_pair_values_a_to_be_greater_than_b",
                                       column_A="l_shipdate", column_B="o_orderdate"))
    res = r[0].result
    return _row(spark, "element_count long, unexpected_count long",
                [res["element_count"], res["unexpected_count"]])


def q_referential_custkey(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "orders"),
             ExpectationSuite("q").add("expect_column_values_to_exist_in_table",
                                       column="o_custkey", other_table_name="customer",
                                       other_column="c_custkey"),
             tables={"customer": _load(spark, sf_dir, "customer")})
    return _row(spark, "unexpected_count long", [r[0].result["unexpected_count"]])


def q_referential_salted_custkey(spark, sf_dir):
    """Same referential check routed through the key-salted large-dim plan
    (gx_spark/skew.py): distinct-first + salted left_anti, no broadcast of
    the dimension.  Oracle-identical to the broadcast path by construction;
    this entry pins that equivalence end-to-end on real data."""
    r = _evr(spark, _load(spark, sf_dir, "orders"),
             ExpectationSuite("q").add("expect_column_values_to_exist_in_table",
                                       column="o_custkey", other_table_name="customer",
                                       other_column="c_custkey",
                                       dim_strategy="salted", salt_buckets=8),
             tables={"customer": _load(spark, sf_dir, "customer")})
    return _row(spark, "unexpected_count long", [r[0].result["unexpected_count"]])


def q_compound_unique_lineitem(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "lineitem"),
             ExpectationSuite("q").add("expect_compound_columns_to_be_unique",
                                       column_list=["l_orderkey", "l_linenumber"]))
    return _row(spark, "unexpected_count long", [r[0].result["unexpected_count"]])


def q_multicol_sum_10(spark, sf_dir):
    df = _load(spark, sf_dir, "lineitem").withColumn(
        "l_comp", F.lit(10) - F.col("l_linenumber")
    )
    r = _evr(spark, df,
             ExpectationSuite("q").add("expect_multicolumn_sum_to_equal",
                                       column_list=["l_linenumber", "l_comp"], sum_total=10))
    res = r[0].result
    return _row(spark, "element_count long, unexpected_count long",
                [res["element_count"], res["unexpected_count"]])


_QTY_BINS = [0.0, 10.0, 20.0, 30.0, 40.0, 50.0]


def _kl_results(spark, sf_dir, kind: str):
    exp = ("expect_column_kl_divergence_to_be_less_than" if kind == "kl"
           else "expect_column_psi_to_be_less_than")
    r = _evr(spark, _load(spark, sf_dir, "lineitem"),
             ExpectationSuite("q").add(exp, column="l_quantity",
                                       partition_object={"bins": _QTY_BINS,
                                                         "weights": [0.2] * 5},
                                       threshold=1000.0))
    return r[0].result


def q_histogram_quantity(spark, sf_dir):
    res = _kl_results(spark, sf_dir, "kl")
    det = res["details"]["observed_partition"]
    total_w = det["weights"]
    nn = _load(spark, sf_dir, "lineitem").where(F.col("l_quantity").isNotNull()).count()
    rows = [(i, int(round(w * nn))) for i, w in enumerate(total_w)]
    return spark.createDataFrame(rows, "bin_idx int, cnt long")


def q_kl_quantity_uniform(spark, sf_dir):
    res = _kl_results(spark, sf_dir, "kl")
    return _row(spark, "kl double", [float(round(res["observed_value"], 6))])


def q_psi_quantity_uniform(spark, sf_dir):
    res = _kl_results(spark, sf_dir, "psi")
    return _row(spark, "psi double", [float(round(res["observed_value"], 6))])


def q_kl_vs_profiled_baseline(spark, sf_dir):
    """Round-trip: profile a deterministic half-batch (uniform 5-bin
    partition on l_quantity) into the MetricStore, then drift-check the FULL
    table against the stored baseline via URN evaluation-parameter
    indirection (SURVEY.md §2.4 column.partition + §2.9)."""
    import shutil
    import tempfile

    from gx_spark.profile import MetricStore, Profiler

    li = _load(spark, sf_dir, "lineitem")
    base = li.where(F.col("l_orderkey") % 2 == 0)
    td = tempfile.mkdtemp(prefix="gx_store_")
    try:
        store = MetricStore(spark, f"{td}/metrics")
        Profiler(spark, store).profile(
            base, "lineitem", columns=["l_quantity"],
            partition_columns=["l_quantity"], bins="uniform", n_bins=5,
        )
        po = store.resolve_urn("urn:gx:metric:lineitem:l_quantity:column.partition")
    finally:
        shutil.rmtree(td, ignore_errors=True)
    r = _evr(spark, li, ExpectationSuite("q").add(
        "expect_column_kl_divergence_to_be_less_than", column="l_quantity",
        partition_object=po, threshold=1000.0))
    return _row(spark, "kl double", [float(round(r[0].result["observed_value"], 6))])


def q_json_props_parseable(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "events"),
             ExpectationSuite("q").add("expect_column_values_to_be_json_parseable",
                                       column="props"))
    return _row(spark, "unexpected_count long", [r[0].result["unexpected_count"]])


def q_row_condition_filtered_mean(spark, sf_dir):
    r = _evr(spark, _load(spark, sf_dir, "lineitem"),
             ExpectationSuite("q").add("expect_column_mean_to_be_between",
                                       column="l_quantity", min_value=0,
                                       row_condition="l_returnflag = 'A'"))
    return _row(spark, "mean_qty double", [round(r[0].result["observed_value"], 6)])


# ---------------------------------------------------------------------------
# training-data pipeline operators (gx_spark.ops)
# ---------------------------------------------------------------------------


def q_dedup_exact_documents(spark, sf_dir):
    return ops.exact_dedup_stats(_load(spark, sf_dir, "documents"), ["text"])


def q_token_stats_documents(spark, sf_dir):
    return ops.token_stats(_load(spark, sf_dir, "documents"), "text")


def q_quality_documents(spark, sf_dir):
    return ops.quality_scores(_load(spark, sf_dir, "documents"), "doc_id", "text")


def q_lang_distribution_documents(spark, sf_dir):
    return ops.lang_distribution(_load(spark, sf_dir, "documents"), "text")


def q_fingerprint_documents(spark, sf_dir):
    return ops.md5_fingerprints(_load(spark, sf_dir, "documents"), "doc_id", "text")


def _query_vec(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    return [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]


def q_cosine_topk_embeddings(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    out = ops.cosine_topk(emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10)
    return out.select(F.col("id").alias("vec_id"), F.round("cosine", 6).alias("cosine"))


def q_minhash_near_dups(spark, sf_dir):
    # rows-only check (LSH not ANSI-SQL-expressible)
    docs = _load(spark, sf_dir, "documents")
    pairs = ops.minhash_jaccard(docs, "doc_id", "text", threshold=0.2)
    return pairs.agg(F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"))


def q_simhash_documents(spark, sf_dir):
    # rows-only (xxhash64 seed not reproducible in DuckDB)
    return ops.simhash64(_load(spark, sf_dir, "documents"), "doc_id", "text")


def _ann_recall(spark, sf_dir, ann_out, min_recall):
    """Make an ANN query driver-oracleable: centroids/hyperplane seeds are
    not ANSI-SQL-expressible, but the EXACT top-10 is (brute-force cosine,
    same oracle as cosine_topk) — so return the deterministic exact top-10
    plus `recall_ok` = (|ANN∩exact| / 10 >= min_recall), computed in-Spark
    via a left-semi join against the ANN shortlist.  The oracle emits the
    exact top-10 with a TRUE literal: an ANN recall regression flips
    recall_ok to false and the driver hash-mismatches."""
    emb = _load(spark, sf_dir, "embeddings")
    exact = ops.cosine_topk(emb, "vec_id", "embedding",
                            _query_vec(spark, sf_dir), k=10)
    hits = exact.join(ann_out.select(F.col("id").alias("_aid")),
                      F.col("id") == F.col("_aid"), "left_semi").count()
    ok = bool(hits / 10.0 >= min_recall)
    return exact.select(F.col("id").alias("vec_id"),
                        F.round("cosine", 6).alias("cosine"),
                        F.lit(ok).alias("recall_ok"))


def q_ann_lsh_embeddings(spark, sf_dir):
    # ANN via random-hyperplane LSH bucket probe; recall >= 0.9 vs exact
    # top-10 folded into the hash (pytest pin: tests/test_ops2.py)
    emb = _load(spark, sf_dir, "embeddings")
    out = ops.ann_topk_lsh(emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10)
    return _ann_recall(spark, sf_dir, out, min_recall=0.9)


def q_image_metadata_violations(spark, sf_dir):
    """Multimodal image layer: deterministic images synthesized from
    documents.doc_id — doc_id%4==1 rows are REAL progressive JPEGs
    (gx_spark/jpeg.py jpeg_encode_progressive, SOF2 spectral selection +
    successive approximation, pixel-decoded since r5), the rest gxraw.
    Corruption classes: width lies when doc_id%10==7, payload truncated
    when doc_id%10==9, dark (0.15x) pixels when doc_id%10==5.  The
    decode-backed metadata expectation must flag exactly the 7s and 9s,
    and the mean-intensity expectation (min_value=60 — normal synth
    means are >=73, dark <=17, measured) exactly the 5s — the intensity
    check RUNS on the progressive rows' decoded pixels.  The oracle
    recomputes both counts from the corruption arithmetic."""
    from gx_spark import image as gim
    from gx_spark.jpeg import jpeg_encode_progressive

    docs = _load(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(500)
    ids = [int(r.doc_id) for r in docs.collect()]
    rows = []
    for i in ids:
        img_id = f"img_{i}"
        w, h = 16 + (i % 3) * 8, 16
        px = gim.synth_image(img_id, w, h)
        if i % 10 == 5:
            px = (px * 0.15).astype("uint8")
        if i % 4 == 1:
            b, fmt = jpeg_encode_progressive(px, 85), "jpeg"
        else:
            b, fmt = gim.raw_encode(px), "gxraw"
        width = w + 1 if i % 10 == 7 else w
        if i % 10 == 9:
            b = b[: len(b) // 2]
        rows.append((i, img_id, bytearray(b), width, h, 3, fmt))
    df = spark.createDataFrame(
        rows,
        "doc_id long, img_id string, bytes binary, width int, height int, "
        "channels int, format string",
    )
    r = _evr(
        spark, df,
        ExpectationSuite("q")
        .add("expect_image_metadata_to_be_consistent")
        .add("expect_image_mean_intensity_to_be_between", min_value=60),
    )
    return _row(
        spark,
        "element_count long, meta_unexpected long, intensity_unexpected long",
        [r[0].result["element_count"], r[0].result["unexpected_count"],
         r[1].result["unexpected_count"]],
    )


def q_image_png_violations(spark, sf_dir):
    """Real PNG decode path (gx_spark/png.py — pure zlib+numpy, no codec
    libs): PNG images synthesized from documents.doc_id with three
    corruption classes — width metadata lies (doc_id%10==7), truncated
    payload (==9), single-bit IDAT flip caught by chunk CRC (==3).  The
    engine must flag exactly those rows; the oracle recomputes the count
    from the corruption arithmetic."""
    from gx_spark import image as gim
    from gx_spark.png import png_encode

    docs = _load(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(400)
    ids = [int(r.doc_id) for r in docs.collect()]
    rows = []
    for i in ids:
        img_id = f"png_{i}"
        w, h = 16 + (i % 3) * 8, 16
        b = png_encode(gim.synth_image(img_id, w, h))
        width = w + 1 if i % 10 == 7 else w
        if i % 10 == 9:
            b = b[: len(b) // 2]
        elif i % 10 == 3:
            bb = bytearray(b)
            bb[len(bb) // 2] ^= 0x01
            b = bytes(bb)
        rows.append((i, img_id, bytearray(b), width, h, 3, "png"))
    df = spark.createDataFrame(
        rows,
        "doc_id long, img_id string, bytes binary, width int, height int, "
        "channels int, format string",
    )
    r = _evr(spark, df,
             ExpectationSuite("q").add("expect_image_metadata_to_be_consistent"))
    res = r[0].result
    return _row(spark, "element_count long, unexpected_count long",
                [res["element_count"], res["unexpected_count"]])


def q_ann_ivf_embeddings(spark, sf_dir):
    # IVF coarse-quantizer ANN (k-means centroids not reproducible in ANSI
    # SQL, so the oracle checks exact top-10 + recall_ok; exactness at
    # nprobe=n_centroids and partial-probe recall pinned by tests/test_ivf.py)
    emb = _load(spark, sf_dir, "embeddings")
    out = ops.ann_topk_ivf(emb, "vec_id", "embedding",
                           _query_vec(spark, sf_dir), k=10,
                           n_centroids=16, nprobe=8)
    return _ann_recall(spark, sf_dir, out, min_recall=0.8)


def q_ann_pq_embeddings(spark, sf_dir):
    # product-quantization ANN (Jégou TPAMI'11) with ADC shortlist + exact
    # rerank; k-means codebooks not reproducible in ANSI SQL so the oracle
    # checks exact top-10 + recall_ok (ADC exactness and recall@10 >= 0.9
    # pinned by tests/test_pq.py)
    emb = _load(spark, sf_dir, "embeddings")
    B = ops.train_pq_codebooks(emb, "embedding", m=8, k=64, seed=42)
    codes = ops.pq_encode(emb, "vec_id", "embedding", B)
    out = ops.pq_topk_rerank(emb, "vec_id", "embedding", codes, B,
                             _query_vec(spark, sf_dir), k=10, shortlist=50)
    return _ann_recall(spark, sf_dir, out, min_recall=0.9)


def q_ann_ivfpq_embeddings(spark, sf_dir):
    # full IVFADC composition (Jégou TPAMI'11 §V) — written index
    # partitioned by coarse cell (probe = partition pruning) with residual
    # PQ codes (probe streams 8-byte codes), ADC shortlist + exact rerank;
    # k-means seeds not reproducible in ANSI SQL so the oracle checks
    # exact top-10 + recall_ok (ADC exactness / pruning plan / recall
    # pinned by tests/test_ivfpq.py)
    import shutil
    import tempfile

    emb = _load(spark, sf_dir, "embeddings")
    d = tempfile.mkdtemp(prefix="gx_ivfpq_entry_")
    try:
        ops.write_ivfpq_index(emb, "vec_id", "embedding", d,
                              n_centroids=16, m=8, n_codes=64, seed=42)
        codes, C, B = ops.read_ivfpq_index(spark, d)
        out = ops.ivfpq_topk_rerank(emb, "vec_id", "embedding", codes, C, B,
                                    _query_vec(spark, sf_dir), k=10,
                                    nprobe=8, shortlist=50)
        res = _ann_recall(spark, sf_dir, out, min_recall=0.8)
        rows = res.collect()  # materialize before the index dir is removed
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(
        rows, "vec_id bigint, cosine double, recall_ok boolean")


def q_word_jaccard_documents(spark, sf_dir):
    # EXACT word-set Jaccard pairs via inverted-index join (ops.py) — the
    # verification baseline for the minhash/LSH near-dup path
    docs = _load(spark, sf_dir, "documents")
    out = ops.word_jaccard_pairs(docs, "doc_id", "text", threshold=0.9)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_edit_distance_documents(spark, sf_dir):
    """Character-level fuzzy-dup verification (ops.edit_distance_pairs):
    word-Jaccard 0.95 candidates confirmed by the BUILT-IN banded
    levenshtein (3-arg form, O(len*k)) — pairs beyond the 150-edit band
    report dist=-1/null sim, in-band pairs get floor-milli similarity
    (integer output, no cross-engine float-rounding hazard).  Restricted
    to ASCII-pure rows (octet_length == length) because Spark's
    levenshtein counts codepoints while DuckDB's counts bytes; the op is
    unicode-correct, the ORACLE comparison is ASCII-only."""
    docs = _load(spark, sf_dir, "documents").filter(
        F.octet_length("text") == F.length("text"))
    return ops.edit_distance_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.95, max_dist=150)


def q_dedup_clusters_documents(spark, sf_dir):
    # full near-dup CLUSTERING: exact word-Jaccard pairs -> large-star/
    # small-star connected components -> canonical-doc election (longest
    # text, ties -> smallest id).  Transitive closure without materializing
    # it; at scale each CC round is a plain keyed agg + join (AQE-friendly).
    docs = _load(spark, sf_dir, "documents")
    return ops.dedup_clusters(docs, "doc_id", "text", threshold=0.9)


def q_cosine_near_dups_embeddings(spark, sf_dir):
    # exact-mode all-pairs cosine near-dups (bounded verification slice);
    # the LSH mode is covered by the recall pytest (tests/test_ops2.py)
    emb = _load(spark, sf_dir, "embeddings")
    out = ops.cosine_near_dup_pairs(emb, "vec_id", "embedding",
                                    threshold=0.4, mode="exact")
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_hash_split_documents(spark, sf_dir):
    # deterministic content-stable train/val split: md5-bucket assignment,
    # pure map-side expression — same split on any cluster at any
    # parallelism (vs sample/randomSplit whose outcome depends on
    # partitioning)
    docs = _load(spark, sf_dir, "documents")
    out = ops.hash_split(docs, "doc_id", val_permille=100)
    return out.select("doc_id", "split")


def q_group_cap_documents(spark, sf_dir):
    # per-source document cap (anti-over-representation curation): keep the
    # 10 longest docs per source, ties by doc_id — one shuffle on source,
    # window state bounded by the group (sources hold ~25 docs at sf0.01,
    # so the cap genuinely filters)
    docs = _load(spark, sf_dir, "documents")
    out = ops.group_cap(docs, "source", "n_chars", cap=10, id_col="doc_id")
    return out.select("doc_id", "source", "n_chars")


def q_mixture_sample_documents(spark, sf_dir):
    # data-mixing recipe step: downsample sources toward a 50/30/20 target
    # token mix under a 5000-char budget; membership is the deterministic
    # md5-bucket rule (reproducible at any parallelism), keep fractions
    # from one tiny broadcast groupBy
    docs = _load(spark, sf_dir, "documents")
    out = ops.mixture_sample(
        docs, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        token_col="n_chars", budget_tokens=5000, key_col="doc_id")
    return out.select("doc_id", "source", "n_chars")


def q_bpe_tokenize_documents(spark, sf_dir):
    # REAL corpus-trained BPE (Sennrich ACL'16), trained at runtime; the
    # greedy merge TRAINING loop is not ANSI-SQL-expressible, but APPLYING
    # a merge table is — the oracle replays the committed sf0.01 merge
    # table (_BPE_MERGES_SF0_01) with a recursive CTE and recomputes every
    # per-doc token count, so training drift, encode bugs, and lossiness
    # all hash-mismatch.  reconstruction_ok is computed for real in Spark:
    # concat(tokens) minus the </w> markers must equal the source text.
    docs = _load(spark, sf_dir, "documents")
    merges = ops.train_bpe_merges(docs, "text", n_merges=300)
    out = ops.bpe_encode(docs, "doc_id", "text", merges)
    joined = out.join(docs.select(F.col("doc_id").alias("id"), "text"), "id")
    return joined.select(
        F.col("id").alias("doc_id"),
        F.coalesce(F.size("tokens"), F.lit(0)).cast("long")
        .alias("n_bpe_tokens"),
        (F.regexp_replace(F.concat_ws("", F.col("tokens")), "</w>", "")
         == F.coalesce(F.col("text"), F.lit("")))
        .alias("reconstruction_ok"),
    )


def q_token_shards_documents(spark, sf_dir):
    # fixed-token-budget training shards via the two-phase distributed
    # prefix sum (range shuffle + broadcast offsets) — never a one-
    # partition global window; oracle recomputes serially with ANSI cumsum
    docs = _load(spark, sf_dir, "documents")
    out = ops.token_shards(docs, "doc_id", "n_chars", shard_tokens=2000)
    return out.select(F.col("id").alias("doc_id"), "shard")


def q_embedding_dedup_clusters(spark, sf_dir):
    # semantic dedup: exact cosine pairs (oracle-checkable baseline; the
    # LSH mode is the at-scale path, recall-pinned in pytest) -> connected
    # components -> canonical = min id per cluster
    emb = _load(spark, sf_dir, "embeddings")
    return ops.embedding_dedup_clusters(emb, "vec_id", "embedding",
                                        threshold=0.4, mode="exact")


def q_chisquare_mktsegment(spark, sf_dir):
    # chi-square GoF statistic of c_mktsegment against a uniform 5-way
    # partition, computed by the engine's fused stage-1 conditional sums
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    r = _evr(
        spark, _load(spark, sf_dir, "customer"),
        ExpectationSuite("q").add(
            "expect_column_chisquare_test_p_value_to_be_greater_than",
            column="c_mktsegment",
            partition_object={"values": segs, "weights": [0.2] * 5},
            p=1e-9,
        ),
    )
    d = r[0].result["details"]
    return _row(spark, "chi2_stat double, dof long",
                [round(float(d["chi_squared"]), 6), int(d["dof"])])


def q_cramers_phi_orders(spark, sf_dir):
    """Cramér's phi association gate (gx_spark/expectations/stat_tests.py
    CramersPhi, upstream's pandas-only
    expect_column_pair_cramers_phi_value_to_be_less_than rebuilt as ONE
    map-side-combined groupBy over the pruned pair projection): the
    (o_orderpriority, o_orderstatus) contingency table's uncorrected
    Pearson chi2 -> phi_c = sqrt(chi2/(n*min(r-1,c-1))).  The oracle
    recomputes the full contingency/expected/chi2/phi cascade
    relationally in DuckDB."""
    r = _evr(
        spark, _load(spark, sf_dir, "orders"),
        ExpectationSuite("q").add(
            "expect_column_pair_cramers_phi_value_to_be_less_than",
            column_A="o_orderpriority", column_B="o_orderstatus",
            threshold=0.1,
        ),
    )
    d = r[0].result["details"]
    return _row(
        spark,
        "phi double, chi2_stat double, n long, r long, c long, "
        "success boolean",
        [round(float(r[0].result["observed_value"]), 6),
         round(float(d["chi_squared"]), 6), int(d["n"]), int(d["r"]),
         int(d["c"]), bool(r[0].success)],
    )


def q_ks_stat_uniform_quantity(spark, sf_dir):
    """Exact one-sample KS statistic of l_quantity vs Uniform[1, 50]
    (ECDF via a window rank — the exact baseline; the engine expectation
    estimates the same statistic from a fused percentile_approx grid, and
    the two are cross-checked here within 1/m + sketch error)."""
    from pyspark.sql import Window

    li = _load(spark, sf_dir, "lineitem").where(F.col("l_quantity").isNotNull())
    w = Window.orderBy("l_quantity")
    s = li.select(
        F.col("l_quantity").alias("x"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ).alias("n"),
    )
    cdf = F.least(F.greatest((F.col("x") - 1.0) / 49.0, F.lit(0.0)), F.lit(1.0))
    d_exact = s.agg(
        F.round(
            F.max(
                F.greatest(
                    F.col("rn") / F.col("n") - cdf,
                    cdf - (F.col("rn") - 1) / F.col("n"),
                )
            ),
            6,
        ).alias("ks_stat")
    )
    # engine cross-check: grid estimate within 1/m of the exact statistic
    r = _evr(
        spark, _load(spark, sf_dir, "lineitem"),
        ExpectationSuite("q").add(
            "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
            column="l_quantity", distribution="uniform",
            params={"min": 1.0, "max": 50.0}, p_value=1e-12,
        ),
    )
    est = r[0].result["details"]["ks_statistic"]
    exact = float(d_exact.first()["ks_stat"])
    if abs(est - exact) > 1.0 / 1024 + 2e-3:
        raise AssertionError(f"KS grid estimate {est} vs exact {exact}")
    return d_exact


def q_audio_flac_violations(spark, sf_dir):
    """Real FLAC decode path (gx_spark/flac.py — pure-spec codec): clips
    synthesized from documents.doc_id, FLAC-encoded, with four deterministic
    corruption classes — sr_hz column lies (doc_id%10==7), truncated stream
    (==9), additive noise pushing SNR below 30 dB (==5), wrong transcript
    (==3).  The engine's three audio expectations must flag exactly those
    classes; the oracle recomputes each count from the corruption
    arithmetic.  The sr-lie class fails BOTH metadata and SNR: the
    reference signal is re-synthesized at the (lying) sr_hz column, so the
    decoded PCM no longer matches it — the correct cascade for a mislabeled
    sample rate."""
    import numpy as np

    from gx_spark.audio import ref_transcript, synth_pcm
    from gx_spark.flac import flac_encode

    docs = _load(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(400)
    ids = [int(r.doc_id) for r in docs.collect()]
    sr, dur = 8000, 250
    rows = []
    for i in ids:
        clip_id = f"flac_{i}"
        pcm = synth_pcm(clip_id, sr, dur)
        if i % 10 == 5:  # deterministic noise: SNR ~6 dB, well under 30
            noise = np.where(np.arange(len(pcm)) % 2 == 0, 8000, -8000)
            pcm = np.clip(pcm.astype(np.int32) + noise, -32768, 32767).astype(np.int16)
        b = flac_encode(pcm, sr)
        sr_col = sr * 2 if i % 10 == 7 else sr
        if i % 10 == 9:
            b = b[: len(b) // 2]
        tr = "WRONG TRANSCRIPT" if i % 10 == 3 else ref_transcript(clip_id)
        rows.append((i, clip_id, bytearray(b), sr_col, dur, "flac", tr))
    df = spark.createDataFrame(
        rows,
        "doc_id long, clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    r = _evr(
        spark, df,
        ExpectationSuite("flac")
        .add("expect_audio_metadata_to_be_consistent")
        .add("expect_audio_snr_to_be_at_least", min_snr_db=30.0)
        .add("expect_transcript_to_match_reference"),
    )
    return _row(
        spark,
        "element_count long, meta_unexpected long, snr_unexpected long, "
        "transcript_unexpected long",
        [r[0].result["element_count"], r[0].result["unexpected_count"],
         r[1].result["unexpected_count"], r[2].result["unexpected_count"]],
    )


def q_audio_opus_container_violations(spark, sf_dir):
    """Ogg-Opus validation path (gx_spark/oggopus.py — real RFC 3533/7845
    container mux/demux + RFC 6716 §3 packet-framing validation; only the
    CELT/SILK frame contents stay opaque): clips synthesized
    from documents.doc_id with five deterministic corruption classes —
    OpusHead input-rate lie (doc_id%10==7), truncated container → page
    CRC/parse failure (==9), granule duration inconsistent with dur_ms
    (==5), opaque non-Ogg bytes (==1), and a PACKET-level framing
    corruption with pages/CRCs fully intact — a code-3 TOC declaring
    zero frames, rule R5 — that only the RFC 6716 packet layer can catch
    (==3).  The metadata expectation must flag exactly those classes;
    SNR flags nothing (snr_db is null for opus — the CELT/SILK frame
    contents are out of scope in-sandbox, and the engine certifies only
    what it can verify)."""
    from gx_spark.audio import ref_transcript
    from gx_spark.oggopus import ogg_opus_encode

    docs = _load(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(400)
    ids = [int(r.doc_id) for r in docs.collect()]
    sr, dur = 16000, 400
    rows = []
    for i in ids:
        clip_id = f"opus_{i}"
        ogg_sr = sr * 2 if i % 10 == 7 else sr
        ogg_dur = dur * 3 if i % 10 == 5 else dur
        b = ogg_opus_encode(clip_id, ogg_sr, ogg_dur,
                            corrupt_packet=(i % 10 == 3))
        if i % 10 == 9:
            b = b[: int(len(b) * 0.6)]
        if i % 10 == 1:
            b = b"JUNK" + clip_id.encode()
        rows.append((i, clip_id, bytearray(b), sr, dur, "opus",
                     ref_transcript(clip_id)))
    df = spark.createDataFrame(
        rows,
        "doc_id long, clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    r = _evr(
        spark, df,
        ExpectationSuite("opus")
        .add("expect_audio_metadata_to_be_consistent")
        .add("expect_audio_snr_to_be_at_least", min_snr_db=30.0),
    )
    return _row(
        spark,
        "element_count long, meta_unexpected long, snr_unexpected long",
        [r[0].result["element_count"], r[0].result["unexpected_count"],
         r[1].result["unexpected_count"]],
    )


def q_video_mp4_container_violations(spark, sf_dir):
    """MP4/ISO-BMFF container validation (gx_spark/isobmff.py — real box
    mux/demux; AVC bitstream stubbed): videos synthesized from
    documents.doc_id with four deterministic container corruption classes
    — tkhd dims lie (doc_id%10==7), truncated container (==9), mvhd
    duration vs n_frames/fps lie (==5), non-BMFF junk (==1).  The video
    metadata expectation must flag exactly those classes; the oracle
    recomputes the counts from the corruption arithmetic."""
    from gx_spark.isobmff import mp4_encode

    docs = _load(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(400)
    ids = [int(r.doc_id) for r in docs.collect()]
    rows = []
    for i in ids:
        vid = f"vid_{i}"
        nf, fps, w, h = 100, 25.0, 64, 48
        enc_nf = nf * 3 if i % 10 == 5 else nf
        enc_w = w // 2 if i % 10 == 7 else w
        b = mp4_encode(vid, enc_nf, fps, enc_w, h)
        if i % 10 == 9:
            b = b[: len(b) // 3]
        if i % 10 == 1:
            b = b"JUNK" + vid.encode()
        rows.append((i, vid, bytearray(b), nf, fps, w, h, "mp4"))
    df = spark.createDataFrame(
        rows,
        "doc_id long, vid_id string, bytes binary, n_frames int, "
        "fps double, width int, height int, format string",
    )
    r = _evr(
        spark, df,
        ExpectationSuite("video")
        .add("expect_video_metadata_to_be_consistent"),
    )
    return _row(
        spark,
        "element_count long, meta_unexpected long",
        [r[0].result["element_count"], r[0].result["unexpected_count"]],
    )


def q_video_h264_sps_violations(spark, sf_dir):
    """Bare-H.264 Annex-B BITSTREAM validation (gx_spark/h264.py — real
    exp-Golomb SPS mux/parse with VUI timing; slice macroblock data stays
    opaque): videos synthesized from documents.doc_id with four
    deterministic corruption classes — SPS dims lie vs the metadata
    columns (doc_id%10==7), truncated stream (==9), wrong coded frame
    count so the bitstream duration lies (==5), non-AVC junk (==1).  The
    video metadata expectation must flag exactly those classes; the
    oracle recomputes the counts from the corruption arithmetic."""
    from gx_spark.h264 import annexb_encode

    docs = _load(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").limit(400)
    ids = [int(r.doc_id) for r in docs.collect()]
    rows = []
    for i in ids:
        vid = f"h264_{i}"
        nf, fps, w, h = 48, 24.0, 320, 180
        enc_nf = nf * 2 if i % 10 == 5 else nf
        enc_w = w // 2 if i % 10 == 7 else w
        b = annexb_encode(vid, enc_nf, fps, enc_w, h)
        if i % 10 == 9:
            b = b[:20]  # cuts the SPS mid-field
        if i % 10 == 1:
            b = b"JUNK" + vid.encode()
        rows.append((i, vid, bytearray(b), nf, fps, w, h, "h264"))
    df = spark.createDataFrame(
        rows,
        "doc_id long, vid_id string, bytes binary, n_frames int, "
        "fps double, width int, height int, format string",
    )
    r = _evr(
        spark, df,
        ExpectationSuite("video_h264")
        .add("expect_video_metadata_to_be_consistent"),
    )
    return _row(
        spark,
        "element_count long, meta_unexpected long",
        [r[0].result["element_count"], r[0].result["unexpected_count"]],
    )


def q_decontaminate_documents(spark, sf_dir):
    """Test-set decontamination (GPT-3 appendix-C n-gram filter,
    gx_spark/ops.py decontaminate): docs with doc_id%10==7 stand in for
    the held-out benchmark; every other doc is train.  A train doc is
    contaminated if it shares ANY word 5-gram with the bench set (the
    corpus's planted near-dups light this up: 6 docs at sf0.01).  Bench
    grams are DISTINCT + broadcast, so train rows never shuffle for the
    probe.  Output: per train doc with >=5 words, total distinct 5-grams,
    contaminated-gram count, flag."""
    docs = _load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 7)
    train = docs.filter(F.col("doc_id") % 10 != 7)
    return ops.decontaminate(train, bench, "doc_id", "text", n=5).select(
        "doc_id", "n_ngrams", "n_hits", "contaminated"
    )


def q_repetition_stats_documents(spark, sf_dir):
    """Within-document repetition quality signals (Gopher / Rae et al.
    2021 Table A1, gx_spark/ops.py repetition_stats): duplicate word
    2-gram / 3-gram fractions + the most-repeated 2-gram's multiplicity,
    all computed as higher-order-function folds over each doc's own gram
    array — the plan has ZERO Exchange (pinned in tests); the oracle
    recomputes every signal relationally."""
    docs = _load(spark, sf_dir, "documents")
    return ops.repetition_stats(docs, "doc_id", "text")


def q_line_dedup_documents(spark, sf_dir):
    """Corpus-wide exact line dedup (C4 §2.2 / Dolma / RefinedWeb,
    gx_spark/ops.py line_dedup): every distinct line is kept only at its
    first (doc_id, line_no) occurrence corpus-wide and dropped everywhere
    else, then documents are reassembled in original line order.  The
    driver corpus has no newlines, so lines are manufactured by the
    deterministic 8-words-per-line reflow (ops.reflow_lines) that the
    oracle replicates with stepped 1-based list slices; the corpus's
    planted near-dup docs share aligned word runs, so real cross-doc line
    collisions occur.  Output: per doc, line counts before/after + the
    deduplicated text."""
    docs = _load(spark, sf_dir, "documents")
    reflowed = ops.reflow_lines(docs, "doc_id", "text", words_per_line=8)
    return ops.line_dedup(reflowed, "doc_id", "text")


def q_unigram_logprob_documents(spark, sf_dir):
    """CCNet-style LM quality score (Wenzek et al. 2020,
    gx_spark/ops.py unigram_logprob): mean natural-log token probability
    per doc under the corpus's own Lidstone-smoothed (alpha=0.5) unigram
    LM — the distributable stand-in for KenLM perplexity filtering.
    Frequency table built with one map-side-combined exchange, scoring
    pass broadcast-joins it; oracle recomputes the identical smoothed
    probabilities relationally."""
    docs = _load(spark, sf_dir, "documents")
    return ops.unigram_logprob(docs, "doc_id", "text", alpha=0.5)


def q_stupid_backoff_documents(spark, sf_dir):
    """Bigram LM quality score with Stupid Backoff smoothing (Brants et
    al. 2007, gx_spark/ops.py stupid_backoff_logprob): mean natural-log
    token score per doc under the corpus's own pruned (min_count=2)
    bigram LM, backoff alpha=0.4 to the unigram/OOV floor — the
    distributed upgrade of the CCNet-style unigram filter that word-salad
    cannot fool.  Training is two map-side-combined wordcount exchanges;
    scoring broadcast-joins the pruned LM so the corpus token stream
    never shuffles; oracle recomputes the identical backoff cascade
    relationally (positions via unnest-with-index, the same CASE tree)."""
    docs = _load(spark, sf_dir, "documents")
    return ops.stupid_backoff_logprob(
        docs, "doc_id", "text", alpha=0.4, min_count=2)


def q_iceberg_hidden_partitioning(spark, sf_dir):
    """Hidden partitioning (gx_spark/iceberg.py partition transforms):
    orders land in a table partitioned by bucket(8, o_custkey) +
    truncate(2, o_orderpriority) — source columns stay in the data files,
    derived values only in dirs/manifests.  Source-column filters prune
    files through the driver-side transform mirror and re-pin rows with
    a residual predicate; `pruned` is engine-verified (True only if both
    filters really excluded files).  The oracle recomputes every figure
    directly over orders — if pruning dropped or duplicated any row, the
    counts/sums hash-mismatch."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    tmp = tempfile.mkdtemp(prefix="gx_ice_hp_")
    try:
        t = IcebergLiteTable.create(
            f"{tmp}/orders_hp", orders.schema,
            partition_by=["bucket(8, o_custkey)",
                          "truncate(2, o_orderpriority)"])
        t.append(orders.repartition(4))
        kmin = int(orders.agg(F.min("o_custkey")).first()[0])
        n_all = len(t.plan_files())
        pf_k = t.plan_files(partition_filter={"o_custkey": kmin})
        pf_p = t.plan_files(
            partition_filter={"o_orderpriority": "2-HIGH"})
        pruned = 0 < len(pf_k) < n_all and 0 < len(pf_p) < n_all
        cust = t.read(spark, partition_filter={"o_custkey": kmin}).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        prio = t.read(
            spark, partition_filter={"o_orderpriority": "2-HIGH"}).count()
        total = t.read(spark).count()
        return _row(
            spark,
            "cust_count long, cust_sum double, prio_count long, "
            "total_count long, pruned boolean",
            [int(cust["c"]), float(cust["s"]), prio, total, pruned],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_spec_evolution(spark, sf_dir):
    """Partition spec evolution (gx_spark/iceberg.py
    update_partition_spec): orders written in two eras — era 1 under
    bucket(4, o_custkey), then the spec evolves (metadata-only, no data
    rewrite) to truncate(2, o_orderpriority) and era 2 lands under it.
    Old files keep their spec and are pruned by it; a filter key unknown
    to a file's spec prunes nothing for that file (the exactness rule),
    and residual predicates re-pin rows, so mixed-spec reads stay exact.
    Engine-verified booleans: `pruned_old` (the custkey filter cut old-era
    files but kept every new-era file), `pruned_new` (the priority filter
    cut new-era files but kept every old-era file), `spec_reused`
    (evolving back to the era-1 layout returns the original spec id
    instead of growing partition-specs).  The oracle recomputes every
    count/sum directly over orders — a row dropped or duplicated by the
    per-file-spec pruning would hash-mismatch."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    era1 = orders.where(F.col("o_orderkey") % 2 == 0)
    era2 = orders.where(F.col("o_orderkey") % 2 == 1)
    tmp = tempfile.mkdtemp(prefix="gx_ice_se_")
    try:
        t = IcebergLiteTable.create(
            f"{tmp}/orders_se", orders.schema,
            partition_by=["bucket(4, o_custkey)"])
        t.append(era1.repartition(2))
        n_old = len(t.plan_files())
        new_spec_id = t.update_partition_spec(
            ["truncate(2, o_orderpriority)"])
        t.append(era2.repartition(2))
        n_all = len(t.plan_files())
        n_new = n_all - n_old
        kmin = int(orders.agg(F.min("o_custkey")).first()[0])
        # custkey is a source column of the OLD spec only: old-era files
        # prune by bucket, every new-era file must survive
        pf_k = t.plan_files(partition_filter={"o_custkey": kmin})
        pruned_old = n_new <= len(pf_k) < n_all
        # priority is a source column of the NEW spec only: new-era files
        # prune by truncate, every old-era file must survive
        pf_p = t.plan_files(
            partition_filter={"o_orderpriority": "2-HIGH"})
        pruned_new = n_old <= len(pf_p) < n_all
        spec_reused = (
            t.update_partition_spec(["bucket(4, o_custkey)"]) < new_spec_id
            and len(t.metadata["partition-specs"]) == 2)
        cust = t.read(spark, partition_filter={"o_custkey": kmin}).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        prio = t.read(
            spark, partition_filter={"o_orderpriority": "2-HIGH"}).count()
        total = t.read(spark).count()
        return _row(
            spark,
            "cust_count long, cust_sum double, prio_count long, "
            "total_count long, pruned_old boolean, pruned_new boolean, "
            "spec_reused boolean",
            [int(cust["c"]), float(cust["s"]), prio, total,
             pruned_old, pruned_new, spec_reused],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_maintenance(spark, sf_dir):
    """Maintenance trio (gx_spark/iceberg.py): rewrite_manifests folds the
    per-commit manifest pile into one per content kind, expire_snapshots
    reclaims aged-out history, remove_orphan_files sweeps planted crash
    debris — and the table reads EXACTLY the same rows afterwards.  The
    manifest/expiry/orphan counts are deterministic by construction
    (3 appends + 1 positional delete + 1 rewrite = 5 snapshots, 4 data+
    delete manifests fold to 2, keep_last=1 expires 4, 2 planted debris
    files); the oracle recomputes the surviving rows' count/sum straight
    from orders and pins those counts as literals."""
    import os
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    base = orders.where(F.col("o_orderkey") % 3 == 0)
    tmp = tempfile.mkdtemp(prefix="gx_ice_mx_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_mx", orders.schema)
        for r in (0, 3, 6):
            t.append(base.where(F.col("o_orderkey") % 9 == r)
                     .repartition(2))
        t.delete(spark, "o_totalprice > 300000")
        before = t.read(spark).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        rw = t.rewrite_manifests()
        ex = t.expire_snapshots(keep_last=1)
        for name in ("part-crashed-a.parquet", "part-crashed-b.parquet"):
            p = os.path.join(t.data_dir, "snap-00debris", name)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(b"debris")
        orphans = t.remove_orphan_files(
            older_than_ms=4102444800000)  # 2100: age guard disarmed
        after = t.read(spark).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        return _row(
            spark,
            "final_count long, final_sum double, manifests_before long, "
            "manifests_after long, expired long, orphans long, "
            "read_stable boolean",
            [int(after["c"]), float(after["s"]),
             rw["manifests_before"], rw["manifests_after"],
             ex["expired_snapshots"], len(orphans),
             (int(before["c"]), float(before["s"]))
             == (int(after["c"]), float(after["s"]))],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_semdedup_embeddings(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, gx_spark/ops.py semdedup): semantic
    dedup by k-means clustering + within-cluster cosine pruning, keeping
    per duplicate group the member FARTHEST from its centroid.  Centroids
    are INJECTED as the 8 lowest-vec_id embeddings, which makes the whole
    operator relationally reproducible: the oracle recomputes assignment
    (argmax of 6-dp-rounded cosine, ties to the lowest cell), the
    (c_sim DESC, id ASC) ranking, and the later-ranked-duplicate removal
    rule over the same 500 rows.  Output is per-row (id, cluster, c_sim,
    removed) — any divergence in clustering, ranking, or pruning
    hash-mismatches."""
    import numpy as np

    emb = _load(spark, sf_dir, "embeddings")
    crows = emb.orderBy("vec_id").limit(8).collect()
    C = np.array([[float(x) for x in r["embedding"]] for r in crows])
    return ops.semdedup(emb, "vec_id", "embedding",
                        threshold=0.5, centroids=C)


def q_iceberg_changelog(spark, sf_dir):
    """Changelog / CDC read (gx_spark/iceberg.py changes): orders flow
    through four commits — two appends, a positional DELETE, and an
    equality delete — with a rewrite_data_files compaction in the middle.
    changes() must emit exactly the per-commit insert/delete rows (replace
    snapshots silent), and net mode must collapse rows born and killed
    inside the range.  The oracle recomputes every figure from the same
    modular classes directly over orders; `compaction_silent` is
    engine-verified (ordinals are exactly {0,1,2,3} — four logical
    commits, the replace snapshot contributing none)."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    base = orders.where(F.col("o_orderkey") % 4 <= 2)
    tmp = tempfile.mkdtemp(prefix="gx_ice_cdc_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_cdc", orders.schema)
        t.append(base.where(F.col("o_orderkey") % 4 <= 1).repartition(2))
        t.append(base.where(F.col("o_orderkey") % 4 == 2).repartition(2))
        t.delete(spark, "o_totalprice > 400000")
        t.rewrite_data_files(spark, target_files=1)
        t.equality_delete(
            spark,
            orders.where(F.col("o_custkey") % 50 == 3)
            .select("o_custkey").distinct(),
            ["o_custkey"])
        ch = t.changes(spark)
        agg = (ch.groupBy("_change_type")
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.round(F.sum("o_totalprice"), 2).alias("s"))
               .collect())
        by = {r["_change_type"]: (r["n"], r["s"]) for r in agg}
        ordinals = sorted(r["_change_ordinal"] for r in
                          ch.select("_change_ordinal").distinct().collect())
        net = t.changes(spark, net=True)
        net_by = {r["_change_type"]: r["n"] for r in
                  net.groupBy("_change_type")
                  .agg(F.count(F.lit(1)).cast("long").alias("n")).collect()}
        return _row(
            spark,
            "ins_count long, ins_sum double, del_count long, "
            "del_sum double, net_insert_count long, net_delete_count long, "
            "n_ordinals long, compaction_silent boolean",
            [by["insert"][0], by["insert"][1],
             by["delete"][0], by["delete"][1],
             net_by.get("insert", 0), net_by.get("delete", 0),
             len(ordinals), ordinals == [0, 1, 2, 3]],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_dsir_documents(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, gx_spark/ops.py
    dsir_weights): docs with doc_id%10==7 stand in as the high-quality
    target corpus; every other doc gets log p_target/p_raw of its hashed
    unigram+bigram profile (8192 md5 buckets, Lidstone alpha=1) — the
    importance-resampling data-selection score.  Training collapses each
    corpus to one <=8192-row bucket-count exchange; scoring is a
    zero-shuffle HOF fold over a literal log-ratio array (plan-pinned).
    Oracle recomputes the bucket model relationally with the
    hash_split md5 idiom."""
    docs = _load(spark, sf_dir, "documents")
    target = docs.where(F.col("doc_id") % 10 == 7)
    raw = docs.where(F.col("doc_id") % 10 != 7)
    return ops.dsir_weights(raw, target, "doc_id", "text",
                            buckets=8192, alpha=1.0)


def q_ngram_counts_documents(spark, sf_dir):
    """Corpus-wide top-50 word bigram table (gx_spark/ops.py
    ngram_counts): map-side HOF gram construction, one map-side-combined
    count exchange, TakeOrderedAndProject top-k (plan-pinned — never a
    global sort); ties at the cut break by ngram ascending on both
    engines, so the row set is deterministic."""
    docs = _load(spark, sf_dir, "documents")
    return ops.ngram_counts(docs, "text", n=2, k=50)


def q_pii_documents(spark, sf_dir):
    """PII detection + redaction (gx_spark/ops.py pii_stats/redact_pii;
    pattern classes in the spirit of public scrubbers — Presidio, ROOTS).
    The synthetic corpus carries no PII, so the query PLANTS it
    deterministically from doc_id modular classes (email / phone / ipv4 /
    card) with the identical SQL-expressible concat on both engines, then
    reports per-doc class counts, the total, and the redaction residue
    (count + length after redact_pii) — residual_pii must be 0 on every
    row.  Entirely map-side: regexp_count/regexp_replace folds, zero
    Exchange."""
    docs = _load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 7 == 3, F.concat(
                F.lit(" contact user"), d.cast("string"),
                F.lit("@example.com"))).otherwise(F.lit("")),
            F.when(d % 11 == 5, F.concat(
                F.lit(" call 415-555-"),
                F.lpad((d % 10000).cast("string"), 4, "0"))).otherwise(F.lit("")),
            F.when(d % 13 == 2, F.concat(
                F.lit(" from 10.0."), (d % 200).cast("string"),
                F.lit(".7"))).otherwise(F.lit("")),
            F.when(d % 17 == 11,
                   F.lit(" card 4111 1111 1111 1111")).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = ops.redact_pii(planted, "text", out_col="clean")
    return (
        ops.pii_stats(red, "doc_id", "text", keep_cols=["clean"])
        .withColumn("residual_pii", ops.pii_count_expr(F.col("clean")))
        .withColumn("clean_len", F.length("clean").cast("long"))
        .drop("clean")
    )


def q_audio_features_banded(spark, sf_dir):
    """Per-clip acoustic feature extraction (gx_spark.audio_ops.
    extract_audio_features): one Arrow UDF decodes each payload and emits
    rms_dbfs / silence_ratio / clipping_ratio; the binary column is pruned
    in the same projection, so the banding groupBy shuffles scalars only.

    Clips are built from documents.doc_id with orthogonal deterministic
    classes — gain (doc_id%5, spaced >=1.9 dB), leading silence pad
    (doc_id%4 * 50 ms, exact 25 ms-frame ratios), hot/clipped (doc_id%11==0,
    3x gain into the rail), codec rotation (doc_id%3 over pcm/flac/mulaw) —
    so the oracle recomputes every band count from modular arithmetic.
    The gain class is recovered from rms_dbfs CORRECTED for the silence
    dilution (rms_db - 10*log10(1 - silence_ratio)), which lands within
    ~0.05 dB of the closed-form two-tone power 10*log10(0.225*g^2)."""
    import math

    import numpy as np

    from gx_spark.audio import encode_payload, synth_pcm
    from gx_spark.audio_ops import extract_audio_features

    sr, dur = 16000, 250
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 400")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        g = (i % 5 + 1) / 5
        hot = i % 11 == 0
        s_ms = (i % 4) * 50
        pcm = synth_pcm(f"af_{i}", sr, dur).astype(np.float64)
        pcm = np.clip(pcm * (3.0 if hot else g), -32768, 32767).astype(np.int16)
        pad = np.zeros(sr * s_ms // 1000, dtype=np.int16)
        codec = codecs[i % 3]
        b = encode_payload(np.concatenate([pad, pcm]), sr, codec)
        rows.append((i, bytearray(b), codec))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    feats = extract_audio_features(df, keep_cols=["doc_id"]).persist()

    expected = [10 * math.log10(0.225 * ((c + 1) / 5) ** 2) for c in range(5)]
    mids = [(expected[c] + expected[c + 1]) / 2 for c in range(4)]
    corr = F.col("rms_dbfs") - 10.0 * F.log10(1.0 - F.col("silence_ratio"))
    gain_cls = sum((corr > F.lit(m)).cast("int") for m in mids) + F.lit(1)
    exp_sil = [0.0, 2 / 12, 4 / 14, 6 / 16]
    sil_err = [F.abs(F.col("silence_ratio") - F.lit(v)) for v in exp_sil]
    sil_cls = F.array_position(
        F.array(*sil_err), F.array_min(F.array(*sil_err))
    ).cast("int") - F.lit(1)

    rms = (
        feats.filter(F.col("doc_id") % 11 != 0)
        .groupBy(gain_cls.cast("int").alias("class"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("rms_gain").alias("metric"), "class", "n")
    )
    sil = (
        feats.groupBy(sil_cls.alias("class"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("silence").alias("metric"), "class", "n")
    )
    clipped = (
        feats.filter(F.col("clipping_ratio") > 0.01)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("clipped").alias("metric"),
                F.lit(1).cast("int").alias("class"), "n")
    )
    out = rms.unionAll(sil).unionAll(clipped).orderBy("metric", "class")
    res = out.collect()
    feats.unpersist()
    return spark.createDataFrame(res, "metric string, class int, n long")


def q_audio_quality_violations(spark, sf_dir):
    """Audio quality expectations (expectations/audio_exp.py clipping /
    silence classes riding the ONE shared decode): clips from documents
    doc_id<400, deterministic violation classes — hot (doc_id%5==0, 3x gain
    into the rail) fails clipping<1%, dead-air (doc_id%5==1, 300 ms silence
    + 100 ms tone) fails silence<50%; everything else passes both.  The
    oracle recomputes each violation count from the class arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload, synth_pcm

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 400")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        pcm = synth_pcm(f"aq_{i}", sr, 400)
        if i % 5 == 0:
            pcm = np.clip(pcm.astype(np.int32) * 3, -32768, 32767).astype(
                np.int16)
        elif i % 5 == 1:
            pcm = np.concatenate(
                [np.zeros(sr * 300 // 1000, dtype=np.int16),
                 pcm[: sr // 10]])
        dur = int(round(len(pcm) * 1000.0 / sr))
        codec = codecs[i % 3]
        rows.append((i, f"aq_{i}", bytearray(encode_payload(pcm, sr, codec)),
                     sr, dur, codec, "t"))
    df = spark.createDataFrame(
        rows,
        "doc_id long, clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    r = _evr(
        spark, df,
        ExpectationSuite("aq")
        .add("expect_audio_clipping_ratio_to_be_below", max_ratio=0.01)
        .add("expect_audio_silence_ratio_to_be_below", max_ratio=0.5)
        .add("expect_audio_metadata_to_be_consistent"),
    )
    return _row(
        spark,
        "element_count long, clipping_unexpected long, silence_unexpected "
        "long, meta_unexpected long",
        [r[0].result["element_count"], r[0].result["unexpected_count"],
         r[1].result["unexpected_count"], r[2].result["unexpected_count"]],
    )


def q_audio_trim_bounds(spark, sf_dir):
    """Dead-air analysis (gx_spark.audio_ops.silence_bounds — the trim op's
    measurement pass): clips built from documents doc_id<400 with lead pad
    (doc_id%4)*50 ms and trail pad (doc_id%3)*50 ms around a 400 ms two-tone
    span, all on the 25 ms frame grid so the measured bounds are EXACT.
    The oracle recomputes every total from the pad arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload, synth_pcm
    from gx_spark.audio_ops import silence_bounds

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 400")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        lead, trail = (i % 4) * 50, (i % 3) * 50
        pcm = np.concatenate([
            np.zeros(sr * lead // 1000, dtype=np.int16),
            synth_pcm(f"at_{i}", sr, 400),
            np.zeros(sr * trail // 1000, dtype=np.int16),
        ])
        codec = codecs[i % 3]
        rows.append((i, bytearray(encode_payload(pcm, sr, codec)), codec))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    b = silence_bounds(df, keep_cols=["doc_id"])
    return b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lead_ms").alias("total_lead_ms"),
        F.sum("trail_ms").alias("total_trail_ms"),
        F.sum("active_ms").alias("total_active_ms"),
    )


def q_audio_segment_stats(spark, sf_dir):
    """VAD utterance segmentation (gx_spark.audio_ops.segment_stats — the
    measurement pass of segment_audio): clips built from documents
    doc_id<300 as lead silence (doc_id%3)*100 ms, a 200 ms tone, a gap of
    (doc_id%4)*100 ms, a second 200 ms tone, and 100 ms trail, all on the
    25 ms frame grid.  With min_gap_ms=150: gap 0/100 ms clips merge into
    ONE segment (span absorbs the sub-threshold gap), gap 200/300 ms clips
    split into TWO with longest_gap = the gap.  The oracle recomputes all
    three columns from the modular arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload, synth_pcm
    from gx_spark.audio_ops import segment_stats

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        lead, gap = (i % 3) * 100, (i % 4) * 100
        pcm = np.concatenate([
            np.zeros(sr * lead // 1000, dtype=np.int16),
            synth_pcm(f"sg_{i}", sr, 200),
            np.zeros(sr * gap // 1000, dtype=np.int16),
            synth_pcm(f"sh_{i}", sr, 200),
            np.zeros(sr * 100 // 1000, dtype=np.int16),
        ])
        codec = codecs[i % 3]
        rows.append((i, bytearray(encode_payload(pcm, sr, codec)), codec))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    return segment_stats(df, keep_cols=["doc_id"], min_gap_ms=150)


def q_audio_gain_normalize(spark, sf_dir):
    """Loudness normalization (gx_spark.audio_ops.normalize_gain): clips
    built from documents doc_id<300 as 300 ms sines with amplitude
    0.05 + (doc_id%5)*0.1 across three codecs, normalized to -20 dBFS
    RMS, then re-measured by the features pass.  rms_ok pins the
    post-normalize RMS within +/-0.5 dB of target (mu-law rows carry
    ~0.2 dB companding noise); gain_sign pins the direction — only the
    amp 0.05 class (RMS -29 dBFS) gains UP, the four louder classes gain
    DOWN (the -20 dBFS boundary sits at amp 0.1414).  The oracle
    recomputes both from the amplitude arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, normalize_gain

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    base = np.sin(2 * np.pi * 440.0 * t)
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        amp = 0.05 + (i % 5) * 0.1
        pcm = np.rint(amp * 32767 * base).astype(np.int16)
        codec = codecs[i % 3]
        rows.append((i, bytearray(encode_payload(pcm, sr, codec)), codec))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    norm = normalize_gain(df, target_dbfs=-20.0)
    feats = extract_audio_features(norm, keep_cols=["doc_id", "gain_db"])
    return feats.select(
        "doc_id",
        (F.abs(F.col("rms_dbfs") + 20.0) <= 0.5).alias("rms_ok"),
        F.signum("gain_db").cast("int").alias("gain_sign"),
    )


def q_audio_declip_repair(spark, sf_dir):
    """Clipping repair (gx_spark.audio_ops.declip_audio — cubic-Hermite
    interpolation over rail runs, Janssen-class declipper): clips built
    from documents doc_id<300 as 300 ms 440 Hz sines with nominal
    amplitude [0.3, 1.4, 2.0][doc_id%3] hard-clipped to int16, across
    two lossless codecs.  The repaired output is re-measured by the
    features pass.  Pins: was_clipped from the rail count; n_clipped_ok
    pins the EXACT per-class rail-sample count (precomputed from the
    same waveform arithmetic at build time — 0 / 2376 / 3192); rail_free
    pins post-repair clipping_ratio == 0 (out_peak=0.97 leaves headroom
    under clip_rail=32000); passthrough_ok pins that clean clips keep
    their ORIGINAL bytes (md5-identical, gain 0) while repaired clips
    re-encode pcm_s16le with gain < 0 (reconstruction overshoots full
    scale).  The oracle restates all four from doc_id arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import declip_audio, extract_audio_features

    sr = 16000
    amps = [0.3, 1.4, 2.0]
    codecs = ["pcm_s16le", "flac"]
    t = np.arange(sr * 300 // 1000) / sr
    base = np.sin(2 * np.pi * 440.0 * t)
    rail = int(round(32767 * 0.999))
    pcm_by_class = [
        np.clip(np.rint(a * 32767 * base), -32768, 32767).astype(np.int16)
        for a in amps
    ]
    expected_clipped = [
        int(np.count_nonzero((p >= rail) | (p <= -rail)))
        for p in pcm_by_class
    ]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        codec = codecs[i % 2]
        rows.append((i, bytearray(
            encode_payload(pcm_by_class[i % 3], sr, codec)), codec))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string"
    ).withColumn("in_md5", F.md5("bytes"))
    repaired = declip_audio(df).withColumn(
        "md5_same", F.md5("bytes") == F.col("in_md5"))
    exp_expr = (
        F.when(F.col("doc_id") % 3 == 1, F.lit(expected_clipped[1]))
        .when(F.col("doc_id") % 3 == 2, F.lit(expected_clipped[2]))
        .otherwise(F.lit(0))
    )
    feats = extract_audio_features(
        repaired,
        keep_cols=["doc_id", "codec", "n_clipped", "declip_gain_db",
                   "md5_same"])
    return feats.select(
        "doc_id",
        (F.col("n_clipped") > 0).alias("was_clipped"),
        (F.col("n_clipped") == exp_expr).alias("n_clipped_ok"),
        (F.col("clipping_ratio") == 0.0).alias("rail_free"),
        F.when(F.col("doc_id") % 3 == 0,
               F.col("md5_same") & (F.col("declip_gain_db") == 0.0))
         .otherwise((F.col("codec") == "pcm_s16le")
                    & (F.col("declip_gain_db") < 0.0))
         .alias("passthrough_ok"),
    )


def q_audio_channel_stats(spark, sf_dir):
    """Channel-layout audit + mono normalization (gx_spark.audio_ops.
    channel_stats / downmix_audio, over the new multi-channel WAV
    support in gx_spark.audio): clips from documents doc_id<300 —
    class doc_id%3: 0 = mono 0.3 sine, 1 = stereo with identical
    channels, 2 = stereo with L amp 0.4 / R amp 0.1; containers
    alternate PCM16 / IEEE-float32 (tag 3) by doc_id%2, so the float
    path is exercised in-window.  Pins: n_channels from the header
    probe; balance_band = round(max-min channel RMS dB) — null (mono)
    → -1, identical channels → 0, the 0.4/0.1 pair → 20*log10(4) ≈
    12.04 → 12; downmix_ok pins that mono rows keep their ORIGINAL
    bytes (md5) while stereo rows re-encode mono pcm_s16le with
    n_channels_in=2; samples_ok pins the downmixed decode still carries
    all 4800 frames.  The oracle restates everything from doc_id
    arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload, wav_encode_multi
    from gx_spark.audio_ops import (channel_stats, downmix_audio,
                                    extract_audio_features)

    sr = 16000
    t = np.arange(sr * 300 // 1000) / sr
    base = np.sin(2 * np.pi * 440.0 * t)
    L = np.rint(0.4 * 32767 * base).astype(np.int16)
    R = np.rint(0.1 * 32767 * base).astype(np.int16)
    M = np.rint(0.3 * 32767 * base).astype(np.int16)
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        codec = ["pcm_s16le", "pcm_f32le"][i % 2]
        tag = 1 if codec == "pcm_s16le" else 3
        c = i % 3
        if c == 0:
            payload = encode_payload(M, sr, codec)
        elif c == 1:
            payload = wav_encode_multi(np.stack([L, L], axis=1), sr, tag)
        else:
            payload = wav_encode_multi(np.stack([L, R], axis=1), sr, tag)
        rows.append((i, bytearray(payload), codec))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string"
    ).withColumn("in_md5", F.md5("bytes"))
    stats = channel_stats(df, keep_cols=["doc_id"]).select(
        "doc_id", "n_channels",
        F.coalesce(F.round("balance_db", 0).cast("int"), F.lit(-1))
         .alias("balance_band"),
    )
    mixed = downmix_audio(df).withColumn(
        "md5_same", F.md5("bytes") == F.col("in_md5"))
    feats = extract_audio_features(
        mixed, keep_cols=["doc_id", "codec", "n_channels_in", "md5_same"])
    down = feats.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.col("md5_same") & (F.col("n_channels_in") == 1))
         .otherwise((F.col("codec") == "pcm_s16le")
                    & (F.col("n_channels_in") == 2))
         .alias("downmix_ok"),
        (F.col("n_samples") == 4800).alias("samples_ok"),
    )
    return stats.join(down, "doc_id").select(
        "doc_id", "n_channels", "balance_band", "downmix_ok", "samples_ok")


def q_audio_f32_transcode(spark, sf_dir):
    """IEEE-float32 WAV (format tag 3, the second tag real float
    pipelines exchange) as a transcode target: clips from documents
    doc_id<300 across three source codecs are rewritten pcm_f32le by
    gx_spark.audio_ops.transcode_audio, then BOTH sides run the features
    pass.  float32 carries every int16 sample exactly (15-bit magnitudes
    in a 24-bit mantissa, /32768 both ways), so lossless_ok pins equal
    sample count + bit-identical RMS — same invariant shape as the FLAC
    round trip, now for the float container."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, transcode_audio

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    base = np.sin(2 * np.pi * 659.25 * t)
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        amp = 0.1 + (i % 4) * 0.1
        pcm = np.rint(amp * 32767 * base).astype(np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, codecs[i % 3])),
                     codecs[i % 3]))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    before = extract_audio_features(df, keep_cols=["doc_id"]).select(
        "doc_id", F.col("n_samples").alias("n0"), F.col("rms_dbfs").alias("r0"))
    after = extract_audio_features(
        transcode_audio(df, "pcm_f32le"), keep_cols=["doc_id", "codec"]
    ).select(
        "doc_id", "codec", F.col("n_samples").alias("n1"),
        F.col("rms_dbfs").alias("r1"))
    return before.join(after, "doc_id").select(
        "doc_id",
        ((F.col("n0") == F.col("n1")) & (F.col("r0") == F.col("r1"))).alias(
            "lossless_ok"),
        F.col("codec").alias("codec_out"),
    )


def q_audio_electrical_violations(spark, sf_dir):
    """Electrical-defect gates (expectations/audio_exp.py
    expect_audio_dc_offset_to_be_below /
    expect_audio_hum_ratio_to_be_below riding ONE shared DC+hum decode,
    gx_spark.audio_ops.compute_electrical_row): clips from documents
    doc_id<400 as 300 ms 440 Hz tones (amp 0.3) with deterministic
    defect classes — doc_id%4==1 adds 50 Hz mains hum at amp 0.15,
    class 2 adds 60 Hz hum, class 3 adds a +10%-of-full-scale DC offset,
    class 0 is clean.  300 ms at 16 kHz is an integer number of cycles
    for 50/60/440 Hz, so the single-bin DFT probes are leakage-free:
    hum_ratio = 0.15²/(0.15²+0.3²) = 0.2 exactly, banded to 1 decimal;
    dc_frac = 0.1 banded to 2.  The violating ROW SET comes from the
    engine's violations_table(); codecs alternate pcm_s16le/flac (both
    lossless, so the arithmetic survives the container)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import electrical_features

    sr = 16000
    n = sr * 300 // 1000
    t = np.arange(n) / sr
    tone = 0.3 * np.sin(2 * np.pi * 440.0 * t)
    hum50 = 0.15 * np.sin(2 * np.pi * 50.0 * t)
    hum60 = 0.15 * np.sin(2 * np.pi * 60.0 * t)
    wave = {0: tone, 1: tone + hum50, 2: tone + hum60, 3: tone + 0.1}
    codecs = ["pcm_s16le", "flac"]
    payload = {}
    for c in range(4):
        pcm = np.clip(np.rint(wave[c] * 32767), -32768, 32767).astype(
            np.int16)
        for k in range(2):
            payload[(c, k)] = bytearray(encode_payload(pcm, sr, codecs[k]))
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 400")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        rows.append((i, str(i), payload[(i % 4, i % 2)], codecs[i % 2]))
    df = spark.createDataFrame(
        rows, "doc_id long, clip_id string, bytes binary, codec string")
    b = validate(
        spark, df,
        ExpectationSuite("elec")
        .add("expect_audio_dc_offset_to_be_below", max_frac=0.02)
        .add("expect_audio_hum_ratio_to_be_below", max_ratio=0.01),
        EngineOptions(unexpected_index_column_names=("clip_id",)),
    )
    viol = b.violations_table().select(
        F.col("clip_id").cast("long").alias("doc_id"), "expectation_type")
    bands = electrical_features(df, keep_cols=["doc_id"]).select(
        "doc_id",
        F.round("hum_ratio", 1).alias("hum_band"),
        F.round("dc_frac", 2).alias("dc_band"),
    )
    return viol.join(bands, "doc_id").select(
        "doc_id", "expectation_type",
        F.when(F.col("expectation_type")
               == "expect_audio_hum_ratio_to_be_below", F.col("hum_band"))
         .otherwise(F.col("dc_band")).alias("band"),
    )


def q_audio_hum_repair(spark, sf_dir):
    """Detection-gated mains-hum removal (gx_spark.audio_ops.remove_hum
    — FFT-bin notch at the winning grid's harmonics, only when the
    measured hum ratio reaches the gate): clips from documents
    doc_id<300 as 300 ms 440 Hz tones, class doc_id%3 planting nothing /
    50 Hz / 60 Hz hum at amp 0.15 (ratio exactly 0.2 at integer
    cycles).  Pins: was_hummy from the op's own measured ratio;
    ratio_band = round(ratio, 1) — 0.0 clean / 0.2 hummy; repaired_ok —
    clean rows keep ORIGINAL bytes (md5), hummy rows re-encode
    pcm_s16le and re-measure hum-free (< 1e-4); rms_band pins that the
    notch removed ONLY the hum — every row's post-repair RMS is the
    bare tone's -13.5 dBFS.  The oracle restates all four from doc_id
    arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import (electrical_features,
                                    extract_audio_features, remove_hum)

    sr = 16000
    n = sr * 300 // 1000
    t = np.arange(n) / sr
    tone = 0.3 * np.sin(2 * np.pi * 440.0 * t)
    wave = {0: tone,
            1: tone + 0.15 * np.sin(2 * np.pi * 50.0 * t),
            2: tone + 0.15 * np.sin(2 * np.pi * 60.0 * t)}
    codecs = ["pcm_s16le", "flac"]
    payload = {}
    for c in range(3):
        pcm = np.clip(np.rint(wave[c] * 32767), -32768, 32767).astype(
            np.int16)
        for k in range(2):
            payload[(c, k)] = bytearray(encode_payload(pcm, sr, codecs[k]))
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        rows.append((i, payload[(i % 3, i % 2)], codecs[i % 2]))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string"
    ).withColumn("in_md5", F.md5("bytes"))
    fixed = remove_hum(df).withColumn(
        "md5_same", F.md5("bytes") == F.col("in_md5"))
    post_hum = electrical_features(
        fixed, keep_cols=["doc_id", "codec", "md5_same",
                          "hum_removed_ratio"]).select(
        "doc_id", "codec", "md5_same", "hum_removed_ratio",
        F.col("hum_ratio").alias("post_ratio"))
    post_rms = extract_audio_features(fixed, keep_cols=["doc_id"]).select(
        "doc_id", F.round("rms_dbfs", 1).alias("rms_band"))
    return post_hum.join(post_rms, "doc_id").select(
        "doc_id",
        (F.col("hum_removed_ratio") >= 0.01).alias("was_hummy"),
        F.round("hum_removed_ratio", 1).alias("ratio_band"),
        F.when(F.col("doc_id") % 3 == 0, F.col("md5_same"))
         .otherwise((F.col("codec") == "pcm_s16le")
                    & (F.col("post_ratio") < 1e-4))
         .alias("repaired_ok"),
        "rms_band",
    )


def q_audio_reverb_echo(spark, sf_dir):
    """Reverberation augmentation (gx_spark.audio_ops.augment_reverb —
    synthetic-RIR convolution, the third standard ASR robustness step):
    clips from documents doc_id<300 as 300 ms 400 Hz tones (period 40
    samples).  Odd doc_ids get the closed-form "echo" RIR (direct path +
    0.5 gain at 50 ms = 800 samples = 20 whole periods, so y = x for the
    first 800 samples and exactly 1.5·x after — power ratio
    (800 + 2.25·4000)/4800 → +3.1 dB, banded); even doc_ids run the
    identity (gain 0) and must keep their ORIGINAL bytes.  Pins:
    passthrough/re-encode facts incl. the applied wet level
    (20·log10(0.5) → -6.0 banded), the exact Δ RMS band, and duration
    preservation (full convolution trimmed to n)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import augment_reverb, extract_audio_features

    sr = 16000
    n = sr * 300 // 1000
    t = np.arange(n) / sr
    pcm = np.clip(np.rint(0.3 * 32767 * np.sin(2 * np.pi * 400.0 * t)),
                  -32768, 32767).astype(np.int16)
    codecs = ["pcm_s16le", "flac"]
    payload = {k: bytearray(encode_payload(pcm, sr, codecs[k]))
               for k in range(2)}
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        rows.append((i, str(i), payload[(i // 2) % 2], codecs[(i // 2) % 2]))
    df = spark.createDataFrame(
        rows, "doc_id long, clip_id string, bytes binary, codec string"
    ).withColumn("in_md5", F.md5("bytes"))
    even = augment_reverb(df.filter("doc_id % 2 = 0"), kind="echo",
                          gain=0.0)
    odd = augment_reverb(df.filter("doc_id % 2 = 1"), kind="echo",
                         gain=0.5, delay_ms=50.0)
    out = even.unionByName(odd).withColumn(
        "md5_same", F.md5("bytes") == F.col("in_md5"))
    rms_in = extract_audio_features(df, keep_cols=["doc_id"]).select(
        "doc_id", F.col("rms_dbfs").alias("r0"))
    feats = extract_audio_features(
        out, keep_cols=["doc_id", "codec", "md5_same", "reverb_wet_db"])
    return feats.join(rms_in, "doc_id").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0,
               F.col("md5_same") & F.col("reverb_wet_db").isNull())
         .otherwise((F.col("codec") == "pcm_s16le")
                    & (F.round("reverb_wet_db", 1) == -6.0))
         .alias("passthrough_ok"),
        F.round(F.col("rms_dbfs") - F.col("r0"), 1).alias("drms_band"),
        (F.col("n_samples") == 4800).alias("n_ok"),
    )


def q_audio_pack_training_windows(spark, sf_dir):
    """Sequence packing (gx_spark.audio_ops.pack_clips — the audio twin
    of LM sequence packing: short utterances waste padded compute, so
    the corpus is concatenated into fixed-budget windows before
    training).  Assignment is the token_shards distributed prefix sum
    over the LABELED durations (metadata speed, no decode); assembly
    moves each payload across the wire exactly once.  Clips from
    documents doc_id<240 (300 ms tones, pcm16/flac alternating, all
    16 kHz) packed to 1200 ms windows with 100 ms silence separators:
    every bin gets exactly 4 consecutive doc_ids, 4·4800 + 3·1600 =
    24000 samples = 1500 ms.  samples_ok re-measures the packed payload
    through the features decode.  The oracle restates the packing from
    doc_id arithmetic (bin = doc_id div 4) including the id order."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, pack_clips

    sr = 16000
    t = np.arange(sr * 300 // 1000) / sr
    codecs = ["pcm_s16le", "flac"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 240")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        f = 200.0 + 10.0 * (i % 20)
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, codecs[i % 2])),
                     codecs[i % 2], 300))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string, dur_ms int")
    packed = pack_clips(df, 1200, id_col="doc_id", gap_ms=100)
    feats = extract_audio_features(
        packed,
        keep_cols=["bin", "n_clips", "n_bad", "sr_hz", "total_samples",
                   "dur_ms", "clip_ids"])
    return feats.select(
        "bin", "n_clips", "n_bad", "sr_hz", "total_samples", "dur_ms",
        "clip_ids",
        (F.col("n_samples") == 24000).alias("samples_ok"),
    )


def q_audio_tempo_stretch(spark, sf_dir):
    """Pitch-preserving tempo augmentation (gx_spark.audio_ops.
    tempo_stretch — WSOLA, Verhelst & Roelands 1993: the tempo half of
    the Ko et al. recipe WITHOUT the pitch shift speed_perturb carries).
    300 ms pure tones at 250+5·(doc_id%40) Hz, stretched 1.25x faster:
    output is EXACTLY 3840 samples / 240 ms, the dominant frequency is
    unchanged (a resample-based 1.25x would read 1.25·f), and COLA
    windowing preserves RMS (0.3 FS sine = −13.47 dBFS) within 0.5 dB.
    All three re-measured from the stretched payload through the
    features decode; the oracle restates them per doc_id."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, tempo_stretch

    sr = 16000
    t = np.arange(sr * 300 // 1000) / sr
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 200")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        f = 250.0 + 5.0 * (i % 40)
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, "flac")),
                     "flac", 300))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string, dur_ms int")
    out = tempo_stretch(df, 1.25)
    feats = extract_audio_features(out, keep_cols=["doc_id", "dur_ms"])
    f_expr = F.lit(250.0) + F.lit(5.0) * (F.col("doc_id") % 40)
    return feats.select(
        "doc_id",
        F.col("n_samples").alias("n_samples"),
        F.col("dur_ms").cast("int").alias("dur_ms"),
        (F.abs(F.col("dominant_hz") - f_expr) < 10.0).alias("pitch_ok"),
        (F.abs(F.col("rms_dbfs") + 13.47) < 0.5).alias("rms_ok"),
    )


def q_audio_pack_stratified(spark, sf_dir):
    """Stratified sequence packing with transcript carry-through
    (gx_spark.audio_ops.pack_clips stratify_col/transcript_col): clips
    alternate 16 kHz / 8 kHz, so unstratified packing would fail every
    bin mixed-rate; stratifying on the rate packs each stratum in its
    own id order (bins renumbered per stratum) and joins the members'
    transcripts in the same order as the audio.  The oracle restates
    the per-stratum membership from doc_id arithmetic: stratum by
    parity, position = doc_id div 2, bin = position div 4, transcripts
    and ids string_agg'd in doc_id order."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import pack_clips

    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 240")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        sr = 16000 if i % 2 == 0 else 8000
        t = np.arange(sr * 300 // 1000) / sr
        f = 200.0 + 10.0 * (i % 20)
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, "pcm_s16le")),
                     "pcm_s16le", 300, sr, f"w{i}"))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string, dur_ms int, "
              "sr_hz int, transcript string")
    packed = pack_clips(
        df, 1200, id_col="doc_id", stratify_col="sr_hz",
        transcript_col="transcript")
    return packed.select(
        "stratum", "bin", "n_clips", "n_bad", "sr_hz", "total_samples",
        "clip_ids", "transcript")


def q_audio_specaugment(spark, sf_dir):
    """SpecAugment (gx_spark.audio_ops.specaugment — Park et al. 2019
    time/frequency masking on the 25/10 log-mel front end, done at
    corpus-prep time).  1 s 16 kHz tones give exactly 98 frames x 26
    bands; the mask bookkeeping (masked_frames / masked_bands /
    masked_cell_frac) is recounted from the EMITTED matrix with
    JVM-side higher-order functions (a masked row/col is exactly
    -80 dB everywhere; natural cells clamp at -100), the stripe-width
    caps bound the counts, and the oracle restates the exact frame
    arithmetic plus the all-true invariants."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import specaugment

    sr = 16000
    t = np.arange(sr) / sr
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 200")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        f = 200.0 + 7.0 * (i % 40)
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, "pcm_s16le")),
                     "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string")
    out = specaugment(df, id_col="doc_id", keep_cols=["doc_id"])
    mf = F.expr("size(filter(logmel, r -> forall(r, c -> c = -80.0D)))")
    mb = F.expr("size(filter(sequence(0, n_mels - 1), j -> "
                "forall(logmel, r -> r[j] = -80.0D)))")
    exact = ((mf * F.col("n_mels") + mb * F.col("n_frames") - mf * mb)
             / (F.col("n_frames") * F.col("n_mels")))
    return out.select(
        "doc_id", "n_frames", "n_mels",
        (mf == F.col("masked_frames")).alias("frames_ok"),
        (mb == F.col("masked_bands")).alias("bands_ok"),
        (F.abs(exact - F.col("masked_cell_frac")) < 1e-12).alias(
            "frac_ok"),
        ((F.col("masked_frames") <= 20)
         & (F.col("masked_bands") <= 8)).alias("caps_ok"),
    )


def q_audio_cmvn(spark, sf_dir):
    """Corpus CMVN (gx_spark.audio_ops.cmvn_stats/apply_cmvn — the
    classic ASR front-end normalization, computed as map-side per-clip
    partials merged by ONE 26-row aggregate: the north rule's
    treeAggregate shape in DataFrame form).  200 half-second tones at
    varied freqs/amps -> exactly 48 frames each, 9600 total; after
    applying the stats, the per-band corpus mean is 0 and the std is 1
    (bands with zero raw variance normalize to 0 by the eps guard and
    are excused via a driver-side literal).  Both re-measured in-Spark
    from the normalized matrices; the oracle restates the frame
    arithmetic and pins the invariants all-true per band."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import apply_cmvn, cmvn_stats, specaugment

    sr = 16000
    t = np.arange(sr // 2) / sr
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 200")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        f = 150.0 + 9.0 * (i % 50)
        a = 0.1 + 0.02 * (i % 8)
        pcm = np.rint(a * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, "pcm_s16le")),
                     "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string")
    n, means, stds = cmvn_stats(df)
    feats = specaugment(df, id_col="doc_id", keep_cols=["doc_id"],
                        time_masks=0, freq_masks=0)
    zero_var = [b for b, s in enumerate(stds) if s < 1e-9]
    normed = apply_cmvn(feats, means, stds)
    cells = (
        normed.select(F.explode("logmel").alias("frame"))
        .select(F.posexplode("frame").alias("band", "v"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_frames"),
             F.avg("v").alias("m"), F.var_pop("v").alias("vv"))
    )
    return cells.select(
        "band", "n_frames",
        (F.abs(F.col("m")) < 1e-8).alias("mean_ok"),
        ((F.abs(F.sqrt("vv") - 1.0) < 1e-6)
         | F.col("band").isin([*zero_var] or [-1])).alias("std_ok"),
    )


def q_audio_declick(spark, sf_dir):
    """Click/pop repair (gx_spark.audio_ops.declick_audio — isolated
    impulses replaced by the robust 5-point running median; the
    restoration companion to the declip / hum / DC repairs).  Each tone
    gets doc_id%5 synthetic opposite-sign near-rail clicks at spaced
    deterministic positions; the op must find EXACTLY that many, clean
    clips (doc_id%5==0) must keep their ORIGINAL bytes/codec, repaired
    payloads keep their length, and the repaired waveform returns to
    the clean tone within 10% FS (re-measured through a second decode).
    The oracle restates the counts from doc_id arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import declick_audio, extract_audio_features

    sr = 16000
    t = np.arange(sr) / sr
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 200")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        f = 220.0 + 6.0 * (i % 30)
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        for k in range(i % 5):
            p = 1000 + 600 * k + 7 * (i % 37)
            pcm[p] = 32000 if pcm[p] < 0 else -32000
        rows.append((i, bytearray(encode_payload(pcm, sr, "pcm_s16le")),
                     "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string")
    fixed = declick_audio(df)
    feats = extract_audio_features(
        fixed, keep_cols=["doc_id", "n_clicks"])
    return feats.select(
        "doc_id", "n_clicks",
        (F.col("n_samples") == sr).alias("len_ok"),
        # unrepaired clicks would leave peak ~0.976; the clean tone is
        # 0.3 and the median repair stays within a few % of it
        (F.col("peak") < 0.35).alias("impulses_gone"),
    )


def q_audio_denoise(spark, sf_dir):
    """Spectral-subtraction noise reduction (gx_spark.audio_ops.
    denoise_audio — Boll 1979: noise profile from the quietest-decile
    frames, per-bin oversubtracted Wiener gain, exact COLA resynthesis).
    Gated tones (250 ms bursts) under per-doc deterministic white noise
    at -30.5 dBFS: the gaps sit ABOVE the -40 dBFS silence gate before
    denoising and BELOW it after, so the features' silence_ratio flips
    from ~0 to the gap fraction — re-measured from both payloads through
    the same decode.  Length is preserved exactly.  The oracle restates
    the invariants per doc_id."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import denoise_audio, extract_audio_features

    sr = 16000
    t = np.arange(sr) / sr
    gate = ((t * 1000) // 250) % 2 == 0
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 160")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        f = 220.0 + 8.0 * (i % 25)
        rng = np.random.default_rng(1000 + i)
        pcm = np.clip(np.rint(
            0.3 * 32767 * np.sin(2 * np.pi * f * t) * gate
            + rng.normal(0, 0.03 * 32767, sr)),
            -32768, 32767).astype(np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, "pcm_s16le")),
                     "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string")
    before = extract_audio_features(df, keep_cols=["doc_id"]).select(
        "doc_id", F.col("silence_ratio").alias("sil_before"))
    after = extract_audio_features(
        denoise_audio(df), keep_cols=["doc_id"]).select(
        "doc_id", "n_samples",
        F.col("silence_ratio").alias("sil_after"))
    j = after.join(F.broadcast(before), "doc_id")
    return j.select(
        "doc_id",
        (F.col("n_samples") == sr).alias("len_ok"),
        (F.col("sil_before") < 0.05).alias("gaps_loud_before"),
        ((F.col("sil_after") > 0.25)
         & (F.col("sil_after") < 0.60)).alias("gaps_silent_after"),
    )


def q_audio_pack_resample(spark, sf_dir):
    """Resample-at-pack (gx_spark.audio_ops.pack_clips resample_to —
    the realistic mixed-rate-corpus policy: every member is sinc-
    resampled to the window rate at assembly instead of failing the
    bin closed).  Clips alternate 16 kHz / 8 kHz in one UNstratified
    stream; with resample_to=16000 each 300 ms member contributes
    exactly 4800 samples regardless of source rate (the resample_sinc
    round(n*L/M) contract), so every bin of 4 is exactly 19200 samples
    = 1200 ms.  The oracle restates the packing and the resampled
    sample arithmetic from doc_id alone."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import pack_clips

    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 240")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        sr = 16000 if i % 2 == 0 else 8000
        t = np.arange(sr * 300 // 1000) / sr
        f = 200.0 + 10.0 * (i % 20)
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, "pcm_s16le")),
                     "pcm_s16le", 300))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string, dur_ms int")
    packed = pack_clips(df, 1200, id_col="doc_id", resample_to=16000)
    return packed.select(
        "bin", "n_clips", "n_bad", "sr_hz", "total_samples", "dur_ms",
        "clip_ids")


def q_audio_repair_pipeline(spark, sf_dir):
    """Fused waveform restoration (gx_spark.audio_ops.repair_pipeline —
    DC -> declip -> declick -> hum notch in ONE decode/encode, the
    repair twin of augment_pipeline, bit-identical to chaining the
    standalone ops by test).  Each doc carries exactly one defect class
    from doc_id%4 (clean / +10% DC / 4x rail-clipped / 3 impulses); the
    per-stage stats must attribute every defect to ITS stage and
    nothing else, and untouched clips must keep their ORIGINAL flac
    bytes (codec column proves passthrough).  The oracle restates the
    class arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import repair_pipeline

    sr = 16000
    t = np.arange(sr) / sr
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 200")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        f = 220.0 + 6.0 * (i % 30)
        tone = 0.3 * np.sin(2 * np.pi * f * t)
        cls = i % 4
        if cls == 1:
            x = tone + 0.1
        elif cls == 2:
            x = 4.0 * tone
        else:
            x = tone
        pcm = np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)
        if cls == 3:
            for k in range(3):
                p = 1000 + 700 * k + 7 * (i % 37)
                pcm[p] = 32000 if pcm[p] < 0 else -32000
        rows.append((i, bytearray(encode_payload(pcm, sr, "flac")),
                     "flac"))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string")
    out = repair_pipeline(df)
    return out.select(
        "doc_id",
        (F.col("dc_removed") != 0).alias("dc_fixed"),
        (F.col("n_clipped") > 0).alias("clip_fixed"),
        F.col("n_clicks").alias("n_clicks"),
        "codec",
    )


def q_audio_qa_fused(spark, sf_dir):
    """Fused QA pass (gx_spark.audio_ops.qa_features — BS.1770 loudness
    + ACF pitch + DC/hum probes from ONE decode; values pinned
    identical to the standalone ops by test).  One defect class per doc
    from doc_id%3 (clean / +5% DC / 50 Hz hum at 1/9 of tone power);
    the fused pass must attribute each to its probe family, track the
    tone pitch within 5 Hz, land the 0.3-FS tone in a wide LUFS band,
    and report the exact 7-block / 49-frame grid arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import qa_features

    sr = 16000
    t = np.arange(sr) / sr
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 180")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        f = 300.0 + 7.0 * (i % 20)
        x = 0.3 * np.sin(2 * np.pi * f * t)
        cls = i % 3
        if cls == 1:
            x = x + 0.05
        elif cls == 2:
            x = x + 0.1 * np.sin(2 * np.pi * 50.0 * t)
        pcm = np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, "pcm_s16le")),
                     "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, codec string")
    out = qa_features(df, keep_cols=["doc_id"])
    f_expr = F.lit(300.0) + F.lit(7.0) * (F.col("doc_id") % 20)
    return out.select(
        "doc_id", "n_blocks", "n_frames",
        (F.abs(F.col("dc_frac")) > 0.02).alias("dc_hit"),
        (F.col("hum_ratio") > 0.01).alias("hum_hit"),
        ((F.col("voiced_frac") > 0.9)
         & (F.abs(F.col("f0_median_hz") - f_expr) < 5.0)).alias(
            "pitch_ok"),
        ((F.col("lufs_integrated") > -20.0)
         & (F.col("lufs_integrated") < -5.0)).alias("lufs_ok"),
    )


def q_speaking_rate_violations(spark, sf_dir):
    """Transcript/duration alignment screen (gx_spark.expectations.
    audio_exp.SpeakingRateBetween — the standard ASR-curation chars-per-
    second check, pure JVM arithmetic, no payload decode).  Label-only
    clips from documents: transcript = text, dur_ms planted by doc_id%9 —
    class 4 = too fast (exactly 100 cps), class 7 = too slow (exactly
    0.5 cps), class 2 = zero duration (rate undefined), others ~14.9 cps
    (1000/67, length-independent).  The violating ROW SET comes from the
    engine's violations_table(); cps_milli is the identical IEEE double
    expression floor(len / (dur/1000) * 1000) on both engines (integer
    output, no cross-engine float-rounding hazard)."""
    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    ln = F.length("text")
    c = F.col("doc_id") % 9
    dur = (
        F.when(c == 4, ln * 10)
        .when(c == 7, ln * 2000)
        .when(c == 2, F.lit(0))
        .otherwise(ln * 67)
    ).cast("int")
    clips = docs.select(
        F.col("doc_id"),
        F.col("doc_id").cast("string").alias("clip_id"),
        F.col("text").alias("transcript"),
        dur.alias("dur_ms"),
    )
    b = validate(
        spark, clips,
        ExpectationSuite("rate").add(
            "expect_speaking_rate_to_be_between", min_cps=1.0, max_cps=50.0),
        EngineOptions(unexpected_index_column_names=("clip_id",)),
    )
    viol = b.violations_table().select(
        F.col("clip_id").cast("long").alias("doc_id"), "expectation_type")
    d = F.col("dur_ms").cast("double") / F.lit(1000.0)
    arith = clips.select(
        "doc_id",
        F.when(
            F.col("dur_ms") > 0,
            F.floor(F.length("transcript").cast("double") / d * F.lit(1000.0))
            .cast("long"),
        ).alias("cps_milli"),
    )
    return viol.join(arith, "doc_id").select(
        "doc_id", "expectation_type", "cps_milli")


def q_audio_speed_perturb(spark, sf_dir):
    """Tempo perturbation (gx_spark.audio_ops.speed_perturb — Kaldi-style
    sp 0.9/1.1 resample-and-relabel): 300 ms 400 Hz tones, factor 0.9 for
    even doc_id and 1.1 for odd, re-measured by the features pass.  Exact
    arithmetic pins: n_samples = round(4800/factor) (5333 even / 4364
    odd), dur_ms recomputed from the new length (333 / 273), codec
    becomes pcm_s16le; pitch_ok pins that the dominant frequency moved
    WITH the factor (|dom - 400*factor| < 4 Hz, two zero-padded-FFT grid
    steps)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, speed_perturb

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    base = np.rint(0.35 * 32767 * np.sin(2 * np.pi * 400.0 * t)).astype(
        np.int16)
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        rows.append((i, bytearray(encode_payload(base, sr, codecs[i % 3])),
                     sr, 300, codecs[i % 3]))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, sr_hz int, dur_ms int, codec string")
    even = df.filter("doc_id % 2 = 0")
    odd = df.filter("doc_id % 2 = 1")
    out = speed_perturb(even, 0.9).unionByName(speed_perturb(odd, 1.1))
    factor = F.when(F.col("doc_id") % 2 == 0, 0.9).otherwise(1.1)
    feats = extract_audio_features(
        out, keep_cols=["doc_id", "dur_ms", "codec"])
    return feats.select(
        "doc_id",
        F.col("n_samples").cast("int").alias("n_samples"),
        "dur_ms",
        F.col("codec").alias("codec_out"),
        (F.abs(F.col("dominant_hz") - 400.0 * factor) < 4.0).alias(
            "pitch_ok"),
    )


def q_audio_pad_trim(spark, sf_dir):
    """Fixed-window batching prep (gx_spark.audio_ops.pad_or_trim): tone
    clips of 100/300/500 ms by doc_id%3, all fixed to the 300 ms window.
    Exact pins: every row lands at 4800 samples / 300 ms / pcm_s16le;
    sil_ok pins the padding arithmetic — the 100 ms class gains exactly
    200 ms of digital silence (8 of 12 feature frames, ratio 2/3), the
    exact-fit class stays silence-free, and the 500 ms class truncates to
    a silence-free head."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, pad_or_trim

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        dur = [100, 300, 500][i % 3]
        t = np.arange(sr * dur // 1000) / sr
        pcm = np.rint(0.4 * 32767 * np.sin(2 * np.pi * 500.0 * t)).astype(
            np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, codecs[i % 3])),
                     sr, dur, codecs[i % 3]))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, sr_hz int, dur_ms int, codec string")
    feats = extract_audio_features(
        pad_or_trim(df, 300), keep_cols=["doc_id", "dur_ms", "codec"])
    expected_sil = F.when(F.col("doc_id") % 3 == 0,
                          F.lit(8.0 / 12.0)).otherwise(F.lit(0.0))
    return feats.select(
        "doc_id",
        F.col("n_samples").cast("int").alias("n_samples"),
        "dur_ms",
        F.col("codec").alias("codec_out"),
        (F.abs(F.col("silence_ratio") - expected_sil) < 1e-9).alias("sil_ok"),
    )


def q_audio_augment_noise(spark, sf_dir):
    """Additive-noise augmentation at 20 dB SNR (gx_spark.audio_ops.
    augment_noise — per-row-seeded, bit-identical at any parallelism):
    300 ms sines over four amplitude classes and three codecs, mixed,
    then re-measured by the features pass.  Pins per doc: n_ok (sample
    count preserved), floor_ok (the reported noise floor equals clean
    RMS - 20 dB to 1e-6 — exact arithmetic, not an expectation over the
    draw), power_ok (measured mix power equals clean power + noise power
    within 0.05 dB — the random cross-term is O(1/sqrt(n)) ~ 0.013 dB at
    4800 samples, quantization negligible).  All-true invariant oracle."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import augment_noise, extract_audio_features

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    base = np.sin(2 * np.pi * 392.0 * t)
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        amp = 0.1 + (i % 4) * 0.1
        pcm = np.rint(amp * 32767 * base).astype(np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, codecs[i % 3])),
                     codecs[i % 3]))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    before = extract_audio_features(df, keep_cols=["doc_id"]).select(
        "doc_id", F.col("n_samples").alias("n0"),
        F.col("rms_dbfs").alias("r0"))
    mixed = augment_noise(df, 20.0, id_col="doc_id")
    after = extract_audio_features(
        mixed, keep_cols=["doc_id", "noise_rms_dbfs"]).select(
        "doc_id", F.col("noise_rms_dbfs").alias("rn"),
        F.col("n_samples").alias("n1"), F.col("rms_dbfs").alias("r1"))
    expected_mix = 10.0 * F.log10(
        F.pow(F.lit(10.0), F.col("r0") / 10.0)
        + F.pow(F.lit(10.0), F.col("rn") / 10.0))
    return before.join(after, "doc_id").select(
        "doc_id",
        (F.col("n0") == F.col("n1")).alias("n_ok"),
        (F.abs(F.col("rn") - (F.col("r0") - 20.0)) < 1e-6).alias("floor_ok"),
        (F.abs(F.col("r1") - expected_mix) <= 0.05).alias("power_ok"),
    )


def q_audio_resample(spark, sf_dir):
    """Sample-rate conversion (gx_spark.audio_ops.resample_audio —
    windowed-sinc, anti-aliased): 300 ms 440 Hz tones at 16 kHz across
    three codecs, resampled to 8 kHz, re-measured by the features pass.
    Pinned invariants, all exact arithmetic: n_samples halves (4800 ->
    2400), dur_ms stays 300, output codec is pcm_s16le; the tone is
    437.5 Hz = bin 224 of the zero-padded dominant-frequency FFT grid
    (16000/8192 = 8000/4096 = 1.953125 Hz at BOTH rates), so the
    mainlobe peak sits exactly on-grid and dominant_hz is float-exact
    437.5 before and after the resample; rms_ok pins
    gain transparency within 0.5 dB (sinc passband ripple + mu-law
    companding noise are well inside).  The oracle is the per-doc
    invariant row."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, resample_audio

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    base = np.rint(0.3 * 32767 * np.sin(2 * np.pi * 437.5 * t)).astype(
        np.int16)
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        rows.append((i, bytearray(encode_payload(base, sr, codecs[i % 3])),
                     sr, 300, codecs[i % 3]))
    df = spark.createDataFrame(
        rows, "doc_id long, bytes binary, sr_hz int, dur_ms int, codec string")
    before = extract_audio_features(df, keep_cols=["doc_id"]).select(
        "doc_id", F.col("rms_dbfs").alias("r0"),
        F.col("dominant_hz").alias("d0"))
    res = resample_audio(df, 8000)
    after = extract_audio_features(
        res, keep_cols=["doc_id", "sr_hz", "dur_ms", "codec"]).select(
        "doc_id", "sr_hz", "dur_ms", "codec",
        F.col("n_samples").alias("n1"), F.col("rms_dbfs").alias("r1"),
        F.col("dominant_hz").alias("d1"))
    return before.join(after, "doc_id").select(
        "doc_id",
        F.col("n1").cast("int").alias("n_samples"),
        "sr_hz", "dur_ms",
        F.col("codec").alias("codec_out"),
        (F.abs(F.col("r1") - F.col("r0")) <= 0.5).alias("rms_ok"),
        ((F.col("d0") == 437.5) & (F.col("d1") == 437.5)).alias("dom_ok"),
    )


def q_audio_transcode_roundtrip(spark, sf_dir):
    """Codec transcoding (gx_spark.audio_ops.transcode_audio): clips from
    documents doc_id<300 (300 ms sines, three source codecs) are
    transcoded to FLAC, then BOTH sides run the features pass —
    lossless_ok pins that the transcoded decode carries the identical
    sample count and bit-identical RMS (FLAC is lossless over whatever
    the source decode produced, including the G.711-companded rows).
    The oracle is the all-true invariant per doc."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, transcode_audio

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    base = np.sin(2 * np.pi * 523.25 * t)
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        amp = 0.1 + (i % 4) * 0.1
        pcm = np.rint(amp * 32767 * base).astype(np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, codecs[i % 3])),
                     codecs[i % 3]))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    before = extract_audio_features(df, keep_cols=["doc_id"]).select(
        "doc_id", F.col("n_samples").alias("n0"), F.col("rms_dbfs").alias("r0"))
    after = extract_audio_features(
        transcode_audio(df, "flac"), keep_cols=["doc_id", "codec"]).select(
        "doc_id", "codec", F.col("n_samples").alias("n1"),
        F.col("rms_dbfs").alias("r1"))
    return before.join(after, "doc_id").select(
        "doc_id",
        ((F.col("n0") == F.col("n1")) & (F.col("r0") == F.col("r1"))).alias(
            "lossless_ok"),
        F.col("codec").alias("codec_out"),
    )


def q_transcript_wer_documents(spark, sf_dir):
    """ASR error-rate QA (gx_spark/ops.py transcript_error_stats): the
    reference is each doc's first 30 words; the hypothesis plants
    deterministic edits per word from md5(word:pos)%7 — class 0 deletes
    the word, class 1 substitutes it with word~pos.  Substituted tokens
    contain '~' (absent from the corpus), so they can match NO reference
    word, which makes the true word-level Levenshtein distance provably
    exactly D+S (any edit script pays >= one op per OOV token plus the
    length deficit) — the oracle recomputes D+S and the rates from the
    same md5 arithmetic, while the ENGINE runs its real DP (pandas UDF)
    and the builtin char levenshtein; hash equality certifies both.
    ASCII-pure corpus, so byte-based (DuckDB) and codepoint-based
    (Spark) char distances agree."""
    docs = _load(spark, sf_dir, "documents")
    rw = F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 30)
    marked = F.transform(
        rw,
        lambda w, i: F.struct(
            w.alias("w"),
            (i + 1).cast("string").alias("i"),
            (F.conv(F.substring(
                F.md5(F.concat(w, F.lit(":"), (i + 1).cast("string"))),
                1, 15), 16, 10).cast("long") % 7).alias("h"),
        ),
    )
    hyp_arr = F.transform(
        F.filter(marked, lambda s: s["h"] != 0),
        lambda s: F.when(
            s["h"] == 1, F.concat(s["w"], F.lit("~"), s["i"])
        ).otherwise(s["w"]),
    )
    pairs = docs.select(
        "doc_id",
        F.array_join(hyp_arr, " ").alias("hyp"),
        F.array_join(rw, " ").alias("ref"),
    )
    return ops.transcript_error_stats(pairs, "doc_id", "hyp", "ref")


def q_dedup_spans_documents(spark, sf_dir):
    """Substring-level exact dedup (gx_spark/ops.py dedup_spans — Lee et
    al. 2022 ExactSubstr re-expressed as distributable positional 8-gram
    span marking): every word 8-gram occurring more than once in the
    corpus is kept only at its first (doc_id, pos) occurrence; the k
    words of every later occurrence are cut from their documents.  The
    testdata's planted near-dup docs share aligned word runs, so real
    cross-doc spans are removed (~2100 duplicated-gram occurrences at
    sf0.01).  The oracle rebuilds the identical pipeline relationally —
    same md5 gram keys, winner-encode min, overlap-union removal, and
    space-rejoined text."""
    docs = _load(spark, sf_dir, "documents")
    return ops.dedup_spans(docs, "doc_id", "text", k=8)


def q_audio_loudness_bands(spark, sf_dir):
    """Programme-loudness QA (gx_spark.audio_ops.loudness_features —
    ITU-R BS.1770-4: K-weighting biquads re-derived for any fs via the
    bilinear transform, 400/100 ms momentary blocks, absolute -70 LUFS +
    relative -10 LU gating; one Arrow decode, map-only).  Clips are
    997 Hz calibration tones (1 s @ 16 kHz) with amplitude class
    doc_id%5 -> (c+1)/5, so expected loudness is the closed form
    20*log10((c+1)/5) - 3.01 (the spec's full-scale-997Hz = -3.01 LUFS
    identity), spaced >= 1.9 dB; doc_id%7==0 clips get 500 ms of
    appended digital silence.  Pins per doc:

    - band:       amplitude class recovered by midpoint-banding
                  lufs_momentary_max (the max block is always a pure
                  tone block, immune to the pad)
    - n_blocks:   exact block arithmetic (7 unpadded, 12 padded)
    - gated_lt_1: the two all-silence blocks of a padded clip fall
                  under the absolute gate, so gated_block_frac < 1
                  exactly for the doc_id%7==0 class
    - integrated_ok: unpadded clips match the closed form within
                  0.3 LU; padded clips read it minus the straddling-
                  block dilution 10*log10(8.5/10) ~ 0.71 LU (gating
                  drops the silence but keeps the three straddlers) —
                  pinned to (0.4, 1.1) below the closed form
    """
    import math

    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import loudness_features

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 400")
    t = np.arange(sr) / sr
    base = np.sin(2 * np.pi * 997.0 * t)
    pad = np.zeros(sr // 2, dtype=np.int16)
    payload = {}
    for c in range(5):
        tone = np.rint((c + 1) / 5 * 32767 * base).astype(np.int16)
        for padded in (False, True):
            pcm = np.concatenate([tone, pad]) if padded else tone
            for k in range(3):
                payload[(c, padded, k)] = bytearray(
                    encode_payload(pcm, sr, codecs[k]))
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        key = (i % 5, i % 7 == 0, i % 3)
        rows.append((i, payload[key], codecs[i % 3]))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    feats = loudness_features(df, keep_cols=["doc_id"])

    exp = [20.0 * math.log10((c + 1) / 5) - 3.01 for c in range(5)]
    mids = [(exp[c] + exp[c + 1]) / 2 for c in range(4)]
    band = sum((F.col("lufs_momentary_max") > F.lit(m)).cast("int")
               for m in mids)
    padded = F.col("doc_id") % 7 == 0
    exp_c = F.element_at(F.array(*[F.lit(e) for e in exp]),
                         (F.col("doc_id") % 5).cast("int") + 1)
    diff = exp_c - F.col("lufs_integrated")
    return feats.select(
        "doc_id",
        band.cast("int").alias("band"),
        F.col("n_blocks").cast("int").alias("n_blocks"),
        (F.col("gated_block_frac") < 1.0 - 1e-12).alias("gated_lt_1"),
        F.when(padded, (diff > 0.4) & (diff < 1.1))
         .otherwise(F.abs(diff) < 0.3).alias("integrated_ok"),
    )


def q_audio_pitch_violations(spark, sf_dir):
    """Pitch-gate expectations (expectations/audio_exp.py
    expect_audio_voiced_fraction_to_be_between /
    expect_audio_pitch_to_be_between riding ONE shared framewise-ACF
    decode): clips from documents doc_id<400 with deterministic classes —
    doc_id%4==1 is a 420 Hz tone (voiced, but breaks the [100, 300] Hz
    adult-speech band), doc_id%4==2 is seeded white noise (voiced_frac 0
    breaks the 0.5 floor; its F0 median is null so the pitch gate
    excludes it), classes 0/3 are 150/220 Hz tones that pass both.  The
    oracle recomputes each violation count from the class arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 400")
    n = sr * 400 // 1000
    t = np.arange(n) / sr

    def tone(f):
        return np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)

    rng = np.random.default_rng(29)
    noise = np.clip(rng.normal(0, 0.2, n) * 32767, -32768, 32767).astype(
        np.int16)
    pcm = {0: tone(150.0), 1: tone(420.0), 2: noise, 3: tone(220.0)}
    payload = {(c, k): bytearray(encode_payload(pcm[c], sr, codecs[k]))
               for c in range(4) for k in range(3)}
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        rows.append((i, f"p_{i}", payload[(i % 4, i % 3)], sr, 400,
                     codecs[i % 3], "t"))
    df = spark.createDataFrame(
        rows,
        "doc_id long, clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    r = _evr(
        spark, df,
        ExpectationSuite("pitch")
        .add("expect_audio_voiced_fraction_to_be_between", min_fraction=0.5)
        .add("expect_audio_pitch_to_be_between", min_hz=100.0, max_hz=300.0),
    )
    return _row(
        spark,
        "element_count long, voiced_unexpected long, pitch_unexpected long",
        [r[0].result["element_count"], r[0].result["unexpected_count"],
         r[1].result["unexpected_count"]],
    )


def q_chunk_documents(spark, sf_dir):
    """Context-window chunking (gx_spark.ops.chunk_documents — the
    training-example prep step: 32-token windows, 8-token overlap,
    stride 24; trim+\\s+ tokens, case preserved, empty docs dropped).
    Entirely map-side HOF slices + one explode — ZERO shuffle
    (plan-pinned in tests/test_chunk_ops.py).  The oracle re-derives the
    identical window arithmetic with DuckDB list slicing; chunk text is
    compared by md5 so the exact payload is pinned without shipping it
    twice."""
    docs = _load(spark, sf_dir, "documents")
    ch = ops.chunk_documents(docs, chunk_tokens=32, overlap=8)
    return ch.select(
        "doc_id", "chunk_id", "n_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_md5"))


def q_audio_adpcm_roundtrip(spark, sf_dir):
    """IMA ADPCM codec (gx_spark/adpcm.py — the 1992 IMA 4-bit DVI4
    scheme in WAV tag-0x11 block framing, a real 4:1 compressed format
    alongside pcm/G.711/FLAC): 300 ms 200 Hz tones over four amplitude
    classes and three source codecs, transcoded to adpcm_ima and decoded
    back by the features pass.  Exact pins per doc: n_samples preserved
    (4800 — the fact chunk trims the padded final block) and the payload
    size is pure block arithmetic (ceil(4800/505)=10 blocks x 256 B +
    60 B headers = 2620, committable as a literal); invariant pins:
    rms_ok (ADPCM quantization noise sits >= 33 dB below a 200 Hz tone,
    measured floor 35.7 dB at amp 0.4, so the decoded RMS moves < 0.05
    dB) and dom_ok (the dominant FFT bin survives — the noise floor
    cannot displace a tone's argmax)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import extract_audio_features, transcode_audio

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    base = np.sin(2 * np.pi * 200.0 * t)
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        amp = 0.1 + (i % 4) * 0.1
        pcm = np.rint(amp * 32767 * base).astype(np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, codecs[i % 3])),
                     codecs[i % 3]))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    before = extract_audio_features(df, keep_cols=["doc_id"]).select(
        "doc_id", F.col("n_samples").alias("n0"),
        F.col("rms_dbfs").alias("r0"), F.col("dominant_hz").alias("d0"))
    coded = transcode_audio(df, "adpcm_ima").withColumn(
        "payload_bytes", F.length("bytes").cast("int"))
    after = extract_audio_features(
        coded, keep_cols=["doc_id", "codec", "payload_bytes"]).select(
        "doc_id", F.col("codec").alias("codec_out"), "payload_bytes",
        F.col("n_samples").alias("n1"), F.col("rms_dbfs").alias("r1"),
        F.col("dominant_hz").alias("d1"))
    return before.join(after, "doc_id").select(
        "doc_id",
        F.col("n1").cast("int").alias("n_samples"),
        "payload_bytes",
        "codec_out",
        (F.col("n0") == F.col("n1")).alias("n_ok"),
        (F.abs(F.col("r0") - F.col("r1")) < 0.05).alias("rms_ok"),
        (F.col("d0") == F.col("d1")).alias("dom_ok"),
    )


def q_audio_fingerprint_dedup(spark, sf_dir):
    """Cross-codec audio content dedup (gx_spark.audio_ops.
    audio_dedup_groups): spectral-peak fingerprints hashed to 64 bits
    JVM-side, grouped; only (id, fp64) pairs shuffle.  300 clips carry 120
    distinct two-tone contents (on-bin frequencies so frame argmax is
    leakage-free); instances of the same content differ by codec
    (pcm/flac/mulaw) AND gain (1.0/0.5/0.8), which byte-level dedup cannot
    match.  The oracle recomputes group arithmetic from doc_id % 120."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import audio_dedup_groups

    sr, n = 16000, 6400
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    gains = [1.0, 0.5, 0.8]
    t = np.arange(n) / sr
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        k, j = i % 120, i // 120
        b1 = 12 + 2 * k
        b2 = ((b1 + 97) % 230) + 14
        if abs(b2 - b1) < 5:
            b2 = b1 + 7
        x = 0.6 * np.sin(2 * np.pi * (b1 * 31.25) * t) + 0.3 * np.sin(
            2 * np.pi * (b2 * 31.25) * t)
        pcm = np.clip(x * gains[j] * 32767, -32768, 32767).astype(np.int16)
        rows.append((f"clip_{i:010d}", bytearray(encode_payload(pcm, sr, codecs[j])),
                     codecs[j]))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    g = audio_dedup_groups(df)
    return g.agg(
        F.count(F.lit(1)).alias("dup_groups"),
        F.sum("n_clips").alias("dup_rows"),
        F.sum((F.col("n_clips") >= 3).cast("long")).alias("groups_of_3"),
    )


def q_iceberg_snapshot_reads(spark, sf_dir):
    """Iceberg-lite round trip (gx_spark/iceberg.py — real v2 layout, no
    jar): orders written as two appends (even, then odd o_orderkey) into a
    shard-partitioned table; reads back the first snapshot (time travel),
    the current snapshot, the incremental slice between them, and a
    manifest-pruned single shard.  The oracle recomputes every figure from
    the same arithmetic directly over orders."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice",
        (F.col("o_orderkey") % 4).cast("int").alias("shard"))
    tmp = tempfile.mkdtemp(prefix="gx_ice_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_ice", orders.schema,
                                    partition_by=["shard"])
        s1 = t.append(orders.filter("o_orderkey % 2 = 0").repartition(4, "shard"))
        t.append(orders.filter("o_orderkey % 2 = 1").repartition(4, "shard"))
        snap1 = t.read(spark, snapshot_id=s1).count()
        current = t.read(spark).count()
        inc = t.read(spark, added_after_snapshot_id=s1).count()
        pruned_df = t.read(spark, partition_filter={"shard": 1})
        agg = pruned_df.agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        return _row(
            spark,
            "snap1_count long, current_count long, incremental_count long, "
            "pruned_count long, pruned_sum double",
            [snap1, current, inc, int(agg["c"]), float(agg["s"])],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_add_files(spark, sf_dir):
    """Metadata-only Iceberg migration (iceberg.py add_files /
    create_from_parquet): lineitem written as plain parquet, imported
    in place (no data rewrite — manifests point at the source files),
    then a normal append on top; checks the imported totals, the
    post-append totals, and time travel back to the import snapshot.
    Oracle recomputes the same arithmetic directly over lineitem."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    li = _load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    tmp = tempfile.mkdtemp(prefix="gx_ice_mig_")
    try:
        src = f"{tmp}/li.parquet"
        li.coalesce(4).write.parquet(src)
        t = IcebergLiteTable.create_from_parquet(f"{tmp}/li_ice", src)
        s_import = t.current_snapshot_id()
        imp = t.read(spark).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("l_extendedprice"), 2).alias("s")).first()
        t.append(li.filter("l_orderkey % 10 = 0").coalesce(2))
        after = t.read(spark).count()
        travel = t.read(spark, snapshot_id=s_import).count()
        op = t.snapshots()[0]["summary"]["operation"]
        return _row(
            spark,
            "imported_count long, imported_sum double, after_append_count long, "
            "travel_count long, import_op string",
            [int(imp["c"]), float(imp["s"]), after, travel, op],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_position_deletes(spark, sf_dir):
    """Iceberg v2 positional deletes (iceberg.py delete): orders loaded
    into an Iceberg-lite table, rows with o_orderstatus='F' deleted (v2
    delete files — no data rewrite), remaining totals checked against the
    pre-delete snapshot via time travel.  Oracle recomputes both states
    directly over orders."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="gx_ice_del_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_ice", orders.schema)
        s_before = t.append(orders.coalesce(4))
        t.delete(spark, "o_orderstatus = 'F'")
        after = t.read(spark).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        before_count = t.read(spark, snapshot_id=s_before).count()
        n_del = int(t.snapshots()[-1]["summary"]["added-position-deletes"])
        return _row(
            spark,
            "remaining_count long, remaining_sum double, before_count long, "
            "deleted_rows long",
            [int(after["c"]), float(after["s"]), before_count, n_del],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_compaction(spark, sf_dir):
    """Iceberg compaction (iceberg.py rewrite_data_files — the
    small-file maintenance action): orders appended, 'F' rows deleted via
    v2 position deletes, then the table is compacted to ONE file with a
    REPLACE snapshot that folds the deletes in (target_files=1 — coalesce
    can only merge, so 1 is the deterministic target at every scale).  The post-compaction read
    must equal the post-delete state, the file count must drop to the
    target, delete manifests must stop applying, and time travel to the
    pre-delete snapshot must still see every original row.  Oracle
    recomputes all four from orders."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="gx_ice_compact_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_ice", orders.schema)
        s_before = t.append(orders.coalesce(8))
        t.delete(spark, "o_orderstatus = 'F'")
        t.rewrite_data_files(spark, target_files=1)
        after = t.read(spark).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        n_files = len(t.plan_files())
        before_count = t.read(spark, snapshot_id=s_before).count()
        return _row(
            spark,
            "compacted_count long, compacted_sum double, n_files long, "
            "before_count long",
            [int(after["c"]), float(after["s"]), n_files, before_count],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_equality_deletes(spark, sf_dir):
    """Iceberg v2 EQUALITY deletes (iceberg.py equality_delete, content=2
    files with field-id equality_ids + strict sequence scoping): orders
    appended, every o_custkey divisible by 7 equality-deleted, then rows
    with those keys RE-INSERTED — the spec's sequence rule (an equality
    delete at sequence s applies only to data files with sequence < s)
    means the re-inserted rows must survive.  Oracle recomputes the
    remaining count/sum plus the surviving re-inserts from orders."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="gx_ice_eqdel_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_ice", orders.schema)
        t.append(orders.coalesce(4))
        keys = orders.where("o_custkey % 7 = 0").select("o_custkey")
        t.equality_delete(spark, keys, ["o_custkey"])
        t.append(orders.where("o_custkey % 7 = 0").coalesce(2))
        out = t.read(spark).agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("o_custkey") % 7 == 0, 1).otherwise(0))
            .cast("long").alias("reinserted_survivors"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        return _row(
            spark,
            "total_count long, reinserted_survivors long, total_sum double",
            [int(out["c"]), int(out["reinserted_survivors"]),
             float(out["s"])],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_schema_evolution(spark, sf_dir):
    """Iceberg schema evolution (iceberg.py add/rename/drop_column):
    orders appended in two eras around an add_column — era-1 files
    null-fill the new column at read, era-2 files carry it — and
    o_totalprice renamed to price with era-1 files aliased through the
    stable field id.  Oracle recomputes the era arithmetic over orders."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="gx_ice_evo_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_ice", orders.schema)
        t.append(orders.filter("o_orderkey % 2 = 0").coalesce(2))
        t.add_column("era", "string")
        t.append(orders.filter("o_orderkey % 2 = 1")
                 .withColumn("era", F.lit("v2")).coalesce(2))
        t.rename_column("o_totalprice", "price")
        back = t.read(spark)
        agg = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("era").isNull(), 1).otherwise(0)).alias("era_nulls"),
            F.round(F.sum("price"), 2).alias("price_sum"),
            F.round(F.sum(F.when(F.col("era") == "v2", F.col("price"))), 2)
            .alias("v2_price_sum")).first()
        return _row(
            spark,
            "n long, era_nulls long, price_sum double, v2_price_sum double",
            [int(agg["n"]), int(agg["era_nulls"]),
             float(agg["price_sum"]), float(agg["v2_price_sum"])],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_merge_refs(spark, sf_dir):
    """Iceberg MERGE INTO + named refs + metadata tables (iceberg.py
    merge_into / create_tag / meta_df): orders appended and tagged 'v1',
    then a classic upsert — every o_custkey%3==0 row re-priced (+1000)
    and 7 brand-new rows inserted — committed as ONE atomic MoR snapshot
    (equality-delete manifest + data manifest at the same sequence, so
    the merge's own inserts survive its own deletes; the target is never
    scanned).  Checks the merged state, the tag's frozen pre-merge image
    (read(ref=)), and the snapshots/refs/delete_files metadata tables.
    Oracle recomputes every figure from orders arithmetic."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="gx_ice_merge_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_ice", orders.schema)
        t.append(orders.coalesce(4))
        t.create_tag("v1")
        upd = orders.filter("o_custkey % 3 = 0").withColumn(
            "o_totalprice", F.col("o_totalprice") + 1000.0)
        ins = spark.createDataFrame(
            [(9_000_000_000 + i, i + 1, 100.5 * (i + 1)) for i in range(7)],
            orders.schema)
        t.merge_into(spark, upd.unionByName(ins).coalesce(2),
                     on=["o_orderkey"])
        m = t.read(spark).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
            F.sum((F.col("o_orderkey") >= 9_000_000_000).cast("long"))
            .alias("ins")).first()
        tag = t.read(spark, ref="v1").agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        n_snaps = t.meta_df(spark, "snapshots").count()
        n_refs = t.meta_df(spark, "refs").count()
        del_records = int(t.meta_df(spark, "delete_files")
                          .agg(F.sum("record_count")).first()[0])
        return _row(
            spark,
            "merged_count long, merged_sum double, inserted_survivors long, "
            "tag_count long, tag_sum double, n_snapshots long, n_refs long, "
            "delete_records long",
            [int(m["c"]), float(m["s"]), int(m["ins"]),
             int(tag["c"]), float(tag["s"]), n_snaps, n_refs, del_records],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_iceberg_wap_audit(spark, sf_dir):
    """Write-audit-publish gate (gx_spark/wap.py validate_and_publish +
    iceberg.py branch commits / fast_forward): three order batches run
    the full stage→audit→publish loop — even orderkeys publish, a
    price-negated batch FAILS the suite (main never sees it; the stage
    survives under a rejected-<id> tag), odd orderkeys publish.  The
    audit validates only each staged slice; publish is a pure-metadata
    fast-forward.  Oracle recomputes every figure from orders."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable
    from gx_spark.wap import validate_and_publish

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="gx_ice_wap_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_ice", orders.schema)
        gate = (ExpectationSuite("gate")
                .add("expect_column_values_to_not_be_null",
                     column="o_custkey")
                .add("expect_column_values_to_be_between",
                     column="o_totalprice", min_value=0))
        r1 = validate_and_publish(
            spark, t, orders.filter("o_orderkey % 2 = 0").coalesce(2), gate)
        bad = orders.filter("o_orderkey % 2 = 1").withColumn(
            "o_totalprice", -F.col("o_totalprice"))
        r2 = validate_and_publish(spark, t, bad.coalesce(2), gate)
        r3 = validate_and_publish(
            spark, t, orders.filter("o_orderkey % 2 = 1").coalesce(2), gate)
        main = t.read(spark).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        rejected_rows = next(
            x.result["unexpected_count"]
            for x in r2.bundle.suite_result.results
            if x.expectation_config.expectation_type
            == "expect_column_values_to_be_between")
        tag_count = t.read(spark, ref=r2.rejected_tag).count()
        published = sum(int(r.published) for r in (r1, r2, r3))
        return _row(
            spark,
            "published_batches long, main_count long, main_sum double, "
            "rejected_rows long, rejected_tag_count long, log_len long, "
            "n_refs long",
            [published, int(main["c"]), float(main["s"]),
             int(rejected_rows), int(tag_count),
             len(t.metadata["snapshot-log"]), len(t.refs)],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_avro_source_orders(spark, sf_dir):
    """Distributed Avro batch source (gx_spark/avro_source.py — this
    Spark distribution ships no spark-avro jar, so the stdlib OCF codec
    decodes per-task via mapInPandas): orders written as 4 OCF shards
    (two deflate, two null codec; o_orderstatus as a nullable union,
    nulled where o_orderkey%97==0), read back through
    read_batch(format='avro'), aggregated.  Oracle recomputes the same
    arithmetic directly over orders."""
    import shutil
    import tempfile

    from gx_spark.avro_ocf import write_ocf
    from gx_spark.table_provider import read_batch

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    sch = {"type": "record", "name": "o", "fields": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_custkey", "type": "long"},
        {"name": "o_orderstatus", "type": ["null", "string"]},
        {"name": "o_totalprice", "type": "double"},
    ]}
    rows = [{"o_orderkey": r["o_orderkey"], "o_custkey": r["o_custkey"],
             "o_orderstatus": (None if r["o_orderkey"] % 97 == 0
                               else r["o_orderstatus"]),
             "o_totalprice": r["o_totalprice"]}
            for r in orders.collect()]
    rows.sort(key=lambda r: r["o_orderkey"])
    tmp = tempfile.mkdtemp(prefix="gx_avro_src_")
    try:
        for i in range(4):
            write_ocf(f"{tmp}/part-{i}.avro", sch, rows[i::4],
                      codec="deflate" if i % 2 else "null")
        df = read_batch(spark, tmp, format="avro")
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
            F.sum(F.col("o_orderstatus").isNull().cast("long"))
            .alias("null_status"),
            F.countDistinct("o_orderstatus").alias("statuses"),
            F.sum((F.col("o_custkey") % 7 == 0).cast("long"))
            .alias("custkey_mod7"),
        ).first()
        return _row(
            spark,
            "n long, s double, null_status long, statuses long, "
            "custkey_mod7 long",
            [int(agg["n"]), float(agg["s"]), int(agg["null_status"]),
             int(agg["statuses"]), int(agg["custkey_mod7"])],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_bpe_token_stats(spark, sf_dir):
    """BPE-ish token counting (ops.bpe_token_count): GPT-2-style
    pretokenizer alternation, lookahead-free so the Java-regex Spark count
    and the RE2 DuckDB count match exactly.  One JVM-side
    regexp_extract_all, no UDF."""
    from gx_spark import ops

    docs = _load(spark, sf_dir, "documents")
    bt = ops.bpe_token_count(F.col("text"))
    wt = ops.token_count(F.col("text"))
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(bt).cast("long").alias("total_bpe_tokens"),
        F.round(F.avg(bt), 6).alias("avg_bpe_tokens"),
        F.max(bt).cast("long").alias("max_bpe_tokens"),
        F.round(F.sum(bt) / F.sum(wt), 6).alias("bpe_per_word"),
    )


def q_winnowing_fingerprints(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (ops.winnowing_fingerprints,
    MOSS SIGMOD'03) + overlap pairs.  Oracle recomputes the identical
    k-gram md5 rolling hashes, min-per-window selection, stop-gram cap,
    and pair join in DuckDB SQL."""
    from gx_spark import ops

    docs = _load(spark, sf_dir, "documents")
    fps = ops.winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4)
    pairs = ops.fingerprint_overlap_pairs(fps, min_shared=3, max_df=50)
    n_fps = fps.agg(
        F.count(F.lit(1)).alias("c"),
        F.count_distinct("id").alias("d")).first()
    p = pairs.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(F.sum("shared"), F.lit(0)).alias("s")).first()
    return _row(
        spark,
        "n_fingerprints long, n_docs_fingerprinted long, n_overlap_pairs "
        "long, total_shared long",
        [int(n_fps["c"]), int(n_fps["d"]), int(p["c"]), int(p["s"])],
    )


def q_iceberg_data_skipping(spark, sf_dir):
    """Manifest-bounds data skipping (iceberg.py value_filter + sort_by
    clustered write): orders written range-clustered on o_totalprice, then
    read with a BETWEEN value filter that prunes files via the recorded
    footer min/max before Spark opens anything.  Emits the BETWEEN
    aggregate plus the fraction of files pruned; the oracle recomputes the
    aggregate directly (pruning is plan-asserted in tests, the ratio here
    just proves it engaged: > 0)."""
    import shutil
    import tempfile

    from gx_spark.iceberg import IcebergLiteTable

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="gx_ice_skip_")
    try:
        t = IcebergLiteTable.create(f"{tmp}/orders_ice", orders.schema)
        t.append(orders, sort_by=["o_totalprice"])
        vf = {"o_totalprice": (50000.0, 100000.0)}
        n_all = len(t.plan_files())
        n_kept = len(t.plan_files(value_filter=vf))
        agg = t.read(spark, value_filter=vf).agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("o_totalprice"), 2).alias("s")).first()
        return _row(
            spark,
            "in_range_count long, in_range_sum double, pruning_engaged boolean",
            [int(agg["c"]), float(agg["s"]), bool(n_kept < n_all)],
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_streaming_cross_batch_dups(spark, sf_dir):
    """Cross-batch uniqueness over a real stream: lineitem's duplicated
    (l_orderkey, l_linenumber) pairs are deliberately SPLIT across three
    micro-batch files (row_number within key mod 3), so per-batch
    validation cannot see them; `detect_cross_batch_duplicates`
    (applyInPandasWithState keyed state, gx_spark/streaming.py) must.  The
    final state is SQL-expressible — max(seen_count) per key equals the
    key's total row count — so the oracle is a plain GROUP BY HAVING."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gx_spark.streaming import detect_cross_batch_duplicates

    li = (
        _load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        # 1/8 key slice: keeps plenty of duplicated pairs while bounding the
        # per-round driver cost (streaming state commits dominate, not rows)
        .filter(F.col("l_orderkey") % 8 == 0)
    )
    tmp = tempfile.mkdtemp(prefix="gx_stream_dups_")
    try:
        src = os.path.join(tmp, "src")
        out = os.path.join(tmp, "out")
        ck = os.path.join(tmp, "ck")
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(F.lit(1))
        li_b = li.withColumn("b", F.row_number().over(w) % 3)
        for i in range(3):
            li_b.filter(F.col("b") == i).drop("b").coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema("l_orderkey long, l_linenumber int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = detect_cross_batch_duplicates(
            stream, ["l_orderkey", "l_linenumber"], out,
            checkpoint_location=ck,
        )
        q.awaitTermination(300)
        dup = spark.read.parquet(os.path.join(out, "_dup_violations"))
        per_key = dup.groupBy("l_orderkey", "l_linenumber").agg(
            F.max("seen_count").alias("c")
        )
        row = per_key.agg(
            F.count(F.lit(1)).alias("dup_groups"),
            F.sum("c").alias("dup_rows"),
        ).collect()[0]
        return _row(spark, "dup_groups long, dup_rows long",
                    [int(row["dup_groups"]), int(row["dup_rows"])])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_streaming_windowed_events(spark, sf_dir):
    """Watermarked per-window aggregate validation over the real events
    table (gx_spark.streaming.validate_stream_windowed): events stream in
    two half-month micro-batches + a far-future sentinel batch that
    advances the watermark past every real 1-day window, so append mode
    flushes them all.  Per-window row_count and mean(value) verdicts must
    equal a plain batch GROUP BY date_trunc('day', ts) — which is exactly
    the DuckDB oracle."""
    import shutil
    import tempfile

    from gx_spark.streaming import validate_stream_windowed

    ev = _load(spark, sf_dir, "events").select("ts", "value")
    tmp = tempfile.mkdtemp(prefix="gx_stream_win_")
    try:
        src = os.path.join(tmp, "src")
        out = os.path.join(tmp, "out")
        split = "2024-01-16"
        sentinel = "2024-03-01"
        slices = [
            ev.filter(F.col("ts") < split),
            ev.filter(F.col("ts") >= split),
            spark.createDataFrame(
                [(__import__("datetime").datetime(2024, 3, 1), 0.0)],
                "ts timestamp, value double",
            ),
        ]
        mt0 = 1_700_000_000
        for i, s in enumerate(slices):
            s.coalesce(1).write.mode("append").parquet(src)
            parts = sorted(
                (os.path.getmtime(os.path.join(src, f)), f)
                for f in os.listdir(src) if f.endswith(".parquet")
            )
            t = mt0 + i * 10
            os.utime(os.path.join(src, parts[-1][1]), (t, t))
        stream = (
            spark.readStream.schema("ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        suite = (
            ExpectationSuite("w")
            .add("expect_table_row_count_to_be_between", min_value=1)
            .add("expect_column_mean_to_be_between", column="value",
                 min_value=-1e9, max_value=1e9)
        )
        q = validate_stream_windowed(
            stream, "ts", "1 day", suite, out, watermark_delay="1 minute"
        )
        q.awaitTermination(300)
        wr = spark.read.parquet(os.path.join(out, "_window_results"))
        res = (
            wr.filter(F.col("window_start") < F.lit(sentinel))
            .groupBy("window_start")
            .agg(
                F.max(
                    F.when(
                        F.col("expectation_type")
                        == "expect_table_row_count_to_be_between",
                        F.col("observed"),
                    )
                ).cast("long").alias("n_rows"),
                F.round(
                    F.max(
                        F.when(
                            F.col("expectation_type")
                            == "expect_column_mean_to_be_between",
                            F.col("observed"),
                        )
                    ), 6,
                ).alias("mean_value"),
            )
            .select(
                F.date_format("window_start", "yyyy-MM-dd").alias("day"),
                "n_rows", "mean_value",
            )
            .orderBy("day")
        )
        # materialize before the tmp dir is removed — the returned DF must
        # not reference the deleted parquet files
        return spark.createDataFrame(
            res.collect(), "day string, n_rows long, mean_value double"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_expectation_diagnostics(spark, sf_dir):
    """Gallery self-check harness (gx_spark/diagnostics.py — the GE
    run_diagnostics/examples machinery): run EVERY registered
    expectation type's example suite (r5: all 79 registered types are
    example-covered, including the binary audio/image/video ones and the
    two-table referential ones) through the REAL validate() path.  The
    oracle pins per type that at least one example ran, every example
    passed, and the full checklist succeeded — any engine regression in
    any expectation, or a new type registered without gallery coverage,
    breaks the hash."""
    from gx_spark import run_diagnostics_all

    rows = [
        (r["expectation_type"],
         bool(r["examples_run"] >= 1
              and r["examples_passed"] == r["examples_run"]),
         bool(r["success"]))
        for r in run_diagnostics_all(spark)
    ]
    return spark.createDataFrame(
        rows, "expectation_type string, examples_ok boolean, success boolean")


def q_curation_pipeline(spark, sf_dir):
    """End-to-end exact training-data curation (ops.curation_pipeline):
    md5 dedup -> lang filter -> quality band -> surviving token budget,
    in one summary row.  The oracle recomputes the identical pipeline as
    a DuckDB CTE chain — every stage exact and SQL-portable."""
    from gx_spark import ops

    docs = _load(spark, sf_dir, "documents")
    return ops.curation_pipeline(docs, "doc_id", "text")


def q_tfidf_documents(spark, sf_dir):
    """Per-doc top-5 tf-idf terms (gx_spark/ops.py tfidf_topk — sklearn
    smooth-idf formula, per-doc term counts folded MAP-SIDE over each
    doc's own word array, one corpus exchange for document frequency,
    broadcast-joined scoring, per-doc top-k bounded by the doc's own
    vocabulary).  Ranking is (round(score,6) DESC, term ASC) on both
    engines so the row set is deterministic."""
    docs = _load(spark, sf_dir, "documents")
    return ops.tfidf_topk(docs, "doc_id", "text", k=5)


# committed literal table for the mel oracle (the BPE merge-table
# convention): per class (doc_id % 9 -> freq in {300, 1500, 6000} Hz x
# codec in {pcm_s16le, flac, pcm_mulaw}), the dominant mel band and the
# mean log-mel level that gx_spark.audio_ops.compute_mel_row produces for
# the 300 ms / 16 kHz / 0.3 FS tone of that class.  tests/test_tfidf_mel
# re-derives these from the live code so drift is caught in CI, and the
# driver oracle pins the distributed result against them.
_MEL_CLASS_DOM = [3, 11, 23, 3, 11, 23, 3, 11, 23]
_MEL_CLASS_DB = [
    18.225479561085248, 18.225335565151074, 18.22543815023749,
    18.225479561085248, 18.225335565151074, 18.22543815023749,
    18.231391984697552, 18.231216500002937, 18.208351381000718,
]


def q_audio_mel_features(spark, sf_dir):
    """ASR front-end statistics (gx_spark.audio_ops.mel_features — 25/10
    ms periodic-Hann frames, HTK triangular bank, one Arrow decode,
    map-only): 300 ms tones at 300/1500/6000 Hz across three codecs.
    Exact pins per doc: n_samples/n_frames/n_mels arithmetic (4800 / 28 /
    26), dominant_mel equals the committed per-class literal (the
    filterbank's best band for that tone, including the mu-law-companded
    rows), db_ok pins mel_mean_db to the committed literal within 1e-6
    (identical bytes -> identical numpy arithmetic)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import mel_features

    sr = 16000
    freqs = [300.0, 1500.0, 6000.0]
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    payload = {}
    for cls in range(9):
        f, c = freqs[cls % 3], codecs[cls // 3]
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        payload[cls] = bytearray(encode_payload(pcm, sr, c))
    rows = [(int(r.doc_id), payload[int(r.doc_id) % 9],
             codecs[(int(r.doc_id) % 9) // 3]) for r in docs.collect()]
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    feats = mel_features(df, keep_cols=["doc_id"])
    cls = (F.col("doc_id") % 9 + 1).cast("int")
    exp_dom = F.element_at(F.array(*[F.lit(v) for v in _MEL_CLASS_DOM]), cls)
    exp_db = F.element_at(F.array(*[F.lit(v) for v in _MEL_CLASS_DB]), cls)
    return feats.select(
        "doc_id",
        F.col("n_samples").cast("int").alias("n_samples"),
        F.col("n_frames").cast("int").alias("n_frames"),
        "n_mels",
        F.col("dominant_mel").alias("dominant_mel"),
        (F.abs(F.col("mel_mean_db") - exp_db) < 1e-6).alias("db_ok"),
        (F.col("dominant_mel") == exp_dom).alias("dom_ok"),
    )


def q_bloom_blocklist(spark, sf_dir):
    """Bloom-filter blocklist screen (gx_spark/ops.py
    bloom_blocklist_filter — the C4/RefinedWeb bad-word step as a
    plan-literal bitmap probed map-side with portable md5 arithmetic; no
    join, no shuffle, no Python).  m=48 bits / k=3 over a 4-term
    blocklist is deliberately small so the corpus vocabulary produces a
    real false positive ('column' probes all-bits-set at sf0.01) — the
    oracle recomputes the identical flag set from the same md5 position
    arithmetic, false positives included, which is exactly the Bloom
    guarantee (no false negatives; FPs deterministic in the bitmap)."""
    docs = _load(spark, sf_dir, "documents")
    return ops.bloom_blocklist_filter(
        docs, "doc_id", "text",
        ["merge", "vector", "stream", "quantile"], m_bits=48, k=3)


# committed literal table for the MFCC oracle (the mel convention): per
# class (doc_id % 9 -> freq in {300, 1500, 6000} Hz x codec in
# {pcm_s16le, flac, pcm_mulaw}), the frame-mean c0/c1/c2 cepstra that
# gx_spark.audio_ops.compute_mfcc_row produces for the 300 ms / 16 kHz /
# 0.3 FS tone of that class.  FLAC classes (3-5) are bit-identical to the
# pcm classes (0-2) — losslessness visible in the literals.
# tests/test_tfidf_mel.py re-derives these from live code.
_MFCC_CLASS_C0 = [
    -55.91018974345071, -60.45999553864356, -90.60622602789591,
    -55.91018974345071, -60.45999553864356, -90.60622602789591,
    -17.532078354235708, -31.009430548388202, -83.33487407934425,
]
_MFCC_CLASS_C1 = [
    28.79410833628961, 6.782104239418147, -30.268527490537743,
    28.79410833628961, 6.782104239418147, -30.268527490537743,
    6.093355467573323, -13.85848574175719, -31.385565114589212,
]
_MFCC_CLASS_C2 = [
    18.029834253745822, -22.449328459774268, 16.580615523938153,
    18.029834253745822, -22.449328459774268, 16.580615523938153,
    9.326558313142902, -12.595197403706058, 6.8941887417460626,
]


def q_audio_mfcc_features(spark, sf_dir):
    """MFCC cepstral summary (gx_spark.audio_ops.mfcc_features — log-mel
    bank + orthonormal DCT-II, one Arrow decode, map-only): the same
    9-class tone harness as audio_mel_features.  Exact pins per doc:
    n_samples/n_frames/n_mfcc arithmetic (4800 / 28 / 13), and
    c{0,1,2}_ok pin the frame-mean cepstra to the committed per-class
    literals within 1e-6 (identical bytes -> identical numpy
    arithmetic; FLAC classes equal their pcm classes = losslessness)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import mfcc_features

    sr = 16000
    freqs = [300.0, 1500.0, 6000.0]
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    payload = {}
    for cls in range(9):
        f, c = freqs[cls % 3], codecs[cls // 3]
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        payload[cls] = bytearray(encode_payload(pcm, sr, c))
    rows = [(int(r.doc_id), payload[int(r.doc_id) % 9],
             codecs[(int(r.doc_id) % 9) // 3]) for r in docs.collect()]
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    feats = mfcc_features(df, keep_cols=["doc_id"])
    cls = (F.col("doc_id") % 9 + 1).cast("int")
    oks = []
    for name, lits in (("c0", _MFCC_CLASS_C0), ("c1", _MFCC_CLASS_C1),
                       ("c2", _MFCC_CLASS_C2)):
        exp = F.element_at(F.array(*[F.lit(v) for v in lits]), cls)
        oks.append(
            (F.abs(F.col(f"{name}_mean") - exp) < 1e-6).alias(f"{name}_ok"))
    return feats.select(
        "doc_id",
        F.col("n_samples").cast("int").alias("n_samples"),
        F.col("n_frames").cast("int").alias("n_frames"),
        "n_mfcc", *oks,
    )


def q_audio_payload_size(spark, sf_dir):
    """Decode-free container-arithmetic screen (gx_spark.expectations.
    audio_exp.AudioPayloadSizeConsistent — length(bytes) vs the labeled
    (sr_hz, dur_ms, codec) geometry; pure JVM, the pre-decode gate a
    100 TB corpus runs at metadata speed).  One deterministic 200 ms /
    8 kHz tone payload shared by all classes, planted per doc_id%9:
    0 pcm_s16le / 1 pcm_mulaw / 2 pcm_alaw / 3 flac intact (lengths
    3244 / 1644 / 1644 / 3253 — RIFF 44 + 2n|n, FLAC 42-byte header +
    verbatim frames); 4 pcm truncated -7, 5 dur label inflated +50 ms,
    6 mulaw truncated -1, 7 flac cut to 10 bytes (< header) — classes
    4-7 are the violating set; class 8 (null bytes) is MISSING, not
    unexpected, per the audio family's map-denominator convention
    (not_be_null's concern).  is_violation comes from the engine's
    violations_table(); the oracle recomputes both columns from the
    class arithmetic."""
    import numpy as np

    from gx_spark.audio import encode_payload

    sr, dur = 8000, 200
    t = np.arange(sr * dur // 1000) / sr
    pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * 300.0 * t)).astype(
        np.int16)
    base = {c: encode_payload(pcm, sr, c)
            for c in ("pcm_s16le", "pcm_mulaw", "pcm_alaw", "flac")}
    cls_rows = {
        0: (base["pcm_s16le"], "pcm_s16le", dur),
        1: (base["pcm_mulaw"], "pcm_mulaw", dur),
        2: (base["pcm_alaw"], "pcm_alaw", dur),
        3: (base["flac"], "flac", dur),
        4: (base["pcm_s16le"][:-7], "pcm_s16le", dur),
        5: (base["pcm_s16le"], "pcm_s16le", dur + 50),
        6: (base["pcm_mulaw"][:-1], "pcm_mulaw", dur),
        7: (base["flac"][:10], "flac", dur),
        8: (None, "pcm_s16le", dur),
    }
    ids = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    rows = []
    for r in ids.collect():
        b, codec, d = cls_rows[int(r.doc_id) % 9]
        rows.append((int(r.doc_id), str(r.doc_id),
                     bytearray(b) if b is not None else None, sr, d, codec))
    clips = spark.createDataFrame(
        rows, "doc_id long, clip_id string, bytes binary, sr_hz int, "
              "dur_ms int, codec string")
    b = validate(
        spark, clips,
        ExpectationSuite("sz").add(
            "expect_audio_payload_size_to_be_consistent"),
        EngineOptions(unexpected_index_column_names=("clip_id",)),
    )
    viol = b.violations_table().select(
        F.col("clip_id").cast("long").alias("doc_id"),
        F.lit(True).alias("_v"))
    return (
        clips.join(viol, "doc_id", "left")
        .select(
            "doc_id",
            F.length("bytes").cast("long").alias("len_bytes"),
            F.coalesce(F.col("_v"), F.lit(False)).alias("is_violation"),
        )
    )


def q_audio_spectral_features(spark, sf_dir):
    """Spectral shape screen (gx_spark.audio_ops.spectral_features —
    whole-clip periodic-Hann rFFT, librosa/Essentia definitions, one
    Arrow decode, map-only): 300 ms tones, frequency varying per class
    (200..2100 Hz in 100 Hz steps) across three codecs.  Pins per doc,
    tolerance envelopes measured over all (freq, codec) classes:
    cen_ok (Hann mainlobe is symmetric: centroid within 5 Hz of the tone
    even after mu-law companding noise), bw_ok (windowed-tone bandwidth
    < 100 Hz — pcm/flac measure ~2 Hz, mu-law's -38 dB broadband
    companding noise lifts it to ~72), roll_ok (85% rolloff within 4 Hz
    = 2 bins of the tone), flat_ok (Wiener entropy < 1e-9: tonal, six
    orders below white noise's ~0.5)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import spectral_features

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    payload = {}
    for cls in range(20):
        f = 200.0 + cls * 100.0
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        payload[cls] = bytearray(encode_payload(pcm, sr, codecs[cls % 3]))
    rows = [(int(r.doc_id), payload[int(r.doc_id) % 20],
             codecs[int(r.doc_id) % 20 % 3]) for r in docs.collect()]
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    feats = spectral_features(df, keep_cols=["doc_id"])
    f_exp = 200.0 + (F.col("doc_id") % 20).cast("double") * 100.0
    return feats.select(
        "doc_id",
        F.col("n_samples").cast("int").alias("n_samples"),
        (F.abs(F.col("spectral_centroid_hz") - f_exp) < 5.0).alias("cen_ok"),
        (F.col("spectral_bandwidth_hz") < 100.0).alias("bw_ok"),
        (F.abs(F.col("spectral_rolloff_hz") - f_exp) < 4.0).alias("roll_ok"),
        (F.col("spectral_flatness") < 1e-9).alias("flat_ok"),
    )


def q_audio_pitch_features(spark, sf_dir):
    """Pitch screening (gx_spark.audio_ops.pitch_features — framewise
    autocorrelation F0, Wiener-Khinchin ACF, parabolic peak interp, one
    Arrow decode, map-only): 300 ms tones, F0 varying per class
    (80..480 Hz in 40 Hz steps, spanning the speech range) across three
    codecs.  Exact pins per doc: n_samples (4800) and n_frames
    (40/20 ms frames: 1 + (4800-640)//320 = 14); invariant pins:
    voiced_frac exactly 1.0 (every frame of a steady tone is voiced),
    f0_ok (median F0 within 1.5% — the sub-sample parabolic refinement's
    worst case is ~1% at 80 Hz where the integer lag grid is coarsest),
    per_ok (mean periodicity > 0.65, measured floor 0.687 at 80 Hz)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import pitch_features

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    payload = {}
    for cls in range(11):
        f = 80.0 + cls * 40.0
        pcm = np.rint(0.3 * 32767 * np.sin(2 * np.pi * f * t)).astype(
            np.int16)
        payload[cls] = bytearray(encode_payload(pcm, sr, codecs[cls % 3]))
    rows = [(int(r.doc_id), payload[int(r.doc_id) % 11],
             codecs[int(r.doc_id) % 11 % 3]) for r in docs.collect()]
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    feats = pitch_features(df, keep_cols=["doc_id"])
    f_exp = 80.0 + (F.col("doc_id") % 11).cast("double") * 40.0
    return feats.select(
        "doc_id",
        F.col("n_samples").cast("int").alias("n_samples"),
        F.col("n_frames").cast("int").alias("n_frames"),
        F.col("voiced_frac").alias("voiced_frac"),
        (F.abs(F.col("f0_median_hz") - f_exp) / f_exp < 0.015).alias("f0_ok"),
        (F.col("periodicity_mean") > 0.65).alias("per_ok"),
    )


def q_audio_augment_pipeline(spark, sf_dir):
    """Fused augmentation recipe (gx_spark.audio_ops.augment_pipeline —
    noise mix at 20 dB SNR -> 1.25x speed perturb -> fixed 400 ms window
    in ONE decode/encode pass; pinned bit-identical to the chained
    three-op form by pytest): 300 ms sines over four amplitude classes
    and three codecs.  Exact pins per doc: the window arithmetic
    (n_samples = 16000*400/1000 = 6400, dur_ms = 400, codec_out
    pcm_s16le) and floor_ok — the reported noise floor still equals the
    CLEAN clip's RMS - 20 dB to 1e-6 after the whole fused chain (the
    floor is measured at the mix stage; speed/window stages must not
    touch it)."""
    import numpy as np

    from gx_spark.audio import encode_payload
    from gx_spark.audio_ops import augment_pipeline, extract_audio_features

    sr = 16000
    codecs = ["pcm_s16le", "flac", "pcm_mulaw"]
    docs = _load(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 300")
    t = np.arange(sr * 300 // 1000) / sr
    base = np.sin(2 * np.pi * 392.0 * t)
    rows = []
    for r in docs.collect():
        i = int(r.doc_id)
        amp = 0.1 + (i % 4) * 0.1
        pcm = np.rint(amp * 32767 * base).astype(np.int16)
        rows.append((i, bytearray(encode_payload(pcm, sr, codecs[i % 3])),
                     codecs[i % 3]))
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, codec string")
    before = extract_audio_features(df, keep_cols=["doc_id"]).select(
        "doc_id", F.col("rms_dbfs").alias("r0"))
    aug = augment_pipeline(df.withColumnRenamed("doc_id", "clip_id"),
                           snr_db=20.0, speed=1.25, target_ms=400)
    after = extract_audio_features(
        aug, keep_cols=["clip_id", "codec", "noise_rms_dbfs"]).select(
        F.col("clip_id").alias("doc_id"),
        F.col("codec").alias("codec_out"),
        F.col("noise_rms_dbfs").alias("rn"),
        F.col("n_samples").alias("n1"))
    return before.join(after, "doc_id").select(
        "doc_id",
        F.col("n1").cast("int").alias("n_samples"),
        "codec_out",
        (F.abs(F.col("rn") - (F.col("r0") - 20.0)) < 1e-6).alias("floor_ok"),
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation suite on sf0.001 lineitem; returns the
    `_validation_results` DataFrame."""
    sf_dir = "/root/testdata/sf0.001"
    li = _load(spark, sf_dir, "lineitem")
    suite = (
        ExpectationSuite("flagship")
        .add("expect_table_row_count_to_be_between", min_value=1)
        .add("expect_column_values_to_not_be_null", column="l_orderkey")
        .add("expect_column_values_to_be_in_set", column="l_returnflag",
             value_set=["A", "N", "R"])
        .add("expect_column_values_to_be_between", column="l_quantity",
             min_value=1, max_value=50)
        .add("expect_column_mean_to_be_between", column="l_extendedprice", min_value=0)
        .add("expect_column_quantile_values_to_be_between", column="l_quantity",
             quantile_ranges={"quantiles": [0.25, 0.5, 0.75]})
        .add("expect_column_values_to_match_regex", column="l_linestatus", regex="^[FO]$")
    )
    bundle = validate(spark, li, suite, EngineOptions(collect_violations=False))
    return bundle.results_df(spark)


def q_oov_stats_documents(spark, sf_dir):
    """Lexicon-coverage screen (gx_spark/ops.py oov_stats — the ASR-corpus
    gate for wrong-language / OCR-garbage transcripts): tokens are
    normalize_text-normalized (lower / [a-z0-9'] / collapse), the lexicon
    is corpus-derived (frequency >= 2, so hapaxes are OOV), scoring
    broadcast-joins the lexicon and partial-aggregates to one row per doc.
    The oracle replays the identical regex (Java/RE2 common subset, 'g'
    flag on the DuckDB side), frequency rule, and rate arithmetic."""
    docs = _load(spark, sf_dir, "documents")
    return ops.oov_stats(docs, "doc_id", "text", min_count=2)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering note: the driver's correctness run checks the FIRST 50
    # entries of this dict against oracle_sql() at sf0.01.  Round 5 added
    # ~48 new queries — more than one window holds — so slots go by
    # verification need:
    #   1. the r4 VERDICT's named done-criteria queries (pii in-window,
    #      decontaminate/audio_fingerprint_dedup/image_metadata still
    #      hash-green after their r5 rewrites, the all-types diagnostics
    #      sweep) plus the newest never-verified surfaces (WAP gate,
    #      MERGE/refs/meta, avro source) — these MUST have r5 evidence;
    #   2. 5 of the oldest past-window entries (named by the r4 VERDICT:
    #      not_null/in_set/regex/between/value_length, last driver
    #      evidence r02/r03) rotate back in;
    #   3. the remaining slots take r5-new queries oldest-evidence-first,
    #      preferring corpus-wide shuffle ops (line dedup, unigram LM)
    #      over trivially-arithmetic map screens when forced to choose.
    #   Past the window: the r5-new queries that didn't fit (all verified
    #   by the full local replay, tools/check_entry.py — latest full
    #   replay this session: 126 hash-OK + 2 rows-only-by-design,
    #   0 failures across all 128), r4-verified entries sitting out one
    #   round, entries
    #   subsumed by an in-window query (ann_* oracles embed cosine_topk;
    #   kl/psi/ks share the drift/stat-test paths; referential_custkey is
    #   the unsalted variant), and the two rows-only-by-design entries
    #   (minhash/simhash — xxhash64 seeds not SQL-expressible; pinned by
    #   pytest recall/determinism tests).
    return {
        # -- tier 1a: never-verified new surfaces + VERDICT done-criteria --
        # (stupid_backoff is the newest op; it subsumes the unigram LM's
        # tokenization and scoring-pass shape, so unigram_logprob yields
        # its #50 slot to stay within the window)
        "stupid_backoff_documents": q_stupid_backoff_documents,
        "dsir_documents": q_dsir_documents,
        "iceberg_hidden_partitioning": q_iceberg_hidden_partitioning,
        "iceberg_spec_evolution": q_iceberg_spec_evolution,
        "iceberg_changelog": q_iceberg_changelog,
        "avro_source_orders": q_avro_source_orders,
        "iceberg_wap_audit": q_iceberg_wap_audit,
        "iceberg_merge_refs": q_iceberg_merge_refs,
        "pii_documents": q_pii_documents,
        "semdedup_embeddings": q_semdedup_embeddings,
        "iceberg_maintenance": q_iceberg_maintenance,
        "image_metadata_violations": q_image_metadata_violations,
        "decontaminate_documents": q_decontaminate_documents,
        "audio_fingerprint_dedup": q_audio_fingerprint_dedup,
        "expectation_diagnostics": q_expectation_diagnostics,
        "cramers_phi_orders": q_cramers_phi_orders,
        # -- tier 1b: new in r5, never driver-verified --
        "oov_stats_documents": q_oov_stats_documents,
        "audio_qa_fused": q_audio_qa_fused,
        "audio_repair_pipeline": q_audio_repair_pipeline,
        "audio_pack_resample": q_audio_pack_resample,
        "audio_denoise": q_audio_denoise,
        "audio_declick": q_audio_declick,
        "audio_cmvn": q_audio_cmvn,
        "audio_specaugment": q_audio_specaugment,
        "audio_pack_stratified": q_audio_pack_stratified,
        "audio_tempo_stretch": q_audio_tempo_stretch,
        "audio_pack_training_windows": q_audio_pack_training_windows,
        # -- tier 2: rotated back in (the 5 oldest, named by the r4
        # VERDICT; the other 5 of its '5-10' band lost their slots to
        # never-verified r5 queries and rotate in r6) --
        "not_null_orders_custkey": q_not_null_orders_custkey,
        "in_set_returnflag": q_in_set_returnflag,
        "regex_event_type": q_regex_event_type,
        # -- tier 3: new in r5, never driver-verified (continued) --
        "audio_reverb_echo": q_audio_reverb_echo,
        "audio_hum_repair": q_audio_hum_repair,
        "audio_electrical_violations": q_audio_electrical_violations,
        "audio_channel_stats": q_audio_channel_stats,
        "audio_f32_transcode": q_audio_f32_transcode,
        "audio_declip_repair": q_audio_declip_repair,
        "transcript_wer_documents": q_transcript_wer_documents,
        "dedup_spans_documents": q_dedup_spans_documents,
        "audio_loudness_bands": q_audio_loudness_bands,
        "audio_pitch_violations": q_audio_pitch_violations,
        "chunk_documents": q_chunk_documents,
        "audio_adpcm_roundtrip": q_audio_adpcm_roundtrip,
        "audio_spectral_features": q_audio_spectral_features,
        "audio_pitch_features": q_audio_pitch_features,
        "audio_augment_pipeline": q_audio_augment_pipeline,
        "bloom_blocklist_documents": q_bloom_blocklist,
        "audio_mfcc_features": q_audio_mfcc_features,
        "tfidf_documents": q_tfidf_documents,
        "speaking_rate_violations": q_speaking_rate_violations,
        "edit_distance_documents": q_edit_distance_documents,
        # ---- driver window ends here (entry #50) ----
        # audio_mel_features yielded its slot to the maintenance query:
        # the log-mel front end stays exercised in-window through
        # audio_mfcc_features (MFCC = DCT over the same log-mel path)
        "audio_mel_features": q_audio_mel_features,
        # audio_speed_perturb, audio_augment_noise, and audio_resample
        # yielded their slots to the changelog/semdedup/cramers-phi
        # queries: all three ops stay exercised in-window via
        # audio_augment_pipeline (which chains noise + resample + stretch
        # and pins bit-identity to the chained ops)
        "audio_speed_perturb": q_audio_speed_perturb,
        "audio_augment_noise": q_audio_augment_noise,
        "audio_resample": q_audio_resample,
        # line_dedup yielded its slot to the never-driver-verified
        # spec-evolution query (line_dedup stays local-replay-verified;
        # its winners-join shape is also exercised by dedup_spans in-window)
        "line_dedup_documents": q_line_dedup_documents,
        # unigram_logprob yielded its slot to stupid_backoff (same
        # tokenization + scoring-pass shape, strictly more machinery)
        "unigram_logprob_documents": q_unigram_logprob_documents,
        # value_length_name rotates back out (driver evidence r02/r03 +
        # this round's local replay) to keep dsir in-window
        "value_length_name": q_value_length_name,
        # between_quantity likewise yields its slot to the
        # never-driver-verified hidden-partitioning query
        "between_quantity": q_between_quantity,
        # -- past the window: r5-new queries that didn't fit (verified by
        # the full local replay this session; simple-arithmetic screens
        # pad_trim/payload_size and the segment/gain/transcode/ngram
        # family yielded their slots) --
        "audio_pad_trim": q_audio_pad_trim,
        "audio_payload_size": q_audio_payload_size,
        "audio_segment_stats": q_audio_segment_stats,
        "audio_gain_normalize": q_audio_gain_normalize,
        "audio_transcode_roundtrip": q_audio_transcode_roundtrip,
        "ngram_counts_documents": q_ngram_counts_documents,
        # -- the other 5 of the VERDICT's rotation band (r2/r3-verified
        # map/agg one-liners; rotate in r6) --
        "mean_extendedprice": q_mean_extendedprice,
        "stdev_acctbal": q_stdev_acctbal,
        "minmax_sum_tax": q_minmax_sum_tax,
        "distinct_count_mktsegment": q_distinct_count_mktsegment,
        "value_counts_linestatus": q_value_counts_linestatus,
        # -- r4-verified heavy code paths sitting out one round --
        "audio_flac_violations": q_audio_flac_violations,
        "audio_opus_container_violations": q_audio_opus_container_violations,
        "video_mp4_container_violations": q_video_mp4_container_violations,
        "video_h264_sps_violations": q_video_h264_sps_violations,
        "iceberg_snapshot_reads": q_iceberg_snapshot_reads,
        "iceberg_add_files": q_iceberg_add_files,
        "iceberg_position_deletes": q_iceberg_position_deletes,
        "iceberg_schema_evolution": q_iceberg_schema_evolution,
        "iceberg_compaction": q_iceberg_compaction,
        "iceberg_equality_deletes": q_iceberg_equality_deletes,
        "iceberg_data_skipping": q_iceberg_data_skipping,
        "curation_pipeline_documents": q_curation_pipeline,
        "bpe_token_stats_documents": q_bpe_token_stats,
        "winnowing_fingerprints_documents": q_winnowing_fingerprints,
        "audio_features_banded": q_audio_features_banded,
        "audio_quality_violations": q_audio_quality_violations,
        "audio_trim_bounds": q_audio_trim_bounds,
        "streaming_cross_batch_dups": q_streaming_cross_batch_dups,
        "streaming_windowed_events": q_streaming_windowed_events,
        "repetition_stats_documents": q_repetition_stats_documents,
        "ann_lsh_embeddings": q_ann_lsh_embeddings,
        "ann_ivf_embeddings": q_ann_ivf_embeddings,
        "ann_pq_embeddings": q_ann_pq_embeddings,
        "ann_ivfpq_embeddings": q_ann_ivfpq_embeddings,
        # r4-verified, displaced by audio_payload_size + audio_mfcc +
        # bloom_blocklist (rotate back in r6):
        "unique_orderkey_orders": q_unique_orderkey_orders,
        "quantiles_totalprice": q_quantiles_totalprice,
        "histogram_quantity": q_histogram_quantity,
        # r4-verified drift/stat-test pair, displaced by the two newest r5
        # queries (tfidf, mel features); both hash-green in r04, rotate
        # back in r6:
        "kl_vs_profiled_baseline": q_kl_vs_profiled_baseline,
        "chisquare_mktsegment": q_chisquare_mktsegment,
        # r4-verified, sitting out one round (rotate back in r6); these
        # six slid out as the six new r5 queries (line dedup, unigram LM,
        # ngram counts, audio segmentation / gain / transcode) entered
        # tier 1 (all six evicted entries r4 hash-green, evidence <= 1
        # round old):
        "json_props_parseable": q_json_props_parseable,
        "row_condition_filtered_mean": q_row_condition_filtered_mean,
        "referential_salted_custkey": q_referential_salted_custkey,
        "image_png_violations": q_image_png_violations,
        "dedup_clusters_documents": q_dedup_clusters_documents,
        "group_cap_documents": q_group_cap_documents,
        "row_count_lineitem": q_row_count_lineitem,
        "compound_unique_lineitem": q_compound_unique_lineitem,
        "pair_ship_after_order": q_pair_ship_after_order,
        "dedup_exact_documents": q_dedup_exact_documents,
        "token_stats_documents": q_token_stats_documents,
        "quality_documents": q_quality_documents,
        "lang_distribution_documents": q_lang_distribution_documents,
        "bpe_tokenize_documents": q_bpe_tokenize_documents,
        "word_jaccard_documents": q_word_jaccard_documents,
        "cosine_near_dups_embeddings": q_cosine_near_dups_embeddings,
        "embedding_dedup_clusters": q_embedding_dedup_clusters,
        # r02/r03-verified, subsumed or shared-code-path (see note):
        "token_shards_documents": q_token_shards_documents,
        "hash_split_documents": q_hash_split_documents,
        "cosine_topk_embeddings": q_cosine_topk_embeddings,
        "kl_quantity_uniform": q_kl_quantity_uniform,
        "psi_quantity_uniform": q_psi_quantity_uniform,
        "ks_stat_uniform_quantity": q_ks_stat_uniform_quantity,
        "referential_custkey": q_referential_custkey,
        "fingerprint_documents": q_fingerprint_documents,
        "mixture_sample_documents": q_mixture_sample_documents,
        "most_common_linestatus": q_most_common_linestatus,
        "multicol_sum_10": q_multicol_sum_10,
        # rows-only by design (no SQL oracle):
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_documents": q_simhash_documents,
    }


_STOPWORDS_SQL = "['the','a','and','of','to','in','is']"

# Shared oracle for the four ann_* queries: the deterministic EXACT top-10
# by cosine (identical to the cosine_topk oracle) plus recall_ok=TRUE —
# the Spark side computes recall_ok for real against its ANN shortlist.
_ANN_EXACT_RECALL_SQL = (
    "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) "
    "SELECT vec_id, ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine, TRUE AS recall_ok "
    "FROM embeddings e, q "
    "ORDER BY list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv, q.qv))) DESC, vec_id ASC LIMIT 10"
)

# BPE merge table trained by ops.train_bpe_merges(documents@sf0.01, n=300,
# seed=42) — the training stopped at 143 merges (pair-frequency cutoff).
# Committed as a literal so the DuckDB oracle can APPLY the merges
# independently (a recursive CTE below); the Spark side still TRAINS at
# runtime, so any training drift vs this table hash-mismatches.  Valid for
# the driver's sf0.01 correctness corpus only (deterministic: the sf0.01
# vocabulary is under the trainer's 20k sample cap, so no sampling fires).
_BPE_MERGES_SF0_01 = [
    (' ', 's'), ('e', 'r'), ('e', '</w>'), ('n', '</w>'), ('er', '</w>'),
    ('w', '</w>'), ('o', 'w</w>'), ('o', 'r'), ('t', '</w>'), ('h',
    '</w>'), ('a', 't'), ('l', 'u'), (' ', 'c'), ('a', 's'), ('i', 'n'),
    ('a', '</w>'), (' ', 'b'), (' ', 'v'), ('g', '</w>'), ('y', '</w>'),
    ('p', 'a'), ('pa', 'r'), (' ', 'f'), (' ', 't'), ('o', 'i'), ('oi',
    'n</w>'), ('j', 'oin</w>'), ('h', 'as'), ('has', 'h</w>'), (' ',
    'join</w>'), ('s', 't'), ('r', 'ow</w>'), ('c', 'h</w>'), ('at',
    'ch</w>'), ('c', 'a'), ('ca', 'n</w>'), ('u', 'st'), ('ust', 'o'),
    ('usto', 'm'), ('ustom', 'er</w>'), ('o', 'lu'), ('olu', 'm'),
    ('olum', 'n</w>'), ('t', 'er</w>'), ('l', 'ter</w>'), ('i',
    'lter</w>'), (' ', 'hash</w>'), ('m', 'a'), ('ma', 'l'), ('mal', 'l'),
    ('mall', '</w>'), (' ', 'row</w>'), (' s', 'can</w>'), ('m', 'er'),
    ('mer', 'g'), ('merg', 'e</w>'), ('l', 'ow</w>'), (' s', 'mall</w>'),
    (' ', 'd'), (' b', 'atch</w>'), (' c', 'olumn</w>'), (' f',
    'ilter</w>'), ('t', 'or'), ('tor', '</w>'), ('or', 'd'), ('ord',
    'er</w>'), ('e', 'c'), ('ec', 'tor</w>'), (' c', 'ustomer</w>'), ('l',
    'in'), ('lin', 'e</w>'), ('l', 'e</w>'), ('b', 'le</w>'), ('at',
    'a</w>'), ('a', 'ble</w>'), ('u', 'p'), ('up', '</w>'), (' s',
    'low</w>'), ('g', 'g</w>'), ('a', 'gg</w>'), (' v', 'ector</w>'),
    (' ', 'order</w>'), ('lu', 'e</w>'), ('a', 'lue</w>'), (' ',
    'merge</w>'), ('k', 'e'), ('ke', 'y</w>'), (' ', 'line</w>'), (' d',
    'ata</w>'), ('r', 'e'), ('re', 'a'), ('rea', 'm'), ('ream', '</w>'),
    (' ', 'agg</w>'), (' t', 'able</w>'), ('w', 'in'), ('win', 'd'),
    ('wind', 'ow</w>'), (' v', 'alue</w>'), ('par', 'k'), ('park',
    '</w>'), ('r', 'o'), ('ro', 'up</w>'), ('par', 't</w>'), ('g',
    'roup</w>'), ('t', 'ream</w>'), (' s', 'tream</w>'), ('i', 'g</w>'),
    ('or', 't</w>'), ('u', 'er'), ('uer', 'y</w>'), ('q', 'uery</w>'),
    (' b', 'ig</w>'), (' s', 'park</w>'), (' ', 'key</w>'), (' ',
    'window</w>'), (' ', 'part</w>'), (' ', 'group</w>'), (' ', 'a</w>'),
    (' s', 'ort</w>'), (' ', 'query</w>'), ('as', 't</w>'), (' f',
    'ast</w>'), ('h', 'e</w>'), (' t', 'he</w>'), (' d', 'up</w>'), ('t',
    'he</w>'), ('c', 'ustomer</w>'), ('t', 'able</w>'), ('b', 'atch</w>'),
    ('f', 'ilter</w>'), ('c', 'olumn</w>'), ('s', 'low</w>'), ('s',
    'can</w>'), ('d', 'ata</w>'), ('v', 'ector</w>'), ('s', 'ort</w>'),
    ('v', 'alue</w>'), ('f', 'ast</w>'), ('st', 'ream</w>'), ('s',
    'park</w>'), ('s', 'mall</w>'), ('b', 'ig</w>')]


def _bpe_oracle_sql() -> str:
    """DuckDB oracle for bpe_tokenize_documents: pretokenize with the RE2
    twin of ops.BPE_PY_PATTERN (equivalent on the printable-ASCII sf0.01
    corpus — \\w/\\d/\\s agree between RE2 and Python re on ASCII), then
    apply the committed merge table with a recursive CTE that walks the
    ranks in order with a per-rank replace-all fixpoint over
    chr(31)-delimited symbol strings.  Rank-order + fixpoint is provably
    identical to the greedy min-rank loop in ops._bpe_encode_word: a merge
    learned at rank k can only create symbols whose pairs were learned
    AFTER k, so no lower-rank pair ever (re)appears once rank k is
    processed (verified exhaustively over the corpus vocabulary in
    tests/test_bpe.py::test_rank_order_fixpoint_equivalence)."""
    from gx_spark.ops import BPE_PY_PATTERN

    def esc(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(
        f"({i + 1}, '{esc(a)}', '{esc(b)}')"
        for i, (a, b) in enumerate(_BPE_MERGES_SF0_01))
    return f"""
WITH RECURSIVE
merges AS (
  SELECT m.rank, chr(31) || m.a || chr(31) || m.b || chr(31) AS pat,
         chr(31) || m.a || m.b || chr(31) AS rep
  FROM (VALUES {vals}) m(rank, a, b)
),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{esc(BPE_PY_PATTERN)}')) AS w
  FROM documents
),
uw AS (SELECT DISTINCT w FROM toks),
enc(w, s, r) AS (
  SELECT w,
         chr(31) || array_to_string(str_split(w, ''), chr(31))
           || chr(31) || '</w>' || chr(31), 1
  FROM uw
  UNION ALL
  SELECT e.w,
         CASE WHEN position(m.pat IN e.s) > 0
              THEN replace(e.s, m.pat, m.rep) ELSE e.s END,
         CASE WHEN position(m.pat IN e.s) > 0 THEN e.r ELSE e.r + 1 END
  FROM enc e JOIN merges m ON m.rank = e.r
),
wtok AS (
  SELECT w, len(str_split(trim(s, chr(31)), chr(31)))::BIGINT AS n_tok
  FROM enc WHERE r = (SELECT max(rank) FROM merges) + 1
),
perdoc AS (
  SELECT t.doc_id, SUM(wt.n_tok)::BIGINT AS n_bpe_tokens
  FROM toks t JOIN wtok wt ON t.w = wt.w GROUP BY 1
)
SELECT d.doc_id, COALESCE(p.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens,
       TRUE AS reconstruction_ok
FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
"""

def _diagnostics_oracle_sql() -> str:
    """Expected gallery table: every type in the registry (the name list
    is the only shared input — a static sorted snapshot of what is
    registered) must report examples_ok=TRUE and success=TRUE.  The Spark
    side re-derives both flags by EXECUTING each type's example suites
    through validate(), so a regression in any expectation — or a type
    registered without gallery coverage — breaks the hash."""
    from gx_spark.registry import list_expectations

    values = ", ".join(
        f"('{name}', true, true)" for name in list_expectations())
    return (f"SELECT * FROM (VALUES {values}) "
            "AS t(expectation_type, examples_ok, success)")


def _pii_oracle_sql() -> str:
    """DuckDB oracle for pii_documents: the identical deterministic plant,
    RE2 twins of ops.PII_PATTERNS (patterns restricted to the
    Java-regex/RE2-common subset by construction), counts via
    len(regexp_extract_all(...)), redaction via chained global
    regexp_replace in ops._PII_REDACT_ORDER."""
    from gx_spark.ops import _PII_REDACT_ORDER, PII_PATTERNS

    def cnt(expr: str, name: str) -> str:
        return (f"len(regexp_extract_all({expr}, "
                f"'{PII_PATTERNS[name]}'))::BIGINT")

    red = "text"
    for name in _PII_REDACT_ORDER:
        red = (f"regexp_replace({red}, '{PII_PATTERNS[name]}', "
               f"'[PII]', 'g')")
    total = " + ".join(cnt("text", n) for n in PII_PATTERNS)
    resid = " + ".join(cnt("clean", n) for n in PII_PATTERNS)
    class_cols = ",\n  ".join(
        f"{cnt('text', n)} AS n_{n}" for n in PII_PATTERNS)
    return f"""
WITH planted AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 7 = 3
         THEN ' contact user' || doc_id::VARCHAR || '@example.com'
         ELSE '' END
    || CASE WHEN doc_id % 11 = 5
         THEN ' call 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
         ELSE '' END
    || CASE WHEN doc_id % 13 = 2
         THEN ' from 10.0.' || (doc_id % 200)::VARCHAR || '.7'
         ELSE '' END
    || CASE WHEN doc_id % 17 = 11
         THEN ' card 4111 1111 1111 1111'
         ELSE '' END AS text
  FROM documents
),
red AS (SELECT doc_id, text, {red} AS clean FROM planted)
SELECT doc_id,
  {class_cols},
  ({total})::BIGINT AS n_pii,
  (({total}) > 0) AS has_pii,
  ({resid})::BIGINT AS residual_pii,
  length(clean)::BIGINT AS clean_len
FROM red
"""


_LANG_CASE_SQL = """
    CASE
      WHEN regexp_matches(lower(text), '[一-鿿]') THEN 'zh'
      WHEN regexp_matches(lower(text), '(^| )(und|der|nicht)( |$)') THEN 'de'
      WHEN regexp_matches(lower(text), '(^| )(et|le|les)( |$)') THEN 'fr'
      WHEN regexp_matches(lower(text), '(^| )(el|los|una)( |$)') THEN 'es'
      WHEN regexp_matches(lower(text), '(^| )(the|and|of)( |$)') THEN 'en'
      ELSE 'other'
    END
"""


def oracle_sql() -> dict[str, str]:
    mel_dom = " ".join(
        f"WHEN {i} THEN {v}" for i, v in enumerate(_MEL_CLASS_DOM))
    return {
        "audio_qa_fused": (
            # grid arithmetic restated: 1 s at 16 kHz -> 7 gated
            # loudness blocks (400/100 ms) and 49 pitch frames
            # (40/20 ms); probe attribution from doc_id%3; pitch and
            # loudness invariants pinned all-true
            "SELECT doc_id, CAST(7 AS BIGINT) AS n_blocks, "
            "CAST(49 AS BIGINT) AS n_frames, "
            "doc_id % 3 = 1 AS dc_hit, doc_id % 3 = 2 AS hum_hit, "
            "true AS pitch_ok, true AS lufs_ok "
            "FROM documents WHERE doc_id < 180"
        ),
        "audio_repair_pipeline": (
            # defect-class arithmetic restated: doc_id%4 selects the
            # single planted defect; each stage fixes exactly its own
            # class, clean clips keep the ORIGINAL flac bytes
            "SELECT doc_id, doc_id % 4 = 1 AS dc_fixed, "
            "doc_id % 4 = 2 AS clip_fixed, "
            "CAST(CASE WHEN doc_id % 4 = 3 THEN 3 ELSE 0 END AS BIGINT) "
            "AS n_clicks, "
            "CASE WHEN doc_id % 4 = 0 THEN 'flac' ELSE 'pcm_s16le' END "
            "AS codec "
            "FROM documents WHERE doc_id < 200"
        ),
        "audio_pack_resample": (
            # packing + resample arithmetic restated: 4 consecutive ids
            # per bin, every member exactly 4800 samples at 16 kHz after
            # resample (300 ms at either source rate), 19200 = 1200 ms
            "SELECT doc_id // 4 AS bin, CAST(4 AS INT) AS n_clips, "
            "CAST(0 AS INT) AS n_bad, CAST(16000 AS INT) AS sr_hz, "
            "CAST(19200 AS BIGINT) AS total_samples, "
            "CAST(1200 AS INT) AS dur_ms, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
            "AS clip_ids "
            "FROM documents WHERE doc_id < 240 GROUP BY doc_id // 4"
        ),
        "audio_denoise": (
            # suppression invariants re-measured from the payloads
            # through the features decode: -30.5 dBFS gap noise is not
            # silence before (< 0.05) and is after (gap fraction band),
            # length preserved exactly; pinned all-true per doc_id
            "SELECT doc_id, true AS len_ok, true AS gaps_loud_before, "
            "true AS gaps_silent_after "
            "FROM documents WHERE doc_id < 160"
        ),
        "audio_declick": (
            # click counts restated from doc_id arithmetic (doc_id%5
            # injected impulses, all found, none invented); length and
            # rail-free invariants re-measured from the repaired
            # payload, pinned all-true
            "SELECT doc_id, CAST(doc_id % 5 AS BIGINT) AS n_clicks, "
            "true AS len_ok, true AS impulses_gone "
            "FROM documents WHERE doc_id < 200"
        ),
        "audio_cmvn": (
            # frame arithmetic restated: 200 clips x (1+(8000-400)//160)
            # = 48 frames = 9600 per band, normalization invariants
            # pinned all-true for every one of the 26 HTK bands
            "SELECT CAST(i AS INT) AS band, "
            "CAST(9600 AS BIGINT) AS n_frames, true AS mean_ok, "
            "true AS std_ok FROM generate_series(0, 25) t(i)"
        ),
        "audio_specaugment": (
            # frame arithmetic restated: 1 s at 16 kHz, 25/10 ms
            # windows -> 1 + (16000-400)//160 = 98 frames, 26 HTK
            # bands; mask bookkeeping invariants recounted in-Spark
            # from the emitted matrix, pinned all-true
            "SELECT doc_id, CAST(98 AS BIGINT) AS n_frames, "
            "CAST(26 AS INT) AS n_mels, true AS frames_ok, "
            "true AS bands_ok, true AS frac_ok, true AS caps_ok "
            "FROM documents WHERE doc_id < 200"
        ),
        "audio_pack_stratified": (
            # per-stratum packing restated from doc_id arithmetic:
            # stratum = rate by parity, position within stratum =
            # doc_id div 2, bin = position div 4 (300 ms into 1200 ms),
            # ids/transcripts agg'd in doc_id order; 120 clips per
            # stratum -> 30 full bins of 4, total = 4 * sr * 3/10
            "SELECT CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 "
            "END AS VARCHAR) AS stratum, "
            "(doc_id // 2) // 4 AS bin, CAST(4 AS INT) AS n_clips, "
            "CAST(0 AS INT) AS n_bad, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END "
            "AS INT) AS sr_hz, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 19200 ELSE 9600 END "
            "AS BIGINT) AS total_samples, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
            "AS clip_ids, "
            "string_agg('w' || CAST(doc_id AS VARCHAR), ' ' "
            "ORDER BY doc_id) AS transcript "
            "FROM documents WHERE doc_id < 240 "
            "GROUP BY doc_id % 2, (doc_id // 2) // 4"
        ),
        "audio_tempo_stretch": (
            # WSOLA invariants restated per doc_id: exact 4800/1.25 =
            # 3840-sample / 240 ms output, pitch and RMS preserved (the
            # booleans are re-measured in-Spark from the stretched
            # payload; the oracle pins them all-true with the exact
            # sample count as a VALUE)
            "SELECT doc_id, CAST(3840 AS BIGINT) AS n_samples, "
            "CAST(240 AS INT) AS dur_ms, true AS pitch_ok, "
            "true AS rms_ok FROM documents WHERE doc_id < 200"
        ),
        "audio_pack_training_windows": (
            # packing restated from doc_id arithmetic: consecutive ids
            # pack 4-per-bin (300 ms into a 1200 ms budget), 100 ms
            # separators make 24000 samples = 1500 ms; clip_ids preserve
            # global id order within the bin
            "SELECT doc_id // 4 AS bin, CAST(4 AS INT) AS n_clips, "
            "CAST(0 AS INT) AS n_bad, CAST(16000 AS INT) AS sr_hz, "
            "CAST(24000 AS BIGINT) AS total_samples, "
            "CAST(1500 AS INT) AS dur_ms, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
            "AS clip_ids, true AS samples_ok "
            "FROM documents WHERE doc_id < 240 GROUP BY doc_id // 4"
        ),
        "audio_reverb_echo": (
            # doc_id arithmetic restated: even = identity passthrough
            # (ΔRMS 0), odd = +0.5 echo at 20 whole periods — power
            # ratio (800 + 2.25*4000)/4800 = +3.098 dB → band 3.1;
            # duration always preserved
            "SELECT doc_id, true AS passthrough_ok, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 0.0 ELSE "
            "round(10*log10((800 + 2.25*4000)/4800.0), 1) END AS DOUBLE) "
            "AS drms_band, true AS n_ok "
            "FROM documents WHERE doc_id < 300"
        ),
        "audio_hum_repair": (
            # doc_id arithmetic restated: hum classes 1/2 measure ratio
            # 0.2 and repair to pcm_s16le hum-free, class 0 is a byte
            # passthrough; the notch surgically removes only the hum, so
            # every row's post RMS is the bare 0.3-amp tone's -13.5 dBFS
            "SELECT doc_id, (doc_id % 3 <> 0) AS was_hummy, "
            "CAST(CASE WHEN doc_id % 3 = 0 THEN 0.0 ELSE 0.2 END "
            "AS DOUBLE) AS ratio_band, true AS repaired_ok, "
            "CAST(-13.5 AS DOUBLE) AS rms_band "
            "FROM documents WHERE doc_id < 300"
        ),
        "audio_electrical_violations": (
            # class arithmetic restated: hum classes 1/2 break the 1%
            # hum gate at ratio 0.15^2/(0.15^2+0.3^2) = 0.2 (leakage-free
            # at integer cycles); class 3 breaks the 2% DC gate at 0.1;
            # class 0 is clean — bands are the engine-measured values
            # rounded to the closed form
            "SELECT doc_id, "
            "'expect_audio_hum_ratio_to_be_below' AS expectation_type, "
            "CAST(0.2 AS DOUBLE) AS band FROM documents "
            "WHERE doc_id < 400 AND doc_id % 4 IN (1, 2) "
            "UNION ALL SELECT doc_id, "
            "'expect_audio_dc_offset_to_be_below', CAST(0.1 AS DOUBLE) "
            "FROM documents WHERE doc_id < 400 AND doc_id % 4 = 3"
        ),
        "audio_channel_stats": (
            # doc_id arithmetic restated: class 0 mono (balance null →
            # -1), class 1 identical stereo channels (balance 0), class
            # 2 L/R amps 0.4/0.1 → 20*log10(4) = 12.0412 → band 12; the
            # downmix passthrough/re-encode facts and the preserved
            # frame count are engine-computed invariants pinned true
            "SELECT doc_id, "
            "CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS INT) "
            "AS n_channels, "
            "CAST(CASE doc_id % 3 WHEN 0 THEN -1 WHEN 1 THEN 0 "
            "ELSE 12 END AS INT) AS balance_band, "
            "true AS downmix_ok, true AS samples_ok "
            "FROM documents WHERE doc_id < 300"
        ),
        "audio_f32_transcode": (
            # float32 WAV carries int16 exactly (/32768 both ways):
            # identical sample count + bit-identical RMS is an invariant
            # of every row, as in the FLAC round trip
            "SELECT doc_id, true AS lossless_ok, "
            "'pcm_f32le' AS codec_out FROM documents WHERE doc_id < 300"
        ),
        "audio_declip_repair": (
            # doc_id arithmetic restated: classes 1 and 2 (amp 1.4 / 2.0)
            # carry rail runs, class 0 (amp 0.3) is clean; the exact rail
            # counts, post-repair rail-freedom, clean-bytes passthrough
            # and repaired-gain sign are invariants the engine computes
            # from the waveform and pins as booleans
            "SELECT doc_id, (doc_id % 3 <> 0) AS was_clipped, "
            "true AS n_clipped_ok, true AS rail_free, "
            "true AS passthrough_ok FROM documents WHERE doc_id < 300"
        ),
        "transcript_wer_documents": (
            # same md5(word:pos)%7 edit classes; word_edits = D+S by the
            # OOV-substitution argument (engine runs the real DP); char
            # distance via DuckDB's levenshtein on the same ASCII pair
            "WITH w AS (SELECT doc_id, string_split_regex(trim(text), "
            "'\\s+')[1:30] AS rw FROM documents), "
            "tok AS (SELECT doc_id, unnest(rw) AS word, "
            "generate_subscripts(rw, 1) AS i FROM w), "
            "cls AS (SELECT doc_id, i, word, "
            "CAST(('0x' || substr(md5(word || ':' || CAST(i AS VARCHAR)), "
            "1, 15)) AS BIGINT) % 7 AS h FROM tok), "
            "hyp AS (SELECT doc_id, COALESCE(string_agg(CASE WHEN h = 1 "
            "THEN word || '~' || CAST(i AS VARCHAR) ELSE word END, ' ' "
            "ORDER BY i) FILTER (WHERE h <> 0), '') AS hyp_text, "
            "count(*) FILTER (WHERE h = 0) AS d, "
            "count(*) FILTER (WHERE h = 1) AS s FROM cls GROUP BY doc_id), "
            "r AS (SELECT doc_id, array_to_string(rw, ' ') AS ref_text, "
            "len(rw) AS ref_words FROM w) "
            "SELECT r.doc_id, CAST(r.ref_words AS BIGINT) AS ref_words, "
            "CAST(d + s AS BIGINT) AS word_edits, "
            "round((d + s) / CAST(r.ref_words AS DOUBLE), 6) AS wer, "
            "CAST(length(ref_text) AS BIGINT) AS ref_chars, "
            "CAST(levenshtein(hyp_text, ref_text) AS BIGINT) AS char_edits, "
            "round(levenshtein(hyp_text, ref_text) / "
            "CAST(length(ref_text) AS DOUBLE), 6) AS cer "
            "FROM r JOIN hyp USING (doc_id)"
        ),
        "dedup_spans_documents": (
            # full relational recompute: same md5(8-gram) keys, the
            # line_dedup winner-encode trick (doc_id*1e9+pos), removal =
            # union of [pos, pos+8) over flagged occurrences, text
            # space-rejoined; all-removed docs yield NULL on both engines
            "WITH w AS (SELECT doc_id, string_split_regex(trim(text), "
            "'\\s+') AS words FROM documents), "
            "occ AS (SELECT doc_id, u.j AS pos, "
            "md5(array_to_string(words[u.j+1 : u.j+8], ' ')) AS g "
            "FROM w, UNNEST(range(0, len(words)-8+1)) AS u(j)), "
            "dups AS (SELECT g, min(doc_id*1000000000 + pos) AS wenc "
            "FROM occ GROUP BY g HAVING count(*) > 1), "
            "flagged AS (SELECT o.doc_id, o.pos FROM occ o JOIN dups d "
            "ON o.g = d.g WHERE o.doc_id*1000000000 + o.pos <> d.wenc), "
            "tok AS (SELECT doc_id, unnest(words) AS word, "
            "generate_subscripts(words, 1) - 1 AS idx FROM w), "
            "marked AS (SELECT t.doc_id, t.idx, t.word, EXISTS (SELECT 1 "
            "FROM flagged f WHERE f.doc_id = t.doc_id AND t.idx >= f.pos "
            "AND t.idx < f.pos + 8) AS cov FROM tok t), "
            "agg AS (SELECT doc_id, count(*) AS n_words, "
            "count(*) FILTER (WHERE cov) AS n_removed, "
            "string_agg(word, ' ' ORDER BY idx) FILTER (WHERE NOT cov) "
            "AS text_deduped FROM marked GROUP BY doc_id), "
            "fc AS (SELECT doc_id, count(*) AS n_dup_occurrences "
            "FROM flagged GROUP BY doc_id) "
            "SELECT a.doc_id, a.n_words, "
            "COALESCE(fc.n_dup_occurrences, 0) AS n_dup_occurrences, "
            "a.n_removed, a.text_deduped "
            "FROM agg a LEFT JOIN fc USING (doc_id)"
        ),
        "audio_loudness_bands": (
            # exact BS.1770 arithmetic: amplitude class = doc_id%5 (the
            # 997 Hz identity makes loudness a closed form, banded in
            # Spark from the MEASURED momentary max); block counts
            # 1+(n-6400)//1600 = 7 / 12; padded clips (doc_id%7==0) lose
            # their two all-silence blocks to the absolute gate; the
            # integrated invariant (closed form +- 0.3 LU unpadded,
            # straddler dilution window padded) is TRUE on every row
            "SELECT doc_id, CAST(doc_id % 5 AS INT) AS band, "
            "CASE WHEN doc_id % 7 = 0 THEN 12 ELSE 7 END AS n_blocks, "
            "(doc_id % 7 = 0) AS gated_lt_1, TRUE AS integrated_ok "
            "FROM documents WHERE doc_id < 400"
        ),
        "audio_pitch_violations": (
            # class arithmetic: doc_id%4==2 (noise) breaks the voiced
            # floor; doc_id%4==1 (420 Hz) breaks the [100,300] band and
            # the noise class is excluded there (null F0 median)
            "SELECT count(*) AS element_count, "
            "count(*) FILTER (WHERE doc_id % 4 = 2) AS voiced_unexpected, "
            "count(*) FILTER (WHERE doc_id % 4 = 1) AS pitch_unexpected "
            "FROM documents WHERE doc_id < 400"
        ),
        "bloom_blocklist_documents": (
            # full relational recompute of the Bloom probe: the position
            # set P = md5(term|seed) % 48 over the blocklist (the bitmap
            # is just P's dense form); token t flags iff all 3 of its
            # positions are in P — identical arithmetic, so the oracle
            # reproduces the engine's false positives exactly
            "WITH bl(term) AS (VALUES ('merge'),('vector'),('stream'),"
            "('quantile')), "
            "seeds(s) AS (VALUES (0),(1),(2)), "
            "pos AS (SELECT DISTINCT CAST(('0x' || substr(md5(term || '|' "
            "|| CAST(s AS VARCHAR)), 1, 15)) AS BIGINT) % 48 AS p "
            "FROM bl, seeds), "
            "toks AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id, "
            "unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w "
            "FROM documents) WHERE w <> ''), "
            "flagged AS (SELECT t.doc_id FROM toks t WHERE "
            "(SELECT count(*) FROM seeds s WHERE "
            "CAST(('0x' || substr(md5(t.w || '|' || CAST(s.s AS VARCHAR)), "
            "1, 15)) AS BIGINT) % 48 IN (SELECT p FROM pos)) = 3), "
            "counts AS (SELECT doc_id, CAST(count(*) AS INT) AS n "
            "FROM flagged GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(c.n, 0) AS n_flagged_tokens, "
            "COALESCE(c.n, 0) > 0 AS bloom_hit "
            "FROM documents d LEFT JOIN counts c ON d.doc_id = c.doc_id"
        ),
        "audio_mfcc_features": (
            # exact arithmetic (4800 samples, 28 frames, 13 cepstra) +
            # the committed per-class c0/c1/c2 literals; the ok booleans
            # are engine-side invariants the oracle pins true
            "SELECT doc_id, 4800 AS n_samples, 28 AS n_frames, "
            "13 AS n_mfcc, TRUE AS c0_ok, TRUE AS c1_ok, TRUE AS c2_ok "
            "FROM documents WHERE doc_id < 300"
        ),
        "audio_payload_size": (
            # pure class arithmetic: intact lengths are RIFF 44 + 2n|n
            # (n = 1600) and the committed FLAC literal 3253 (42-byte
            # header + verbatim frames, re-derived from live code in
            # tests/test_payload_size.py); classes 4-7 are the planted
            # violating set (truncations / inflated label); class 8
            # (null bytes) is missing-not-unexpected by the audio
            # family's denominator convention
            "SELECT doc_id, "
            "CAST(CASE doc_id % 9 WHEN 0 THEN 3244 WHEN 1 THEN 1644 "
            "WHEN 2 THEN 1644 WHEN 3 THEN 3253 WHEN 4 THEN 3237 "
            "WHEN 5 THEN 3244 WHEN 6 THEN 1643 WHEN 7 THEN 10 "
            "ELSE NULL END AS BIGINT) AS len_bytes, "
            "(doc_id % 9) IN (4, 5, 6, 7) AS is_violation "
            "FROM documents WHERE doc_id < 300"
        ),
        "tfidf_documents": (
            # full relational recompute of the sklearn smooth-idf score:
            # same lower/trim/\s+ tokens, df over distinct (doc, term),
            # N = docs with >=1 token, rank by (round(score,6) DESC,
            # term ASC) — the rounding-before-sort convention that makes
            # cross-engine ln() reproducible (unigram_logprob precedent)
            "WITH toks AS (SELECT doc_id, w FROM (SELECT doc_id, "
            "unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w "
            "FROM documents) WHERE w <> ''), "
            "tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM toks GROUP BY doc_id, w), "
            "dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS dfc "
            "FROM toks GROUP BY w), "
            "nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks), "
            "scored AS (SELECT tf.doc_id, tf.w AS term, tf.tf, "
            "ROUND(tf.tf * (LN((nd.n + 1.0) / (dfreq.dfc + 1.0)) + 1.0), 6) "
            "AS score FROM tf, dfreq, nd WHERE tf.w = dfreq.w), "
            "ranked AS (SELECT doc_id, term, tf, score, ROW_NUMBER() OVER ("
            "PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk "
            "FROM scored) "
            "SELECT doc_id, term, tf, score, CAST(rk AS INT) AS rank "
            "FROM ranked WHERE rk <= 5"
        ),
        "chunk_documents": (
            # identical window arithmetic in DuckDB list slicing:
            # stride 24, chunk 32, nc = 1 for n<=32 else ceil((n-32)/24)+1,
            # chunk i = tokens [i*24+1, i*24+32] (1-based inclusive);
            # md5 pins the exact chunk text
            "WITH toks AS (SELECT doc_id, list_filter("
            "string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w "
            "FROM documents), "
            "szd AS (SELECT doc_id, w, len(w) AS n FROM toks), "
            "cnt AS (SELECT doc_id, w, "
            "CASE WHEN n <= 0 THEN 0 WHEN n <= 32 THEN 1 "
            "ELSE CAST(CEIL((n - 32) / 24.0) AS INT) + 1 END AS nc "
            "FROM szd), "
            "e AS (SELECT doc_id, w, "
            "unnest(generate_series(0, nc - 1)) AS cid "
            "FROM cnt WHERE nc > 0) "
            "SELECT doc_id, CAST(cid AS INT) AS chunk_id, "
            "CAST(len(list_slice(w, cid*24 + 1, cid*24 + 32)) AS INT) "
            "AS n_tokens, "
            "md5(array_to_string(list_slice(w, cid*24 + 1, cid*24 + 32), "
            "' ')) AS chunk_md5 FROM e"
        ),
        "audio_adpcm_roundtrip": (
            # exact block arithmetic (4800 samples survive the fact-chunk
            # trim; ceil(4800/505) = 10 blocks x 256 B + 12+28+12+8 B of
            # RIFF/fmt/fact/data framing = 2620 B payload) + all-true
            # invariants from the real encode/decode round trip
            "SELECT doc_id, 4800 AS n_samples, 2620 AS payload_bytes, "
            "'adpcm_ima' AS codec_out, TRUE AS n_ok, TRUE AS rms_ok, "
            "TRUE AS dom_ok FROM documents WHERE doc_id < 300"
        ),
        "audio_spectral_features": (
            # exact arithmetic (300 ms @ 16 kHz: 4800 samples) + all-true
            # invariants the Spark side computes from the real Hann rFFT:
            # centroid/rolloff on the tone, tonal flatness, bandwidth
            # under the measured mu-law companding-noise envelope
            "SELECT doc_id, 4800 AS n_samples, TRUE AS cen_ok, "
            "TRUE AS bw_ok, TRUE AS roll_ok, TRUE AS flat_ok "
            "FROM documents WHERE doc_id < 300"
        ),
        "audio_pitch_features": (
            # exact arithmetic (4800 samples; 40/20 ms frames:
            # 1 + (4800-640)//320 = 14; every steady-tone frame voiced)
            # + all-true invariants from the real ACF tracker
            "SELECT doc_id, 4800 AS n_samples, 14 AS n_frames, "
            "CAST(1.0 AS DOUBLE) AS voiced_frac, TRUE AS f0_ok, "
            "TRUE AS per_ok FROM documents WHERE doc_id < 300"
        ),
        "audio_augment_pipeline": (
            # exact window arithmetic (400 ms @ 16 kHz after the fused
            # noise->speed->window chain: 6400 samples, pcm16 out) +
            # the all-true floor invariant (noise floor == clean RMS
            # - 20 dB to 1e-6, measured through the whole fused pass)
            "SELECT doc_id, 6400 AS n_samples, 'pcm_s16le' AS codec_out, "
            "TRUE AS floor_ok FROM documents WHERE doc_id < 300"
        ),
        "audio_mel_features": (
            # exact arithmetic (300 ms @ 16 kHz: 4800 samples; 25/10 ms
            # frames: 1 + (4800-400)//160 = 28) + the committed per-class
            # dominant-band literals; db_ok/dom_ok are engine-side
            # invariants the oracle pins true
            "SELECT doc_id, 4800 AS n_samples, 28 AS n_frames, "
            "26 AS n_mels, "
            f"CAST(CASE doc_id % 9 {mel_dom} END AS INT) AS dominant_mel, "
            "TRUE AS db_ok, TRUE AS dom_ok "
            "FROM documents WHERE doc_id < 300"
        ),
        "row_count_lineitem": "SELECT count(*)::BIGINT AS observed FROM lineitem",
        "not_null_orders_custkey": (
            "SELECT count(*)::BIGINT AS element_count, "
            "(count(*) - count(o_custkey))::BIGINT AS unexpected_count FROM orders"
        ),
        "unique_orderkey_orders": (
            "SELECT COALESCE(SUM(c), 0)::BIGINT AS unexpected_count FROM "
            "(SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1) t"
        ),
        "in_set_returnflag": (
            "SELECT count(l_returnflag)::BIGINT AS element_count, "
            "SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END)::BIGINT "
            "AS unexpected_count FROM lineitem"
        ),
        "regex_event_type": (
            "SELECT SUM(CASE WHEN NOT regexp_matches(event_type, '^[a-z]+$') "
            "THEN 1 ELSE 0 END)::BIGINT AS unexpected_count FROM events "
            "WHERE event_type IS NOT NULL"
        ),
        "between_quantity": (
            "SELECT SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)::BIGINT "
            "AS unexpected_count FROM lineitem WHERE l_quantity IS NOT NULL"
        ),
        "value_length_name": (
            "SELECT count(c_name)::BIGINT AS element_count, "
            "SUM(CASE WHEN length(c_name) < 5 OR length(c_name) > 25 THEN 1 ELSE 0 END)::BIGINT "
            "AS unexpected_count FROM customer"
        ),
        "mean_extendedprice": "SELECT ROUND(AVG(l_extendedprice), 6) AS mean_price FROM lineitem",
        "stdev_acctbal": "SELECT ROUND(STDDEV_SAMP(c_acctbal), 6) AS stdev FROM customer",
        "minmax_sum_tax": (
            "SELECT MIN(l_tax) AS min_tax, MAX(l_tax) AS max_tax, "
            "ROUND(SUM(l_tax), 6) AS sum_tax FROM lineitem"
        ),
        "distinct_count_mktsegment": (
            "SELECT COUNT(DISTINCT c_mktsegment)::BIGINT AS distinct_count FROM customer"
        ),
        "quantiles_totalprice": (
            "SELECT 0.25::DOUBLE AS quantile, ROUND(PERCENTILE_CONT(0.25) "
            "WITHIN GROUP (ORDER BY o_totalprice), 6) AS value FROM orders "
            "UNION ALL SELECT 0.5::DOUBLE, ROUND(PERCENTILE_CONT(0.5) "
            "WITHIN GROUP (ORDER BY o_totalprice), 6) FROM orders "
            "UNION ALL SELECT 0.75::DOUBLE, ROUND(PERCENTILE_CONT(0.75) "
            "WITHIN GROUP (ORDER BY o_totalprice), 6) FROM orders"
        ),
        "value_counts_linestatus": (
            "SELECT l_linestatus, count(*)::BIGINT AS cnt FROM lineitem GROUP BY l_linestatus"
        ),
        "most_common_linestatus": (
            "SELECT l_linestatus AS most_common FROM lineitem "
            "GROUP BY l_linestatus ORDER BY count(*) DESC, l_linestatus LIMIT 1"
        ),
        "pair_ship_after_order": (
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN NOT (l_shipdate > o_orderdate) THEN 1 ELSE 0 END)::BIGINT "
            "AS unexpected_count "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        ),
        "referential_custkey": (
            "SELECT count(*)::BIGINT AS unexpected_count FROM orders o "
            "LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
        ),
        "referential_salted_custkey": (
            "SELECT count(*)::BIGINT AS unexpected_count FROM orders o "
            "LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
        ),
        "compound_unique_lineitem": (
            "SELECT COALESCE(SUM(c), 0)::BIGINT AS unexpected_count FROM "
            "(SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber "
            "HAVING count(*) > 1) t"
        ),
        "multicol_sum_10": (
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN l_linenumber + (10 - l_linenumber) <> 10 THEN 1 ELSE 0 END)::BIGINT "
            "AS unexpected_count FROM lineitem"
        ),
        "histogram_quantity": (
            "SELECT CASE WHEN l_quantity >= 40 THEN 4 ELSE CAST(FLOOR(l_quantity / 10) AS INT) "
            "END AS bin_idx, count(*)::BIGINT AS cnt FROM lineitem "
            "WHERE l_quantity >= 0 AND l_quantity <= 50 GROUP BY 1"
        ),
        "kl_quantity_uniform": (
            "WITH h AS (SELECT CASE WHEN l_quantity >= 40 THEN 4 ELSE "
            "CAST(FLOOR(l_quantity / 10) AS INT) END AS b, count(*) AS c FROM lineitem "
            "WHERE l_quantity >= 0 AND l_quantity <= 50 GROUP BY 1), "
            "t AS (SELECT SUM(c) AS n FROM h) "
            "SELECT ROUND(SUM((c / n) * LN((c / n) / 0.2)), 6) AS kl FROM h, t"
        ),
        "kl_vs_profiled_baseline": (
            # same binning math as the Profiler: uniform edges
            # mn + (mx-mn)*i/5 over the even-orderkey baseline half, bin i =
            # [edge_i, edge_{i+1}) except last = [edge_4, mx]; KL(full||base)
            "WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx "
            "FROM lineitem WHERE l_orderkey % 2 = 0), "
            "assign AS (SELECT CASE "
            "WHEN l_quantity >= mn + (mx - mn) * 4 / 5 THEN 4 "
            "WHEN l_quantity >= mn + (mx - mn) * 3 / 5 THEN 3 "
            "WHEN l_quantity >= mn + (mx - mn) * 2 / 5 THEN 2 "
            "WHEN l_quantity >= mn + (mx - mn) * 1 / 5 THEN 1 ELSE 0 END AS b, "
            "(l_orderkey % 2 = 0) AS is_base FROM lineitem, mm "
            "WHERE l_quantity IS NOT NULL AND l_quantity >= mn AND l_quantity <= mx), "
            "q AS (SELECT b, count(*)::DOUBLE / (SUM(count(*)) OVER ()) AS w "
            "FROM assign WHERE is_base GROUP BY b), "
            "p AS (SELECT b, count(*)::DOUBLE / (SUM(count(*)) OVER ()) AS w "
            "FROM assign GROUP BY b) "
            "SELECT ROUND(SUM(p.w * LN(p.w / q.w)), 6) AS kl FROM p JOIN q USING (b)"
        ),
        "psi_quantity_uniform": (
            "WITH h AS (SELECT CASE WHEN l_quantity >= 40 THEN 4 ELSE "
            "CAST(FLOOR(l_quantity / 10) AS INT) END AS b, count(*) AS c FROM lineitem "
            "WHERE l_quantity >= 0 AND l_quantity <= 50 GROUP BY 1), "
            "t AS (SELECT SUM(c) AS n FROM h) "
            "SELECT ROUND(SUM((c / n - 0.2) * LN((c / n) / 0.2)), 6) AS psi FROM h, t"
        ),
        "json_props_parseable": (
            "SELECT SUM(CASE WHEN NOT json_valid(props) THEN 1 ELSE 0 END)::BIGINT "
            "AS unexpected_count FROM events WHERE props IS NOT NULL"
        ),
        "row_condition_filtered_mean": (
            "SELECT ROUND(AVG(l_quantity), 6) AS mean_qty FROM lineitem "
            "WHERE l_returnflag = 'A'"
        ),
        "dedup_exact_documents": (
            "SELECT SUM(c)::BIGINT AS n_rows, count(*)::BIGINT AS n_distinct, "
            "COALESCE(SUM(CASE WHEN c > 1 THEN c ELSE 0 END), 0)::BIGINT AS n_dup_rows, "
            "SUM(c - 1)::BIGINT AS n_removable "
            "FROM (SELECT count(*) AS c FROM documents GROUP BY text) t"
        ),
        "token_stats_documents": (
            "SELECT count(*)::BIGINT AS n_docs, "
            "SUM(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT AS total_tokens, "
            "ROUND(AVG(len(regexp_split_to_array(trim(text), '\\s+'))), 6) AS avg_tokens "
            "FROM documents"
        ),
        "quality_documents": (
            "SELECT doc_id, length(text)::BIGINT AS n_chars, "
            "len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens, "
            "ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))"
            " / GREATEST(length(text), 1), 6) AS punct_ratio, "
            "ROUND((length(text) - len(regexp_split_to_array(trim(text), '\\s+')) + 1)"
            " / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1), 6) AS avg_word_len, "
            "ROUND(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
            f"x -> list_contains({_STOPWORDS_SQL}, x)))"
            " / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1), 6) AS stopword_ratio "
            "FROM documents"
        ),
        "lang_distribution_documents": (
            f"SELECT {_LANG_CASE_SQL} AS pred_lang, count(*)::BIGINT AS n_docs "
            "FROM documents GROUP BY 1"
        ),
        "fingerprint_documents": (
            "SELECT doc_id, md5(text) AS fingerprint FROM documents"
        ),
        "cosine_topk_embeddings": (
            "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) "
            "SELECT vec_id, ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            "sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine "
            "FROM embeddings e, q "
            "ORDER BY list_dot_product(e.embedding::DOUBLE[], q.qv) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            "sqrt(list_dot_product(q.qv, q.qv))) DESC, vec_id ASC LIMIT 10"
        ),
        "image_metadata_violations": (
            # meta = width lies (7) + truncated (9); intensity = dark (5)
            # — every 5-row decodes (incl. the progressive-JPEG quarter)
            # and its mean lands below the 60 threshold
            "WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 500) "
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN doc_id % 10 IN (7, 9) THEN 1 ELSE 0 END)::BIGINT "
            "AS meta_unexpected, "
            "SUM(CASE WHEN doc_id % 10 = 5 THEN 1 ELSE 0 END)::BIGINT "
            "AS intensity_unexpected FROM d"
        ),
        "image_png_violations": (
            "WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 400) "
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN doc_id % 10 IN (3, 7, 9) THEN 1 ELSE 0 END)::BIGINT "
            "AS unexpected_count FROM d"
        ),
        "audio_flac_violations": (
            "WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 400) "
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN doc_id % 10 IN (7, 9) THEN 1 ELSE 0 END)::BIGINT "
            "AS meta_unexpected, "
            "SUM(CASE WHEN doc_id % 10 IN (5, 7) THEN 1 ELSE 0 END)::BIGINT "
            "AS snr_unexpected, "
            "SUM(CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END)::BIGINT "
            "AS transcript_unexpected FROM d"
        ),
        "audio_opus_container_violations": (
            # corruption arithmetic: classes 1/5/7/9 fail at the container
            # layer, class 3 fails ONLY at the RFC 6716 packet-framing
            # layer (pages/CRCs intact); SNR flags nothing (null for opus)
            "WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 400) "
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN doc_id % 10 IN (1, 3, 5, 7, 9) THEN 1 ELSE 0 "
            "END)::BIGINT AS meta_unexpected, "
            "0::BIGINT AS snr_unexpected FROM d"
        ),
        "video_mp4_container_violations": (
            "WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 400) "
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN doc_id % 10 IN (1, 5, 7, 9) THEN 1 ELSE 0 END)"
            "::BIGINT AS meta_unexpected FROM d"
        ),
        "video_h264_sps_violations": (
            # same corruption arithmetic as the mp4 query: classes 1/5/7/9
            # (junk, frame-count lie, SPS-dims lie, truncation) violate
            "WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 400) "
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN doc_id % 10 IN (1, 5, 7, 9) THEN 1 ELSE 0 END)"
            "::BIGINT AS meta_unexpected FROM d"
        ),
        "audio_features_banded": (
            "WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 400), "
            "b AS ("
            "SELECT 'rms_gain' AS metric, (doc_id % 5 + 1)::INT AS class, "
            "count(*)::BIGINT AS n FROM ids WHERE doc_id % 11 <> 0 GROUP BY 2 "
            "UNION ALL "
            "SELECT 'silence', (doc_id % 4)::INT, count(*)::BIGINT "
            "FROM ids GROUP BY 2 "
            "UNION ALL "
            "SELECT 'clipped', 1::INT, count(*)::BIGINT "
            "FROM ids WHERE doc_id % 11 = 0) "
            "SELECT * FROM b ORDER BY metric, class"
        ),
        "audio_quality_violations": (
            "WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 400) "
            "SELECT count(*)::BIGINT AS element_count, "
            "SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS clipping_unexpected, "
            "SUM(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END)::BIGINT "
            "AS silence_unexpected, "
            "0::BIGINT AS meta_unexpected FROM ids"
        ),
        "audio_trim_bounds": (
            "SELECT count(*)::BIGINT AS n, "
            "SUM((doc_id % 4) * 50)::BIGINT AS total_lead_ms, "
            "SUM((doc_id % 3) * 50)::BIGINT AS total_trail_ms, "
            "(count(*) * 400)::BIGINT AS total_active_ms "
            "FROM documents WHERE doc_id < 400"
        ),
        "audio_fingerprint_dedup": (
            "WITH g AS (SELECT doc_id % 120 AS k, count(*)::BIGINT AS c "
            "FROM documents WHERE doc_id < 300 GROUP BY 1) "
            "SELECT count(*)::BIGINT AS dup_groups, "
            "COALESCE(SUM(c), 0)::BIGINT AS dup_rows, "
            "SUM(CASE WHEN c >= 3 THEN 1 ELSE 0 END)::BIGINT AS groups_of_3 "
            "FROM g WHERE c >= 2"
        ),
        "iceberg_snapshot_reads": (
            "SELECT "
            "SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS snap1_count, "
            "count(*)::BIGINT AS current_count, "
            "SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT "
            "AS incremental_count, "
            "SUM(CASE WHEN o_orderkey % 4 = 1 THEN 1 ELSE 0 END)::BIGINT "
            "AS pruned_count, "
            "ROUND(SUM(CASE WHEN o_orderkey % 4 = 1 THEN o_totalprice END), 2) "
            "AS pruned_sum FROM orders"
        ),
        "iceberg_add_files": (
            "SELECT count(*)::BIGINT AS imported_count, "
            "ROUND(SUM(l_extendedprice), 2) AS imported_sum, "
            "(count(*) + SUM(CASE WHEN l_orderkey % 10 = 0 THEN 1 ELSE 0 END))"
            "::BIGINT AS after_append_count, "
            "count(*)::BIGINT AS travel_count, "
            "'add-files' AS import_op FROM lineitem"
        ),
        "iceberg_position_deletes": (
            "SELECT "
            "SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)::BIGINT "
            "AS remaining_count, "
            "ROUND(SUM(CASE WHEN o_orderstatus <> 'F' THEN o_totalprice END), 2) "
            "AS remaining_sum, "
            "count(*)::BIGINT AS before_count, "
            "SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT "
            "AS deleted_rows FROM orders"
        ),
        "iceberg_equality_deletes": (
            # equality delete removes ALL old rows with key%7==0; the
            # re-insert lands at a LATER sequence so it survives (strict
            # sequence scoping): total = non-deleted + re-inserted
            "SELECT count(*)::BIGINT AS total_count, "
            "SUM(CASE WHEN o_custkey % 7 = 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS reinserted_survivors, "
            "ROUND(SUM(o_totalprice), 2) AS total_sum FROM orders"
        ),
        "iceberg_compaction": (
            # post-compaction state == post-delete state; file count is
            # the rewrite target; time travel still sees every row
            "SELECT "
            "SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)::BIGINT "
            "AS compacted_count, "
            "ROUND(SUM(CASE WHEN o_orderstatus <> 'F' THEN o_totalprice "
            "END), 2) AS compacted_sum, "
            "1::BIGINT AS n_files, "
            "count(*)::BIGINT AS before_count FROM orders"
        ),
        "iceberg_schema_evolution": (
            "SELECT count(*)::BIGINT AS n, "
            "SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS era_nulls, "
            "ROUND(SUM(o_totalprice), 2) AS price_sum, "
            "ROUND(SUM(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END), 2) "
            "AS v2_price_sum FROM orders"
        ),
        "avro_source_orders": (
            # null codec + deflate shards carry the same rows; status is
            # nulled where orderkey%97==0; countDistinct skips nulls
            "SELECT count(*)::BIGINT AS n, "
            "ROUND(SUM(o_totalprice), 2) AS s, "
            "SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS null_status, "
            "COUNT(DISTINCT CASE WHEN o_orderkey % 97 <> 0 "
            "THEN o_orderstatus END)::BIGINT AS statuses, "
            "SUM(CASE WHEN o_custkey % 7 = 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS custkey_mod7 FROM orders"
        ),
        "iceberg_wap_audit": (
            # batches 1 and 3 publish (even then odd orderkeys → main
            # holds every order); the price-negated batch is rejected
            # whole (every odd price > 0, so every negated one violates
            # between[0,∞)); its tag froze batch1 + the bad stage = all
            # rows; log holds the two published snapshots; refs = main +
            # the rejected tag
            "SELECT 2::BIGINT AS published_batches, "
            "count(*)::BIGINT AS main_count, "
            "ROUND(SUM(o_totalprice), 2) AS main_sum, "
            "SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)::BIGINT "
            "AS rejected_rows, "
            "count(*)::BIGINT AS rejected_tag_count, "
            "2::BIGINT AS log_len, 2::BIGINT AS n_refs FROM orders"
        ),
        "iceberg_merge_refs": (
            # upsert re-prices custkey%3==0 rows (+1000) and inserts 7 new
            # rows summing to 100.5*28; the tag freezes the pre-merge
            # image; snapshots = append + merge (create_tag commits no
            # snapshot); refs = implicit main + v1; the eq-delete manifest
            # holds one key per SOURCE row (matched or not)
            "SELECT (count(*) + 7)::BIGINT AS merged_count, "
            "ROUND(SUM(CASE WHEN o_custkey % 3 = 0 THEN o_totalprice + 1000 "
            "ELSE o_totalprice END) + 2814.0, 2) AS merged_sum, "
            "7::BIGINT AS inserted_survivors, "
            "count(*)::BIGINT AS tag_count, "
            "ROUND(SUM(o_totalprice), 2) AS tag_sum, "
            "2::BIGINT AS n_snapshots, 2::BIGINT AS n_refs, "
            "(SUM(CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE 0 END) + 7)"
            "::BIGINT AS delete_records FROM orders"
        ),
        "expectation_diagnostics": _diagnostics_oracle_sql(),
        "curation_pipeline_documents": (
            "WITH d AS ("
            "  SELECT min(doc_id) AS doc_id, min(text) AS text, count(*) AS c"
            "  FROM documents GROUP BY md5(text)"
            "), f AS ("
            "  SELECT c,"
            "    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,"
            "    (CASE"
            "      WHEN regexp_matches(lower(text), '[一-鿿]') THEN 'zh'"
            "      WHEN regexp_matches(lower(text), '(^| )(und|der|nicht)( |$)') THEN 'de'"
            "      WHEN regexp_matches(lower(text), '(^| )(et|le|les)( |$)') THEN 'fr'"
            "      WHEN regexp_matches(lower(text), '(^| )(el|los|una)( |$)') THEN 'es'"
            "      WHEN regexp_matches(lower(text), '(^| )(the|and|of)( |$)') THEN 'en'"
            "      ELSE 'other' END) = 'en' AS lang_ok,"
            "    (len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 5 AND 1000"
            "     AND ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))"
            "         / GREATEST(length(text), 1), 6) <= 0.2"
            "     AND ROUND(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),"
            "         x -> list_contains(['the','a','and','of','to','in','is'], x)))"
            "         / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1), 6)"
            "         >= 0.01) AS quality_ok"
            "  FROM d)"
            "SELECT SUM(c)::BIGINT AS n_input,"
            " count(*)::BIGINT AS n_after_dedup,"
            " SUM(CASE WHEN lang_ok THEN 1 ELSE 0 END)::BIGINT AS n_after_lang,"
            " SUM(CASE WHEN lang_ok AND quality_ok THEN 1 ELSE 0 END)::BIGINT"
            " AS n_final,"
            " COALESCE(SUM(CASE WHEN lang_ok AND quality_ok THEN n_tokens END), 0)"
            "::BIGINT AS final_tokens FROM f"
        ),
        "bpe_token_stats_documents": (
            "WITH b AS (SELECT"
            "  len(regexp_extract_all(text,"
            "    '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+"
            "| ?[^\\s\\p{L}\\p{N}]+|\\s+')) AS bt,"
            "  len(regexp_split_to_array(trim(text), '\\s+')) AS wt"
            " FROM documents) "
            "SELECT count(*)::BIGINT AS n_docs,"
            " SUM(bt)::BIGINT AS total_bpe_tokens,"
            " ROUND(AVG(bt), 6) AS avg_bpe_tokens,"
            " MAX(bt)::BIGINT AS max_bpe_tokens,"
            " ROUND(SUM(bt) / SUM(wt), 6) AS bpe_per_word FROM b"
        ),
        "winnowing_fingerprints_documents": (
            "WITH d AS ("
            " SELECT doc_id AS id,"
            "  regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm"
            " FROM documents"
            " WHERE length(regexp_replace(lower(text), '\\s+', ' ', 'g')) >= 8"
            "), g0 AS ("
            " SELECT id, norm,"
            "  unnest(generate_series(1, length(norm) - 7)) AS pos FROM d"
            "), g AS ("
            " SELECT id, pos, md5(substr(norm, pos, 8)) AS h FROM g0"
            "), w AS ("
            " SELECT id, MIN(h) OVER (PARTITION BY id ORDER BY pos"
            "  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM g"
            "), fps AS (SELECT DISTINCT id, fp FROM w"
            "), dfr AS (SELECT fp, count(*) AS dfc FROM fps GROUP BY fp"
            "), kept AS ("
            " SELECT fps.id, fps.fp FROM fps JOIN dfr USING (fp)"
            " WHERE dfc <= 50"
            "), pairs AS ("
            " SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared"
            " FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id"
            " GROUP BY 1, 2 HAVING count(*) >= 3) "
            "SELECT (SELECT count(*) FROM fps)::BIGINT AS n_fingerprints,"
            " (SELECT count(DISTINCT id) FROM fps)::BIGINT"
            "  AS n_docs_fingerprinted,"
            " (SELECT count(*) FROM pairs)::BIGINT AS n_overlap_pairs,"
            " (SELECT COALESCE(SUM(shared), 0) FROM pairs)::BIGINT"
            "  AS total_shared"
        ),
        "streaming_windowed_events": (
            "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,"
            " count(*)::BIGINT AS n_rows,"
            " ROUND(AVG(value), 6) AS mean_value"
            " FROM events GROUP BY 1 ORDER BY 1"
        ),
        "streaming_cross_batch_dups": (
            "SELECT count(*)::BIGINT AS dup_groups,"
            " COALESCE(SUM(c), 0)::BIGINT AS dup_rows FROM"
            " (SELECT count(*) AS c FROM lineitem WHERE l_orderkey % 8 = 0"
            "  GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)"
        ),
        "iceberg_data_skipping": (
            "SELECT count(*)::BIGINT AS in_range_count,"
            " ROUND(SUM(o_totalprice), 2) AS in_range_sum,"
            " TRUE AS pruning_engaged"
            " FROM orders WHERE o_totalprice BETWEEN 50000.0 AND 100000.0"
        ),
        "word_jaccard_documents": (
            "WITH toks AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) "
            "WHERE w <> ''), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_int "
            "FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id) "
            "SELECT id_a, id_b, ROUND(n_int * 1.0 / (sa.n + sb.n - n_int), 6) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc_id = id_a "
            "JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE n_int * 1.0 / (sa.n + sb.n - n_int) >= 0.9"
        ),
        "dedup_clusters_documents": (
            # connected components over the 0.9-Jaccard pair graph via a
            # recursive reachability walk (min reachable id = component),
            # then canonical election by (length desc, id asc)
            "WITH RECURSIVE toks AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents) "
            "WHERE w <> ''), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_int "
            "FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2), "
            "pairs AS (SELECT id_a, id_b FROM inter "
            "JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE n_int * 1.0 / (sa.n + sb.n - n_int) >= 0.9), "
            "sym AS (SELECT id_a AS u, id_b AS v FROM pairs "
            "UNION ALL SELECT id_b, id_a FROM pairs), "
            "walk(node, comp) AS ("
            "SELECT u, u FROM (SELECT u FROM sym UNION SELECT v FROM sym) "
            "UNION "
            "SELECT s.v, w.comp FROM walk w JOIN sym s ON s.u = w.node), "
            "comp AS (SELECT node, min(comp) AS component FROM walk GROUP BY node) "
            "SELECT d.doc_id AS id, coalesce(c.component, d.doc_id) AS component, "
            "(row_number() OVER (PARTITION BY coalesce(c.component, d.doc_id) "
            "ORDER BY coalesce(length(d.text), -1) DESC, d.doc_id ASC) = 1) "
            "AS is_canonical "
            "FROM documents d LEFT JOIN comp c ON c.node = d.doc_id"
        ),
        "cosine_near_dups_embeddings": (
            "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
            "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * "
            "sqrt(list_dot_product(b.v, b.v))) AS cos "
            "FROM e a JOIN e b ON a.vec_id < b.vec_id) "
            "SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM p WHERE cos >= 0.4"
        ),
        "hash_split_documents": (
            "SELECT doc_id, CASE WHEN ('0x' || substr(md5('gx_split' || "
            "CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 100 "
            "THEN 'val' ELSE 'train' END AS split FROM documents"
        ),
        "group_cap_documents": (
            "SELECT doc_id, source, n_chars FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id ASC) <= 10"
        ),
        "decontaminate_documents": (
            # word 5-grams via 1-based inclusive list slices; range() is
            # end-exclusive so i runs 1..len-4 (= #5-grams); bench =
            # doc_id%10==7, train = the rest; LEFT JOIN keeps clean docs
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words "
            "FROM documents), "
            "g AS (SELECT doc_id, array_to_string(words[i:i+4], ' ') AS ngram "
            "FROM w, unnest(range(1, len(words)-5+2)) AS t(i) "
            "WHERE len(words) >= 5), "
            "bench AS (SELECT DISTINCT ngram FROM g WHERE doc_id % 10 = 7), "
            "tr AS (SELECT doc_id, ngram FROM g WHERE doc_id % 10 <> 7), "
            "tot AS (SELECT doc_id, CAST(count(DISTINCT ngram) AS BIGINT) "
            "AS n_ngrams FROM tr GROUP BY doc_id), "
            "hit AS (SELECT t.doc_id, CAST(count(DISTINCT t.ngram) AS BIGINT) "
            "AS n_hits FROM tr t JOIN bench USING (ngram) GROUP BY t.doc_id) "
            "SELECT tot.doc_id, tot.n_ngrams, "
            "CAST(coalesce(hit.n_hits, 0) AS BIGINT) AS n_hits, "
            "coalesce(hit.n_hits, 0) > 0 AS contaminated "
            "FROM tot LEFT JOIN hit USING (doc_id)"
        ),
        "audio_speed_perturb": (
            # resample-and-relabel arithmetic: n = round(4800/factor),
            # dur = round(n*1000/16000); pitch invariant computed in-Spark
            "SELECT doc_id, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 5333 ELSE 4364 END AS INT) "
            "AS n_samples, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 333 ELSE 273 END AS INT) "
            "AS dur_ms, 'pcm_s16le' AS codec_out, true AS pitch_ok "
            "FROM documents WHERE doc_id < 300"
        ),
        "audio_pad_trim": (
            # every class lands on the exact 300 ms window; the padded
            # class carries exactly 8/12 silent frames (invariant
            # computed in-Spark, pinned per doc)
            "SELECT doc_id, CAST(4800 AS INT) AS n_samples, "
            "CAST(300 AS INT) AS dur_ms, 'pcm_s16le' AS codec_out, "
            "true AS sil_ok FROM documents WHERE doc_id < 300"
        ),
        "audio_augment_noise": (
            # all-true invariant: floor/power arithmetic is computed
            # in-Spark from the real mix; the oracle pins it per doc
            "SELECT doc_id, true AS n_ok, true AS floor_ok, "
            "true AS power_ok FROM documents WHERE doc_id < 300"
        ),
        "audio_resample": (
            # exact 2:1 decimation arithmetic + all-true invariants the
            # Spark side computes from the real sinc resample: 4800
            # samples halve, duration and on-bin dominant survive, RMS
            # within 0.5 dB
            "SELECT doc_id, CAST(2400 AS INT) AS n_samples, "
            "CAST(8000 AS INT) AS sr_hz, CAST(300 AS INT) AS dur_ms, "
            "'pcm_s16le' AS codec_out, true AS rms_ok, true AS dom_ok "
            "FROM documents WHERE doc_id < 300"
        ),
        "edit_distance_documents": (
            # same candidate construction as word_jaccard (distinct
            # lower/trim/\s+ tokens, brute shared-token join — exact, the
            # engine's prefix filter is a pruning of the same set), then
            # full levenshtein with the band folded in as CASE > 150;
            # ASCII-only rows so byte-lev == codepoint-lev
            "WITH d AS (SELECT doc_id, text FROM documents "
            "WHERE length(text) = strlen(text)), "
            "toks AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w "
            "FROM d) WHERE w <> ''), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS n_int FROM toks a JOIN toks b "
            "ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "cand AS (SELECT id_a, id_b FROM inter "
            "JOIN sizes sa ON sa.doc_id = id_a "
            "JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE n_int * 1.0 / (sa.n + sb.n - n_int) >= 0.95), "
            "lev AS (SELECT id_a, id_b, "
            "CASE WHEN levenshtein(da.text, db.text) > 150 THEN -1 "
            "ELSE levenshtein(da.text, db.text) END AS dist, "
            "GREATEST(length(da.text), length(db.text)) AS mx "
            "FROM cand JOIN d da ON da.doc_id = id_a "
            "JOIN d db ON db.doc_id = id_b) "
            "SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist, "
            "CASE WHEN dist >= 0 AND mx > 0 THEN CAST(floor(1000.0 * "
            "(1.0 - dist / CAST(mx AS DOUBLE))) AS BIGINT) END AS sim_milli "
            "FROM lev"
        ),
        "speaking_rate_violations": (
            # identical dur plant + the engine's exact violation predicate
            # (dur<=0 OR cps outside [1,50]); cps mirrors the engine's IEEE
            # expression len / (dur/1000.0) so floor(cps*1000) is exact
            "WITH clips AS (SELECT doc_id, length(text) AS ln, "
            "CASE WHEN doc_id % 9 = 4 THEN length(text) * 10 "
            "WHEN doc_id % 9 = 7 THEN length(text) * 2000 "
            "WHEN doc_id % 9 = 2 THEN 0 "
            "ELSE length(text) * 67 END AS dur FROM documents) "
            "SELECT doc_id, "
            "'expect_speaking_rate_to_be_between' AS expectation_type, "
            "CASE WHEN dur > 0 THEN "
            "CAST(floor(ln / (dur / 1000.0) * 1000.0) AS BIGINT) "
            "END AS cps_milli FROM clips "
            "WHERE dur <= 0 OR ln / (dur / 1000.0) < 1.0 "
            "OR ln / (dur / 1000.0) > 50.0"
        ),
        "audio_transcode_roundtrip": (
            # FLAC is lossless over whatever the source decode produced
            # (including the already-companded G.711 rows): identical
            # sample count + bit-identical RMS is an invariant of every row
            "SELECT doc_id, true AS lossless_ok, 'flac' AS codec_out "
            "FROM documents WHERE doc_id < 300"
        ),
        "ngram_counts_documents": (
            # same gram construction as the engine: lower+trim+\s+ split,
            # empties dropped, 1-based inclusive 2-slices; ties at the
            # k-th count break by ngram ascending on both engines
            "WITH w AS (SELECT list_filter(string_split_regex("
            "lower(trim(text)), '\\s+'), x -> x <> '') AS words "
            "FROM documents), "
            "g AS (SELECT array_to_string(words[i:i+1], ' ') AS ngram "
            "FROM w, unnest(range(1, len(words))) t(i) "
            "WHERE len(words) >= 2) "
            "SELECT ngram, CAST(count(*) AS BIGINT) AS cnt FROM g "
            "GROUP BY ngram ORDER BY cnt DESC, ngram ASC LIMIT 50"
        ),
        "audio_gain_normalize": (
            # amplitude arithmetic: every class normalizes within 0.5 dB;
            # only amp 0.05 (doc_id%5==0, RMS -29 dBFS) is below the
            # -20 dBFS target (boundary amp = 0.1414), so it alone gains up
            "SELECT doc_id, true AS rms_ok, "
            "CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE -1 END AS INT) "
            "AS gain_sign FROM documents WHERE doc_id < 300"
        ),
        "audio_segment_stats": (
            # pure pad arithmetic: gap 0/100 ms merges (min_gap_ms=150,
            # merged span absorbs the gap), gap 200/300 splits
            "SELECT doc_id, "
            "CAST(CASE WHEN doc_id % 4 >= 2 THEN 2 ELSE 1 END AS INT) "
            "AS n_segments, "
            "CAST(CASE WHEN doc_id % 4 = 1 THEN 500 ELSE 400 END AS INT) "
            "AS speech_ms, "
            "CAST(CASE WHEN doc_id % 4 >= 2 THEN (doc_id % 4) * 100 "
            "ELSE 0 END AS INT) AS longest_gap_ms "
            "FROM documents WHERE doc_id < 300"
        ),
        "line_dedup_documents": (
            # reflow: stepped 1-based inclusive slices (i = 1, 9, 17, ...)
            # == the engine's sequence(1, size, 8) + slice(_w, i, 8);
            # line_no = (i-1)//8; winners keyed by min(doc_id, line_no)
            # encoded as doc_id*1e9+line_no (line_no < 1e9); reassembly
            # preserves original order and keeps all-dropped docs as ''
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws "
            "FROM documents), "
            "l AS (SELECT doc_id, "
            "CAST((len(ws) - 1) // 8 + 1 AS BIGINT) AS n_lines, "
            "CAST((i - 1) // 8 AS BIGINT) AS line_no, "
            "array_to_string(ws[i:i+7], ' ') AS line "
            "FROM w, unnest(range(1, len(ws) + 1, 8)) t(i)), "
            "win AS (SELECT line, min(doc_id * 1000000000 + line_no) AS fk "
            "FROM l WHERE len(trim(line)) >= 1 GROUP BY line), "
            "m AS (SELECT l.doc_id, l.n_lines, l.line_no, l.line, "
            "(win.fk IS NULL OR l.doc_id * 1000000000 + l.line_no = win.fk) "
            "AS kept FROM l LEFT JOIN win USING (line)) "
            "SELECT doc_id, max(n_lines) AS n_lines, "
            "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
            "coalesce(string_agg(line, chr(10) ORDER BY line_no) "
            "FILTER (WHERE kept), '') AS text "
            "FROM m GROUP BY doc_id"
        ),
        "oov_stats_documents": (
            # same normalization regex (RE2/Java common subset; DuckDB
            # needs the 'g' flag, Spark is global by default), same
            # corpus-lexicon rule (count >= 2), same 6dp rate; empty /
            # NULL docs preserved with 0 counts and NULL rate
            "WITH t AS (SELECT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split(trim(regexp_replace(lower(text), "
            "'[^a-z0-9'']+', ' ', 'g')), ' ')) AS w FROM documents) "
            "WHERE w <> ''), "
            "f AS (SELECT w FROM t GROUP BY w HAVING count(*) >= 2), "
            "s AS (SELECT t.doc_id, count(*) AS n_tokens, "
            "count(*) FILTER (WHERE f.w IS NULL) AS n_oov "
            "FROM t LEFT JOIN f ON t.w = f.w GROUP BY t.doc_id) "
            "SELECT d.doc_id, CAST(coalesce(s.n_tokens, 0) AS BIGINT) "
            "AS n_tokens, CAST(coalesce(s.n_oov, 0) AS BIGINT) AS n_oov, "
            "ROUND(s.n_oov / CAST(s.n_tokens AS DOUBLE), 6) AS oov_rate "
            "FROM documents d LEFT JOIN s USING (doc_id)"
        ),
        "iceberg_hidden_partitioning": (
            # pruning correctness reduces to plain relational figures:
            # if the bucket/truncate file pruning + residual re-pin
            # dropped or duplicated rows, these counts/sums diverge.
            # `pruned` is engine-verified and must come back TRUE.
            "WITH k AS (SELECT min(o_custkey) AS mk FROM orders) "
            "SELECT "
            "(SELECT count(*) FROM orders, k WHERE o_custkey = mk) "
            "AS cust_count, "
            "(SELECT ROUND(sum(o_totalprice), 2) FROM orders, k "
            "WHERE o_custkey = mk) AS cust_sum, "
            "(SELECT count(*) FROM orders "
            "WHERE o_orderpriority = '2-HIGH') AS prio_count, "
            "(SELECT count(*) FROM orders) AS total_count, "
            "TRUE AS pruned"
        ),
        "iceberg_spec_evolution": (
            # mixed-spec read exactness reduces to plain relational
            # figures over the SAME rows the two eras jointly hold (all of
            # orders); the three booleans are engine-verified spec-aware
            # pruning/reuse claims and must come back TRUE.
            "WITH k AS (SELECT min(o_custkey) AS mk FROM orders) "
            "SELECT "
            "(SELECT count(*) FROM orders, k WHERE o_custkey = mk) "
            "AS cust_count, "
            "(SELECT ROUND(sum(o_totalprice), 2) FROM orders, k "
            "WHERE o_custkey = mk) AS cust_sum, "
            "(SELECT count(*) FROM orders "
            "WHERE o_orderpriority = '2-HIGH') AS prio_count, "
            "(SELECT count(*) FROM orders) AS total_count, "
            "TRUE AS pruned_old, TRUE AS pruned_new, TRUE AS spec_reused"
        ),
        "iceberg_maintenance": (
            # surviving rows recomputed relationally; the maintenance
            # counts are deterministic literals by construction (see the
            # query docstring); read_stable is engine-verified
            "WITH base AS (SELECT o_totalprice AS p FROM orders "
            "WHERE o_orderkey % 3 = 0 AND o_totalprice <= 300000) "
            "SELECT (SELECT count(*) FROM base) AS final_count, "
            "(SELECT ROUND(sum(p), 2) FROM base) AS final_sum, "
            "4 AS manifests_before, 2 AS manifests_after, "
            "4 AS expired, 2 AS orphans, TRUE AS read_stable"
        ),
        "cramers_phi_orders": (
            # full relational recompute: contingency counts, expected =
            # row_total*col_total/n over ALL r x c cells (absent observed
            # cells contribute E), uncorrected Pearson chi2, phi_c
            "WITH ct AS (SELECT o_orderpriority AS a, o_orderstatus AS b, "
            "CAST(count(*) AS DOUBLE) AS k FROM orders GROUP BY 1, 2), "
            "tot AS (SELECT sum(k) AS n FROM ct), "
            "rt AS (SELECT a, sum(k) AS ra FROM ct GROUP BY a), "
            "cs AS (SELECT b, sum(k) AS cb FROM ct GROUP BY b), "
            "cells AS (SELECT rt.a, cs.b, rt.ra, cs.cb, "
            "coalesce(ct.k, 0) AS k FROM rt CROSS JOIN cs "
            "LEFT JOIN ct ON ct.a = rt.a AND ct.b = cs.b), "
            "chi AS (SELECT sum((cells.k - cells.ra * cells.cb / tot.n) "
            "* (cells.k - cells.ra * cells.cb / tot.n) "
            "/ (cells.ra * cells.cb / tot.n)) AS chi2 "
            "FROM cells, tot), "
            "dims AS (SELECT (SELECT count(*) FROM rt) AS r, "
            "(SELECT count(*) FROM cs) AS c) "
            "SELECT ROUND(sqrt(chi.chi2 / (tot.n * (least(dims.r, dims.c) "
            "- 1))), 6) AS phi, ROUND(chi.chi2, 6) AS chi2_stat, "
            "CAST(tot.n AS BIGINT) AS n, dims.r, dims.c, "
            "sqrt(chi.chi2 / (tot.n * (least(dims.r, dims.c) - 1))) < 0.1 "
            "AS success FROM chi, tot, dims"
        ),
        "semdedup_embeddings": (
            # injected centroids = the 8 lowest-vec_id embeddings, so the
            # full SemDeDup pipeline is relational: assignment = argmax of
            # 6-dp-rounded cosine (ties -> lowest cell), rank =
            # (c_sim DESC, id ASC), removed = a later-ranked same-cluster
            # member with 6-dp-rounded cosine >= 0.5 exists
            "WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v "
            "FROM embeddings), "
            "c0 AS (SELECT id, v FROM e ORDER BY id LIMIT 8), "
            "c AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, "
            "v AS cv FROM c0), "
            "sim AS (SELECT e.id, c.cell, "
            "ROUND(list_dot_product(e.v, c.cv) / "
            "(sqrt(list_dot_product(e.v, e.v)) * "
            "sqrt(list_dot_product(c.cv, c.cv))), 6) AS d FROM e, c), "
            "asg AS (SELECT id, cell, d FROM (SELECT sim.*, row_number() "
            "OVER (PARTITION BY id ORDER BY d DESC, cell ASC) AS rn "
            "FROM sim) WHERE rn = 1), "
            "rem AS (SELECT DISTINCT a.id FROM asg a "
            "JOIN asg b ON a.cell = b.cell "
            "AND (b.d < a.d OR (b.d = a.d AND b.id > a.id)) "
            "JOIN e ea ON ea.id = a.id JOIN e eb ON eb.id = b.id "
            "WHERE ROUND(list_dot_product(ea.v, eb.v) / "
            "(sqrt(list_dot_product(ea.v, ea.v)) * "
            "sqrt(list_dot_product(eb.v, eb.v))), 6) >= 0.5) "
            "SELECT a.id, CAST(a.cell AS INT) AS cluster, a.d AS c_sim, "
            "(r.id IS NOT NULL) AS removed "
            "FROM asg a LEFT JOIN rem r ON a.id = r.id"
        ),
        "iceberg_changelog": (
            # the CDC event stream reduces to modular classes over orders:
            # inserts = the two appended eras; position deletes = rows
            # with totalprice > 400000 (everything appended was visible);
            # equality deletes = the REMAINING rows whose custkey class
            # matches; net inserts = appended minus deleted (every insert
            # happened in-range, so net deletes = 0).  compaction_silent
            # is engine-verified and must come back TRUE.
            "WITH base AS (SELECT o_totalprice p, o_custkey c FROM orders "
            "WHERE o_orderkey % 4 <= 2), "
            "pd AS (SELECT * FROM base WHERE p > 400000), "
            "ed AS (SELECT * FROM base WHERE p <= 400000 AND c % 50 = 3) "
            "SELECT "
            "(SELECT count(*) FROM base) AS ins_count, "
            "(SELECT ROUND(sum(p), 2) FROM base) AS ins_sum, "
            "(SELECT count(*) FROM pd) + (SELECT count(*) FROM ed) "
            "AS del_count, "
            "ROUND((SELECT sum(p) FROM pd) + (SELECT sum(p) FROM ed), 2) "
            "AS del_sum, "
            "(SELECT count(*) FROM base) - (SELECT count(*) FROM pd) "
            "- (SELECT count(*) FROM ed) AS net_insert_count, "
            "0 AS net_delete_count, 4 AS n_ordinals, "
            "TRUE AS compaction_silent"
        ),
        "dsir_documents": (
            # Xie-2023 DSIR: hashed unigram+bigram bucket model (8192 md5
            # buckets via the hash_split idiom), Lidstone alpha=1 on every
            # bucket of BOTH corpora, per-doc weight = sum of per-gram
            # ln(p_target[b]/p_raw[b]); target = doc_id%10==7, scored set
            # = the rest; empty docs preserved (0 features, NULL weight)
            "WITH raw AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(trim(text)), '\\s+'), x -> x <> '') AS ws "
            "FROM documents WHERE doc_id % 10 <> 7), "
            "tgt AS (SELECT list_filter(string_split_regex(lower(trim("
            "text)), '\\s+'), x -> x <> '') AS ws "
            "FROM documents WHERE doc_id % 10 = 7), "
            "rg AS (SELECT doc_id, CAST(('0x' || substr(md5('gx_dsir' || "
            "g), 1, 15)) AS BIGINT) % 8192 AS b FROM ("
            "SELECT doc_id, unnest(ws) AS g FROM raw UNION ALL "
            "SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g FROM raw, "
            "unnest(range(1, len(ws))) s(i))), "
            "tg AS (SELECT CAST(('0x' || substr(md5('gx_dsir' || g), 1, "
            "15)) AS BIGINT) % 8192 AS b FROM ("
            "SELECT unnest(ws) AS g FROM tgt UNION ALL "
            "SELECT ws[i] || ' ' || ws[i+1] AS g FROM tgt, "
            "unnest(range(1, len(ws))) s(i))), "
            "rb AS (SELECT b, count(*) AS c FROM rg GROUP BY b), "
            "tb AS (SELECT b, count(*) AS c FROM tg GROUP BY b), "
            "tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM rb) AS rt, "
            "(SELECT coalesce(sum(c), 0) FROM tb) AS tt), "
            "ratio AS (SELECT sp.b, "
            "ln((coalesce(tb.c, 0) + 1.0) / (tot.tt + 8192.0)) - "
            "ln((coalesce(rb.c, 0) + 1.0) / (tot.rt + 8192.0)) AS lr "
            "FROM (SELECT unnest(range(0, 8192)) AS b) sp "
            "LEFT JOIN tb ON tb.b = sp.b LEFT JOIN rb ON rb.b = sp.b "
            "CROSS JOIN tot), "
            "s AS (SELECT rg.doc_id, count(*) AS nf, sum(ratio.lr) AS lw "
            "FROM rg JOIN ratio ON ratio.b = rg.b GROUP BY rg.doc_id) "
            "SELECT r.doc_id, CAST(coalesce(s.nf, 0) AS BIGINT) AS "
            "n_features, ROUND(s.lw, 6) AS log_importance_weight "
            "FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 7) r "
            "LEFT JOIN s USING (doc_id)"
        ),
        "stupid_backoff_documents": (
            # Brants-2007 stupid backoff, alpha=0.4, min_count=2 pruning:
            # kept bigram -> ln(c2/c1(prev)); pruned/unseen bigram ->
            # ln(alpha) + unigram term; kept unigram -> ln(c1/N); OOV ->
            # ln(alpha/N); first token takes the unigram path directly.
            # Denominators c1(prev) and N stay UNPRUNED, matching the
            # engine.  Positions via unnest over 1..len so prev is the
            # token to the left within the same doc.
            "WITH w AS (SELECT doc_id, list_filter("
            "string_split_regex(lower(trim(text)), '\\s+'), "
            "x -> x <> '') AS ws FROM documents), "
            "t AS (SELECT doc_id, ws[i] AS w, "
            "CASE WHEN i > 1 THEN ws[i-1] END AS prev "
            "FROM w, unnest(range(1, len(ws)+1)) s(i)), "
            "c1 AS (SELECT w, count(*) AS c FROM t GROUP BY w), "
            "n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c1), "
            "c2 AS (SELECT prev AS w1, w AS w2, count(*) AS c "
            "FROM t WHERE prev IS NOT NULL GROUP BY 1, 2 "
            "HAVING count(*) >= 2), "
            "bg AS (SELECT w1, w2, ln(c2.c / CAST(c1.c AS DOUBLE)) AS lp2 "
            "FROM c2 JOIN c1 ON c1.w = c2.w1), "
            "ug AS (SELECT w, ln(c / n.n) AS lp1 FROM c1 CROSS JOIN n "
            "WHERE c >= 2), "
            "s AS (SELECT t.doc_id, count(*) AS n_tokens, "
            "sum(CASE WHEN bg.lp2 IS NOT NULL THEN bg.lp2 "
            "WHEN t.prev IS NOT NULL THEN ln(0.4) + "
            "coalesce(ug.lp1, ln(0.4 / n.n)) "
            "ELSE coalesce(ug.lp1, ln(0.4 / n.n)) END) AS lp "
            "FROM t LEFT JOIN bg ON bg.w1 = t.prev AND bg.w2 = t.w "
            "LEFT JOIN ug ON ug.w = t.w CROSS JOIN n GROUP BY t.doc_id) "
            "SELECT d.doc_id, CAST(coalesce(s.n_tokens, 0) AS BIGINT) "
            "AS n_tokens, ROUND(s.lp / s.n_tokens, 6) AS logprob_per_token "
            "FROM documents d LEFT JOIN s USING (doc_id)"
        ),
        "unigram_logprob_documents": (
            # Lidstone alpha=0.5 unigram LM over the whole corpus;
            # tokens = lower+trim+\s+ split, empties dropped; empty docs
            # preserved with n_tokens=0 / NULL score
            "WITH t AS (SELECT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w "
            "FROM documents) WHERE w <> ''), "
            "f AS (SELECT w, count(*) AS cnt FROM t GROUP BY w), "
            "c AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n, "
            "CAST(count(*) AS DOUBLE) AS v FROM f), "
            "s AS (SELECT doc_id, count(*) AS n_tokens, "
            "sum(ln((cnt + 0.5) / (n + 0.5 * v))) AS lp "
            "FROM t JOIN f USING (w) CROSS JOIN c GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(coalesce(s.n_tokens, 0) AS BIGINT) "
            "AS n_tokens, ROUND(s.lp / s.n_tokens, 6) AS logprob_per_token "
            "FROM documents d LEFT JOIN s USING (doc_id)"
        ),
        "pii_documents": _pii_oracle_sql(),
        "repetition_stats_documents": (
            # relational recompute of the engine's map-side HOF folds:
            # dup frac = 1 - distinct/total grams; top multiplicity from
            # a per-(doc, gram) count; docs too short for grams -> 0s
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words "
            "FROM documents), "
            "g2 AS (SELECT doc_id, array_to_string(words[i:i+1], ' ') AS gram "
            "FROM w, unnest(range(1, len(words))) t(i) WHERE len(words) >= 2), "
            "g3 AS (SELECT doc_id, array_to_string(words[i:i+2], ' ') AS gram "
            "FROM w, unnest(range(1, len(words)-1)) t(i) WHERE len(words) >= 3), "
            "a2 AS (SELECT doc_id, SUM(cnt) AS tot, COUNT(*) AS dist, "
            "MAX(cnt) AS topc FROM (SELECT doc_id, gram, count(*) AS cnt "
            "FROM g2 GROUP BY doc_id, gram) GROUP BY doc_id), "
            "a3 AS (SELECT doc_id, SUM(cnt) AS tot, COUNT(*) AS dist "
            "FROM (SELECT doc_id, gram, count(*) AS cnt "
            "FROM g3 GROUP BY doc_id, gram) GROUP BY doc_id) "
            "SELECT w.doc_id, CAST(len(words) AS BIGINT) AS n_words, "
            "ROUND(coalesce(1.0 - a2.dist / CAST(a2.tot AS DOUBLE), 0), 6) "
            "AS dup_2gram_frac, "
            "ROUND(coalesce(1.0 - a3.dist / CAST(a3.tot AS DOUBLE), 0), 6) "
            "AS dup_3gram_frac, "
            "CAST(coalesce(a2.topc, 0) AS BIGINT) AS top_2gram_count "
            "FROM w LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)"
        ),
        "token_shards_documents": (
            # integer floor division (//) to mirror the engine's exact
            # long `div` arithmetic — no float prefix sum on either side
            "SELECT doc_id, CAST((SUM(n_chars) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars) "
            "// 2000 AS BIGINT) AS shard FROM documents"
        ),
        "mixture_sample_documents": (
            "WITH tot AS (SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS g "
            "FROM documents GROUP BY source), "
            "w(src, wt) AS (SELECT * FROM (VALUES ('src0', 0.5), "
            "('src1', 0.3), ('src2', 0.2))) "
            "SELECT d.doc_id, d.source, d.n_chars FROM documents d "
            "JOIN tot t ON t.source = d.source "
            "LEFT JOIN w ON w.src = d.source "
            "WHERE ('0x' || substr(md5('gx_mix' || CAST(d.doc_id AS VARCHAR)), "
            "1, 15))::BIGINT % 1000 < "
            "LEAST(1.0, 5000.0 * COALESCE(w.wt, 0.0) / t.g) * 1000"
        ),
        "embedding_dedup_clusters": (
            # same recursive reachability walk as dedup_clusters_documents,
            # over the 0.4-cosine pair graph; canonical = min id per cluster
            "WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v "
            "FROM embeddings), "
            "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM e a "
            "JOIN e b ON a.vec_id < b.vec_id "
            "WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) "
            "* sqrt(list_dot_product(b.v, b.v))) >= 0.4), "
            "sym AS (SELECT id_a AS u, id_b AS v FROM p "
            "UNION ALL SELECT id_b, id_a FROM p), "
            "walk(node, comp) AS ("
            "SELECT u, u FROM (SELECT u FROM sym UNION SELECT v FROM sym) "
            "UNION "
            "SELECT s.v, w.comp FROM walk w JOIN sym s ON s.u = w.node), "
            "comp AS (SELECT node, min(comp) AS component FROM walk GROUP BY node) "
            "SELECT emb.vec_id AS id, "
            "coalesce(c.component, emb.vec_id) AS component, "
            "(emb.vec_id = coalesce(c.component, emb.vec_id)) AS is_canonical "
            "FROM embeddings emb LEFT JOIN comp c ON c.node = emb.vec_id"
        ),
        "chisquare_mktsegment": (
            "WITH oc AS (SELECT c_mktsegment AS v, count(*) AS c "
            "FROM customer GROUP BY 1), "
            "t AS (SELECT SUM(c) AS n FROM oc) "
            "SELECT ROUND(SUM((c - n * 0.2) * (c - n * 0.2) / (n * 0.2)), 6) "
            "AS chi2_stat, CAST(4 AS BIGINT) AS dof FROM oc, t"
        ),
        "ks_stat_uniform_quantity": (
            "WITH s AS (SELECT l_quantity AS x, "
            "row_number() OVER (ORDER BY l_quantity) AS rn, "
            "count(*) OVER () AS n FROM lineitem WHERE l_quantity IS NOT NULL) "
            "SELECT ROUND(MAX(GREATEST(rn * 1.0 / n - LEAST(GREATEST((x - 1.0) / 49.0, 0.0), 1.0), "
            "LEAST(GREATEST((x - 1.0) / 49.0, 0.0), 1.0) - (rn - 1.0) / n)), 6) AS ks_stat FROM s"
        ),
        # ann_*: hyperplane/k-means seeds are not ANSI-SQL-expressible, but
        # the queries return the EXACT top-10 (oracle below) plus an
        # in-Spark recall_ok flag vs the ANN shortlist; the oracle asserts
        # recall_ok via a TRUE literal, so an ANN recall regression
        # hash-mismatches (IVF exactness pinned by tests/test_ivf.py, PQ
        # ADC exactness + recall by tests/test_pq.py, IVFADC
        # layout/exactness/pruning/recall by tests/test_ivfpq.py).
        "ann_lsh_embeddings": _ANN_EXACT_RECALL_SQL,
        "ann_ivf_embeddings": _ANN_EXACT_RECALL_SQL,
        "ann_pq_embeddings": _ANN_EXACT_RECALL_SQL,
        "ann_ivfpq_embeddings": _ANN_EXACT_RECALL_SQL,
        # bpe_tokenize: training is iterative/driver-side, but APPLYING the
        # committed merge table is SQL — recursive-CTE re-encode, see
        # _bpe_oracle_sql()
        "bpe_tokenize_documents": _bpe_oracle_sql(),
        # minhash_near_dups, simhash_documents: intentionally omitted →
        # driver records rows-only checks (banded-LSH candidate sets and
        # xxhash64 seeds are not reproducible in ANSI SQL; recall and
        # bit-identity pinned by tests/test_neardup.py / tests/test_ops.py)
    }
