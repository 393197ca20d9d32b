"""Per-round benchmark (driver contract): headline validation + pipeline-op
queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], plus audio-suite
throughput on the generated bench audio table.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "audio_clips_per_sec": ..., "audio_n": ...}

Sketch mode (HLL/KLL/percentile_approx) is used for the TPC-H-scale suites —
the documented 10^12-row path; audio suite runs the full north-rule checks
(decode + SNR + transcript) with violations materialized, not collected.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

AUDIO_N = int(os.environ.get("GX_BENCH_AUDIO_N", "240000"))
AUDIO_DIR = os.path.join(REPO, "build", "audio", f"n{AUDIO_N}")


IMAGE_N = int(os.environ.get("GX_BENCH_IMAGE_N", "100000"))
IMAGE_DIR = os.path.join(REPO, "build", "images", f"n{IMAGE_N}")


VIDEO_N = int(os.environ.get("GX_BENCH_VIDEO_N", "20000"))
# v2: mix includes bare-h264 Annex-B rows (gx_spark/h264.py)
VIDEO_DIR = os.path.join(REPO, "build", "videos", f"n{VIDEO_N}_v2")


def ensure_video_table() -> str:
    """20k videos, mixed containers — 1/3 gxraw_frames (5 concatenated
    16x16 frames), 1/3 real MP4/ISO-BMFF (opaque AVC payload), 1/3 bare
    H.264 Annex-B (real exp-Golomb SPS + VUI timing, opaque slice data) —
    with the deterministic corruption pattern: i%10==7 container/SPS dims
    contradict metadata, i%10==9 truncated payload."""
    path = os.path.join(VIDEO_DIR, "videos.parquet")
    if os.path.exists(path):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gx_spark.h264 import annexb_encode
    from gx_spark.image import raw_encode, synth_image
    from gx_spark.isobmff import mp4_encode

    os.makedirs(VIDEO_DIR, exist_ok=True)
    cols = {k: [] for k in ("vid_id", "bytes", "n_frames", "fps", "width",
                            "height", "format")}
    for i in range(VIDEO_N):
        vid = f"vid_{i:07d}"
        w = h = 16
        nf, fps = 5, 10.0
        enc_w = w // 2 if i % 10 == 7 else w
        if i % 3 == 0:
            fmt = "gxraw_frames"
            b = b"".join(raw_encode(synth_image(f"{vid}f{j}", enc_w, h))
                         for j in range(nf))
        elif i % 3 == 1:
            fmt = "mp4"
            b = mp4_encode(vid, nf, fps, enc_w, h)
        else:
            fmt = "h264"
            b = annexb_encode(vid, nf, fps, enc_w, h)
        if i % 10 == 9:
            b = b[: len(b) // 3]
        cols["vid_id"].append(vid)
        cols["bytes"].append(b)
        cols["n_frames"].append(nf)
        cols["fps"].append(fps)
        cols["width"].append(w)
        cols["height"].append(h)
        cols["format"].append(fmt)
    table = pa.table({
        "vid_id": pa.array(cols["vid_id"]),
        "bytes": pa.array(cols["bytes"], type=pa.binary()),
        "n_frames": pa.array(cols["n_frames"], type=pa.int32()),
        "fps": pa.array(cols["fps"], type=pa.float64()),
        "width": pa.array(cols["width"], type=pa.int32()),
        "height": pa.array(cols["height"], type=pa.int32()),
        "format": pa.array(cols["format"]),
    })
    pq.write_table(table, path)
    return path


def ensure_image_table() -> str:
    """100k 16x16 gxraw images (~80 MB) with the deterministic corruption
    pattern (i%10==7 metadata lies, i%10==9 truncated payload)."""
    path = os.path.join(IMAGE_DIR, "images.parquet")
    if os.path.exists(path):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gx_spark.image import raw_encode, synth_image

    os.makedirs(IMAGE_DIR, exist_ok=True)
    cols = {k: [] for k in ("img_id", "bytes", "width", "height", "channels", "format")}
    for i in range(IMAGE_N):
        img_id = f"img_{i:07d}"
        w, h = 16 + (i % 3) * 8, 16
        b = raw_encode(synth_image(img_id, w, h))
        width = w + 1 if i % 10 == 7 else w
        if i % 10 == 9:
            b = b[: len(b) // 2]
        cols["img_id"].append(img_id)
        cols["bytes"].append(b)
        cols["width"].append(width)
        cols["height"].append(h)
        cols["channels"].append(3)
        cols["format"].append("gxraw")
    table = pa.table({
        "img_id": pa.array(cols["img_id"]),
        "bytes": pa.array(cols["bytes"], type=pa.binary()),
        "width": pa.array(cols["width"], type=pa.int32()),
        "height": pa.array(cols["height"], type=pa.int32()),
        "channels": pa.array(cols["channels"], type=pa.int32()),
        "format": pa.array(cols["format"]),
    })
    pq.write_table(table, path)
    return path


def ensure_audio_table(spark) -> str:
    from tools.gen_audio import generate_small, generate_spark, table_is_current

    if not table_is_current(AUDIO_DIR):
        import shutil

        shutil.rmtree(AUDIO_DIR, ignore_errors=True)
        if AUDIO_N <= 20000:
            generate_small(AUDIO_N, AUDIO_DIR, 16)
        else:
            generate_spark(spark, AUDIO_N, AUDIO_DIR, 64)
    return f"{AUDIO_DIR}/audio_clips.parquet"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else None

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from gx_spark.skew import BINARY_SCAN_CONFS, BINARY_SCAN_JVM_OPTS

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gx-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # binary-scan tuning from the single source of truth (skew.py,
        # measured via tools/bench_scaling.py).  columnarReaderBatchSize is
        # NOT set here: small columnar batches protect the multi-MB binary
        # scans but tax the narrow TPC-H/documents sections, so those run
        # at the 4096 default and the audio sections set it below.
        .config("spark.driver.extraJavaOptions", BINARY_SCAN_JVM_OPTS)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                BINARY_SCAN_CONFS["spark.sql.execution.arrow.maxRecordsPerBatch"])
        .config("spark.hadoop.parquet.hadoop.vectored.io.enabled",
                BINARY_SCAN_CONFS["spark.hadoop.parquet.hadoop.vectored.io.enabled"])
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from gx_spark import EngineOptions, ExpectationSuite, validate
    from gx_spark import ops
    from gx_spark.suites import audio_suite

    def load(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    audio_path = ensure_audio_table(spark)

    timings: dict[str, float] = {}

    def jvm_gc():
        # Sections share one local JVM, which no real deployment does
        # (clusters run fresh executor JVMs per job with their own heaps).
        # The binary-heavy sections leave the 24g heap full of byte[]
        # carcasses and every LATER section then crawls under continuous
        # collection — measured 3.5x on the pipeline pass (2,000 clips/s
        # after the suite runs vs 6,729 immediately after one System.gc()).
        # An explicit collect at section boundaries (untimed) restores the
        # fresh-JVM condition each section would see on a cluster.
        spark.sparkContext._jvm.System.gc()

    # -- noise self-adjudication ------------------------------------------
    # This box is a shared hypervisor (single shots vary up to 2x under
    # steal — see BENCH/BASELINE.md).  Two mechanisms let a reader separate
    # box noise from plan regressions WITHOUT re-running anything:
    #   1. every section runs best-of-N (N=3, or 2 when a single shot is
    #      expensive) and the full run array is recorded, so uniform drift
    #      across runs reads as load, a reproducible slowdown as a plan;
    #   2. an in-window HARDWARE CONTROL — a fixed pure-CPU numpy FFT
    #      workload (single-threaded, no Spark, no disk) — is measured
    #      immediately before every timed run; if a section slows down
    #      while its control also slows down, the box moved, not the plan.
    import numpy as _np

    _ctrl_x = _np.random.default_rng(42).standard_normal(1 << 20)

    def hw_control() -> float:
        t0 = time.time()
        for _ in range(4):
            _np.fft.rfft(_ctrl_x)
        return round(4 * (1 << 20) / (time.time() - t0) / 1e6, 1)  # Melem/s

    section_runs: dict[str, list[float]] = {}
    section_ctrl: dict[str, list[float]] = {}
    # single shot above this → best-of-2 instead of 3 (bounds bench wall)
    EXPENSIVE_S = float(os.environ.get("GX_BENCH_EXPENSIVE_S", "8.0"))

    def bench(name):
        def deco(fn):
            runs: list[float] = []
            ctrls: list[float] = []
            while len(runs) < (2 if runs and runs[0] > EXPENSIVE_S else 3):
                jvm_gc()
                ctrls.append(hw_control())
                t0 = time.time()
                fn()
                runs.append(round(time.time() - t0, 3))
            timings[name] = min(runs)
            section_runs[name] = runs
            section_ctrl[name] = ctrls
        return deco

    # warmup: touch the JVM + arrow paths so q1 isn't charged for init,
    # and fork a python worker per executor thread (worker reuse keeps them
    # alive) so the first pandas-UDF section isn't charged process spin-up
    load("lineitem").limit(10).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).select(
        F.sum(_warm("id"))
    ).collect()

    @bench("lineitem_suite")
    def _():
        suite = (
            ExpectationSuite("li")
            .add("expect_table_row_count_to_be_between", min_value=1)
            .add("expect_column_values_to_not_be_null", column="l_orderkey")
            .add("expect_column_values_to_be_in_set", column="l_returnflag",
                 value_set=["A", "N", "R"])
            .add("expect_column_values_to_be_between", column="l_quantity",
                 min_value=1, max_value=50)
            .add("expect_column_mean_to_be_between", column="l_extendedprice",
                 min_value=0)
            .add("expect_column_stdev_to_be_between", column="l_quantity", min_value=0)
            .add("expect_column_quantile_values_to_be_between", column="l_extendedprice",
                 quantile_ranges={"quantiles": [0.25, 0.5, 0.75]})
            .add("expect_column_unique_value_count_to_be_between", column="l_suppkey",
                 min_value=1)
            .add("expect_column_mean_to_be_between", column="l_quantity",
                 row_condition="l_returnflag = 'A'", min_value=0)
        )
        b = validate(spark, load("lineitem"), suite,
                     EngineOptions(mode="sketch", collect_violations=False))
        assert b.suite_result.statistics["evaluated_expectations"] == 9

    @bench("orders_unique_referential")
    def _():
        suite = (
            ExpectationSuite("o")
            .add("expect_column_values_to_be_unique", column="o_orderkey")
            .add("expect_column_values_to_exist_in_table", column="o_custkey",
                 other_table_name="customer", other_column="c_custkey")
        )
        b = validate(spark, load("orders"), suite,
                     EngineOptions(mode="sketch", collect_violations=False),
                     tables={"customer": load("customer")})
        assert b.suite_result.success

    @bench("documents_dedup_minhash")
    def _():
        docs = load("documents")
        ops.exact_dedup_stats(docs, ["text"]).collect()
        ops.minhash_jaccard(docs, "doc_id", "text", threshold=0.2).count()

    @bench("near_dup_pairs")
    def _():
        docs = load("documents")
        # the 100 TB near-dup shape: LSH candidates -> exact-Jaccard verify
        ops.minhash_verified_pairs(docs, "doc_id", "text", threshold=0.8).count()
        # exact prefix-filtered Jaccard on a bounded verification slice (the
        # synthetic corpus is degenerate: ~1M TRUE pairs at j>=0.9 among 5k
        # docs, so the full exact output is quadratic by construction)
        sl = docs.where(F.col("doc_id") % 5 == 0)
        ops.word_jaccard_pairs(sl, "doc_id", "text", threshold=0.9).count()
        # embedding near-dup pairs: multi-table LSH buckets + exact verify
        ops.cosine_near_dup_pairs(load("embeddings"), "vec_id", "embedding",
                                  threshold=0.4, mode="lsh").count()

    @bench("dedup_clusters")
    def _():
        # the full 100 TB dedup chain: LSH-verified near-dup pairs ->
        # large-star/small-star connected components -> one canonical doc
        # per cluster (quadratic never materializes; CC rounds are plain
        # keyed agg+join).  Same 1/5 slice as the word-jaccard leg: the
        # synthetic corpus is degenerate (~1M TRUE pairs among 5k docs), so
        # the full-corpus pair GRAPH is quadratic by construction — a real
        # corpus's near-dup graph is sparse
        docs = load("documents").where(F.col("doc_id") % 5 == 0)
        pairs = ops.minhash_verified_pairs(docs, "doc_id", "text",
                                           threshold=0.8)
        out = ops.dedup_clusters(docs, "doc_id", "text", pairs=pairs)
        kept = out.where("is_canonical").count()
        assert 0 < kept <= docs.count()

    @bench("documents_text_analysis")
    def _():
        docs = load("documents")
        ops.quality_scores(docs, "doc_id", "text").agg(
            F.avg("punct_ratio"), F.avg("stopword_ratio")
        ).collect()
        ops.lang_distribution(docs, "text").collect()
        ops.md5_fingerprints(docs, "doc_id", "text").count()
        ops.simhash64(docs, "doc_id", "text").count()

    @bench("documents_quality_safety")
    def _():
        # round-4 quality/safety ops in their OWN section so the
        # long-lived text_analysis numbers stay comparable across rounds:
        # zero-shuffle Gopher repetition folds + decontamination probe
        # against a broadcast benchmark gram set
        docs = load("documents")
        ops.repetition_stats(docs, "doc_id", "text").agg(
            F.avg("dup_2gram_frac"), F.max("top_2gram_count")
        ).collect()
        bench_slice = docs.where(F.col("doc_id") % 10 == 7)
        train_slice = docs.where(F.col("doc_id") % 10 != 7)
        ops.decontaminate(
            train_slice, bench_slice, "doc_id", "text", n=5
        ).where("contaminated").count()
        # r5 PII pass: detection counts + full redaction residue, all
        # map-side regexp folds (planted spans so the redact leg does work)
        planted = docs.withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 7 == 3,
                       F.concat(F.lit(" u"), F.col("doc_id").cast("string"),
                                F.lit("@example.com"))).otherwise(F.lit("")),
            ),
        )
        red = ops.redact_pii(planted, "text", out_col="clean")
        stats = ops.pii_stats(red, "doc_id", "text", keep_cols=["clean"])
        row = stats.agg(
            F.sum("n_pii"),
            F.sum(ops.pii_count_expr(F.col("clean"))).alias("resid"),
        ).collect()[0]
        assert row[0] > 0 and row[1] == 0

    @bench("documents_line_lm")
    def _():
        # r5 line/LM curation ops in their own section (keeps the older
        # text sections comparable across rounds): corpus-wide exact line
        # dedup over the deterministic 8-word reflow + CCNet-style
        # unigram-LM quality scoring
        docs = load("documents")
        reflowed = ops.reflow_lines(docs, "doc_id", "text")
        deduped = ops.line_dedup(reflowed, "doc_id", "text")
        row = deduped.agg(
            F.count(F.lit(1)), F.sum("n_lines"), F.sum("n_kept")
        ).collect()[0]
        assert row[2] <= row[1]
        ops.unigram_logprob(docs, "doc_id", "text").agg(
            F.avg("logprob_per_token"), F.sum("n_tokens")
        ).collect()

    @bench("documents_data_selection")
    def _():
        # r5 data-selection ops in their own section: stupid-backoff
        # bigram LM (two wordcount exchanges + broadcast-join scoring) and
        # DSIR hashed-n-gram importance weights (bucket-count exchanges +
        # zero-shuffle literal-array scoring fold) with the Gumbel top-k
        docs = load("documents")
        ops.stupid_backoff_logprob(docs, "doc_id", "text").agg(
            F.avg("logprob_per_token"), F.sum("n_tokens")
        ).collect()
        target = docs.where(F.col("doc_id") % 10 == 7)
        raw = docs.where(F.col("doc_id") % 10 != 7)
        w = ops.dsir_weights(raw, target, "doc_id", "text")
        picked = ops.dsir_sample(w, 1000).count()
        assert picked > 0

    @bench("documents_span_wer")
    def _():
        # r5 span-dedup + error-rate ops in their own section: Lee et
        # al.-style duplicated-8-gram span removal (md5-compressed gram
        # keys on the wire), then WER/CER of a planted-edit hypothesis
        # against the 30-word reference (map-only: builtin levenshtein +
        # the vectorized word-DP pandas UDF)
        docs = load("documents")
        spans = ops.dedup_spans(docs, "doc_id", "text")
        row = spans.agg(
            F.count(F.lit(1)), F.sum("n_removed"),
            F.sum("n_dup_occurrences")
        ).collect()[0]
        assert row[2] >= 0
        rw = F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 30)
        pairs = docs.select(
            "doc_id",
            F.array_join(F.filter(rw, lambda w, i: (i % 7) != 0), " ")
             .alias("hyp"),
            F.array_join(rw, " ").alias("ref"),
        )
        ops.transcript_error_stats(pairs, "doc_id", "hyp", "ref").agg(
            F.avg("wer"), F.avg("cer"), F.sum("word_edits")
        ).collect()

    @bench("embeddings_similarity")
    def _():
        emb = load("embeddings")
        q = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .select("embedding").first()[0]]
        ops.cosine_topk(emb, "vec_id", "embedding", q, 10).collect()
        # at-scale ANN shape: one ingest-side index build (amortized across
        # queries), then probes against the stored bucket columns
        idx = ops.build_ann_index(emb, "vec_id", "embedding").persist()
        idx.count()
        ops.ann_query(idx, q, 10).collect()
        q2 = [float(x) for x in emb.where(F.col("vec_id") == 1)
              .select("embedding").first()[0]]
        ops.ann_query(idx, q2, 10).collect()
        idx.unpersist()

    @bench("embeddings_semdedup")
    def _():
        # SemDeDup at-scale shape: spherical k-means over a bounded
        # sample, ONE map-side Arrow tag pass, quadratic confined to each
        # cluster's own pair block (self-join keyed on cluster id)
        emb = load("embeddings")
        # 0.4 matches the corpus's planted near-dup band (the threshold
        # the cosine_near_dup sections use), so removals really happen
        out = ops.semdedup(emb, "vec_id", "embedding",
                           n_clusters=64, threshold=0.4)
        n = out.count()
        kept = out.where("not removed").count()
        assert 0 < kept < n == emb.count()

    @bench("pq_ann")
    def _():
        # PQ at-scale shape: train codebooks once, encode the corpus to
        # m-byte codes (32x smaller than the vectors), serve queries as
        # ADC shortlist over codes + exact rerank on shortlist rows only
        emb = load("embeddings")
        B = ops.train_pq_codebooks(emb, "embedding", m=8, k=256)
        codes = ops.pq_encode(emb, "vec_id", "embedding", B).persist()
        codes.count()
        for vid in (0, 1):
            q = [float(x) for x in emb.where(F.col("vec_id") == vid)
                 .select("embedding").first()[0]]
            ops.pq_topk_rerank(emb, "vec_id", "embedding", codes, B, q,
                               k=10, shortlist=50).collect()
        codes.unpersist()

    @bench("ivf_written_index")
    def _():
        # IVF at-scale shape (separate bench key — strictly more work than
        # embeddings_similarity: k-means train + a partitioned-by-cell index
        # WRITE, then probes served from the written table, where the cell
        # filter is partition pruning on the read; plan-asserted in
        # tests/test_ivf.py)
        import shutil
        import tempfile

        emb = load("embeddings")
        q = [float(x) for x in emb.where(F.col("vec_id") == 0)
             .select("embedding").first()[0]]
        q2 = [float(x) for x in emb.where(F.col("vec_id") == 1)
              .select("embedding").first()[0]]
        ivf_dir = tempfile.mkdtemp(prefix="gx_ivf_")
        try:
            ops.write_ivf_index(emb, "vec_id", "embedding", ivf_dir,
                                n_centroids=32)
            index, C = ops.read_ivf_index(spark, ivf_dir)
            ops.ivf_query(index, C, q, 10, nprobe=8).collect()
            ops.ivf_query(index, C, q2, 10, nprobe=8).collect()
        finally:
            shutil.rmtree(ivf_dir, ignore_errors=True)

    @bench("ivfpq_written_index")
    def _():
        # the full IVFADC serving shape: coarse cells (partition pruning)
        # + residual PQ codes (32x compression) written once, probes =
        # pruned ADC shortlist + exact rerank on shortlist rows only
        import shutil
        import tempfile

        emb = load("embeddings")
        qs = [[float(x) for x in emb.where(F.col("vec_id") == vid)
               .select("embedding").first()[0]] for vid in (0, 1)]
        d = tempfile.mkdtemp(prefix="gx_ivfpq_")
        try:
            ops.write_ivfpq_index(emb, "vec_id", "embedding", d,
                                  n_centroids=32, m=8, n_codes=256)
            codes, C, B = ops.read_ivfpq_index(spark, d)
            for q in qs:
                ops.ivfpq_topk_rerank(emb, "vec_id", "embedding", codes, C,
                                      B, q, k=10, nprobe=8,
                                      shortlist=50).collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    @bench("image_suite")
    def _():
        from gx_spark import ops as _ops  # noqa: F401
        from gx_spark import image as gim

        img_df = spark.read.parquet(ensure_image_table()).repartition(int(cpus))
        b = validate(
            spark, img_df,
            ExpectationSuite("img")
            .add("expect_image_metadata_to_be_consistent")
            .add("expect_image_mean_intensity_to_be_between",
                 min_value=0.0, max_value=255.0),
            EngineOptions(unexpected_index_column_names=("img_id",)),
        )
        nv = b.violations_table().count()
        b.unpersist()
        assert nv == IMAGE_N // 10 * 2, nv
        # perceptual-hash dedup fingerprints over the same table
        gim.image_phash64(img_df).where("phash is not null").count()

    @bench("video_suite")
    def _():
        # video validation: real ISO-BMFF demux for mp4 rows, real Annex-B
        # SPS/VUI bitstream parse for h264 rows, frame arithmetic for
        # gxraw_frames + the frame-sampling op
        from gx_spark.image import sample_video_frames

        vid_df = spark.read.parquet(ensure_video_table()).repartition(int(cpus))
        b = validate(
            spark, vid_df,
            ExpectationSuite("video")
            .add("expect_video_metadata_to_be_consistent"),
            EngineOptions(unexpected_index_column_names=("vid_id",)),
        )
        nv = b.violations_table().count()
        b.unpersist()
        assert nv == VIDEO_N // 10 * 2, nv
        # frame-explode over the intact gxraw subset
        raw = vid_df.where("format = 'gxraw_frames' and vid_id not like '%9'")
        n = sample_video_frames(raw, every_k=2).count()
        assert n > 0

    # binary-column scan: small columnar batches (multi-MB byte[] rows)
    spark.conf.set(
        "spark.sql.parquet.columnarReaderBatchSize",
        BINARY_SCAN_CONFS["spark.sql.parquet.columnarReaderBatchSize"])
    # north rule: the throughput metric is defined on the ICEBERG
    # audio+transcript table — import (metadata-only, idempotent) and read
    # through the snapshot-planned file list
    from gx_spark.iceberg import IcebergLiteTable

    ice = IcebergLiteTable.create_from_parquet(
        audio_path.rstrip("/") + ".iceberg", audio_path)
    audio_df = ice.read(spark)
    # Decode tasks each pair an executor thread with a python worker; this
    # box has 16 physical cores behind 32 SMT threads, so concurrency above
    # ~10 tasks oversubscribes and LOWERS throughput (measured: local[32]
    # unconstrained 290s vs coalesce(10) 131s on n240000).  Real clusters
    # size executors to physical cores instead.
    max_tasks = int(os.environ.get("GX_AUDIO_TASKS", "10"))
    if int(cpus) > max_tasks:
        audio_df = audio_df.coalesce(max_tasks)
    # page-cache warm scan: the first pass over a multi-GB binary table
    # after other jobs dirtied memory reads 3-4x slower from disk (measured
    # — see BENCH/BASELINE.md); one JVM-side length() scan re-residents the
    # bytes pages so the timed runs measure the engine, not the disk
    audio_df.agg(F.sum(F.length("bytes"))).collect()
    # best-of-2: this sandbox is a shared hypervisor (steal makes single
    # shots vary up to 2x — see BENCH/BASELINE.md); minimum wall = the
    # least-interfered measurement of the same fixed work
    audio_runs = []
    section_ctrl["audio_suite"] = []
    for _ in range(3):
        jvm_gc()
        section_ctrl["audio_suite"].append(hw_control())
        t0 = time.time()
        bundle = validate(
            spark, audio_df, audio_suite(),
            EngineOptions(unexpected_index_column_names=("clip_id",)),
        )
        n_viol = bundle.violations_table().count()
        bundle.unpersist()
        audio_runs.append(time.time() - t0)
        assert n_viol > 0
    audio_dt = min(audio_runs)
    timings["audio_suite"] = round(audio_dt, 3)

    # training-pipeline pass over the same Iceberg table: acoustic features
    # + content-dedup fingerprints from ONE decode (audio_ops.py), stats
    # and duplicate grouping over the slim feature columns only
    from gx_spark.audio_ops import extract_audio_features

    # deterministic quarter-slice: the metric is per-clip THROUGHPUT of a
    # map-side op (decode + features + fingerprint, shuffle only the slim
    # fp64 groupBy), so per-clip cost is scale-free; the slice keeps the
    # driver's per-round bench wall bounded while the full-table scaling
    # evidence lives in tools/pipeline_scaling.py.  The cut is a RANGE on
    # clip_id (ids are written in order), so parquet min/max stats prune
    # the untouched row groups — a hash-based cut would still scan every
    # byte of the binary column and understate throughput.  The slice MUST
    # cut at the FILE level: the table's round-robin write gives every file
    # full-range clip_id bounds, so neither parquet row-group stats nor
    # Iceberg manifest bounds can prune a value range (measured: a range
    # row-filter after coalesce concentrated the surviving rows into ~3 of
    # 10 merged tasks — 84 s vs 15 s).  Sharding the snapshot's planned
    # file list is how a real cluster slices a backfill, the per-file clip
    # mix is uniform by construction, and the quarter reads a quarter of
    # the bytes.
    # No coalesce here: the quarter shard scans as ~32 splits and decodes
    # fastest using them all (measured 9.8 s vs 18.1 s with coalesce(10) in
    # the same window — the coalesce guidance applies to the FULL-table
    # suite where 64 concurrent decode workers oversubscribe the box).
    all_files = sorted(f.file_path for f in ice.plan_files())
    shard = all_files[: max(1, len(all_files) // 4)]
    shard_is_whole_table = len(shard) == len(all_files)
    pipe_df = spark.read.parquet(*shard)
    # untimed warm-up: the first full-batch pass through a new pandas UDF
    # pays worker JIT/allocator growth (measured ~2x on the first pass even
    # with warm workers); a real long-running job amortizes this to zero
    extract_audio_features(
        audio_df.limit(2000), keep_cols=["clip_id"], fingerprint=True
    ).agg(F.count("fp64")).collect()
    # best-of-2, same rationale as the suite runs: this section lands after
    # ~2 min of sustained full load, where the shared hypervisor throttles
    # single shots up to 4x vs the identical job on a quiet box (measured
    # 9.8 s isolated vs 45 s in-bench for this exact plan)
    pipeline_runs = []
    section_ctrl["audio_pipeline"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_pipeline"].append(hw_control())
        t0 = time.time()
        feats = extract_audio_features(
            pipe_df, keep_cols=["clip_id"], fingerprint=True).persist()
        stats = feats.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("rms_dbfs").alias("avg_rms_dbfs"),
            F.sum((F.col("clipping_ratio") > 0.01).cast("long")).alias("clipped"),
            F.sum((F.col("silence_ratio") > 0.5).cast("long")).alias("mostly_silent"),
            F.sum(F.col("rms_dbfs").isNull().cast("long")).alias("undecodable"),
        ).collect()[0]
        dup_groups = (
            feats.where(F.col("fp64").isNotNull())
            .groupBy("fp64").count().where("count >= 2").count()
        )
        feats.unpersist()
        pipeline_runs.append(time.time() - t0)
    pipeline_dt = min(pipeline_runs)
    timings["audio_pipeline"] = round(pipeline_dt, 3)
    pipeline_n = int(stats["n"])
    # the quarter-shard is a strict subset whenever the table has >= 2
    # data files; the tiny single-file generator (GX_BENCH_AUDIO_N small
    # enough for the pyarrow path) makes the shard the whole table, and
    # then pipeline_n == AUDIO_N is the correct outcome, not a bug
    if shard_is_whole_table:
        assert 0 < pipeline_n <= AUDIO_N
    else:
        assert 0 < pipeline_n < AUDIO_N

    # validation + curation from ONE decode (validate_and_extract_audio):
    # the same shard's validation verdicts (as plain column predicates over
    # the flag columns) AND the curation stats/dedup grouping, decoding
    # each payload once — the honest comparison is this wall vs the
    # pipeline wall on the same shard (the combined pass does strictly
    # more: flags + SNR-vs-reference synthesis on top of features)
    from gx_spark.audio_ops import validate_and_extract_audio

    combined_runs = []
    section_ctrl["audio_validate_curate"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_validate_curate"].append(hw_control())
        t0 = time.time()
        cur = validate_and_extract_audio(
            pipe_df, keep_cols=["clip_id"]).persist()
        cstats = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((~(F.col("decodable") & F.col("header_sr_ok")
                     & F.col("dur_ok"))).cast("long")).alias("meta_bad"),
            F.sum((F.col("snr_db") < 30.0).cast("long")).alias("snr_bad"),
            F.sum((~F.col("transcript_ok")).cast("long")).alias("tx_bad"),
            F.avg("rms_dbfs").alias("avg_rms_dbfs"),
        ).collect()[0]
        c_dups = (
            cur.where(F.col("fp64").isNotNull())
            .groupBy("fp64").count().where("count >= 2").count()
        )
        cur.unpersist()
        combined_runs.append(time.time() - t0)
    combined_dt = min(combined_runs)
    timings["audio_validate_curate"] = round(combined_dt, 3)
    assert int(cstats["n"]) == pipeline_n
    assert c_dups == dup_groups  # same dedup grouping as the features pass
    assert int(cstats["meta_bad"]) > 0  # verdicts genuinely computed

    # r5: VAD utterance segmentation over the same quarter shard — one
    # decode per clip, map-only (the segment_audio explode shares this
    # decode path; the stats pass is the honest per-clip cost)
    from gx_spark.audio_ops import segment_stats

    segment_runs = []
    section_ctrl["audio_segmentation"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_segmentation"].append(hw_control())
        t0 = time.time()
        seg = segment_stats(pipe_df, keep_cols=["clip_id"])
        sstats = seg.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_segments").alias("segs"),
            F.sum("speech_ms").alias("speech_ms"),
            F.max("longest_gap_ms").alias("max_gap_ms"),
        ).collect()[0]
        segment_runs.append(time.time() - t0)
    segment_dt = min(segment_runs)
    timings["audio_segmentation"] = round(segment_dt, 3)
    assert int(sstats["n"]) == pipeline_n

    # r5: fused augmentation over the same quarter shard — the standard
    # corpus-tripling recipe (noise mix at 20 dB SNR -> 1.1x speed perturb
    # -> fixed 5 s window) as ONE decode/encode pass (augment_pipeline,
    # bit-identical to the chained three-op form by test; the chained form
    # measured 157 s here — triple Arrow payload round-trips, not math);
    # wall = honest per-clip cost of the full augmentation recipe
    from gx_spark.audio_ops import augment_pipeline

    augment_runs = []
    section_ctrl["audio_augmentation"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_augmentation"].append(hw_control())
        t0 = time.time()
        aug = augment_pipeline(
            pipe_df, snr_db=20.0, speed=1.1, target_ms=5000)
        astats = aug.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("bytes").isNotNull().cast("long")).alias("ok"),
            F.sum(F.length("bytes")).alias("out_bytes"),
        ).collect()[0]
        augment_runs.append(time.time() - t0)
    augment_dt = min(augment_runs)
    timings["audio_augmentation"] = round(augment_dt, 3)
    assert int(astats["n"]) == pipeline_n
    assert 0 < int(astats["ok"]) <= pipeline_n

    # r5: level + pitch QA over the same quarter shard — BS.1770 gated
    # LUFS (truncated-IR FFT convolution K-weighting) and the framewise-
    # ACF F0 tracker; two map-only Arrow decode passes, scalars out
    from gx_spark.audio_ops import loudness_features, pitch_features

    level_runs = []
    section_ctrl["audio_level_pitch"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_level_pitch"].append(hw_control())
        t0 = time.time()
        lstats = loudness_features(pipe_df, keep_cols=["clip_id"]).agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("lufs_integrated").alias("lufs_avg"),
            F.min("gated_block_frac").alias("min_gated"),
        ).collect()[0]
        pstats = pitch_features(pipe_df, keep_cols=["clip_id"]).agg(
            F.avg("voiced_frac").alias("voiced_avg"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        level_runs.append(time.time() - t0)
    level_dt = min(level_runs)
    timings["audio_level_pitch"] = round(level_dt, 3)
    assert int(lstats["n"]) == pipeline_n == int(pstats["n"])

    # r5: clipping repair over the same quarter shard — cubic-Hermite
    # interpolation declipper; map-only decode -> repair -> re-encode,
    # clean clips pass bytes through untouched
    from gx_spark.audio_ops import declip_audio

    declip_runs = []
    section_ctrl["audio_declip"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_declip"].append(hw_control())
        t0 = time.time()
        dstats = declip_audio(pipe_df).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("bytes").isNotNull().cast("long")).alias("ok"),
            F.sum(F.col("n_clipped")).alias("repaired_samples"),
            F.sum((F.col("n_clipped") > 0).cast("long")).alias("repaired"),
        ).collect()[0]
        declip_runs.append(time.time() - t0)
    declip_dt = min(declip_runs)
    timings["audio_declip"] = round(declip_dt, 3)
    assert int(dstats["n"]) == pipeline_n
    assert 0 < int(dstats["ok"]) <= pipeline_n

    # r5: electrical QA over the same quarter shard — DC offset + mains
    # hum (six single-bin DFT dots per clip); one map-only Arrow decode
    from gx_spark.audio_ops import electrical_features

    elec_runs = []
    section_ctrl["audio_electrical"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_electrical"].append(hw_control())
        t0 = time.time()
        estats = electrical_features(pipe_df, keep_cols=["clip_id"]).agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.abs(F.col("dc_frac"))).alias("dc_avg"),
            F.max("hum_ratio").alias("hum_max"),
        ).collect()[0]
        elec_runs.append(time.time() - t0)
    elec_dt = min(elec_runs)
    timings["audio_electrical"] = round(elec_dt, 3)
    assert int(estats["n"]) == pipeline_n

    # r5: sequence packing over the WHOLE quarter shard with the
    # realistic corpus policy — stratified on the rate label, every
    # window normalized to 16 kHz at assembly (resample-at-pack), and
    # undecodable members dropped (n_bad-counted) instead of discarding
    # the window.  Assignment is a narrow metadata pass (binary column
    # pruned); the payload crosses the wire exactly once into
    # bin-aligned partitions (see audio_ops.pack_clips docstring).
    from gx_spark.audio_ops import pack_clips

    pack_src = pipe_df
    pack_n = pipeline_n
    pack_runs = []
    section_ctrl["audio_packing"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_packing"].append(hw_control())
        t0 = time.time()
        pstats2 = pack_clips(pack_src, 30000, gap_ms=200,
                             stratify_col="sr_hz",
                             resample_to=16000, skip_bad=True).agg(
            F.count(F.lit(1)).alias("bins"),
            F.sum((F.col("bytes").isNotNull()).cast("long")).alias("ok"),
            F.sum("n_clips").alias("clips"),
            F.sum("total_samples").alias("samples"),
        ).collect()[0]
        pack_runs.append(time.time() - t0)
    pack_dt = min(pack_runs)
    timings["audio_packing"] = round(pack_dt, 3)
    assert int(pstats2["bins"]) > 0 and int(pstats2["ok"]) > 0

    # r5: the same level+pitch QA as audio_level_pitch PLUS the
    # electrical probes, fused into ONE decode (qa_features) — compare
    # this wall against audio_level_pitch + audio_electrical above: the
    # gap is pure repeated decode + Arrow transfer, the fusion argument
    # measured
    from gx_spark.audio_ops import qa_features

    qa_runs = []
    section_ctrl["audio_qa_fused"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_qa_fused"].append(hw_control())
        t0 = time.time()
        qstats = qa_features(pipe_df, keep_cols=["clip_id"]).agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("lufs_integrated").alias("lufs_avg"),
            F.avg("voiced_frac").alias("voiced_avg"),
            F.max("hum_ratio").alias("hum_max"),
        ).collect()[0]
        qa_runs.append(time.time() - t0)
    qa_dt = min(qa_runs)
    timings["audio_qa_fused"] = round(qa_dt, 3)
    assert int(qstats["n"]) == pipeline_n

    # r5: corpus CMVN over the quarter shard — per-clip log-mel partials
    # from one decode, merged by a single 26-row aggregate (map-side
    # partial aggregation: only scalar triples shuffle — the north
    # rule's treeAggregate shape in DataFrame form)
    from gx_spark.audio_ops import cmvn_stats

    cmvn_runs = []
    section_ctrl["audio_cmvn"] = []
    for _ in range(2):
        jvm_gc()
        section_ctrl["audio_cmvn"].append(hw_control())
        t0 = time.time()
        cm_n, cm_means, _cm_stds = cmvn_stats(pipe_df)
        cmvn_runs.append(time.time() - t0)
    cmvn_dt = min(cmvn_runs)
    timings["audio_cmvn"] = round(cmvn_dt, 3)
    assert cm_n > 0 and len(cm_means) == 26

    # r5: the write-audit-publish ingest gate end-to-end over the quarter
    # shard — stage the batch on an audit branch (batch-sized parquet
    # write), audit it with the FULL audio suite (one decode), then
    # publish/reject (both O(1) metadata).  The bench batch carries the
    # table's planted violations, so the deterministic verdict is REJECT;
    # stage+audit dominate the wall identically on the publish path, so
    # the clips/s here is the gate's ingest throughput either way.
    import shutil as _sh
    import tempfile as _tf

    from gx_spark.iceberg import IcebergLiteTable as _ILT
    from gx_spark.wap import validate_and_publish as _wap

    wap_runs = []
    section_ctrl["audio_wap_gate"] = []
    wap_tmp = _tf.mkdtemp(prefix="gx_bench_wap_")
    try:
        for i in range(2):
            jvm_gc()
            section_ctrl["audio_wap_gate"].append(hw_control())
            t0 = time.time()
            wt = _ILT.create(os.path.join(wap_tmp, f"run{i}"),
                             pipe_df.schema)
            wr = _wap(spark, wt, pipe_df, audio_suite(),
                      EngineOptions(
                          unexpected_index_column_names=("clip_id",)))
            wap_runs.append(time.time() - t0)
            assert not wr.published and wr.rejected_tag is not None
            assert wt.read(spark).count() == 0  # main never saw the batch
            assert wt.read(spark, ref=wr.rejected_tag).count() == pipeline_n
    finally:
        _sh.rmtree(wap_tmp, ignore_errors=True)
    wap_dt = min(wap_runs)
    timings["audio_wap_gate"] = round(wap_dt, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline suite+ops wall clock (validation engine, sketch mode) "
                  "+ full audio suite over bench table",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "audio_n": AUDIO_N,
        "audio_clips_per_sec": round(AUDIO_N / audio_dt, 1),
        "audio_runs_sec": [round(x, 3) for x in audio_runs],
        "audio_violation_rows": n_viol,
        "pipeline_clips_per_sec": round(pipeline_n / pipeline_dt, 1),
        "pipeline_runs_sec": [round(x, 3) for x in pipeline_runs],
        "pipeline_n": pipeline_n,
        "pipeline_dup_groups": dup_groups,
        "combined_clips_per_sec": round(pipeline_n / combined_dt, 1),
        "combined_runs_sec": [round(x, 3) for x in combined_runs],
        "segmentation_clips_per_sec": round(pipeline_n / segment_dt, 1),
        "augmentation_clips_per_sec": round(pipeline_n / augment_dt, 1),
        "level_pitch_clips_per_sec": round(pipeline_n / level_dt, 1),
        "declip_clips_per_sec": round(pipeline_n / declip_dt, 1),
        "electrical_clips_per_sec": round(pipeline_n / elec_dt, 1),
        "packing_clips_per_sec": round(pack_n / pack_dt, 1),
        "qa_fused_clips_per_sec": round(pipeline_n / qa_dt, 1),
        "cmvn_clips_per_sec": round(pipeline_n / cmvn_dt, 1),
        "cmvn_frames_total": int(cm_n),
        "wap_gate_clips_per_sec": round(pipeline_n / wap_dt, 1),
        "wap_gate_outcome": "rejected (planted violations; stage+audit "
                            "dominate both outcomes, publish/reject O(1))",
        "packing_totals": {
            "input_clips": int(pack_n),
            "bins": int(pstats2["bins"]), "ok_bins": int(pstats2["ok"]),
            "packed_samples": int(pstats2["samples"] or 0),
        },
        "declip_totals": {
            "repaired_clips": int(dstats["repaired"] or 0),
            "repaired_samples": int(dstats["repaired_samples"] or 0),
        },
        "augmentation_out_rows": int(astats["ok"]),
        "segmentation_totals": {
            "segments": int(sstats["segs"] or 0),
            "speech_ms": int(sstats["speech_ms"] or 0),
            "max_gap_ms": int(sstats["max_gap_ms"] or 0),
        },
        "combined_violations": {
            "meta": int(cstats["meta_bad"]), "snr": int(cstats["snr_bad"]),
            "transcript": int(cstats["tx_bad"]),
        },
        # noise adjudication (see the comment above bench()): full run
        # arrays per section + the pure-CPU control measured immediately
        # before each timed run.  To call plan-vs-box on a cross-round
        # delta: normalize each section's best run by its control — if
        # wall grew but control (Melem/s) dropped proportionally, the box
        # moved, not the plan.
        "section_runs_sec": {**section_runs,
                             "audio_suite": [round(x, 3) for x in audio_runs],
                             "audio_pipeline": [round(x, 3) for x in pipeline_runs],
                             "audio_validate_curate": [round(x, 3) for x in combined_runs],
                             "audio_segmentation": [round(x, 3) for x in segment_runs],
                             "audio_augmentation": [round(x, 3) for x in augment_runs],
                             "audio_level_pitch": [round(x, 3) for x in level_runs],
                             "audio_declip": [round(x, 3) for x in declip_runs],
                             "audio_electrical": [round(x, 3) for x in elec_runs],
                             "audio_packing": [round(x, 3) for x in pack_runs],
                             "audio_qa_fused": [round(x, 3) for x in qa_runs],
                             "audio_cmvn": [round(x, 3) for x in cmvn_runs],
                             "audio_wap_gate": [round(x, 3) for x in wap_runs]},
        "hardware_control": {
            "workload": "4x numpy rfft over 2^20 float64, single-threaded",
            "unit": "Melem/s",
            "per_section": section_ctrl,
        },
    }))


if __name__ == "__main__":
    main()
