"""Session verify script (per .claude/skills/verify): fresh process,
entry() contract, one queries()/oracle_sql() pair run the driver's way,
and the fused augment_pipeline cross-checked arithmetically."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.sql.parquet.columnarReaderBatchSize", "32")
    .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import importlib.util

spec = importlib.util.spec_from_file_location("entrymod",
                                              "/root/repo/__spark_entry__.py")
entrymod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entrymod)

# 1. entry() contract
edf = entrymod.entry(spark)
erows = edf.count()
print(f"entry(): {erows} rows, schema={[f.name for f in edf.schema.fields]}")
assert erows >= 0

# 2. driver-style queries()/oracle pair: audio_augment_noise (changed area)
qname = "audio_augment_noise"
qdf = entrymod.queries()[qname](spark, SF).orderBy("doc_id")
spark_rows = [tuple(r) for r in qdf.collect()]
cols = qdf.columns

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
osql = entrymod.oracle_sql()[qname]
orows = con.sql(osql).fetchall()
od = {r[0]: r for r in orows}
sd = {r[0]: r for r in spark_rows}
assert set(od) == set(sd), (set(od) ^ set(sd))
mismatch = 0
for k in od:
    for a, b in zip(od[k], sd[k]):
        if isinstance(a, float):
            if not (abs(a - b) <= 1e-6 * max(1.0, abs(a))):
                mismatch += 1
        elif a != b:
            mismatch += 1
print(f"{qname}: {len(spark_rows)} rows vs oracle {len(orows)}, "
      f"mismatched cells={mismatch}, cols={cols}")
assert mismatch == 0

# 3. fused augment_pipeline end-to-end on a synthesized table
from gx_spark.audio import encode_payload, synth_pcm
from gx_spark.audio_ops import augment_pipeline

SR = 16000
rows = []
srcs = {}
for i in range(2):
    cid = f"v{i}"
    pcm = synth_pcm(cid, SR, 500)
    srcs[cid] = pcm
    rows.append((cid, bytearray(encode_payload(pcm, SR, "pcm_s16le")),
                 SR, 500, "pcm_s16le"))
df = spark.createDataFrame(
    rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
out = {r["clip_id"]: r.asDict() for r in augment_pipeline(
    df, snr_db=20.0, speed=1.1, target_ms=1000).collect()}
from gx_spark.audio import decode_payload

for cid, r in out.items():
    sr2, pcm2 = decode_payload(bytes(r["bytes"]), r["codec"])
    assert sr2 == SR and len(pcm2) == SR  # exactly 1000 ms window
    assert r["dur_ms"] == 1000
    # noise floor: 20 dB below the source clip's own RMS
    src = srcs[cid]
    src_db = 20 * np.log10(np.sqrt(np.mean(
        (src.astype(np.float64) / 32768.0) ** 2)))
    got = r["noise_rms_dbfs"]
    print(f"{cid}: noise_rms_dbfs={got:.2f} expected~{src_db - 20:.2f}")
    assert abs(got - (src_db - 20.0)) < 1.0
# 4. payload-size expectation over an adpcm row through validate()
from gx_spark import EngineOptions, ExpectationSuite, validate

n = SR // 2
pcm = srcs["v0"][:n]
row = [("z0", bytearray(encode_payload(pcm, SR, "adpcm_ima")), SR,
        n * 1000 // SR, "adpcm_ima"),
       ("z_bad", bytearray(encode_payload(pcm, SR, "adpcm_ima")[:-256]),
        SR, n * 1000 // SR, "adpcm_ima")]
vdf = spark.createDataFrame(
    row, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
suite = ExpectationSuite("sz").add(
    "expect_audio_payload_size_to_be_consistent")
b = validate(spark, vdf, suite,
             EngineOptions(unexpected_index_column_names=("clip_id",)))
r = b.suite_result.results[0]
viol = {v["clip_id"] for v in b.violations_table().collect()}
b.unpersist()
print("payload-size EVR:", r.expectation_config.expectation_type,
      "success=", r.success, "unexpected=", r.result["unexpected_count"],
      "violations=", viol)
assert viol == {"z_bad"} and r.result["unexpected_count"] == 1
# DuckDB cross-check of the expected length arithmetic
exp_len = con.sql(
    f"SELECT 60 + 256 * CAST(CEIL({n} / 505.0) AS INT)").fetchone()[0]
assert exp_len == len(row[0][1]), (exp_len, len(row[0][1]))
print("adpcm length arithmetic matches DuckDB:", exp_len)
print("VERIFY OK")
spark.stop()
