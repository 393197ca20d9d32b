"""Deterministic audio_clips fixture generator (FIXTURES.md §1).

Builds the north-rule input table
  (clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
   transcript string, part_id int)
with ~2% injected violations across 9 disjoint row-level classes, plus:
  - expected_violations.parquet  (clip_id, expectation_type, column) sidecar
  - speakers.parquet / clip_speakers.parquet (referential-integrity layer,
    ~0.5% orphan speaker_ids)
  - expected_aggregates.json (gentime pins for aggregate expectations)

All randomness is crc32-keyed off clip_id (seed-free, reproducible row-wise,
so generation parallelizes embarrassingly).  Uses gx_spark.audio's synthesis
as the single source of truth — the engine's SNR check re-synthesizes with
the same functions.

CLI:  python tools/gen_audio.py N OUT_DIR [P]
Big N generation runs through Spark mapInPandas (32-way parallel);
small N (<=20k) writes directly via pyarrow.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gx_spark.audio import (  # noqa: E402
    CONVENTIONS_VERSION,
    DECODABLE_CODECS,
    crc,
    encode_payload,
    ref_codec,
    ref_dur_ms,
    ref_sr_hz,
    ref_transcript,
    synth_pcm,
    wav_encode,
)

N_SPEAKERS = 200
ORPHAN_PER_MILLE = 5  # ~0.5% orphan FK rows
VIOL_PER_MILLE = 20  # ~2% row-level violations
DRIFT_DUR_SHIFT = 600  # ms added to the drifted partition


def table_is_current(out_dir: str) -> bool:
    """True when a generated table exists AND was produced under the current
    payload/codec conventions (meta.json carries CONVENTIONS_VERSION — a
    stale cache would silently fail the sidecar-exact-match tests)."""
    meta = os.path.join(out_dir, "meta.json")
    if not (os.path.exists(meta)
            and os.path.exists(os.path.join(out_dir, "expected_aggregates.json"))):
        return False
    try:
        with open(meta) as f:
            return json.load(f).get("conventions") == CONVENTIONS_VERSION
    except (OSError, json.JSONDecodeError):
        return False


def violation_class(orig_id: str) -> int | None:
    v = crc(orig_id + "viol") % 1000
    return (v % 9) if v < VIOL_PER_MILLE else None


def speaker_for(clip_id: str) -> str:
    if crc(clip_id + "orph") % 1000 < ORPHAN_PER_MILLE:
        return f"spk_9{crc(clip_id + 'orphid') % 1000:03d}"  # outside dim range
    return f"spk_{crc(clip_id + 'spk') % N_SPEAKERS:04d}"


def gen_row(i: int, p_partitions: int) -> tuple[dict, list[tuple[str, str, str]]]:
    """One table row + its sidecar entries."""
    orig_id = f"clip_{i:010d}"
    cls = violation_class(orig_id)
    clip_id = orig_id
    sidecar: list[tuple[str, str, str]] = []

    if cls == 1 and i > 0:  # duplicate clip_id: reuse previous row's id
        clip_id = f"clip_{i - 1:010d}"
        sidecar.append((clip_id, "expect_column_values_to_be_unique", "clip_id"))
    elif cls == 3:  # malformed id
        clip_id = f"CLIP-x-{i:010d}"
        sidecar.append((clip_id, "expect_column_values_to_match_regex", "clip_id"))

    sr = ref_sr_hz(clip_id)
    dur = ref_dur_ms(clip_id)
    codec = ref_codec(clip_id)
    transcript: str | None = ref_transcript(clip_id)
    part_id = crc(clip_id) % p_partitions

    if part_id == p_partitions - 1:  # drifted partition (distribution shift)
        dur += DRIFT_DUR_SHIFT

    header_sr = sr
    if cls == 0:
        transcript = None
        sidecar.append((clip_id, "expect_column_values_to_not_be_null", "transcript"))
    elif cls == 2:
        codec = "mp3"
        sidecar.append((clip_id, "expect_column_values_to_be_in_set", "codec"))
        # an unrecognized codec label is also a metadata-consistency failure:
        # the engine cannot certify the payload (decodable=False)
        sidecar.append((clip_id, "expect_audio_metadata_to_be_consistent", "bytes"))
    elif cls == 4:
        sr = 3000
        header_sr = 3000
        sidecar.append((clip_id, "expect_column_values_to_be_between", "sr_hz"))
    elif cls == 5 and codec in DECODABLE_CODECS:  # header/metadata mismatch
        header_sr = sr * 2
        sidecar.append((clip_id, "expect_audio_metadata_to_be_consistent", "bytes"))
    elif cls == 8:  # wrong transcript: swap first two words
        w = transcript.split(" ")
        w[0], w[1] = w[1], w[0]
        transcript = " ".join(w)
        sidecar.append((clip_id, "expect_transcript_to_match_reference", "transcript"))

    if codec in DECODABLE_CODECS or codec == "mp3":
        pcm = synth_pcm(clip_id, sr, dur)
        if cls == 6:  # truncated payload
            pcm = pcm[: int(len(pcm) * 0.75)]
            sidecar.append((clip_id, "expect_audio_metadata_to_be_consistent", "bytes"))
        elif cls == 7:  # corrupted PCM at ~ -15 dB SNR
            rng = np.random.default_rng(crc(clip_id + "noise"))
            rms = np.sqrt(np.mean(pcm.astype(np.float64) ** 2)) or 1.0
            amp = rms * (10 ** (15.0 / 20.0)) * np.sqrt(3)  # uniform var = a^2/3
            noise = rng.uniform(-amp, amp, size=len(pcm))
            pcm = np.clip(pcm.astype(np.float64) + noise, -32768, 32767).astype(np.int16)
            sidecar.append((clip_id, "expect_audio_snr_to_be_at_least", "bytes"))
        # mp3 = mislabeled-codec violation class: the payload is a WAV the
        # engine cannot certify under that label
        b = (wav_encode(pcm, header_sr) if codec == "mp3"
             else encode_payload(pcm, header_sr, codec))
    else:
        # opus: REAL Ogg-Opus container (gx_spark.oggopus — page CRCs,
        # OpusHead, granule duration), packet payloads opaque.  Container-
        # level corruption classes mirror the decodable codecs' 5/6:
        from gx_spark.oggopus import ogg_opus_encode

        ogg_sr = header_sr
        if cls == 5:  # OpusHead input-rate lie vs the sr_hz column
            ogg_sr = sr * 2
            sidecar.append(
                (clip_id, "expect_audio_metadata_to_be_consistent", "bytes"))
        b = ogg_opus_encode(clip_id, ogg_sr, dur)
        if cls == 6:  # truncated container -> page CRC/parse failure
            b = b[: int(len(b) * 0.6)]
            sidecar.append(
                (clip_id, "expect_audio_metadata_to_be_consistent", "bytes"))

    if speaker_for(clip_id).startswith("spk_9"):
        sidecar.append((clip_id, "expect_column_values_to_exist_in_table", "speaker_id"))

    row = {
        "clip_id": clip_id, "bytes": b, "sr_hz": sr, "dur_ms": dur,
        "codec": codec, "transcript": transcript, "part_id": part_id,
    }
    return row, sidecar


def _arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("clip_id", pa.string()), ("bytes", pa.binary()),
            ("sr_hz", pa.int32()), ("dur_ms", pa.int32()),
            ("codec", pa.string()), ("transcript", pa.string()),
            ("part_id", pa.int32()),
        ]
    )


def generate_small(n: int, out_dir: str, p_partitions: int = 16) -> None:
    """Direct pyarrow path for unit/integration scales."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rows, sidecar = [], []
    for i in range(n):
        r, s = gen_row(i, p_partitions)
        rows.append(r)
        sidecar.extend(s)
    table = pa.Table.from_pylist(rows, schema=_arrow_schema())
    pq.write_table(table, f"{out_dir}/audio_clips.parquet")
    _write_sidecars(out_dir, sidecar, p_partitions)


def generate_spark(spark, n: int, out_dir: str, p_partitions: int = 64) -> None:
    """Parallel generation through mapInPandas for bench scales."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string, part_id int"
    )

    def gen(batches):
        # yield small chunks: one 10k-row pandas batch of ~66KB clips would
        # be a ~660MB Arrow batch; 32 concurrent tasks exhaust netty direct
        # memory.  500 rows ≈ 33MB per in-flight batch.
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            for j in range(0, len(ids), 500):
                out = [gen_row(i, p_partitions)[0] for i in ids[j : j + 500]]
                yield pd.DataFrame(out)

    n_tasks = max(64, n // 10000)
    df = spark.range(0, n, 1, n_tasks).mapInPandas(gen, schema)
    df.write.mode("overwrite").parquet(f"{out_dir}/audio_clips.parquet")
    # sidecar entries are cheap (no audio): single process
    sidecar = []
    for i in range(n):
        sidecar.extend(gen_row_sidecar_only(i, p_partitions))
    _write_sidecars(out_dir, sidecar, p_partitions)


def gen_row_sidecar_only(i: int, p_partitions: int) -> list[tuple[str, str, str]]:
    """Sidecar entries without synthesizing audio (fast path for big N)."""
    orig_id = f"clip_{i:010d}"
    cls = violation_class(orig_id)
    clip_id = orig_id
    out: list[tuple[str, str, str]] = []
    if cls == 1 and i > 0:
        clip_id = f"clip_{i - 1:010d}"
        out.append((clip_id, "expect_column_values_to_be_unique", "clip_id"))
    elif cls == 3:
        clip_id = f"CLIP-x-{i:010d}"
        out.append((clip_id, "expect_column_values_to_match_regex", "clip_id"))
    mapping = {
        0: ("expect_column_values_to_not_be_null", "transcript"),
        2: ("expect_column_values_to_be_in_set", "codec"),
        4: ("expect_column_values_to_be_between", "sr_hz"),
        5: ("expect_audio_metadata_to_be_consistent", "bytes"),
        8: ("expect_transcript_to_match_reference", "transcript"),
    }
    codec = "mp3" if cls == 2 else ref_codec(clip_id)
    if cls in mapping and not (cls == 5 and codec not in DECODABLE_CODECS):
        out.append((clip_id,) + mapping[cls])
    if codec in DECODABLE_CODECS:
        if cls == 6:
            out.append((clip_id, "expect_audio_metadata_to_be_consistent", "bytes"))
        elif cls == 7:
            out.append((clip_id, "expect_audio_snr_to_be_at_least", "bytes"))
    if speaker_for(clip_id).startswith("spk_9"):
        out.append((clip_id, "expect_column_values_to_exist_in_table", "speaker_id"))
    return out


def _write_sidecars(out_dir: str, sidecar: list, p_partitions: int) -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    sc_schema = pa.schema(
        [("clip_id", pa.string()), ("expectation_type", pa.string()), ("column", pa.string())]
    )
    pq.write_table(
        pa.Table.from_pylist(
            [dict(zip(("clip_id", "expectation_type", "column"), s)) for s in sidecar],
            schema=sc_schema,
        ),
        f"{out_dir}/expected_violations.parquet",
    )
    # speakers dim + clip_speakers fact
    speakers = [{"speaker_id": f"spk_{i:04d}", "name": f"speaker {i}"} for i in range(N_SPEAKERS)]
    pq.write_table(pa.Table.from_pylist(speakers), f"{out_dir}/speakers.parquet")
    src = f"{out_dir}/audio_clips.parquet"
    pat = f"{src}/*.parquet" if os.path.isdir(src) else src
    con = duckdb.connect()
    clips = con.sql(f"SELECT clip_id FROM read_parquet('{pat}')").fetchall()
    cs = [{"clip_id": c[0], "speaker_id": speaker_for(c[0])} for c in clips]
    pq.write_table(pa.Table.from_pylist(cs), f"{out_dir}/clip_speakers.parquet")
    # gentime aggregate pins (computed by DuckDB — independent of the engine)
    aggs = con.sql(
        f"""
        SELECT count(*) AS row_count,
               avg(dur_ms) AS mean_dur_ms,
               stddev_samp(dur_ms) AS stdev_dur_ms,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY dur_ms) AS q25_dur_ms,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY dur_ms) AS q50_dur_ms,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY dur_ms) AS q75_dur_ms,
               count(DISTINCT sr_hz) AS distinct_sr,
               count(DISTINCT clip_id) * 1.0 / count(clip_id) AS uniq_prop_clip_id
        FROM read_parquet('{pat}')
        """
    ).fetchall()[0]
    names = ["row_count", "mean_dur_ms", "stdev_dur_ms", "q25_dur_ms", "q50_dur_ms",
             "q75_dur_ms", "distinct_sr", "uniq_prop_clip_id"]
    with open(f"{out_dir}/expected_aggregates.json", "w") as f:
        json.dump({k: (float(v) if v is not None else None) for k, v in zip(names, aggs)},
                  f, indent=1)
    with open(f"{out_dir}/meta.json", "w") as f:
        json.dump({"p_partitions": p_partitions,
                   "conventions": CONVENTIONS_VERSION}, f)


if __name__ == "__main__":
    n = int(sys.argv[1])
    out = sys.argv[2]
    p = int(sys.argv[3]) if len(sys.argv) > 3 else (16 if n <= 20000 else 64)
    if n <= 20000:
        generate_small(n, out, p)
    else:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
        generate_spark(spark, n, out, p)
    print(f"generated N={n} at {out}")
