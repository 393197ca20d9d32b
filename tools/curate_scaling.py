"""Scaling evidence for the ONE-DECODE validate+curate pass
(validate_and_extract_audio: north-rule verdicts + curation features +
dedup key from a single decode): same two-parallelism protocol as
tools/bench_scaling.py / tools/pipeline_scaling.py.

Usage: python tools/curate_scaling.py [table_path] [max_clips]
Writes BENCH/scaling_curate.json; the BASELINE.md section is maintained
by hand from that file (bench_scaling.py owns the main rewrite).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import build_zip, hardware_ceiling  # noqa: E402


def run_at(cores: int, table: str, zpath: str, max_clips: int) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=40g",
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=256",
        "--conf", "spark.sql.parquet.columnarReaderBatchSize=32",
        "--conf", "spark.hadoop.parquet.hadoop.vectored.io.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "tools", "curate_job.py"),
        table, str(max_clips),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"clips_per_sec"' in line:
            return json.loads(line)
    raise RuntimeError(f"no result line; stderr tail:\n{out.stderr[-2000:]}")


def run_best(cores: int, table: str, zpath: str, max_clips: int,
             repeats: int) -> dict:
    best = None
    for _ in range(repeats):
        r = run_at(cores, table, zpath, max_clips)
        print(f"local[{cores}]: {r}", flush=True)
        if best is None or r["wall_sec"] < best["wall_sec"]:
            best = r
    return best


def main() -> None:
    table = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "build", "audio", "n240000", "audio_clips.parquet")
    max_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 48000
    zpath = build_zip()
    low, high = 1, 4
    r_low = run_best(low, table, zpath, max_clips, repeats=1)
    r_high = run_best(high, table, zpath, max_clips, repeats=2)
    speedup = r_high["clips_per_sec"] / r_low["clips_per_sec"]
    hw = hardware_ceiling(2 * low, 2 * high)
    result = {
        "op": "validate+curate (verdicts + features + dedup key, one decode)",
        "low_cores": low, "high_cores": high, "n_clips": r_low["n"],
        "thr_low_clips_per_sec": r_low["clips_per_sec"],
        "thr_high_clips_per_sec": r_high["clips_per_sec"],
        "speedup": round(speedup, 2),
        "hardware_ceiling_speedup": round(hw, 2),
        "scaling_efficiency": round(speedup / (high / low), 3),
        "efficiency_vs_hardware": round(speedup / hw, 3),
    }
    print(json.dumps(result, indent=1))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_curate.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
