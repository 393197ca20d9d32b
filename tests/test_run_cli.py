"""spark-submit CLI (gx_spark/run.py) over parquet dirs AND Iceberg-lite
tables: auto-detection, snapshot pinning, incremental slices."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark.iceberg import IcebergLiteTable  # noqa: E402
from gx_spark.run import main as run_main  # noqa: E402
from tests.conftest import audio_dir, spark  # noqa: F401,E402


def _run(capsys, *argv):
    rc = run_main(list(argv))
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    return rc, json.loads(out[-1])


def test_cli_iceberg_autodetect_and_incremental(spark, audio_dir, tmp_path,
                                                capsys):
    loc = str(tmp_path / "audio_ice")
    t = IcebergLiteTable.create_from_parquet(
        loc, f"{audio_dir}/audio_clips.parquet")
    s1 = t.current_snapshot_id()
    results = str(tmp_path / "out")

    rc, res = _run(capsys, "--table-path", loc, "--suite", "audio",
                   "--results-dir", results)
    assert rc == 0
    assert res["snapshot_id"] == str(s1)
    assert len(res["validated_partitions"]) > 0

    # second run over the same snapshot: everything checkpoint-skipped
    rc, res2 = _run(capsys, "--table-path", loc, "--suite", "audio",
                    "--results-dir", results)
    assert res2["validated_partitions"] == []
    assert sorted(res2["skipped_partitions"]) == sorted(res["validated_partitions"])

    # append a slice, validate ONLY the new files via --incremental-from
    new_rows = t.read(spark).limit(8)
    t.append(new_rows)
    rc, res3 = _run(capsys, "--table-path", loc, "--suite", "audio",
                    "--results-dir", results,
                    "--incremental-from", str(s1))
    assert rc == 0
    assert "-inc-" in res3["snapshot_id"]
    assert len(res3["validated_partitions"]) > 0


def test_cli_parquet_dir_rejects_iceberg_flags(audio_dir, tmp_path, capsys):
    import pytest

    with pytest.raises(SystemExit):
        run_main(["--table-path", f"{audio_dir}/audio_clips.parquet",
                  "--suite", "audio",
                  "--results-dir", str(tmp_path / "o"),
                  "--incremental-from", "5"])
