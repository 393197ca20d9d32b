from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDIO_N = 800
AUDIO_DIR = os.path.join(REPO, "build", "audio", f"n{AUDIO_N}")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("gx-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def audio_dir():
    from tools.gen_audio import generate_small, table_is_current

    if not table_is_current(AUDIO_DIR):
        import shutil

        shutil.rmtree(AUDIO_DIR, ignore_errors=True)
        generate_small(AUDIO_N, AUDIO_DIR, p_partitions=16)
    return AUDIO_DIR


@pytest.fixture(scope="session")
def audio_df(spark, audio_dir):
    return spark.read.parquet(f"{audio_dir}/audio_clips.parquet")
