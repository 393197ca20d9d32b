"""Canonical suites, including the north-rule audio validation suite used by
tests, the checkpoint runner, and the benchmark."""

from __future__ import annotations

from .model import ExpectationSuite

AUDIO_CODECS = ["pcm_s16le", "flac", "pcm_mulaw", "pcm_alaw", "opus"]
CLIP_ID_REGEX = r"^clip_\d{10}$"


def audio_suite(min_snr_db: float = 30.0) -> ExpectationSuite:
    """The full north-rule expectation suite over the audio_clips table
    (BASELINE.json north_star): schema/stat constraints + audio payload
    checks.  Violation classes map 1:1 to FIXTURES.md §1."""
    return (
        ExpectationSuite("audio_clips")
        .add("expect_table_row_count_to_be_between", min_value=1)
        .add("expect_column_values_to_not_be_null", column="transcript")
        .add("expect_column_values_to_be_unique", column="clip_id")
        .add("expect_column_values_to_be_in_set", column="codec", value_set=AUDIO_CODECS)
        .add("expect_column_values_to_match_regex", column="clip_id", regex=CLIP_ID_REGEX)
        .add("expect_column_values_to_be_between", column="sr_hz",
             min_value=8000, max_value=48000)
        .add("expect_audio_metadata_to_be_consistent")
        .add("expect_audio_snr_to_be_at_least", min_snr_db=min_snr_db)
        .add("expect_transcript_to_match_reference")
    )


def audio_aggregate_suite() -> ExpectationSuite:
    """Aggregate/stat expectations pinned by expected_aggregates.json."""
    return (
        ExpectationSuite("audio_aggregates")
        .add("expect_column_mean_to_be_between", column="dur_ms", min_value=0)
        .add("expect_column_stdev_to_be_between", column="dur_ms", min_value=0)
        .add("expect_column_quantile_values_to_be_between", column="dur_ms",
             quantile_ranges={"quantiles": [0.25, 0.5, 0.75]})
        .add("expect_column_unique_value_count_to_be_between", column="sr_hz",
             min_value=1, max_value=10)
        .add("expect_column_proportion_of_unique_values_to_be_between",
             column="clip_id", min_value=0.9)
    )


def audio_flag_suite(min_snr_db: float = 30.0) -> ExpectationSuite:
    """The audio suite re-expressed over validate_and_extract_audio's FLAG
    columns (run.py --curate): the expensive decode happened in the
    transform, so every check here is a plain column expectation — same
    violation classes as audio_suite, zero audio UDFs in the suite.
    Null flags (snr_db/header_sr_ok on undecodable rows) are skipped by
    map-expectation null semantics; the undecodable row itself is caught
    by the `decodable` check."""
    return (
        ExpectationSuite("audio_clips_flags")
        .add("expect_table_row_count_to_be_between", min_value=1)
        .add("expect_column_values_to_not_be_null", column="transcript")
        .add("expect_column_values_to_be_unique", column="clip_id")
        .add("expect_column_values_to_be_in_set", column="codec", value_set=AUDIO_CODECS)
        .add("expect_column_values_to_match_regex", column="clip_id", regex=CLIP_ID_REGEX)
        .add("expect_column_values_to_be_between", column="sr_hz",
             min_value=8000, max_value=48000)
        .add("expect_column_values_to_be_in_set", column="decodable",
             value_set=[True])
        .add("expect_column_values_to_be_in_set", column="header_sr_ok",
             value_set=[True])
        .add("expect_column_values_to_be_in_set", column="dur_ok",
             value_set=[True])
        .add("expect_column_values_to_be_between", column="snr_db",
             min_value=min_snr_db)
        .add("expect_column_values_to_be_in_set", column="transcript_ok",
             value_set=[True])
    )
