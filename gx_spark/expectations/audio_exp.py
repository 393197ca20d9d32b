"""Audio payload expectations (north-rule extension, no upstream analog —
SURVEY.md §2.5 'Audio payload checks').

All three share ONE derived `__audio` struct column produced by the
Arrow-batched pandas UDF (gx_spark/audio.py), and all three are
`count_via_violations`: their unexpected counts come from the fused
violations pass, so the decode (and the binary column's Arrow transfer to
Python) happens exactly ONCE per run, map-side.  Catalyst prunes the unused
`__audio` projection out of the stage-1 agg plan, which therefore never
decodes.  The binary column never enters a shuffle in either pass — only
tiny partial-agg rows and violation structs move (plan-shape tested).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..audio import make_audio_flags_udf
from ..model import ExpectationConfiguration
from ..planner import MetricContext
from ..registry import register_expectation
from .base import ColumnMapExpectation, require_columns

_AUDIO_COL = "__audio"


def ensure_audio_flags(ctx: MetricContext, cfg: ExpectationConfiguration) -> None:
    k = cfg.kwargs
    cols = dict(
        clip_id=k.get("clip_id_column", "clip_id"),
        bytes=k.get("bytes_column", "bytes"),
        sr_hz=k.get("sr_column", "sr_hz"),
        dur_ms=k.get("dur_column", "dur_ms"),
        codec=k.get("codec_column", "codec"),
        transcript=k.get("transcript_column", "transcript"),
    )
    require_columns(ctx, *cols.values())
    udf = make_audio_flags_udf()
    ctx.derived_column(
        _AUDIO_COL,
        udf(*[F.col(c) for c in cols.values()]),
    )


@register_expectation("expect_audio_metadata_to_be_consistent")
class AudioMetadataConsistent(ColumnMapExpectation):
    """Unexpected when the payload fails to decode, the embedded header
    sample-rate disagrees with `sr_hz`, or the decoded frame count disagrees
    with `sr_hz * dur_ms` (truncation)."""

    metric_name = "audio.metadata_consistent"
    count_via_violations = True

    def plan(self, ctx, cfg, index):
        cfg.kwargs.setdefault("column", cfg.kwargs.get("bytes_column", "bytes"))
        ensure_audio_flags(ctx, cfg)
        return super().plan(ctx, cfg, index)

    def unexpected_condition(self, cfg, ctx) -> Column:
        a = F.col(_AUDIO_COL)
        ok = (
            a["decodable"]
            & F.coalesce(a["header_sr_ok"], F.lit(True))
            & F.coalesce(a["dur_ok"], F.lit(True))
        )
        return ~F.coalesce(ok, F.lit(False))

    def observed_expr(self, cfg) -> Column:
        a = F.col(_AUDIO_COL)
        return F.to_json(
            F.struct(
                a["decodable"].alias("decodable"),
                a["header_sr"].alias("header_sr"),
                a["n_samples"].alias("n_samples"),
            )
        )


@register_expectation("expect_audio_snr_to_be_at_least")
class AudioSnrAtLeast(ColumnMapExpectation):
    """Decoded PCM vs the deterministic reference re-synthesis:
    SNR >= min_snr_db (default 30, per BASELINE.json's per-row invariant).
    Non-decodable codecs are metadata-only and excluded (snr_db null)."""

    metric_name = "audio.snr"
    count_via_violations = True

    def plan(self, ctx, cfg, index):
        cfg.kwargs.setdefault("column", cfg.kwargs.get("bytes_column", "bytes"))
        ensure_audio_flags(ctx, cfg)
        return super().plan(ctx, cfg, index)

    def unexpected_condition(self, cfg, ctx) -> Column:
        thr = float(cfg.kwargs.get("min_snr_db", 30.0))
        s = F.col(_AUDIO_COL)["snr_db"]
        return s.isNotNull() & (s < F.lit(thr))

    def observed_expr(self, cfg) -> Column:
        return F.round(F.col(_AUDIO_COL)["snr_db"], 2)


@register_expectation("expect_transcript_to_match_reference")
class TranscriptMatchesReference(ColumnMapExpectation):
    """Transcript equality vs the deterministic reference (computed in the
    same pandas UDF batch as the audio decode)."""

    metric_name = "audio.transcript_match"
    count_via_violations = True

    def plan(self, ctx, cfg, index):
        # target column is the transcript itself (null transcripts are a
        # not_be_null concern, excluded from this denominator)
        cfg.kwargs.setdefault("column", cfg.kwargs.get("transcript_column", "transcript"))
        ensure_audio_flags(ctx, cfg)
        return super().plan(ctx, cfg, index)

    def unexpected_condition(self, cfg, ctx) -> Column:
        return ~F.coalesce(F.col(_AUDIO_COL)["transcript_ok"], F.lit(False))

    def observed_expr(self, cfg) -> Column:
        return F.col(cfg.kwargs.get("column", "transcript"))
