"""Streaming feature derivation — the Structured Streaming face of the batch
PIT operators.

The reference has no streaming semantics (SURVEY.md §2.6), so this module is
engine surface beyond parity: the SAME column expressions used in batch,
wired into readStream → watermark → window/session_window → writeStream.
Late data is bounded by the watermark; state cleanup follows from it.

These helpers return unstarted streaming DataFrames; callers attach the sink
(``.writeStream...``) — keeping them testable with any source (rate-micro-
batch locally, Kafka in production).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_windowed_features(
    events: DataFrame,
    aggs: dict[str, Column],
    on: str = "entity",
    ts: str = "event_time",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling/sliding windowed aggregates per entity over an event-time
    stream: the streaming analog of operators.windows.rolling.

    One shuffle on (entity, window); state pruned by the watermark."""
    w = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(on), w.alias("win"))
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .select(
            on,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *aggs.keys(),
        )
    )


def stream_sessionize(
    events: DataFrame,
    aggs: dict[str, Column],
    gap: str = "30 minutes",
    on: str = "entity",
    ts: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation: Spark's native ``session_window`` — the
    streaming analog of operators.windows.sessionize (which computes session
    ids in batch; here sessions close when the watermark passes the gap)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(on), F.session_window(F.col(ts), gap).alias("sess"))
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .select(
            on,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            *aggs.keys(),
        )
    )
