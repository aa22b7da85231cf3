"""Event-time / stateful streaming operators (SURVEY.md §7 phase 2).

The reference has zero event-time handling — all its time is
processing-time wall clock (Streamer.scala:129) and it keeps no state.
These are the streaming-native operators the north star adds, all
built-in Structured Streaming:

- tumbling/sliding windowed aggregation with watermark (late data drop)
- session windows (gap-based)
- cross-batch dedup bounded by watermark

Each takes a streaming messages/events DF and returns a streaming DF;
callers pick output mode + sink. State is keyed by (window, group) and
partitioned by Spark's stateful operator — scales horizontally with
executors, bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    messages: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, value) counts with late-data bound."""
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        messages.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), F.col("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("bucket"),
            "value",
            "n",
        )
    )


def sessionized_counts(
    messages: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per key (session_window, stateful)."""
    return (
        messages.filter(F.col("key").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            F.date_format("sess.start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            F.date_format("sess.end", "yyyy-MM-dd HH:mm:ss").alias("sess_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    messages: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Cross-batch (key,value) dedup with state bounded by the
    watermark — the streaming-native upgrade of the reference's
    per-batch x.distinct() (Streamer.scala:173,197)."""
    return messages.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["key", "value"]
    )
