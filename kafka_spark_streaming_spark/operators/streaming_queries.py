"""Streaming-backed registered queries.

Each of these runs a REAL Structured Streaming query (file-stream
source standing in for Kafka, trigger(availableNow=True) to drain
deterministically), folds it to final state, and returns that state as
a DataFrame — so the DuckDB oracle can check batch≡stream equivalence
(SURVEY.md §5.3, "what's hard" #2).

Wall-clock elements are made deterministic by injecting a fixed clock
into the pipeline (epoch 1700000000 → 2023/11/14 22:13 UTC).
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_spark_streaming_spark.operators.registry import register
from kafka_spark_streaming_spark.sources.files import file_stream_messages
from kafka_spark_streaming_spark.streaming.pipeline import (
    StreamerConfig,
    StreamerPipeline,
)
from kafka_spark_streaming_spark.streaming.stateful import (
    fold_snapshots_to_final,
    multi_batch_events_stream,
    user_lifetime_stats,
)
from kafka_spark_streaming_spark.streaming.windows import (
    sessionized_counts,
    windowed_counts,
)
from kafka_spark_streaming_spark.tables import MESSAGES_ORACLE_SQL

_M = f"WITH messages AS ({MESSAGES_ORACLE_SQL})"
_seq = itertools.count()


def _events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def _drain_to_memory(stream_df: DataFrame, mode: str) -> DataFrame:
    """Run a streaming DF to completion into a memory sink; return the
    final table."""
    name = f"kss_mem_{os.getpid()}_{next(_seq)}"
    ckpt = tempfile.mkdtemp(prefix="kss_ckpt_")
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


# --- streaming aggregation folded to final state -------------------------
@register(
    "s_stream_value_counts",
    f"{_M} SELECT value, COUNT(*) AS n FROM messages GROUP BY value",
)
def s_stream_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = file_stream_messages(spark, _events_path(sf_dir))
    agg = msgs.groupBy("value").agg(F.count(F.lit(1)).alias("n"))
    return _drain_to_memory(agg, "complete")


# --- event-time tumbling windows (phase 2) -------------------------------
@register(
    "s_windowed_counts",
    f"""
    {_M}
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS bucket,
           value, COUNT(*) AS n
    FROM messages GROUP BY 1, 2
    """,
)
def s_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = file_stream_messages(spark, _events_path(sf_dir))
    return _drain_to_memory(windowed_counts(msgs, "1 hour"), "complete")


# --- event-time session windows (phase 2) --------------------------------
# Gap-based sessions via session_window: state merges adjacent events
# per key until a 30-min silence. The oracle is the batch gaps-and-
# islands equivalent (lag → gap flag → running sum = session id) with
# Spark's window semantics: a new session starts when the gap is >= the
# timeout, and session end = last event + timeout.
@register(
    "s_session_counts",
    f"""
    {_M},
    m AS (SELECT key, ts FROM messages WHERE key IS NOT NULL),
    flagged AS (
      SELECT key, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts)
                    >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      FROM m),
    sess AS (
      SELECT key, ts,
             SUM(new_sess) OVER (PARTITION BY key ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT key,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS sess_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY key, sid
    """,
)
def s_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = file_stream_messages(spark, _events_path(sf_dir))
    return _drain_to_memory(
        sessionized_counts(msgs, gap="30 minutes"), "complete"
    )


# --- streaming dedup (T5, cross-batch) -----------------------------------
@register(
    "s_stream_distinct",
    f"{_M} SELECT DISTINCT key, value FROM messages",
)
def s_stream_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = file_stream_messages(spark, _events_path(sf_dir))
    distinct = msgs.select("key", "value").dropDuplicates(["key", "value"])
    return _drain_to_memory(distinct, "append")


# --- stream-static enrichment join ---------------------------------------
# The third streaming join shape (next to stream-stream and stateful):
# each micro-batch broadcast-joins against a static dimension — no
# state, the dim is re-resolvable per batch. Here the dim is a
# batch-computed user→cohort table; at scale it is the classic
# "enrich events with user metadata" pattern where the dim broadcast
# replaces any shuffle of the stream.
@register(
    "s_stream_static_enrich",
    """
    WITH dim AS (
      SELECT user_id, user_id % 7 AS cohort
      FROM (SELECT DISTINCT user_id FROM events))
    SELECT cohort, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4dec
    FROM events e JOIN dim USING (user_id)
    GROUP BY cohort
    """,
)
def s_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_spark_streaming_spark.sources.files import file_stream_events
    from kafka_spark_streaming_spark.tables import table

    dim = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("cohort", F.col("user_id") % 7)
    )
    stream = file_stream_events(spark, _events_path(sf_dir))
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("bigint"))
            .cast("bigint")
            .alias("sum_value_4dec"),
        )
    )
    return _drain_to_memory(agg, "complete")


# --- streaming dedup with watermark-bounded state ------------------------
# dropDuplicatesWithinWatermark: the scale-safe upgrade of
# s_stream_distinct — state for a (key, value) is evicted once the
# watermark passes its event time + delay, so state size is bounded by
# the delay window instead of growing with history. Drained as a
# single availableNow batch the watermark starts at epoch 0, nothing
# evicts mid-batch, and the emitted set equals batch DISTINCT — which
# is what makes it oracle-checkable.
@register(
    "s_dedup_within_watermark",
    f"{_M} SELECT DISTINCT key, value FROM messages",
)
def s_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_spark_streaming_spark.streaming.windows import (
        dedup_within_watermark,
    )

    msgs = file_stream_messages(spark, _events_path(sf_dir))
    dd = dedup_within_watermark(msgs, watermark="2 hours").select(
        "key", "value"
    )
    return _drain_to_memory(dd, "append")


# --- the full Streamer pipeline → sink state ----------------------------
# End-to-end: stream → foreachBatch summary + bulk upsert → LWW cell
# store; the returned DF is the sink's final state. Oracle rebuilds the
# same cells relationally.
@register(
    "s_pipeline_sink_state",
    # Cells are keyed by (rowkey, cf, qualifier); all values of one key
    # collapse into the key's cell, LWW tie-break = max(value) — exactly
    # what the reference's HBase writes would have converged to.
    f"""
    {_M}
    SELECT '1700000000-' || key AS rowkey, 'cf1' AS cf,
           'content' AS qualifier,
           key || '--|--' || MAX(value) AS value
    FROM messages WHERE key IS NOT NULL GROUP BY key
    UNION ALL
    SELECT '1700000000-kafka empty message', 'cf1', 'content',
           'kafka empty message'
    WHERE EXISTS (SELECT 1 FROM ({MESSAGES_ORACLE_SQL}) WHERE key IS NULL)
    UNION ALL
    SELECT '1700000000', 'cf1', 'messages',
           'Spark - date: 2023/11/14 22:13 - number of RDD (batches): 0'
           || ' - number of message in this RDD: '
           || CAST(COUNT(*) AS VARCHAR)
    FROM messages
    """,
)
def s_pipeline_sink_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = tempfile.mkdtemp(prefix="kss_pipe_")
    cfg = StreamerConfig(
        table_path=os.path.join(work, "cells"),
        bulk=True,
        clock=lambda: 1700000000,
    )
    pipe = StreamerPipeline(spark, cfg)
    msgs = file_stream_messages(spark, _events_path(sf_dir))
    q = pipe.start(msgs, checkpoint=os.path.join(work, "ckpt"))
    q.awaitTermination()
    return pipe.sink.current().select("rowkey", "cf", "qualifier", "value")


# --- custom stateful operator: per-user lifetime stats -------------------
# applyInPandasWithState across 4 real micro-batches; the oracle is the
# equivalent one-shot batch aggregate (batch≡stream). Exact-integer
# state folds make the equivalence bit-for-bit.
@register(
    "s_stateful_user_stats",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4dec,
           CAST(epoch_us(MAX(ts)) // 1000000 AS BIGINT) AS last_ts_epoch
    FROM events GROUP BY user_id
    """,
)
def s_stateful_user_stats(
    spark: SparkSession, sf_dir: str, n_batches: int = 4
) -> DataFrame:
    stream = multi_batch_events_stream(spark, sf_dir, n_batches=n_batches)
    # State-store count is fixed at stream start from
    # spark.sql.shuffle.partitions and never AQE-coalesced; per-batch
    # cost has a fixed floor per store (task + commit + Arrow hop).  On
    # a cluster you size this to executors; for the local micro-batch
    # drain, 8 stores cuts 4×32 tiny state tasks to 4×8.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        snapshots = _drain_to_memory(user_lifetime_stats(stream), "update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return fold_snapshots_to_final(snapshots)


# --- stream-stream join: purchases ⋈ prior clicks within 1 h -------------
# Both sides are watermarked streams; Spark buffers exactly the state
# the time-range condition needs (clicks ≤ 1 h older than the purchase
# watermark) and evicts the rest — bounded state at any scale. Input
# files are time-ordered, so nothing is late and the drained result
# equals the batch join bit-for-bit (oracle below).
@register(
    "s_stream_stream_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS user_id,
           CAST(epoch_us(p.ts) // 1000000
                - epoch_us(c.ts) // 1000000 AS BIGINT) AS gap_s
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
    ORDER BY purchase_id, click_id
    """,
)
def s_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = multi_batch_events_stream(spark, sf_dir, n_batches=4)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    out = joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("gap_s"),
    )
    return _drain_to_memory(out, "append").orderBy("purchase_id", "click_id")


# --- incremental materialized rollup (foreachBatch ETL) ------------------
# Maintains a daily rollup incrementally: each micro-batch appends its
# per-day PARTIAL aggregate stamped with batch_id; the read side
# dedups (day, batch_id) — so a foreachBatch retry replaying a batch
# cannot double-count — and folds partials to the rollup. Append-only
# writes + exact-integer partials make this the idempotent,
# shuffle-light way to keep a 100 TB rollup current: per batch it
# shuffles |batch| rows to |days touched| partials, never rescans
# history.
@register(
    "s_incremental_daily_rollup",
    """
    SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4dec
    FROM events GROUP BY 1 ORDER BY d
    """,
)
def s_incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="kss_rollup_") + "/partials"
    stream = multi_batch_events_stream(spark, sf_dir, n_batches=4)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(F.col("ts").cast("date").alias("d"))
            .agg(
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.round(F.col("value") * 10000).cast("long")).alias(
                    "ps"
                ),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    q = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kss_rck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.read.parquet(out).dropDuplicates(["d", "batch_id"])
    return (
        partials.groupBy("d")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("ps").alias("sum_value_4dec"),
        )
        .orderBy("d")
    )
