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

import glob
import itertools
import os
import shutil
import tempfile
import time
from contextlib import contextmanager

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
from kafka_spark_streaming_spark.operators.dedup import _SHINGLES_SQL
from kafka_spark_streaming_spark.tables import MESSAGES_ORACLE_SQL, table

_M = f"WITH messages AS ({MESSAGES_ORACLE_SQL})"
_seq = itertools.count()

# every prefix a _scratch_dir() caller uses — transient per-invocation
# dirs only; persistent cross-process caches (kss_split_*, kss_docsplit_*,
# bucketed/partitioned layouts) have their own fingerprint-based pruning
# and must NOT be matched here
_SCRATCH_PREFIXES = (
    "kss_ckpt_", "kss_pipe_", "kss_rollup_", "kss_rck_", "kss_topk_",
    "kss_tck_", "kss_hll_", "kss_hck_", "kss_increddup_", "kss_s5_",
    "kss_s5ck_", "kss_snap_", "kss_sivf_",
)


def _newest_mtime_shallow(d: str) -> float:
    """Newest mtime across the dir and its direct children (ADVICE r7
    streaming_queries.py:79): a live streaming query's top-level
    checkpoint dir mtime freezes once offsets/ and commits/ exist, but
    every micro-batch write lands a file INSIDE those children and
    advances the child dir's mtime — so a >30-min drain stays visibly
    live to the age gate without needing a full recursive walk."""
    newest = os.path.getmtime(d)
    with os.scandir(d) as entries:
        for e in entries:
            try:
                newest = max(newest, e.stat().st_mtime)
            except OSError:
                pass
    return newest


def _scratch_dir(prefix: str, min_age_s: float = 1800) -> str:
    """mkdtemp plus reclamation: every streaming query creates fresh
    drain-output/checkpoint dirs per call (bench alone = 3 timed passes
    + warmup) and nothing else ever deletes them, so /tmp would grow by
    several corpus copies per round. Before allocating, best-effort-
    remove any transient sibling whose newest shallow mtime is older
    than min_age_s — age-gated on activity, not creation, so a
    concurrent session's live drain (even one running longer than the
    threshold) is never touched (same threshold rationale as
    physical._prune_stale)."""
    assert prefix in _SCRATCH_PREFIXES, f"unregistered scratch prefix {prefix}"
    now = time.time()
    tmp = tempfile.gettempdir()
    for pref in _SCRATCH_PREFIXES:
        for d in glob.glob(os.path.join(tmp, pref + "*")):
            try:
                if now - _newest_mtime_shallow(d) >= min_age_s:
                    shutil.rmtree(d, ignore_errors=True)
            except OSError:
                pass
    return tempfile.mkdtemp(prefix=prefix)


def _events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def _drain_to_memory(stream_df: DataFrame, mode: str) -> DataFrame:
    """Run a streaming DF to completion into a memory sink; return the
    final table."""
    name = f"kss_mem_{os.getpid()}_{next(_seq)}"
    ckpt = _scratch_dir("kss_ckpt_")
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
    # 8 state-store partitions (A/B in _scoped_shuffle_partitions: this
    # query 1.26 -> 0.81 s); foreachBatch-based entries keep the
    # session default — their per-batch aggregations want parallelism
    # and measured slightly worse at 8.
    with _scoped_shuffle_partitions(spark, 8):
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
    with _scoped_shuffle_partitions(spark, 8):  # A/B: 1.27 -> 1.00 s
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
    with _scoped_shuffle_partitions(spark, 8):  # A/B: 1.86 -> 1.19 s
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
    with _scoped_shuffle_partitions(spark, 8):  # A/B: 1.08 -> 0.72 s
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
    # 7 cohorts need nowhere near 32 state stores (r17 interleaved
    # A/B at sf0.1, min-of-3: 32 → 1.44 s, 8 → 1.09 s)
    with _scoped_shuffle_partitions(spark, 8):
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
    with _scoped_shuffle_partitions(spark, 8):  # A/B: 1.78 -> 1.22 s
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
    work = _scratch_dir("kss_pipe_")
    cfg = StreamerConfig(
        table_path=os.path.join(work, "cells"),
        bulk=True,
        clock=lambda: 1700000000,
    )
    pipe = StreamerPipeline(spark, cfg)
    msgs = file_stream_messages(spark, _events_path(sf_dir))
    # drain tuning (r17 interleaved A/B at sf0.1, min-of-3, with the
    # folded per-batch count job): 32-part+AQE 2.13 s, 8-part+AQE
    # 1.97 s, 8-part no-AQE 1.74 s — the sink merge moves a few
    # thousand cells, where 32-way shuffles and AQE's per-stage jobs
    # are pure floor.  Same local-small-batch scoping rationale as
    # the incremental-dedup drain.
    with _scoped_sql_confs(spark, _small_batch_drain_confs(spark, 8)):
        q = pipe.start(msgs, checkpoint=os.path.join(work, "ckpt"))
        q.awaitTermination()
    return pipe.sink.current().select("rowkey", "cf", "qualifier", "value")


# --- sink snapshot isolation (time-travel read under vacuum) --------------
# The r18 snapshot() API's driver-gate proof: the returned DataFrame is
# a snapshot taken after the FIRST of three writes that each overwrite
# every cell — so by collect time, keep=2 pruning would have vacuumed
# the snapshot's version out from under a plain current() plan.  The
# oracle is LWW over batch 0 alone: a hash match proves both isolation
# (no b1/b2 values leak in) and the prune pin (the files are readable
# at all).
@register(
    "s_upsert_snapshot_read",
    f"""
    {_M}
    SELECT key AS rowkey, 'cf1' AS cf, 'message' AS qualifier,
           MAX('b0:' || value) AS value
    FROM messages WHERE key IS NOT NULL GROUP BY key
    """,
)
def s_upsert_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned time-travel read on the keyed-upsert sink
    (sinks/upsert.py snapshot() — VERDICT r17 #6): write batch 0,
    snapshot, then write batches 1 and 2 over the SAME rowkeys so
    every batch-0 rb partition is rewritten and v_0 leaves both the
    head manifest and the keep=2 window.  Without the snapshot pin
    the prune deletes v_0's files and this query's collect fails;
    without version isolation it returns b2 values.  Scale shape:
    three LWW merge shuffles of |keys| cells each — the snapshot
    itself adds zero Spark work (a manifest read + a pin)."""
    from kafka_spark_streaming_spark.sinks.upsert import KeyedUpsertSink
    from kafka_spark_streaming_spark.tables import messages

    from kafka_spark_streaming_spark.config import drain_fence_lease_ttl

    work = _scratch_dir("kss_snap_")
    # registered store writer -> drain lease posture (VERDICT r19 #5);
    # each write_batch commit renews the lease
    sink = KeyedUpsertSink(
        spark,
        os.path.join(work, "cells"),
        lease_ttl_s=drain_fence_lease_ttl(spark),
    )
    msgs = messages(spark, sf_dir).filter(F.col("key").isNotNull())

    def cells(tag: str) -> DataFrame:
        return msgs.select(
            F.col("key").alias("rowkey"),
            F.lit("cf1").alias("cf"),
            F.lit("message").alias("qualifier"),
            F.concat(F.lit(tag), F.col("value")).alias("value"),
        )

    # same small-batch scoping as the sibling sink drains (the three
    # LWW merges move ~|keys| cells each; A/B min-of-3 at sf0.1:
    # 2.82 s unscoped vs 2.62 s scoped)
    with _scoped_sql_confs(spark, _small_batch_drain_confs(spark, 8)):
        sink.write_batch(cells("b0:"), 0)
        snap = sink.snapshot()
        # `snap` (the pin holder) stays referenced across both later
        # writes — the prunes they trigger are the ones the pin must
        # survive; the derived select below is safe because no prune
        # can run after the last write
        sink.write_batch(cells("b1:"), 1)
        sink.write_batch(cells("b2:"), 2)
    return snap.select("rowkey", "cf", "qualifier", "value")


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
    # cost has a fixed floor per store (task + commit + Arrow hop) but
    # stores also ARE the parallelism of the Python state workers. On a
    # cluster you size this to executors; locally the measured sweet
    # spot is 16 (A/B at sf0.1, min-of-4: 4→2.75s, 8→2.03s, 16→1.79s,
    # 24→2.27s, 32→2.07s — Arrow-worker parallelism beats per-store
    # commit overhead up to half the cores, then task churn wins).
    # VERDICT r16 #4 re-decomposition (r17): 16 is still the sweet
    # spot post-r15/r16 (8→4.71s vs 16→3.60s min-of-3 same session);
    # the extra lever was AQE — per-batch plans are tiny, and AQE's
    # stage-by-stage jobs only add scheduling floor (16-part A/B:
    # on 3.99s / off 3.60s).  Same local-small-batch scoping
    # rationale as the incremental-dedup drain.
    with _scoped_sql_confs(spark, _small_batch_drain_confs(spark, 16)):
        snapshots = _drain_to_memory(
            user_lifetime_stats(stream), "update"
        )
    return fold_snapshots_to_final(snapshots)


@contextmanager
def _scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Scope spark.sql.shuffle.partitions to a streaming drain and
    restore it afterwards (exception-safe), making the partition count
    an explicit per-query decision instead of whatever the session
    default is.  Two distinct reasons to use it:

    - STATEFUL drains: the state-store count is fixed at stream start
      from this conf and never AQE-coalesced, and for JVM-side
      stateful operators the per-batch floor is dominated by per-store
      task + commit overhead.  A/B on s_stream_stream_join at sf0.1
      (min-of-2 settled, 4 batches, stores = partitions x 4 join
      state stores): 32 -> 13.3-26.7 s, 16 -> 7.2-7.6 s,
      8 -> 4.5-5.1 s, 4 -> 3.7 s, 2 -> 4.1 s; row count identical
      throughout.  Locally fewer stores win until the per-partition
      batch volume bites; on a cluster you size stores to executors
      (the applyInPandasWithState operator's Arrow workers push ITS
      sweet spot up to 16).
    - STATELESS foreachBatch drains: each batch's plans read the
      session conf at execution, so the scope also bounds ordinary
      batch shuffles — small micro-batches lose to 32-way task
      scheduling overhead (s_incremental_near_dedup A/B: 32 -> 6.57 s,
      8 -> 5.76 s).

    SINGLE-THREADED BY ASSUMPTION (ADVICE r14): this mutates the
    SHARED session conf, so overlapping scopes from concurrent query
    functions on one SparkSession would restore stale values, and a
    DataFrame returned from inside the scope but executed after exit
    plans under the restored default.  Both are fine here — the
    registry drains queries sequentially and every scoped drain fully
    materializes before returning — but a caller that wants
    concurrency must scope per-query instead (the stream-level
    spark.sql.shuffle.partitions option on writeStream)."""
    with _scoped_sql_confs(spark, {"spark.sql.shuffle.partitions": str(n)}):
        yield


def _small_batch_drain_confs(spark: SparkSession, parts: int) -> dict:
    """Conf set for a drain whose per-batch plans are tiny: a pinned
    shuffle width plus the engine's drain AQE policy (config.py
    DRAIN_ADAPTIVE_KEY — default off, the measured local optimum; a
    deployment whose per-batch volumes benefit from AQE flips the
    knob, no engine edit)."""
    from kafka_spark_streaming_spark.config import (
        DRAIN_ADAPTIVE_DEFAULT,
        DRAIN_ADAPTIVE_KEY,
    )

    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.enabled": spark.conf.get(
            DRAIN_ADAPTIVE_KEY, DRAIN_ADAPTIVE_DEFAULT
        ),
    }


@contextmanager
def _scoped_sql_confs(spark: SparkSession, confs: dict):
    """Scope a set of SQL confs to a streaming drain and restore them
    afterwards (exception-safe).  Same single-threaded-by-assumption
    caveats as _scoped_shuffle_partitions — this mutates the SHARED
    session conf, fine for the registry's sequential drains only."""
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


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
    # 4 state-store partitions (r16 tail audit, VERDICT r15 #5): the
    # stateless drain floor of this 4-batch stream is ~1.1 s, so the
    # join's cost is almost entirely per-partition state-store commit
    # work (4 stores/partition for a stream-stream join).  A/B
    # min-of-N at BOTH scales: sf0.1 (371 rows) 8→5.6 s, 4→3.6 s,
    # 2→3.3 s; 10x corpus (3 710 rows) 8→5.65 s, 4→4.15 s, 2→4.24 s —
    # 4 is the optimum once per-partition batch volume matters and
    # within noise of 2 below that, so the r14 "8 for headroom" choice
    # was paying ~1.2-1.5 s of pure commit overhead at every scale we
    # can measure.  On a cluster you size this to executors.
    with _scoped_shuffle_partitions(spark, 4):
        return _drain_to_memory(out, "append").orderBy(
            "purchase_id", "click_id"
        )


# --- S5: per-record executor-side sink, drained and read back ------------
# The reference's pom main class writes every record from inside
# foreachPartition on executors (KafkaStreamerToHbase.scala:156-160:
# y.foreach(record => insertOneLineToHbase(rowkey, "messages",
# record.toString(), "cf1", table))). Structured-Streaming shape:
# writeStream.foreach(ForeachWriter) — open(partition, epoch) is the
# connection hook, process(row) the per-record put. This query drives
# the REAL writer (sinks/foreach.py) over a real stream drain, then
# reads the committed TSV cells back deterministically so the driver's
# DuckDB oracle hash-gates the executor-side write path end-to-end.
# Wall-clock rowkeys are replaced by the data-derived key (same
# determinism rule as every r_* batch variant); record.toString() for a
# Scala (k, v) tuple is "(k,v)", nulls printed as "null".
@register(
    "s_foreach_record_sink",
    f"""
    {_M}
    SELECT COALESCE(key, 'kafka empty message') AS rowkey,
           'cf1' AS cf,
           'messages' AS qualifier,
           '(' || COALESCE(key, 'null') || ',' || value || ')' AS value,
           COUNT(*) AS n
    FROM messages
    GROUP BY 1, 2, 3, 4
    """,
)
def s_foreach_record_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_spark_streaming_spark.sinks.foreach import (
        RecordForeachWriter,
        read_sink,
    )

    out_dir = _scratch_dir("kss_s5_") + "/cells"
    msgs = file_stream_messages(spark, _events_path(sf_dir))
    records = msgs.select(
        F.coalesce(F.col("key"), F.lit("kafka empty message")).alias(
            "rowkey"
        ),
        F.lit("messages").alias("qualifier"),
        F.concat(
            F.lit("("),
            F.coalesce(F.col("key"), F.lit("null")),
            F.lit(","),
            F.col("value"),
            F.lit(")"),
        ).alias("value"),
    )
    q = (
        records.writeStream.foreach(RecordForeachWriter(out_dir))
        .option("checkpointLocation", _scratch_dir("kss_s5ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # fold per-file rows to a partitioning-independent multiset view;
    # multiplicities survive (idempotent per (epoch, partition) files)
    return (
        read_sink(spark, out_dir)
        .groupBy("rowkey", "cf", "qualifier", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


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
    out = _scratch_dir("kss_rollup_") + "/partials"
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

    # 8 shuffle partitions for the drain (r17 interleaved A/B at
    # sf0.1, min-of-3: 32 → 3.83 s, 8 → 2.42 s, 4 → 2.45 s; AQE
    # on/off a wash at 8): each batch's partial aggregate moves ~30
    # day-groups, where 32-way task scheduling is pure overhead.
    with _scoped_shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .option("checkpointLocation", _scratch_dir("kss_rck_"))
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


# --- streaming incremental near-dup dedup (MinHash store probe) ----------
# The corpus-builder shape: document batches arrive in order; each
# batch is near-dup-checked against the ACCUMULATED signature store
# (every doc seen so far) plus its own smaller-id docs, and the store
# grows by the batch's profiles. A doc is rejected iff some smaller-id
# doc anywhere in the corpus is a verified near-dup — which is exactly
# the batch "keep the min of every near-dup pair" rule, so the DuckDB
# batch oracle checks the streamed result bit-for-bit (batch≡stream).
#
# 100 TB posture: the store is the persisted signature table
# (32 longs + hashed shingle set per doc — no text retained); the
# per-batch probe is a band-bucket equi-join of |batch| signatures
# against the store (bucket-partitioned on disk at scale, so a probe
# touches only matching buckets), then exact verification of the
# candidate pairs alone. Per batch nothing rescans history except the
# banded index lookup — the standard incremental-LSH design.
def _table_ordered_batches(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int,
    tbl: str,
    id_col: str,
    cols: list[str],
    prefix: str,
) -> DataFrame:
    """A fixture table as n_batches real micro-batches in id order
    (file mtimes force oldest-first processing).  Batch i covers
    ids [i*step, (i+1)*step) with step = max((max_id+1)//n, 1) and the
    last batch taking the remainder — a DETERMINISTIC split an oracle
    can reproduce in SQL (the streaming-IVF oracle leans on exactly
    this for its training-batch cutoff).  Generalized from the
    documents-only splitter in r18; the docs split dir naming is
    unchanged, so existing split caches stay valid."""
    import glob
    import shutil

    from kafka_spark_streaming_spark.tables import fixture_fingerprint
    from kafka_spark_streaming_spark.tables import table as _table

    df = _table(spark, sf_dir, tbl).select(*cols)
    # fixture fingerprint in the cache key: a regenerated fixture
    # must invalidate the split (round-5 drift class)
    tag = (
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{n_batches}_{fixture_fingerprint(sf_dir, tbl)}"
    )
    split_dir = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    # drop the old fingerprint's stranded split copy on regeneration
    from kafka_spark_streaming_spark.tables import prune_stale_siblings

    prune_stale_siblings(prefix, tag)
    if not os.path.exists(os.path.join(split_dir, "_DONE")):
        # build in a process-unique dir, atomically rename into place:
        # two concurrent harness processes must not interleave writes
        # into the same split dir (loser discards its copy)
        build_dir = f"{split_dir}.build{os.getpid()}"
        shutil.rmtree(build_dir, ignore_errors=True)
        os.makedirs(build_dir)
        n_rows = df.agg(F.max(id_col)).collect()[0][0] + 1
        step = max(n_rows // n_batches, 1)
        for i in range(n_batches):
            lo = i * step
            hi = n_rows if i == n_batches - 1 else (i + 1) * step
            part_dir = os.path.join(build_dir, f"_part{i}")
            (
                df.filter(
                    (F.col(id_col) >= lo) & (F.col(id_col) < hi)
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(part_dir)
            )
            (src,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
            dst = os.path.join(build_dir, f"batch_{i:04d}.parquet")
            shutil.move(src, dst)
            shutil.rmtree(part_dir)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        with open(os.path.join(build_dir, "_DONE"), "w"):
            pass
        try:
            os.rename(build_dir, split_dir)
        except OSError:  # another process won the race
            shutil.rmtree(build_dir, ignore_errors=True)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )


def _docs_ordered_batches(
    spark: SparkSession, sf_dir: str, n_batches: int
) -> DataFrame:
    """documents.parquet as n_batches real micro-batches in doc_id
    order (file mtimes force oldest-first processing)."""
    return _table_ordered_batches(
        spark, sf_dir, n_batches,
        tbl="documents", id_col="doc_id", cols=["doc_id", "text"],
        prefix="kss_docsplit",
    )


def _embeddings_ordered_batches(
    spark: SparkSession, sf_dir: str, n_batches: int
) -> DataFrame:
    """embeddings.parquet as n_batches real micro-batches in vec_id
    order — the ingest stream for the incremental ANN index (r18)."""
    return _table_ordered_batches(
        spark, sf_dir, n_batches,
        tbl="embeddings", id_col="vec_id", cols=["vec_id", "embedding"],
        prefix="kss_embsplit",
    )


# Store-bucket knobs for s_incremental_near_dedup live in engine
# config (VERDICT r15 #4): spark.kss.dedup.bandStoreBuckets /
# spark.kss.dedup.profileStoreBuckets, defaults 16.  See
# kafka_spark_streaming_spark/config.py for the 100 TB sizing rule
# (≈ store_bytes / 256MB–1GB, power of two → thousands of buckets on
# a 1000-executor cluster); the probe/layout code here is
# scale-invariant, the knob is the only thing that changes.
from kafka_spark_streaming_spark.config import (  # noqa: E402
    BAND_STORE_BUCKETS_DEFAULT as _BAND_STORE_BUCKETS,  # test-pinned alias
    band_store_buckets as _band_store_buckets,
    profile_store_buckets as _profile_store_buckets,
)


# The incremental-dedup store is ONE parquet dataset partitioned by
# (kind, pk): kind='b' rows are (doc_id, bh) band entries with
# pk = pmod(bh, band_store_buckets); kind='p' rows are full MinHash
# profiles with a `kept` verdict flag and
# pk = pmod(doc_id, profile_store_buckets).  One layout, two pruned
# probes, and — the point of the merge (r16) — ONE append job per
# micro-batch whose job commit lands a batch's band and profile rows
# together (no partial-pair crash states; the r15 two-dir layout
# needed a write-ordering argument instead).


def _bucketed_band_probe(
    spark: SparkSession, store_dir: str, pbs: list, schema=None
) -> DataFrame:
    """Partition-pruned read of the incremental-dedup store's BAND
    rows: only the `kind=b/pk=` directories named by the incoming
    batch's band hashes are listed and scanned (PartitionFilters on
    the parquet scan — pinned by tests/test_plans.py::
    test_band_store_probe_prunes_partitions).  Exact by construction:
    `pk = pmod(bh, band_store_buckets)` is a function of the join key
    `bh`, so a store row outside the probed partitions cannot collide
    with any incoming band.  `schema` (when the caller can derive it,
    as the batch body can from its in-batch profile) skips parquet
    footer inference — one fewer 1-task driver job per batch (r17
    job-floor decomposition: inference was 2 of the 17 per-batch job
    submissions)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return (
        reader.parquet(store_dir)
        .filter((F.col("kind") == "b") & F.col("pk").isin(pbs))
        .select("doc_id", "bh")
    )


def _bucketed_profile_probe(
    spark: SparkSession, store_dir: str, pds: list, schema=None
) -> DataFrame:
    """Partition-pruned read of the incremental-dedup store's PROFILE
    rows (r16 — this was the last per-batch full-store scan in the
    engine): only the `kind=p/pk=` directories named by this batch's
    candidate `doc_a` values are listed and scanned (PartitionFilters
    plan-pinned in tests/test_plans.py::
    test_profile_store_probe_prunes_partitions).  Exact by
    construction: `pk = pmod(doc_id, profile_store_buckets)` is a
    function of the verify join key `doc_id`, so a profile row outside
    the probed partitions cannot match any candidate; doc_b profiles
    always come from the in-batch `prof`.  Mirrors the key-partitioned
    HBase region store the reference models (HbaseWriter.scala:26-29).
    The drop removes the layout/verdict columns plus the band-only
    `bh` (null on every profile row) — what remains is exactly the
    in-batch profile shape, so unionByName with `prof` lines up.
    `schema` skips footer inference like the band probe's."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return (
        reader.parquet(store_dir)
        .filter((F.col("kind") == "p") & F.col("pk").isin(pds))
        .drop("kind", "pk", "kept", "bh")
    )


def _store_layout(
    spark: SparkSession, store_dir: str, commit: bool = False
) -> tuple[int, int]:
    """(band_buckets, profile_buckets) for a dedup store — persisted
    in a sidecar marker next to the store (code-review r16): the
    bucket counts are properties of the STORE layout, so re-resolving
    the session conf on every micro-batch would let a mid-run (or
    across-restart) conf change make the probe's pmod disagree with
    the directories on disk — silently dropping true candidates.  The
    conf only seeds the marker at the first NON-EMPTY append (ADVICE
    r16 streaming_queries.py:770: a 0-row first micro-batch must not
    pin the layout of a store that does not exist yet — a conf retune
    before the first real data batch would be silently ignored), so
    reads here are commit=False and the batch body calls back with
    commit=True only after its 0-row guard passes.  The marker is a
    SIBLING of store_dir so writing it never creates the store dir
    itself (the batch body keys the has-history branch on
    os.path.exists(store_dir)); the write itself is tmp+rename atomic
    with first-writer-wins under a concurrent-attach race
    (config.commit_layout)."""
    from kafka_spark_streaming_spark.config import commit_layout, read_layout

    marker = store_dir.rstrip("/") + ".layout"
    vals = read_layout(marker, arity=2)
    if vals is None:
        vals = (_band_store_buckets(spark), _profile_store_buckets(spark))
        if commit:
            vals = commit_layout(marker, vals)
    n_pb, n_pd = vals
    return n_pb, n_pd


def _incremental_dedup_batch(
    batch_df: DataFrame, store_dir: str, fence=None
) -> None:
    """One micro-batch of the incremental near-dedup — module-level
    (not a closure) so the replay-idempotence argument is directly
    testable: tests/test_streaming.py::
    test_incremental_dedup_batch_replay_idempotent re-runs a batch and
    pins that the kept set is unchanged.

    ``fence`` (r18): the owning drain's fencing.WriterFence, checked
    immediately before the append (the batch's one commit-point
    mutation) so a zombie drain raises StaleWriterError instead of
    appending behind a newer writer.  None (the default) is the
    unfenced direct-call path for tests and one-shot batch use, where
    the caller IS the single writer by construction."""
    from kafka_spark_streaming_spark.operators.dedup import (
        minhash_profile,
        shingles_of,
    )

    # persist + materialize-via-the-pb-collect instead of an eager
    # localCheckpoint + separate collect (r15): the pb collect in the
    # body is the batch's first action (every batch since r16 — it
    # doubles as the 0-row guard), so it fills the cache as a side
    # effect and one scheduling-floor job per batch disappears; the
    # cache is dropped at the end of the batch.
    prof = minhash_profile(shingles_of(batch_df)).persist()
    try:
        _incremental_dedup_batch_body(prof, store_dir, fence=fence)
    finally:
        # the batch's cache must not accumulate across micro-batches —
        # including across foreachBatch RETRIES, so the unpersist sits
        # in a finally (a failed attempt's cached blocks would
        # otherwise linger until GC; code-review r15)
        prof.unpersist()


def _incremental_dedup_batch_body(
    prof: DataFrame, store_dir: str, fence=None
) -> None:
    from kafka_spark_streaming_spark.operators.dedup import (
        band_buckets,
        verified_pairs,
    )

    sess = prof.sparkSession
    n_pb, n_pd = _store_layout(sess, store_dir)
    # this batch's band rows — cheap on top of the cached profile
    # (16 xxhash64 per row, no shuffle), so NOT separately persisted
    # despite three consumers below.
    incoming = band_buckets(prof).withColumn(
        "pk", F.pmod(F.col("bh"), F.lit(n_pb))
    )
    store_exists = os.path.exists(store_dir)
    # bounded collect: ≤ band_store_buckets scalars.  Equal band
    # hashes have equal pk, so pruning the store to the batch's pk
    # values drops only rows that cannot join — exactness is by
    # construction, not recall-traded.  Collected on EVERY batch (not
    # just when history exists): an empty pbs means a 0-row batch,
    # which must not reach the append — a 0-row partitionBy write
    # would create a store dir holding only _SUCCESS and break schema
    # inference on the next batch's probe (code-review r16; same
    # guard class as the upsert sink's).
    pbs = [r[0] for r in incoming.select("pk").distinct().collect()]
    if not pbs:
        return
    # first non-empty batch pins the store layout (ADVICE r16: seeding
    # before this guard would let a 0-row first micro-batch freeze the
    # bucket counts for a store that doesn't exist yet).  Under a
    # concurrent-attach race commit_layout is first-writer-wins; if a
    # racer pinned a DIFFERENT layout between our read and this
    # commit, the pk values computed above are wrong for the store —
    # refuse to append rather than corrupt the fan-out.
    pinned = _store_layout(sess, store_dir, commit=True)
    if pinned != (n_pb, n_pd):
        raise RuntimeError(
            f"dedup store {store_dir!r} layout was pinned to {pinned} by a "
            f"concurrent attach while this batch computed {(n_pb, n_pd)}; "
            "re-run the batch (it will read the pinned marker)"
        )
    # the store's on-disk schema is fully determined by this batch's
    # own profile shape + the band/verdict/layout columns, so the
    # probes never need parquet footer inference — passing it
    # explicitly removes one 1-task driver job per probe per batch
    # (r17 job-floor decomposition: inference was 2 of the 17
    # per-batch job submissions)
    from pyspark.sql import types as T

    store_schema = T.StructType(
        list(prof.schema.fields)
        + [
            T.StructField("bh", T.LongType()),
            T.StructField("kept", T.BooleanType()),
            T.StructField("kind", T.StringType()),
            T.StructField("pk", T.IntegerType()),
        ]
    )
    if store_exists:
        seen_bands = _bucketed_band_probe(
            sess, store_dir, pbs, schema=store_schema
        ).unionByName(incoming.select("doc_id", "bh"))
    else:
        seen_bands = incoming.select("doc_id", "bh")
    # candidate generator: pruned store bands ∪ this batch's bands
    # against this batch's bands; only pairs whose LARGER side is
    # in this batch matter — earlier docs were already decided in
    # their own batch.  Replayed band rows (a retry that re-appends)
    # only duplicate candidates, which the dropDuplicates collapses.
    # Persisted: the pd collect below is its materializing action
    # (same persist+collect-as-materializer pattern as prof), and the
    # verify join then reads the cached pairs instead of re-running
    # the band join.
    cand = (
        seen_bands.alias("x")
        .join(
            incoming.alias("y"),
            (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .dropDuplicates()
        .persist()
    )
    try:
        if store_exists:
            # the store keeps ALL seen docs (kept and rejected): a
            # future doc duplicating a rejected doc must still be
            # rejected — so the universe ignores the kept flag.  NO
            # per-batch dropDuplicates replay guard here (r15): that
            # was a full-history shuffle of the hs arrays every batch;
            # replayed rows are bit-identical (deterministic profiles),
            # duplicate verify matches carry identical jaccard values,
            # and `rejected` is distinct'd — so duplicates can't change
            # the verdict, only the final read dedups by doc_id.
            # r16: the verify-side profile lookup is PARTITION-PRUNED —
            # only candidate doc_a values can need an out-of-batch
            # profile (doc_b is always in-batch by the join above), so
            # the ≤ profile_store_buckets pd values they hash to name
            # the only store directories worth scanning.  This was the
            # last per-batch full-store read in the engine.
            pds = [
                r[0]
                for r in cand.select(
                    F.pmod(F.col("doc_a"), F.lit(n_pd)).alias("pd")
                )
                .distinct()
                .collect()
            ]
            universe = (
                _bucketed_profile_probe(
                    sess, store_dir, pds, schema=store_schema
                ).unionByName(
                    prof
                )
                if pds
                else prof
            )
        else:
            universe = prof
        rejected = (
            verified_pairs(cand, universe)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .withColumn("_rej", F.lit(True))
        )
        # ONE append job per batch (r16; r14 merged the kept/profile
        # split, r16 merges bands + profiles into one kind-partitioned
        # dataset): every profile row is stored once with its verdict
        # as a `kept` flag under kind=p/pk=pmod(doc_id, n_pd), and its
        # band rows land under kind=b/pk=pmod(bh, n_pb) — IN THE SAME
        # JOB, so the job commit makes a batch's band and profile rows
        # visible together and the r15 "bands append BEFORE profile
        # append" crash-ordering argument is no longer needed: every
        # crash point leaves either the whole batch or none of it (a
        # crash mid-commit can at worst expose the pair together on
        # retry as exact duplicates, which the read-side
        # dropDuplicates(doc_id) / candidate dropDuplicates collapse —
        # deterministic profiles make replayed rows bit-identical).
        # Read-side dedup keeps the append replay-idempotent the same
        # way as before: each doc belongs to exactly one ordered
        # batch, and a foreachBatch retry recomputes the same verdict
        # against the same prior store (the probe DFs snapshotted
        # their file listings before this write).
        # The repartition lands exactly one file per (batch, kind, pk)
        # so probe listings stay O(batches × buckets), not O(tasks ×
        # buckets).  (coalesce(1) was measured WORSE — it collapses
        # the upstream band computation into a single task: 9.1 vs
        # 7.6 s min-of-3.)
        combined = incoming.withColumn("kind", F.lit("b")).unionByName(
            prof.join(rejected, "doc_id", "left")
            .withColumn("kept", F.col("_rej").isNull())
            .drop("_rej")
            .withColumn("kind", F.lit("p"))
            .withColumn("pk", F.pmod(F.col("doc_id"), F.lit(n_pd))),
            allowMissingColumns=True,
        )
        if fence is not None:
            # commit point: the append below is the batch's one store
            # mutation — a zombie drain must raise here, not append
            # behind a newer writer (r18 fencing; probes above are
            # read-only and need no check)
            fence.check()
        (
            combined.repartition("kind", "pk")
            .write.mode("append")
            .partitionBy("kind", "pk")
            .parquet(store_dir)
        )
    finally:
        # cached candidate pairs must not accumulate across
        # micro-batches or across foreachBatch retries (same
        # rationale as prof's unpersist one level up).
        cand.unpersist()


@register(
    "s_incremental_near_dedup",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    card AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    rejected AS (
      SELECT DISTINCT doc_b FROM common
      JOIN card ca ON ca.doc_id = doc_a
      JOIN card cb ON cb.doc_id = doc_b
      WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.8)
    SELECT c.doc_id, CAST(c.n AS BIGINT) AS n_shingles
    FROM card c
    WHERE NOT EXISTS (SELECT 1 FROM rejected r WHERE r.doc_b = c.doc_id)
    """,
)
def s_incremental_near_dedup(
    spark: SparkSession, sf_dir: str, n_batches: int = 4
) -> DataFrame:
    """Streaming MinHash near-dedup against an append-only,
    BAND-HASH-BUCKETED store: each micro-batch bands only its own
    profiles, probes the store's band rows with a partition-pruned
    read (`_bucketed_band_probe` — the batch's ≤ band_store_buckets
    distinct `pk` values select directories; PartitionFilters
    plan-pinned in tests/test_plans.py), verifies candidates exactly
    against the store's PROFILE rows likewise partition-pruned by
    `pk = pmod(doc_id, profile_store_buckets)` (r16,
    `_bucketed_profile_probe` — only candidate doc_a values can need
    an out-of-batch profile), and appends band + profile rows in ONE
    kind-partitioned job per batch (commit-atomic pair).  r15 made
    the band side pruned; r16 closed the verify side — per-batch work
    is now O(batch bands + store rows in the probed band/profile
    partitions + collisions) with NO full-store read anywhere in the
    batch.  Bucket counts are engine config (config.py — 100 TB
    sizing rule there; thousands of buckets at the design point, 16
    locally)."""
    from kafka_spark_streaming_spark.config import (
        dedup_compact_every,
        drain_fence_lease_ttl,
    )
    from kafka_spark_streaming_spark.fencing import WriterFence
    from kafka_spark_streaming_spark.operators.store_maintenance import (
        compact_dedup_store,
    )

    stream = _docs_ordered_batches(spark, sf_dir, n_batches)
    run_dir = _scratch_dir("kss_increddup_")
    store_dir = os.path.join(run_dir, "store")
    # writer fence for the whole drain (r18): one attach-scoped token,
    # checked by every batch before its append — the store analogue of
    # the upsert sink's _WRITER_EPOCH (same sibling-marker convention
    # as the .layout sidecar, so acquiring never creates the store dir).
    # LEASE mode by default since r20 (drain_fence_lease_ttl): the
    # per-batch heartbeat below renews it, and the explicit
    # leaseTtlSec knob still overrides either way.
    fence = WriterFence.acquire(
        store_dir.rstrip("/") + ".epoch",
        purpose="incremental-near-dedup",
        lease_ttl_s=drain_fence_lease_ttl(spark),
    )
    # compaction cadence (VERDICT r17 #2): policy knob, read once per
    # drain; > 0 folds the store's leaves back to one file every N
    # batches from this callback — a store-idle point (this batch's
    # append has committed; the next cannot start until we return) in
    # the same writer context, so the compactor shares our fence.
    compact_every = dedup_compact_every(spark)

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        _incremental_dedup_batch(batch_df, store_dir, fence=fence)
        if (
            compact_every
            and (batch_id + 1) % compact_every == 0
            and os.path.exists(store_dir)
        ):
            compact_dedup_store(spark, store_dir, fence=fence)
        fence.heartbeat()  # per-batch lease renewal (read-only check
        # in the default pid mode — fencing.heartbeat)

    # 8 shuffle partitions for the whole drain (A/B min-of-2 settled:
    # 32 -> 6.57 s, 16 -> 5.95 s, 8 -> 5.76 s): the per-batch band
    # joins and distincts move ~12.5k-doc batches, where 32-way task
    # scheduling overhead beats the parallelism it buys.  foreachBatch
    # plans read the session conf at each batch, so the scope covers
    # the drain, not just the stream start.  AQE off for the drain
    # (r17 job-floor decomposition): at this per-batch scale AQE's
    # stage-by-stage materialization turned each of the 3 designed
    # actions into 4-6 job submissions (17/batch total) with nothing
    # to re-plan — the shuffle width is already pinned above.  At the
    # 100 TB design point batches are large enough that AQE's skew and
    # coalescing wins dominate; leave it on there (it's the session
    # default — this scope is the local small-batch tuning).
    with _scoped_sql_confs(spark, _small_batch_drain_confs(spark, 8)):
        q = (
            stream.writeStream.foreachBatch(dedup_batch)
            .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # drain finished: mark the token inactive so standalone maintenance
    # (compact_dedup_store's live-writer guard) stops refusing
    fence.idle()
    return (
        spark.read.parquet(store_dir)
        # kind=p prunes to the profile partitions (band rows have a
        # null `kept`, so the flag filter alone would also drop them —
        # the kind filter makes the pruning explicit in the plan)
        .filter((F.col("kind") == "p") & F.col("kept"))
        .select("doc_id", F.col("n").alias("n_shingles"))
        .dropDuplicates(["doc_id"])
        .orderBy("doc_id")
    )


# --- streaming incremental top-k (heavy hitters over a doc stream) -------
# Maintains the corpus top-10 tokens while documents stream in: each
# micro-batch appends its PARTIAL token counts stamped with batch_id
# (per batch: shuffle |batch tokens| → |vocab-touched| partials —
# history is never rescanned); the read side dedups (token, batch_id)
# so a foreachBatch retry cannot double-count, folds partials, and
# takes the top-10 with a deterministic (count DESC, token ASC)
# tiebreak, which compiles to TakeOrderedAndProject — a per-partition
# heap, no global sort. Batch ≡ stream exactly, so the batch top-k SQL
# is the oracle.
@register(
    "s_stream_topk_tokens",
    """
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY n DESC, token ASC LIMIT 10
    """,
)
def s_stream_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _scratch_dir("kss_topk_") + "/partials"
    stream = _docs_ordered_batches(spark, sf_dir, n_batches=3)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                F.explode(F.split("text", " ")).alias("token")
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("pn"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    q = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", _scratch_dir("kss_tck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.read.parquet(out).dropDuplicates(["token", "batch_id"])
    return (
        partials.groupBy("token")
        .agg(F.sum("pn").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(10)
    )


# --- streaming mergeable-HLL distinct (sketch partials across batches) ---
# The streaming twin of sk_hll_daily_rollup: each micro-batch writes
# one constant-size DataSketches HLL partial per event_type (stamped
# with batch_id — a replayed batch overwrites, never double-counts);
# the fold UNIONs sketches, so distinct-over-the-whole-stream needs
# state proportional to |types| × sketch size, not |users|. This is
# how a 100 TB stream answers cumulative count-distinct without
# keeping the key set anywhere. Estimate is engine-specific ⇒ the
# sk_hll contract: exact count (oracled) + error-bound boolean.
@register(
    "s_stream_hll_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS union_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def s_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _scratch_dir("kss_hll_") + "/partials"
    stream = multi_batch_events_stream(spark, sf_dir, n_batches=3)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    q = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", _scratch_dir("kss_hck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.read.parquet(out).dropDuplicates(
        ["event_type", "batch_id"]
    )
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("union_within_5pct"),
        )
        .orderBy("event_type")
    )


# --- streaming incremental ANN index (IVF cells as an append store) -------
# The embedding-ingest half of a production vector pipeline: the
# coarse quantizer is FROZEN from the first micro-batch (the standard
# IVF practice — FAISS trains the quantizer on a sample, then inverted
# lists grow by appends), every later batch assigns its vectors with
# one Arrow matmul and appends them under cell= partitions, and a
# query probe prunes to its n_probe nearest cells at the DIRECTORY
# level — partition pruning IS the index, and the index grows without
# ever re-clustering or rescanning history.  Batch ≡ stream exactly
# (assignment depends only on the frozen centroids and the row), so
# the oracle replays the whole construction in SQL with the training
# set restricted to the deterministic first-batch id range.
_SIVF_BATCHES = 3


def _sivf_oracle() -> str:
    from kafka_spark_streaming_spark.operators.similarity import (
        _IVF_CELLS,
        _IVF_DIM,
        _IVF_PROBE,
        N_QUERIES,
        TOP_K,
    )

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    cutoff AS (SELECT GREATEST((MAX(vec_id) + 1) // {_SIVF_BATCHES}, 1)
                      AS cut FROM e),
    tr AS (SELECT e.* FROM e, cutoff WHERE e.vec_id < cutoff.cut),
    p AS (SELECT GREATEST(COUNT(*) // {_IVF_CELLS}, 1) AS stride FROM tr),
    init AS (
      SELECT CAST(tr.vec_id // p.stride AS INT) AS cell,
             list_transform(tr.v,
               x -> x / sqrt(list_dot_product(tr.v, tr.v))) AS c
      FROM tr, p
      WHERE tr.vec_id % p.stride = 0 AND tr.vec_id < p.stride * {_IVF_CELLS}
    ),
    assign1 AS (
      SELECT vec_id, v, cell FROM (
        SELECT tr.vec_id, tr.v, i.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY tr.vec_id
                 ORDER BY list_dot_product(tr.v, i.c)
                          / sqrt(list_dot_product(tr.v, tr.v)) DESC,
                          i.cell DESC) AS rn
        FROM tr CROSS JOIN init i)
      WHERE rn = 1
    ),
    dims AS (
      SELECT a.cell, gs.d AS pos, AVG(a.v[gs.d]) AS m
      FROM assign1 a CROSS JOIN generate_series(1, {_IVF_DIM}) AS gs(d)
      GROUP BY a.cell, gs.d
    ),
    newc AS (
      SELECT cell, LIST(m ORDER BY pos) AS raw FROM dims GROUP BY cell
    ),
    cent2 AS (
      SELECT i.cell,
             CASE WHEN n.raw IS NOT NULL
                       AND sqrt(list_dot_product(n.raw, n.raw)) > 0
                  THEN list_transform(n.raw,
                         x -> x / sqrt(list_dot_product(n.raw, n.raw)))
                  ELSE i.c END AS c
      FROM init i LEFT JOIN newc n USING (cell)
    ),
    corpus AS (
      SELECT vec_id AS neighbor_id, v AS cv, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.c)
                          / sqrt(list_dot_product(e.v, e.v)) DESC,
                          c.cell DESC) AS rn
        FROM e CROSS JOIN cent2 c)
      WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, c.c) DESC,
                          c.cell ASC) AS rn
        FROM e q CROSS JOIN cent2 c WHERE q.vec_id < {N_QUERIES})
      WHERE rn <= {_IVF_PROBE}
    ),
    scored AS (
      SELECT p.query_id, co.neighbor_id,
             floor(list_cosine_similarity(p.qv, co.cv) * 1e9 + 0.5) / 1e9 AS s
      FROM corpus co JOIN probes p USING (cell)
      WHERE p.query_id <> co.neighbor_id
    )
    SELECT query_id, neighbor_id, round(s, 6) AS score, rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """


@register("s_incremental_ann_ivf", _sivf_oracle())
def s_incremental_ann_ivf(
    spark: SparkSession, sf_dir: str, n_batches: int = _SIVF_BATCHES
) -> DataFrame:
    """Streaming IVF index maintenance + probe (r18): micro-batch 0
    trains the coarse quantizer (same deterministic recipe as
    sim_ann_ivf's session index — strided init + one Lloyd step,
    shared helpers so the code cannot drift) and freezes it as a
    sidecar; every batch assigns its vectors against the frozen
    centroids (one Arrow matmul per batch, ivf_assign_arrow) and
    appends them in ONE cell-partitioned job.  The post-drain probe
    reads ONLY the probed cell= directories (PartitionFilters — the
    inverted-list lookup is directory pruning), exact-cosine reranks,
    and returns the same top-k contract as sim_ann_ivf.

    Scale shape: per-batch cost is one matmul + one append — history
    is never rescanned and the quantizer is never retrained; the
    store is the dedup/upsert stores' third sibling (fenced
    single-writer, append-only, partition-pruned probes,
    duplicate-tolerant reads so a foreachBatch replay's bit-identical
    re-append is collapsed by the read-side dropDuplicates).  The
    frozen quantizer's drift exposure (a shifting stream concentrating
    appends into few cells) has a maintenance answer since r20:
    store_maintenance.ann_store_stats is the occupancy watch and
    rebalance_ann_store the offline re-train/re-partition response
    (tools/ann_rebalance.py), crash-safe like compaction; this
    registered drain keeps the frozen quantizer so construction stays
    batch-replayable against the oracle.

    Batch ≡ stream: assignment depends only on (frozen centroids,
    row), so the DuckDB oracle replays the construction with the
    training set restricted to batch 0's deterministic id range
    [0, (max_id+1) // n_batches)."""
    import json as _json

    import numpy as np
    from pyspark.sql import types as T

    from kafka_spark_streaming_spark.fencing import WriterFence
    from kafka_spark_streaming_spark.functions import cosine_similarity
    from kafka_spark_streaming_spark.operators.similarity import (
        _IVF_CELLS,
        _topk,
        ivf_assign_arrow,
        ivf_init_centroids,
        ivf_probe_cells,
        lloyd_refine,
    )

    from kafka_spark_streaming_spark.config import (
        ann_compact_every,
        drain_fence_lease_ttl,
    )
    from kafka_spark_streaming_spark.operators.store_maintenance import (
        compact_ann_store,
    )

    stream = _embeddings_ordered_batches(spark, sf_dir, n_batches)
    run_dir = _scratch_dir("kss_sivf_")
    store_dir = os.path.join(run_dir, "store")
    cent_path = store_dir + ".centroids.json"
    # lease mode by default since r20 — see the dedup drain's fence
    fence = WriterFence.acquire(
        store_dir + ".epoch",
        purpose="incremental-ann-ivf",
        lease_ttl_s=drain_fence_lease_ttl(spark),
    )
    # in-drain maintenance cadence — same policy shape as the dedup
    # drain's (store-idle point, cooperative fence); default off
    compact_every = ann_compact_every(spark)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if not os.path.exists(cent_path):
            # FIRST non-empty batch trains and freezes the quantizer.
            # A replay of this batch finds the sidecar and skips the
            # rebuild (the build is deterministic anyway); the write
            # is tmp+rename atomic so a crash mid-write cannot leave
            # a torn centroid file.  The batch is scanned three times
            # here (count, init collect, Lloyd assignment) plus once
            # by the append — persisted for the build only; later
            # batches are scanned exactly once (the append) and skip
            # the count job entirely (a 0-row append is a harmless
            # no-op once the store and sidecar exist).
            batch_df.persist()
            try:
                n = batch_df.count()
                if n == 0:
                    return
                stride = max(n // _IVF_CELLS, 1)
                init = (
                    batch_df.filter(
                        (F.col("vec_id") % stride == 0)
                        & (F.col("vec_id") < stride * _IVF_CELLS)
                    )
                    .orderBy("vec_id")
                    .collect()  # bounded: <= n_cells rows
                )
                cmat = ivf_init_centroids(init)
                cmat2 = lloyd_refine(
                    ivf_assign_arrow(batch_df, cmat), cmat
                )
                tmp = f"{cent_path}.tmp{os.getpid()}"
                with open(tmp, "w") as fh:
                    _json.dump(
                        [[float(x) for x in row] for row in cmat2], fh
                    )
                    fh.flush()
                    os.fsync(fh.fileno())
                os.rename(tmp, cent_path)
            finally:
                batch_df.unpersist()
        with open(cent_path) as fh:
            cmat2 = np.array(_json.load(fh), dtype=np.float64)
        assigned = ivf_assign_arrow(batch_df, cmat2)
        # commit point: the cell-partitioned append is the batch's one
        # store mutation — fenced like the dedup store's
        fence.check()
        (
            assigned.repartition("cell")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(store_dir)
        )
        if (
            compact_every
            and (batch_id + 1) % compact_every == 0
            and os.path.exists(store_dir)
        ):
            compact_ann_store(spark, store_dir, fence=fence)
        fence.heartbeat()  # per-batch lease renewal (read-only check
        # in the default pid mode — fencing.heartbeat)

    with _scoped_sql_confs(spark, _small_batch_drain_confs(spark, 8)):
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    fence.idle()

    with open(cent_path) as fh:
        cmat2 = np.array(_json.load(fh), dtype=np.float64)
    # queries come from the fixture table (their embeddings are
    # identical to the store's rows; the table read keeps the bounded
    # N_QUERIES collect off the partitioned store)
    from kafka_spark_streaming_spark.operators.similarity import N_QUERIES

    q_rows = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id")
        .collect()  # bounded: N_QUERIES rows
    )
    probes = ivf_probe_cells(q_rows, cmat2)
    probe_rows = [
        (int(r.vec_id), list(r.embedding), [int(c) for c in probes[i]])
        for i, r in enumerate(q_rows)
    ]
    qdf = spark.createDataFrame(
        probe_rows, "query_id long, qv array<float>, cells array<int>"
    ).select("query_id", "qv", F.explode("cells").alias("cell"))
    needed = sorted({int(c) for row in probes for c in row})
    # explicit schema (no footer-inference job — same job-floor lever
    # as the dedup-store probes); the cell.isin filter prunes at the
    # DIRECTORY level because cell is a partition column
    store_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("cell", T.IntegerType()),
        ]
    )
    corpus = (
        spark.read.schema(store_schema)
        .parquet(store_dir)
        .filter(F.col("cell").isin(needed))
        # replay tolerance: a retried batch re-appends bit-identical
        # rows; each vec_id lives in exactly one cell, so the dedup is
        # complete within the pruned subset
        .dropDuplicates(["vec_id"])
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
            "cell",
        )
    )
    scored = (
        corpus.join(F.broadcast(qdf), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("s", cosine_similarity(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "s")
    )
    return _topk(scored)
