"""Physical-layout operators: bucketed co-located joins, partitioned
scans.

The reference has no storage layout at all (its sink is an HBase table
keyed by wall-clock seconds, Streamer.scala:163).  At 100 TB, layout IS
the optimization: a fact-fact join that shuffles both sides every run
is paid for once at write time by bucketing both tables on the join
key; a date filter that scans every file is paid for once by
partitioning on date.  These operators build the layout (once per
scale factor, into a temp warehouse) and run queries whose *plans* are
the deliverable — tests assert the join has no shuffle and the scan
prunes partitions.

Layout tables are external (data under /tmp), created idempotently;
the queries themselves are ordinary declarative DataFrame plans.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_spark_streaming_spark.functions import SQL_DEC_SUM, dec_sum
from kafka_spark_streaming_spark.operators.registry import register
from kafka_spark_streaming_spark.tables import table

N_BUCKETS = 16


def _tag(sf_dir: str) -> str:
    """Cache tag for derived layouts: sf name + fixture fingerprint, so
    a regenerated fixture invalidates every derived layout instead of
    serving stale data (the round-5 drift class)."""
    from kafka_spark_streaming_spark.tables import fixture_fingerprint

    base = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(os.path.normpath(sf_dir)))
    return f"{base}_{fixture_fingerprint(sf_dir)}"


def _prune_stale(prefix: str, keep_tag: str, min_age_s: float = 7200) -> None:
    """Remove sibling layout dirs built under older fingerprints —
    each regeneration would otherwise strand a full table copy.

    Age-gated (a concurrent process may still be mid-query over its
    pre-regeneration layout — ADVICE r6 physical.py:46) and matching
    legacy unfingerprinted names; shared with the streaming split
    caches via tables.prune_stale_siblings."""
    from kafka_spark_streaming_spark.tables import prune_stale_siblings

    prune_stale_siblings(prefix, keep_tag, min_age_s)


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """orders + lineitem bucketed (and sorted) by the join key.

    bucketBy(N, key) + sortBy(key) at write time means every future
    join on the key is a zero-shuffle, zero-sort merge join — the
    write-once/join-many trade a 100 TB warehouse lives by.
    """
    tag = _tag(sf_dir)
    names = (f"kss_orders_b_{tag}", f"kss_lineitem_b_{tag}")
    base = os.path.join(tempfile.gettempdir(), f"kss_bucketed_{tag}")
    _prune_stale("kss_bucketed", tag)
    for name, src, key in (
        (names[0], "orders", "o_orderkey"),
        (names[1], "lineitem", "l_orderkey"),
    ):
        if not spark.catalog.tableExists(name):
            (
                table(spark, sf_dir, src)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .option("path", os.path.join(base, name))
                .mode("overwrite")
                .saveAsTable(name)
            )
    return names


@register(
    "j_bucketed_priority_revenue",
    f"""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           {SQL_DEC_SUM.format(col='l_extendedprice')} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def j_bucketed_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join reading both sides from bucketed tables: the
    merge join consumes bucket files directly — the ONLY exchange in
    the whole plan is the final 5-group aggregate."""
    orders_t, lineitem_t = ensure_bucketed_tables(spark, sf_dir)
    orders = spark.table(orders_t).filter(
        F.col("o_orderdate") >= "1998-01-01"
    )
    li = spark.table(lineitem_t)
    return (
        orders.hint("merge")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            dec_sum("l_extendedprice").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """events re-written partitioned by event_date — the layout that
    turns every date filter into partition pruning instead of a scan."""
    tag = _tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"kss_events_bydate_{tag}")
    _prune_stale("kss_events_bydate", tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "events")
            .withColumn("event_date", F.to_date("ts"))
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(path)
        )
    return path


@register(
    "p_pruned_daily_type_counts",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def p_pruned_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One day of events out of a month: against the partitioned
    layout the scan touches 1/30th of the files (PartitionFilters in
    the plan), not a full scan + filter."""
    path = ensure_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(F.col("event_date") == F.lit("2024-01-05").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )
