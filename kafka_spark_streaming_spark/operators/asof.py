"""As-of and range joins over the events stream table.

The reference has no joins at all (SURVEY.md §2.3); these are
north-star temporal operators a training-data / telemetry pipeline
needs constantly, expressed so one shuffle does the work.

As-of join strategy (Spark-first): instead of a per-row correlated
"greatest ts <= mine" subquery (O(n·m)) or a pandas merge_asof in
Python, union both sides tagged, ONE shuffle on the join key, sort by
(ts, event_id) inside each partition, and carry the right side forward
with last(..., ignorenulls) over ROWS UNBOUNDED PRECEDING .. 1
PRECEDING.  That is exactly how a 1000-executor run wants it: the
shuffle is keyed by user_id (high cardinality, no hot key), the sort is
per-partition, and the window needs no second pass.  Tie-break on
(ts, event_id) makes the "most recent prior" row total-ordered, so the
result is deterministic and oracle-checkable.

Range join strategy: keep the equi key (user_id) as the shuffle key and
apply the time-range predicate as a join residual — a hash join with a
range filter, never a cartesian.  For the keyless variant, bucket time
into coarse buckets and equi-join on the bucket (see
rj_error_burst_buckets) — the standard "range join via bucketing"
rewrite, which bounds each task's pair-count by bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_spark_streaming_spark.operators.registry import register
from kafka_spark_streaming_spark.tables import table


# --- as-of join: each purchase ← most recent prior click -----------------
@register(
    "aj_purchase_last_click",
    """
    WITH tagged AS (
      SELECT event_id, user_id, ts, value, event_type,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'click' THEN value END AS click_value
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    carried AS (
      SELECT *,
             last_value(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_id,
             last_value(click_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_value
      FROM tagged
    )
    SELECT event_id, user_id, ts, value, last_click_id, last_click_value
    FROM carried WHERE event_type = 'purchase'
    ORDER BY user_id, ts, event_id
    """,
)
def aj_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "click_id"
        ),
        F.when(F.col("event_type") == "click", F.col("value")).alias(
            "click_value"
        ),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        tagged.withColumn(
            "last_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_click_value", F.last("click_value", ignorenulls=True).over(w)
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            "last_click_id",
            "last_click_value",
        )
        .orderBy("user_id", "ts", "event_id")
    )


# --- range join (equi + residual): activity within 1 h after signup ------
@register(
    "rj_signup_activity_1h",
    """
    SELECT s.event_id AS signup_id, s.user_id AS user_id,
           COUNT(e.event_id) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
    FROM events s
      LEFT JOIN events e
        ON s.user_id = e.user_id
       AND e.ts > s.ts
       AND e.ts <= s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id, s.user_id
    ORDER BY signup_id
    """,
)
def rj_signup_activity_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    signup = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("su"),
        F.col("ts").alias("sts"),
    )
    joined = signup.join(
        ev,
        (F.col("su") == F.col("user_id"))
        & (F.col("ts") > F.col("sts"))
        & (F.col("ts") <= F.col("sts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy(
            F.col("signup_id"), F.col("su").alias("user_id")
        )
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("signup_id")
    )


# --- bucketed range join (no equi key): error bursts ---------------------
# "Pairs of error events across *different* users within 60 s of each
# other" has no natural equi key — naively a cartesian.  Standard scale
# rewrite: quantize ts into 60 s buckets, explode each left row into its
# own and the next bucket, equi-join on the bucket, then apply the exact
# range + ordering residual.  Each task's pair count is bounded by
# (events per bucket)², independent of total data size.
@register(
    "rj_error_burst_pairs",
    """
    SELECT a.event_id AS first_id, b.event_id AS second_id,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.event_type = 'error' AND b.event_type = 'error'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
     AND a.event_id < b.event_id
     AND a.user_id <> b.user_id
    ORDER BY first_id, second_id
    """,
)
def rj_error_burst_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    err = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
        .withColumn("bucket", (F.unix_timestamp("ts") / 60).cast("bigint"))
    )
    # left rows probe their own bucket and the next one so a pair
    # straddling a bucket edge is still found exactly once.
    a = err.select(
        F.col("event_id").alias("first_id"),
        F.col("user_id").alias("ua"),
        F.col("ts").alias("ta"),
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias(
            "bucket"
        ),
    )
    b = err.select(
        F.col("event_id").alias("second_id"),
        F.col("user_id").alias("ub"),
        F.col("ts").alias("tb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("tb") >= F.col("ta"))
            & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 60 SECOND"))
            & (F.col("first_id") < F.col("second_id"))
            & (F.col("ua") != F.col("ub"))
        )
        .select(
            "first_id",
            "second_id",
            (
                F.unix_timestamp("tb") - F.unix_timestamp("ta")
            ).alias("gap_s"),
        )
        .distinct()
        .orderBy("first_id", "second_id")
    )


# --- nearest as-of join: each purchase ↔ closest click within ±10 min ----
# The bidirectional variant of aj_purchase_last_click (nearest, not
# latest-prior): pair every purchase with the click closest in time on
# either side, NULL when none lands within the tolerance. Same
# scale shape as the backward join — ONE shuffle keyed by user_id,
# one per-partition sort, and all four carried columns (prev/next
# click id+ts) ride the SAME window frame sort, so Catalyst plans a
# single WindowExec pass; the nearest-pick is a row-local CASE.
# Tie (equidistant prev and next) breaks to the PRIOR click.
# Microsecond integer deltas keep both engines bit-identical.
_AJ_TOL_US = 600_000_000  # ±10 minutes


@register(
    "aj_nearest_click",
    f"""
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    carried AS (
      SELECT *,
             last_value(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_id,
             last_value(click_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_us,
             first_value(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_id,
             first_value(click_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_us
      FROM tagged
    ),
    scored AS (
      SELECT event_id, user_id, ts,
             CASE WHEN prev_us IS NOT NULL
                   AND epoch_us(ts) - prev_us <= {_AJ_TOL_US}
                  THEN epoch_us(ts) - prev_us END AS d_prev,
             CASE WHEN next_us IS NOT NULL
                   AND next_us - epoch_us(ts) <= {_AJ_TOL_US}
                  THEN next_us - epoch_us(ts) END AS d_next,
             prev_id, next_id
      FROM carried WHERE event_type = 'purchase'
    )
    SELECT event_id, user_id, ts,
           CASE WHEN d_prev IS NOT NULL
                 AND (d_next IS NULL OR d_prev <= d_next) THEN prev_id
                WHEN d_next IS NOT NULL THEN next_id END AS nearest_click_id,
           CASE WHEN d_prev IS NOT NULL
                 AND (d_next IS NULL OR d_prev <= d_next) THEN -d_prev
                WHEN d_next IS NOT NULL THEN d_next END AS delta_us
    FROM scored
    ORDER BY user_id, ts, event_id
    """,
)
def aj_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = F.col("event_type") == "click"
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(is_click, F.col("event_id")).alias("click_id"),
        F.when(is_click, F.unix_micros("ts")).alias("click_us"),
    )
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    wp = base.rowsBetween(W.unboundedPreceding, -1)
    wn = base.rowsBetween(1, W.unboundedFollowing)
    us = F.unix_micros("ts")
    carried = (
        tagged.withColumn("prev_id", F.last("click_id", True).over(wp))
        .withColumn("prev_us", F.last("click_us", True).over(wp))
        .withColumn("next_id", F.first("click_id", True).over(wn))
        .withColumn("next_us", F.first("click_us", True).over(wn))
        .filter(F.col("event_type") == "purchase")
    )
    d_prev = F.when(
        F.col("prev_us").isNotNull()
        & ((us - F.col("prev_us")) <= _AJ_TOL_US),
        us - F.col("prev_us"),
    )
    d_next = F.when(
        F.col("next_us").isNotNull()
        & ((F.col("next_us") - us) <= _AJ_TOL_US),
        F.col("next_us") - us,
    )
    scored = carried.select(
        "event_id",
        "user_id",
        "ts",
        d_prev.alias("d_prev"),
        d_next.alias("d_next"),
        "prev_id",
        "next_id",
    )
    prev_wins = F.col("d_prev").isNotNull() & (
        F.col("d_next").isNull() | (F.col("d_prev") <= F.col("d_next"))
    )
    return scored.select(
        "event_id",
        "user_id",
        "ts",
        F.when(prev_wins, F.col("prev_id"))
        .when(F.col("d_next").isNotNull(), F.col("next_id"))
        .alias("nearest_click_id"),
        F.when(prev_wins, -F.col("d_prev"))
        .when(F.col("d_next").isNotNull(), F.col("d_next"))
        .alias("delta_us"),
    ).orderBy("user_id", "ts", "event_id")
