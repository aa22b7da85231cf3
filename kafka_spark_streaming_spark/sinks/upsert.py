"""Keyed-upsert sink — the reference's HBase cell model on parquet.

HBase semantics (SURVEY.md §1.1, HbaseWriter.scala:22-31,76-82): a row
is (rowkey, cf, qualifier) → value; writing the same cell again
overwrites it (last-write-wins). The reference offers a single-row put
(S3) and a bulk per-batch put (S4, whose implementation was broken —
driver-side ArrayList mutated on executors; we implement the intent).

Design for scale:
- State lives in versioned parquet dirs `v_{batch_id}`; each batch
  computes new_state = LWW(old_state ∪ batch) as one distributed plan
  (shuffle on the cell key only), writes the new version, then prunes
  old versions. No driver-side data movement.
- Idempotent / exactly-once under foreachBatch retries: a re-run of
  batch N deterministically rewrites `v_N` from `v_{N-1}` + the same
  input (SURVEY.md §7 "what's hard" #4).
- Within-batch collisions on the same cell (the reference's
  epoch-second rowkeys collide routinely, Streamer.scala:163) resolve
  deterministically by max(value) — documented tie-break so tests and
  oracle agree.
- On a real deployment this maps 1:1 onto a Delta/Iceberg MERGE; the
  versioned-parquet variant keeps the harness dependency-free.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

CELL_KEY = ["rowkey", "cf", "qualifier"]

STATE_SCHEMA = T.StructType(
    [
        T.StructField("rowkey", T.StringType(), False),
        T.StructField("cf", T.StringType(), False),
        T.StructField("qualifier", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("batch_id", T.LongType(), False),
    ]
)


class KeyedUpsertSink:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- state management -------------------------------------------------
    def _versions(self) -> list[str]:
        # exclude in-flight '.tmp' build dirs: after a crash between the
        # tmp write and the rename they linger, and current() must never
        # surface uncommitted state (nor _prune count them toward keep)
        return sorted(
            d for d in os.listdir(self.path)
            if d.startswith("v_") and "." not in d
            and os.path.isdir(os.path.join(self.path, d))
        )

    def current(self) -> DataFrame:
        """Current cell state as a DataFrame (empty if no writes yet)."""
        versions = self._versions()
        if not versions:
            return self.spark.createDataFrame([], STATE_SCHEMA)
        return self.spark.read.parquet(os.path.join(self.path, versions[-1]))

    # -- the upsert -------------------------------------------------------
    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """MERGE-style last-write-wins upsert of (rowkey, cf, qualifier, value).

        One shuffle on the cell key; everything stays distributed.
        """
        stamped = batch_df.select(
            *CELL_KEY, F.col("value").cast("string")
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))

        prior = self.current().filter(F.col("batch_id") < batch_id)
        merged = prior.unionByName(stamped)
        w = W.partitionBy(*CELL_KEY).orderBy(
            F.desc("batch_id"), F.desc("value")
        )
        new_state = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        out = os.path.join(self.path, f"v_{batch_id:012d}")
        tmp = out + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        new_state.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        self._prune(keep=2)

    def _prune(self, keep: int) -> None:
        versions = self._versions()
        for stale in versions[:-keep]:
            shutil.rmtree(os.path.join(self.path, stale), ignore_errors=True)
        # crash-leftover build dirs: a v_N.tmp at or below the committed
        # head can never be renamed into place (a replay of batch N
        # rewrites it from scratch first), so each one strands a full
        # state copy until the exact batch_id is retried (ADVICE r6
        # upsert.py:103). Future-id tmp dirs are left alone — their
        # batch is still in flight or will rewrite on retry.
        if versions:
            head = int(versions[-1][2:])
            for d in os.listdir(self.path):
                if not (d.startswith("v_") and d.endswith(".tmp")):
                    continue
                try:
                    n = int(d[2:-4])
                except ValueError:
                    continue
                if n <= head:
                    shutil.rmtree(
                        os.path.join(self.path, d), ignore_errors=True
                    )

    # -- convenience: the reference's two write shapes --------------------
    def _next_batch_id(self) -> int:
        versions = self._versions()
        return int(versions[-1][2:]) + 1 if versions else 0

    def put_single(self, rowkey: str, qualifier: str, value: str,
                   cf: str = "cf1", batch_id: int | None = None) -> None:
        """S3: one summary cell per batch (HbaseWriter.scala:22-31).

        batch_id defaults to (last committed version)+1: write_batch
        treats an equal-or-lower id as a replay of that batch, so a
        fixed default would make every later call drop all prior state.
        Pass an explicit id only for replay-idempotent streaming use.
        """
        self.write_batch(
            single_cell(self.spark, rowkey, qualifier, value, cf),
            self._next_batch_id() if batch_id is None else batch_id,
        )

    def put_bulk(self, messages_df: DataFrame, rowkey_prefix: str,
                 cf: str = "cf1", batch_id: int | None = None) -> None:
        """S4 intent: distinct (key,value) records → one cell each
        (HbaseWriter.scala:42-74), null keys → sentinel row."""
        self.write_batch(
            bulk_cells(messages_df, rowkey_prefix, cf),
            self._next_batch_id() if batch_id is None else batch_id,
        )


def single_cell(
    spark: SparkSession,
    rowkey: str,
    qualifier: str,
    value: str,
    cf: str = "cf1",
) -> DataFrame:
    """One summary cell in cell shape — the single source of the
    (rowkey, cf, qualifier, value) construction, shared by put_single
    and the pipeline's merged per-batch write (code-review r15: two
    inline copies could drift)."""
    return spark.createDataFrame(
        [(rowkey, cf, qualifier, value)],
        "rowkey string, cf string, qualifier string, value string",
    )


def bulk_cells(
    messages_df: DataFrame, rowkey_prefix: str, cf: str = "cf1"
) -> DataFrame:
    """The S4 bulk rows in cell shape (rowkey, cf, qualifier, value) —
    shared by put_bulk and the pipeline's merged per-batch write.
    Bulk rowkeys are '{prefix}-{key}' with qualifier 'content', so
    they can never collide with the batch summary cell (bare-epoch
    rowkey, qualifier 'message'/'messages')."""
    return (
        messages_df.select(
            F.when(
                F.col("key").isNull(),
                F.lit(f"{rowkey_prefix}-kafka empty message"),
            )
            .otherwise(F.concat(F.lit(f"{rowkey_prefix}-"), F.col("key")))
            .alias("rowkey"),
            F.lit(cf).alias("cf"),
            F.lit("content").alias("qualifier"),
            F.when(F.col("key").isNull(), F.lit("kafka empty message"))
            .otherwise(F.concat_ws("--|--", F.col("key"), F.col("value")))
            .alias("value"),
        )
        .dropDuplicates()
    )
