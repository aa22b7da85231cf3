"""Keyed-upsert sink — the reference's HBase cell model on parquet.

HBase semantics (SURVEY.md §1.1, HbaseWriter.scala:22-31,76-82): a row
is (rowkey, cf, qualifier) → value; writing the same cell again
overwrites it (last-write-wins). The reference offers a single-row put
(S3) and a bulk per-batch put (S4, whose implementation was broken —
driver-side ArrayList mutated on executors; we implement the intent).

Design for scale:
- State lives in versioned parquet dirs `v_{batch_id}`, each
  partitioned by `rb = pmod(xxhash64(rowkey), buckets)` — the parquet
  analogue of the rowkey-range region sharding of the HBase table the
  reference writes through (HbaseWriter.scala:26-29; a hash of the
  key gives the same pruning with none of the range-boundary skew).
  Each batch LWW-merges ONLY the rb partitions its rowkeys touch —
  the prior-state read is partition-pruned (PartitionFilters,
  plan-pinned in tests/test_plans.py::
  test_upsert_merge_prunes_state_partitions) and the merge shuffle
  moves |touched partitions| + |batch| rows, not |state| (VERDICT
  r15 #3: the per-batch one-shuffle-of-|state| was the next shape to
  go if the sink carries volume).  Untouched partitions are carried
  into the new version as hard links — O(#files) driver metadata
  work, zero data movement (the HDFS deployment analogue is a
  manifest/Delta MERGE, which rewrites only touched files the same
  way).  Bucket count is engine config
  (spark.kss.sink.upsertStateBuckets — config.py has the 100 TB
  sizing rule).
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

from pyspark.sql import Column, DataFrame, SparkSession
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
        from kafka_spark_streaming_spark.config import (
            persisted_layout,
            upsert_state_buckets,
        )

        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        # The bucket count is a property of the STORE, not the
        # session: reopening an rb-partitioned store under a different
        # count would prune the prior read with the wrong pmod and
        # hard-link stale rows forward as "untouched" — silent LWW
        # corruption (code-review r16).  So the count is persisted in
        # a _BUCKETS marker at attach and every later attach reads the
        # marker; the conf only seeds brand-new stores.
        (self.buckets,) = persisted_layout(
            os.path.join(path, "_BUCKETS"),
            lambda: (upsert_state_buckets(spark),),
            arity=1,
        )

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

    def _rb(self, col) -> Column:
        return F.pmod(F.xxhash64(col), F.lit(self.buckets)).cast("int")

    def _head_rb_dirs(self, version: str) -> list[str]:
        """rb= partition dirs of a committed version ([] for a store
        written by the pre-r16 unpartitioned layout — the merge then
        falls back to a full-state LWW once and writes the new layout,
        a self-migrating upgrade)."""
        vdir = os.path.join(self.path, version)
        return sorted(
            d for d in os.listdir(vdir)
            if d.startswith("rb=")
            and os.path.isdir(os.path.join(vdir, d))
        )

    def _current_raw(self) -> DataFrame:
        """Current state INCLUDING the rb layout column."""
        versions = self._versions()
        if not versions:
            return self.spark.createDataFrame([], STATE_SCHEMA).withColumn(
                "rb", F.lit(None).cast("int")
            )
        df = self.spark.read.parquet(os.path.join(self.path, versions[-1]))
        if "rb" not in df.columns:  # pre-r16 unpartitioned store
            df = df.withColumn("rb", self._rb(F.col("rowkey")))
        return df

    def current(self) -> DataFrame:
        """Current cell state as a DataFrame (empty if no writes yet).
        The rb layout column is internal — consumers see cell shape."""
        return self._current_raw().drop("rb")

    # -- the upsert -------------------------------------------------------
    def _merged_state(
        self, stamped: DataFrame, batch_id: int, rbs: list
    ) -> DataFrame:
        """LWW(touched prior partitions ∪ batch) — the distributed half
        of write_batch, factored out so the partition-pruned prior read
        is a testable plan property.  Rows outside `rbs` never enter
        the shuffle; they are carried forward file-for-file by
        write_batch."""
        prior = self._current_raw().filter(
            F.col("rb").isin(rbs) & (F.col("batch_id") < batch_id)
        )
        merged = prior.unionByName(stamped)
        w = W.partitionBy(*CELL_KEY).orderBy(
            F.desc("batch_id"), F.desc("value")
        )
        return (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """MERGE-style last-write-wins upsert of (rowkey, cf, qualifier, value).

        One shuffle on the TOUCHED rb partitions' cells only (r16 —
        was the full state); untouched partitions are hard-linked into
        the new version with no data movement.  Safe under foreachBatch
        replay: a retry of batch N sees head v_N whose untouched
        partitions hold only batch_id < N rows (a deterministic replay
        touches the same rb set it touched before), and the touched
        partitions re-merge from the batch_id < N residue exactly as
        the first attempt did.
        """
        stamped = (
            batch_df.select(*CELL_KEY, F.col("value").cast("string"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .withColumn("rb", self._rb(F.col("rowkey")))
            .persist()
        )
        try:
            # bounded collect (≤ buckets scalars) — names the touched
            # partitions AND materializes the batch cache in one job,
            # the same collect-as-materializer pattern as the
            # incremental-dedup batch body
            rbs = [r[0] for r in stamped.select("rb").distinct().collect()]
            versions = self._versions()
            head = versions[-1] if versions else None
            head_rb_dirs = self._head_rb_dirs(head) if head else []
            if not rbs and not head_rb_dirs:
                # empty batch over empty-or-flat state: a 0-row
                # partitionBy write emits NO files, so the version dir
                # would hold only _SUCCESS (or, over a flat pre-r16
                # head, only whatever a 0-row merge emits — possibly
                # nothing) and break schema inference on the next
                # read.  Nothing to record — skip the version; a flat
                # head stays readable as-is and migrates on the first
                # non-empty batch.  (An empty batch over a PARTITIONED
                # head still writes a version below: the hard-linked
                # partitions carry the schema.)  Checked BEFORE the
                # migration override so the flat-empty-head corner is
                # covered too (code-review r16).
                return
            if head and not head_rb_dirs:
                # pre-r16 unpartitioned head: one full merge migrates
                # the layout (no pruning is possible — there are no
                # partition dirs to prune or carry forward)
                rbs = list(range(self.buckets))
            new_state = self._merged_state(stamped, batch_id, rbs)

            out = os.path.join(self.path, f"v_{batch_id:012d}")
            tmp = out + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            new_state.write.mode("overwrite").partitionBy("rb").parquet(tmp)
            # carry untouched partitions forward as hard links:
            # O(#files) driver metadata, no read, no shuffle, no copy
            # (rmtree on a pruned old version only drops link counts).
            touched = {f"rb={r}" for r in rbs}
            for d in head_rb_dirs:
                if d in touched:
                    continue
                src = os.path.join(self.path, head, d)
                dst = os.path.join(tmp, d)
                os.makedirs(dst, exist_ok=True)
                for fname in os.listdir(src):
                    # data files plus their .crc sidecars (linking the
                    # checksum keeps LocalFileSystem verification
                    # active on carried-forward files; a missing crc
                    # would merely skip it)
                    if not fname.endswith((".parquet", ".parquet.crc")):
                        continue
                    os.link(
                        os.path.join(src, fname), os.path.join(dst, fname)
                    )
            if os.path.exists(out):
                shutil.rmtree(out)
            os.rename(tmp, out)
            self._prune(keep=2)
        finally:
            stamped.unpersist()

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
