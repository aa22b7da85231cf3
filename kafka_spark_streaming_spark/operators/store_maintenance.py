"""Maintenance passes for the engine's on-disk incremental stores.

The incremental-dedup store (operators/streaming_queries.py) is an
append-only (kind, pk)-partitioned dataset where every micro-batch
lands exactly one file per touched leaf — by design, so probe listings
stay O(batches x buckets).  On a long-running stream that linear file
growth is the one unbounded term left in the store's cost model (the
probes themselves are partition-pruned): after 10k batches a 32-bucket
store lists ~hundreds of thousands of files.  `compact_dedup_store`
folds each leaf back to one file, capping listings at O(buckets)
between maintenance runs — the same role OPTIMIZE/rewrite_data_files
plays for a Delta/Iceberg table, and the symmetric move to the upsert
sink's manifest compaction (sinks/upsert.py).

Crash safety WITHOUT atomic directory swaps: the store's read paths
are duplicate-tolerant by construction (the replay-idempotence
argument — band duplicates only duplicate candidates, which the
candidate dropDuplicates collapses; profile duplicates only duplicate
verify matches, and `rejected` is distinct'd; the final read dedups by
doc_id).  Compaction exploits exactly that invariant: it APPENDS the
compacted files into the live leaves first and deletes the originals
last, so every crash point leaves either extra bit-identical rows
(tolerated) or a finished compaction — never a missing-store or
half-swapped state.  This is test-pinned by re-introducing an
already-deleted original file and checking reads are unchanged.

Single WRITER contract (same as the store's): run only while no
stream is appending to the store — compaction enumerates the files it
will delete before writing, and a concurrent append's new file would
survive untouched, but a concurrent appender could also be mid-commit
when the leaf listing runs.  Schedule it between drains (availableNow
streams make that trivial) or from the stream's own idle hook.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession


def _leaf_dirs(store_dir: str) -> list[str]:
    return sorted(
        d
        for d in glob.glob(os.path.join(store_dir, "kind=*", "pk=*"))
        if os.path.isdir(d)
    )


def _data_files(leaf: str) -> list[str]:
    return sorted(
        os.path.join(leaf, f)
        for f in os.listdir(leaf)
        if f.endswith(".parquet")
    )


def compact_dedup_store(
    spark: SparkSession, store_dir: str, min_files: int = 2
) -> dict:
    """Fold every (kind, pk) leaf of an incremental-dedup store back to
    one file.  Returns {leaves, files_before, files_after, rewrote}.

    Steps (order is the crash-safety argument — see module docstring):
      1. snapshot the current data files per leaf (the deletion set);
      2. ONE Spark job rewrites the whole store into a sibling tmp
         dataset, repartitioned to one file per leaf;
      3. move the compacted files INTO the live leaves (os.rename,
         same filesystem; Spark part names carry a job UUID so they
         cannot collide with existing names);
      4. delete the snapshotted originals (+ their .crc sidecars);
      5. remove the tmp dataset.
    A crash after any step leaves only bit-identical duplicate rows,
    which every read path collapses.  Leaves already at one file are
    left byte-identical (no rewrite) when NO leaf needs work; when any
    does, the single-job rewrite covers all leaves (simpler than
    per-leaf jobs, and maintenance cost is one store scan either way).
    """
    leaves = _leaf_dirs(store_dir)
    before = {leaf: _data_files(leaf) for leaf in leaves}
    files_before = sum(len(v) for v in before.values())
    if not leaves or all(len(v) < min_files for v in before.values()):
        return {
            "leaves": len(leaves),
            "files_before": files_before,
            "files_after": files_before,
            "rewrote": False,
        }

    tmp = store_dir.rstrip("/") + ".compact.tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # leftover from a crashed prior run
    # full-row dropDuplicates: the only duplicates a store can carry
    # are bit-identical (replayed batches and crashed prior
    # compactions — deterministic profiles, one batch per doc), and
    # reads merely tolerate them; compaction is the natural place to
    # collapse them permanently so a crash-then-rerun cannot bake the
    # crash window's extra rows into the store forever.  repartition
    # on the partition keys lands each leaf in exactly one task, so
    # partitionBy writes exactly one file per leaf (same argument as
    # the append job's).
    (
        spark.read.parquet(store_dir)
        .dropDuplicates()
        .repartition("kind", "pk")
        .write.mode("overwrite")
        .partitionBy("kind", "pk")
        .parquet(tmp)
    )
    # move compacted files into the live leaves (append-first)
    for tleaf in _leaf_dirs(tmp):
        rel = os.path.relpath(tleaf, tmp)
        dest = os.path.join(store_dir, rel)
        os.makedirs(dest, exist_ok=True)
        for f in os.listdir(tleaf):
            if f.endswith(".parquet") or f.endswith(".parquet.crc"):
                os.rename(os.path.join(tleaf, f), os.path.join(dest, f))
    # delete originals last — the only step that removes data, and by
    # now every row exists in a compacted file
    for leaf, files in before.items():
        for f in files:
            for path in (f, os.path.join(
                os.path.dirname(f), "." + os.path.basename(f) + ".crc"
            )):
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass
    shutil.rmtree(tmp, ignore_errors=True)
    files_after = sum(len(_data_files(leaf)) for leaf in _leaf_dirs(store_dir))
    return {
        "leaves": len(leaves),
        "files_before": files_before,
        "files_after": files_after,
        "rewrote": True,
    }
