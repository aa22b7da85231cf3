"""Table maintenance: small-file compaction.

Streaming sinks and per-batch appends produce file counts that grow
without bound (the reference's per-record HBase puts are the extreme
case, KafkaStreamerToHbase.scala:156-160); on a parquet lake, millions
of tiny files destroy scan scheduling long before they hurt storage.
Compaction rewrites a directory to ~target-sized files and atomically
swaps it in.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # cluster default; tests shrink it


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite `path` (a parquet dir) into ceil(bytes/target) files.

    Returns the new file count. Uses size-based sizing, not row counts,
    so wide and narrow tables both land near the target. The rewrite
    goes to a sibling temp dir first and replaces the original only
    after _SUCCESS, so readers never see a half-written table.
    """
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))
    tmp = f"{path.rstrip('/')}.compact-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).repartition(n_files).write.parquet(tmp)
    old = f"{path.rstrip('/')}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
