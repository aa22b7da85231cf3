"""CLI for the incremental-dedup store maintenance pass.

Usage:
    python tools/compact_dedup_store.py [--force] /path/to/store [more...]

Folds every (kind, pk) leaf of each store back to one file (see
kafka_spark_streaming_spark/operators/store_maintenance.py for the
crash-safety argument).  The single-writer contract is ENFORCED
(r18): the pass refuses a store whose writer token names a live
drain (run between drains, or let the drain's
spark.kss.dedup.compactEveryNBatches policy compact in-line), and
--force overrides a token you know is stale.  Prints one JSON line
per store.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(paths: list[str]) -> int:
    force = "--force" in paths
    paths = [p for p in paths if p != "--force"]
    if not paths:
        print(__doc__.strip())
        return 2
    from kafka_spark_streaming_spark import get_spark
    from kafka_spark_streaming_spark.fencing import StaleWriterError
    from kafka_spark_streaming_spark.operators.store_maintenance import (
        compact_dedup_store,
    )

    spark = get_spark()
    rc = 0
    for p in paths:
        if not os.path.isdir(p):
            print(json.dumps({"store": p, "error": "not a directory"}))
            rc = 1
            continue
        try:
            stats = compact_dedup_store(spark, p, force=force)
        except StaleWriterError as exc:
            print(json.dumps({"store": p, "error": str(exc)}))
            rc = 1
            continue
        print(json.dumps({"store": p, **stats}))
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
