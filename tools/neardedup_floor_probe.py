"""Floor-vs-data-work split for s_incremental_near_dedup (VERDICT r21
#4 — "re-run the r9 floor probe on current code and publish the split").

Two interleaved arms, N rounds each, min kept, in ONE session:

- FLOOR: the identical streaming machinery — same _docs_ordered_batches
  source, same forced micro-batch count, same scoped small-batch drain
  confs, availableNow trigger, checkpoint dir — with a TRIVIAL
  foreachBatch body (batch_df.count()).  This prices the per-drain
  fixed cost: stream start/stop, n micro-batch boundaries, source
  scan, commit log.
- FULL: the registered query, noop-forced end to end (probes + verify
  + the one store append per batch + the final store read).

data work = FULL - FLOOR.  The r9-era attribution said the machinery
floor dominates; this re-measures it on the r22 code.

Usage: python tools/neardedup_floor_probe.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_batches = 4

    from kafka_spark_streaming_spark.operators import QUERIES
    from kafka_spark_streaming_spark.operators.streaming_queries import (
        _docs_ordered_batches,
        _scoped_sql_confs,
        _scratch_dir,
        _small_batch_drain_confs,
    )
    from kafka_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="neardedup-floor-probe")

    def settle() -> None:
        while spark.streams.active:
            for q in spark.streams.active:
                try:
                    q.stop()
                except Exception:  # noqa: BLE001 — settle is best-effort
                    pass
            time.sleep(0.2)
        spark.range(1).count()

    def floor_arm() -> float:
        settle()
        stream = _docs_ordered_batches(spark, sf_dir, n_batches)
        run_dir = _scratch_dir("kss_increddup_")
        t0 = time.perf_counter()
        with _scoped_sql_confs(
            spark, _small_batch_drain_confs(spark, 8)
        ):
            q = (
                stream.writeStream.foreachBatch(
                    lambda df, bid: df.count()
                )
                .option(
                    "checkpointLocation", os.path.join(run_dir, "ckpt")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return time.perf_counter() - t0

    def full_arm() -> float:
        settle()
        t0 = time.perf_counter()
        QUERIES["s_incremental_near_dedup"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    floor, full = [], []
    for r in range(rounds):
        floor.append(round(floor_arm(), 3))
        full.append(round(full_arm(), 3))
        print(
            f"[round {r + 1}/{rounds}] floor {floor[-1]} full {full[-1]}",
            file=sys.stderr,
        )
    settle()
    spark.stop()
    f, g = min(floor), min(full)
    print(
        {
            "sf_dir": sf_dir,
            "n_batches": n_batches,
            "floor_sec": floor,
            "full_sec": full,
            "floor_min": f,
            "full_min": g,
            "data_work_min": round(g - f, 3),
            "data_work_frac": round((g - f) / g, 3),
        }
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
