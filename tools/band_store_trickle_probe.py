"""Measure the trickle-regime cost of the bucketed incremental-dedup
band store vs the pre-r15 full-history re-band — the experiment behind
the PERF_NOTES r15 attribution ("the probe is at the local scheduling
floor; the shape argument is what changes at 100 TB").

Protocol: take a small trickle batch (default 5 docs), build a
history profile/band store from the rest of the corpus (optionally
replicated), and min-of-3 time the candidate-generation step two ways:

- OLD: read history profiles, re-derive band_buckets over the full
  history, join against the batch's bands (per-batch cost grows with
  corpus size);
- NEW: partition-pruned read of the precomputed (doc_id, bh) band
  store restricted to the batch's pb values, join against the batch's
  bands (per-batch cost is batch + probed-bucket bytes).

r16 note: band rows now live in the combined (kind, pk)-partitioned
store (kind=b slice); this tool builds that layout and keeps timing
the production probe.  Re-run on the r16 layout (sf0.1, NB=256,
5-doc batch): old re-band 0.430/0.608 s at 5k/50k history vs pruned
probe 1.006/1.083 s (68/256 buckets) — same attribution as r15: the
probe is FLAT in corpus size while the re-band grows with it; the
crossover is where history stops fitting the fixed overhead (~10^6+
docs locally, any realistic cluster corpus).

Committed local result (sf0.1, NB=256, 5-doc batch): old 0.89/0.59 s
at 5k/50k-doc history vs probe 1.21/0.88 s probing 68/256 buckets —
at this scale fixed job/file-listing overhead dominates both shapes,
so the probe never wins locally; it wins when re-banding the history
stops being free (10^9 docs = 16x10^9 band rows re-hashed per
micro-batch) and when cluster-scale bucket counts make a trickle
batch prune most of the store.  Candidate counts are asserted equal
between the two shapes on every run.

Usage:  python tools/band_store_trickle_probe.py [sf_dir] [replicate]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NB = 256
BATCH_DOCS = 5


def main() -> int:
    from pyspark.sql import functions as F

    from kafka_spark_streaming_spark.operators.dedup import (
        band_buckets,
        minhash_profile,
        shingles_of,
    )
    from kafka_spark_streaming_spark.session import get_spark
    from kafka_spark_streaming_spark.tables import table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # dict.fromkeys dedupes while keeping order, so `replicate 1`
    # doesn't re-run (and re-write) the mult=1 iteration
    mults = list(
        dict.fromkeys([1, int(sys.argv[2])] if len(sys.argv) > 2 else [1, 10])
    )
    spark = get_spark(app_name="kss-trickle-probe", cpus=8,
                      shuffle_partitions=8)
    docs = table(spark, sf, "documents")
    batch = docs.filter(F.col("doc_id") < BATCH_DOCS)
    hist = docs.filter(F.col("doc_id") >= BATCH_DOCS)
    bprof = minhash_profile(shingles_of(batch)).localCheckpoint(eager=True)
    incoming = band_buckets(bprof)

    def timeit(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    def cand(x_bands):
        return (
            x_bands.alias("x")
            .join(
                incoming.alias("y"),
                (F.col("x.bh") == F.col("y.bh"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select("x.doc_id", "y.doc_id")
            .dropDuplicates()
            .count()
        )

    work = tempfile.mkdtemp(prefix="kss_trickleprobe_")
    try:
        for mult in mults:
            h = hist
            if mult > 1:
                h = (
                    hist.crossJoin(
                        spark.range(mult).withColumnRenamed("id", "rep")
                    )
                    .withColumn(
                        "doc_id",
                        F.col("doc_id") * mult + F.col("rep") + BATCH_DOCS,
                    )
                    .drop("rep")
                )
            pdir = os.path.join(work, f"prof{mult}")
            minhash_profile(shingles_of(h)).write.parquet(pdir)
            # r16 combined-store layout: band rows live under
            # kind=b/pk= in the one (kind, pk)-partitioned dataset
            # the production probe reads
            bdir = os.path.join(work, f"store{mult}")
            (
                band_buckets(spark.read.parquet(pdir))
                .withColumn("pk", F.pmod(F.col("bh"), F.lit(NB)))
                .withColumn("kind", F.lit("b"))
                .repartition("kind", "pk")
                .write.partitionBy("kind", "pk")
                .parquet(bdir)
            )
            n_hist = spark.read.parquet(pdir).count()

            def old():
                return cand(
                    band_buckets(spark.read.parquet(pdir)).unionByName(
                        incoming
                    )
                )

            def new():
                # the PRODUCTION probe helper, not a re-implementation
                # — so this tool keeps timing the real code path if the
                # store layout or pruning predicate ever changes
                from kafka_spark_streaming_spark.operators import (
                    streaming_queries as SQ,
                )

                pbs = [
                    r[0]
                    for r in incoming.select(
                        F.pmod(F.col("bh"), F.lit(NB)).alias("pk")
                    )
                    .distinct()
                    .collect()
                ]
                probe = SQ._bucketed_band_probe(spark, bdir, pbs)
                return cand(probe.unionByName(incoming)), len(pbs)

            c_old = old()
            c_new, npb = new()
            assert c_old == c_new, (
                f"pruned probe changed the candidate set: {c_old} vs {c_new}"
            )
            print(
                f"history={n_hist}: old re-band {timeit(old):.3f}s | "
                f"pruned probe {timeit(lambda: new()):.3f}s "
                f"(pbs {npb}/{NB}, cands {c_new})"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
