"""Plan-inspection CLI: print the physical plan (or run + row count)
of any registered query — the `EXPLAIN` front door for the engine's
query surface.

    python -m kafka_spark_streaming_spark.explain q1_pricing_summary
    python -m kafka_spark_streaming_spark.explain d_minhash_lsh_pairs \
        --sf /root/testdata/sf0.01 --mode simple --run
    python -m kafka_spark_streaming_spark.explain --list

`--list` enumerates every registered query (driver-emission order).
Streaming-backed queries (`s_*`) execute a real drain when
constructed, so their plan is the FINAL folded state's plan — noted in
the output.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kafka_spark_streaming_spark.explain",
        description="print the plan of a registered query",
    )
    p.add_argument("query", nargs="?", help="registered query name")
    p.add_argument(
        "--sf",
        dest="sf_dir",
        default="/root/testdata/sf0.001",
        help="fixture dir (default sf0.001 — plan shape is SF-invariant)",
    )
    p.add_argument(
        "--mode",
        choices=["simple", "extended", "formatted", "cost"],
        default="formatted",
        help="Spark explain mode (default formatted)",
    )
    p.add_argument(
        "--run",
        action="store_true",
        help="also execute the query and print its row count",
    )
    p.add_argument(
        "--list", action="store_true", help="list registered queries"
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from kafka_spark_streaming_spark.operators import ordered_queries

    queries = ordered_queries()
    if args.list:
        for name in queries:
            print(name)
        return 0
    if not args.query:
        print("error: provide a query name or --list", file=sys.stderr)
        return 2
    if args.query not in queries:
        import difflib

        close = difflib.get_close_matches(args.query, queries, n=3)
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        print(f"error: unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from kafka_spark_streaming_spark.session import get_spark

    # get_spark() is getOrCreate(): when an ambient session already
    # exists (pytest fixture, notebook) it is returned, not created —
    # stopping it would kill the caller's session. Only stop what this
    # CLI itself created. getActiveSession() is THREAD-local, so on its
    # own it misses a session created by another thread that getOrCreate
    # would still return — also check the process-wide handle. The JVM's
    # getDefaultSession is NOT exposed to Python (ADVICE r10: calling it
    # raised AttributeError on every standalone invocation); the Python
    # process-wide equivalent is SparkSession._instantiatedSession.
    pre_existing = (
        SparkSession.getActiveSession() is not None
        # private attr — present in current PySpark but unstable API;
        # getattr so an upgrade degrades to the thread-local check
        # instead of reintroducing the AttributeError (ADVICE r11)
        or getattr(SparkSession, "_instantiatedSession", None) is not None
    )
    spark = get_spark(app_name=f"kss-explain-{args.query}")
    try:
        df = queries[args.query](spark, args.sf_dir)
        if args.query.startswith("s_"):
            print(
                "# streaming-backed query: the plan below is the FINAL "
                "folded state's plan\n"
            )
        print(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    args.mode
                )
            )
        )
        if args.run:
            print(f"\n# rows: {df.count()}")
    finally:
        if not pre_existing:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
