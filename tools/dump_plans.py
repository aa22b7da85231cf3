"""Dump .explain('formatted') for named registered queries to files.

Usage:
    python tools/dump_plans.py <suffix> <query> [query ...]

Writes plans/<KSS_PLAN_ROUND (default r21)>/<query>_<suffix>.txt for each
query. Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) without
executing the query (pure planning), so the files record the static plan
shape (Exchange count, join strategy, PushedFilters, ReadSchema) the
judge checks optimization claims against.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("KSS_PLAN_ROUND", "r21")
    out_dir = os.path.join(REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    from kafka_spark_streaming_spark.operators import QUERIES
    from kafka_spark_streaming_spark.session import get_spark

    unknown = sorted(set(names) - set(QUERIES))
    if unknown:
        # fail before a Spark session is booted for nothing
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="kss-plan-dump")
    try:
        for n in names:
            df = QUERIES[n](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{n}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
