"""Local replica of the driver's correctness gate (BASELINE.json:2).

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables, then compares row count, column names, and
order-insensitive values. Strict equality on values: the numeric policy
in kafka_spark_streaming_spark/functions/__init__.py makes both engines
produce bit-identical numbers, so any diff here is a real bug.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from kafka_spark_streaming_spark.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_cols, spark_rows, ora_cols, ora_rows) -> list[str]:
    """Return a list of human-readable diffs (empty = match)."""
    problems: list[str] = []
    if sorted(spark_cols) != sorted(ora_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
        return problems
    if len(spark_rows) != len(ora_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} oracle={len(ora_rows)}")
    a = _canon(spark_cols, spark_rows)
    b = _canon(ora_cols, ora_rows)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            problems.append(f"first value diff at sorted row {i}:\n  spark  = {ra}\n  oracle = {rb}")
            break
    return problems


def assert_matches_oracle(spark, name: str, sf_dir: str) -> None:
    from kafka_spark_streaming_spark.operators import ORACLES, QUERIES

    df = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    ora_cols, ora_rows = run_oracle(ORACLES[name], sf_dir)
    problems = compare(spark_cols, spark_rows, ora_cols, ora_rows)
    assert not problems, f"{name} @ {sf_dir}:\n" + "\n".join(problems)
