"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query smoke check at sf0.001.
queries()         — every implemented operator from SURVEY.md §2 +
                    north-star extensions, via the package registry.
oracle_sql()      — DuckDB-equivalent SQL per query (omitted for
                    genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary on sf0.001."""
    from kafka_spark_streaming_spark.operators import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_spark_streaming_spark.operators import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from kafka_spark_streaming_spark.operators import ORACLES, ordered_queries

    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}
