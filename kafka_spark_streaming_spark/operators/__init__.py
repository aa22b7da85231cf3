"""Operator package — importing it populates the query registry."""

from kafka_spark_streaming_spark.operators.registry import ORACLES, QUERIES, register

# Import order = SURVEY.md §2 inventory order; each module registers its
# queries on import.
from kafka_spark_streaming_spark.operators import reference_parity  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import analytic  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import dedup  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import multimodal  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import similarity  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import text  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import relational  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import relational_ext  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import relational_tpch2  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import asof  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import sketches  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import physical  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import quality  # noqa: E402,F401
from kafka_spark_streaming_spark.operators import streaming_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
