"""Property-based checks (hypothesis) for the distributed patterns
whose correctness is easy to break silently: the two-phase global
prefix sum must equal the naive single-partition window for EVERY
input and partition count, not just the fixture."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka_spark_streaming_spark.operators.llm_pipeline import (
    exclusive_prefix_sum,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(st.integers(min_value=0, max_value=5000), max_size=60),
    n_parts=st.integers(min_value=1, max_value=7),
)
def test_two_phase_prefix_sum_equals_global_window(spark, values, n_parts):
    rows = [(i, v) for i, v in enumerate(values)]
    d = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r.doc_id: r.c
        for r in exclusive_prefix_sum(d, "doc_id", "n", n_parts).collect()
    }
    wref = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    want = {
        r.doc_id: r.c
        for r in d.withColumn(
            "c", F.coalesce(F.sum("n").over(wref), F.lit(0))
        ).collect()
    }
    assert got == want
