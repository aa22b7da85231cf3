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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), min_size=1, max_size=30
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_ngrams_equal_python_reference(spark, toks, n):
    from kafka_spark_streaming_spark.operators.text import _ngrams

    d = spark.createDataFrame([(toks,)], "toks array<string>")
    got = d.select(_ngrams(F.col("toks"), n).alias("g")).head().g
    want = [
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
    ]
    assert got == want


def test_pagerank_mass_conserved(spark, sf_smoke):
    # every rank in (0,1); total mass ≤ 1 (dangling-node mass may leak
    # by design) and ≥ the pure-teleport floor (1-d) = 0.15
    from kafka_spark_streaming_spark.operators import QUERIES

    rows = QUERIES["g_pagerank_trade"](spark, sf_smoke).collect()
    total = sum(r.pagerank for r in rows)
    assert all(0.0 < r.pagerank < 1.0 for r in rows)
    assert 0.15 <= total <= 1.000001


def test_edit_distance_pairs_all_within_threshold(spark, sf_smoke):
    from kafka_spark_streaming_spark.operators import QUERIES

    rows = QUERIES["d_edit_distance_pairs"](spark, sf_smoke).collect()
    assert all(r.edit_dist <= 16 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_mixture_rebalance_rates_and_counts_consistent(spark, sf_smoke):
    from kafka_spark_streaming_spark.operators import QUERIES

    rows = QUERIES["smp_mixture_rebalance"](spark, sf_smoke).collect()
    for r in rows:
        assert 0.0 < r.rate <= 1.0
        assert 0 <= r.n_kept <= r.n_docs
        if r.rate == 1.0:  # no-downsample sources keep everything
            assert r.n_kept == r.n_docs
