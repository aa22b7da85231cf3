"""Registry-wide physical-plan lint — the 100 TB posture as a global
invariant, not a per-query spot check.

Every registered BATCH query's plan is screened for the two patterns
that kill a 1000-executor run regardless of data layout:

- ``CartesianProduct`` — an all-pairs shuffle join. Any operator that
  needs pairwise semantics must get there via equi-join blocking
  (bands, buckets, prefixes) or an explicit small-side broadcast
  (``BroadcastNestedLoopJoin`` against a bounded side is acceptable
  and separately allow-listed).
- ``BatchEvalPython`` / ``PythonUDF`` outside Arrow — row-at-a-time
  Python in the hot path. All Python must be Arrow-batched
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``).

Streaming-backed queries (``s_*``) are excluded: calling them executes
a real stream drain, and their stateful plans are asserted in
test_streaming.py instead.
"""

from __future__ import annotations

import pytest

from kafka_spark_streaming_spark.operators import QUERIES

# queries whose BroadcastNestedLoopJoin is a deliberate bounded-side
# broadcast (tiny query/count/cutoff frames), reviewed individually
_BNLJ_OK = {
    "sim_topk_bruteforce",   # query side: 5 rows, broadcast by design
    "sim_topk_blocked",      # same query side feeding the GEMM variant
    "sim_ann_lsh",           # broadcast hyperplane/query tables
    "sim_ann_ivf",           # broadcast centroids/queries
    "d_embedding_near_dup",  # brute all-pairs ORACLE CROSS-CHECK only —
                             # the scale primary is d_embedding_near_dup_lsh
                             # (equi-join candidates, no BNLJ entry needed)
    "d_semantic_only_pairs", # brute oracle cross-check — scale primary is
                             # d_semantic_only_pairs_lsh (equi-join)
    "t_tfidf_top_terms",     # 1-row corpus count broadcast
    "t_unigram_logprob",     # 1-row token total broadcast
    "pipe_quality_filter",   # 1-row percentile cutoffs broadcast
    "smp_mixture_rebalance", # 1-row corpus totals broadcast
    "g_pagerank_trade",      # 1-row node count broadcast
    "r_batch_summary",       # 1-row distinct-count agg join
    "q20_red_part_suppliers",   # 1-row qty-total broadcast (tpch2.py:375)
    "q22_inactive_rich_customers",  # 1-row avg-acctbal broadcast
    "sk_heavy_hitter_tokens",   # 1-row corpus-count threshold broadcast
    "time_gapfill_daily",       # broadcast day-spine bounds (1 row)
    "w_revenue_deciles",        # 1-row decile-cutpoints broadcast
}


def _batch_names() -> list[str]:
    return sorted(n for n in QUERIES if not n.startswith("s_"))


@pytest.mark.parametrize("name", _batch_names())
def test_no_cartesian_no_row_python(spark, sf_smoke, name):
    df = QUERIES[name](spark, sf_smoke)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unreviewed nested-loop join — if the non-equi side "
            "is bounded by design, add it to _BNLJ_OK with a reason"
        )
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python"
