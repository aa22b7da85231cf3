"""Benchmark harness — one JSON line for the driver (BENCH_r{N}.json).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is forced
end-to-end with a noop-format write (full plan executes, nothing
collected to the driver — same shape a cluster job has).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — scan-agg, top-k join,
# star join, scan-filter-agg, multiway join, windowing, as-of join,
# streaming fold, stateful streaming, dedup (minhash path),
# similarity, sketch, text, multimodal.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
    "w_top3_parts_per_brand",
    "sessionize_events",
    "aj_purchase_last_click",
    "s_stream_value_counts",
    "s_stateful_user_stats",
    "d_minhash_lsh_pairs",
    "sim_topk_bruteforce",
    "sk_heavy_hitter_tokens",
    "t_quality_score",
    "t_top_tokens",
    "m_media_features",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_spark_streaming_spark.operators import QUERIES
    from kafka_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="kss-bench")
    names = [n for n in HEADLINE if n in QUERIES]
    # Warm every plan shape once on the smallest SF so the timed
    # section measures the engine, not first-call codegen/JIT.
    for n in names:
        _force(QUERIES[n](spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    for n in names:
        q0 = time.perf_counter()
        _force(QUERIES[n](spark, sf_dir))
        timings[n] = round(time.perf_counter() - q0, 3)
    total = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
