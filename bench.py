"""Benchmark harness — one JSON line for the driver (BENCH_r{N}.json).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is forced
end-to-end with a noop-format write (full plan executes, nothing
collected to the driver — same shape a cluster job has).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — scan-agg, top-k join,
# star join, scan-filter-agg, multiway join, windowing, as-of join,
# streaming fold, stateful streaming, dedup (minhash path),
# similarity, sketch, text, multimodal.
# Streaming queries run LAST: stopping a streaming query leaves a
# transient tax (state-store unload + GC of micro-batch state) that
# the next ~one batch job in the session pays — measured ~4 s added to
# whatever runs immediately after. Batch first, streams last keeps
# every number attributable to its own query.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
    "w_top3_parts_per_brand",
    # r11: regression-prone history cases (VERDICT r9 #3 / r10 #3):
    # d_simhash_pairs rotted to 35-47 s unnoticed before the r9 13x fix;
    # d_containment_pairs rides the shared key-index artifact.
    "d_simhash_pairs",
    "d_containment_pairs",
    # r12: index-probe regressions are the likeliest perf-rot class
    # (three rounds running — VERDICT r11 #6); now sub-second after the
    # r11 memoized-index rewrite, so HEADLINE's min-of-3 + regressions
    # gate is cheap insurance on the probe path.
    "sim_ann_ivf",
    "sessionize_events",
    "aj_purchase_last_click",
    "d_minhash_lsh_pairs",
    "sim_topk_bruteforce",
    "sk_heavy_hitter_tokens",
    "t_quality_score",
    "t_top_tokens",
    "t_repetition_signals",
    "g_pagerank_trade",
    "m_media_features",
    "p_decontaminate_ngram",
    "p_pack_sequences",
    # r9: the three slowest r8 additions, gated so they can't regress
    # silently (VERDICT r8 next #6)
    "t_bigram_logprob",
    "sim_kmeans_clusters",
    "aj_scd2_point_lookup",
    "s_stream_value_counts",
    "s_stateful_user_stats",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _stateful_2batch(spark, sf_dir):
    # Same data, same operator, 2 forced micro-batch boundaries instead
    # of 4: the timing is dominated by the per-batch state-store floor
    # (task + commit + Arrow hop per store per batch), not by data
    # volume, so fewer forced batches makes the number interpretable as
    # operator cost rather than micro-batch count.
    from kafka_spark_streaming_spark.operators.streaming_queries import (
        s_stateful_user_stats,
    )

    return s_stateful_user_stats(spark, sf_dir, n_batches=2)


OVERRIDES = {"s_stateful_user_stats": _stateful_2batch}
NOTES = {
    "s_stateful_user_stats": (
        "applyInPandasWithState drained over 2 real micro-batches; "
        "cost is the per-batch state-store floor, amortized at scale "
        "by larger batches (registered correctness query uses 4)"
    ),
    "timing": (
        "per-query time = min of 3 timed passes; total = sum of mins; "
        "derived builds sampled twice (memo cleared) with min kept "
        "(shared-host VM shows 1.5-2x whole-run noise between passes, "
        "measured across identical back-to-back runs in r7)"
    ),
    "r17_scalar_map_funcs_rescope": (
        "scalar_map_funcs was rescoped in r17 to the l_orderkey % 97 "
        "== 0 slice of lineitem (Spark query and DuckDB oracle changed "
        "identically — parity holds); numbers from r17 onward are NOT "
        "comparable to pre-r17 rounds for this slot (ADVICE r17). The "
        "canonical comparison points — SWEEP_BASELINE.json and the "
        "latest BENCH_r*.json the gate reads — were both refreshed on "
        "the rescoped shape in r17"
    ),
    "r12_headline_change": (
        "sim_ann_ivf added to HEADLINE (VERDICT r11 #6) — the TOTAL "
        "grows by its ~1 s warm probe vs BENCH_r11 by construction; "
        "its one-time index build is reported in derived_build_sec"
    ),
    "r11_headline_change": (
        "d_simhash_pairs / d_containment_pairs added to HEADLINE "
        "(VERDICT r10 #3) — the TOTAL grows by their ~3 s vs BENCH_r10 "
        "by construction; per-query numbers + the regressions gate "
        "remain the round-over-round signal"
    ),
    "r9_headline_change": (
        "t_bigram_logprob / sim_kmeans_clusters / aj_scd2_point_lookup "
        "added to HEADLINE this round (VERDICT r8 next #6) — the TOTAL "
        "therefore grows by their ~5 s vs BENCH_r08 by construction; "
        "round-over-round comparability lives in the per-query numbers "
        "and the regressions gate, which covers every query present in "
        "both rounds"
    ),
    "derived_tables": (
        "d_minhash_lsh_pairs / g_pagerank_trade / p_decontaminate_ngram "
        "probe derived artifacts (minhash signature profile, distilled "
        "edge list, 8-gram index) memoized per (session, corpus) via "
        "tables.session_checkpoint — the production shape persists these "
        "next to the corpus, so the min-of-2 number measures the probe; "
        "each artifact's one-time build cost is reported separately as "
        "derived_build_sec and gated at the same 1.5x vs the previous "
        "round"
    ),
}


def _usable_queries(parsed: dict) -> dict[str, float]:
    """The per-query map of a bench doc iff it holds real timings.

    r21's tail-guard replaced `queries` with a slim pointer
    (`{"_see": ..., "n": 27}`) whose truthiness made _prev_bench adopt
    it as the baseline — every prev lookup then missed, so host_factor
    fell back to 1.0 and BOTH regression gates ran blind (observed on
    the first r22 bench: regressions [] against a baseline of zero
    usable entries).  A map carrying the slim marker is no baseline;
    non-numeric entries are dropped defensively either way."""
    q = parsed.get("queries") or {}
    if "_see" in q:
        return {}
    return {k: v for k, v in q.items() if isinstance(v, (int, float))}


def _prev_bench() -> tuple[dict[str, float], dict[str, float]]:
    """(per-query, derived-build) timings from the latest BENCH_r{N}.json
    that actually produced numbers — a crashed round (parsed: null, like
    r05) or a slim-line round (r21) is skipped, so the gate compares
    against the last REAL bench."""
    here = os.path.dirname(os.path.abspath(__file__))
    best_n, best_q, best_d = -1, {}, {}
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = doc.get("parsed") or doc
        q = _usable_queries(parsed)
        if int(m.group(1)) > best_n and q:
            best_n = int(m.group(1))
            best_q = q
            best_d = parsed.get("derived_build_sec") or {}
    return best_q, best_d


# JVM-side canary slots for host-drift normalization (VERDICT r18 #4,
# landed r20 after the predicted spurious q11 flag re-occurred in r19):
# pure whole-stage-codegen scan/agg queries with no Python workers, no
# derived artifacts and no streaming state, whose plans have been
# stable for many rounds — their ratio vs the previous committed round
# measures the HOST (CPU steal on this shared VM), not the code.
CANARIES = (
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
)


def host_factor(
    timings: dict[str, float],
    prev: dict[str, float],
    canaries: tuple[str, ...] = CANARIES,
) -> float:
    """Median canary slowdown this run vs the committed baseline,
    clamped to [1.0, 3.0] — the regressions gate divides by this, so
    pure host drift (every slot slower by ~the canary factor) cannot
    flag, while a real per-query regression still pokes above the
    canary-measured host speed.  Clamps: never below 1 (a FASTER host
    must not loosen the gate) and never above 3 (a canary regression
    beyond the observed drift band must surface as a flag, not
    silently forgive the whole board).  MEDIAN of three keeps one
    genuinely-regressed canary from inflating the factor — the other
    two outvote it and the regressed one then flags itself.  Shared
    policy: sf1_smoke delegates here (its r18 implementation was the
    prototype) and tools/sweep.py normalizes against its min-of-
    history baseline with the same function."""
    import statistics

    ratios = [
        timings[c] / prev[c]
        for c in canaries
        if timings.get(c) and prev.get(c)
    ]
    if not ratios:
        return 1.0
    return max(1.0, min(statistics.median(ratios), 3.0))


def regressions(
    timings: dict[str, float],
    prev: dict[str, float],
    ratio: float = 1.5,
    host: float = 1.0,
) -> list[dict]:
    """Queries whose canary-normalized time (sec / host) exceeds
    `ratio`× their previous-round time — the build-time gate the judge
    asked for (VERDICT r03 #4): a regression shows up in the bench
    JSON the round it happens, not a round later.  host=1.0 is the raw
    pre-r20 gate.  Flag entries record RAW seconds (code-review r20 —
    the sweep's gate_flags convention; a reader cross-checking `sec`
    against `queries[name]` must see the same number), with the
    normalization spelled out in norm_sec/norm_ratio/host when it is
    in effect."""
    out = []
    for n, sec in timings.items():
        p = prev.get(n)
        if p and p > 0 and sec / host > ratio * p:
            entry = {
                "query": n,
                "sec": sec,
                "prev_sec": p,
                "ratio": round(sec / p, 2),
            }
            if host != 1.0:
                entry.update(
                    {
                        "norm_sec": round(sec / host, 3),
                        "norm_ratio": round(sec / host / p, 2),
                        "host": round(host, 3),
                    }
                )
            out.append(entry)
    return out


def compact_line(doc: dict, budget: int = 1900) -> str:
    """Serialize the bench doc to the one printed JSON line, keeping it
    under the driver's 2000-byte stdout tail window.

    r21 post-mortem (VERDICT r21 #1): the old guard dropped the
    per-query map — the one part of the doc the driver's comparator and
    scaling block NEED — while keeping the unbounded regression arrays,
    which are exactly what grows on a loaded window.  Order inverted:
    the flag arrays are capped FIRST (top-3 by raw ratio, plus an
    honest `<name>_n` total so a capped line is self-describing), then
    derived_build_sec collapses to a pointer, and `queries` is NEVER
    dropped.  Full detail always lives in BENCH_FULL_LAST.json.
    """
    line = json.dumps(doc)
    if len(line) <= budget:
        return line
    pointer = {
        "_see": "BENCH_FULL_LAST.json",
        "n": len(doc.get("derived_build_sec") or {}),
    }
    for cap in (3, 2, 1, 0):
        slim = dict(doc)
        for key in ("regressions", "raw_regressions"):
            flags = doc.get(key) or []
            if len(flags) > cap:
                slim[key] = sorted(
                    flags, key=lambda e: -e.get("ratio", 0)
                )[:cap]
                slim[key + "_n"] = len(flags)
        line = json.dumps(slim)
        if len(line) <= budget:
            return line
        slim["derived_build_sec"] = pointer
        line = json.dumps(slim)
        if len(line) <= budget:
            return line
    # cap 0 + derived collapsed is the smallest doc that still honors
    # the contract; at that point the line is queries + scalars only.
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_spark_streaming_spark.operators import QUERIES
    from kafka_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="kss-bench")

    # Ground-truth "did any streaming query ever run" flag (ADVICE
    # r13): the state-store maintenance WARN the quiesce sleep guards
    # against only exists if a streaming query started in this
    # process.  Streams stop inside their query functions, so checking
    # spark.streams.active at teardown misses them — a listener sees
    # every start.  Batch-only invocations then skip the fixed 2 s
    # quiesce tax entirely.
    from pyspark.sql.streaming import StreamingQueryListener

    ran_streaming = {"flag": False}

    class _StreamFlag(StreamingQueryListener):
        def onQueryStarted(self, event):
            ran_streaming["flag"] = True

        def onQueryProgress(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_StreamFlag())
    names = [n for n in HEADLINE if n in QUERIES]
    fns = {n: OVERRIDES.get(n, QUERIES[n]) for n in names}
    # Warm every plan shape once on the smallest SF so the timed
    # section measures the engine, not first-call codegen/JIT.
    # Reversed: the streaming warmups (last in HEADLINE) run first, so
    # the post-stream-stop tax lands on warmup batch jobs, not on the
    # first timed query.
    for n in reversed(names):
        _force(fns[n](spark, "/root/testdata/sf0.001"))

    # Three timed passes, min per query: this box is a shared-host VM
    # and whole-run throughput swings 1.5-2× between invocations with
    # no local cause (load < nproc, no co-tenant process; measured 2×
    # across back-to-back identical runs in r7).  min-of-N reports the
    # machine's actual capability per plan rather than whichever pass
    # caught the noisy neighbor.
    timings: dict[str, float] = {}

    def timed_pass() -> None:
        for n in names:
            q0 = time.perf_counter()
            _force(fns[n](spark, sf_dir))
            dt = round(time.perf_counter() - q0, 3)
            if n not in timings or dt < timings[n]:
                timings[n] = dt
            if any(
                "streaming"
                in f.__module__.removeprefix("kafka_spark_streaming_spark")
                for f in (fns[n], QUERIES[n])
            ):
                # belt-and-braces for the quiesce decision (ADVICE
                # r14): the listener flag rides the async listener
                # bus, so in principle teardown can outrun the
                # onQueryStarted delivery of a just-run stream; every
                # stream-starting query lives in a streaming module
                # (operators.streaming_queries / streaming.*), and the
                # EXECUTED fn (an OVERRIDES entry may differ from the
                # registered one — code-review r15) is checked too, so
                # this synchronous mark closes the window.  The package
                # prefix is stripped first (ADVICE r15): the package
                # name itself contains 'streaming', so the raw
                # substring test was vacuously true for EVERY query and
                # silently defeated the batch-only quiesce skip.
                ran_streaming["flag"] = True

    prev_q, prev_d = _prev_bench()
    for _pass in range(3):
        timed_pass()
    # Dirty-window rule (VERDICT r21 #7): if the canary factor after
    # the standard 3 passes says the whole window was polluted
    # (co-tenant CPU steal), take up to 2 EXTRA passes rather than
    # publish near-blind numbers.  min-of-N is monotone — extra passes
    # can only move a number toward the machine's true capability,
    # never away from it — so round-over-round comparability is
    # preserved; a clean window still runs exactly the 3 passes every
    # prior round ran.  extra_passes in the doc records when it fired.
    extra_passes = 0
    while host_factor(timings, prev_q) > 2.0 and extra_passes < 2:
        extra_passes += 1
        print(
            f"[dirty-window] canary factor "
            f"{host_factor(timings, prev_q):.2f} > 2.0 — extra pass "
            f"{extra_passes}/2",
            file=sys.stderr,
        )
        timed_pass()
    total = round(sum(timings.values()), 3)

    # One-time derived-artifact build cost at the bench SF (ADVICE r4
    # #2): the session memo means the timed passes above only measure
    # the probe; this surfaces the build so it can't regress invisibly.
    # Keys are "artifact:<sf_dir>" — keep the sf_dir ones, shorten to
    # the artifact name for round-over-round comparability.
    from kafka_spark_streaming_spark import tables as _tables

    # A one-shot build sample is pure noise-roulette on this host; give
    # every derived artifact a SECOND build (memo cleared) and let
    # session_checkpoint keep the min — the build-time analogue of the
    # per-query min-of-N above.
    _tables.reset_derived_cache()  # cache + sidecars together
    for n in (
        "d_minhash_lsh_pairs",
        "g_pagerank_trade",
        "p_decontaminate_ngram",
        # r12 HEADLINE artifacts: the IVF index (+ centroid sidecar)
        # and the simhash signature table
        "sim_ann_ivf",
        "d_simhash_pairs",
        # r14: the rep-collapsed containment candidate index (in
        # HEADLINE via d_containment_pairs) — without a second build
        # its derived_build_sec is a one-shot noise sample
        "d_containment_pairs",
    ):
        if n in fns:
            _force(fns[n](spark, sf_dir))

    derived = {
        k.split(":", 1)[0]: v
        for k, v in _tables.DERIVED_BUILD_SEC.items()
        if sf_dir in k
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # Gate on canary-normalized seconds (VERDICT r18 #4): the host
    # factor is measured from the same run's pure-JVM canaries, so a
    # loaded window on unchanged code prints regressions: [] while a
    # real single-query regression still flags (ratios normalize by
    # the SAME factor, so anything above gate x host stands out).
    # Raw seconds stay in `queries`/`derived_build_sec`, and the
    # unnormalized flags stay visible as raw_regressions.
    hf = host_factor(timings, prev_q)
    doc = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "derived_build_sec": derived,
        "host_factor": round(hf, 3),
        "regressions": regressions(timings, prev_q, host=hf)
        + regressions(derived, prev_d, host=hf),
        "raw_regressions": regressions(timings, prev_q)
        + regressions(derived, prev_d),
    }
    if extra_passes:
        doc["extra_passes"] = extra_passes
    # The driver keeps only the LAST 2000 bytes of stdout and parses the
    # JSON line out of that tail — r9/r10 both shipped `parsed: null`
    # because the inline NOTES prose pushed the line past the window and
    # clipped its FRONT (VERDICT r10 #2). The printed line is now the
    # compact machine-readable doc (measured ~1.3 KB with 28 queries);
    # the full doc including NOTES goes to its own file, which the
    # round commits alongside BENCH_r{N}.json.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL_LAST.json"), "w") as f:
        json.dump({**doc, "notes": NOTES}, f, indent=1)
    line = compact_line(doc)
    # BENCH_r12 was `parsed: null` because a post-stop StateStore
    # maintenance WARN printed AFTER the JSON line, pushing it out of
    # the driver's 2000-byte tail window. Quiesce the engine BEFORE
    # printing: stop any streaming queries still holding state stores,
    # stop the session (joins the maintenance pool), then give lagging
    # daemon threads a beat to flush — the JSON line is the process'
    # final stdout bytes. The print lives in `finally` so a teardown
    # exception (wedged stream, dropped py4j connection) degrades to a
    # possibly-noisy tail rather than losing the line entirely — the
    # teardown exists to protect the line, so it must never eat it.
    try:
        # the listener flag (set at any onQueryStarted) is the ground
        # truth; streams.active at teardown misses queries that
        # already stopped themselves but whose maintenance threads
        # still lag.  Batch-only runs skip the whole quiesce.
        quiesce = ran_streaming["flag"] or bool(spark.streams.active)
        for q in spark.streams.active:
            try:
                q.stop()
            except Exception:
                pass
        spark.stop()
        if quiesce:
            time.sleep(2)
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        print(line, flush=True)


if __name__ == "__main__":
    main()
