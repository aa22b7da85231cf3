"""Full-registry timing sweep with a min-of-history gate (VERDICT r9 #1,
r10 next-round #1).

Why this exists: HEADLINE + sf1_smoke cover ~30 queries; the other ~120
registered queries had NO timed gate, and d_simhash_pairs proved the
cost — it sat at 35-47 s warm at sf0.1 for two rounds before the r9
cold sweep noticed. This tool times EVERY registered query at the bench
SF and flags anything slower than GATE× its best-ever recorded time.

Gate design (VERDICT r10: "vs a min-of-history to absorb host drift"):
the baseline (SWEEP_BASELINE.json, committed) keeps the MINIMUM warm
seconds ever observed per query. A round-over-round gate at 1.5× proved
too weak on this shared-host VM — r10's uniform ~1.3× co-tenant drift
consumed most of the headroom — so the sweep compares against the best
the plan has ever run, with a 2× ratio AND an absolute slack so
sub-second queries can't flag on scheduler jitter. Baselines only move
DOWN (a faster pass tightens the gate); a slower pass never loosens it.

Timing protocol:
  * batch queries: min of 2 consecutive forced passes (pass 1 may pay
    derived-artifact build + codegen; pass 2 is warm — min reports the
    warm plan cost).
  * streaming queries (s_*): ONE pass. Their cost is the micro-batch
    drain floor (state-store commit + stop tax), not codegen — a second
    drain doubles sweep wall-time for no extra signal, and the floor is
    what the baseline should hold anyway.

Every query is forced end-to-end with a noop write (full plan executes,
nothing collected), same as bench.py.

Usage:
    python tools/sweep.py             # writes SWEEP_r{N}.json + updates
                                      # SWEEP_BASELINE.json; rc 1 if any
                                      # query breaches the gate
Env:
    SPARK_GRAFT_SF_DIR   fixture dir (default /root/testdata/sf0.1)
    KSS_SWEEP_GATE       ratio vs baseline min (default 2.0)
    KSS_SWEEP_SLACK      absolute slack seconds (default 0.75)
    KSS_SWEEP_OUT        explicit output path (default SWEEP_r{N}.json,
                         N = newest CORRECTNESS round + 1)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE = float(os.environ.get("KSS_SWEEP_GATE", "2.0"))
# Sub-second queries swing 2-3x on pure scheduler jitter; the absolute
# slack keeps the gate meaningful (a 0.2 s query at 0.5 s is noise; a
# 5 s query at 11 s is a regression).
SLACK = float(os.environ.get("KSS_SWEEP_SLACK", "0.75"))
BASELINE_PATH = os.path.join(REPO, "SWEEP_BASELINE.json")
# Dirty-window re-run rule (VERDICT r21 #7): the r21 seal published
# from a window whose pre-confirm canary factor hit the 3.0 clamp —
# the gates were near-blind exactly when scrutiny mattered.  If the
# pre-confirm canary factor exceeds this threshold, the whole timing
# loop re-runs (up to KSS_SWEEP_DIRTY_RETRIES extra attempts) and the
# aborted window is RECORDED in the artifact rather than gated on; a
# final window still dirty after retries publishes with
# window_dirty: true so a reader can never mistake it for a seal.
DIRTY_FACTOR = float(os.environ.get("KSS_SWEEP_DIRTY_FACTOR", "2.0"))
DIRTY_RETRIES = int(os.environ.get("KSS_SWEEP_DIRTY_RETRIES", "1"))

import bench  # noqa: E402  — repo root is on sys.path above; shares
# host_factor/CANARIES with the bench gate so the two policies can't drift


def _round_number() -> int:
    best = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def load_baseline() -> dict[str, dict]:
    try:
        with open(BASELINE_PATH) as f:
            doc = json.load(f)
        return doc.get("queries", {})
    except (OSError, ValueError):
        return {}


def sweep_host_factor(
    timings: dict[str, float], baseline: dict[str, dict]
) -> float:
    """Canary drift of THIS sweep window vs the min-of-history
    baseline — bench.host_factor's policy (median over the pure-JVM
    canaries q1/q6/q18, clamped to [1,3]) applied to the sweep's
    baseline shape.  VERDICT r18 #4 (re-proven by the spurious r19
    q11 flag at 2.03x on untouched code, cleared only by a manual
    isolation re-time): the sweep gate compares a loaded window
    against best-EVER seconds, so co-tenant CPU steal alone walks
    slow-window ratios toward the gate; dividing by the canary factor
    makes the gate measure the CODE."""
    return bench.host_factor(
        timings, {n: e.get("min_sec") for n, e in baseline.items()}
    )


def gate_flags(
    timings: dict[str, float],
    baseline: dict[str, dict],
    gate: float = GATE,
    slack: float = SLACK,
    errors: dict | set | tuple = (),
    host: float = 1.0,
) -> list[dict]:
    """Queries breaching gate×best-ever + absolute slack, after
    dividing this window's seconds by the canary ``host`` factor
    (1.0 = raw, the pre-r20 behavior; callers pass
    sweep_host_factor(...)).  Raw seconds are what the flag records —
    ``norm_sec``/``host`` make the normalization auditable.  Pure
    function so the policy is unit-testable without Spark.  A query
    that ERRORED this run is excluded: its recorded timing is a
    partial pass (pass 1 before pass 2 raised) and already fails the
    sweep via rc 1 — a duplicate flag on an untrustworthy number is
    noise (ADVICE r11)."""
    out = []
    for name, sec in timings.items():
        if name in errors:
            continue
        base = baseline.get(name, {}).get("min_sec")
        if base is None or base <= 0:
            continue
        norm = sec / host
        if norm > gate * base and norm > base + slack:
            out.append(
                {
                    "query": name,
                    "sec": sec,
                    "best_sec": base,
                    "ratio": round(sec / base, 2),
                    "norm_sec": round(norm, 3),
                    "norm_ratio": round(norm / base, 2),
                    "host": round(host, 3),
                }
            )
    return sorted(out, key=lambda r: -r["norm_ratio"])


def merged_baseline(
    baseline: dict[str, dict],
    timings: dict[str, float],
    round_tag: str,
    errors: dict | set | tuple = (),
) -> dict[str, dict]:
    """Min-only merge: entries tighten or stay; new queries auto-enroll.

    Queries that errored this run never touch the baseline (ADVICE
    r11): a pass-1 timing whose pass 2 raised — or a bogusly fast time
    from a degenerate plan that then failed — would otherwise lower
    the floor PERMANENTLY (baselines only move down) and make every
    subsequent healthy run flag."""
    out = dict(baseline)
    for name, sec in timings.items():
        if name in errors:
            continue
        prev = out.get(name)
        if prev is None:
            out[name] = {"min_sec": sec, "round": round_tag}
        elif sec < prev["min_sec"]:
            out[name] = {"min_sec": sec, "round": round_tag}
    return dict(sorted(out.items()))


def final_flags(
    timings: dict[str, float],
    baseline: dict[str, dict],
    errors: dict | set | tuple = (),
    gate: float = GATE,
    slack: float = SLACK,
) -> tuple[list[dict], float]:
    """Post-confirm gate: the host factor is re-derived from the SAME
    timings dict the flags judge (VERDICT r20 #2 — the r20 sweep
    divided post-confirm settled seconds by the PRE-confirm window's
    factor, so a regression that settled at 2.3x under a stale loaded
    factor of 2.5 cleared `flagged` while raw_flagged caught it).
    Callers must have settled the canaries alongside the suspects in
    the confirm pass, so the factor describes the window that produced
    the gated numbers.  Pure so the policy is unit-testable."""
    host = sweep_host_factor(timings, baseline)
    return (
        gate_flags(
            timings, baseline, gate=gate, slack=slack, errors=errors, host=host
        ),
        host,
    )


def should_rerun_window(
    host_window: float,
    attempt: int,
    retries: int = DIRTY_RETRIES,
    threshold: float = DIRTY_FACTOR,
) -> bool:
    """Pure dirty-window policy (VERDICT r21 #7): a pre-confirm canary
    factor above `threshold` means co-tenant load polluted the whole
    timing loop — re-run it (while attempts remain) instead of gating
    near-blind behind a clamped factor."""
    return host_window > threshold and attempt < retries


def confirm_pass(
    flags: list[dict],
    timings: dict[str, float],
    retime,
) -> dict[str, str]:
    """Re-time each would-be flag once via `retime(name) -> sec`; the
    min is kept so a one-sample spike clears while a genuine regression
    survives. Pure seam so the failure policy is unit-testable: a
    retime failure must NOT poison the query's valid main-loop timing
    (ADVICE r12 — writing it into the main errors dict dropped the
    min-of-2 from gate_flags AND the baseline merge, suppressing the
    very flag that triggered the confirm). Failures are returned in a
    separate dict and the pre-confirm timing stands."""
    confirm_errors: dict[str, str] = {}
    for f in flags:
        name = f["query"]
        try:
            dt = retime(name)
            timings[name] = min(timings[name], dt)
        except Exception as exc:  # noqa: BLE001 — confirm is best-effort
            confirm_errors[name] = f"{type(exc).__name__}: {exc}"[:300]
    return confirm_errors


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = _round_number()
    out_path = os.environ.get(
        "KSS_SWEEP_OUT", os.path.join(REPO, f"SWEEP_r{rnd:02d}.json")
    )

    from kafka_spark_streaming_spark import tables as _tables
    from kafka_spark_streaming_spark.operators import QUERIES
    from kafka_spark_streaming_spark.session import get_spark

    spark = get_spark(app_name="kss-sweep")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def settle_streams(timeout_s: float = 60.0) -> None:
        """Drain the previous streaming query's teardown BEFORE the
        next s_* timer starts (VERDICT r11 #3: registry-order timing
        charged the prior stream's stop tax to the next entry —
        s_stream_stream_join recorded 30.2 s vs 12.5-19.5 s isolated,
        so SWEEP_BASELINE held floor+tax, not the real drain floor).
        Stop any still-active query, then run a trivial job as a
        scheduler barrier so stop/cleanup threads finish off-clock."""
        deadline = time.perf_counter() + timeout_s
        while spark.streams.active and time.perf_counter() < deadline:
            for q in spark.streams.active:
                try:
                    q.stop()
                except Exception:  # noqa: BLE001 — settle must not fail the sweep
                    pass
            time.sleep(0.2)
        spark.range(1).count()

    baseline = load_baseline()

    def time_all() -> tuple[dict[str, float], dict[str, str]]:
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        for i, (name, fn) in enumerate(QUERIES.items(), 1):
            passes = 1 if name.startswith("s_") else 2
            try:
                for _ in range(passes):
                    if name.startswith("s_"):
                        settle_streams()
                    t0 = time.perf_counter()
                    force(fn(spark, sf_dir))
                    dt = round(time.perf_counter() - t0, 3)
                    if name not in timings or dt < timings[name]:
                        timings[name] = dt
            except Exception as exc:  # noqa: BLE001 — a sweep must finish
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            if name.startswith("s_"):
                # settle AFTER a streaming entry too (ADVICE r12): a
                # batch query that follows it in registry order must not
                # absorb this stream's stop/teardown tax on its pass-1
                # timing — same contamination class the pre-s_* barrier
                # fixed.
                settle_streams()
            done = timings.get(name, "ERR")
            print(f"[{i}/{len(QUERIES)}] {name}: {done}", file=sys.stderr)
        return timings, errors

    t_sweep = time.perf_counter()
    aborted_windows: list[dict] = []
    for attempt in range(DIRTY_RETRIES + 1):
        timings, errors = time_all()
        host_window = sweep_host_factor(timings, baseline)
        if not should_rerun_window(host_window, attempt):
            break
        # Dirty window (VERDICT r21 #7): record it, never gate on it.
        aborted_windows.append(
            {
                "host_factor_window": round(host_window, 3),
                "total_warm_sec": round(sum(timings.values()), 3),
                "n_timed": len(timings),
                "errors": errors,
                "queries": dict(
                    sorted(timings.items(), key=lambda kv: -kv[1])
                ),
            }
        )
        print(
            f"[dirty-window] pre-confirm canary factor {host_window:.2f}"
            f" > {DIRTY_FACTOR} — re-running the timing loop "
            f"(attempt {attempt + 2}/{DIRTY_RETRIES + 1})",
            file=sys.stderr,
        )
    # Confirm pass (r12): a flag from a single noisy sample is not a
    # regression. s_* entries get ONE timed pass by design, and even
    # batch min-of-2 can catch a co-tenant spike on this shared host —
    # the r12 sweep flagged s_incremental_daily_rollup at 4.65 s whose
    # settled isolated min-of-3 was 2.3 s (inside the gate). So every
    # would-be flag is re-timed once, settled, and the min kept; only a
    # breach that SURVIVES the confirm pass is reported. A genuine
    # regression (the 13x d_simhash_pairs class) survives trivially.

    def retime(name: str) -> float:
        settle_streams()
        t0 = time.perf_counter()
        force(QUERIES[name](spark, sf_dir))
        dt = round(time.perf_counter() - t0, 3)
        print(f"[confirm] {name}: {dt}", file=sys.stderr)
        return dt

    # canary-normalized gate (VERDICT r18 #4): suspects are gathered
    # with the PRE-confirm window's factor (that window produced the
    # suspect numbers).  The confirm pass re-times the UNION of
    # normalized and RAW flags (code-review r20): a raw breach the
    # normalization would clear still deserves its settled isolated
    # re-time — the min lands in the artifact and in raw_flagged, so
    # a real drain regression riding host drift cannot hide behind
    # the canary factor with only a one-sample number on record.
    # When anything needs confirming, the CANARIES are re-timed in the
    # same settled window (VERDICT r20 #2): the final flags divide
    # post-confirm seconds, so they must be normalized by a factor
    # from those same post-confirm timings — dividing settled seconds
    # by a stale loaded-window factor under-reported real regressions
    # that settle above the gate (they only surfaced in raw_flagged).
    host_window = sweep_host_factor(timings, baseline)
    suspects = {
        f["query"]: f
        for f in gate_flags(timings, baseline, errors=errors)
        + gate_flags(timings, baseline, errors=errors, host=host_window)
    }
    confirm_targets = list(suspects.values())
    if confirm_targets:
        confirm_targets += [
            {"query": c}
            for c in bench.CANARIES
            if c in timings and c not in suspects and c not in errors
        ]
    confirm_errors = confirm_pass(confirm_targets, timings, retime)
    wall = round(time.perf_counter() - t_sweep, 1)

    flagged, host = final_flags(timings, baseline, errors=errors)
    # exclude errored queries: merged_baseline refuses to enroll them,
    # so listing them here would claim an enrollment that never happened
    new_queries = sorted(set(timings) - set(baseline) - set(errors))
    round_tag = f"r{rnd:02d}"
    updated = merged_baseline(baseline, timings, round_tag, errors=errors)

    # Second build per derived artifact (r14, the bench/sf1 protocol):
    # during the main loop every artifact builds exactly once, inside
    # whichever query first touches it, so derived_build_sec was a
    # one-shot sample on a host whose throughput swings 1.5-4x —
    # SWEEP_r14's first run recorded pq_codebook at 4.03 s whose
    # settled min-of-2 is 1.4 s.  session_checkpoint keeps the min
    # across rebuilds, so one cleared-cache replay of the
    # artifact-bearing queries below makes their entries min-of-2;
    # any artifact built ONLY by a query outside this list keeps its
    # one-shot sample and is NAMED in derived_one_shot so the record
    # never silently claims a protocol it didn't run (code-review r14
    # second pass).
    before_keys = {
        k[1].split("@", 1)[0]
        for k in _tables._DERIVED_CACHE
        if sf_dir in k[1]
    }
    _tables.reset_derived_cache()
    resample_errors: list[dict] = []
    for name in (
        "d_minhash_lsh_pairs",
        "d_simhash_pairs",
        "d_embedding_near_dup_lsh",
        "d_semantic_only_pairs_lsh",
        "d_ngram_jaccard_pairs",
        "d_containment_pairs",
        "sim_ann_ivf",
        "sim_pq_adc_topk",
        "g_pagerank_trade",
        "p_decontaminate_ngram",
    ):
        try:
            force(QUERIES[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — sampling must not fail
            # the sweep, but a hard failure here means the query
            # regressed into breakage AFTER its timed pass — surface
            # it instead of letting it read as a benign protocol gap
            # (ADVICE r14).
            resample_errors.append({"query": name, "err": repr(exc)})
    resampled = {
        k[1].split("@", 1)[0]
        for k in _tables._DERIVED_CACHE
        if sf_dir in k[1]
    }
    one_shot = sorted(
        k.split(":", 1)[0] for k in (before_keys - resampled)
    )
    derived = {
        k.split(":", 1)[0]: v
        for k, v in _tables.DERIVED_BUILD_SEC.items()
        if sf_dir in k
    }
    doc = {
        "metric": "full_registry_sweep",
        "round": round_tag,
        "sf_dir": sf_dir,
        "gate_ratio": GATE,
        "abs_slack_sec": SLACK,
        "n_queries": len(QUERIES),
        "n_timed": len(timings),
        "wall_sec": wall,
        "total_warm_sec": round(sum(timings.values()), 3),
        "host_factor": round(host, 3),
        "host_factor_window": round(host_window, 3),
        # VERDICT r21 #7: a published artifact self-describes whether
        # its pre-confirm window exceeded the dirty threshold even
        # after the re-run budget (never silently seal from a clamped
        # window), and keeps every aborted window's raw numbers.
        "window_dirty": host_window > DIRTY_FACTOR,
        "dirty_factor": DIRTY_FACTOR,
        "aborted_windows": aborted_windows,
        "flagged": flagged,
        "raw_flagged": gate_flags(timings, baseline, errors=errors),
        "errors": errors,
        "confirm_errors": confirm_errors,
        "new_in_baseline": new_queries,
        "derived_build_sec": derived,
        "resample_errors": resample_errors,
        "derived_one_shot": one_shot,
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
        "notes": {
            "protocol": (
                "batch = min of 2 consecutive noop-forced passes (warm); "
                "s_* streaming = 1 pass (micro-batch drain floor) with a "
                "settle barrier so the prior stream's stop tax stays off "
                "the clock; any would-be flag gets ONE settled confirm "
                "pass (min kept) before it is reported; gate compares vs "
                "min-of-history in SWEEP_BASELINE.json — baselines only "
                "tighten, so shared-host drift (the r10 uniform 1.3x) "
                "cannot loosen the gate round over round; since r20 the "
                "window's seconds are divided by the pure-JVM canary "
                "host_factor (bench.host_factor, clamp [1,3]) before the "
                "gate — raw seconds stay in `queries` and raw_flagged "
                "keeps the unnormalized view (VERDICT r18 #4; the "
                "baseline merge stays RAW so a loaded window's "
                "normalized seconds can never synthetically tighten the "
                "floor); since r21 the confirm pass also settles the "
                "canaries whenever it runs, and the final flags use a "
                "factor re-derived from the post-confirm timings they "
                "gate (host_factor; host_factor_window keeps the "
                "pre-confirm suspect-gathering factor) — VERDICT r20 #2; "
                "since r22 a pre-confirm canary factor above "
                "dirty_factor re-runs the whole timing loop (aborted "
                "windows recorded in aborted_windows) and a still-dirty "
                "final window publishes window_dirty: true rather than "
                "passing as a seal — VERDICT r21 #7"
            ),
        },
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    with open(BASELINE_PATH, "w") as f:
        json.dump(
            {
                "comment": (
                    "min warm seconds ever observed per registered query "
                    "at sf0.1 (tools/sweep.py); entries only move down"
                ),
                "queries": updated,
            },
            f,
            indent=1,
        )
    spark.stop()

    print(
        json.dumps(
            {
                "sweep": out_path,
                "n_timed": len(timings),
                "errors": len(errors),
                "flagged": flagged,
                "slowest": dict(
                    sorted(timings.items(), key=lambda kv: -kv[1])[:10]
                ),
                "wall_sec": wall,
            }
        )
    )
    return 1 if (flagged or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
