"""Cross-SF oracle probe: every registered query vs its DuckDB oracle
at fixtures BEYOND the driver's sf0.01 gate.

Why this exists: the correctness driver hash-gates at sf0.01 only.
Divergences that are data-dependent — NULL-semantics mismatches,
quantization-boundary rounding, candidate-generation recall — can hide
at one SF and surface at another (the r9 probe caught the
d_semantic_only_pairs_lsh (529, 1234) 1-ulp rounding residual at sf0.1
that sf0.01 never shows). Run this after any semantics-touching change;
r9 and r12 both ran it ad-hoc, so it is now a committed tool.

Usage:
    python tools/cross_sf_probe.py [sf_dir ...]
        default: /root/testdata/sf0.001 /root/testdata/sf0.1
Exit code: 1 if any (query, sf) failure is NOT in KNOWN_RESIDUALS,
else 0 (boolean — a raw count would wrap mod 256 at the POSIX exit-
status boundary; the per-failure detail is on stdout).

KNOWN_RESIDUALS pins the documented, analyzed divergences (PERF_NOTES)
so the probe stays a zero-is-green signal without re-litigating them.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (query, sf_dir basename) -> short pointer to the analysis.
# EMPTY since r13: the last residual — d_semantic_only_pairs_lsh pair
# (529, 1234), a 1-ulp float-sum divergence at the 6-decimal rounding
# boundary, sf0.1 only — was eliminated by the integer micro-unit
# cosine (dedup._EMB_Q): both engines now compute bit-identical
# doubles by construction, so the probe is unconditionally
# zero-is-green (VERDICT r12 #1).
KNOWN_RESIDUALS: dict[tuple[str, str], str] = {}


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.1",
    ]

    from kafka_spark_streaming_spark.operators import ORACLES
    from kafka_spark_streaming_spark.session import get_spark
    from tests.oracle_check import assert_matches_oracle

    spark = get_spark(app_name="kss-cross-sf-probe")
    unexpected = 0
    for sf in sf_dirs:
        base = os.path.basename(os.path.normpath(sf))
        ok, known, bad = 0, [], []
        for i, name in enumerate(ORACLES, 1):
            try:
                assert_matches_oracle(spark, name, sf)
                ok += 1
            except Exception as exc:  # noqa: BLE001 — probe must finish
                if (name, base) in KNOWN_RESIDUALS:
                    known.append(name)
                else:
                    bad.append((name, f"{type(exc).__name__}: {exc}"[:300]))
            print(f"\r[{base}] {i}/{len(ORACLES)}", end="", file=sys.stderr)
        print(file=sys.stderr)
        print(
            f"{base}: {ok} exact, {len(known)} known residual, "
            f"{len(bad)} UNEXPECTED"
        )
        for name in known:
            print(f"  known   {name}: {KNOWN_RESIDUALS[(name, base)]}")
        for name, err in bad:
            print(f"  FAILED  {name}: {err}")
        unexpected += len(bad)
    # boolean status, not the raw count: POSIX truncates exit codes to
    # 8 bits, so 256 failures would wrap to 0 and read green (ADVICE
    # r12). Per-failure detail stays on stdout above.
    return 1 if unexpected else 0


if __name__ == "__main__":
    raise SystemExit(main())
