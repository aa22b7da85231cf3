"""Standalone-process test for the explain CLI.

ADVICE r10 (high): `SparkSession.getDefaultSession()` is Scala-only —
the Python attribute does not exist, so every standalone
`python -m kafka_spark_streaming_spark.explain <query>` invocation
crashed with AttributeError before creating a session. The in-process
tests never caught it because the pytest fixture makes
`getActiveSession()` non-None and the `or` short-circuits past the
broken call. This test runs the CLI in a FRESH python process (no
ambient session) so the standalone branch is actually exercised.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_explain_cli_standalone_process():
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "kafka_spark_streaming_spark.explain",
            "q6_forecast_revenue",
            "--mode",
            "simple",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # A physical plan was printed and the scan is the pruned parquet
    # read (the CLI's whole point is plan inspection).
    assert "Physical Plan" in proc.stdout
    assert "lineitem" in proc.stdout


def test_explain_cli_list_standalone_process():
    # --list must not need a SparkSession at all.
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "kafka_spark_streaming_spark.explain",
            "--list",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    names = proc.stdout.split()
    assert "q1_pricing_summary" in names
    assert len(names) >= 140
