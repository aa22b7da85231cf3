"""Every registered query with an oracle must hash-match DuckDB.

This mirrors the driver's t2 gate at sf0.01 (TESTDATA.md). New queries
are picked up automatically via the registry.
"""

from __future__ import annotations

import pytest

from kafka_spark_streaming_spark.operators import ORACLES, QUERIES

from .oracle_check import assert_matches_oracle


def _names() -> list[str]:
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_correct, name):
    assert_matches_oracle(spark, name, sf_correct)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_smoke(spark, sf_smoke, name):
    df = QUERIES[name](spark, sf_smoke)
    assert df.count() >= 0
    assert len(df.columns) > 0
