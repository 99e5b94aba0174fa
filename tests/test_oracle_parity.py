"""Mirror of the driver's t2 gate: every oracle-declared query must match
DuckDB exactly at sf0.001 (fast); run with RS_TEST_SF_DIR=/root/testdata/sf0.01
for the full-scale check."""

from __future__ import annotations

import pytest

from recommend_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_parity


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_parity(spark, ddb, qid):
    df = QUERIES[qid](spark, SF_DIR)
    assert_parity(df, ddb, ORACLES[qid], qid)


@pytest.mark.parametrize("qid", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, qid):
    """Rows-only ops must at least execute and return a stable schema."""
    df = QUERIES[qid](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
