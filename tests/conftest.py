"""Shared fixtures: one SparkSession + one DuckDB connection per test run.

The oracle-parity tests mirror the driver's comparison (row-count + schema
+ order-insensitive value-hash) but run at sf0.001 for speed, with strict
exact equality after canonicalization — if these pass, any reasonable
driver hash passes.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from recommend_spark.io import TABLES
from recommend_spark.session import get_spark

SF_DIR = os.environ.get("RS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("recommend_spark_tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # EXACT: bit-identical doubles are the parity bar
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def canon_rows(cols, rows):
    """Sort columns by name (driver behavior), canonicalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def assert_parity(spark_df, ddb_con, sql, qid=""):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = ddb_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{qid}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{qid}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, cs = canon_rows(s_cols, s_rows)
    _, cd = canon_rows(d_cols, d_rows)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(f"{qid}: value mismatch, first diffs: {diff}")
