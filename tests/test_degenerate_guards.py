"""Degenerate-fixture parity for the guarded closed-form statistics.

The round-8 advice found ts_linear_forecast would hash-diverge on a
single-day group (Spark 0-division -> NULL, DuckDB -> inf/NaN; DuckDB
sqrt(<0) errors outright).  Round 9 generalized the guard to the whole
closed-form family; THIS file proves the guards on fixtures built to
trip every one of them — single-row groups, constant-value groups,
all-zero-weight groups, a constant daily series.  Before the guards,
each assertion below either hash-diverged or errored in DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest

from recommend_spark.queries import ORACLES, QUERIES
from tests.conftest import assert_parity

_LINEITEM = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_returnflag string"
)
_ORDERS = (
    "o_orderkey long, o_custkey long, o_totalprice double,"
    " o_orderpriority string, o_orderdate timestamp"
)
_EVENTS = (
    "event_id long, user_id long, event_type string,"
    " value double, ts timestamp"
)


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """One fixture dir with a degenerate group planted in every table."""
    from datetime import datetime, timedelta

    d = tmp_path_factory.mktemp("degen") / "sfdegen"
    d.mkdir()
    li = [
        # group A: ONE row -> n-1 == 0 (Bessel), zero variance
        (1, 1, 1, 1, 5.0, 100.0, 0.0, "A"),
        # group B: constant quantity (x variance 0), varying price
        (2, 1, 1, 1, 7.0, 100.0, 0.0, "B"),
        (3, 1, 1, 2, 7.0, 200.0, 0.0, "B"),
        (4, 1, 1, 3, 7.0, 350.0, 0.0, "B"),
        # group C: healthy -- must SURVIVE the guards
        (5, 1, 1, 1, 1.0, 10.0, 0.0, "C"),
        (6, 1, 1, 2, 2.0, 25.0, 0.0, "C"),
        (7, 1, 1, 3, 3.0, 31.0, 0.0, "C"),
        # group Z: all-zero quantities -> SUM(w) == 0
        (8, 1, 1, 1, 0.0, 50.0, 0.0, "Z"),
        (9, 1, 1, 2, 0.0, 60.0, 0.0, "Z"),
    ]
    t0 = datetime(2020, 1, 1)
    orders = [
        # P0: every totalprice zero -> gini denominator n*sx == 0
        (1, 1, 0.0, "P0", t0),
        (2, 1, 0.0, "P0", t0 + timedelta(days=1)),
        # P1: healthy
        (3, 1, 10.0, "P1", t0),
        (4, 1, 30.0, "P1", t0 + timedelta(days=1)),
        (5, 1, 50.0, "P1", t0 + timedelta(days=2)),
    ]
    events = [
        # type 'one_day': a single distinct day -> OLS denominator zero
        (1, 1, "one_day", 1.0, t0),
        (2, 1, "one_day", 1.0, t0),
        # type 'trend': healthy 3-day series
        (3, 1, "trend", 1.0, t0),
        (4, 1, "trend", 1.0, t0 + timedelta(days=1)),
        (5, 1, "trend", 1.0, t0 + timedelta(days=1)),
        (6, 1, "trend", 1.0, t0 + timedelta(days=2)),
    ]
    spark.createDataFrame(li, _LINEITEM).coalesce(1).write.parquet(
        str(d / "lineitem.parquet")
    )
    spark.createDataFrame(orders, _ORDERS).coalesce(1).write.parquet(
        str(d / "orders.parquet")
    )
    spark.createDataFrame(events, _EVENTS).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def degen_ddb(degen_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "events"):
        # Spark writes <table>.parquet as a directory of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degen_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "qid,survivors",
    [
        ("agg_corr", {"C"}),            # A: n=1; B: const x; Z: const... both vars needed
        ("agg_stddev_exact", {"B", "C", "Z"}),  # only A (n=1) drops
        ("agg_skew_kurt_exact", {"B", "C", "Z"}),  # A: zero variance drops
        ("agg_regression", {"C"}),
        ("agg_weighted_avg", {"A", "B", "C"}),  # Z: zero weights drops
        ("agg_gini", {"P1"}),
        ("ts_linear_forecast", {"trend"}),
        ("ts_autocorr", None),  # row set checked by parity only
    ],
)
def test_guarded_op_parity_on_degenerate_fixture(
    spark, degen_dir, degen_ddb, qid, survivors
):
    df = QUERIES[qid](spark, degen_dir)
    assert_parity(df, degen_ddb, ORACLES[qid], qid=qid)
    if survivors is not None:
        group_col = df.columns[0]
        got = {r[group_col] for r in df.select(group_col).collect()}
        assert got == survivors, (qid, got)


def test_als_ratings_dense_codes_past_int32(spark, tmp_path):
    """MLlib ALS requires int32 ids; _ratings must survive key spaces
    past int32 (r12: the perturbed campaign's replica-shifted custkeys
    at 3e9+ threw CAST_OVERFLOW under ANSI).  With planted huge keys the
    footer gate must route to deterministic dense codes — valid int ids,
    bijective per key, strengths preserved — while the fixture path
    (keys under int32) keeps the direct cast."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from recommend_spark.queries.recommender import _als_key_max, _ratings

    base = 3_000_000_000
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([base + 7, base + 8, base + 7], pa.int64()),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_partkey": pa.array(
                [base + 100, base + 200, base + 100, base + 200], pa.int64()
            ),
            "l_quantity": pa.array([2.0, 3.0, 5.0, 7.0], pa.float64()),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))

    assert _als_key_max(str(tmp_path)) > (1 << 31) - 1

    r = _ratings(spark, str(tmp_path))
    assert dict(r.dtypes)["user_id"] == "int"
    assert dict(r.dtypes)["item_id"] == "int"
    rows = {(x["user_id"], x["item_id"]): x["strength"] for x in r.collect()}
    # cust base+7 (orders 1, 3): part100 qty 2, part200 qty 3+7;
    # cust base+8 (order 2): part100 qty 5.  Dense codes are sorted:
    # user base+7 -> 0, base+8 -> 1; items part100 -> 0, part200 -> 1
    assert rows == {(0, 0): 2.0, (0, 1): 3.0 + 7.0, (1, 0): 5.0}, rows

    # determinism: a rebuild yields identical codes
    rows2 = {
        (x["user_id"], x["item_id"]): x["strength"]
        for x in _ratings(spark, str(tmp_path)).collect()
    }
    assert rows2 == rows
