"""Planted-input pins for the events_concurrency sweep-line.

Oracle parity proves Spark == DuckDB, not that either is RIGHT — both
engines run the same +1/-1 construction, so a shared misconception
(carry-in off-by-one, closed-vs-half-open boundaries) would pass parity.
These tests plant event sets whose peak concurrency is hand-computable
and assert the VALUES, pinning three contracts:

* half-open intervals [ts, ts+30m): an interval ending exactly when
  another starts does NOT overlap it (ends sort before starts at the
  same instant);
* midnight carry: an interval opened in the last 30 minutes of day d
  raises day d+1's baseline (and is day d+1's peak when d+1 has only
  its end point);
* the day-start peak candidate: GREATEST(max_run, 0) + carry, so a day
  whose first in-day points are all ends still reports the carried
  concurrency, never carry + a negative prefix.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from recommend_spark.queries import QUERIES

# (event_id, ts, user_id, event_type, value, props)
ROWS = [
    # day 0 (2024-01-01): three overlapping at 10:00-10:10
    (1, datetime(2024, 1, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
    (2, datetime(2024, 1, 1, 10, 5, 0), 2, "view", 1.0, "{}"),
    (3, datetime(2024, 1, 1, 10, 10, 0), 3, "view", 1.0, "{}"),
    # half-open: starts exactly when event 3 ends (10:40) -> no overlap
    (4, datetime(2024, 1, 1, 10, 40, 0), 4, "view", 1.0, "{}"),
    # day 0 23:50 -> open at midnight, carries into day 1
    (5, datetime(2024, 1, 1, 23, 50, 0), 5, "view", 1.0, "{}"),
    # day 2 (2024-01-03): a lone event
    (6, datetime(2024, 1, 3, 9, 0, 0), 6, "view", 1.0, "{}"),
]


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sweep_events")
    df = spark.createDataFrame(
        ROWS,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(root / "events.parquet")
    )
    return str(root)


def test_peaks_and_carry(spark, planted_dir):
    rows = {
        r["day_idx"]: r
        for r in QUERIES["events_concurrency"](spark, planted_dir).collect()
    }
    d0 = 19723  # 2024-01-01 as days since epoch
    # day 0: events 1-3 overlap pairwise at 10:05-10:30 (1&2), 10:10-10:30
    # (2&3 and 1&3 until 1 ends 10:30): at 10:10, events 1,2,3 all open.
    assert rows[d0]["peak_concurrency"] == 3
    assert rows[d0]["carry_in"] == 0
    assert rows[d0]["n_starts"] == 5
    # day 1: only the end point of event 5 (00:20); carried baseline 1.
    assert rows[d0 + 1]["carry_in"] == 1
    assert rows[d0 + 1]["peak_concurrency"] == 1
    assert rows[d0 + 1]["n_starts"] == 0
    # day 2: lone event, no carry.
    assert rows[d0 + 2]["peak_concurrency"] == 1
    assert rows[d0 + 2]["carry_in"] == 0


def test_half_open_boundary(spark, tmp_path_factory):
    """B starts at the exact instant A ends: peak must stay 1."""
    root = tmp_path_factory.mktemp("sweep_halfopen")
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 8, 0, 0), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 8, 30, 0), 2, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(root / "events.parquet")
    )
    out = QUERIES["events_concurrency"](spark, str(root)).collect()
    assert len(out) == 1 and out[0]["peak_concurrency"] == 1
