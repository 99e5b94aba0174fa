"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``recommend_spark``; this module only adapts the
registry to the driver's API.
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from recommend_spark.queries import ORACLES, QUERIES  # noqa: E402

_HERE = Path(__file__).resolve().parent


def _registration_order() -> list[str]:
    """Order the registry so a prefix sample maximizes fresh coverage.

    The driver's correctness sweep checks a prefix of ``queries()`` in
    registration order (50 queries in r1/r2).  To make that sample count,
    sort so that (1) operators with no green driver CORRECTNESS row yet
    come FIRST, cheapest first (profiled sf0.01 wall-clock, so a fixed
    time budget covers the maximum number of never-checked operators);
    (2) verified operators whose source changed after their latest driver
    row come next (tools/stale_ids.json, regenerated per round by
    tools/staleness.py); (3) the rest rotate oldest-driver-round-first so
    long-unsampled rows get refreshed.  Reads only committed files, so
    the order self-rotates every round without further edits.
    """
    verified: set[str] = set()
    for rec in sorted(_HERE.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(rec.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            # oracle-backed ops are verified ONLY on a full value-hash match:
            # counting rows_match alone would demote a wrong-values operator
            # (hash_match=False, rows_match=True) to the back of the prefix
            # sample and the driver would never re-check it
            hash_ok = row.get("err") is None and bool(row.get("hash_match"))
            # rows-only ops (no oracle) that executed cleanly count too
            rows_ok = row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            if hash_ok or rows_ok:
                verified.add(qid)
    times: dict[str, float] = {}
    try:
        prof = json.loads((_HERE / "tools" / "profile_sf001.json").read_text())
        times = {k: float(v) for k, v in prof.get("times", {}).items()}
    except (OSError, ValueError):
        pass
    # Staleness (r6 verdict item 2): a verified id whose source was edited
    # AFTER its latest driver row (git-blame vs record commit time, computed
    # offline by tools/staleness.py into the committed stale_ids.json —
    # no git calls here) ranks right after the never-verified ids, so perf
    # rewrites get re-verified the same round.  The remaining verified ids
    # rotate oldest-driver-round-first, draining the r2-era backlog.
    stale: set[str] = set()
    latest_round: dict[str, int] = {}
    try:
        st = json.loads((_HERE / "tools" / "stale_ids.json").read_text())
        stale = set(st.get("stale", []))
        latest_round = {k: int(v) for k, v in st.get("latest_round", {}).items()}
    except (OSError, ValueError):
        pass

    def _key(q: str):
        if q not in verified:
            return (0, 0, times.get(q, 0.0), q)
        if q in stale:
            return (1, 0, times.get(q, 0.0), q)
        return (2, latest_round.get(q, 0), times.get(q, 0.0), q)

    return sorted(QUERIES, key=_key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Pricing summary + top-3-lines-per-order composed: scan → filter → agg →
    window → join — the whole vertical slice (SURVEY.md §7 M0).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from recommend_spark.canon import davg, dsum
    from recommend_spark.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    li = load_table(spark, sf_dir, "lineitem")
    summary = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base"),
            davg("l_quantity", "avg_qty"),
            F.count("*").alias("cnt"),
        )
    )
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    top3 = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("top3_lines"))
    )
    return summary.join(top3, ["l_returnflag", "l_linestatus"], "left")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered never-driver-checked-first (see ``_registration_order``) so the
    driver's prefix-sampled correctness sweep covers new ground each round.
    """
    return {qid: QUERIES[qid] for qid in _registration_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query in ``queries()``."""
    return dict(ORACLES)
