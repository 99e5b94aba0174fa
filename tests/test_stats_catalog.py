"""The ANALYZE-style stats catalog (io.stats_memo / io.table_fingerprint).

The cost-based route gates (er_name_match candidate counts, the
containment / set-similarity vocabulary + probe footprint, the banded
rescore's corpus footprint) memoize their plan scalars keyed by the input
file's content fingerprint, so only the FIRST build over a given corpus
runs the gate jobs (r12 verdict item 5).  These tests pin:

- memo mechanics: compute-once, warm reads, atomic persistence,
  corrupt-entry self-heal;
- fingerprint invalidation on content change;
- ROUTE PARITY: a warm-catalog build produces the same physical route
  (and the same rows) as an eager keyless build;
- job-freeness: a warm-catalog er_name_match build fires no more Spark
  jobs than a plain single-table scan query (the parquet reader's own
  schema job is the floor).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from recommend_spark.io import ART_ROOT, stats_memo, table_fingerprint

SF_DIR = os.environ.get("RS_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_stats_memo_computes_once():
    calls = []

    def compute():
        calls.append(1)
        return {"n": 7, "xs": [1, 2, 3]}

    key = f"testmemo_{os.getpid()}_once"
    try:
        a = stats_memo(key, compute)
        b = stats_memo(key, compute)
        assert a == b == {"n": 7, "xs": [1, 2, 3]}
        assert len(calls) == 1
    finally:
        (Path(ART_ROOT) / "stats" / f"{key}.json").unlink(missing_ok=True)


def test_stats_memo_heals_corrupt_entry():
    key = f"testmemo_{os.getpid()}_corrupt"
    path = Path(ART_ROOT) / "stats" / f"{key}.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("{not json")
    try:
        assert stats_memo(key, lambda: {"ok": 1}) == {"ok": 1}
        # and the healed entry is now served warm
        assert json.loads(path.read_text()) == {"ok": 1}
    finally:
        path.unlink(missing_ok=True)


def test_table_fingerprint_tracks_content(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = tmp_path / "customer.parquet"
    pq.write_table(pa.table({"a": [1, 2]}), f)
    fp1 = table_fingerprint(str(tmp_path), "customer")
    pq.write_table(pa.table({"a": [1, 2, 3]}), f)
    fp2 = table_fingerprint(str(tmp_path), "customer")
    assert fp1 != fp2
    # stable when nothing changed
    assert fp2 == table_fingerprint(str(tmp_path), "customer")


def _clear_stats_entries(prefix: str) -> None:
    root = Path(ART_ROOT) / "stats"
    if root.exists():
        for p in root.glob(f"{prefix}*.json"):
            p.unlink()


def test_er_gate_warm_route_matches_eager(spark):
    """The memoized gate picks the same route (same physical plan) and
    the same rows as the eager keyless gate over the same input."""
    from recommend_spark.queries.text import _er_name_pairs

    c = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select(
            F.col("c_custkey").alias("cust"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").alias("nk"),
            F.length("c_name").alias("ln"),
        )
    )
    key = f"er_gate_v1_{table_fingerprint(SF_DIR, 'customer')}"
    _clear_stats_entries(key)
    eager = _er_name_pairs(c)  # keyless: gate aggregates run
    cold = _er_name_pairs(c, stats_key=key)  # populates the catalog
    assert (Path(ART_ROOT) / "stats" / f"{key}.json").exists()
    warm = _er_name_pairs(c, stats_key=key)  # reads the catalog
    import re

    plans = {
        re.sub(  # expression ids differ per build; the route must not
            r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString()
        )
        for df in (eager, cold, warm)
    }
    assert len(plans) == 1, "route diverged between eager/cold/warm gates"
    rows = sorted(tuple(r) for r in warm.collect())
    assert rows == sorted(tuple(r) for r in eager.collect())
    assert len(rows) > 0


def test_er_warm_build_is_job_free(spark):
    """On a warm catalog, building er_name_match fires no more jobs than
    building a trivial single-scan query (the reader's schema job)."""
    from recommend_spark.queries import QUERIES

    sc = spark.sparkContext

    def built_jobs(build):
        # job ids are globally sequential; max-id delta keeps counting
        # correctly even after the status tracker evicts old entries
        # (spark.ui.retainedJobs) in a long-lived test session
        before = max(sc.statusTracker().getJobIdsForGroup(), default=-1)
        build()
        after = max(sc.statusTracker().getJobIdsForGroup(), default=-1)
        return after - before

    # prime the catalog (cold build may run gate jobs)
    QUERIES["er_name_match"](spark, SF_DIR)
    floor = built_jobs(
        lambda: spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            "c_custkey"
        )
    )
    warm = built_jobs(lambda: QUERIES["er_name_match"](spark, SF_DIR))
    assert warm <= floor, (
        f"warm er_name_match build ran {warm} jobs vs scan floor {floor}"
    )


def test_ssj_kernel_vocab_memo_matches_eager(spark):
    """join_set_similarity's memoized kernel vocabulary produces the same
    pair set as the eager build (column order may differ; results can't)."""
    from recommend_spark.queries.joins import _set_similarity_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("toks"),
    )
    key = f"ssj_v1_{table_fingerprint(SF_DIR, 'documents')}"
    _clear_stats_entries(key)
    eager = sorted(
        (r["probe_id"], r["match_id"], r["n_common"], round(r["jaccard"], 9))
        for r in _set_similarity_pairs(docs).collect()
    )
    _set_similarity_pairs(docs, stats_key=key)  # cold: populate
    warm = sorted(
        (r["probe_id"], r["match_id"], r["n_common"], round(r["jaccard"], 9))
        for r in _set_similarity_pairs(docs, stats_key=key).collect()
    )
    assert warm == eager
    assert len(warm) > 0
