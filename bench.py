#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Runs the oracle-backed (SQL) query set at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], executing each query fully through the
noop sink (no driver collect overhead), and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {qid: sec, ...}, "sf": ..., ...}

Heavy rows-only operators (ALS, LSH, streaming replays) run by default and
are reported under "queries_heavy", separate from the SQL suite per
BASELINE.md §4 (so round-over-round regressions in the rows-only ops are
visible in BENCH_r{N}).  Disable with SPARK_GRAFT_BENCH_HEAVY=0.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from recommend_spark.queries import ORACLES, QUERIES  # noqa: E402
from recommend_spark.session import get_spark  # noqa: E402

HEAVY = {
    "als_train",
    "als_predict_pairs",
    "als_recommend_topk",
    "dedup_near_minhash",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "text_tfidf_ml",
    "mm_image_pipeline",
    "agg_approx_distinct",
    "stream_watermark_late",
}
# streaming SQL-oracle ops execute a real replay; they are part of the SQL
# suite (they carry oracles) but dominate wall-clock, so surface them in the
# breakdown like everything else.


def run_one(spark, qid, sf_dir):
    t0 = time.perf_counter()
    df = QUERIES[qid](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    heavy_on = os.environ.get("SPARK_GRAFT_BENCH_HEAVY", "1") == "1"
    spark = get_spark("recommend_spark_bench")

    sql_set = [q for q in sorted(ORACLES) if q not in HEAVY]
    heavy_set = [q for q in sorted(QUERIES) if q in HEAVY] if heavy_on else []

    # warm-up: JIT + filesystem cache on the biggest table
    run_one(spark, "scan_parquet", sf_dir)

    times: dict[str, float] = {}
    for qid in sql_set:
        times[qid] = round(run_one(spark, qid, sf_dir), 3)
    heavy_times: dict[str, float] = {}
    for qid in heavy_set:
        heavy_times[qid] = round(run_one(spark, qid, sf_dir), 3)

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    out = {
        "metric": "sql_suite_seconds",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    if heavy_times:
        out["queries_heavy"] = heavy_times
        out["heavy_seconds"] = round(sum(heavy_times.values()), 3)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
