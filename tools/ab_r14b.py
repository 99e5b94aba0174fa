#!/usr/bin/env python
"""Isolated min-of-3 timing for a list of query ids (noop sink), one JSON
line out.  Usage: python tools/ab_r14b.py qid [qid ...]"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommend_spark.queries import QUERIES  # noqa: E402
from recommend_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_one(spark, qid):
    t0 = time.perf_counter()
    QUERIES[qid](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    ids = sys.argv[1:]
    spark = get_spark("ab_r14b")
    run_one(spark, "scan_parquet")
    run_one(spark, "udf_scalar_pandas")
    out = {}
    for qid in ids:
        legs = [round(run_one(spark, qid), 3) for _ in range(3)]
        out[qid] = {"legs": legs, "min": min(legs)}
        print(qid, legs, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
