#!/usr/bin/env python
"""Interleaved A/B for rec_eval_recall: MLlib recommendForUserSubset
(forced via FACTOR_TOPK_BUDGET_BYTES=0) vs the r14 pure-JVM broadcast
factor top-k.  Also asserts the output row is identical between the two
variants at the benched SF.  Usage: python tools/ab_recall_jvm_topk.py [legs]"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommend_spark.queries import QUERIES  # noqa: E402
from recommend_spark.queries import recommender as R  # noqa: E402
from recommend_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_one(spark):
    t0 = time.perf_counter()
    QUERIES["rec_eval_recall"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main():
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_recall_jvm_topk")
    run_one(spark)  # warm (JVM path)
    budget = R.FACTOR_TOPK_BUDGET_BYTES

    # output identity first
    rows_jvm = QUERIES["rec_eval_recall"](spark, SF_DIR).collect()
    R.FACTOR_TOPK_BUDGET_BYTES = 0
    rows_mllib = QUERIES["rec_eval_recall"](spark, SF_DIR).collect()
    R.FACTOR_TOPK_BUDGET_BYTES = budget
    ident = [r.asDict() for r in rows_jvm] == [r.asDict() for r in rows_mllib]
    print("identical:", ident, rows_jvm, flush=True)

    out = {"identical": ident, "mllib": [], "jvm": []}
    for _ in range(legs):
        R.FACTOR_TOPK_BUDGET_BYTES = 0
        out["mllib"].append(run_one(spark))
        R.FACTOR_TOPK_BUDGET_BYTES = budget
        out["jvm"].append(run_one(spark))
        print("mllib", out["mllib"], "jvm", out["jvm"], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
