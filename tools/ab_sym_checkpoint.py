#!/usr/bin/env python
"""Interleaved A/B for the CF pair ops' `_sym_pairs` localCheckpoint:
plain union (flag off) vs eager-checkpointed p (flag on), one session,
noop sink, plus a sorted-rows identity check per op.
Usage: python tools/ab_sym_checkpoint.py [legs]"""
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
OPS = ["rec_user_user", "rec_user_user_sampled", "rec_item_item_sampled"]


def run_one(spark, qid):
    t0 = time.perf_counter()
    QUERIES[qid](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main():
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab_sym_checkpoint")
    run_one(spark, "rec_user_user")  # warm

    out = {}
    for qid in OPS:
        R._SYM_CHECKPOINT = False
        a = sorted(map(str, QUERIES[qid](spark, SF_DIR).collect()))
        R._SYM_CHECKPOINT = True
        b = sorted(map(str, QUERIES[qid](spark, SF_DIR).collect()))
        out[qid] = {"identical": a == b, "plain": [], "ckpt": []}
        print(qid, "identical:", a == b, "rows:", len(a), flush=True)

    for _ in range(legs):
        for qid in OPS:
            R._SYM_CHECKPOINT = False
            out[qid]["plain"].append(run_one(spark, qid))
            R._SYM_CHECKPOINT = True
            out[qid]["ckpt"].append(run_one(spark, qid))
        print({q: (out[q]["plain"], out[q]["ckpt"]) for q in OPS}, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
