#!/usr/bin/env python
"""r15 VERDICT item 2: large-star/small-star contraction scale surrogate.

The fixture's near-dup graph hits the local endgame after round 1, so the
deep-distributed path is proven here on planted deep chains with the
SPARK_GRAFT_CC_LOCAL_THRESHOLD override forcing every round distributed.

Legs (same session, interleaved — the "before" loop is exactly the new
loop with the star pair patched to identity, so no git stash needed):
  A  star-interleaved loop (r15 code) on a 300-node chain, threshold 0
  B  contraction-only loop (r14 behavior) on the same chain
  C  star-interleaved loop on a 100k-node chain, threshold 8192 (the
     r14 loop would need ~92k distributed rounds here — reported
     analytically: min-contraction removes exactly one node per round on
     a path, verified in the 300-node leg)
Bit-identity: labels from A and B diffed row-for-row.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import recommend_spark.queries.dedup as dd  # noqa: E402
from recommend_spark.session import get_spark  # noqa: E402


def chain_pairs(spark, n, stride=1):
    return spark.range(1, n).selectExpr("id AS doc_a", "id + 1 AS doc_b")


def run_leg(spark, n_nodes, star: bool, threshold: int):
    os.environ["SPARK_GRAFT_CC_LOCAL_THRESHOLD"] = str(threshold)
    real_round, real_pair = dd._cc_round, dd._cc_star_pair
    rounds = {"n": 0}

    def counting_round(*a, **k):
        rounds["n"] += 1
        return real_round(*a, **k)

    dd._cc_round = counting_round
    if not star:
        dd._cc_star_pair = lambda e, width: e
    try:
        pdf = chain_pairs(spark, n_nodes)
        t0 = time.perf_counter()
        rep, _ = dd._cc_components(pdf)
        labels = sorted(map(tuple, rep.collect()))
        wall = time.perf_counter() - t0
    finally:
        dd._cc_round, dd._cc_star_pair = real_round, real_pair
        os.environ.pop("SPARK_GRAFT_CC_LOCAL_THRESHOLD", None)
    ok = labels == [(v, 1) for v in range(1, n_nodes + 1)]
    return {"rounds": rounds["n"], "wall_s": round(wall, 2), "labels_ok": ok}, labels


def main():
    spark = get_spark("scaleup_r15_cc")
    out = {}
    # small chain: both legs measurable end-to-end
    n = 300
    a, lab_a = run_leg(spark, n, star=True, threshold=0)
    b, lab_b = run_leg(spark, n, star=False, threshold=0)
    a2, lab_a2 = run_leg(spark, n, star=True, threshold=0)  # order-alternated rerun
    out["chain_300_threshold_0"] = {
        "star": a,
        "star_rerun": a2,
        "contraction_only": b,
        "labels_bit_identical": lab_a == lab_b == lab_a2,
    }
    print(json.dumps(out["chain_300_threshold_0"]), flush=True)
    # deep chain at surrogate scale: star leg only (contraction-only would
    # need n - threshold ~ 92k distributed rounds; the 300-node leg
    # verifies the one-node-per-round law empirically: rounds == n-1)
    c, _ = run_leg(spark, 100_000, star=True, threshold=8192)
    out["chain_100k_threshold_8192"] = {
        "star": c,
        "contraction_only_rounds_analytic": 100_000 - 8192,
    }
    print(json.dumps(out))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "scaleup_r15_cc.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
