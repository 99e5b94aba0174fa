#!/usr/bin/env python
"""r15 VERDICT item 1: settle the JVM-state replay state-store width (2 vs 8).

Interleaved same-session A/B: SPARK_GRAFT_STREAM_STATE_WIDTH is read by
run_stream per replay, so widths alternate run-by-run inside ONE session —
stronger than the r14 git-stash protocol (no session-order confound).
Protocol per host-noise rules: both orders, min-of-3 per (id, width),
tpch_q6 control interleaved, /proc/stat steal sampled before and after.

Usage: python tools/ab_r15_width.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommend_spark.queries import QUERIES  # noqa: E402
from recommend_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the five JVM-state replays r14 changed to width 2 (pandas ops excluded:
# they pass state_width=8 explicitly and were not part of the dispute)
IDS = [
    "stream_tumbling",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_join",
    "stream_stream_join_outer",
]


def steal_pct(seconds: float = 2.0) -> float:
    def snap():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return v

    a = snap()
    time.sleep(seconds)
    b = snap()
    tot = sum(b) - sum(a)
    return 100.0 * (b[7] - a[7]) / tot if tot else 0.0


def run_one(spark, qid):
    t0 = time.perf_counter()
    QUERIES[qid](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_r15_width")
    s0 = steal_pct()
    # warm: one throwaway replay at each width so neither leg pays JVM/first-
    # checkpoint warmup, plus the standard control warm
    for w in ("2", "8"):
        os.environ["SPARK_GRAFT_STREAM_STATE_WIDTH"] = w
        run_one(spark, "stream_sliding")
    run_one(spark, "tpch_q6")

    legs: dict[str, dict[str, list[float]]] = {q: {"2": [], "8": []} for q in IDS}
    control: list[float] = []
    for rep in range(reps):
        # alternate which width goes first each rep (order-alternated)
        order = ("2", "8") if rep % 2 == 0 else ("8", "2")
        for w in order:
            os.environ["SPARK_GRAFT_STREAM_STATE_WIDTH"] = w
            for qid in IDS:
                t = run_one(spark, qid)
                legs[qid][w].append(round(t, 3))
                print(f"rep{rep} w{w} {qid} {t:.3f}", flush=True)
            control.append(round(run_one(spark, "tpch_q6"), 3))
    os.environ.pop("SPARK_GRAFT_STREAM_STATE_WIDTH", None)
    s1 = steal_pct()

    out = {
        "steal_pct_before": round(s0, 2),
        "steal_pct_after": round(s1, 2),
        "control_tpch_q6": control,
        "per_id": {},
    }
    for qid in IDS:
        m2, m8 = min(legs[qid]["2"]), min(legs[qid]["8"])
        out["per_id"][qid] = {
            "w2_legs": legs[qid]["2"],
            "w8_legs": legs[qid]["8"],
            "w2_min": m2,
            "w8_min": m8,
            "w2_over_w8": round(m2 / m8, 3),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
