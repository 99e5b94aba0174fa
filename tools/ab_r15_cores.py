#!/usr/bin/env python
"""r15 VERDICT item 3: diagnose the 32-core inversions the r14 driver
window showed (text_tfidf_sql ratio 0.37, join_inner 0.62, win_running_sum
and friends < 0.8): real 32-core contention or window noise?

Runs the suspect ids isolated (noop sink, min-of-3 per session) in
ALTERNATING 32-core / 8-core sessions, two of each, quiet-window checked.
A real contention reproduces 32 >> 8 across both session pairs; noise does
not.  Usage: python tools/ab_r15_cores.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

IDS = [
    "text_tfidf_sql",
    "join_inner",
    "win_running_sum",
    "win_moving_avg",
    "tpch_q1",
    "sim_knn_join",
    "sim_cosine_topk",
    "text_langid",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from recommend_spark.queries import QUERIES
from recommend_spark.session import get_spark
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ids = json.loads(sys.argv[1])
spark = get_spark("ab_r15_cores")
def run(qid):
    t0 = time.perf_counter()
    QUERIES[qid](spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
run("scan_parquet"); run("udf_scalar_pandas"); run("tpch_q6")
out = {q: [round(run(q), 3) for _ in range(3)] for q in ids}
out["control_tpch_q6"] = [round(run("tpch_q6"), 3) for _ in range(2)]
print("RESULT " + json.dumps(out))
spark.stop()
"""


def steal_pct(seconds=2.0):
    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))

    a = snap()
    time.sleep(seconds)
    b = snap()
    tot = sum(b) - sum(a)
    return 100.0 * (b[7] - a[7]) / tot if tot else 0.0


def leg(cpus: str):
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    p = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, json.dumps(IDS)],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])


def main():
    out = {"steal_pct_start": round(steal_pct(), 2), "legs": []}
    for cpus in ("32", "8", "32", "8"):
        r = leg(cpus)
        out["legs"].append({"cpus": cpus, "times": r})
        print(json.dumps(out["legs"][-1]), flush=True)
    out["steal_pct_end"] = round(steal_pct(), 2)
    summary = {}
    for q in IDS:
        m32 = min(min(leg_["times"][q]) for leg_ in out["legs"] if leg_["cpus"] == "32")
        m8 = min(min(leg_["times"][q]) for leg_ in out["legs"] if leg_["cpus"] == "8")
        summary[q] = {"min32": m32, "min8": m8, "ratio_8_over_32": round(m8 / m32, 3)}
    out["summary"] = summary
    print(json.dumps(out))
    with open(os.path.join(HERE, "ab_r15_cores.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
