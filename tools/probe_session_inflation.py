#!/usr/bin/env python
"""Probe the late-session inflation of Python-heavy ops (r14 follow-up).

Fresh session: time mm_audio_pipeline (Python/Arrow-heavy) and tpch_q6
(pure JVM) warm; then run ~N assorted SQL-suite queries once each (the
session-state load); then re-time both probes.  Samples JVM heap, GC time
and Python-worker RSS at each checkpoint so the inflation (if it
reproduces) can be attributed.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommend_spark.queries import ORACLES, QUERIES  # noqa: E402
from recommend_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_LOAD = int(os.environ.get("PROBE_N", "120"))


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    used_mb = (rt.totalMemory() - rt.freeMemory()) / 1e6
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    gc_ms = 0
    gc_count = 0
    for i in range(beans.size()):
        b = beans.get(i)
        gc_ms += b.getCollectionTime()
        gc_count += b.getCollectionCount()
    return {"heap_used_mb": round(used_mb), "gc_ms": gc_ms, "gc_count": gc_count}


def pyworker_rss_mb():
    out = subprocess.run(
        ["ps", "-eo", "rss,cmd"], capture_output=True, text=True
    ).stdout
    tot = 0
    n = 0
    for line in out.splitlines():
        if "pyspark.daemon" in line or "pyspark.worker" in line:
            try:
                tot += int(line.split()[0])
                n += 1
            except ValueError:
                pass
    return {"n_workers": n, "worker_rss_mb": round(tot / 1024)}


def run_one(spark, qid):
    t0 = time.perf_counter()
    QUERIES[qid](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe(spark, tag, res):
    snap = {**jvm_stats(spark), **pyworker_rss_mb()}
    for qid in ("tpch_q6", "mm_audio_pipeline"):
        snap[qid] = round(min(run_one(spark, qid) for _ in range(2)), 3)
    res[tag] = snap
    print(tag, json.dumps(snap), flush=True)


def main():
    spark = get_spark("probe_inflation")
    res = {}
    # warm-up exactly like bench.py
    run_one(spark, "scan_parquet")
    run_one(spark, "udf_scalar_pandas")
    probe(spark, "fresh", res)

    heavy = {
        "als_train", "als_predict_pairs", "als_recommend_topk",
        "dedup_near_minhash", "sim_ann_lsh", "sim_ivf_topk", "text_tfidf_ml",
        "mm_image_pipeline", "agg_approx_distinct", "stream_watermark_late",
        "sim_ivf_pq", "graph_pagerank", "mm_embed_pq", "agg_hll_sketch",
    }
    sql_set = [q for q in sorted(ORACLES) if q not in heavy][:N_LOAD]
    t0 = time.perf_counter()
    for i, qid in enumerate(sql_set):
        try:
            run_one(spark, qid)
        except Exception as e:  # keep loading even if one op trips
            print("LOAD-ERR", qid, repr(e)[:200], flush=True)
        if i % 20 == 19:
            spark.sparkContext._jvm.System.gc()
        if i % 60 == 59:
            probe(spark, f"after_{i + 1}", res)
    res["load_wall_s"] = round(time.perf_counter() - t0, 1)
    probe(spark, "after_sql", res)
    # heavy suite in bench order up to (not including) mm_audio_pipeline
    heavy_set = sorted(set(QUERIES) - set(ORACLES) | heavy)
    heavy_set = heavy_set[: heavy_set.index("mm_audio_pipeline")]
    for i, qid in enumerate(heavy_set):
        try:
            run_one(spark, qid)
        except Exception as e:
            print("LOAD-ERR", qid, repr(e)[:200], flush=True)
        if i % 4 == 3:
            spark.sparkContext._jvm.System.gc()
    res["heavy_wall_s"] = round(time.perf_counter() - t0, 1)
    probe(spark, "after_heavy_prefix", res)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe_inflation.json")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
