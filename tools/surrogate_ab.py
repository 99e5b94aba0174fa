#!/usr/bin/env python
"""A/B the hash-surrogate shuffle keys: wall + shuffle bytes, flag off/on.

Usage: python tools/surrogate_ab.py OUT.json [SF_DIR]

For each op that honors ``spark.graft.surrogateShuffleKeys`` the tool runs
the query to completion twice per variant (min wall) and snapshots the
session-cumulative shuffle read/write byte counters from the Spark UI REST
API around each run, so the record shows exactly how many bytes the
surrogate keys take out of the exchanges at the given scale.  One
SparkSession for all runs (counter deltas are per-run), flag restored
afterwards.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FLAG = "spark.graft.surrogateShuffleKeys"
OPS = ["dedup_span_fraction", "pipeline_bpe_pairs", "text_bigram_surprisal"]


def shuffle_totals(spark, ui: str) -> tuple[int, int]:
    # the AppStatusStore is fed by the ASYNC listener bus: snapshotting
    # right after an action can miss the final stages' bytes (and leak
    # them into the NEXT measurement's baseline), so drain the bus first
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:
        time.sleep(1.0)  # best-effort fallback on API drift
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    from recommend_spark.queries import QUERIES
    from recommend_spark.session import ensure_runtime_confs

    # get_spark() keeps the UI off for sweep throughput; this tool needs
    # the REST metrics endpoint, so it builds its own session with UI on.
    spark = ensure_runtime_confs(
        SparkSession.builder.master("local[32]")
        .appName("surrogate-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    record: dict = {"sf_dir": sf_dir, "flag": FLAG, "ops": {}}

    for qid in OPS:
        row: dict = {}
        for variant in ("off", "on"):
            spark.conf.set(FLAG, "true" if variant == "on" else "false")
            walls, sw, sr = [], 0, 0
            for rep in range(2):
                w0, r0 = shuffle_totals(spark, ui)
                t0 = time.monotonic()
                n = QUERIES[qid](spark, sf_dir).count()
                walls.append(round(time.monotonic() - t0, 3))
                w1, r1 = shuffle_totals(spark, ui)
                if rep == 0:  # bytes are deterministic; record rep 0
                    sw, sr = w1 - w0, r1 - r0
            row[variant] = {
                "wall_s": min(walls),
                "rows": n,
                "shuffle_write_bytes": sw,
                "shuffle_read_bytes": sr,
            }
        row["write_bytes_ratio"] = round(
            row["on"]["shuffle_write_bytes"]
            / max(row["off"]["shuffle_write_bytes"], 1),
            3,
        )
        row["wall_ratio"] = round(
            row["on"]["wall_s"] / max(row["off"]["wall_s"], 1e-9), 3
        )
        record["ops"][qid] = row
        print(qid, json.dumps(row), flush=True)

    spark.conf.unset(FLAG)
    spark.stop()
    Path(out_path).write_text(json.dumps(record, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
