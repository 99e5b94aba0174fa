"""Time every registered query at a given SF dir (driver-correctness style).

Usage: python tools/profile_sweep.py [sf_dir] [out.json]

Mirrors the driver's t2 sweep: one bare local session, each query built and
fully collected.  Prints per-query seconds sorted desc, plus the total, so
the slow tail that eats the driver's time budget is visible.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "profile_sweep.json"

    from pyspark.sql import SparkSession

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = mod.queries()
    times: dict[str, float] = {}
    t_all = time.monotonic()
    for qid in sorted(qs):
        t0 = time.monotonic()
        try:
            df = qs[qid](spark, sf_dir)
            n = len(df.collect())
            err = None
        except Exception as e:  # noqa: BLE001
            n, err = -1, f"{type(e).__name__}: {e}"[:200]
        times[qid] = round(time.monotonic() - t0, 3)
        if err:
            print(f"ERR {qid}: {err}", flush=True)
    total = round(time.monotonic() - t_all, 1)

    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    for qid, s in ranked[:40]:
        print(f"{s:8.2f}s  {qid}")
    print(f"TOTAL {total}s over {len(times)} queries")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "total_s": total, "times": times}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
