#!/usr/bin/env python
"""Pre-round driver-sweep pre-flight: replay the driver's EXACT shape.

The driver's correctness sweep runs the first N (~50) ids of
``__spark_entry__.queries()`` SEQUENTIALLY in ONE bare SparkSession it
builds itself (no repo configs).  Cross-query session-state pollution —
cached tables, catalog/temp-view collisions, leaked confs, reused
streaming checkpoints — only shows up in that exact shape, which neither
pytest (fresh fixtures) nor t2_mirror.py (our own tuned session, sorted
order) reproduces:

* the BARE session exercises the runtime-conf self-heal in
  recommend_spark/io.py (nanosAsLong for ``events``, ANSI, etc.);
* the ROTATION ORDER runs whatever ids the staleness sort fronted this
  round, back to back, exactly like the sweep will;
* hash-checking through ``toPandas()`` reproduces the driver's fetch +
  canon path (t2_mirror.driver_canon, bug-for-bug).

Usage: python tools/preflight_sweep.py [--n 50] [--sf-dir .../sf0.01]
Exit code = number of FAIL/ERR ids.  Run this after the round's last
source change, before the driver's end-of-round sweep.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from tools.t2_mirror import driver_canon  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--report", default=str(REPO / "tools" / "preflight_report.json")
    )
    args = ap.parse_args()

    # the driver's import path: the entry module, not the package registry
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # a BARE session, like the driver's — no recommend_spark.session configs
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("preflight-sweep")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = mod.queries(), mod.oracle_sql()
    prefix = list(qs)[: args.n]

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    # smoke first, like the driver
    out: dict[str, dict] = {}
    t_all = time.monotonic()
    n_entry = len(mod.entry(spark).collect())
    print(f"entry rows: {n_entry}", flush=True)

    for qid in prefix:
        t0 = time.monotonic()
        try:
            s_pdf = qs[qid](spark, args.sf_dir).toPandas()
            if qid not in oracles:
                driver_canon(s_pdf)  # the driver canons rows-only too
                out[qid] = {
                    "status": "rows_only",
                    "rows": len(s_pdf),
                    "sec": round(time.monotonic() - t0, 2),
                }
                continue
            d_pdf = con.execute(oracles[qid]).df()
            ok = (
                sorted(s_pdf.columns) == sorted(d_pdf.columns)
                and len(s_pdf) == len(d_pdf)
                and driver_canon(s_pdf) == driver_canon(d_pdf)
            )
            out[qid] = {
                "status": "pass" if ok else "FAIL",
                "rows": len(s_pdf),
                "sec": round(time.monotonic() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 — report, don't abort
            out[qid] = {
                "status": "ERR",
                "err": f"{type(e).__name__}: {e}"[:300],
                "sec": round(time.monotonic() - t0, 2),
            }
        if out[qid]["status"] in ("FAIL", "ERR"):
            print(f"  !! {qid}: {out[qid]}", flush=True)

    fails = [k for k, v in out.items() if v["status"] in ("FAIL", "ERR")]
    with open(args.report, "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"PREFLIGHT n={len(out)} pass="
        f"{sum(v['status'] == 'pass' for v in out.values())} "
        f"rows_only={sum(v['status'] == 'rows_only' for v in out.values())} "
        f"fails={fails} total_s={round(time.monotonic() - t_all, 1)}",
        flush=True,
    )
    spark.stop()
    return len(fails)


if __name__ == "__main__":
    raise SystemExit(main())
