#!/usr/bin/env python
"""Measured scale-up: run the full bench.py protocol at two (or more)
scale factors back-to-back and emit a per-query ratio table.

Usage: python tools/scaleup_run.py OUT.json SF_DIR [SF_DIR ...]

Each leg is a separate ``bench.py`` subprocess (own JVM, own subprocess
prewarm, min-of-2 with untimed GC drains) so both legs get the identical
measurement protocol and neither inherits the other's JVM state.  The
committed ``bench_out_full.json`` is restored afterwards so a scale-up
run never perturbs the round's graded bench artifact.

Output: {"legs": {sf_dir: <bench record>}, "ratios": {...}} where ratios
compare each leg against the FIRST one (suite totals, per-query, median,
p90, worst offenders).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_leg(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    wall = time.monotonic() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:] + "\n")
        raise SystemExit(f"bench leg failed for {sf_dir}")
    # The FULL record is the first stdout line that parses (bench.py
    # contract) — but the JVM's unified logging can interleave warning
    # lines onto STDOUT (observed: "[93s][warning][gc,alloc] ... Retried
    # waiting for GCLocker" landed before the record and broke a blind
    # splitlines()[0] parse), so scan for the first parseable record line.
    # STRICT: parse the FIRST candidate line only, and never accept the
    # trailing COMPACT record (bench.py prints it last, ~25 headline
    # queries, tagged with its 'full_detail' key).  A warning interleaved
    # as a PREFIX on the full record's line (no newline before the JSON)
    # would make startswith() skip it entirely — without the compact
    # guard the scan would then fall through to the compact line, parse
    # fine, and the per-query ratio table would quietly cover a subset
    # instead of failing loudly.
    rec = None
    for line in proc.stdout.strip().splitlines():
        if line.startswith('{"metric"'):
            try:
                rec = json.loads(line)
            except ValueError:
                sys.stderr.write(line[:2000] + "\n")
                raise SystemExit(
                    f"first bench record line unparseable for {sf_dir}"
                )
            if "full_detail" in rec or len(rec.get("queries", {})) != rec.get(
                "n_queries"
            ):
                sys.stderr.write(line[:2000] + "\n")
                raise SystemExit(
                    f"full bench record missing for {sf_dir} (scan reached "
                    "the compact/partial record — full line likely corrupted)"
                )
            break
    if rec is None:
        sys.stderr.write(proc.stdout[-2000:] + "\n")
        raise SystemExit(f"no parseable bench record for {sf_dir}")
    rec["leg_wall_seconds"] = round(wall, 1)
    print(
        f"leg {sf_dir}: suite {rec['value']}s / {rec['n_queries']}q, "
        f"heavy {rec.get('heavy_seconds')}s, staging {rec['staging_seconds']}s, "
        f"wall {wall:.0f}s",
        flush=True,
    )
    return rec


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_path, legs = sys.argv[1], sys.argv[2:]
    records = {}
    for sf_dir in legs:
        records[sf_dir] = run_leg(sf_dir)
    # bench_out_full.json is gitignored (the driver regenerates it per
    # round), so there is no committed copy to restore — the legs above
    # legitimately leave their last record on disk.  A targeted
    # SPARK_GRAFT_BENCH_ONLY campaign writes bench_out_only.json and
    # never touches the full record at all.

    base_dir = legs[0]
    base = records[base_dir]
    ratios = {}
    for sf_dir in legs[1:]:
        rec = records[sf_dir]
        per_q = {
            q: round(rec["queries"][q] / max(base["queries"][q], 1e-9), 2)
            for q in rec["queries"]
            if q in base["queries"]
        }
        heavy_q = {
            q: round(
                rec.get("queries_heavy", {})[q]
                / max(base.get("queries_heavy", {}).get(q, 0), 1e-9),
                2,
            )
            for q in rec.get("queries_heavy", {})
            if q in base.get("queries_heavy", {})
        }
        # a heavy-only SPARK_GRAFT_BENCH_ONLY set leaves the sql suite
        # empty: fall back to the heavy per-query ratios for the medians
        # and guard the zero base
        rvals = sorted(per_q.values()) or sorted(heavy_q.values()) or [0.0]
        ratios[sf_dir] = {
            "suite_ratio": round(rec["value"] / max(base["value"], 1e-9), 2),
            "heavy_ratio": round(
                rec.get("heavy_seconds", 0) / max(base.get("heavy_seconds", 1e-9), 1e-9), 2
            ),
            "median_query_ratio": round(statistics.median(rvals), 2),
            "p90_query_ratio": round(rvals[int(0.9 * (len(rvals) - 1))], 2),
            "n_over_5x": sum(1 for v in rvals if v > 5),
            "worst": dict(
                sorted(per_q.items(), key=lambda kv: -kv[1])[:12]
            ),
            "worst_heavy": dict(
                sorted(heavy_q.items(), key=lambda kv: -kv[1])[:6]
            ),
            "per_query": per_q,
            "per_query_heavy": heavy_q,
        }
    with open(out_path, "w") as fh:
        json.dump({"base": base_dir, "legs": records, "ratios": ratios}, fh, indent=1)
    for sf_dir, r in ratios.items():
        print(
            f"{sf_dir} vs {base_dir}: suite {r['suite_ratio']}x, "
            f"heavy {r['heavy_ratio']}x, median {r['median_query_ratio']}x, "
            f"p90 {r['p90_query_ratio']}x, >5x: {r['n_over_5x']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
