#!/usr/bin/env python
"""Compute which operators changed AFTER their latest driver-verified row.

The driver's correctness sweep samples a 50-id prefix of ``queries()``; the
rotation in ``__spark_entry__._registration_order`` puts never-verified ids
first.  But a verified id whose SOURCE was rewritten afterwards (e.g. the
r6 cube/rollup/percentile perf rewrites postdating their r2 driver rows)
carries a green row that no longer describes the shipped code.  This tool
makes that visible mechanically:

for every registered query id
  - locate its function's line span (inspect on the decorated function —
    the span includes the @register decorator, so ORACLE edits count);
  - ``git blame -L`` that span and take the newest committer timestamp;
  - find the latest CORRECTNESS_r{N}.json containing the id and take that
    file's git commit timestamp;
  - stale  :=  blame_newest > correctness_commit.

Writes tools/stale_ids.json: {"head": sha, "stale": [...],
"latest_round": {qid: N}} — committed, so the rotation (which must stay
runnable in the driver's bare environment, no git calls at import time)
just reads it.  Re-run after any perf rewrite of a verified operator:

    python tools/staleness.py
"""

from __future__ import annotations

import inspect
import json
import re
import subprocess
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def main() -> None:
    from recommend_spark.queries import QUERIES

    # latest driver round per qid + the commit time of that round's record
    latest_round: dict[str, int] = {}
    round_commit_ts: dict[int, int] = {}
    for rec in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", rec.name).group(1))
        ts = _git("log", "-1", "--format=%ct", "--", rec.name).strip()
        round_commit_ts[n] = int(ts) if ts else 0
        try:
            data = json.loads(rec.read_text())
        except ValueError:
            continue
        for qid in data:
            latest_round[qid] = max(latest_round.get(qid, 0), n)

    # newest blame timestamp per (file, line span); blame each file once
    spans: dict[str, list[tuple[str, int, int]]] = defaultdict(list)
    for qid, fn in QUERIES.items():
        src = inspect.unwrap(fn)
        file = inspect.getsourcefile(src)
        lines, start = inspect.getsourcelines(src)
        spans[file].append((qid, start, start + len(lines) - 1))

    stale: list[str] = []
    for file, items in spans.items():
        rel = str(Path(file).resolve().relative_to(REPO))
        # one blame per file: line -> committer time
        out = _git("blame", "--line-porcelain", rel)
        line_ts: list[int] = []
        cur_ts = 0
        for ln in out.splitlines():
            if ln.startswith("committer-time "):
                cur_ts = int(ln.split()[1])
            elif ln.startswith("\t"):
                line_ts.append(cur_ts)
        for qid, a, b in items:
            if qid not in latest_round:
                continue  # never driver-verified: rotation fronts it anyway
            newest = max(line_ts[a - 1 : b])
            rec_ts = round_commit_ts.get(latest_round[qid], 0)
            if newest > rec_ts:
                stale.append(qid)

    out = {
        "head": _git("rev-parse", "HEAD").strip(),
        "stale": sorted(stale),
        "latest_round": dict(sorted(latest_round.items())),
    }
    (REPO / "tools" / "stale_ids.json").write_text(json.dumps(out, indent=1))
    print(f"stale ({len(stale)}):", sorted(stale))


if __name__ == "__main__":
    main()
