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
  - ALSO blame the spans of every module-level name the operator's source
    (transitively) references — oracle SQL fragments like _SQL_NTOK,
    constants like MAX_AUDIENCE, shared helpers like _baskets_artifact —
    found by AST-walking the module's top-level defs/assignments and
    word-matching their names in the operator's source text, then
    expanding through helper-to-helper references;
  - find the latest CORRECTNESS_r{N}.json containing the id and take that
    file's git commit timestamp;
  - stale  :=  max(own_span_newest, referenced_spans_newest) >
    correctness_commit.

Dependency-scoped (not whole-file) so that adding a NEW operator plus its
private helpers to a module does not flag every old verified operator in
that file — only ops whose actual inputs changed go back in the rotation.
Word-matching over-approximates (a name in a comment counts); that errs
toward re-verification, never toward silent drift.

Writes tools/stale_ids.json: {"head": sha, "stale": [...],
"latest_round": {qid: N}} — committed, so the rotation (which must stay
runnable in the driver's bare environment, no git calls at import time)
just reads it.  Re-run after any perf rewrite of a verified operator:

    python tools/staleness.py
"""

from __future__ import annotations

import ast
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
    op_names: dict[str, set[str]] = defaultdict(set)
    for qid, fn in QUERIES.items():
        src = inspect.unwrap(fn)
        file = inspect.getsourcefile(src)
        lines, start = inspect.getsourcelines(src)
        spans[file].append((qid, start, start + len(lines) - 1))
        op_names[file].add(src.__name__)

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
        # module-level shared names (helpers, constants, SQL fragments):
        # name -> (span, source segment), excluding registered op functions
        text = Path(file).read_text()
        tree = ast.parse(text)
        src_lines = text.splitlines()
        shared: dict[str, tuple[int, int, str]] = {}
        for node in tree.body:
            names: list[str] = []
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in op_names[file]:
                    continue
                names = [node.name]
            elif isinstance(node, ast.Assign):
                names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                names = [node.target.id]
            if not names:
                continue
            a, b = node.lineno, node.end_lineno
            seg = "\n".join(src_lines[a - 1 : b])
            for nm in names:
                shared[nm] = (a, b, seg)

        def refs(segment: str) -> set[str]:
            """Shared names word-referenced by a source segment, transitively."""
            found: set[str] = set()
            frontier = [segment]
            while frontier:
                seg = frontier.pop()
                for nm, (_, _, nseg) in shared.items():
                    if nm not in found and re.search(rf"\b{re.escape(nm)}\b", seg):
                        found.add(nm)
                        frontier.append(nseg)
            return found

        for qid, a, b in items:
            if qid not in latest_round:
                continue  # never driver-verified: rotation fronts it anyway
            newest = max(line_ts[a - 1 : b])
            own_seg = "\n".join(src_lines[a - 1 : b])
            for nm in refs(own_seg):
                ha, hb, _ = shared[nm]
                newest = max(newest, max(line_ts[ha - 1 : hb]))
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
