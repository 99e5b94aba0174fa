#!/usr/bin/env python
"""Interleaved A/B: stream_session_ttl boundary width.

Variant A (shipped): (user_id, ts, us) crosses the Python boundary — ts
kept only for the watermark.  Variant B: project ts away AFTER
withWatermark so only (user_id, us) crosses; the EventTimeWatermark node
stays upstream and must still drive EventTimeTimeout.  Guards: outputs
must be bit-identical; then min-of-N interleaved walls.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from recommend_spark.session import get_spark  # noqa: E402
from recommend_spark.streaming.replay import run_stream  # noqa: E402

GAP_US = 1_800_000_000
GAP_MS = GAP_US // 1_000


def _frame(user, sessions):
    return pd.DataFrame(
        {
            "user_id": [user] * len(sessions),
            "start_s": [s[0] // 1_000_000 for s in sessions],
            "end_s": [s[1] // 1_000_000 for s in sessions],
            "n_events": [s[2] for s in sessions],
        }
    )


def update(key, pdfs, state):
    user = key[0]
    if state.hasTimedOut:
        start, last, cnt = state.get
        state.remove()
        yield _frame(user, [(start, last, cnt)])
        return
    us_all = []
    for pdf in pdfs:
        us_all.extend(pdf["us"].tolist())
    us_all.sort()
    start = last = cnt = None
    if state.exists:
        start, last, cnt = state.get
    closed = []
    for us in us_all:
        if start is None:
            start, last, cnt = us, us, 1
        elif us - last > GAP_US:
            closed.append((start, last, cnt))
            start, last, cnt = us, us, 1
        else:
            last, cnt = max(last, us), cnt + 1
    if closed:
        yield _frame(user, closed)
    state.update((start, last, cnt))
    state.setTimeoutTimestamp(last // 1_000 + GAP_MS)


def build_variant(narrow: bool):
    from pyspark.sql.streaming.state import GroupStateTimeout

    def build(stream):
        s = stream.select(
            "user_id", "ts", F.unix_micros("ts").alias("us")
        ).withWatermark("ts", "10 minutes")
        if narrow:
            s = s.select("user_id", "us")
        return s.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, start_s long, end_s long, n_events long"
            ),
            stateStructType="start long, last long, cnt long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    return build


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    legs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-ttl-narrow")
    spark.sparkContext.setLogLevel("ERROR")

    def run(narrow: bool, tag: str) -> tuple[float, list]:
        t0 = time.monotonic()
        out = run_stream(
            spark, sf_dir, f"rs_ab_ttl_{tag}", build_variant(narrow),
            output_mode="append", state_width=8,
        )
        rows = sorted(tuple(r) for r in out.collect())
        return time.monotonic() - t0, rows

    # correctness first, at the A/B scale
    _, rows_a = run(False, "wide0")
    _, rows_b = run(True, "narrow0")
    ident = rows_a == rows_b
    print(f"identical={ident} rows={len(rows_a)}", flush=True)
    if not ident:
        print("ABORT: outputs differ")
        spark.stop()
        sys.exit(1)

    walls_a, walls_b = [], []
    for i in range(legs):
        ta, _ = run(False, f"wide{i + 1}")
        tb, _ = run(True, f"narrow{i + 1}")
        walls_a.append(round(ta, 2))
        walls_b.append(round(tb, 2))
        print(f"leg {i + 1}: wide {ta:.2f}s narrow {tb:.2f}s", flush=True)
    print(f"wide  {walls_a} min {min(walls_a):.2f}")
    print(f"narrow {walls_b} min {min(walls_b):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
