"""Streaming-execution semantics under controlled replay — SURVEY §5.4.

The queries() entries already prove streaming == batch via the driver
oracle; these tests cover what the oracle can't: late-data drops under an
out-of-order replay, and watermark-append prefix semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from recommend_spark.queries import QUERIES
from recommend_spark.streaming.replay import run_stream
from tests.conftest import SF_DIR


def test_watermark_append_is_prefix_of_batch(spark):
    """Append-mode windows emitted under a watermark must agree with the
    batch aggregate on every emitted window (prefix property)."""
    from recommend_spark.io import load_table

    out = {
        r["window_start"]: r["cnt"]
        for r in QUERIES["stream_watermark_late"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    batch = {
        r["window_start"]: r["cnt"]
        for r in ev.groupBy(
            F.floor(
                F.floor(F.col("ts").cast("timestamp").cast("double") / 600) * 600
            ).cast("long").alias("window_start")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert out, "append mode should emit at least one closed window"
    for w, c in out.items():
        assert batch.get(w) == c, (w, c, batch.get(w))


def test_out_of_order_replay_still_counts_all_with_big_watermark(spark):
    """With a watermark larger than the disorder, an out-of-order replay
    must converge to the same totals (complete mode)."""

    def build(stream):
        return (
            stream.withWatermark("ts", "2 days")
            .groupBy("event_type")
            .agg(F.count("*").alias("cnt"))
        )

    out = {
        r["event_type"]: r["cnt"]
        for r in run_stream(
            spark, SF_DIR, "rs_test_ooo", build, output_mode="complete", shuffled=True
        ).collect()
    }
    from recommend_spark.io import load_table

    ev = load_table(spark, SF_DIR, "events")
    batch = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert out == batch


def test_socket_source_smoke(spark):
    """Replay-harness semantics hold off the file/rate/memory path: the
    same grouped-count graph that stream_stateful_count proves over the
    parquet replay runs against Spark's built-in SOCKET source fed by a
    local listener, and converges to the exact batch totals.  Skips
    cleanly if the sandbox blocks even localhost sockets."""
    import socket
    import threading
    import time

    import pytest

    lines = [f"k{i % 3}" for i in range(30)]
    try:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
    except OSError:
        pytest.skip("sandbox blocks localhost sockets")
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        try:
            conn, _ = srv.accept()
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop.wait(60)  # keep the connection open until the test ends
            conn.close()
        except OSError:
            pass

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    stream = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    q = (
        stream.groupBy("value")
        .count()
        .writeStream.format("memory")
        .queryName("rs_socket_smoke")
        .outputMode("complete")
        .start()
    )
    rows = {}
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = {
                r["value"]: r["count"]
                for r in spark.table("rs_socket_smoke").collect()
            }
            if sum(rows.values()) >= len(lines):
                break
            time.sleep(0.5)
    finally:
        stop.set()
        q.stop()
        srv.close()
    assert rows == {"k0": 10, "k1": 10, "k2": 10}, rows
