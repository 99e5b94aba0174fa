"""§2.11 Structured Streaming over events.

Every queries() entry here executes a REAL streaming graph (multi-micro-batch
file replay via recommend_spark.streaming.replay — 8 chunks, 4 files per
trigger by default, availableNow, real state stores).  The SQL-expressible
ones carry a batch-semantics DuckDB oracle — the driver's hash check
therefore proves streaming == batch, which is the Structured Streaming
correctness contract.  Late-data/watermark behaviors that are
micro-batch-timing dependent are rows-only and asserted under controlled
replay orders in tests/test_streaming.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..canon import dsum, epoch_s
from ..registry import register
from ..streaming.replay import run_stream


@register(
    "stream_tumbling",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
           event_type,
           count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling(spark, sf_dir):
    """10-minute tumbling window count/sum per event_type, executed as a
    streaming aggregation (complete mode) and hash-checked against the
    batch epoch-bucket oracle."""

    def build(stream):
        return stream.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        ).agg(F.count("*").alias("cnt"), dsum("value", "sum_value"))

    out = run_stream(spark, sf_dir, "rs_stream_tumbling", build)
    return out.select(
        epoch_s("w.start", "window_start"),
        "event_type",
        "cnt",
        "sum_value",
    )


@register(
    "stream_sliding",
    oracle="""
    WITH buckets AS (
      SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS b, value FROM events
    ), windows AS (
      SELECT b AS window_start, value FROM buckets
      UNION ALL
      SELECT b - 300 AS window_start, value FROM buckets
    )
    SELECT window_start, count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM windows GROUP BY window_start
    """,
)
def stream_sliding(spark, sf_dir):
    """10-minute window sliding every 5 minutes (each event lands in two
    windows); oracle = two shifted bucketings UNION ALL."""

    def build(stream):
        return stream.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w")
        ).agg(F.count("*").alias("cnt"), dsum("value", "sum_value"))

    out = run_stream(spark, sf_dir, "rs_stream_sliding", build)
    return out.select(
        epoch_s("w.start", "window_start"),
        "cnt",
        "sum_value",
    )


@register(
    "stream_session",
    oracle="""
    WITH o AS (
      SELECT user_id, epoch_us(ts) // 1000000 AS sec,
             epoch_us(ts) AS us, event_id,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS new_session
      FROM o
    ), sessions AS (
      SELECT user_id, us, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, count(*) AS n_events,
           CAST(min(us) // 1000000 AS BIGINT) AS session_start
    FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_session(spark, sf_dir):
    """30-minute-gap session windows per user via session_window() — the
    dynamic-gap state-store operator.  Oracle = gaps-and-islands SQL
    (lag + cumulative new-session markers) at microsecond grain."""

    def build(stream):
        return stream.withWatermark("ts", "10 seconds").groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        ).agg(F.count("*").alias("n_events"))

    out = run_stream(spark, sf_dir, "rs_stream_session", build, output_mode="complete")
    return out.select(
        "user_id",
        "n_events",
        epoch_s("w.start", "session_start"),
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
    """,
)
def stream_dedup(spark, sf_dir):
    """Exactly-once by event_id within the stream (dropDuplicates with
    watermarked state), then a per-type count.  event_id is unique in the
    fixture, so the streaming result must equal the plain batch aggregate —
    which is exactly what the oracle checks."""

    def build(stream):
        return (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id"])
            .groupBy("event_type")
            .agg(F.count("*").alias("cnt"))
        )

    return run_stream(spark, sf_dir, "rs_stream_dedup", build)


@register("stream_watermark_late")  # rows-only: append-mode emission depends
def stream_watermark_late(spark, sf_dir):  # on micro-batch watermark timing
    """15-minute watermark + tumbling count in APPEND mode: only windows the
    watermark has closed are emitted, so the result is a strict prefix of the
    batch twin (asserted, with injected late chunks, in tests)."""

    def build(stream):
        return (
            stream.withWatermark("ts", "15 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"))
        )

    # Default batching (4 files/trigger -> 2 data batches).  The finer
    # 2-files/trigger replay this op used through r4 bought nothing:
    # availableNow runs a final watermark-commit pass, so the emitted
    # window set is batching-INVARIANT (measured at sf0.1: 4318 rows at
    # 2, 4, and 8 files/trigger) while 4 data batches doubled the
    # per-batch scheduler + state-commit cost (2.3-2.8 s idle vs 1.7 s;
    # 4.52 s in the r4 sweep).  2 data batches still carry state across a
    # genuine batch boundary, which is what the prefix gate exercises.
    out = run_stream(
        spark,
        sf_dir,
        "rs_stream_watermark_late",
        build,
        output_mode="append",
    )
    return out.select(
        epoch_s("w.start", "window_start"),
        "cnt",
    )


@register(
    "stream_stateful_count",
    oracle="""
    SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    """,
)
def stream_stateful_count(spark, sf_dir):
    """Custom stateful operator: per-user running count via
    applyInPandasWithState (explicit GroupState across micro-batches).
    Each batch emits the updated total; the final (max) emission per user
    must equal the batch count — the oracle checks exactly that."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [count]})

    def build(stream):
        return stream.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    out = run_stream(
        spark,
        sf_dir,
        "rs_stream_stateful",
        build,
        output_mode="update",
        # Python-state replay: per-partition pandas workers want width 8
        # (r14 A/B: 3.70 s vs 6.29 s at the JVM-state default of 2)
        state_width=8,
    )
    return out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


@register(
    "stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS cnt,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream-static enrichment join: each micro-batch of events joins the
    static customer dim (stateless — no stream state, the static side is
    re-resolvable per batch), then a streaming aggregate per market segment.
    This is THE production enrichment shape: at 100 TB/day the dim broadcasts
    and the join adds zero shuffle to the stream; only the tiny per-segment
    aggregate keeps state."""
    from ..io import hint_if, load_table, table_rows

    def build(stream):
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        return (
            # cust scales with accounts: gated hint (io.hint_if);
            # past the budget the stream-static join falls back to the
            # optimizer's threshold decision
            stream.join(
                hint_if(cust, table_rows(sf_dir, "customer") * 64),
                stream.user_id == cust.c_custkey,
            )
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("cnt"), dsum("value", "sum_value"))
        )

    return run_stream(spark, sf_dir, "rs_stream_static_join", build)


@register(
    "stream_sink_parquet",
    oracle="""
    SELECT event_type, count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def stream_sink_parquet(spark, sf_dir):
    """foreachBatch -> idempotent parquet sink: each micro-batch appends to a
    batch_id=... directory (re-delivery overwrites the same directory, the
    standard exactly-once file-sink recipe).  The re-read of the sink must
    aggregate to the batch truth — which the oracle checks."""
    from ..streaming.replay import (
        EVENTS_SCHEMA,
        materialize_chunks,
        proc_scoped_dir,
    )

    # per-process paths: concurrent test processes share ART (see
    # proc_scoped_dir) — a fixed path lets one process rmtree mid-commit
    # under the other
    out_dir = proc_scoped_dir("stream_sink_parquet")
    chk = proc_scoped_dir("chk_stream_sink_parquet")
    src = materialize_chunks(spark, sf_dir)

    def sink_batch(batch_df, batch_id: int):
        (
            batch_df.write.mode("overwrite").parquet(
                str(out_dir / f"batch_id={batch_id}")
            )
        )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(chk))
        .start()
    )
    q.awaitTermination()
    sunk = spark.read.option("recursiveFileLookup", "true").parquet(str(out_dir))
    return sunk.groupBy("event_type").agg(
        F.count("*").alias("cnt"), dsum("value", "sum_value")
    )


@register(
    "stream_upsert_latest",
    oracle="""
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_upsert_latest(spark, sf_dir):
    """CDC-style streaming materialization: maintain a latest-event-per-user
    table via foreachBatch MERGE — per micro-batch, the incoming rows are
    merged into the parquet state table keyed on user_id, keeping the row
    with the max (ts, event_id).  Write-stage-then-rename keeps each merge
    atomic (at production scale a Delta/Iceberg MERGE replaces the rename).
    Because last-writer-wins under a TOTAL order, the final table equals
    the batch latest-per-key query regardless of micro-batch boundaries —
    which is exactly what the oracle checks."""
    import shutil

    from pyspark.sql import Window as W

    from ..streaming.replay import (
        EVENTS_SCHEMA,
        materialize_chunks,
        proc_scoped_dir,
    )

    # per-process paths (see proc_scoped_dir)
    state = proc_scoped_dir("stream_upsert_latest")
    chk = proc_scoped_dir("chk_stream_upsert_latest")
    src = materialize_chunks(spark, sf_dir)

    cols = ["user_id", "event_id", "ts", "value"]

    def merge_batch(batch_df, batch_id: int):
        batch = batch_df.select(*cols)
        cur = state / "cur"
        if cur.exists():
            batch = batch.unionByName(spark.read.parquet(str(cur)))
        w = W.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            batch.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        tmp = state / f"tmp_{batch_id}"
        latest.write.mode("overwrite").parquet(str(tmp))
        if cur.exists():
            shutil.rmtree(cur)
        tmp.rename(cur)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(chk))
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(state / "cur")).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           CAST(floor(epoch(v.ts)) AS BIGINT) AS v_sec,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS p_sec
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream interval self-join: every purchase joined to the views
    by the same user in the preceding hour — attribution, the canonical
    stream-stream shape.

    Both sides carry a watermark (2 h) and the join condition bounds event
    time on both ends, so Spark's symmetric hash join can evict state: each
    side buffers only ~1 h of rows per key at any moment, regardless of
    stream length — THE property that makes this run forever at 100 TB/day.
    Inner-join emission needs no watermark to fire (rows emit when the
    match arrives); the watermark only caps state, so the availableNow
    drain is complete and equals the batch interval join the oracle runs."""
    def build(stream):
        views = (
            stream.filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "2 hours")
        )
        purch = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "2 hours")
        )
        j = views.join(
            purch,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        return j.select(
            "view_id",
            "purchase_id",
            F.col("v_user").alias("user_id"),
            epoch_s("v_ts", "v_sec"),
            epoch_s("p_ts", "p_sec"),
        )

    return run_stream(
        spark, sf_dir, "rs_stream_stream_join", build, output_mode="append"
    )


@register(
    "stream_stream_join_outer",
    oracle="""
    WITH v AS (
      SELECT event_id AS view_id, user_id AS v_user, ts AS v_ts
      FROM events WHERE event_type = 'view'
    ), p AS (
      SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), mx AS (
      -- the global watermark is the MIN over both inputs' watermarks
      -- (multiple-watermark policy min, the Spark default), each fed by
      -- its OWN filtered branch's max event time — not max(ts) over all
      -- events, which can run ahead of both branches (e.g. a late
      -- click event) and wrongly widen the eviction window
      SELECT least((SELECT max(v_ts) FROM v), (SELECT max(p_ts) FROM p)) AS m
    ), j AS (
      SELECT v.view_id, p.purchase_id, v.v_user, v.v_ts, p.p_ts
      FROM v LEFT JOIN p
        ON v.v_user = p.p_user
       AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
    )
    SELECT view_id, purchase_id, v_user AS user_id,
           CAST(floor(epoch(v_ts)) AS BIGINT) AS v_sec,
           CAST(floor(epoch(p_ts)) AS BIGINT) AS p_sec
    FROM j CROSS JOIN mx
    WHERE purchase_id IS NOT NULL OR v_ts < m - INTERVAL 3 HOUR
    """,
)
def stream_stream_join_outer(spark, sf_dir):
    """LEFT OUTER stream-stream join: views null-extend when no purchase
    follows within the hour — but in a stream, "no match" is only decidable
    once the watermark passes the view's match window.  Unmatched rows are
    emitted on state eviction at
        v_ts < watermark - join_window
             = least(max view ts, max purchase ts) - (2h + 1h)
    — the global watermark is the MIN over both inputs' watermarks (Spark's
    default multiple-watermark policy), each computed from its own filtered
    branch, NOT from max(ts) over the raw stream —
    so the availableNow drain equals the batch LEFT JOIN restricted to
    views older than that cutoff (younger unmatched views are still open
    state when the stream ends) plus ALL matched pairs — which is exactly
    what the oracle computes, making even the outer join's partial-emission
    semantics value-hash checkable.  Verified against the replay: the
    eviction boundary is the condition-shifted state watermark, not the
    bare watermark."""
    def build(stream):
        views = (
            stream.filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "2 hours")
        )
        purch = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "2 hours")
        )
        j = views.join(
            purch,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
            "leftOuter",
        )
        return j.select(
            "view_id",
            "purchase_id",
            F.col("v_user").alias("user_id"),
            epoch_s("v_ts", "v_sec"),
            epoch_s("p_ts", "p_sec"),
        )

    # 4 files/trigger (2 data batches + the finalizing batch): still a
    # genuine multi-batch run with a mid-stream watermark advance, but the
    # outer join's per-batch state-eviction scans dominate wall-clock at
    # bench scale and the drained result is batching-invariant (verified
    # 2 vs 8 files/trigger — identical rows).
    return run_stream(
        spark,
        sf_dir,
        "rs_stream_stream_join_outer",
        build,
        output_mode="append",
        files_per_trigger=4,
    )


@register(
    "stream_session_ttl",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    ), marked AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM o
    ), sess AS (
      SELECT user_id, us,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM marked
    ), agg AS (
      SELECT user_id, sid,
             min(us) AS start_us, max(us) AS end_us,
             count(*) AS n
      FROM sess GROUP BY 1, 2
    ), ranked AS (
      SELECT *, max(sid) OVER (PARTITION BY user_id) AS last_sid
      FROM agg
    ), wm AS (
      SELECT max(epoch_us(ts)) - 600000000 AS w FROM events
    )
    SELECT user_id,
           CAST(start_us // 1000000 AS BIGINT) AS start_s,
           CAST(end_us // 1000000 AS BIGINT) AS end_s,
           CAST(n AS BIGINT) AS n_events
    FROM ranked CROSS JOIN wm
    WHERE sid < last_sid OR end_us + 1800000000 < w
    """,
)
def stream_session_ttl(spark, sf_dir):
    """Stateful session TTL via a REAL event-time timer
    (applyInPandasWithState + GroupStateTimeout.EventTimeTimeout — the
    arbitrary-state timer surface; the newer transformWithStateInPandas
    timer API is schema-equivalent but its Python driver worker needs
    protobuf, absent in this environment): per-user state holds the
    open session (start, last, count); a >30-minute in-stream gap
    closes the previous session on arrival, and the per-user FINAL
    session is closed only when its timeout timestamp (last event +
    30 min) expires against the advancing watermark — the TTL path that
    availableNow's finalizing watermark-commit pass drives for every
    user whose session ended >30 min before the corpus watermark
    (max ts − 10 min delay).  Open
    sessions younger than that remain state and are NOT emitted — the
    oracle twin encodes exactly that partial-emission semantics, so the
    driver hash-check proves gap-close AND timer-close produce the
    batch sessionization (win_sessionize's gaps-and-islands) restricted
    to expired sessions.

    Determinism note (why gap- vs timer-close cannot race): the replay
    is globally ts-ordered and the watermark lags processed data by the
    10-min delay, so a user's next in-gap event is always processed
    before any timer at last+30min can fire; mechanism choice never
    changes the emitted rows.

    100 TB: state is one fixed-width row + one timer per ACTIVE user
    key, partitioned by user; timers are the state store's own ordered
    index (no scan-all-keys sweep per batch); emission is append-only.
    The same shape runs unbounded — TTL expiry bounds state to the
    active-user working set, which is the whole point of timers."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    GAP_US = 1_800_000_000  # 30 min, matches win_sessionize
    GAP_MS = GAP_US // 1_000

    def _frame(user, sessions):
        # ONE DataFrame per (user, batch) — per-session single-row frames
        # measured 6.6x at the sf1 campaign leg (a million 1-row pandas
        # constructions); batching the emissions is the fix
        return pd.DataFrame(
            {
                "user_id": [user] * len(sessions),
                "start_s": [s[0] // 1_000_000 for s in sessions],
                "end_s": [s[1] // 1_000_000 for s in sessions],
                "n_events": [s[2] for s in sessions],
            }
        )

    def update(key, pdfs, state: GroupState):
        user = key[0]
        if state.hasTimedOut:
            # the TTL path: the watermark passed last+gap with no new
            # events for this user -> close the open session, drop state
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
        # the event-time TTL: expires when the watermark passes it; a
        # later in-gap event simply overwrites it with a fresher deadline
        state.setTimeoutTimestamp(last // 1_000 + GAP_MS)

    def build(stream):
        return (
            stream.select(
                "user_id", "ts", F.unix_micros("ts").alias("us")
            )
            .withWatermark("ts", "10 minutes")
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=(
                    "user_id long, start_s long, end_s long, n_events long"
                ),
                stateStructType="start long, last long, cnt long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )

    return run_stream(
        spark,
        sf_dir,
        "rs_stream_session_ttl",
        build,
        output_mode="append",
        # Python-state replay: per-partition pandas workers want width 8
        # (r14 A/B: 4.49 s vs 8.40 s at the JVM-state default of 2)
        state_width=8,
    )
