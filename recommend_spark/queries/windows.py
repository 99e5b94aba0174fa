"""§2.5 Window functions.

Reference parity: the reference computes global top-N via ``takeOrdered``
(upstream:engine.py § get_top_ratings); the per-group generalization is the
window machinery here.  ``win_topk_per_group`` is written in the exact
``row_number() <= k`` form Catalyst recognizes and rewrites to
WindowGroupLimit (per-partition partial top-k before the shuffle — the shape
that survives 100 TB).

Determinism: every window ORDER BY carries a unique tie-break column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from ..canon import dsum, epoch_s, r4
from ..io import load_table
from ..registry import register


@register(
    "win_rank_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile,
           percent_rank() OVER w AS pct_rank
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_extendedprice DESC, l_linenumber)
    """,
)
def win_rank_family(spark, sf_dir):
    """row_number / rank / dense_rank / ntile / percent_rank over one window."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        r4(F.percent_rank().over(w), "pct_rank"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id,
           lag(value, 1, 0.0)  OVER w AS prev_value,
           lead(value, 1, 0.0) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def win_lag_lead(spark, sf_dir):
    """Prior/next event value per user with defaults.

    Ordering key is epoch *microseconds* + event_id in BOTH engines: Spark's
    ts is truncated to micros at load (FIXTURES.md Q1) while DuckDB keeps
    nanos, so ordering by raw ts could disagree on sub-microsecond ties.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")), "event_id")
    return ev.select(
        "event_id",
        r4(F.lag("value", 1, 0.0).over(w), "prev_value"),
        r4(F.lead("value", 1, 0.0).over(w), "next_value"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT), o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def win_running_sum(spark, sf_dir):
    """Cumulative sum per customer in order-date order (decimal-exact)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(
            F.floor(F.col("o_orderdate").cast("timestamp").cast("double")).cast("long"),
            "o_orderkey",
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "win_moving_avg",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / COUNT(o_totalprice) OVER w AS moving_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT), o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark, sf_dir):
    """Sliding 3-row mean per customer (decimal-exact numerator)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(
            F.floor(F.col("o_orderdate").cast("timestamp").cast("double")).cast("long"),
            "o_orderkey",
        )
        .rowsBetween(-2, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
            / F.count("o_totalprice").over(w)
        ).alias("moving_avg"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS hour_sum
    FROM events
    """,
)
def win_range_frame(spark, sf_dir):
    """Per-user trailing-1-hour event-value sum via a RANGE frame on epoch
    seconds (Spark range frames are numeric — cast identically in DuckDB).
    Equal-second peers are all included by RANGE semantics in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.floor(F.col("ts").cast("double")).cast("long"))
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("hour_sum"),
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    QUALIFY row_number() OVER (
      PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber
    ) <= 3
    """,
)
def win_topk_per_group(spark, sf_dir):
    """Top-3 lineitems per order — the reference's recommendation shape,
    per-group.  Written as row_number()<=k so Catalyst plans WindowGroupLimit
    (partial top-k before the shuffle; asserted in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "win_first_last",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           first_value(l_extendedprice) OVER w AS first_price,
           last_value(l_extendedprice) OVER w AS last_price,
           nth_value(l_extendedprice, 2) OVER w AS second_price
    FROM lineitem
    WINDOW w AS (
      PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark, sf_dir):
    """first/last/nth value over an explicit full-partition frame.

    The UNBOUNDED..UNBOUNDED frame matters: the default frame stops at
    CURRENT ROW, which silently turns last_value into "running last" —
    a classic cross-engine divergence this query pins down.  Ordered by
    (l_linenumber, l_extendedprice) — unique within an order in this
    fixture (l_linenumber alone is NOT) — so results are deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w).alias("last_price"),
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
    )


@register(
    "win_sessionize",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS new_session
      FROM o
    ), sess AS (
      SELECT *, CAST(SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      FROM marked
    )
    SELECT event_id, user_id, session_idx,
           CAST(row_number() OVER (
             PARTITION BY user_id, session_idx ORDER BY us, event_id
           ) AS INT) AS session_seq
    FROM sess
    """,
)
def win_sessionize(spark, sf_dir):
    """Per-event session assignment (gaps-and-islands): a new session starts
    after a >30-minute silence; each event gets (session_idx, session_seq).
    This is the batch sessionizer behind per-session features — one
    partition-by-user shuffle, two window passes, integer-microsecond gap
    math so both engines compare exact integers (never float seconds)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    marked = ev.select(
        "event_id",
        "user_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = W.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = marked.withColumn(
        "session_idx", F.sum("new_session").over(w2).cast("long")
    )
    w3 = W.partitionBy("user_id", "session_idx").orderBy("us", "event_id")
    return sess.select(
        "event_id",
        "user_id",
        "session_idx",
        F.row_number().over(w3).alias("session_seq"),
    )


@register(
    "win_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), g AS (
      SELECT user_id, d,
             CAST(d - (row_number() OVER (PARTITION BY user_id ORDER BY d))
                  * INTERVAL 1 DAY AS DATE) AS grp
      FROM days
    ), runs AS (
      SELECT user_id, grp, count(*) AS len,
             strftime(min(d), '%Y-%m-%d') AS streak_start
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id, len AS longest_streak, streak_start
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY len DESC, streak_start
      ) AS rn FROM runs
    ) WHERE rn = 1
    """,
)
def win_streak(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands date variant: distinct active days, island key =
    day − row_number (consecutive days share it), per-island length, then
    top-1 per user with a deterministic tie-break (earliest streak).
    Two keyed shuffles (distinct, island groupBy) + one WindowGroupLimit
    pass — no per-user history ever assembles in one place."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    g = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = g.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"),
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
    )
    w2 = W.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("streak_start")
    )
    return (
        runs.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("len").alias("longest_streak"), "streak_start")
    )


@register(
    "win_dist_share",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           cume_dist() OVER (
             PARTITION BY l_orderkey
             ORDER BY l_extendedprice, l_linenumber) AS cd,
           CAST(l_extendedprice AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY l_orderkey) AS DOUBLE) AS price_share
    FROM lineitem
    """,
)
def win_dist_share(spark, sf_dir):
    """Distribution windows: cume_dist (fraction of partition at or below
    this line's price — exact k/n division) and ratio-to-report
    (line price / exact decimal order total).  Completes the rank family
    (win_rank_family) with the two value-distribution forms; same single
    shuffle on the partition key."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_extendedprice", "l_linenumber")
    wp = W.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.cume_dist().over(w).alias("cd"),
        (
            F.col("l_extendedprice").cast("double")
            / F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .over(wp)
            .cast("double")
        ).alias("price_share"),
    )


@register(
    "win_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
    )
    SELECT event_type, day,
           CAST(cents AS DOUBLE) / 100.0 AS day_value,
           median(cents) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) / 100.0 AS med7
    FROM daily
    """,
)
def win_rolling_median(spark, sf_dir):
    """Trailing-7-day rolling EXACT median of daily event value per type.

    Rolling robust statistics (median, not mean) are the spike-resistant
    smoother dashboards want.  Spark refuses ordered-aggregate functions
    over a window frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the
    median is computed from first principles: `collect_list` over the ROWS
    frame (legal), sort the <=7-element array, select the middle (odd) or
    average the two middles (even) — numerically identical to DuckDB's
    windowed `median()`, which the oracle uses directly.
    Determinism: the daily series is exact integer cents (order-free sum),
    selection is exact, and (a+b)/2.0 on integer cents is one IEEE op.
    At 100 TB the frame is bounded (7 rows) so per-partition state is O(1);
    the one shuffle is the groupBy to days, after which the window reuses
    the same hash partitioning on event_type (AQE keeps it colocated)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    med = (
        "CASE WHEN size(win7) % 2 = 1"
        " THEN CAST(element_at(win7, CAST((size(win7) + 1) DIV 2 AS INT)) AS DOUBLE)"
        " ELSE (CAST(element_at(win7, CAST(size(win7) DIV 2 AS INT)) AS DOUBLE)"
        "       + CAST(element_at(win7, CAST(size(win7) DIV 2 + 1 AS INT)) AS DOUBLE)) / 2.0"
        " END"
    )
    return (
        daily.withColumn("win7", F.sort_array(F.collect_list("cents").over(w)))
        .select(
            "event_type",
            "day",
            (F.col("cents").cast("double") / 100.0).alias("day_value"),
            (F.expr(med) / 100.0).alias("med7"),
        )
    )


@register(
    "win_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
             lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS next_s
      FROM events
    )
    SELECT user_id,
           count(*) AS n_intervals,
           CAST(SUM(next_s - t_s) AS BIGINT) AS held_s,
           CAST(SUM(CAST(value * (next_s - t_s) AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(next_s - t_s) AS BIGINT) AS twa_value
    FROM seq
    WHERE next_s IS NOT NULL
    GROUP BY user_id
    HAVING SUM(next_s - t_s) > 0
    """,
)
def win_time_weighted_avg(spark, sf_dir):
    """Time-weighted average of `value` per user over an irregular event
    timeline: each reading is weighted by how long it was the *current*
    state (next event's timestamp minus its own), the correct mean for
    unevenly sampled gauges (sensor state, account balance, price) where a
    plain AVG over-counts bursts.  One window (lead over the user's
    timeline) + one grouped agg — both shuffle on user_id, and AQE merges
    them into a single exchange.

    Determinism: the per-interval product value*dt is per-row IEEE (bit
    stable cross-engine); the order-sensitive accumulation is made exact by
    summing in DECIMAL(25,6) (canon.py dsum discipline), and the final
    division is one IEEE op.  Ordering ties break on integer microseconds
    + event_id (the win_lag_lead rule), but the WEIGHT is integer epoch
    seconds: with microsecond weights the decimal sum's scaled integer
    tops 2^53 and the decimal->double cast itself rounds differently per
    engine (measured: 38/150 users off by 1 ulp); second weights keep the
    scaled sum exactly double-representable.  Zero-span users (all events
    inside one second) are dropped — 0/0 division semantics differ across
    engines.

    100 TB: map + one shuffle on user_id; the window sort is bounded by
    per-user event count, skew handled by AQE.  No Python, no collect."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    t_s = F.floor(F.col("ts").cast("timestamp").cast("double")).cast("long")
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    seq = ev.select(
        "user_id",
        "value",
        t_s.alias("t_s"),
        F.lead(t_s).over(w).alias("next_s"),
    ).filter(F.col("next_s").isNotNull())
    dt = F.col("next_s") - F.col("t_s")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(dt).alias("held_s"),
            (
                F.sum((F.col("value") * dt).cast("decimal(25,6)")).cast(
                    "double"
                )
                / F.sum(dt)
            ).alias("twa_value"),
        )
        .filter(F.col("held_s") > 0)
    )


@register(
    "win_match_recognize",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS new_session
      FROM o
    ), sess AS (
      SELECT *, CAST(SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS session_idx
      FROM marked
    ), s AS (
      SELECT user_id, session_idx,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY us, event_id) AS seq
      FROM sess GROUP BY user_id, session_idx
    )
    SELECT user_id, session_idx, seq,
           CAST(length(seq) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS INT)
             AS n_view_to_purchase,
           CASE WHEN regexp_matches(seq, 'v[^p]*p') THEN 1 ELSE 0 END
             AS converted
    FROM s
    """,
)
def win_match_recognize(spark, sf_dir):
    """MATCH_RECOGNIZE-style row-pattern matching (the SQL:2016 feature
    Spark lacks): within each 30-minute session, count non-overlapping
    occurrences of the pattern ``VIEW (not-PURCHASE)* PURCHASE`` — the
    "browse led to a purchase" motif — by folding the session's ordered
    event-type initials into one string and running a regular expression
    over it.  Sequences-as-strings is the standard scale trick for
    row-pattern queries: state per session is its event count, and the
    regex engine does the automaton work.

    Determinism: the fold order is total ((us, event_id) — sort_array on
    (us, event_id, initial) structs == the oracle's ordered string_agg),
    initials are distinct per type, and greedy non-overlapping regex
    counting is identical in Java regex and RE2 for this
    backtracking-free pattern.  Scale: the session id is the
    win_sessionize cascade (one user-key shuffle) and the collect is one
    further (user, session) aggregate whose state is one session's
    events — never a corpus-sized collection."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    marked = ev.select(
        "event_id",
        "user_id",
        F.substring("event_type", 1, 1).alias("i"),
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull()
            | ((us - F.lag(us).over(w)) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = W.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = marked.withColumn(
        "session_idx", F.sum("new_session").over(w2).cast("long")
    )
    seq = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("us"), F.col("event_id"), F.col("i")))
            ),
            lambda c: c["i"],
        ),
        "",
    )
    pat = r"v[^p]*p"
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            "session_idx",
            "seq",
            F.length("seq").cast("int").alias("seq_len"),
            F.regexp_count("seq", F.lit(pat)).cast("int").alias(
                "n_view_to_purchase"
            ),
            F.when(F.col("seq").rlike(pat), 1).otherwise(0).alias("converted"),
        )
    )


@register(
    "win_tumble_tvf",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
           CAST(floor(epoch(ts) / 3600) * 3600 + 3600 AS BIGINT) AS window_end,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def win_tumble_tvf(spark, sf_dir):
    """Tumbling window TABLE-function surface in BATCH: the Flink-style
    TUMBLE(table, 1 hour) relation, expressed through Spark's native
    ``window()`` grouping expression — each row maps to exactly one
    (window_start, window_end) bucket and the aggregate runs per bucket.
    Complements stream_tumbling (same semantics through the streaming
    state store): this is the path a backfill job takes over the SAME
    query definition — window assignment is pure row-local arithmetic, so
    the plan is one hash aggregate, no state store, no watermark.

    100 TB: window assignment adds zero shuffle of its own — the plan's
    two exchanges are the aggregate's window-key exchange plus the
    standard two-phase distinct-user rewrite, both collapsing map-side
    to |windows|-scale rows before the wire.  Window bounds emit as
    epoch seconds (canon: never raw timestamps)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            dsum("value", "sum_value"),
        )
        .select(
            epoch_s("w.start", "window_start"),
            epoch_s("w.end", "window_end"),
            "n_events",
            "n_users",
            "sum_value",
        )
    )


@register(
    "win_hop_tvf",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hb,
             user_id, value
      FROM events
    ), assigned AS (
      SELECT hb AS window_start, user_id, value FROM b
      UNION ALL
      SELECT hb - 3600 AS window_start, user_id, value FROM b
      UNION ALL
      SELECT hb - 7200 AS window_start, user_id, value FROM b
    )
    SELECT window_start, window_start + 10800 AS window_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM assigned GROUP BY 1, 2
    """,
)
def win_hop_tvf(spark, sf_dir):
    """Hopping (sliding) window TABLE-function surface in BATCH:
    HOP(table, slide 1 hour, size 3 hours) — every event belongs to
    exactly size/slide = 3 overlapping windows.  Spark's ``window()``
    with a slide parameter expands each row to its 3 assignments
    (an Expand projection, not a join — plan-asserted), then aggregates;
    the DuckDB oracle makes
    the same expansion explicit with a 3-way shifted-bucket UNION ALL.

    100 TB: the expansion multiplies shuffle input by size/slide — the
    known cost of hopping windows anywhere — but partial aggregation
    collapses each task to |windows| rows before the exchange, so the
    wire cost is output-sized.  A 24× overlap (1-day window sliding
    hourly) is where you switch to the tumble+rollup two-level plan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "3 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select(
            epoch_s("w.start", "window_start"),
            epoch_s("w.end", "window_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "win_session_tvf",
    oracle="""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    ), marked AS (
      SELECT user_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM o
    ), sess AS (
      SELECT user_id, us,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_idx
      FROM marked
    )
    SELECT user_id,
           CAST(min(us) // 1000000 AS BIGINT) AS session_start,
           CAST((max(us) + 1800000000) // 1000000 AS BIGINT) AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_idx
    """,
)
def win_session_tvf(spark, sf_dir):
    """Session window TABLE-function surface in BATCH: Spark's native
    ``session_window(ts, '30 minutes')`` grouping expression — sessions
    close after 30 minutes of silence, the window end is last_event +
    gap (the operator's definition, mirrored in the oracle's
    ``max(us) + gap``).  Complements win_sessionize (manual
    gaps-and-islands assigning per-EVENT session ids): this is the
    native per-SESSION aggregate, the same expression a streaming job
    uses, here on the batch path.

    100 TB: one user-keyed exchange; Spark merges overlapping session
    candidates inside the aggregate (no window-function sort pass over
    the raw stream), and session state per user is bounded by that
    user's activity, never the corpus.  Fixture timestamps are whole
    micros, so epoch-second floors are exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            epoch_s("w.start", "session_start"),
            epoch_s("w.end", "session_end"),
            "n_events",
        )
    )
