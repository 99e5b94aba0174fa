"""Event-analytics operators (post-survey §2.13 additions).

Product-analytics shapes every event pipeline ships alongside funnels and
sessionization (events_funnel / win_sessionize): cohort retention and
statistical anomaly flagging over daily volumes.  Both are pure Catalyst
built-ins, two shuffles each, and both follow the exact-integer-moment
discipline of agg_stddev_exact so the doubles they emit are bit-identical
across engines (SURVEY.md §5.3).

Scale notes (100 TB): both queries aggregate events down to tiny keyed
summaries before any join — cohort retention shuffles once on user_id (the
natural events partitioning key) then once on the ~|weeks|² matrix;
anomaly detection reduces to |event_type| × |days| rows before the
per-type moment join, which is broadcast-sized at any corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..io import hint_if, load_table, table_rows
from ..registry import register


@register(
    "events_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ), sizes AS (
      SELECT cw, count(*) AS cohort_size FROM cohort GROUP BY cw
    )
    SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cw, a.w) // 7 AS INT) AS week_no,
           count(DISTINCT a.user_id) AS n_active,
           CAST(count(DISTINCT a.user_id) AS DOUBLE) / any_value(s.cohort_size)
             AS retention
    FROM active a JOIN cohort c USING (user_id) JOIN sizes s ON c.cw = s.cw
    GROUP BY c.cw, date_diff('day', c.cw, a.w) // 7
    """,
)
def events_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity week, counted
    per week-offset of later activity, with the retained fraction.

    Classic product-analytics query: first a per-user min(ts) (one shuffle on
    user_id), then distinct (user, week) activity, then a count-distinct per
    (cohort, offset) cell.  The retained fraction is n_active / cohort_size —
    a single IEEE division of two exact integers, so it hash-matches without
    rounding.  Week truncation is ISO-Monday in both engines."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    active = ev.select("user_id", F.date_trunc("week", "ts").alias("w")).distinct()
    sizes = cohort.groupBy("cw").agg(F.count("*").alias("cohort_size"))
    return (
        active.join(cohort, "user_id")
        .join(F.broadcast(sizes), "cw")
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cw")) / 7).cast("int").alias("week_no"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            (
                F.countDistinct("user_id").cast("double")
                / F.first("cohort_size")
            ).alias("retention"),
        )
    )


@register(
    "events_anomaly_days",
    oracle="""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS dday, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, count(*) AS n, sum(cnt) AS s,
             CAST(sum(CAST(cnt AS DECIMAL(19,0)) * cnt) AS DOUBLE) AS q
      FROM d GROUP BY event_type
    ), g AS (
      SELECT d.event_type,
             strftime(d.dday, '%Y-%m-%d') AS eday,
             d.cnt,
             CASE WHEN m.n >= 2
                   AND m.n * m.q - CAST(m.s AS DOUBLE) * m.s > 0
                  THEN (d.cnt - CAST(m.s AS DOUBLE) / m.n)
                       / sqrt((m.n * m.q - CAST(m.s AS DOUBLE) * m.s)
                              / (CAST(m.n AS DOUBLE) * (m.n - 1)))
             END AS zscore
      FROM d JOIN m USING (event_type)
    )
    SELECT event_type, eday, cnt, zscore FROM g WHERE zscore > 1.5
    """,
)
def events_anomaly_days(spark, sf_dir):
    """Volume-anomaly days: per event type, flag days whose event count sits
    more than 1.5 sample standard deviations above that type's daily mean.

    Moments stay EXACT through aggregation: the day-count squares promote
    one operand to DECIMAL(19,0) before the multiply (cnt*cnt as BIGINT
    wraps/ANSI-throws past ~3e9 events/day — the ts_autocorr wrap lesson)
    and sum associatively in DECIMAL(38,0), converting to double ONCE
    after the group — a double SUM would be shuffle-order-dependent.
    Mean, variance, and the z-score are then fixed IEEE expression trees
    both engines evaluate identically (no round()).  The z-score is
    a lazily-evaluated CASE guarded on n >= 2 and positive variance: an
    event type with ONE active day or a perfectly flat profile has no
    anomaly signal, and unguarded it is an engine-divergence trap — this
    session runs Spark with ANSI on, where x/0 THROWS, while DuckDB
    yields NULL (probed r10; the guard drops the row identically in
    both).  Plan: daily pre-aggregation (partial+final), then a broadcast
    join of the ~|event_type| moment rows back onto the daily grid — no
    second full shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("dday")
    ).agg(F.count("*").alias("cnt"))
    m = d.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt").cast("decimal(19,0)") * F.col("cnt"))
        .cast("double")
        .alias("q"),
    )
    vnum = F.col("n") * F.col("q") - F.col("s").cast("double") * F.col("s")
    z = F.when(
        (F.col("n") >= 2) & (vnum > 0),
        (F.col("cnt") - F.col("s").cast("double") / F.col("n"))
        / F.sqrt(vnum / (F.col("n").cast("double") * (F.col("n") - 1))),
    )
    return (
        d.join(F.broadcast(m), "event_type")
        .withColumn("zscore", z)
        .filter(F.col("zscore") > 1.5)
        .select(
            "event_type",
            F.date_format("dday", "yyyy-MM-dd").alias("eday"),
            "cnt",
            "zscore",
        )
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH t AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ), c AS (
      SELECT from_type, to_type, count(*) AS n_trans
      FROM t WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ), tot AS (
      SELECT from_type, sum(n_trans) AS n_from FROM c GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n_trans,
           CAST(c.n_trans AS DOUBLE) / tot.n_from AS prob
    FROM c JOIN tot USING (from_type)
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) — the behavioral-model fixture under
    next-event prediction and funnel-drop analysis.

    lead() over (user, ts, event_id) orders each user's timeline with a
    total tie-break; transition counts are exact ints and the row
    probability is one IEEE division, so it hash-matches unrounded.  One
    shuffle on user_id (the window), then a tiny |types|^2 aggregate —
    constant-size state at any event volume."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    # localCheckpoint: c feeds both tot and the output join; without the
    # cut Spark re-runs the corpus window for each branch (no
    # self-referenced subplan sharing) — the same one-scan fix as
    # dq_freshness / rec_sequential_markov.
    c = (
        t.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_trans"))
        .localCheckpoint(eager=False)
    )
    tot = c.groupBy("from_type").agg(F.sum("n_trans").alias("n_from"))
    return (
        c.join(F.broadcast(tot), "from_type")
        .withColumn(
            "prob", F.col("n_trans").cast("double") / F.col("n_from")
        )
        .select("from_type", "to_type", "n_trans", "prob")
    )


@register(
    "agg_pareto_front",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS item,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_partkey
    ), cum AS (
      SELECT item, revenue,
             SUM(CAST(revenue AS DECIMAL(18,4))) OVER (
               ORDER BY revenue DESC, item
               ROWS UNBOUNDED PRECEDING) AS cum_rev,
             SUM(CAST(revenue AS DECIMAL(18,4))) OVER () AS total_rev
      FROM rev
    )
    SELECT item, revenue,
           CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS cum_share
    FROM cum
    WHERE CAST(cum_rev AS DOUBLE) - revenue < 0.8 * CAST(total_rev AS DOUBLE)
    """,
)
def agg_pareto_front(spark, sf_dir):
    """Pareto (ABC) analysis: the smallest set of items covering 80% of
    revenue — rank items by revenue, keep rows until the cumulative share
    crosses the threshold (a row stays if the share BEFORE it is < 0.8).

    Determinism: per-row revenue is an exact DECIMAL(18,4) sum emitted as
    double; the running and grand totals re-enter DECIMAL for the window
    sums (exact, order-free), and shares are single IEEE divisions.  Scale:
    the global-order window runs over the POST-AGGREGATION item table
    (|parts|, not |lineitem|) — at 100 TB that is still millions of rows,
    so the production variant first computes the threshold from the total
    (one scalar) and range-partitions by revenue; the fixture-scale plan
    keeps the single sorted partition."""
    from pyspark.sql import Window as W

    from ..canon import dsum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("item")).agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "revenue",
            scale=4,
        )
    )
    rev_dec = F.col("revenue").cast("decimal(18,4)")
    w_cum = W.orderBy(F.col("revenue").desc(), "item").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = rev.select(
        "item",
        "revenue",
        F.sum(rev_dec).over(w_cum).alias("cum_rev"),
        F.sum(rev_dec).over(w_all).alias("total_rev"),
    )
    return cum.filter(
        F.col("cum_rev").cast("double") - F.col("revenue")
        < 0.8 * F.col("total_rev").cast("double")
    ).select(
        "item",
        "revenue",
        (
            F.col("cum_rev").cast("double") / F.col("total_rev").cast("double")
        ).alias("cum_share"),
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           CAST(floor(value / 50.0) AS BIGINT) * 50.0 AS bucket_lo,
           count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_value_histogram(spark, sf_dir):
    """Fixed-width histogram of event values per type (width 50): the
    distribution-sketch primitive under dashboards and drift monitors.
    floor-bucketing (never round — engines disagree on halfway cases),
    exact decimal mass per bucket.  One partial+final aggregate; bucket
    cardinality is bounded by range/width, independent of row count."""
    from ..canon import dsum

    ev = load_table(spark, sf_dir, "events")
    b = F.floor(F.col("value") / 50.0).cast("long")
    return ev.groupBy(
        "event_type",
        b.alias("bucket"),
        (b * 50.0).alias("bucket_lo"),
    ).agg(F.count("*").alias("cnt"), dsum("value", "sum_value"))


@register(
    "ts_resample_ffill",
    oracle="""
    WITH obs0 AS (
      SELECT user_id, date_trunc('hour', ts) AS h, ts, event_id, value
      FROM events WHERE user_id < 20
    ), last_in_hour AS (
      SELECT user_id, h, value FROM obs0
      QUALIFY row_number() OVER (
        PARTITION BY user_id, h ORDER BY ts DESC, event_id DESC) = 1
    ), bounds AS (
      SELECT user_id, min(h) AS hmin, max(h) AS hmax FROM obs0 GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS g
      FROM bounds
    )
    SELECT g.user_id, CAST(floor(epoch(g.g)) AS BIGINT) AS gsec,
           last_value(l.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.g
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val
    FROM grid g LEFT JOIN last_in_hour l
      ON g.user_id = l.user_id AND g.g = l.h
    """,
)
def ts_resample_ffill(spark, sf_dir):
    """Time-series resampling to a regular 1-hour grid with forward fill —
    the gap-filling primitive under feature stores and monitoring charts
    (sensors/events arrive irregularly; models want a dense grid).

    Shape: last-observation-per-hour via ONE struct-max aggregate (the
    (ts, event_id, value) tuple is totally ordered, so max == latest —
    no window sort over the fact table), per-user hour grid exploded from
    sequence(), left join, then last(ignorenulls) as the carry-forward.
    The filled value is a raw stored double (no arithmetic), so parity is
    exact.  Grid cardinality = users × hours — independent of event
    volume; the only fact-table pass is the hour pre-aggregation."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    obs = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("h"),
        F.struct("ts", "event_id", "value").alias("tev"),
    )
    last_in_hour = obs.groupBy("user_id", "h").agg(
        F.max("tev").getField("value").alias("value")
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("h").alias("hmin"), F.max("h").alias("hmax")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("hmin", "hmax", F.expr("INTERVAL 1 HOUR"))
        ).alias("g"),
    )
    w = W.partitionBy("user_id").orderBy("g").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    from ..canon import epoch_s

    return (
        grid.join(
            last_in_hour,
            (grid.user_id == last_in_hour.user_id) & (grid.g == last_in_hour.h),
            "left",
        )
        .select(grid.user_id, "g", "value")
        .select(
            "user_id",
            epoch_s("g", "gsec"),
            F.last("value", ignorenulls=True).over(w).alias("val"),
        )
        .select("user_id", "gsec", "val")
    )


@register(
    "dq_checks",
    oracle="""
    SELECT 'orderkey_unique' AS check_name,
           CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE) AS metric,
           count(*) = count(DISTINCT o_orderkey) AS passed
    FROM orders
    UNION ALL
    SELECT 'custkey_ref_integrity',
           CAST(count(*) FILTER (c.c_custkey IS NULL) AS DOUBLE),
           count(*) FILTER (c.c_custkey IS NULL) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'quantity_positive',
           CAST(count(*) FILTER (l_quantity IS NULL OR l_quantity <= 0)
                AS DOUBLE),
           count(*) FILTER (l_quantity IS NULL OR l_quantity <= 0) = 0
    FROM lineitem
    UNION ALL
    SELECT 'event_type_domain',
           CAST(count(*) FILTER (event_type NOT IN
                ('click','error','purchase','signup','view')) AS DOUBLE),
           count(*) FILTER (event_type NOT IN
                ('click','error','purchase','signup','view')) = 0
    FROM events
    """,
)
def dq_checks(spark, sf_dir):
    """Data-quality expectations runner: uniqueness, referential
    integrity, domain, and positivity checks, one row per check with the
    violation count and a pass flag — the contract-validation pass every
    ingest pipeline runs before publishing a table.  Each check is one
    aggregate (the referential check a broadcast anti-join count); checks
    union into a single tiny report."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def check(name, df, violations):
        return df.agg(violations.alias("v")).select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("double").alias("metric"),
            (F.col("v") == 0).alias("passed"),
        )

    uniq = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v")
    ).select(
        F.lit("orderkey_unique").alias("check_name"),
        F.col("v").cast("double").alias("metric"),
        (F.col("v") == 0).alias("passed"),
    )
    ref = check(
        "custkey_ref_integrity",
        o.join(
            hint_if(c, table_rows(sf_dir, "customer") * 16),
            o.o_custkey == c.c_custkey,
            "left",
        ),
        F.count(F.when(F.col("c_custkey").isNull(), 1)),
    )
    qty = check(
        "quantity_positive",
        li,
        F.count(
            F.when(F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0), 1)
        ),
    )
    dom = check(
        "event_type_domain",
        ev,
        F.count(
            F.when(
                ~F.col("event_type").isin(
                    "click", "error", "purchase", "signup", "view"
                ),
                1,
            )
        ),
    )
    return uniq.unionByName(ref).unionByName(qty).unionByName(dom)


@register(
    "meta_analyze_stats",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT o_custkey) AS ndv_custkey,
           count(DISTINCT o_orderpriority) AS ndv_priority,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           count(*) - count(o_totalprice) AS n_null_price,
           CAST(floor(epoch(min(o_orderdate))) AS BIGINT) AS min_date_sec,
           CAST(floor(epoch(max(o_orderdate))) AS BIGINT) AS max_date_sec
    FROM orders
    """,
)
def meta_analyze_stats(spark, sf_dir):
    """Catalog statistics collection (the ANALYZE TABLE shape): row count,
    per-column NDV, min/max, null counts in ONE pass — the stats that feed
    CBO join reordering and broadcast decisions.  Exact NDV here (fixture
    scale); the 100 TB path swaps count distinct for HLL sketches
    (agg_approx_distinct) merged map-side, same single-aggregate plan."""
    from ..canon import epoch_s

    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("ndv_custkey"),
        F.countDistinct("o_orderpriority").alias("ndv_priority"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (F.count("*") - F.count("o_totalprice")).alias("n_null_price"),
        epoch_s(F.min("o_orderdate"), "min_date_sec"),
        epoch_s(F.max("o_orderdate"), "max_date_sec"),
    )


@register(
    "events_bot_burst",
    oracle="""
    WITH b AS (
      SELECT user_id,
             count(*) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS burst
      FROM events
    )
    SELECT user_id, max(burst) AS max_burst,
           count(*) FILTER (burst >= 3) AS n_bursty
    FROM b GROUP BY user_id
    HAVING max(burst) >= 3
    """,
)
def events_bot_burst(spark, sf_dir):
    """Burst/bot detection: users whose rolling 1-hour event count ever
    reaches 3, with their peak burst — the rate-limit/abuse screen run
    before events feed training data.  The rolling count is a RANGE frame
    over epoch seconds (time-based, not row-based: simultaneous events
    share a frame), then a per-user max — one shuffle on user_id shared
    by both windows and the aggregate."""
    from pyspark.sql import Window as W

    from ..canon import epoch_s

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch_s("ts"))
        .rangeBetween(-3600, 0)
    )
    b = ev.select("user_id", F.count("*").over(w).alias("burst"))
    return (
        b.groupBy("user_id")
        .agg(
            F.max("burst").alias("max_burst"),
            F.count(F.when(F.col("burst") >= 3, 1)).alias("n_bursty"),
        )
        .filter(F.col("max_burst") >= 3)
    )


@register(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    ), paths AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n FROM paths
    ORDER BY n DESC, path LIMIT 10
    """,
)
def events_top_paths(spark, sf_dir):
    """Top-10 most-travelled 3-event paths across user timelines —
    second-order sequence mining (the funnel-discovery complement to the
    first-order events_transition_matrix).  Two leads over the same
    (user, ts, event_id) window share one shuffle + sort; path counts are
    a tiny |types|^3 aggregate; total order (n DESC, path) before the
    limit rides TakeOrderedAndProject."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@register(
    "win_mom_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month, rev,
           (rev - lag(rev) OVER (ORDER BY month))
             / lag(rev) OVER (ORDER BY month) AS mom_growth
    FROM m
    """,
)
def win_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth: exact decimal monthly sums, then
    lag-based percent change — the period-over-period reporting shape.
    The window is global but runs over |months| rows (post-aggregation),
    so the single-partition sort is microscopic at any fact volume."""
    from pyspark.sql import Window as W

    from ..canon import dsum

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month"
        )
    ).agg(dsum("o_totalprice", "rev"))
    w = W.orderBy("month")
    return m.select(
        "month",
        "rev",
        ((F.col("rev") - F.lag("rev").over(w)) / F.lag("rev").over(w)).alias(
            "mom_growth"
        ),
    )


@register(
    "events_active_users",
    oracle="""
    WITH act AS (
      SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ), days AS (SELECT DISTINCT d FROM act),
    dau AS (SELECT d, count(*) AS dau FROM act GROUP BY d),
    wau AS (
      SELECT days.d, count(DISTINCT a.user_id) AS wau
      FROM days JOIN act a
        ON a.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def events_active_users(spark, sf_dir):
    """Growth metrics: DAU, trailing-7-day WAU, and DAU/WAU stickiness per
    day.  Rolling DISTINCT counts can't ride a window frame (no
    count-distinct-over-range in either engine), so the WAU is a bounded
    7x day-grid expansion join over the DISTINCT (day, user) activity
    table — |days| x avg-DAU rows, independent of raw event volume; the
    day grid broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    # localCheckpoint: act feeds the day grid, DAU and WAU branches; the
    # cut makes this ONE corpus scan + three passes over the small
    # (day, user) activity table instead of three corpus scans
    act = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct().localCheckpoint(eager=False)
    days = act.select("d").distinct()
    dau = act.groupBy("d").agg(F.count("*").alias("dau"))
    a = act.select(F.col("d").alias("ad"), "user_id")
    wau = (
        F.broadcast(days)
        .join(
            a,
            (F.col("ad") >= F.col("d") - F.expr("INTERVAL 6 DAY"))
            & (F.col("ad") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "pipeline_scd2",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), starts AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN prev_type IS NULL OR prev_type != event_type
                  THEN 1 ELSE 0 END AS is_start
      FROM seq
    ), seg AS (
      SELECT user_id, event_type, ts,
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS seg_id
      FROM starts
    ), spans AS (
      SELECT user_id, any_value(event_type) AS state, seg_id,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS valid_from
      FROM seg GROUP BY user_id, seg_id
    )
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from) AS valid_to,
           lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from) IS NULL AS is_current
    FROM spans
    """,
)
def pipeline_scd2(spark, sf_dir):
    """Slowly-Changing-Dimension Type 2 build: compress each user's event
    stream into state spans with [valid_from, valid_to) validity and an
    is_current flag — the dimension-history table every warehouse keeps.
    Gaps-and-islands segmentation (lag + running sum of change marks),
    then span bounds and lead() for the closing timestamp.  One shuffle
    on user_id shared by all three windows; output is |state-changes|
    rows, not |events|."""
    from pyspark.sql import Window as W

    from ..canon import epoch_s

    ev = load_table(spark, sf_dir, "events")
    w_seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w_seq).alias("prev_type"),
    )
    starts = seq.withColumn(
        "is_start",
        F.when(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    # event_id tie-break (repo total-order rule): two events sharing a ts at
    # a segment boundary must segment identically in both engines.
    w_run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    seg = starts.withColumn("seg_id", F.sum("is_start").over(w_run))
    spans = seg.groupBy("user_id", "seg_id").agg(
        F.first("event_type").alias("state"),
        epoch_s(F.min("ts"), "valid_from"),
    )
    w_next = W.partitionBy("user_id").orderBy("valid_from")
    return spans.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w_next).alias("valid_to"),
        F.lead("valid_from").over(w_next).isNull().alias("is_current"),
    )


@register(
    "events_rfm",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    base AS (
      SELECT user_id,
             date_diff('day', date_trunc('day', max(e.ts)),
                       date_trunc('day', any_value(mx.m))) AS recency_days,
             count(*) AS frequency,
             CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM events e CROSS JOIN mx
      WHERE e.event_type = 'purchase'
      GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary,
           ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
           ntile(5) OVER (ORDER BY frequency, user_id) AS f_score,
           ntile(5) OVER (ORDER BY monetary, user_id) AS m_score
    FROM base
    """,
)
def events_rfm(spark, sf_dir):
    """RFM segmentation: per-user Recency (days since last purchase),
    Frequency (purchase count), Monetary (exact decimal spend), each
    quintile-scored with ntile(5) — the classic customer-value
    segmentation.  Unique user_id tie-breaks make every ntile assignment
    deterministic; the three global windows run over the |users|
    aggregate, not events.  Higher score = better (recent/frequent/
    high-spend)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    from ..canon import dsum

    mx = ev.agg(F.max("ts").alias("m"))
    base = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.date_trunc("day", F.first("m")),
                F.date_trunc("day", F.max("ts")),
            ).alias("recency_days"),
            F.count("*").alias("frequency"),
            dsum("value", "monetary"),
        )
    )
    return base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(W.orderBy(F.col("recency_days").desc(), "user_id"))
        .alias("r_score"),
        F.ntile(5).over(W.orderBy("frequency", "user_id")).alias("f_score"),
        F.ntile(5).over(W.orderBy("monetary", "user_id")).alias("m_score"),
    )


@register(
    "events_error_sli",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS dday,
             count(*) AS n_total,
             count(*) FILTER (event_type = 'error') AS n_errors
      FROM events GROUP BY 1
    )
    SELECT strftime(dday, '%Y-%m-%d') AS day, n_total, n_errors,
           CAST(n_errors AS DOUBLE) / n_total AS error_rate,
           CAST(n_errors AS DOUBLE) / n_total > 0.2 AS slo_breach
    FROM d
    """,
)
def events_error_sli(spark, sf_dir):
    """Service-level indicator: daily error rate with an SLO-breach flag
    (error share > 20%) — the monitoring aggregate that pages someone.
    Exact integer counts, one IEEE division, one comparison; a single
    partial+final aggregate whose output is |days| rows at any event
    volume."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("dday")).agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )
    rate = F.col("n_errors").cast("double") / F.col("n_total")
    return d.select(
        F.date_format("dday", "yyyy-MM-dd").alias("day"),
        "n_total",
        "n_errors",
        rate.alias("error_rate"),
        (rate > 0.2).alias("slo_breach"),
    )


@register(
    "ts_interpolate",
    oracle="""
    WITH obs0 AS (
      SELECT user_id, date_trunc('hour', ts) AS h, ts, event_id, value
      FROM events WHERE user_id < 20
    ), last_in_hour AS (
      SELECT user_id, h, value FROM obs0
      QUALIFY row_number() OVER (
        PARTITION BY user_id, h ORDER BY ts DESC, event_id DESC) = 1
    ), bounds AS (
      SELECT user_id, min(h) AS hmin, max(h) AS hmax FROM obs0 GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS g
      FROM bounds
    ), j AS (
      SELECT g.user_id, CAST(floor(epoch(g.g)) AS BIGINT) AS gsec,
             l.value AS v
      FROM grid g LEFT JOIN last_in_hour l
        ON g.user_id = l.user_id AND g.g = l.h
    ), w AS (
      SELECT user_id, gsec, v,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN gsec END IGNORE NULLS)
               OVER wp AS pg,
             first_value(v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN gsec END IGNORE NULLS)
               OVER wn AS ng
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY gsec
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY gsec
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, gsec,
           CASE WHEN pg = ng THEN pv
                WHEN pg IS NOT NULL AND ng IS NOT NULL
                THEN pv + (nv - pv) *
                     (CAST(gsec - pg AS DOUBLE) / CAST(ng - pg AS DOUBLE))
           END AS val_interp
    FROM w
    """,
)
def ts_interpolate(spark, sf_dir):
    """Time-series resampling with LINEAR interpolation — the companion to
    ts_resample_ffill for continuous signals (sensor readings, prices):
    each hourly grid point between two observations gets the straight-line
    value; points outside the observed range stay NULL (strict
    interpolation, no extrapolation).

    Same grid/last-in-hour skeleton as ts_resample_ffill (one struct-max
    pre-aggregation of the fact table — grid cardinality is users × hours,
    independent of event volume).  The bracketing observations come from
    two frames over one sort: last(ignorenulls) over the preceding frame
    and first(ignorenulls) over the following frame — Spark evaluates both
    in a single Window pass per direction, no self-join.  Determinism: gap
    positions are exact BIGINT second differences; the interpolant
    pv + (nv-pv)*(Δ/Δtotal) is the identical expression tree in both
    engines, each step an IEEE correctly-rounded op, so the doubles are
    bit-equal and fully value-hash-checked."""
    from pyspark.sql import Window as W

    from ..canon import epoch_s

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    obs = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("h"),
        F.struct("ts", "event_id", "value").alias("tev"),
    )
    last_in_hour = obs.groupBy("user_id", "h").agg(
        F.max("tev").getField("value").alias("v")
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("h").alias("hmin"), F.max("h").alias("hmax")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("hmin", "hmax", F.expr("INTERVAL 1 HOUR"))
        ).alias("g"),
    )
    j = (
        grid.join(
            last_in_hour,
            (grid.user_id == last_in_hour.user_id) & (grid.g == last_in_hour.h),
            "left",
        )
        .select(grid.user_id, epoch_s("g", "gsec"), "v")
    )
    wp = W.partitionBy("user_id").orderBy("gsec").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wn = W.partitionBy("user_id").orderBy("gsec").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    gs = F.col("gsec")
    marked = j.select(
        "user_id",
        "gsec",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), gs), ignorenulls=True)
        .over(wp)
        .alias("pg"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), gs), ignorenulls=True)
        .over(wn)
        .alias("ng"),
    )
    frac = (gs - F.col("pg")).cast("double") / (
        F.col("ng") - F.col("pg")
    ).cast("double")
    val = F.when(F.col("pg") == F.col("ng"), F.col("pv")).when(
        F.col("pg").isNotNull() & F.col("ng").isNotNull(),
        F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
    )
    return marked.select("user_id", "gsec", val.alias("val_interp"))


@register(
    "win_cumulative_distinct",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events
    ), daily AS (
      SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             count(*) AS n_events,
             CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new_types
      FROM firsts GROUP BY 1, 2
    )
    SELECT user_id, day, n_events, n_new_types,
           CAST(sum(n_new_types) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS distinct_types_todate
    FROM daily
    """,
)
def win_cumulative_distinct(spark, sf_dir):
    """Running distinct count per user over time — 'how many event types has
    this user touched as of each day' — the ingest-monitoring / feature
    primitive SQL windows cannot express directly (COUNT(DISTINCT) over a
    frame is unsupported in both engines).

    The decomposition that IS expressible everywhere: mark each (user,
    type)'s FIRST occurrence with a row_number()=1 window, roll up to
    per-day new-type counts, then a plain running SUM of news — running
    sum of first-occurrences ≡ running distinct count, exactly.  Scale:
    the first-occurrence window shuffles on (user, type) — same key as any
    distinct — the daily rollup is a partial agg, and the running sum
    windows over users × days, not events."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    wf = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    firsts = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.row_number().over(wf).alias("rn"),
    )
    # day as a yyyy-MM-dd STRING (house date discipline): DATE columns
    # render differently on the driver's pandas path (Spark date object
    # '2024-01-01' vs DuckDB datetime64 '2024-01-01 00:00:00')
    daily = firsts.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_new_types"),
    )
    wrun = W.partitionBy("user_id").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return daily.select(
        "user_id",
        "day",
        "n_events",
        "n_new_types",
        F.sum("n_new_types").over(wrun).alias("distinct_types_todate"),
    )


def _ewma_exprs(k: int = 8):
    """Shared construction of the EWMA numerator/denominator term lists.

    Both engines evaluate the SAME left-to-right addition chain over the
    SAME lag columns, so the float result is bit-identical: weights 0.5^j
    are exact binary fractions, the lagged values are integer cents cast
    to double (exact), and IEEE +/* are deterministic per-row ops."""
    num = ["CAST(x0 AS DOUBLE)"]
    den = ["1.0"]
    for j in range(1, k):
        w = 0.5**j
        num.append(f"COALESCE(CAST(x{j} AS DOUBLE), 0.0) * {w!r}")
        den.append(f"(CASE WHEN x{j} IS NULL THEN 0.0 ELSE {w!r} END)")
    return " + ".join(num), " + ".join(den)


@register(
    "ts_ewma",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE user_id < 40
      GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    ), lagged AS (
      SELECT user_id, day, cents AS x0,
             {", ".join(f"lag(cents, {j}) OVER (PARTITION BY user_id ORDER BY day) AS x{j}" for j in range(1, 8))}
      FROM daily
    )
    SELECT user_id, day,
           CAST(x0 AS DOUBLE) / 100.0 AS day_value,
           (({_ewma_exprs()[0]}) / ({_ewma_exprs()[1]})) / 100.0 AS ewma
    FROM lagged
    """,
)
def ts_ewma(spark, sf_dir):
    """Exponentially-weighted moving average (alpha=0.5, 8-term horizon)
    of per-user daily spend — the classic smoother for activity signals.

    A true infinite-horizon EWMA is a sequential recurrence (not
    order-independent), so this uses the standard truncated form: 8
    explicit lags with geometric weights, renormalized over the terms that
    exist.  That keeps it a pure window expression — one shuffle to daily
    grain, one sort per user partition, zero Python — and makes it
    bit-deterministic (see `_ewma_exprs`).  Truncation error is <=0.4% of
    the weight mass (0.5^8).  At 100 TB the state per partition is the
    7-row lag buffer; contrast a recursive implementation, which would
    serialize the whole series through one task."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("user_id") < 40)
        .groupBy("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("day")
    lagged = daily.select(
        "user_id",
        "day",
        F.col("cents").alias("x0"),
        *[F.lag("cents", j).over(w).alias(f"x{j}") for j in range(1, 8)],
    )
    num, den = _ewma_exprs()
    return lagged.select(
        "user_id",
        "day",
        (F.col("x0").cast("double") / 100.0).alias("day_value"),
        (F.expr(f"(({num}) / ({den}))") / 100.0).alias("ewma"),
    )


@register(
    "events_churn",
    oracle="""
    WITH horizon AS (
      SELECT CAST(floor(epoch(MAX(ts))) AS BIGINT) AS t_max FROM events
    ), last_seen AS (
      SELECT user_id,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_ts,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           (t_max - last_ts) // 86400 AS days_inactive,
           CASE WHEN t_max - last_ts > 14 * 86400 THEN 1 ELSE 0 END AS churned
    FROM last_seen CROSS JOIN horizon
    """,
)
def events_churn(spark, sf_dir):
    """Inactivity-based churn flags: days since each user's last event
    relative to the corpus horizon (max ts), churned = silent > 14 days —
    the label-generation pass every retention model starts from.

    One aggregate produces per-user recency, the horizon is a broadcast
    1-row scalar (computed once, not a correlated subquery per row), and
    the day math is exact integer epoch arithmetic — no timezone or
    rounding hazards.  Map-only after the single groupBy at any scale."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.floor(F.col("ts").cast("double")).cast("long")
    horizon = ev.agg(F.max(epoch).alias("t_max"))
    last_seen = ev.groupBy("user_id").agg(
        F.max(epoch).alias("last_ts"), F.count("*").alias("n_events")
    )
    return last_seen.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        "n_events",
        F.expr("(t_max - last_ts) DIV 86400").alias("days_inactive"),
        F.when(F.col("t_max") - F.col("last_ts") > 14 * 86400, 1)
        .otherwise(0)
        .alias("churned"),
    )


@register(
    "events_outlier_mad",
    oracle="""
    WITH r AS (
      SELECT event_id, event_type, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type, value AS med FROM r
      WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
    ), d AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS dev
      FROM events e JOIN med m USING (event_type)
    ), r2 AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY event_type ORDER BY dev, event_id) AS rn2,
             count(*) OVER (PARTITION BY event_type) AS n2
      FROM d
    ), mad AS (
      SELECT event_type, dev AS mad FROM r2
      WHERE rn2 = CAST(floor((n2 + 1) / 2.0) AS BIGINT)
    )
    SELECT d.event_id, d.event_type, d.value, d.med, d.mad
    FROM (SELECT d.*, m2.mad FROM d JOIN mad m2 USING (event_type)) d
    WHERE d.dev > 3 * d.mad
    """,
)
def events_outlier_mad(spark, sf_dir):
    """Robust outlier detection per event type: median + MAD (median
    absolute deviation), flag values with |v - median| > 3*MAD — the
    heavy-tail-safe alternative to z-scores (events_anomaly_days), since
    one whale purchase inflates a mean+stddev gate but moves a median not
    at all.  Medians are the exact lower-median rank element (the
    agg_quantile_disc recipe, event_id tie-break), so both engines pick
    the identical data value and every downstream float op is per-row
    IEEE — hash-stable with no rounding.

    Scale shape: two rank windows partitioned by event_type plus two
    broadcast joins of |types|-row tables back onto the stream — the
    second pass is unavoidable for an exact MAD (it needs the median
    first).  At 100 TB with few types the exact rank sort concentrates on
    |types| reducers: the scale path swaps both medians for
    percentile_approx sketches (the agg_approx_quantile twin), keeping
    this exact form as the oracle-checkable reference."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = W.partitionBy("event_type")
    r = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w.orderBy("value", "event_id")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    med = r.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2.0).cast("long")
    ).select("event_type", F.col("value").alias("med"))
    d = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    r2 = d.withColumn(
        "rn2", F.row_number().over(w.orderBy("dev", "event_id"))
    ).withColumn("n2", F.count("*").over(w))
    mad = r2.filter(
        F.col("rn2") == F.floor((F.col("n2") + 1) / 2.0).cast("long")
    ).select("event_type", F.col("dev").alias("mad"))
    return (
        d.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > 3 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


@register(
    "events_session_attribution",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
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
    ), a AS (
      SELECT event_id, user_id, session_idx, event_type,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id, session_idx ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS first_touch,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id, session_idx ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_touch,
             count(CASE WHEN event_type <> 'purchase'
                        THEN event_type END) OVER (
               PARTITION BY user_id, session_idx ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS n_prior_touches
      FROM sess
    )
    SELECT event_id, user_id, session_idx, first_touch, last_touch,
           n_prior_touches
    FROM a WHERE event_type = 'purchase'
    """,
)
def events_session_attribution(spark, sf_dir):
    """First-touch / last-touch marketing attribution: every purchase is
    credited to the first and the last non-purchase event of ITS OWN
    session that happened strictly before it (plus how many candidate
    touches preceded it) — the standard attribution primitive conversion
    reporting is built on.

    Composition of two proven shapes: the win_sessionize gaps-and-islands
    session id (30-min silence, integer-µs gap math) and
    first/last(ignorenulls) over an UNBOUNDED-to-1-PRECEDING frame.  All
    three attribution columns ride the SAME (user, session) window sort, so
    Catalyst evaluates one Window node for them.  NULL first/last touch is
    meaningful output ("purchase opened the session — nothing to credit").

    Scale: one hash shuffle on user_id for the session window; the
    per-session attribution frame reuses that partitioning (user_id,
    session_idx is a refinement — no second exchange), so the whole query
    is a single-shuffle window cascade over the events stream, state
    bounded by one user's timeline.  Determinism: µs integers and a total
    (us, event_id) order; no floats anywhere."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
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
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    wp = W.partitionBy("user_id", "session_idx").orderBy(
        "us", "event_id"
    ).rowsBetween(W.unboundedPreceding, -1)
    return (
        sess.select(
            "event_id",
            "user_id",
            "session_idx",
            "event_type",
            F.first(touch, ignorenulls=True).over(wp).alias("first_touch"),
            F.last(touch, ignorenulls=True).over(wp).alias("last_touch"),
            F.count(touch).over(wp).alias("n_prior_touches"),
        )
        .filter(F.col("event_type") == "purchase")
        .drop("event_type")
    )


@register(
    "dq_freshness",
    oracle="""
    WITH per AS (
      SELECT event_type AS source, max(epoch_us(ts)) AS last_us,
             count(*) AS n_events
      FROM events GROUP BY event_type
    ), g AS (SELECT max(last_us) AS gmax FROM per)
    SELECT source, last_us // 1000000 AS last_ts_s,
           (gmax - last_us) // 1000000 AS lag_s, n_events,
           CASE WHEN (gmax - last_us) // 1000000 > 3600 THEN 1 ELSE 0 END
             AS is_stale
    FROM per CROSS JOIN g
    """,
)
def dq_freshness(spark, sf_dir):
    """Per-source data-freshness check: for every event source (the fixture's
    event_type plays the source/topic role) the last-seen timestamp, its
    staleness lag against the corpus watermark (the max timestamp across
    ALL sources), and a >1h-stale flag — the monitoring query every
    ingestion pipeline runs before trusting a day's data.

    Scale: one partial-aggregated groupBy down to |sources| rows, then the
    corpus watermark is an aggregate OF THAT tiny table (never a second
    corpus scan — the per-source table is localCheckpointed because Spark
    does not share a self-referenced subplan, so without it the watermark
    branch would re-scan the corpus; plan-asserted one FileScan in
    tests/test_plans.py), broadcast back as a 1-row cross join.
    Determinism: all integer µs math, floor-divided to seconds (DIV,
    exact); the flag is an integer CASE, no floats anywhere."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.col("event_type").alias("source")).agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count("*").alias("n_events"),
    ).localCheckpoint(eager=False)
    g = per.agg(F.max("last_us").alias("gmax"))
    lag_s = F.expr("(gmax - last_us) DIV 1000000")
    return per.crossJoin(F.broadcast(g)).select(
        "source",
        F.expr("last_us DIV 1000000").alias("last_ts_s"),
        lag_s.alias("lag_s"),
        "n_events",
        F.when(lag_s > 3600, 1).otherwise(0).alias("is_stale"),
    )


@register(
    "events_ab_test",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 6)
                  AS BIGINT) % 2 AS arm,
             max(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), conv AS (
      SELECT count(CASE WHEN arm = 0 THEN 1 END) AS n_a,
             count(CASE WHEN arm = 1 THEN 1 END) AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_b
      FROM u
    ), v AS (
      SELECT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 6)
                  AS BIGINT) % 2 AS arm,
             CAST(value AS DECIMAL(18,6)) AS dv
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT count(CASE WHEN arm = 0 THEN 1 END) AS np_a,
             count(CASE WHEN arm = 1 THEN 1 END) AS np_b,
             CAST(SUM(CASE WHEN arm = 0 THEN dv END) AS DOUBLE) AS s_a,
             CAST(SUM(CASE WHEN arm = 1 THEN dv END) AS DOUBLE) AS s_b,
             CAST(SUM(CASE WHEN arm = 0 THEN dv * dv END) AS DOUBLE) AS q_a,
             CAST(SUM(CASE WHEN arm = 1 THEN dv * dv END) AS DOUBLE) AS q_b
      FROM v
    )
    SELECT n_a, n_b, conv_a, conv_b,
           CAST(conv_a AS DOUBLE) / n_a AS rate_a,
           CAST(conv_b AS DOUBLE) / n_b AS rate_b,
           (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)) AS z_conversion,
           s_a / np_a AS mean_value_a,
           s_b / np_b AS mean_value_b,
           (s_b / np_b - s_a / np_a)
             / sqrt(((q_a - s_a * s_a / np_a) / (np_a - 1)) / np_a
                    + ((q_b - s_b * s_b / np_b) / (np_b - 1)) / np_b)
             AS z_welch
    FROM conv CROSS JOIN m
    WHERE n_a > 0 AND n_b > 0 AND np_a > 1 AND np_b > 1
      AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
      AND ((q_a - s_a * s_a / np_a) / (np_a - 1)) / np_a
        + ((q_b - s_b * s_b / np_b) / (np_b - 1)) / np_b > 0
    """,
)
def events_ab_test(spark, sf_dir):
    """A/B experiment readout: users are hash-assigned to two arms
    (md5-parity — the deterministic traffic-split every experimentation
    platform uses), then the report compares conversion (a big-ticket
    purchase, value > 150 — chosen so the fixture rate is ~47%, never the
    degenerate 0/1 that zeroes the pooled variance) via a two-proportion
    z-score, and mean purchase value via a Welch z from exact moments,
    between arms in ONE result row.

    Determinism: arm assignment is the md5 primitive (engine-neutral,
    RNG-free); conversion counts are exact ints; purchase values
    accumulate as DECIMAL(18,6) sums and DECIMAL(38,12) squared sums
    (order-free), and every derived statistic — rates, pooled variance,
    Welch denominator — is a fixed chain of per-row IEEE ops on those
    exact starting points (the agg_stddev_exact recipe), so the z-scores
    hash-match unrounded.  Scale: one user-keyed aggregate (the
    conversion flags), one filtered purchase-value aggregate (map-side
    partials, 2 arms of state), and a 1x1 cross join — nothing after the
    shuffles exceeds two rows."""
    from ..canon import md5_int

    ev = load_table(spark, sf_dir, "events")
    # ONE corpus pass: a single per-user aggregate carries the conversion
    # flag AND the purchase-value moments (decimal partials re-aggregate
    # exactly, so the global sums equal the direct event-level sums
    # bit-for-bit and the unchanged oracle still hash-matches); both
    # report branches then derive from the tiny per-user table.
    dv = F.when(
        F.col("event_type") == "purchase", F.col("value").cast("decimal(18,6)")
    )
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150),
                    1,
                ).otherwise(0)
            ).alias("converted"),
            F.count(dv).alias("np"),
            F.sum(dv).alias("s"),
            F.sum(dv * dv).alias("q"),
        )
        .select(
            (md5_int(F.col("user_id"), 6) % 2).alias("arm"),
            "converted", "np", "s", "q",
        )
        .localCheckpoint(eager=False)
    )
    a0, a1 = F.col("arm") == 0, F.col("arm") == 1
    conv = u.agg(
        F.count(F.when(a0, 1)).alias("n_a"),
        F.count(F.when(a1, 1)).alias("n_b"),
        F.sum(F.when(a0, F.col("converted")).otherwise(0)).cast("long").alias("conv_a"),
        F.sum(F.when(a1, F.col("converted")).otherwise(0)).cast("long").alias("conv_b"),
    )
    m = u.agg(
        F.sum(F.when(a0, F.col("np")).otherwise(0)).alias("np_a"),
        F.sum(F.when(a1, F.col("np")).otherwise(0)).alias("np_b"),
        F.sum(F.when(a0, F.col("s"))).cast("double").alias("s_a"),
        F.sum(F.when(a1, F.col("s"))).cast("double").alias("s_b"),
        F.sum(F.when(a0, F.col("q"))).cast("double").alias("q_a"),
        F.sum(F.when(a1, F.col("q"))).cast("double").alias("q_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    p = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    ma = F.col("s_a") / F.col("np_a")
    mb = F.col("s_b") / F.col("np_b")
    va = (F.col("q_a") - F.col("s_a") * F.col("s_a") / F.col("np_a")) / (
        F.col("np_a") - 1
    )
    vb = (F.col("q_b") - F.col("s_b") * F.col("s_b") / F.col("np_b")) / (
        F.col("np_b") - 1
    )
    # degenerate-corpus guard: an empty arm (n=0 or np<=1) or an all-/
    # never-converting population zeroes a denominator or the pooled
    # variance — under ANSI-on Spark 0-division THROWS while DuckDB
    # yields NULL (probed r10), so a pathological corpus must drop the
    # report row identically in both engines.  The Welch-denominator
    # predicate (the only conjunct that itself divides by np and np-1)
    # sits inside a CASE gated on np>1 for both arms: CASE branches are
    # contractually lazy, so the guard survives any Catalyst conjunct
    # reordering — a bare `np>1 AND va/np+vb/np>0` conjunction would
    # rely on left-to-right short-circuit order, which pushdown/CNF
    # rules are free to permute.  Pinned by the planted zero-purchase
    # corpus in tests/test_r10_planted.py.  The predicate guards the
    # Welch denominator itself: constant purchase values in both arms
    # make q - s^2/np collapse to 0 (or a negative cancellation
    # epsilon), where DuckDB errors on sqrt(<0) while Spark yields NaN.
    welch_den_pos = F.when(
        (F.col("np_a") > 1) & (F.col("np_b") > 1),
        va / F.col("np_a") + vb / F.col("np_b") > 0,
    ).otherwise(F.lit(False))
    return conv.crossJoin(F.broadcast(m)).filter(
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("np_a") > 1)
        & (F.col("np_b") > 1)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b"))
        & welch_den_pos
    ).select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        (
            (rb - ra)
            / F.sqrt(p * (1.0 - p) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
        ).alias("z_conversion"),
        ma.alias("mean_value_a"),
        mb.alias("mean_value_b"),
        ((mb - ma) / F.sqrt(va / F.col("np_a") + vb / F.col("np_b"))).alias(
            "z_welch"
        ),
    )


@register(
    "dq_lang_drift",
    oracle="""
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    b AS (
      SELECT CASE WHEN doc_id * 2 <= m THEN 'early' ELSE 'late' END AS batch,
             lang
      FROM documents CROSS JOIN mx
    ), c AS (
      SELECT lang,
             count(CASE WHEN batch = 'early' THEN 1 END) AS n_early,
             count(CASE WHEN batch = 'late' THEN 1 END) AS n_late
      FROM b GROUP BY lang
    ), t AS (
      SELECT CAST(SUM(n_early) AS BIGINT) AS t_early,
             CAST(SUM(n_late) AS BIGINT) AS t_late
      FROM c
    )
    SELECT lang, n_early, n_late,
           CAST(n_early AS DOUBLE) / t_early AS share_early,
           CAST(n_late AS DOUBLE) / t_late AS share_late,
           abs(CAST(n_early AS DOUBLE) / t_early
               - CAST(n_late AS DOUBLE) / t_late) AS drift
    FROM c CROSS JOIN t
    """,
)
def dq_lang_drift(spark, sf_dir):
    """Language-mix drift between two ingestion batches (the doc_id halves
    stand in for yesterday/today): per language, its share of each batch
    and the absolute share drift — the distribution-shift check a corpus
    pipeline runs before a new crawl batch is allowed to move the training
    mixture (0.5 x sum(drift) is the total-variation distance).

    Scale shape: one tiny max() scalar broadcast onto the scan, one
    partial-aggregated count to |langs| rows, batch totals re-derived from
    THAT table (never a second corpus scan), broadcast back as one row.
    Determinism: exact integer counts; shares and drift are single IEEE
    divisions/subtractions of them (abs of an IEEE difference is exact)."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("m"))
    c = (
        d.crossJoin(F.broadcast(mx))
        .select(
            F.when(F.col("doc_id") * 2 <= F.col("m"), "early")
            .otherwise("late")
            .alias("batch"),
            "lang",
        )
        .groupBy("lang")
        .agg(
            F.count(F.when(F.col("batch") == "early", 1)).alias("n_early"),
            F.count(F.when(F.col("batch") == "late", 1)).alias("n_late"),
        )
        .localCheckpoint(eager=False)
    )
    t = c.agg(
        F.sum("n_early").cast("long").alias("t_early"),
        F.sum("n_late").cast("long").alias("t_late"),
    )
    se = F.col("n_early").cast("double") / F.col("t_early")
    sl = F.col("n_late").cast("double") / F.col("t_late")
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_early",
        "n_late",
        se.alias("share_early"),
        sl.alias("share_late"),
        F.abs(se - sl).alias("drift"),
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow,
             count(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s
      FROM events GROUP BY event_type, CAST(date_part('dow', ts) AS INT)
    ), t AS (
      SELECT event_type,
             CAST(SUM(s) AS DOUBLE) / CAST(SUM(n) AS BIGINT) AS overall_mean
      FROM c GROUP BY event_type
    )
    SELECT c.event_type, c.dow, c.n,
           CAST(c.s AS DOUBLE) / c.n AS dow_mean,
           t.overall_mean,
           (CAST(c.s AS DOUBLE) / c.n) / t.overall_mean AS seasonal_idx
    FROM c JOIN t USING (event_type)
    """,
)
def ts_seasonal_decompose(spark, sf_dir):
    """Multiplicative day-of-week seasonality: per event type, each
    weekday's mean value against the type's overall mean — the seasonal
    index table (idx > 1 = above-trend weekday) that forecasting and
    anomaly baselines divide out before comparing days.

    Determinism: weekday means are the davg recipe (exact DECIMAL(18,6)
    sums, one IEEE division); the overall mean RE-AGGREGATES the same
    decimal partials (exact, order-free) rather than re-scanning, and the
    index is one further IEEE division — a fixed per-row chain, no
    rounding.  Day-of-week is integer calendar math, identical in both
    engines (Spark dayofweek()-1 == DuckDB dow, Sunday=0).  Scale: one
    partial-aggregated groupBy to |types| x 7 rows; the totals derive
    from THAT table and broadcast back — one corpus pass, two tiny
    shuffles."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    ).localCheckpoint(eager=False)  # |types| x 7 rows; totals derive from THIS, not a re-scan
    t = c.groupBy("event_type").agg(
        (F.sum("s").cast("double") / F.sum("n").cast("long")).alias(
            "overall_mean"
        )
    )
    dow_mean = F.col("s").cast("double") / F.col("n")
    return c.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        "n",
        dow_mean.alias("dow_mean"),
        "overall_mean",
        (dow_mean / F.col("overall_mean")).alias("seasonal_idx"),
    )


def markov_removal_effects(counts, channels):
    """Removal-effect attribution on a first-order Markov conversion chain
    (Anderl et al.): given transition counts over states {'START', the
    channels, 'CONV', 'DROP'}, the conversion probability from START is
    the absorbing-chain solve p = (I - Q)^-1 r; channel c's removal
    effect is the relative drop in that probability when c is deleted
    (its mass becomes non-converting), and attribution shares normalize
    the effects.

    Pure function of exact integer counts -> deterministic (the linear
    solve is a fixed small-matrix computation, |channels|+1 unknowns).
    Module-level so the quality gate can drive it on hand-solvable
    chains."""
    import numpy as np

    out_totals = {}
    for (src, _), n in counts.items():
        out_totals[src] = out_totals.get(src, 0) + n

    def conv_prob(excluded=None):
        trans = ["START"] + [c for c in channels if c != excluded]
        idx = {s: i for i, s in enumerate(trans)}
        n = len(trans)
        Q = np.zeros((n, n))
        r = np.zeros(n)
        for (src, dst), cnt in counts.items():
            if src not in idx:
                continue
            p = cnt / out_totals[src]
            if dst == "CONV":
                r[idx[src]] += p
            elif dst in idx:
                Q[idx[src], idx[dst]] += p
            # dst == 'DROP' or the excluded channel: lost mass
        p_all = np.linalg.solve(np.eye(n) - Q, r)
        return float(p_all[idx["START"]])

    p_full = conv_prob()
    effects = {
        c: (p_full - conv_prob(excluded=c)) / p_full if p_full > 0 else 0.0
        for c in channels
    }
    total = sum(effects.values())
    shares = {
        c: (e / total if total > 0 else 0.0) for c, e in effects.items()
    }
    return p_full, effects, shares


@register("rec_markov_attribution")  # rows-only: absorbing-chain solve,
# gates (hand-solvable chains, share axioms, determinism) in test_ml_quality
def rec_markov_attribution(spark, sf_dir):
    """Markov-chain (removal-effect) marketing attribution: sessions become
    channel paths START -> ... -> CONV (first purchase) | DROP (no
    purchase); each non-purchase channel is credited by how much the
    session-level conversion probability falls when that channel is
    removed from the chain — the data-driven alternative to the
    first/last-touch heuristics of events_session_attribution.

    The DISTRIBUTED part reduces the corpus to a |states|^2 transition
    matrix: sessionize (one user-key shuffle), truncate each session at
    its first purchase, lead() pairs plus virtual START/CONV/DROP
    endpoints, count.  Only that channel-cardinality-bounded matrix (at
    most ~6x6 here, never corpus-sized) crosses to the driver for the
    absorbing-chain solve — the same scalar-handoff pattern as
    rec_eval_recall, legitimate at ANY corpus size because its dimensions
    are the channel vocabulary, not the data.  Deterministic: exact
    integer counts -> fixed small solve; partition-invariant (gated)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
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
        "sid", F.sum("new_session").over(w2).cast("long")
    )
    ws = W.partitionBy("user_id", "sid").orderBy("us", "event_id")
    wsf = ws.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = sess.select(
        "user_id",
        "sid",
        "us",
        "event_id",
        F.col("event_type").alias("state"),
        F.row_number().over(ws).alias("rn"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.row_number().over(ws))
        )
        .over(wsf)
        .alias("first_p"),
    ).filter(F.col("first_p").isNull() | (F.col("rn") <= F.col("first_p")))
    stated = ranked.withColumn(
        "state",
        F.when(F.col("state") == "purchase", "CONV").otherwise(F.col("state")),
    )
    pairs = stated.select(
        F.col("state").alias("src"),
        F.coalesce(
            F.lead("state").over(ws),
            F.when(F.col("state") != "CONV", "DROP"),
        ).alias("dst"),
        F.when(F.col("rn") == 1, F.col("state")).alias("first_state"),
    )
    trans = (
        pairs.filter((F.col("src") != "CONV") & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .count()
        .unionByName(
            pairs.filter(F.col("first_state").isNotNull())
            .groupBy(
                F.lit("START").alias("src"),
                F.col("first_state").alias("dst"),
            )
            .count()
        )
    )
    counts = {(r["src"], r["dst"]): r["count"] for r in trans.collect()}
    channels = sorted(
        ({s for s, _ in counts} | {d for _, d in counts})
        - {"START", "CONV", "DROP"}
    )
    p_full, effects, shares = markov_removal_effects(counts, channels)
    return spark.createDataFrame(
        [
            (c, p_full, effects[c], shares[c])
            for c in channels
        ],
        "channel string, p_conversion double, removal_effect double, "
        "attribution_share double",
    )


@register(
    "events_cohort_ltv",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events GROUP BY user_id
    ), ev AS (
      SELECT e.user_id,
             strftime(f.cw, '%Y-%m-%d') AS cohort,
             date_diff('day', f.cw, date_trunc('week', e.ts)) // 7 AS age,
             CASE WHEN e.event_type = 'purchase' THEN e.value END AS pval
      FROM events e JOIN first f USING (user_id)
    )
    SELECT cohort, CAST(age AS INT) AS age,
           count(DISTINCT user_id) AS n_users,
           COALESCE(CAST(SUM(CAST(pval AS DECIMAL(18,2))) AS DOUBLE), 0.0)
             AS revenue
    FROM ev GROUP BY cohort, age
    """,
)
def events_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix: users grouped by first-activity WEEK,
    purchase revenue accumulated per cohort age (weeks since acquisition)
    — the `cohort x age` LTV triangle every growth team reads next to the
    retention matrix (events_retention).  Weekly, not monthly: the
    fixture's event history spans 30 days, so monthly cohorts degenerate
    to a single 1x1 cell (a vacuous check — r10 tiny-result audit); the
    weekly grain yields the real 5-cohort triangle at every fixture SF,
    and the granularity is a constant in the plan either way.

    Determinism: revenue sums through DECIMAL(18,2) (canon dsum rule) and
    empty cells coalesce to 0.0 in both engines; age arithmetic is day
    differences of week-TRUNCATED timestamps (both engines truncate to
    Monday) divided by 7 — exact integers, no months_between semantics
    to reconcile.

    100 TB: one groupBy(user_id) builds the cohort map (events' natural
    key, so AQE sees a co-partitioned join back to events), and the final
    matrix is |weeks|^2/2 cells — broadcast-sized output regardless of
    corpus size."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    joined = ev.join(first, "user_id").select(
        "user_id",
        F.date_format("cw", "yyyy-MM-dd").alias("cohort"),
        (F.datediff(F.date_trunc("week", F.col("ts")), F.col("cw")) / 7)
        .cast("int")
        .alias("age"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pval"),
    )
    return joined.groupBy("cohort", "age").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.coalesce(
            F.sum(F.col("pval").cast("decimal(18,2)")).cast("double"),
            F.lit(0.0),
        ).alias("revenue"),
    )


@register(
    "events_funnel_time",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t0
      GROUP BY e.user_id
    ), d AS (
      SELECT CAST(floor(epoch(p.t1)) AS BIGINT)
             - CAST(floor(epoch(v.t0)) AS BIGINT) AS delta_s
      FROM v JOIN p USING (user_id)
    )
    SELECT count(*) AS n_converted,
           quantile_cont(CAST(delta_s AS DOUBLE), 0.25) AS p25_s,
           quantile_cont(CAST(delta_s AS DOUBLE), 0.50) AS median_s,
           quantile_cont(CAST(delta_s AS DOUBLE), 0.90) AS p90_s
    FROM d
    """,
)
def events_funnel_time(spark, sf_dir):
    """Time-to-convert distribution: seconds from a user's first `view` to
    their first subsequent `purchase`, summarized as exact percentiles —
    the latency companion to the step-count funnel (events_funnel).

    Both aggregation passes key on user_id, so the second groupBy reuses
    the first shuffle's partitioning; deltas are integer epoch seconds cast
    to double BEFORE the percentile so both engines interpolate the same
    inputs (the agg_percentile_cont determinism argument).  Output is one
    row, the per-user intermediate never exceeds |users|."""
    from ..canon import epoch_s

    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    d = v.join(p, "user_id").select(
        (epoch_s("t1") - epoch_s("t0")).cast("double").alias("delta_s")
    )
    return d.agg(
        F.count("*").alias("n_converted"),
        F.expr("percentile(delta_s, 0.25)").alias("p25_s"),
        F.expr("percentile(delta_s, 0.50)").alias("median_s"),
        F.expr("percentile(delta_s, 0.90)").alias("p90_s"),
    )


@register(
    "ts_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY d
    ), w AS (
      SELECT d, v,
        CAST(SUM(v) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
             AS DOUBLE) AS pre_sum,
        count(*) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
          AS pre_n,
        CAST(SUM(v) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)
             AS DOUBLE) AS post_sum,
        count(*) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)
          AS post_n
      FROM daily
    ), scored AS (
      SELECT strftime(d, '%Y-%m-%d') AS day,
             pre_sum / pre_n AS pre_avg,
             post_sum / post_n AS post_avg,
             abs(post_sum / post_n - pre_sum / pre_n) AS shift_score
      FROM w WHERE pre_n = 7 AND post_n = 7
    )
    SELECT day, pre_avg, post_avg, shift_score
    FROM scored ORDER BY shift_score DESC, day LIMIT 5
    """,
)
def ts_changepoint(spark, sf_dir):
    """Mean-shift changepoint detection on the daily revenue series: for
    each day, compare the trailing-7-day average against the 7-day average
    starting that day; the largest |shift| days are the changepoint
    candidates (two-sample CUSUM-style scan, fixed windows).

    Determinism: daily totals stay DECIMAL through the window SUM (exact,
    order-free) and become doubles only in the final one-division averages,
    so both engines score bit-identically.  The global ORDER BY window runs
    over the pre-aggregated day series — |days| rows, bounded by calendar
    length not corpus size, so the single-partition sort is a non-issue at
    any scale (same argument as events_anomaly_days)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v")
    )
    pre = W.orderBy("d").rowsBetween(-7, -1)
    post = W.orderBy("d").rowsBetween(0, 6)
    w = daily.select(
        "d",
        F.sum("v").over(pre).cast("double").alias("pre_sum"),
        F.count("*").over(pre).alias("pre_n"),
        F.sum("v").over(post).cast("double").alias("post_sum"),
        F.count("*").over(post).alias("post_n"),
    ).filter((F.col("pre_n") == 7) & (F.col("post_n") == 7))
    scored = w.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        (F.col("pre_sum") / F.col("pre_n")).alias("pre_avg"),
        (F.col("post_sum") / F.col("post_n")).alias("post_avg"),
        F.abs(
            F.col("post_sum") / F.col("post_n")
            - F.col("pre_sum") / F.col("pre_n")
        ).alias("shift_score"),
    )
    return scored.orderBy(F.col("shift_score").desc(), "day").limit(5)


@register(
    "ts_autocorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
      FROM events GROUP BY d
    ), w AS (
      SELECT xc,
             lag(xc, 1) OVER (ORDER BY d) AS y1,
             lag(xc, 7) OVER (ORDER BY d) AS y7
      FROM daily
    ), p AS (
      SELECT 1 AS lag, xc, y1 AS yc FROM w WHERE y1 IS NOT NULL
      UNION ALL
      SELECT 7 AS lag, xc, y7 AS yc FROM w WHERE y7 IS NOT NULL
    ), s AS (
      SELECT lag, count(*) AS n,
             CAST(SUM(xc) AS DOUBLE) / 100.0 AS sx,
             CAST(SUM(yc) AS DOUBLE) / 100.0 AS sy,
             CAST(SUM(CAST(CAST(xc AS DECIMAL(19,0)) * yc AS DECIMAL(38,0)))
                  AS DOUBLE) / 10000.0 AS sxy,
             CAST(SUM(CAST(CAST(xc AS DECIMAL(19,0)) * xc AS DECIMAL(38,0)))
                  AS DOUBLE) / 10000.0 AS sx2,
             CAST(SUM(CAST(CAST(yc AS DECIMAL(19,0)) * yc AS DECIMAL(38,0)))
                  AS DOUBLE) / 10000.0 AS sy2
      FROM p GROUP BY lag
    )
    SELECT lag, n,
           (sxy - sx * sy / n)
             / sqrt((sx2 - sx * sx / n) * (sy2 - sy * sy / n)) AS autocorr
    FROM s
    WHERE n >= 2 AND (sx2 - sx * sx / n) > 0 AND (sy2 - sy * sy / n) > 0
    """,
)
def ts_autocorr(spark, sf_dir):
    """Lag-1 and lag-7 autocorrelation of the daily revenue series — the
    seasonality diagnostic read before fitting any forecast (lag-7 high ⇒
    weekly cycle; both near zero ⇒ white noise).

    Determinism follows agg_corr exactly: daily totals become exact
    integer cents (DECIMAL sum ×100), all five moments accumulate as
    integer/DECIMAL(38,0) sums — order-free — and doubles appear only in
    the final fixed expression tree.  The cross-products promote one
    operand to DECIMAL(19,0) BEFORE multiplying (both engines), so the
    product itself is computed in decimal — a long×long product would
    silently wrap in non-ANSI Spark once daily cents exceed ~3e9.  The lag windows run on the
    pre-aggregated day series (|days| rows, calendar-bounded), so the
    unpartitioned window is a non-issue; the heavy work is the one daily
    groupBy."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("xc")
    )
    wd = W.orderBy("d")
    w = daily.select(
        "xc",
        F.lag("xc", 1).over(wd).alias("y1"),
        F.lag("xc", 7).over(wd).alias("y7"),
    )
    p = (
        w.filter(F.col("y1").isNotNull())
        .select(F.lit(1).alias("lag"), "xc", F.col("y1").alias("yc"))
        .unionAll(
            w.filter(F.col("y7").isNotNull()).select(
                F.lit(7).alias("lag"), "xc", F.col("y7").alias("yc")
            )
        )
    )
    s = p.groupBy("lag").agg(
        F.count("*").alias("n"),
        (F.sum("xc").cast("double") / 100.0).alias("sx"),
        (F.sum("yc").cast("double") / 100.0).alias("sy"),
        (
            F.sum(
                (F.col("xc").cast("decimal(19,0)") * F.col("yc")).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / 10000.0
        ).alias("sxy"),
        (
            F.sum(
                (F.col("xc").cast("decimal(19,0)") * F.col("xc")).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / 10000.0
        ).alias("sx2"),
        (
            F.sum(
                (F.col("yc").cast("decimal(19,0)") * F.col("yc")).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / 10000.0
        ).alias("sy2"),
    )
    # degenerate-series guard (the agg_corr pattern): a constant daily
    # series zeroes a variance term — Spark 0-division NULL vs DuckDB
    # inf/NaN (and DuckDB sqrt(<0) errors on the cancellation-epsilon
    # side) — so drop such lags identically in both engines
    return s.filter(
        (F.col("n") >= 2)
        & (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n") > 0)
        & (F.col("sy2") - F.col("sy") * F.col("sy") / F.col("n") > 0)
    ).select(
        "lag",
        "n",
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / F.sqrt(
                (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n"))
                * (F.col("sy2") - F.col("sy") * F.col("sy") / F.col("n"))
            )
        ).alias("autocorr"),
    )


@register(
    "events_inter_event_time",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
             - CAST(floor(epoch(lag(ts) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
               AS gap_s
      FROM events
    ), gf AS (SELECT event_type, CAST(gap_s AS DOUBLE) AS gap_s
              FROM g WHERE gap_s IS NOT NULL)
    SELECT event_type, count(*) AS n_gaps,
           quantile_cont(gap_s, 0.5) AS median_gap_s,
           quantile_cont(gap_s, 0.9) AS p90_gap_s,
           CAST(SUM(CAST(gap_s AS DECIMAL(18,0))) AS DOUBLE) / count(*)
             AS avg_gap_s
    FROM gf GROUP BY event_type
    """,
)
def events_inter_event_time(spark, sf_dir):
    """Inter-event arrival-time profile: the seconds since the same user's
    PREVIOUS event (any type), summarized per the later event's type —
    median / p90 / mean gap.  The cadence fingerprint behind session-gap
    tuning (win_sessionize's 1800 s) and bot detection (events_bot_burst):
    this op is where those thresholds come from.

    One user-keyed window shuffle (events' natural key) computes gaps;
    ties on ts break by event_id so the lag is totally ordered; integer-
    second gaps cast to double BEFORE the percentile so both engines
    interpolate identical inputs, and the mean divides one exact decimal
    sum."""
    from pyspark.sql import Window as W

    from ..canon import epoch_s

    ev = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (epoch_s("ts") - epoch_s(F.lag("ts").over(wu))).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    gf = g.select("event_type", F.col("gap_s").cast("double").alias("gap_s"))
    return gf.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.expr("percentile(gap_s, 0.5)").alias("median_gap_s"),
        F.expr("percentile(gap_s, 0.9)").alias("p90_gap_s"),
        (
            F.sum(F.col("gap_s").cast("decimal(18,0)")).cast("double")
            / F.count("*")
        ).alias("avg_gap_s"),
    )


@register(
    "ts_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY d
    ), w AS (
      SELECT d, v,
             max(v) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(v AS DOUBLE) AS revenue,
           CAST(peak AS DOUBLE) AS peak,
           CAST(peak - v AS DOUBLE) / CAST(peak AS DOUBLE) AS drawdown
    FROM w
    ORDER BY drawdown DESC, day LIMIT 5
    """,
)
def ts_drawdown(spark, sf_dir):
    """Maximum-drawdown scan over the daily revenue series: running peak
    (cumulative max) vs the day's value, drawdown = (peak−v)/peak, worst
    five days reported — the stability metric ops dashboards track for
    any cumulative KPI.

    Determinism: daily totals and the running MAX stay DECIMAL (max is
    order-free; the window is a prefix frame over the sorted day series),
    the subtraction is exact decimal, and the single division happens in
    double at the end.  As with ts_changepoint, the unpartitioned window
    runs over the |days|-row pre-aggregate — calendar-bounded at any
    corpus size."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    scored = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("v").cast("double").alias("revenue"),
        F.max("v").over(w).cast("double").alias("peak"),
        (
            (F.max("v").over(w) - F.col("v")).cast("double")
            / F.max("v").over(w).cast("double")
        ).alias("drawdown"),
    )
    return scored.orderBy(F.col("drawdown").desc(), "day").limit(5)


@register(
    "events_hourly_profile",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS n
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT event_type, sum(n) AS total FROM h GROUP BY event_type
    )
    SELECT h.event_type, h.hr, h.n,
           CAST(h.n AS DOUBLE) / t.total AS share
    FROM h JOIN t USING (event_type)
    """,
)
def events_hourly_profile(spark, sf_dir):
    """Hour-of-day activity profile per event type: counts and within-type
    share for each of the 24 hours — the diurnal fingerprint behind
    traffic shaping, anomaly baselines, and bot heuristics (humans have a
    night; scripts don't).

    One count aggregate reduces the corpus to ≤ |types|×24 rows; the
    per-type totals re-aggregate THAT (never the corpus) and join back
    broadcast.  Share is one integer division per output row."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count("*").alias("n"))
    t = h.groupBy("event_type").agg(F.sum("n").alias("total"))
    return h.join(F.broadcast(t), "event_type").select(
        "event_type",
        "hr",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
    )


@register(
    "dq_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), c AS (
      SELECT digit, count(*) AS n FROM d GROUP BY digit
    ), t AS (SELECT sum(n) AS total FROM c),
    e AS (
      SELECT * FROM (VALUES
        (1, 3.0102999566398119e-1), (2, 1.7609125905568124e-1),
        (3, 1.2493873660829993e-1), (4, 9.691001300805642e-2),
        (5, 7.918124604762482e-2), (6, 6.694678963061322e-2),
        (7, 5.799194697768673e-2), (8, 5.115252244738129e-2),
        (9, 4.575749056067514e-2)) AS v(digit, expected)
    )
    SELECT e.digit, coalesce(c.n, 0) AS n,
           CAST(coalesce(c.n, 0) AS DOUBLE) / t.total AS obs_share,
           CAST(e.expected AS DOUBLE) AS exp_share,
           (CAST(coalesce(c.n, 0) AS DOUBLE) / t.total
              - CAST(e.expected AS DOUBLE))
             * (CAST(coalesce(c.n, 0) AS DOUBLE) / t.total
                - CAST(e.expected AS DOUBLE))
             / CAST(e.expected AS DOUBLE) AS chi2_term
    FROM e LEFT JOIN c ON e.digit = c.digit CROSS JOIN t
    """,
)
def dq_benford(spark, sf_dir):
    """Benford's-law first-digit audit on order totals: observed vs
    expected leading-digit shares plus each digit's chi-square
    contribution — the classic fabricated-data / unit-mixing detector for
    financial columns.

    The leading digit comes from the STRING head of floor(value) (both
    engines truncate identically), never from log10 (libm-dependent); the
    nine Benford expectations are shared double literals, so every output
    double is the same fixed expression in both engines.  One
    9-cardinality count aggregate; the scalar total broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    expected = spark.createDataFrame(
        [
            (1, 0.30102999566398119), (2, 0.17609125905568124),
            (3, 0.12493873660829993), (4, 0.09691001300805642),
            (5, 0.07918124604762482), (6, 0.06694678963061322),
            (7, 0.05799194697768673), (8, 0.05115252244738129),
            (9, 0.04575749056067514),
        ],
        "digit int, expected double",
    )
    obs = (F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("total"))
    return (
        expected.join(c, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            obs.alias("obs_share"),
            F.col("expected").alias("exp_share"),
            (
                (obs - F.col("expected"))
                * (obs - F.col("expected"))
                / F.col("expected")
            ).alias("chi2_term"),
        )
    )


@register(
    "ts_seasonal_outliers",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY d
    ), dw AS (
      SELECT d, v, CAST(isodow(d) AS INT) AS dow FROM daily
    ), per_dow AS (
      SELECT dow, sum(v) AS sv, count(*) AS n FROM dw GROUP BY dow
    ), tot AS (
      SELECT sum(v) AS sall, count(*) AS nall FROM dw
    ), scored AS (
      SELECT strftime(dw.d, '%Y-%m-%d') AS day, dw.dow,
             CAST(dw.v AS DOUBLE) AS revenue,
             (CAST(p.sv AS DOUBLE) / p.n)
               / (CAST(t.sall AS DOUBLE) / t.nall) AS dow_index,
             CAST(dw.v AS DOUBLE)
               / ((CAST(t.sall AS DOUBLE) / t.nall)
                  * ((CAST(p.sv AS DOUBLE) / p.n)
                     / (CAST(t.sall AS DOUBLE) / t.nall))) AS resid_ratio
      FROM dw JOIN per_dow p ON dw.dow = p.dow CROSS JOIN tot t
    )
    SELECT day, dow, revenue, dow_index, resid_ratio,
           abs(resid_ratio - 1.0) AS deviation
    FROM scored ORDER BY deviation DESC, day LIMIT 5
    """,
)
def ts_seasonal_outliers(spark, sf_dir):
    """Seasonally-adjusted outlier scan: daily revenue divided by its
    day-of-week multiplicative index (per-dow mean over overall mean), the
    five days whose residual ratio strays furthest from 1.0 — the
    anomaly detector that does NOT page on every weekend (a raw z/MAD scan
    flags the weekly cycle itself; events_outlier_mad is that baseline).

    Day-of-week uses the ISO convention on BOTH sides (DuckDB isodow =
    Spark weekday+1), the index and residual are the same fixed double
    expression tree over exact decimal sums, and everything joins at
    |days| x 7 scale — two tiny aggregates broadcast back onto the
    calendar-bounded day series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v")
    )
    dw = daily.select(
        "d", "v", (F.weekday("d") + 1).cast("int").alias("dow")
    )
    per_dow = dw.groupBy("dow").agg(
        F.sum("v").alias("sv"), F.count("*").alias("n")
    )
    tot = dw.agg(F.sum("v").alias("sall"), F.count("*").alias("nall"))
    overall_mean = F.col("sall").cast("double") / F.col("nall")
    dow_index = (F.col("sv").cast("double") / F.col("n")) / overall_mean
    scored = (
        dw.join(F.broadcast(per_dow), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dow",
            F.col("v").cast("double").alias("revenue"),
            dow_index.alias("dow_index"),
            (F.col("v").cast("double") / (overall_mean * dow_index)).alias(
                "resid_ratio"
            ),
        )
    )
    return (
        scored.withColumn("deviation", F.abs(F.col("resid_ratio") - 1.0))
        .orderBy(F.col("deviation").desc(), "day")
        .limit(5)
    )


@register(
    "pipeline_cdc_apply",
    oracle="""
    WITH ops AS (
      SELECT o_orderkey, 1 AS seq, 'I' AS op, o_totalprice, o_orderstatus
      FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 'U', o_totalprice + 50.0, 'UPDATED'
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % 10 = 1
    ), latest AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY seq DESC
      ) AS rn FROM ops
    )
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def pipeline_cdc_apply(spark, sf_dir):
    """Change-data-capture APPLY: replay an insert/update/delete op log
    into the current table state (last-writer-wins per key, tombstones
    drop the row) — the merge-on-read compaction every CDC-fed lakehouse
    table runs.  The op log is derived deterministically from orders
    (seq 1 = full INSERT snapshot; seq 2 = UPDATE +50.0 on keys %10==0,
    DELETE on %10==1) so the final state is oracle-able; the apply
    itself is fully generic: union the log, rank by (key, seq DESC),
    keep rank 1, filter tombstones.

    100 TB: ONE key-hash exchange (the row_number window) — the same
    shuffle a GROUP BY key would pay; per-key state is the op count for
    that key (bounded by churn, never corpus size), and AQE handles
    hot-key skew in the window sort.  +50.0 is a per-row IEEE add, so
    values are bit-identical across engines (canon.py ident doctrine)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    key = F.col("o_orderkey")
    ins = o.select(
        "o_orderkey",
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        "o_totalprice",
        "o_orderstatus",
    )
    upd = o.filter(key % 10 == 0).select(
        "o_orderkey",
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + F.lit(50.0)).alias("o_totalprice"),
        F.lit("UPDATED").alias("o_orderstatus"),
    )
    dels = o.filter(key % 10 == 1).select(
        "o_orderkey",
        F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("string").alias("o_orderstatus"),
    )
    log = ins.unionByName(upd).unionByName(dels)
    w = W.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


@register(
    "events_concurrency",
    oracle="""
    WITH pts AS (
      SELECT epoch_us(ts) // 86400000000 AS day_idx,
             epoch_us(ts) AS t, 1 AS delta, event_id
      FROM events
      UNION ALL
      SELECT (epoch_us(ts) + 1800000000) // 86400000000,
             epoch_us(ts) + 1800000000, -1, event_id
      FROM events
    ), run AS (
      SELECT day_idx, delta,
             SUM(delta) OVER (
               PARTITION BY day_idx ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS r
      FROM pts
    ), intra AS (
      SELECT day_idx, CAST(max(r) AS BIGINT) AS max_run,
             CAST(count(*) FILTER (delta = 1) AS BIGINT) AS n_starts
      FROM run GROUP BY day_idx
    ), carry AS (
      SELECT epoch_us(ts) // 86400000000 + 1 AS day_idx,
             count(*) AS carry_in
      FROM events
      WHERE epoch_us(ts) + 1800000000
            > (epoch_us(ts) // 86400000000 + 1) * 86400000000
      GROUP BY 1
    )
    SELECT i.day_idx,
           CAST(COALESCE(c.carry_in, 0) AS BIGINT) AS carry_in,
           CAST(COALESCE(c.carry_in, 0) + GREATEST(i.max_run, 0)
                AS BIGINT) AS peak_concurrency,
           i.n_starts
    FROM intra i LEFT JOIN carry c USING (day_idx)
    """,
)
def events_concurrency(spark, sf_dir):
    """Peak-concurrency curve via interval sweep-line: each event opens a
    30-minute activity interval [ts, ts+30m); the per-day PEAK number of
    simultaneously-open intervals is the classic +1/-1 sweep — unpivot to
    boundary points, running-sum in time order, take the max.  A genuinely
    different shape from sessionization (which merges per-USER intervals):
    this counts overlap ACROSS users, the load-curve/capacity question.

    Distributed by day, not a global sort: the running sum partitions on
    day_idx, and intervals crossing midnight are handed to the next day as
    an O(|days|) carry-in aggregate (an interval is ≤30m so it crosses at
    most one boundary; concurrency at any in-day point = carry + in-day
    prefix sum, and the day-start peak candidate is carry itself — hence
    GREATEST(max_run, 0)).  100 TB: two exchanges (day-keyed window +
    day-keyed agg), each collapsing to |days|-scale output; ties break on
    (t, delta, event_id) — ends before starts at the same instant, so the
    half-open interval semantics are exact and the prefix sum is
    deterministic under any partitioning."""
    from pyspark.sql import Window as W

    GAP_US = 1800 * 1_000_000
    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"), "event_id"
    )
    starts = ev.select(
        F.expr(f"us DIV {DAY_US}").alias("day_idx"),
        F.col("us").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    ends = ev.select(
        F.expr(f"(us + {GAP_US}) DIV {DAY_US}").alias("day_idx"),
        (F.col("us") + GAP_US).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = starts.unionByName(ends)
    w = (
        W.partitionBy("day_idx")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    intra = (
        pts.withColumn("r", F.sum("delta").over(w))
        .groupBy("day_idx")
        .agg(
            F.max("r").cast("long").alias("max_run"),
            F.count(F.when(F.col("delta") == 1, 1))
            .cast("long")
            .alias("n_starts"),
        )
    )
    carry = (
        ev.filter(
            F.col("us") + GAP_US
            > (F.expr(f"us DIV {DAY_US}") + 1) * DAY_US
        )
        .groupBy((F.expr(f"us DIV {DAY_US}") + 1).alias("day_idx"))
        .agg(F.count("*").alias("carry_in"))
    )
    joined = intra.join(F.broadcast(carry), "day_idx", "left")
    ci = F.coalesce(F.col("carry_in"), F.lit(0))
    return joined.select(
        "day_idx",
        ci.cast("long").alias("carry_in"),
        (ci + F.greatest(F.col("max_run"), F.lit(0)))
        .cast("long")
        .alias("peak_concurrency"),
        "n_starts",
    )


@register(
    "ts_linear_forecast",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS d,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ), xed AS (
      SELECT event_type,
             d - min(d) OVER (PARTITION BY event_type) AS x, y
      FROM daily
    ), fit AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(max(x) AS BIGINT) AS x_max,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0)) AS sxx
      FROM xed GROUP BY event_type
    ), coef AS (
      SELECT event_type, n_days, x_max,
             CAST(CAST(n_days AS DECIMAL(19,0)) * sxy
                  - CAST(sx AS DECIMAL(19,0)) * sy AS DOUBLE)
             / CAST(CAST(n_days AS DECIMAL(19,0)) * sxx
                    - CAST(sx AS DECIMAL(19,0)) * sx AS DOUBLE) AS slope,
             sx, sy
      FROM fit WHERE n_days >= 2
    ), line AS (
      SELECT event_type, n_days, x_max, slope,
             (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / CAST(n_days AS DOUBLE) AS intercept
      FROM coef
    )
    SELECT event_type, CAST(h AS BIGINT) AS h,
           CAST(x_max + h AS BIGINT) AS x_h,
           intercept + slope * CAST(x_max + h AS DOUBLE) AS yhat,
           slope, n_days
    FROM line, (SELECT unnest(generate_series(1, 7)) AS h)
    """,
)
def ts_linear_forecast(spark, sf_dir):
    """Per-group linear trend forecast: fit OLS (count ~ day index) per
    event type over the daily series, then extrapolate the next 7 days —
    the capacity-planning / volume-projection query, and the repo's first
    FORECASTING op (agg_regression fits but never projects).  Closed-form
    slope from exact integer moments: n·Σxy−ΣxΣy over n·Σxx−(Σx)², every
    product promoted to DECIMAL(19,0) BEFORE multiplying (the ts_autocorr
    wrap lesson — daily counts reach 1e12 at 100 TB and n·Σxy then passes
    2⁶³), cast to DOUBLE only for the one division; identical expression
    order in both engines makes yhat bit-deterministic.

    100 TB: daily rollup is the only data-scale exchange (|types|×|days|
    out); the fit is an O(|types|) aggregate over that, and the 7-step
    horizon is an explode of a literal sequence — no second pass over the
    events."""
    from pyspark.sql import Window as W

    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr(f"unix_micros(ts) DIV {DAY_US}").alias("d")
    ).agg(F.count("*").alias("y"))
    xed = daily.select(
        "event_type",
        (
            F.col("d")
            - F.min("d").over(W.partitionBy("event_type"))
        ).alias("x"),
        "y",
    )
    dx = F.col("x").cast("decimal(19,0)")
    fit = xed.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.max("x").cast("long").alias("x_max"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dx * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dx * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    ).filter(
        # one distinct day makes the slope denominator n·Σxx−(Σx)² zero;
        # Spark double 0/0 yields NULL but DuckDB yields NaN, so drop
        # degenerate groups identically in both engines (no line can be
        # fit through a single point anyway).
        F.col("n_days") >= 2
    )
    dn = F.col("n_days").cast("decimal(19,0)")
    dsx = F.col("sx").cast("decimal(19,0)")
    slope = (dn * F.col("sxy") - dsx * F.col("sy")).cast("double") / (
        dn * F.col("sxx") - dsx * F.col("sx")
    ).cast("double")
    line = fit.select(
        "event_type",
        "n_days",
        "x_max",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n_days").cast("double")
        ).alias("intercept"),
    )
    return line.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h")
    ).select(
        "event_type",
        F.col("h").cast("long").alias("h"),
        (F.col("x_max") + F.col("h")).cast("long").alias("x_h"),
        (
            F.col("intercept")
            + F.col("slope") * (F.col("x_max") + F.col("h")).cast("double")
        ).alias("yhat"),
        "slope",
        "n_days",
    )


@register(
    "dq_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
      FROM orders
    ), b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 1 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 7 = 2 THEN 'R'
                  ELSE o_orderstatus END AS o_orderstatus,
             o_orderpriority
      FROM orders WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus,
             o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 3
    ), diff AS (
      SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.o_totalprice <> b.o_totalprice
                    OR a.o_orderstatus <> b.o_orderstatus
                    OR a.o_orderpriority <> b.o_orderpriority
                  THEN 'changed' ELSE 'same' END AS change_type,
             CASE WHEN a.o_orderkey IS NOT NULL
                   AND b.o_orderkey IS NOT NULL
                   AND a.o_totalprice <> b.o_totalprice
                  THEN 1 ELSE 0 END AS price_chg,
             CASE WHEN a.o_orderkey IS NOT NULL
                   AND b.o_orderkey IS NOT NULL
                   AND a.o_orderstatus <> b.o_orderstatus
                  THEN 1 ELSE 0 END AS status_chg,
             CASE WHEN a.o_orderkey IS NOT NULL
                   AND b.o_orderkey IS NOT NULL
                  THEN b.o_totalprice - a.o_totalprice
                  ELSE 0.0 END AS delta
      FROM a FULL OUTER JOIN b USING (o_orderkey)
    )
    SELECT change_type, count(*) AS n_rows,
           CAST(SUM(price_chg) AS BIGINT) AS n_price_chg,
           CAST(SUM(status_chg) AS BIGINT) AS n_status_chg,
           CAST(SUM(CAST(delta AS DECIMAL(18,2))) AS DOUBLE)
             AS price_delta
    FROM diff GROUP BY change_type
    """,
)
def dq_snapshot_diff(spark, sf_dir):
    """Table-diff audit between two snapshots: full-outer join on the
    primary key classifies every row as added / removed / changed / same
    and accounts per-column change counts plus the exact price drift —
    the data-reconciliation report a lakehouse runs after every backfill
    or migration (snapshot B is a deterministic next-day mutation of
    orders: %7==0 deleted, %7==1 repriced +10.0, %7==2 restatused,
    %7==3 cloned under a new key).

    100 TB: ONE co-partitioned key exchange (the full outer join — both
    sides hash on o_orderkey); the change classification is row-local and
    the report collapses map-side to 4 rows.  With both snapshots
    bucketed by key (the layout a nightly diff would maintain) even that
    exchange disappears — same argument as join_bucketed."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    key = F.col("o_orderkey")
    b = (
        o.filter(key % 7 != 0)
        .select(
            "o_orderkey",
            F.when(key % 7 == 1, F.col("o_totalprice") + 10.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            F.when(key % 7 == 2, F.lit("R"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "o_orderpriority",
        )
        .unionByName(
            o.filter(key % 7 == 3).select(
                (key + 100000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
                "o_orderpriority",
            )
        )
    )
    a = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("pa"),
        F.col("o_orderstatus").alias("sa"),
        F.col("o_orderpriority").alias("ra"),
        # explicit presence flag: row existence must be judged like the
        # oracle judges it (join-key NULL-ness), not by payload NULL-ness
        # — a legitimately NULL o_totalprice would misclassify otherwise
        F.lit(1).alias("in_a"),
    )
    bb = b.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("pb"),
        F.col("o_orderstatus").alias("sb"),
        F.col("o_orderpriority").alias("rb"),
        F.lit(1).alias("in_b"),
    )
    d = a.join(bb, "k", "full_outer").select(
        F.when(F.col("in_a").isNull(), "added")
        .when(F.col("in_b").isNull(), "removed")
        .when(
            (F.col("pa") != F.col("pb"))
            | (F.col("sa") != F.col("sb"))
            | (F.col("ra") != F.col("rb")),
            "changed",
        )
        .otherwise("same")
        .alias("change_type"),
        F.when(
            F.col("in_a").isNotNull()
            & F.col("in_b").isNotNull()
            & (F.col("pa") != F.col("pb")),
            1,
        )
        .otherwise(0)
        .alias("price_chg"),
        F.when(
            F.col("in_a").isNotNull()
            & F.col("in_b").isNotNull()
            & (F.col("sa") != F.col("sb")),
            1,
        )
        .otherwise(0)
        .alias("status_chg"),
        F.when(
            F.col("in_a").isNotNull() & F.col("in_b").isNotNull(),
            F.col("pb") - F.col("pa"),
        )
        .otherwise(F.lit(0.0))
        .alias("delta"),
    )
    from ..canon import dsum

    return d.groupBy("change_type").agg(
        F.count("*").alias("n_rows"),
        F.sum("price_chg").cast("long").alias("n_price_chg"),
        F.sum("status_chg").cast("long").alias("n_status_chg"),
        dsum("delta", "price_delta"),
    )


@register(
    "events_survival_hazard",
    oracle="""
    WITH bounds AS (
      SELECT max(epoch_us(ts)) AS end_us FROM events
    ), u AS (
      SELECT user_id, min(epoch_us(ts)) AS first_us,
             max(epoch_us(ts)) AS last_us
      FROM events GROUP BY user_id
    ), marked AS (
      SELECT (last_us - first_us) // 86400000000 AS day,
             CASE WHEN last_us < end_us - 86400000000
                  THEN 1 ELSE 0 END AS churned
      FROM u, bounds
    ), dy AS (
      SELECT day,
             CAST(SUM(churned) AS BIGINT) AS n_churned,
             CAST(SUM(1 - churned) AS BIGINT) AS n_censored
      FROM marked GROUP BY day
    ), risk AS (
      SELECT day, n_churned, n_censored,
             CAST(SUM(n_churned + n_censored) OVER (
               ORDER BY day DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_at_risk
      FROM dy
    )
    SELECT day, n_at_risk, n_churned, n_censored,
           CAST(n_churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
             AS hazard
    FROM risk
    """,
)
def events_survival_hazard(spark, sf_dir):
    """Discrete-time survival analysis of user lifetimes: the
    life-table / hazard curve — per lifetime-DAY, how many users were
    still at risk, how many churned (last event > 1 day before corpus
    end), how many are right-CENSORED (still active at the cut; their
    lifetimes are lower bounds, the defining subtlety of survival
    analysis that a naive churn histogram gets wrong).  n_at_risk(d) is
    the reverse cumulative count of users whose observed lifetime ≥ d;
    hazard(d) = churned(d) / at_risk(d).  The Kaplan-Meier survival
    curve is the running PRODUCT of (1 − hazard) — deliberately not
    emitted, because cross-engine exp/ln round differently (sqrt is
    IEEE-exact, ln is not); the hazard table is the sufficient
    statistic and each cell is one deterministic double division.

    Daily, not weekly: the fixture's events span 30 days with every user
    active into the final week, so a 7-day churn bar can never fire —
    the r10 tiny-result audit found the weekly table's n_churned/hazard
    columns identically zero (vacuous).  The 1-day bar marks a real
    churned population at every fixture SF (1/17/156 users at
    sf0.001/0.01/0.1) and the grain is a constant in the plan.

    100 TB: one user-keyed exchange to per-user bounds (the natural
    events partitioning), a scalar broadcast for the corpus end, then
    all remaining work is over |days| rows."""
    from pyspark.sql import Window as W

    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"), "user_id"
    )
    bounds = ev.agg(F.max("us").alias("end_us"))
    u = ev.groupBy("user_id").agg(
        F.min("us").alias("first_us"), F.max("us").alias("last_us")
    )
    marked = u.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"(last_us - first_us) DIV {DAY_US}").alias("day"),
        F.when(
            F.col("last_us") < F.col("end_us") - DAY_US, 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    wk = marked.groupBy("day").agg(
        F.sum("churned").cast("long").alias("n_churned"),
        F.sum(1 - F.col("churned")).cast("long").alias("n_censored"),
    )
    w = (
        W.partitionBy()
        .orderBy(F.col("day").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = wk.withColumn(
        "n_at_risk",
        F.sum(F.col("n_churned") + F.col("n_censored")).over(w).cast("long"),
    )
    return risk.select(
        "day",
        "n_at_risk",
        "n_churned",
        "n_censored",
        (
            F.col("n_churned").cast("double")
            / F.col("n_at_risk").cast("double")
        ).alias("hazard"),
    )


@register(
    "ts_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS d, count(*) AS y
      FROM events GROUP BY 1, 2
    ), xed AS (
      SELECT event_type, d,
             d - min(d) OVER (PARTITION BY event_type) AS x, y
      FROM daily
    ), cum AS (
      SELECT event_type, x, y,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) OVER w
                  AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) OVER w
                  AS DECIMAL(38,0)) AS sxx,
             lead(x) OVER (PARTITION BY event_type ORDER BY x) AS x_next,
             lead(y) OVER (PARTITION BY event_type ORDER BY x) AS y_next
      FROM xed
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), fit AS (
      SELECT event_type, n, x_next, y_next,
             CAST(CAST(n AS DECIMAL(19,0)) * sxy
                  - CAST(sx AS DECIMAL(19,0)) * sy AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(19,0)) * sxx
                    - CAST(sx AS DECIMAL(19,0)) * sx AS DOUBLE) AS slope,
             sx, sy
      FROM cum WHERE n >= 5 AND x_next IS NOT NULL
    )
    SELECT event_type, CAST(x_next AS BIGINT) AS x_next,
           (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE)
             + slope * CAST(x_next AS DOUBLE) AS yhat,
           y_next,
           abs((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE)
               + slope * CAST(x_next AS DOUBLE)
               - CAST(y_next AS DOUBLE)) AS abs_err,
           n AS n_train
    FROM fit
    """,
)
def ts_forecast_backtest(spark, sf_dir):
    """Rolling-origin forecast BACKTEST: at every cutoff day t (with ≥5
    training days), fit the OLS trend on days ≤ t ONLY and score the
    one-step-ahead prediction against day t+1's actual — the walk-forward
    evaluation every production forecaster runs (ts_linear_forecast
    projects; this op answers "how good would those projections have
    been").  The whole family of per-cutoff fits costs ONE window pass:
    the prefix moments (n, Σx, Σy, Σxy, Σxx) accumulate in a single
    cumulative frame per type, so cutoff t's model is a row-local closed
    form over that row's running sums — never a per-cutoff re-fit join.
    Products are DECIMAL-promoted before multiplying (ts_autocorr wrap
    lesson); per-row double arithmetic in identical order keeps yhat and
    abs_err bit-identical across engines.

    100 TB: the daily rollup is the only data-scale exchange; the
    backtest is one |types|-keyed window over |types|×|days| rows."""
    from pyspark.sql import Window as W

    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr(f"unix_micros(ts) DIV {DAY_US}").alias("d")
    ).agg(F.count("*").alias("y"))
    xed = daily.select(
        "event_type",
        (F.col("d") - F.min("d").over(W.partitionBy("event_type"))).alias(
            "x"
        ),
        "y",
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wlead = W.partitionBy("event_type").orderBy("x")
    dx = F.col("x").cast("decimal(19,0)")
    cum = xed.select(
        "event_type",
        "x",
        "y",
        F.count("*").over(wcum).cast("long").alias("n"),
        F.sum("x").over(wcum).cast("long").alias("sx"),
        F.sum("y").over(wcum).cast("long").alias("sy"),
        F.sum(dx * F.col("y")).over(wcum).cast("decimal(38,0)").alias("sxy"),
        F.sum(dx * F.col("x")).over(wcum).cast("decimal(38,0)").alias("sxx"),
        F.lead("x").over(wlead).alias("x_next"),
        F.lead("y").over(wlead).alias("y_next"),
    ).filter((F.col("n") >= 5) & F.col("x_next").isNotNull())
    dn = F.col("n").cast("decimal(19,0)")
    dsx = F.col("sx").cast("decimal(19,0)")
    slope = (dn * F.col("sxy") - dsx * F.col("sy")).cast("double") / (
        dn * F.col("sxx") - dsx * F.col("sx")
    ).cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    yhat = intercept + slope * F.col("x_next").cast("double")
    return cum.select(
        "event_type",
        F.col("x_next").cast("long").alias("x_next"),
        yhat.alias("yhat"),
        "y_next",
        F.abs(yhat - F.col("y_next").cast("double")).alias("abs_err"),
        F.col("n").alias("n_train"),
    )
