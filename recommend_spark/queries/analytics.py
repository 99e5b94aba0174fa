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

from ..io import load_table
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
      SELECT event_type, count(*) AS n, sum(cnt) AS s, sum(cnt * cnt) AS q
      FROM d GROUP BY event_type
    )
    SELECT d.event_type,
           strftime(d.dday, '%Y-%m-%d') AS eday,
           d.cnt,
           (d.cnt - CAST(m.s AS DOUBLE) / m.n)
             / sqrt((m.n * m.q - m.s * m.s) / (CAST(m.n AS DOUBLE) * (m.n - 1)))
             AS zscore
    FROM d JOIN m USING (event_type)
    WHERE (d.cnt - CAST(m.s AS DOUBLE) / m.n)
             / sqrt((m.n * m.q - m.s * m.s) / (CAST(m.n AS DOUBLE) * (m.n - 1)))
          > 1.5
    """,
)
def events_anomaly_days(spark, sf_dir):
    """Volume-anomaly days: per event type, flag days whose event count sits
    more than 1.5 sample standard deviations above that type's daily mean.

    The moments (n, Σc, Σc²) are exact BIGINT sums of integer counts — the
    agg_stddev_exact trick — so mean, variance, and the z-score are each one
    correctly-rounded IEEE op from exact integers and hash-match bit-for-bit
    (no round(), per canon.ident's finding).  Plan: daily pre-aggregation
    (partial+final), then a broadcast join of the ~|event_type| moment rows
    back onto the daily grid — no second full shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("dday")
    ).agg(F.count("*").alias("cnt"))
    m = d.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("q"),
    )
    z = (F.col("cnt") - F.col("s").cast("double") / F.col("n")) / F.sqrt(
        (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
        / (F.col("n").cast("double") * (F.col("n") - 1))
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
    c = t.groupBy("from_type", "to_type").agg(F.count("*").alias("n_trans"))
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
