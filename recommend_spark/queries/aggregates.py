"""§2.4 Aggregation.

Reference parity: the reference's signature aggregate is ratings-per-movie
count+mean via ``groupByKey`` + Python reduce (upstream:engine.py §
__count_and_average_ratings + get_counts_and_averages, ~10 LoC) and the
"≥25 ratings" popularity HAVING filter (§ get_top_ratings).  Ours are hash
aggregates with automatic partial (map-side) + final phases — the shape that
scales: at 100 TB a groupBy shuffles only the partial states, not the rows.

Determinism: money SUMs go through DECIMAL (canon.dsum/davg) so partial-agg
ordering can never change the rounded output.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..canon import davg, dsum
from ..io import load_table
from ..registry import register


@register(
    "agg_count_avg",
    oracle="""
    SELECT l_partkey, count(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty
    FROM lineitem GROUP BY l_partkey
    """,
)
def agg_count_avg(spark, sf_dir):
    """Per-key count + mean — the reference's ratings-per-movie aggregate,
    fixture form: quantity per part."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.count("*").alias("cnt"), davg("l_quantity", "avg_qty")
    )


@register(
    "agg_sum_min_max",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           count(*) AS cnt
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_sum_min_max(spark, sf_dir):
    """TPC-H Q1-shaped grouped rollup: sum/min/max/avg/count."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base"),
            dsum(disc_price, "sum_disc_price", scale=4),
            davg("l_extendedprice", "avg_price"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count("*").alias("cnt"),
        )
    )


@register(
    "agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_price,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    """,
)
def agg_global(spark, sf_dir):
    """Grand-total aggregate (no grouping keys) — single-row result."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        dsum("o_totalprice", "total"),
        davg("o_totalprice", "avg_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Exact distinct count per group (expand + two-phase agg in Spark)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
    )


@register("agg_approx_distinct")  # rows-only: HLL++ sketches are engine-specific
def agg_approx_distinct(spark, sf_dir):
    """Approximate distinct (HyperLogLog++) — the 100 TB path for distinct
    counts: fixed-size sketch per group, no expand.  Accuracy asserted in
    tests/test_ml_quality.py against the exact twin (rsd=0.01)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("n_cust_approx")
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_partkey, count(*) AS cnt
    FROM lineitem GROUP BY l_partkey HAVING count(*) >= 25
    """,
)
def agg_having(spark, sf_dir):
    """Post-aggregation filter — the reference's "≥25 ratings" popularity rule."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 25)
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS cnt,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """Hierarchical subtotals with GROUPING() markers — via pre-aggregation
    (same algebra as agg_cube: exact DECIMAL partials re-aggregate
    losslessly, so the 3x Expand runs over the 6-row pre-agg, never the
    corpus)."""
    li = load_table(spark, sf_dir, "lineitem")
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pre_sum"),
        F.count("*").alias("pre_cnt"),
    )
    return pre.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("pre_sum").cast("double").alias("sum_qty"),
        # coalesce: count(*) is 0 (not NULL) on an empty grouping set
        F.coalesce(F.sum("pre_cnt"), F.lit(0)).alias("cnt"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
           count(*) AS cnt,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """All grouping combinations — via pre-aggregation.

    A naive ``df.cube(a, b)`` runs the corpus through Expand at 4x row
    multiplicity before any aggregation.  Because SUM/COUNT re-aggregate
    losslessly (DECIMAL sums are exact and associative), the identical
    result comes from one ordinary |a x b|-cardinality pre-agg followed by
    a cube over THAT — the Expand then touches 6 rows instead of the
    corpus.  At 100 TB this is the difference between shuffling 4x the
    table and shuffling a handful of partial rows; idle A/B at sf0.1:
    1.65 -> 0.66 s min-of-3, results bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("pre_sum"),
        F.count("*").alias("pre_cnt"),
    )
    return pre.cube("l_returnflag", "l_linestatus").agg(
        F.sum("pre_sum").cast("double").alias("sum_base"),
        # coalesce: count(*) is 0 (not NULL) on an empty grouping set
        F.coalesce(F.sum("pre_cnt"), F.lit(0)).alias("cnt"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit grouping sets: per-flag totals + per-status totals in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("rs_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        FROM rs_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
           count(*) AS cnt
    FROM lineitem GROUP BY l_orderkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """Per-key list aggregation in canonical (sorted) order, emitted as a
    joined string so the hash is collection-representation-neutral."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda c: c.cast("string"),
            ),
            ",",
        ).alias("line_numbers"),
        F.count("*").alias("cnt"),
    )


@register(
    "agg_quantile_disc",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
                    THEN l_quantity END) AS median_qty,
           MIN(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                    THEN l_quantity END) AS p90_qty
    FROM r GROUP BY l_returnflag
    """,
)
def agg_quantile_disc(spark, sf_dir):
    """Exact discrete quantiles (lower median, p90) per group, computed as
    "the element at rank r" — no interpolation, so the result is an actual
    data value and hash-matches across engines (continuous quantiles
    interpolate with engine-specific float op order; the scalable sketch
    variant is agg_approx_quantile).

    Scale shape (r13, the agg_weighted_median recipe): the output reports
    only the VALUE at rank r, and the value at rank r is invariant to tie
    order among equal values — so raw rows never need a per-row rank.
    Rows collapse to (group, value, count) through a partial-aggregating
    groupBy (map-side combine), the cumulative-rank window then runs over
    |distinct values| rows per group (l_quantity has ~50), and the
    quantile element is the row whose [cum-count window] covers the
    target rank.  The previous row_number formulation sorted EVERY row
    inside 3 group partitions — 60 M rows through 3 tasks at perturbed
    sf1 (measured 6.4×); this plan's only per-row work is the combine."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("c")
    )
    wg = W.partitionBy("l_returnflag")
    cum = counts.select(
        "l_returnflag",
        "l_quantity",
        F.sum("c").over(wg.orderBy("l_quantity")).alias("hi"),
        (F.sum("c").over(wg.orderBy("l_quantity")) - F.col("c") + 1).alias(
            "lo"
        ),
        F.sum("c").over(wg).alias("n"),
    )
    med = F.floor((F.col("n") + 1) / 2.0).cast("long")
    p90 = F.ceil(0.9 * F.col("n")).cast("long")
    return cum.groupBy("l_returnflag").agg(
        F.min(
            F.when(
                med.between(F.col("lo"), F.col("hi")), F.col("l_quantity")
            )
        ).alias("median_qty"),
        F.min(
            F.when(
                p90.between(F.col("lo"), F.col("hi")), F.col("l_quantity")
            )
        ).alias("p90_qty"),
    )


@register("agg_approx_quantile")  # rows-only: t-digest/KLL sketches are engine-specific
def agg_approx_quantile(spark, sf_dir):
    """Approximate percentiles — the 100 TB quantile path: a fixed-size
    sketch per group (mergeable across partitions, no sort, no expand).
    Accuracy vs the exact twin (agg_quantile_disc) asserted in
    tests/test_ml_quality.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("median_approx"),
        F.percentile_approx("l_quantity", 0.9, 10000).alias("p90_approx"),
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, count(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_quantity
    )
    SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_n
    FROM c
    QUALIFY row_number() OVER (
      PARTITION BY l_returnflag ORDER BY n DESC, l_quantity) = 1
    """,
)
def agg_mode(spark, sf_dir):
    """Per-group mode (most frequent value), smallest-value tie-break.

    Two-level shape that scales: count per (group, value) — map-side
    partial agg does the heavy lifting — then a rank-1 window over the
    tiny distinct-value set.  Never collects values into memory per group."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("mode_n"),
        )
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
             AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
             AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot (long -> wide): per returnflag, quantity totals by linestatus
    as columns.  Explicit pivot values — never let Spark run the extra
    distinct-values job, and the output schema stays fixed (a moving schema
    breaks downstream consumers and the oracle alike).  Decimal-summed for
    order-independent accumulation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return p.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    """,
)
def agg_unpivot(spark, sf_dir):
    """Unpivot / melt (wide -> long): three measure columns into
    (metric, val) rows — the normalization step feeding long-format
    aggregations.  Narrow map, no shuffle: each input row emits 3 rows
    in place."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )


@register(
    "agg_corr",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS xc,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
      FROM lineitem
    ), s AS (
      SELECT l_returnflag, count(*) AS n,
             CAST(SUM(xc) AS DOUBLE) / 100.0 AS sx,
             CAST(SUM(yc) AS DOUBLE) / 100.0 AS sy,
             CAST(SUM(CAST(xc * yc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sxy,
             CAST(SUM(CAST(xc * xc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sx2,
             CAST(SUM(CAST(yc * yc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sy2
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / (n - 1) AS cov_qp,
           ((sxy - sx * sy / n) / (n - 1))
             / sqrt(((sx2 - sx * sx / n) / (n - 1))
                    * ((sy2 - sy * sy / n) / (n - 1))) AS corr_qp
    FROM s
    WHERE n >= 2 AND (sx2 - sx * sx / n) > 0 AND (sy2 - sy * sy / n) > 0
    """,
)
def agg_corr(spark, sf_dir):
    """Sample covariance + Pearson correlation per group, hash-stable.

    Built-in corr()/covar_samp() accumulate doubles in partition order and
    never match across engines; this computes the five moments from exact
    integer-cent sums (order-independent, one double conversion at the
    end) and then applies one fixed float op sequence — same partial-agg
    shuffle shape as any groupBy, bit-identical everywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    # integer cents FIRST (exact), products and sums in integer/decimal
    # space, ONE double conversion at the end: a double->DECIMAL cast of a
    # fractional product rounds halfway cases differently across engines,
    # so fractional values must never touch a decimal cast directly.
    xc = F.round(F.col("l_quantity") * 100).cast("long")
    yc = F.round(F.col("l_extendedprice") * 100).cast("long")
    c = li.select("l_returnflag", xc.alias("xc"), yc.alias("yc"))
    s = c.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (F.sum("xc").cast("double") / 100.0).alias("sx"),
        (F.sum("yc").cast("double") / 100.0).alias("sy"),
        (
            F.sum((F.col("xc") * F.col("yc")).cast("decimal(38,0)")).cast("double")
            / 10000.0
        ).alias("sxy"),
        (
            F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,0)")).cast("double")
            / 10000.0
        ).alias("sx2"),
        (
            F.sum((F.col("yc") * F.col("yc")).cast("decimal(38,0)")).cast("double")
            / 10000.0
        ).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sx2, sy2 = F.col("sxy"), F.col("sx2"), F.col("sy2")
    cov = (sxy - sx * sy / n) / (n - 1)
    varx = (sx2 - sx * sx / n) / (n - 1)
    vary = (sy2 - sy * sy / n) / (n - 1)
    # degenerate-group guard (the ts_linear_forecast lesson generalized):
    # n=1 zeroes the Bessel denominator and a constant column zeroes the
    # sqrt argument — under this session's ANSI-on Spark x/0 THROWS while
    # DuckDB yields NULL (and DuckDB sqrt(<0) errors outright; probed
    # r10), so drop such groups identically in both engines BEFORE the
    # projection computes the divisions (Filter->Project pipelining
    # evaluates the select only on surviving rows).  The comparisons are
    # engine-consistent: the sums are exact and the float expression
    # order is shared.
    return s.filter(
        (n >= 2)
        & (sx2 - sx * sx / n > 0)
        & (sy2 - sy * sy / n > 0)
    ).select(
        "l_returnflag",
        "n",
        cov.alias("cov_qp"),
        (cov / F.sqrt(varx * vary)).alias("corr_qp"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 48 HOURS
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 48 HOURS
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def events_funnel(spark, sf_dir):
    """Conversion-funnel analysis: users who viewed, then clicked within
    48 h of their first view, then purchased within 48 h of that first
    qualifying click — the classic ordered-sequence product-analytics
    operator.  Each stage is an equi-join on user_id with a residual time
    predicate plus a min-aggregate: shuffles on user_id only, stage results
    shrink monotonically, and the per-user event history never needs to be
    collected or sorted whole (contrast sessionize-then-scan approaches)."""
    ev = load_table(spark, sf_dir, "events")
    hours48 = F.expr("INTERVAL 48 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + hours48))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + hours48))
        .select("user_id")
        .distinct()
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


@register(
    "agg_stddev_exact",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS xc
      FROM lineitem
    ), m AS (
      SELECT l_returnflag, count(*) AS n,
             CAST(SUM(xc) AS DOUBLE) / 100.0 AS s1,
             CAST(SUM(CAST(xc * xc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS s2
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (s2 - n * (s1 / n) * (s1 / n)) / (n - 1) AS var_samp,
           sqrt((s2 - n * (s1 / n) * (s1 / n)) / (n - 1)) AS stddev_samp
    FROM m
    WHERE n >= 2 AND (s2 - n * (s1 / n) * (s1 / n)) >= 0
    """,
)
def agg_stddev_exact(spark, sf_dir):
    """Hash-stable per-group variance/stddev: built-in stddev_samp is
    summation-order dependent (Welford partials merge in shuffle order), so
    this computes EXACT integer-cent moments — associative, order-free —
    then derives the statistics with one fixed IEEE expression both engines
    evaluate identically (the agg_corr recipe: one double conversion at the
    end, never a fractional-decimal cast).  Same two-phase hash-agg shuffle
    as any grouped sum — the general recipe for deterministic second-order
    statistics at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    xc = F.round(F.col("l_extendedprice") * 100).cast("long")
    c = li.select("l_returnflag", xc.alias("xc"))
    m = c.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (F.sum("xc").cast("double") / 100.0).alias("s1"),
        (
            F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,0)")).cast("double")
            / 10000.0
        ).alias("s2"),
    )
    num = (
        F.col("s2")
        - F.col("n") * (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
    )
    var = num / (F.col("n") - 1)
    # degenerate-group guard: n=1 zeroes the Bessel denominator; a
    # constant column can leave the numerator at a tiny NEGATIVE epsilon
    # (float cancellation), where DuckDB's sqrt errors while Spark
    # returns NaN.  Both filters evaluate identically in both engines.
    return m.filter((F.col("n") >= 2) & (num >= 0)).select(
        "l_returnflag", "n", var.alias("var_samp"), F.sqrt(var).alias("stddev_samp")
    )


@register(
    "agg_argmax",
    oracle="""
    SELECT o_custkey,
           o_totalprice AS top_price,
           o_orderkey AS top_order
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
    """,
)
def agg_argmax(spark, sf_dir):
    """Arg-max as ONE aggregate: each customer's most expensive order via
    max(struct(price, key)) — struct comparison is lexicographic, so the
    orderkey rides along as both tie-break and payload.  This is the
    shuffle-cheap alternative to the window form the oracle uses (same
    semantics): a partial+final hash aggregate instead of a full partition
    sort — at 100 TB the difference between one combine-enabled shuffle of
    |groups| rows and sorting every row of the fact table."""
    o = load_table(spark, sf_dir, "orders")
    m = F.max(F.struct("o_totalprice", "o_orderkey")).alias("m")
    return (
        o.groupBy("o_custkey")
        .agg(m)
        .select(
            "o_custkey",
            F.col("m.o_totalprice").alias("top_price"),
            F.col("m.o_orderkey").alias("top_order"),
        )
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_total,
           count(*) FILTER (o_totalprice > 150000) AS n_big,
           count(DISTINCT o_custkey) FILTER (o_totalprice > 150000)
             AS n_big_customers,
           CAST(count(*) FILTER (o_totalprice > 150000) AS DOUBLE) / count(*)
             AS big_share,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (o_totalprice > 150000) AS DOUBLE) AS sum_big
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional(spark, sf_dir):
    """Filtered aggregates (SQL FILTER clause semantics): conditional
    counts, conditional count-distinct, a derived share, and a conditional
    exact-decimal sum, all in one partial+final hash aggregate — the
    sum(CASE WHEN) idiom every reporting pipeline leans on, with the same
    single-shuffle plan as an unconditional aggregate."""
    o = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 150000
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(big, 1)).alias("n_big"),
        F.countDistinct(F.when(big, F.col("o_custkey"))).alias(
            "n_big_customers"
        ),
        (F.count(F.when(big, 1)).cast("double") / F.count("*")).alias(
            "big_share"
        ),
        F.sum(F.when(big, F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("double")
        .alias("sum_big"),
    )


@register(
    "agg_string_concat",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_suppliers,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS supplier_csv
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_string_concat(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/string_agg semantics): suppliers
    per nation as one canonical comma-joined string.  Spelled as
    concat_ws over a SORTED collect_list — collection order is partition-
    dependent in Spark, so the sort is what makes the result deterministic
    (same rule as agg_collect_sorted, §5.3 #5)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.concat_ws(",", F.sort_array(F.collect_list("s_name"))).alias(
                "supplier_csv"
            ),
        )
    )


@register(
    "agg_percentile_cont",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5)  AS median,
           quantile_cont(l_extendedprice, 0.9)  AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_cont(spark, sf_dir):
    """Interpolated (continuous) percentiles per group — PERCENTILE_CONT
    semantics.  Verified bit-identical across engines: both interpolate
    (1-d)*lo + d*hi on the sorted values, and the inputs are raw stored
    doubles, so no accumulation-order hazard exists (unlike SUM/STDDEV).
    Complements agg_quantile_disc (rank-element form) and
    agg_approx_quantile (sketch form — the 100 TB path; exact percentile
    sorts each group).

    All three fractions come from ONE percentile(…, array(…)) aggregate —
    a single per-group value buffer instead of three (idle A/B at sf0.1:
    2.53 -> 1.19 s min-of-3, bit-identical); the intermediate array is
    projected to scalars before output, so the no-array canon rule holds."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D))"
            ).alias("ps")
        )
        .select(
            "l_returnflag",
            F.col("ps").getItem(0).alias("p25"),
            F.col("ps").getItem(1).alias("median"),
            F.col("ps").getItem(2).alias("p90"),
        )
    )


@register(
    "agg_skew_kurt_exact",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                  AS DECIMAL(38,0)) AS xc
      FROM lineitem
    ), m AS (
      SELECT l_returnflag, count(*) AS n,
             CAST(SUM(xc) AS DOUBLE) AS s1,
             CAST(SUM(xc * xc) AS DOUBLE) AS s2,
             CAST(SUM(xc * xc * xc) AS DOUBLE) AS s3,
             CAST(SUM(xc * xc * xc * xc) AS DOUBLE) AS s4
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / pow(s2 / n - (s1 / n) * (s1 / n), 1.5) AS skew_pop,
           (s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / pow(s2 / n - (s1 / n) * (s1 / n), 2.0) - 3 AS kurt_excess
    FROM m
    WHERE s2 / n - (s1 / n) * (s1 / n) > 0
    """,
)
def agg_skew_kurt_exact(spark, sf_dir):
    """Hash-stable skewness and excess kurtosis: the agg_stddev_exact
    recipe extended to 3rd/4th moments.  Built-in skewness/kurtosis merge
    central-moment partials in shuffle order (nondeterministic doubles);
    here the four raw power sums accumulate EXACTLY in DECIMAL(38,0)
    (cents^4 at 600k rows peaks ~6e33, inside 38 digits), and the
    statistics derive from one fixed IEEE expression both engines evaluate
    identically.  Same single partial+final aggregate shuffle — the
    deterministic-statistics recipe generalizes to any polynomial moment
    that fits the decimal width."""
    li = load_table(spark, sf_dir, "lineitem")
    xc = F.round(F.col("l_extendedprice") * 100).cast("long").cast("decimal(38,0)")
    m = li.select("l_returnflag", xc.alias("xc")).groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("xc").cast("double").alias("s1"),
        F.sum(F.expr("xc * xc")).cast("double").alias("s2"),
        F.sum(F.expr("xc * xc * xc")).cast("double").alias("s3"),
        F.sum(F.expr("xc * xc * xc * xc")).cast("double").alias("s4"),
    )
    # degenerate-group guard: a constant group zeroes the population
    # variance (or leaves it at a float-cancellation epsilon whose
    # negative side makes pow(x, 1.5) NaN) — filter identically in both
    # engines before dividing
    return m.filter(F.expr("s2 / n - (s1 / n) * (s1 / n) > 0")).select(
        "l_returnflag",
        "n",
        F.expr(
            "(s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))"
            " / pow(s2 / n - (s1 / n) * (s1 / n), 1.5)"
        ).alias("skew_pop"),
        F.expr(
            "(s4 / n - 4 * (s1 / n) * (s3 / n)"
            " + 6 * (s1 / n) * (s1 / n) * (s2 / n)"
            " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))"
            " / pow(s2 / n - (s1 / n) * (s1 / n), 2.0) - 3"
        ).alias("kurt_excess"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    WITH b AS (
      SELECT event_type,
             user_id // 32 AS bucket,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bm
      FROM events
      GROUP BY event_type, user_id // 32
    )
    SELECT event_type, CAST(SUM(bit_count(bm)) AS BIGINT) AS n_users
    FROM b GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """Exact COUNT(DISTINCT) via distributed bitmaps — the 100 TB
    count-distinct path when the key domain is dense integers.

    Each (event_type, id/32) bucket folds its members into one 32-bit mask
    with ``bit_or`` (idempotent — no pre-distinct pass needed); popcounts
    then sum per group.  Two cheap aggregates replace the expanding
    ``COUNT(DISTINCT)`` shuffle of the raw key stream: state per group is
    |domain|/32 longs, partial-aggregated map-side, and the merge is a
    bitwise OR — associative, commutative, constant-size.  This is the
    roaring-bitmap recipe (ClickHouse groupBitmap, Druid) in pure SQL;
    32-bit words keep the shifted mask inside a signed BIGINT in both
    engines.  Verified exactly equal to `agg_count_distinct`'s semantics
    by the shared oracle tables."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", (F.col("user_id") / 32).cast("long").alias("bucket")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT)))"
        ).alias("bm")
    )
    return b.groupBy("event_type").agg(
        F.sum(F.bit_count("bm")).cast("long").alias("n_users")
    )


def _cms_bucket(i: int, key: str):
    """Row-i count-min bucket: first 8 md5 hex digits of 'i|key' mod 256.

    Engine-neutral (md5 is md5 everywhere) so the sketch — not just the
    answer — is bit-identical between Spark and the DuckDB oracle."""
    from ..canon import md5_int

    return md5_int(F.concat_ws("|", F.lit(str(i)), F.col(key).cast("string")), 8) % 256


def _cms_bucket_sql(i: int, key: str) -> str:
    from ..canon import sql_md5_int

    salted = f"'{i}' || '|' || CAST({key} AS VARCHAR)"
    return f"{sql_md5_int(salted, 8)} % 256"


@register(
    "agg_count_min",
    oracle=f"""
    WITH cells AS (
      SELECT r, b, COUNT(*) AS c FROM (
        SELECT 0 AS r, {_cms_bucket_sql(0, 'o_custkey')} AS b FROM orders
        UNION ALL
        SELECT 1 AS r, {_cms_bucket_sql(1, 'o_custkey')} AS b FROM orders
        UNION ALL
        SELECT 2 AS r, {_cms_bucket_sql(2, 'o_custkey')} AS b FROM orders
      ) GROUP BY r, b
    ), probe AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_custkey <= 25
    ), probe_cells AS (
      SELECT custkey, 0 AS r, {_cms_bucket_sql(0, 'custkey')} AS b FROM probe
      UNION ALL
      SELECT custkey, 1 AS r, {_cms_bucket_sql(1, 'custkey')} AS b FROM probe
      UNION ALL
      SELECT custkey, 2 AS r, {_cms_bucket_sql(2, 'custkey')} AS b FROM probe
    ), est AS (
      SELECT custkey, MIN(c) AS est_orders
      FROM probe_cells JOIN cells USING (r, b)
      GROUP BY custkey
    ), exact AS (
      SELECT o_custkey AS custkey, COUNT(*) AS true_orders
      FROM orders WHERE o_custkey <= 25 GROUP BY o_custkey
    )
    SELECT custkey, est_orders, true_orders
    FROM est JOIN exact USING (custkey)
    """,
)
def agg_count_min(spark, sf_dir):
    """Count-min sketch frequency estimation (depth 3 × width 256), fully
    deterministic and oracle-checked — the sketch itself is reproduced
    bit-for-bit by DuckDB because the hash rows are md5-derived.

    Build: one pass over orders explodes each row into 3 (row, bucket)
    cells and counts — a partial-aggregated groupBy whose state is AT MOST
    768 cells regardless of input size (the whole point at 100 TB: fixed
    memory, mergeable by addition, no per-key state).  Estimate: probe
    keys hash into the same cells; min over the 3 rows bounds the true
    count from above (overestimates only on collisions).  Output carries
    the exact count next to the estimate so the oracle also certifies the
    CMS guarantee est >= true on every probe."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.select(
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r"), "o_custkey"
        )
        .select(
            "r",
            F.when(F.col("r") == 0, _cms_bucket(0, "o_custkey"))
            .when(F.col("r") == 1, _cms_bucket(1, "o_custkey"))
            .otherwise(_cms_bucket(2, "o_custkey"))
            .alias("b"),
        )
        .groupBy("r", "b")
        .agg(F.count("*").alias("c"))
    )
    probe = (
        o.filter(F.col("o_custkey") <= 25)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    probe_cells = probe.select(
        "custkey", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r")
    ).select(
        "custkey",
        "r",
        F.when(F.col("r") == 0, _cms_bucket(0, "custkey"))
        .when(F.col("r") == 1, _cms_bucket(1, "custkey"))
        .otherwise(_cms_bucket(2, "custkey"))
        .alias("b"),
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["r", "b"])
        .groupBy("custkey")
        .agg(F.min("c").alias("est_orders"))
    )
    exact = (
        o.filter(F.col("o_custkey") <= 25)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("true_orders"))
    )
    return est.join(exact, "custkey")


@register(
    "agg_regression",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS xc,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
      FROM lineitem
    ), s AS (
      SELECT l_returnflag, count(*) AS n,
             CAST(SUM(xc) AS DOUBLE) / 100.0 AS sx,
             CAST(SUM(yc) AS DOUBLE) / 100.0 AS sy,
             CAST(SUM(CAST(xc * yc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sxy,
             CAST(SUM(CAST(xc * xc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sx2,
             CAST(SUM(CAST(yc * yc AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sy2
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / (sx2 - sx * sx / n) AS slope,
           sy / n - (sxy - sx * sy / n) / (sx2 - sx * sx / n) * (sx / n) AS intercept,
           ((sxy - sx * sy / n) * (sxy - sx * sy / n))
             / ((sx2 - sx * sx / n) * (sy2 - sy * sy / n)) AS r2
    FROM s
    WHERE (sx2 - sx * sx / n) > 0 AND (sy2 - sy * sy / n) > 0
    """,
)
def agg_regression(spark, sf_dir):
    """Per-group OLS (price ~ quantity): slope / intercept / R² —
    `REGR_SLOPE` / `REGR_INTERCEPT` / `REGR_R2` semantics, hash-stable.

    The built-in regr_* aggregates accumulate double moments in partition
    order and never hash-match across engines; like `agg_corr`, the five
    sufficient statistics come from EXACT integer-cent sums (one decimal
    cast, order-independent) and the regression coefficients are one fixed
    IEEE expression.  Same one-shuffle partial+final aggregate shape at
    any scale; adding features generalizes this to the X'X normal-equation
    accumulation `mm_embed_pca` uses."""
    li = load_table(spark, sf_dir, "lineitem")
    xc = F.round(F.col("l_quantity") * 100).cast("long")
    yc = F.round(F.col("l_extendedprice") * 100).cast("long")
    c = li.select("l_returnflag", xc.alias("xc"), yc.alias("yc"))
    s = c.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (F.sum("xc").cast("double") / 100.0).alias("sx"),
        (F.sum("yc").cast("double") / 100.0).alias("sy"),
        (
            F.sum((F.col("xc") * F.col("yc")).cast("decimal(38,0)")).cast("double")
            / 10000.0
        ).alias("sxy"),
        (
            F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,0)")).cast("double")
            / 10000.0
        ).alias("sx2"),
        (
            F.sum((F.col("yc") * F.col("yc")).cast("decimal(38,0)")).cast("double")
            / 10000.0
        ).alias("sy2"),
    )
    # degenerate-group guard (shared with ts_linear_forecast / agg_corr):
    # constant x zeroes the slope denominator, constant y zeroes r2's —
    # under ANSI-on Spark 0-division THROWS while DuckDB yields NULL
    # (probed r10), so drop such groups BEFORE the projection divides,
    # with the identical expression in both engines
    return s.filter(
        F.expr("(sx2 - sx * sx / n) > 0 AND (sy2 - sy * sy / n) > 0")
    ).select(
        "l_returnflag",
        "n",
        F.expr("(sxy - sx * sy / n) / (sx2 - sx * sx / n)").alias("slope"),
        F.expr(
            "sy / n - (sxy - sx * sy / n) / (sx2 - sx * sx / n) * (sx / n)"
        ).alias("intercept"),
        F.expr(
            "((sxy - sx * sy / n) * (sxy - sx * sy / n))"
            " / ((sx2 - sx * sx / n) * (sy2 - sy * sy / n))"
        ).alias("r2"),
    )


@register("agg_hll_sketch")  # rows-only: sketch binaries are engine-specific
def agg_hll_sketch(spark, sf_dir):
    """HyperLogLog sketches as MERGEABLE aggregate state — per-group
    distinct-user sketches plus their union, via Spark's Apache
    DataSketches integration (hll_sketch_agg / hll_union_agg, 3.5+).

    `agg_approx_distinct` already covers one-shot estimation; what THIS op
    pins down is re-aggregatability, the property 100 TB rollups live on:
    store one small sketch per (event_type) — or per day, per tenant — and
    answer any coarser distinct-count by UNIONING sketches, never
    re-reading raw data.  That union is exactly the partial-merge Spark
    runs map-side, so sketch state flows through the normal two-phase
    aggregate; the `__all__` row here is computed FROM the per-type
    sketches, proving the merge path.  Deterministic (the sketch hash is
    seeded constant), accuracy-gated vs exact counts in
    tests/test_ml_quality.py."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).localCheckpoint(eager=False)  # consumed twice: per-type rows + the union row
    typed = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_users")
    )
    total = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("est_users"),
    )
    return typed.unionByName(total).orderBy("event_type")


@register(
    "agg_weighted_avg",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS qc,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(SUM(CAST(qc * pc AS DECIMAL(38,0))) AS DOUBLE)
             / (100.0 * CAST(SUM(qc) AS DOUBLE)) AS wavg_price,
           CAST(SUM(pc) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_price
    FROM c GROUP BY l_returnflag
    HAVING SUM(qc) <> 0
    """,
)
def agg_weighted_avg(spark, sf_dir):
    """Quantity-weighted mean price per group next to the plain mean —
    the weighted-statistics surface (`SUM(w*x)/SUM(w)`) that shows up in
    every revenue-per-unit / blended-rate metric.

    Hash-stable by the house recipe: both sums accumulate EXACT integer
    cents (the cross product in DECIMAL(38,0) — max ~6e17 per row, no
    overflow at any corpus size within decimal width), ONE double
    conversion and ONE division each at the end.  Same single
    partial+final aggregate shuffle as any groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    c = li.select("l_returnflag", qc.alias("qc"), pc.alias("pc"))
    # degenerate-group guard: an all-zero-weight group zeroes SUM(w) —
    # Spark x/0 is NULL, DuckDB is inf/NaN — so such groups drop
    # identically in both engines (the sum is exact integer cents, the
    # comparison engine-consistent)
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.sum("qc").alias("sqc"),
            (
                F.sum((F.col("qc") * F.col("pc")).cast("decimal(38,0)"))
                .cast("double")
                / (100.0 * F.sum("qc").cast("double"))
            ).alias("wavg_price"),
            (F.sum("pc").cast("double") / (100.0 * F.count("*"))).alias(
                "avg_price"
            ),
        )
        .filter(F.col("sqc") != 0)
        .drop("sqc")
    )


def mg_summaries(df, key_col: str, k: int):
    """Per-Arrow-batch Misra-Gries (space-saving) compression of a key
    stream to at most ``k`` counters, as a DataFrame of partial summaries.

    Each batch's exact counts are compressed by subtracting the (k+1)-th
    largest count from everything and keeping the positive survivors — the
    batch-form of Misra-Gries: for every key, 0 <= true_batch - emitted
    <= dec, where ``dec`` is the subtracted value.  One sentinel row
    (key = -1) per batch carries ``dec`` so the undercount bound is
    mergeable by plain SUM: after summing counters per key and summing the
    sentinels, est <= true <= est + err_ub holds for EVERY key (absent
    keys have est 0, so a key with true count > err_ub is guaranteed
    present).  Vectorized (pandas value_counts, no Python per-row loop);
    the summaries DataFrame is O(k x batches) rows regardless of corpus
    size.  Exposed module-level so tests can drive it on skewed synthetic
    streams."""
    import pandas as pd

    def mg(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vc = pdf[key_col].value_counts()
            dec = 0
            if len(vc) > k:
                dec = int(vc.iloc[k])
                vc = (vc.iloc[:k] - dec)
                vc = vc[vc > 0]
            out = pd.DataFrame(
                {"key": vc.index.astype("int64"), "cnt": vc.values.astype("int64")}
            )
            yield pd.concat(
                [out, pd.DataFrame({"key": [-1], "cnt": [dec]})],
                ignore_index=True,
            )

    return df.select(F.col(key_col).cast("long").alias(key_col)).mapInPandas(
        mg, "key long, cnt long"
    )


@register("agg_heavy_hitters")  # rows-only: estimates depend on batch
# boundaries (bounds gated in tests/test_ml_quality.py)
def agg_heavy_hitters(spark, sf_dir):
    """Misra-Gries / space-saving heavy hitters: the top-20 most-ordered
    parts with GUARANTEED count bounds from one bounded-memory pass —
    est_min <= true <= est_min + err_ub — the sketch that finds hot keys
    without a full groupBy when the key domain is huge (the exact twin at
    fixture scale is a plain count; the gate in tests/test_ml_quality.py
    checks both bounds against it, and that no key with true count >
    err_ub can be missed by the counter set).

    Rows-only BY NATURE (not an oracle gap): the per-key estimates depend
    on Arrow batch boundaries, so unlike every SQL-checked operator this
    one is deliberately NOT partition-invariant — the invariant it does
    keep (and the test pins) is the error bound, which holds for any
    batching.  Scale: each task compresses its stream to <= k counters
    vectorized in Arrow batches (no per-row Python), the merge is an
    ordinary SUM shuffle of O(k x tasks) rows, and the top-20 is a
    TakeOrdered over that — the corpus is touched exactly once, with
    O(k) memory per task; err_ub quantifies the information lost, and
    shrinks as batches grow (bigger batch -> fewer compressions)."""
    li = load_table(spark, sf_dir, "lineitem")
    summ = mg_summaries(li, "l_partkey", 49)
    merged = summ.groupBy("key").agg(F.sum("cnt").alias("est_min"))
    err = merged.filter(F.col("key") == -1).select(
        F.col("est_min").alias("err_ub")
    )
    return (
        merged.filter(F.col("key") != -1)
        .crossJoin(F.broadcast(err))
        .orderBy(F.col("est_min").desc(), "key")
        .limit(20)
        .select(F.col("key").alias("item"), "est_min", "err_ub")
    )


@register(
    "agg_quantile_binned",
    oracle="""
    WITH hist AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS bin,
             count(*) AS c
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, bin, c,
             CAST(sum(c) OVER (
               PARTITION BY l_returnflag ORDER BY bin) AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      FROM hist
    ), tq AS (
      SELECT *, CAST(ceil(q * n) AS BIGINT) AS target
      FROM cum CROSS JOIN
        (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
    )
    SELECT l_returnflag, q,
           bin * 1000 + 1000.0 * (target - (cum - c)) / c AS est
    FROM tq WHERE cum >= target AND cum - c < target
    """,
)
def agg_quantile_binned(spark, sf_dir):
    """Mergeable binned-quantile sketch: a fixed-width histogram (width
    1000 on l_extendedprice) is the sketch state, quantiles come from the
    cumulative counts with linear interpolation inside the straddling bin.

    This is the sketch-shaped alternative to the exact percentile family
    (agg_percentile_cont): unlike a per-group sorted buffer, bin counts are
    COMMUTATIVELY mergeable — Catalyst runs a map-side partial count per
    (flag, bin) and the merge is addition, so accuracy and result are
    independent of partitioning (the t-digest promise, deterministically).
    Error is bounded by the bin width; the estimate is exact integer/one-
    division arithmetic, so both engines agree bit-for-bit.

    100 TB: state is |groups| x |bins| (~100 here) regardless of row count;
    the only shuffle is the tiny histogram."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") / 1000.0).cast("long").alias("bin"),
    ).agg(F.count("*").alias("c"))
    cum = hist.select(
        "l_returnflag",
        "bin",
        "c",
        F.sum("c")
        .over(W.partitionBy("l_returnflag").orderBy("bin"))
        .alias("cum"),
        F.sum("c")
        .over(W.partitionBy("l_returnflag"))
        .alias("n"),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    tq = cum.crossJoin(F.broadcast(qs)).withColumn(
        "target", F.ceil(F.col("q") * F.col("n")).cast("long")
    )
    return tq.filter(
        (F.col("cum") >= F.col("target"))
        & (F.col("cum") - F.col("c") < F.col("target"))
    ).select(
        "l_returnflag",
        "q",
        (
            F.col("bin") * 1000
            + F.lit(1000.0)
            * (F.col("target") - (F.col("cum") - F.col("c")))
            / F.col("c")
        ).alias("est"),
    )


@register(
    "agg_boolean",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_orderstatus = 'F')    AS any_finished,
           count(*) FILTER (o_totalprice > 200000) AS n_big,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_boolean(spark, sf_dir):
    """Boolean aggregate family: BOOL_AND / BOOL_OR / filtered COUNT per
    group — the assertion-style aggregates data-quality SQL leans on
    (`every row satisfies P`, `any row satisfies Q`).  All three are
    single-bit/counter states with trivially commutative merges, so the
    map-side partial aggregation is maximal and the shuffle carries one
    row per (group, flag)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.count("*").alias("n"),
    )


@register(
    "agg_gini",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority AS pri,
             CAST(o_totalprice AS DECIMAL(18,2)) AS x,
             CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS DECIMAL(10,0)) AS i
      FROM orders
    ), s AS (
      SELECT pri, count(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(i * x) AS DOUBLE) AS six
      FROM r GROUP BY pri
    )
    SELECT pri AS o_orderpriority, n,
           (2.0 * six - (n + 1) * sx) / (n * sx) AS gini
    FROM s
    WHERE sx <> 0
    """,
)
def agg_gini(spark, sf_dir):
    """Gini coefficient of order value per priority class — the standard
    inequality index (0 = all orders equal, →1 = one order dominates),
    computed from the rank-weighted sum identity
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over the ascending sort.

    Determinism: both Σ terms accumulate as exact DECIMALs (i cast to
    DECIMAL(10,0) keeps the product inside DECIMAL(28,2) — no double ever
    sums), ranks are total-ordered (value, then orderkey — and equal
    values make Σi·x invariant under tie permutation anyway), and the
    final expression is one fixed double computation.  One rank window +
    one aggregate, both keyed on the group column."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    r = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        F.row_number()
        .over(
            W.partitionBy("o_orderpriority").orderBy(
                "o_totalprice", "o_orderkey"
            )
        )
        .cast("decimal(10,0)")
        .alias("i"),
    )
    s = r.groupBy("pri").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("double").alias("six"),
    )
    # degenerate-group guard: an all-zero-value group zeroes n*sx (Spark
    # NULL vs DuckDB NaN on 0/0) — drop identically in both engines
    return s.filter(F.col("sx") != 0).select(
        F.col("pri").alias("o_orderpriority"),
        "n",
        (
            (F.lit(2.0) * F.col("six") - (F.col("n") + 1) * F.col("sx"))
            / (F.col("n") * F.col("sx"))
        ).alias("gini"),
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH byv AS (
      SELECT l_returnflag, l_extendedprice,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, l_extendedprice,
             CAST(SUM(wt) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cw,
             CAST(SUM(wt) OVER (PARTITION BY l_returnflag) AS BIGINT)
               AS tw
      FROM byv
    )
    SELECT l_returnflag,
           CAST(min(tw) AS BIGINT) AS total_weight,
           min(l_extendedprice)
             FILTER (2 * cw >= tw) AS weighted_median
    FROM cum GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Weighted median (the 50% weighted quantile): the smallest value
    whose CUMULATIVE weight reaches half the group's total — quantity-
    weighted price here, the estimator metric/fairness pipelines need
    where percentile_cont's unweighted rank is wrong (a 100-unit line
    must count 100×).  Weights first COLLAPSE onto distinct (group,
    value) pairs through a partial-aggregating groupBy — the map-side
    combine every weighted-quantile implementation should start with:
    the ordered window then sorts |distinct values| rows instead of
    |rows| (measured sf1: 6.5 s → ~1 s; the raw-row window sorted 20M
    rows across only 3 group partitions), and distinctness makes the
    cumulative order total with no tie column at all.  The boundary row
    selects via MIN over the qualifying suffix; weights stay exact
    integers, 2·cw ≥ tw is integer arithmetic, and the emitted value is
    an INPUT value (never an interpolation) — hash-exact by construction.

    100 TB: one partial-agg exchange + a per-group sort over the
    collapsed value domain; when even THAT sort is too big, the binned
    two-pass sketch (agg_quantile_binned) is the stated escape hatch and
    generalizes to weights unchanged."""
    from pyspark.sql import Window as W

    byv = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_extendedprice",
            F.round("l_quantity").cast("long").alias("wt"),
        )
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum("wt").cast("long").alias("wt"))
    )
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = byv.withColumn("cw", F.sum("wt").over(wcum).cast("long")).withColumn(
        "tw",
        F.sum("wt").over(W.partitionBy("l_returnflag")).cast("long"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.min("tw").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("l_extendedprice"))
        ).alias("weighted_median"),
    )


def tdigest_compress(means, weights, delta=100.0):
    """Merge sorted-by-mean centroids into a k1-scale-bounded t-digest.

    Dunning's merging digest: walking the centroids in mean order, two
    adjacent clusters merge while the k1 scale function
    k(q) = (delta / 2pi) * asin(2q - 1) advances by <= 1 across the
    merged span — clusters stay O(1/delta) wide in q-space near the
    median and shrink toward the tails, which is what bounds the rank
    error by ~1/delta at q=0.5 and far tighter at the extremes.  Pure
    numpy kernel shared by the partial (per-partition) and final
    (per-group merge) phases; the result is again a valid digest, which
    is the MERGEABILITY contract."""
    import numpy as np

    if len(means) == 0:  # empty digest in, empty digest out (mirrors
        return [], []    # tdigest_from_values' n == 0 handling)
    order = np.argsort(means, kind="stable")
    means, weights = np.asarray(means, dtype="float64")[order], np.asarray(
        weights, dtype="float64"
    )[order]
    n = float(weights.sum())

    def kfn(q):
        return (delta / (2.0 * np.pi)) * np.arcsin(
            np.clip(2.0 * q - 1.0, -1.0, 1.0)
        )

    out_m, out_w = [], []
    cur_m, cur_w = float(means[0]), float(weights[0])
    cum = 0.0  # total weight strictly before the current cluster
    for m, w in zip(means[1:], weights[1:]):
        if kfn((cum + cur_w + w) / n) - kfn(cum / n) <= 1.0:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def tdigest_from_values(values, delta=100.0):
    """Vectorized digest build from raw (weight-1) values.

    Sort once, place value i at rank-midpoint q=(i+0.5)/n, bucket by
    floor(k1(q)) and reduce sums/counts per bucket with
    np.add.reduceat — zero Python-level loops over data (the greedy
    per-value walk in tdigest_compress measured as a flat ~6 s floor at
    sf0.1; this path is pure numpy).  Integer-k1 bucketing satisfies the
    same cluster-size invariant (k advances < 1 inside a bucket), so the
    result is a valid digest for tdigest_compress to merge."""
    import numpy as np

    v = np.sort(np.asarray(values, dtype="float64"), kind="stable")
    n = len(v)
    if n == 0:
        return [], []
    q = (np.arange(n) + 0.5) / n
    k = np.floor(
        (delta / (2.0 * np.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))
    )
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    sums = np.add.reduceat(v, starts)
    counts = np.diff(np.r_[starts, n]).astype("float64")
    return (sums / counts).tolist(), counts.tolist()


def tdigest_quantile(means, weights, q):
    """Estimate the q-quantile from a digest (midpoint-rank interpolation)."""
    import numpy as np

    means = np.asarray(means, dtype="float64")
    weights = np.asarray(weights, dtype="float64")
    n = weights.sum()
    target = q * n
    # centroid i spans ranks [cum_i, cum_i + w_i); its mean sits at the
    # midpoint rank cum_i + w_i/2
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    j = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[j]) / (cum[j + 1] - cum[j])
    return float(means[j] + frac * (means[j + 1] - means[j]))


_TDIGEST_QS = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)


@register("agg_tdigest")  # rows-only: sketch estimates; rank-error bound
# gates in tests/test_ml_quality.py (vs exact quantiles)
def agg_tdigest(spark, sf_dir):
    """Mergeable t-digest quantile state: per-partition partial digests
    (mapInPandas, each a <=O(delta)-centroid summary) merge per group
    into one digest that answers any quantile — the accuracy-adaptive
    complement to agg_quantile_binned's fixed bins and the distributed-
    sketch dual of agg_approx_quantile's built-in (Greenwald-Khanna):
    t-digest partials are CLOSED UNDER MERGE with rank error ~1/delta
    at the median and asymptotically tighter at the tails, which is why
    it is the production percentile state (latency p99s) in most
    telemetry stores.

    100 TB: the only exchange ships |partitions|x|groups| digests of
    <=~delta centroids each — KBs per partition regardless of row count;
    the merge input is partial-count-sized, never data-sized, exactly
    like a partial/final hash aggregate.  The final per-group merge is
    applyInPandas over centroid lists (bounded), not raw rows."""
    import pandas as pd

    DELTA = 100.0

    def partial(batches):
        acc = {}
        for pdf in batches:
            for grp, vals in pdf.groupby("grp")["v"]:
                # vectorized bulk build per batch-group; merging the
                # (<=~delta-centroid) partials is the cheap greedy path
                m, w = tdigest_from_values(
                    vals.to_numpy(dtype="float64"), DELTA
                )
                if grp in acc:
                    pm, pw = acc[grp]
                    acc[grp] = tdigest_compress(pm + m, pw + w, DELTA)
                else:
                    acc[grp] = (m, w)
        if acc:
            yield pd.DataFrame(
                {
                    "grp": list(acc),
                    "means": [v[0] for v in acc.values()],
                    "weights": [v[1] for v in acc.values()],
                }
            )

    def merge(pdf):
        means = [m for ms in pdf["means"] for m in ms]
        weights = [w for ws in pdf["weights"] for w in ws]
        m, w = tdigest_compress(means, weights, DELTA)
        n = int(round(sum(weights)))
        return pd.DataFrame(
            {
                "grp": pdf["grp"].iloc[0],
                "q": list(_TDIGEST_QS),
                "est": [tdigest_quantile(m, w, q) for q in _TDIGEST_QS],
                "n": n,
                "n_centroids": len(m),
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("v"),
    )
    partials = li.mapInPandas(
        partial, schema="grp string, means array<double>, weights array<double>"
    )
    return (
        partials.groupBy("grp")
        .applyInPandas(
            merge,
            schema="grp string, q double, est double, n long, n_centroids long",
        )
        .orderBy("grp", "q")
    )
