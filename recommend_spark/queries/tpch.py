"""TPC-H-style analytics pack (post-survey addition, SURVEY.md §2.13).

The fixtures are a TPC-H-ish star schema (FIXTURES.md), so the classic
decision-support queries are the natural "whole-engine" workout: multi-way
fact⋈dim joins, selective predicates, grouped money aggregation, and
top-k under a total order — each one a plan Catalyst must get right
(broadcast the dims, push the date filters into the parquet scan, partial
aggregation before the shuffle).  Columns absent from the fixtures
(o_shippriority, c_phone, partsupp, …) are substituted with their nearest
present equivalent; query shape and selectivity spirit are preserved.

Determinism: every money sum goes through DECIMAL (canon.dsum) so the
rounded double is partition-order independent; every LIMIT sits under a
total order with a unique-key tie-break (SURVEY.md §5.3).

Scale: these are the queries whose 100 TB plans matter most.  All dim
joins here (nation, region, customer at bench scale) broadcast; the
lineitem⋈orders join is the one genuine fact-fact shuffle and AQE handles
its skew.  Date predicates reach the parquet scan (PushedFilters asserted
for the pack's scan shape in tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..canon import davg, dsum, iso_date
from ..io import load_table
from ..registry import register


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary report — the canonical scan→filter→hash-agg
    plan.  At 100 TB this is a single shuffle of 6 partial-agg states per
    (flag,status) group per task; the date filter prunes parquet row groups."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", scale=4),
            dsum(charge, "sum_charge", scale=6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority: 3-way join, grouped revenue, global
    top-10 under a total order (unique l_orderkey tie-break).  Spark plans
    TakeOrderedAndProject — only 10 rows per partition survive the shuffle.
    (o_shippriority is absent from the fixtures; o_orderpriority stands in.)
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = _ts("1997-03-15 00:00:00")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li.filter(F.col("l_shipdate") > cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", scale=4))
        .select("l_orderkey", "revenue", iso_date("o_orderdate", "o_orderdate"), "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 local-supplier volume: 6-way join incl. the local-supply
    condition c_nationkey = s_nationkey.  nation/region broadcast; the
    customer⋈orders⋈lineitem chain shuffles on its keys once each."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", scale=4))
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecasting revenue change: pure scan-filter-sum.  All three
    predicates push to parquet (range + between + comparison) — the 100 TB
    plan reads only matching row groups and shuffles one partial sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", scale=4),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
        OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7(spark, sf_dir):
    """TPC-H Q7 volume shipping between two trading nations, by direction
    and year.  The disjunctive nation-pair predicate lands on two broadcast
    dims, so it filters during the map-side join — no shuffle carries
    non-qualifying rows."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_19"))
            | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", scale=4))
    )


@register(
    "tpch_q8",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
                         THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                    AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY year(o.o_orderdate)
    """,
)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8 national market share: one nation's revenue share of a
    region's market for one part type, by year.  The share is a ratio of
    two DECIMAL-exact sums — a single IEEE division, so the double output
    is still bit-deterministic (SURVEY.md §5.3)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    nat_vol = (
        F.when(F.col("supp_nation") == "NATION_3",
               F.col("l_extendedprice") * (1 - F.col("l_discount"))).otherwise(0.0)
    ).cast("decimal(18,4)")
    return (
        p.filter(F.col("p_type") == "PROMO")
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nat_vol).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
    )


@register(
    "tpch_q9",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * 0.6 * l.l_quantity
                    AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9(spark, sf_dir):
    """TPC-H Q9 product-type profit by nation and year.  The fixtures have
    no partsupp table, so supply cost is modeled as 60% of p_retailprice —
    shape (LIKE-filtered part ⋈ fact chain ⋈ dims, signed money sum) is
    preserved.  Profit terms stay per-row IEEE doubles cast to DECIMAL for
    the order-independent sum."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.6 * F.col("l_quantity")
    )
    return (
        p.filter(F.col("p_name").like("%widget%"))
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, "sum_profit", scale=4))
    )


@register(
    "tpch_q14",
    oracle="""
    SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                         AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 promotion effect: percent of one month's revenue from promo
    parts.  Single fact⋈dim join (part broadcasts at bench scale), scan
    range-pruned to one month, conditional decimal sums, one division."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo_vol = (
        F.when(F.col("p_type") == "PROMO",
               F.col("l_extendedprice") * (1 - F.col("l_discount"))).otherwise(0.0)
    ).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-09-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-10-01 00:00:00"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo_vol).cast("double") / F.sum(vol).cast("double"))
            .alias("promo_revenue")
        )
    )


@register(
    "tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 discounted revenue: disjunction of three brand/size/quantity
    windows.  The p_brand/p_size legs prune the broadcast part side before
    the join; only the l_quantity legs evaluate per fact row.  (p_container
    is absent from the fixtures; the p_size windows carry its selectivity.)"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", scale=4),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned-item reporting: who returned the most revenue last
    quarter.  Group keys include all customer attributes (classic TPC-H
    shape — no second join back).  Top-20 under total order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-10-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", scale=4))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume customer: semi-join against a grouped HAVING
    subquery, then re-aggregate.  The subquery is a lineitem self-aggregate
    — at 100 TB both aggregations shuffle on l_orderkey, so Spark reuses
    the exchange; the filtered key set is small and broadcasts back."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            iso_date("o_orderdate", "o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 order-priority checking (adapted: the fixture lacks
    commit/receipt dates, so "late" means a lineitem shipped more than 60
    days after the order date — same EXISTS-semi-join + priority-count
    shape).  The semi-join keeps only order keys; the date filter prunes
    the orders scan before the join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sel = o.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    late = li.select("l_orderkey", "l_shipdate")
    joined = sel.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "tpch_q13",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 customer distribution: orders-per-customer histogram via
    LEFT JOIN (zero-order customers count at c_count=0) + double
    aggregation.  The second aggregate runs over |customers| rows and its
    output is bounded by max order count — both shuffles shrink fast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(c_acctbal) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS cntrycode, count(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 global sales opportunity (adapted: nation key stands in
    for the phone country code the fixture lacks): customers with
    above-average balances and NO orders — scalar-subquery threshold
    (exact decimal avg), broadcast anti-join, grouped decimal sums.  The
    scalar aggregate broadcasts as a 1-row cross join; the anti-join sends
    only order custkeys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    no_orders = rich.join(
        o, rich.c_custkey == o.o_custkey, "left_anti"
    )
    return no_orders.groupBy(
        F.col("c_nationkey").alias("cntrycode")
    ).agg(
        F.count("*").alias("numcust"),
        dsum("c_acctbal", "totacctbal"),
    )
