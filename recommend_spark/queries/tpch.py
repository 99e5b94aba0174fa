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
from ..io import hint_if, load_table, table_rows
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
            hint_if(s, table_rows(sf_dir, "supplier") * 64),
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
        .join(hint_if(s, table_rows(sf_dir, "supplier") * 64), F.col("l_suppkey") == F.col("s_suppkey"))
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
        .join(hint_if(s, table_rows(sf_dir, "supplier") * 64), F.col("l_suppkey") == F.col("s_suppkey"))
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
        .join(hint_if(p, table_rows(sf_dir, "part") * 48), F.col("l_partkey") == F.col("p_partkey"))
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
        li.join(hint_if(p, table_rows(sf_dir, "part") * 64), F.col("l_partkey") == F.col("p_partkey"))
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
    """TPC-H Q18 large-volume customer.  The textbook plan semi-joins the
    HAVING subquery's keys back to lineitem and RE-aggregates — but the
    outer query's group keys are all functionally determined by
    o_orderkey, so its SUM(l_quantity) per group IS the subquery's
    per-order sum.  One lineitem aggregation therefore serves as both the
    filter and the result column (r13): no second fact join, no
    re-aggregation — at 100 TB this halves the fact traffic.  The
    qualifying order set (HAVING > 250) is tiny and broadcasts to
    orders; DECIMAL summation keeps the hash bit-identical to the
    oracle's re-aggregated formulation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 250)
    )
    return (
        o.join(
            hint_if(big, table_rows(sf_dir, "orders") * 16),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            iso_date("o_orderdate", "o_orderdate"),
            "o_totalprice",
            F.col("q").cast("double").alias("sum_qty"),
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
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-02-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 global sales opportunity (adapted: nation key stands in
    for the phone country code the fixture lacks, and "never ordered"
    becomes "no orders in the final 6 months of the fixture's history" so
    the anti-join survivor path is exercised — every fixture customer has
    >=1 lifetime order, which made the literal form vacuously empty):
    customers with above-average balances and no recent orders —
    scalar-subquery threshold (exact decimal avg), anti-join against the
    date-pruned orders scan, grouped decimal sums.  The scalar aggregate
    broadcasts as a 1-row cross join; the anti-join sends only the recent
    orders' custkeys (date filter pushed to the parquet scan)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-02-01"
    )
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


@register(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    ), mx AS (SELECT max(total_revenue) AS m FROM revenue)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    CROSS JOIN mx WHERE r.total_revenue = mx.m
    """,
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 top supplier: quarterly revenue per supplier, then the
    supplier(s) achieving the maximum (the view + scalar-subquery shape).
    The max broadcasts as a 1-row cross join; revenue is an exact decimal
    sum emitted as double, so the equality comparison is exact in both
    engines (ties kept, as the spec requires)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
                scale=4,
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 7, 14, 23, 36, 45, 49, 3)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark, sf_dir):
    """TPC-H Q16 parts/supplier relationship (adapted: the fixture has no
    partsupp table, so the part↔supplier association comes from observed
    lineitems — same negated predicates + grouped count-distinct shape).
    The part dim broadcasts; count distinct adds its dedup exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sel = p.filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 3)
    )
    return (
        li.join(hint_if(sel, table_rows(sf_dir, "part") * 16), li.l_partkey == sel.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / count(l_quantity)) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#13' AND l.l_quantity < a.threshold
    """,
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 small-quantity-order revenue: lineitems under 20% of
    their part's average quantity, for one brand — the correlated-scalar-
    subquery shape, decorrelated into a per-part aggregate join.  The
    per-part threshold table is |parts|-sized and broadcasts; thresholds
    derive from exact decimal sums (davg), so the comparison is
    bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy("l_partkey").agg(
        (0.2 * davg("l_quantity")).alias("threshold")
    )
    sel = p.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    return (
        li.join(hint_if(sel, table_rows(sf_dir, "part") * 16), li.l_partkey == sel.p_partkey)
        .join(
            hint_if(part_avg.withColumnRenamed("l_partkey", "pk"), table_rows(sf_dir, "part") * 24),
            F.col("l_partkey") == F.col("pk"),
        )
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
      SELECT p.p_partkey, ps.l_suppkey, ps.supplycost
      FROM ps
      JOIN part p ON ps.l_partkey = p.p_partkey
      JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size = 15 AND r.r_name = 'ASIA'
    ), mn AS (
      SELECT p_partkey, min(supplycost) AS mc FROM eligible GROUP BY p_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, e.p_partkey, e.supplycost
    FROM eligible e
    JOIN mn ON e.p_partkey = mn.p_partkey AND e.supplycost = mn.mc
    JOIN supplier s ON e.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, e.p_partkey, e.supplycost
    LIMIT 100
    """,
)
def tpch_q2(spark, sf_dir):
    """TPC-H Q2 minimum-cost supplier (adapted: no partsupp table — supply
    cost is the minimum observed unit price per (part, supplier) from
    lineitems).  The correlated min-cost subquery decorrelates into a
    per-part aggregate rejoined on (part, cost); all dims broadcast; the
    top-100 rides a total order.  Unit price is one IEEE division and min
    is order-free, so cost equality is exact cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    eligible = (
        ps.join(
            hint_if(p.filter(F.col("p_size") == 15).select("p_partkey"), table_rows(sf_dir, "part") * 16),
            ps.l_partkey == F.col("p_partkey"),
        )
        .join(hint_if(s.select("s_suppkey", "s_nationkey"), table_rows(sf_dir, "supplier") * 24),
              ps.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("p_partkey", "l_suppkey", "supplycost")
    )
    mn = eligible.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.min("supplycost").alias("mc")
    )
    out = (
        eligible.join(
            hint_if(mn, table_rows(sf_dir, "part") * 24),
            (F.col("p_partkey") == F.col("pk"))
            & (F.col("supplycost") == F.col("mc")),
        )
        .join(hint_if(s, table_rows(sf_dir, "supplier") * 64), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supplycost")
    )
    return out.orderBy(
        F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "supplycost"
    ).limit(100)


@register(
    "tpch_q11",
    oracle="""
    WITH val AS (
      SELECT s.s_nationkey, l.l_partkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS value
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey = 7
      GROUP BY s.s_nationkey, l.l_partkey
    ), tot AS (SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS t
               FROM val)
    SELECT l_partkey, value FROM val CROSS JOIN tot
    WHERE value > 0.001 * t
    """,
)
def tpch_q11(spark, sf_dir):
    """TPC-H Q11 important stock (adapted: stock value = shipped revenue
    per part from one nation's suppliers).  The HAVING-over-global-
    fraction shape: per-part decimal sums, a one-row grand total broadcast
    back, fraction filter.  Filters push to the supplier dim before the
    fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    val = (
        li.join(
            hint_if(
                s.filter(F.col("s_nationkey") == 7).select("s_suppkey"),
                table_rows(sf_dir, "supplier") * 16,
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice", "value"))
    )
    tot = val.agg(dsum("value", "t", scale=4))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > 0.001 * F.col("t"))
        .select("l_partkey", "value")
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 shipping modes and priority (adapted: return flag stands
    in for the ship mode column the fixture lacks) — the conditional-sum
    pivot shape over a year of shipments.  Date predicates reach the
    lineitem scan; the one fact-fact join is the familiar
    orders⋈lineitem exchange."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    sel = li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    return (
        o.join(sel, o.o_orderkey == sel.l_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ), part_tot AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS tq
      FROM lineitem GROUP BY l_partkey
    ), heavy AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh JOIN part_tot pt ON sh.l_partkey = pt.l_partkey
      WHERE sh.sq > 0.15 * pt.tq
    )
    SELECT s.s_name, s.s_nationkey
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM heavy h WHERE h.l_suppkey = s.s_suppkey)
    """,
)
def tpch_q20(spark, sf_dir):
    """TPC-H Q20 excess-share suppliers (adapted: no partsupp/availqty —
    a supplier qualifies when it shipped more than 15% of some part's
    total quantity).  Nested aggregate-over-aggregate with a final
    semi-join — both aggregates share the (suppkey, partkey) shuffle
    lineage; the qualifying-supplier set broadcasts into the semi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        dsum("l_quantity", "sq")
    )
    part_tot = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        dsum("l_quantity", "tq")
    )
    heavy = (
        shipped.join(hint_if(part_tot, table_rows(sf_dir, "part") * 24), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("sq") > 0.15 * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        hint_if(heavy, table_rows(sf_dir, "supplier") * 16), s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_nationkey")


@register(
    "tpch_q21",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ), all_supp AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late
    JOIN supplier s ON late.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM all_supp a
        WHERE a.l_orderkey = late.l_orderkey
          AND a.l_suppkey <> late.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l2
        WHERE l2.l_orderkey = late.l_orderkey
          AND l2.l_suppkey <> late.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 suppliers who kept orders waiting (adapted: "late" means
    shipped more than 90 days after the order date): the double-correlated
    EXISTS / NOT EXISTS shape — multi-supplier orders where exactly this
    supplier was late.

    Spark-first decorrelation to ONE pass over the order's lines instead
    of semi-/anti-joins between distinct pair sets: a (order, supplier)
    pair qualifies  iff  its order has another supplier on ANY line
    (distinct suppliers ≥ 2) and exactly ONE distinct supplier was late —
    and then the unique late supplier IS min(late suppkey).  r14: the
    r13 multi-distinct aggregate planned as a 3-way Expand (tripling the
    fact rows through its first exchange) and measured 3.5-6 s at sf0.1
    in a clean window vs the r12 textbook plan's 1.8 s — the r13 "win"
    was an artifact of the 13.5%-steal measurement window.  Rewritten as
    TWO-LEVEL aggregation sharing ONE exchange (guide §2.4): repartition
    by l_orderkey, then groupBy(l_orderkey, l_suppkey) [bool-or late] and
    groupBy(l_orderkey) both plan exchange-free on that partitioning —
    one fact-width shuffle total, no Expand, no DISTINCT machinery
    (measured sf0.1 interleaved min-of-4: current 3.52 / twolevel 1.55 s;
    plan: 3 Exchange → 2, Expand removed; results bit-identical).
    orders broadcasts when the size gate allows; supplier stays a
    size-gated broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    is_late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    pairs = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            o.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(is_late.cast("int")).alias("late"))
    )
    per_order = (
        pairs.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("late").alias("n_late"),
            F.min(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
                "late_suppkey"
            ),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(
            hint_if(s, table_rows(sf_dir, "supplier") * 64),
            per_order.late_suppkey == s.s_suppkey,
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
