"""§2.2 Projection / filter / predicates.

Reference parity: tuple-slicing ``map(lambda ...)`` projections and
``filter(lambda ...)`` predicates (upstream:engine.py § __init__ /
§ get_top_ratings) re-expressed as Catalyst expressions — pushed down to the
parquet scan (PushedFilters / ReadSchema visible in .explain()).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..canon import r4
from ..io import load_table
from ..registry import register


@register(
    "project_select",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def project_select(spark, sf_dir):
    """Column pruning + computed columns: only 5 of 11 lineitem columns are
    read (verify ReadSchema in the plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(net, "net_price"),
        r4(net * (1 + F.col("l_tax")), "charged"),
    )


@register(
    "filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount < 0.05) OR l_returnflag = 'R'
    """,
)
def filter_basic(spark, sf_dir):
    """Comparison + boolean predicates, pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)) | (
        F.col("l_returnflag") == "R"
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_name LIKE '%bo%'
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4')
      AND p_type IS NOT NULL
    """,
)
def filter_in_between_like(spark, sf_dir):
    """IN / BETWEEN / LIKE / IS NULL three-valued-logic predicates."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 30)
        & F.col("p_name").like("%bo%")
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4")
        & F.col("p_type").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@register(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_rows(spark, sf_dir):
    """Row-level dedup (the reference's ``.distinct()`` on candidate pairs).

    Uses ``distinct()`` on the full projected row — deterministic by
    construction.  For keep-one-of-many-by-key semantics see ``dedup_exact``
    (bare ``dropDuplicates(subset)`` keeps an arbitrary row and is banned)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()
