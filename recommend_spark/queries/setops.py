"""§2.7 Set operations.

Reference parity: ``set_union_all`` is the reference's incremental-data path
(``ratings_RDD.union(new_ratings_RDD)``, upstream:engine.py § add_ratings),
done with ``unionByName`` (name-resolved — positional union is a footgun).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register


def _expensive(o):
    return o.filter(F.col("o_totalprice") > 150000).select(
        "o_orderkey", "o_orderpriority"
    )


def _urgent(o):
    return o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_all(spark, sf_dir):
    """Bag union (duplicates preserved — the two branches overlap)."""
    o = load_table(spark, sf_dir, "orders")
    return _expensive(o).unionByName(_urgent(o))


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000
    UNION
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_distinct(spark, sf_dir):
    """Set union (bag union + distinct)."""
    o = load_table(spark, sf_dir, "orders")
    return _expensive(o).unionByName(_urgent(o)).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics): customers with both F and O orders."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@register(
    "set_except",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_quantity > 25
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_quantity > 45
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT ALL (bag difference, multiplicity-aware)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select("l_partkey")
    b = li.filter(F.col("l_quantity") > 45).select("l_partkey")
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_discount > 0.05
    """,
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag intersection, multiplicity-aware): each partkey
    appears min(count_left, count_right) times.  Completes the §2.7
    variant matrix alongside `set_intersect` (distinct) and the two EXCEPT
    forms.  Plan: same single hash-shuffle as a groupBy on the compared
    columns — Catalyst rewrites both *ALL variants to a count-compare
    aggregate, no join of the full bags."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select("l_partkey")
    b = li.filter(F.col("l_discount") > 0.05).select("l_partkey")
    return a.intersectAll(b)


@register(
    "set_except_distinct",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_quantity > 25
    EXCEPT
    SELECT l_partkey FROM lineitem WHERE l_quantity > 45
    """,
)
def set_except_distinct(spark, sf_dir):
    """EXCEPT (distinct semantics): partkeys that ever ship >25 units but
    never >45.  Catalyst plans this as a left-anti join over distinct
    inputs — one shuffle per side on the compared columns, broadcastable
    when the subtrahend is small."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select("l_partkey")
    b = li.filter(F.col("l_quantity") > 45).select("l_partkey")
    return a.subtract(b)
