"""§2.6 Sort / limit / top-k.

Reference parity: ``takeOrdered(n, key=...)`` (upstream:engine.py §
get_top_ratings) — Spark plans the same partial-top-k-then-merge shape as
TakeOrderedAndProject for ``orderBy().limit()`` (asserted in test_plans.py).
Every LIMIT here sits on a total order so the surviving row-set is
deterministic (the driver's hash is order-insensitive, the *set* must not be).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register


@register(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority DESC NULLS LAST, o_totalprice ASC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi(spark, sf_dir):
    """Multi-key mixed-direction sort with explicit null placement, made
    observable by a deterministic top-100 cut."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderpriority").desc_nulls_last(),
            F.col("o_totalprice").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_global(spark, sf_dir):
    """Global top-k — the reference's ``takeOrdered``; Spark plans
    TakeOrderedAndProject (no full sort, no single-node shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "limit_rows",
    oracle="""
    SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 50
    """,
)
def limit_rows(spark, sf_dir):
    """Bare LIMIT is nondeterministic; declared only under a total order."""
    c = load_table(spark, sf_dir, "customer")
    return c.orderBy("c_custkey").limit(50).select("c_custkey", "c_name")
