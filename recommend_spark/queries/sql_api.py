"""Raw SQL entry point (post-survey addition).

Everything else in the inventory declares plans via the DataFrame API; this
module proves the engine's second front door — `spark.sql` over registered
views — compiles to the same Catalyst plans.  A user of the engine can
paste ANSI SQL (CTEs, joins, windows, QUALIFY-style rank filters) and get
the identical optimizer treatment: the SQL below and its DuckDB oracle are
one dialect-shared string apart.
"""

from __future__ import annotations

from ..io import load_table
from ..registry import register

# One SQL text, two engines: Spark SQL and DuckDB both accept this ANSI
# core (CTE + join + grouped decimal agg + ranked window + total-order
# tie-break).  Divergences would surface as an oracle hash mismatch.
_SQL = """
    WITH rev AS (
      SELECT o.o_custkey,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM {orders} o
      JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey
    ), ranked AS (
      SELECT c.c_mktsegment, c.c_custkey, r.revenue,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY r.revenue DESC, c.c_custkey) AS rn
      FROM rev r JOIN {customer} c ON r.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment, c_custkey, revenue, rn
    FROM ranked WHERE rn <= 3
"""


@register(
    "sql_interface",
    oracle=_SQL.format(orders="orders", lineitem="lineitem", customer="customer"),
)
def sql_interface(spark, sf_dir):
    """Top-3 customers by revenue per market segment, expressed as ONE ANSI
    SQL string executed by `spark.sql` over temp views — byte-identical SQL
    runs as the DuckDB oracle.  Catalyst treats it exactly like the
    DataFrame declarations (same WindowGroupLimit top-k plan)."""
    for t in ("orders", "lineitem", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlif_{t}")
    return spark.sql(
        _SQL.format(
            orders="sqlif_orders", lineitem="sqlif_lineitem", customer="sqlif_customer"
        )
    )


@register(
    "join_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    """,
)
def join_lateral(spark, sf_dir):
    """Correlated LATERAL subquery join: each customer's two most
    expensive orders via a per-row subquery — the SQL form analysts write
    before an engine rewrites it.  Catalyst DECORRELATES this into the
    same plan as the window top-k form (win_topk_per_group): one shuffle
    on the correlation key, per-group limit — no per-row re-execution,
    which is what makes the construct survive a fact-scale outer side.
    Byte-identical SQL runs in DuckDB (which also decorrelates)."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"lat_{t}")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM lat_orders o WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )


# Oracle for the recursive-CTE op: multi-hop reachability in the
# co-purchase graph from the smallest edge endpoint, capped at 2 hops
# (standard-SQL WITH RECURSIVE; DuckDB runs it with the edge derivation
# inline — the Spark side recurses over the staged edge artifact instead,
# see the perf note in the docstring).
_RECURSIVE_SQL = """
    WITH RECURSIVE b AS (
      SELECT DISTINCT o_custkey AS u, l_partkey AS i
      FROM {orders} JOIN {lineitem} ON o_orderkey = l_orderkey
    ), e AS (
      SELECT a.i AS p, c.i AS q
      FROM b a JOIN b c ON a.u = c.u AND a.i < c.i
      GROUP BY a.i, c.i
      HAVING count(*) >= 5
    ), edges AS (
      SELECT p, q FROM e UNION ALL SELECT q AS p, p AS q FROM e
    ), reach(node, hop) AS (
      SELECT (SELECT MIN(p) FROM edges) AS node, 0 AS hop
      UNION ALL
      SELECT edges.q AS node, reach.hop + 1 AS hop
      FROM reach JOIN edges ON reach.node = edges.p
      WHERE reach.hop < 2
    )
    SELECT node, CAST(MIN(hop) AS BIGINT) AS hops
    FROM reach GROUP BY node
"""


@register(
    "sql_recursive_cte",
    oracle=_RECURSIVE_SQL.format(orders="orders", lineitem="lineitem"),
)
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE front door: 2-hop reachability (hop counts) from
    the lowest-id node of the co-purchase graph — standard-SQL recursion,
    which Spark supports from 4.0 and DuckDB natively; the recursive
    block itself is the same shape in both engines.

    Recursion in a distributed engine is iterated materialization: Spark
    executes each recursive step as a fresh join+union over the previous
    step's result, exactly the loop `graph_pagerank` writes by hand — so
    this op pins down that the DECLARATIVE form reaches the same fixpoint
    the imperative loop does.  The hop cap bounds work (standard practice:
    unbounded closure over a dense graph is quadratic); MIN(hop) per node
    dedups the path explosion at the end, matching BFS semantics.

    Perf note (measured): Spark re-plans the recursive CTE's base
    relations at EVERY step, so deriving the edge set inline re-ran the
    quadratic basket self-join 3x (~27 s at sf0.1).  The Spark side
    therefore recurses over the disk-memoized co-purchase edge artifact
    registered as a temp view (~1 s); the oracle keeps the full inline
    derivation — identical semantics, and DuckDB evaluates its
    non-recursive CTEs once."""
    from .recommender import _copurchase_edges_artifact

    e = _copurchase_edges_artifact(spark, sf_dir).filter("cooc >= 5")
    e.selectExpr("p", "q").unionAll(
        e.selectExpr("q AS p", "p AS q")
    ).createOrReplaceTempView("rec_edges")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, hop) AS (
          SELECT (SELECT MIN(p) FROM rec_edges) AS node, 0 AS hop
          UNION ALL
          SELECT rec_edges.q AS node, reach.hop + 1 AS hop
          FROM reach JOIN rec_edges ON reach.node = rec_edges.p
          WHERE reach.hop < 2
        )
        SELECT node, CAST(MIN(hop) AS BIGINT) AS hops
        FROM reach GROUP BY node
        """
    )


_SQL_CORR = """
    SELECT c.c_custkey, c.c_acctbal,
           (SELECT count(*) FROM {orders} o
             WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM {customer} c
    WHERE EXISTS (SELECT 1 FROM {orders} o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_totalprice > 200000)
"""


@register(
    "sql_correlated_subquery",
    oracle=_SQL_CORR.format(orders="orders", customer="customer"),
)
def sql_correlated_subquery(spark, sf_dir):
    """Correlated subqueries through the SQL front door: a scalar
    correlated COUNT in the projection plus a correlated EXISTS filter —
    the classic pair every SQL port exercises first.

    Catalyst DECORRELATES both (RewriteCorrelatedScalarSubquery turns the
    scalar count into a left outer aggregate join; the EXISTS becomes a
    left semi join), so what executes is two keyed joins against orders —
    no nested-loop per-row subquery ever exists at any scale, and both
    shuffles share the o_custkey key.  One dialect-shared SQL string is
    the oracle."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlcs_{t}")
    return spark.sql(
        _SQL_CORR.format(orders="sqlcs_orders", customer="sqlcs_customer")
    )
