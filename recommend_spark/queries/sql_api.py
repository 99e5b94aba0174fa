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
