"""Operator registry: the single source of truth for the §2 inventory.

Every operator module registers ``name -> callable(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) ``name -> DuckDB oracle SQL``.  The driver contract
(__spark_entry__.py) re-exports these dicts verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional oracle.

    Determinism rules every registered query follows (SURVEY.md §5.3):
    alias all computed columns identically to the oracle; round float
    outputs to 4 decimals in BOTH engines; emit timestamps as epoch seconds
    or formatted strings; total-order before any LIMIT; sort arrays.
    """

    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query id {name!r}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
