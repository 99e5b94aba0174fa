"""Import all query modules so registration side-effects populate the registry."""

from . import (  # noqa: F401
    aggregates,
    analytics,
    dedup,
    joins,
    packing,
    projection,
    recommender,
    sampling,
    scalar_fns,
    scans,
    setops,
    similarity,
    sorts,
    sql_api,
    streaming,
    text,
    tpch,
    udfs,
    windows,
)

from ..registry import ORACLES, QUERIES  # noqa: F401  (re-export)
