"""Import all query modules so registration side-effects populate the registry."""

from . import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    projection,
    scalar_fns,
    scans,
    setops,
    similarity,
    sorts,
    text,
    windows,
)

from ..registry import ORACLES, QUERIES  # noqa: F401  (re-export)
