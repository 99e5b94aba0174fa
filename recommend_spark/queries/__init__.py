"""Import all query modules so registration side-effects populate the registry."""

from . import (  # noqa: F401
    aggregates,
    joins,
    projection,
    scans,
    setops,
    sorts,
    windows,
)

from ..registry import ORACLES, QUERIES  # noqa: F401  (re-export)
