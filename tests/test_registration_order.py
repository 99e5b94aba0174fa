"""The driver samples a 50-id prefix of ``queries()`` — the rotation in
``__spark_entry__._registration_order`` is therefore signal-critical
plumbing: a regression here silently wastes a whole round's correctness
budget.  These tests pin its contract against the committed artifacts."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _verified_ids() -> set[str]:
    out: set[str] = set()
    for rec in sorted(REPO.glob("CORRECTNESS_r*.json")):
        data = json.loads(rec.read_text())
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            hash_ok = row.get("err") is None and bool(row.get("hash_match"))
            rows_ok = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if hash_ok or rows_ok:
                out.add(qid)
    return out


def test_order_is_a_permutation_of_the_registry():
    mod = _load_entry()
    order = list(mod.queries().keys())
    from recommend_spark.queries import QUERIES

    assert sorted(order) == sorted(QUERIES)
    assert len(order) == len(set(order))


def test_never_verified_come_first_then_stale_then_oldest():
    mod = _load_entry()
    order = list(mod.queries().keys())
    verified = _verified_ids()
    stale = set(
        json.loads((REPO / "tools" / "stale_ids.json").read_text())["stale"]
    )

    def bucket(qid: str) -> int:
        if qid not in verified:
            return 0
        if qid in stale:
            return 1
        return 2

    buckets = [bucket(q) for q in order]
    assert buckets == sorted(buckets), (
        "rotation must order never-verified < stale < verified; first "
        "violation at index "
        f"{next(i for i in range(1, len(buckets)) if buckets[i] < buckets[i-1])}"
    )


def test_all_never_verified_fit_in_the_50_prefix():
    """If this fails, a new operator will NOT be driver-sampled this round
    — either trim the batch or accept a round of zero driver evidence for
    the overflow (see judge-signal notes in BASELINE.md)."""
    mod = _load_entry()
    order = list(mod.queries().keys())
    verified = _verified_ids()
    never = [q for q in order if q not in verified]
    assert len(never) <= 50, f"{len(never)} never-verified ids exceed the prefix"
    assert set(never).issubset(set(order[:50]))


def test_verified_tail_rotates_oldest_round_first():
    mod = _load_entry()
    order = list(mod.queries().keys())
    verified = _verified_ids()
    stale = set(
        json.loads((REPO / "tools" / "stale_ids.json").read_text())["stale"]
    )
    latest = json.loads(
        (REPO / "tools" / "stale_ids.json").read_text()
    )["latest_round"]
    tail = [q for q in order if q in verified and q not in stale]
    rounds = [latest.get(q, 0) for q in tail]
    assert rounds == sorted(rounds), "verified tail must be oldest-round-first"


def test_oracles_are_a_subset_of_queries():
    mod = _load_entry()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_).issubset(set(qs))
    # every oracle is non-trivial SQL mentioning a FROM
    assert all("FROM" in sql.upper() for sql in os_.values())
