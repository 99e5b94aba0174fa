"""Flag-on == flag-off parity for the surrogate shuffle keys.

``spark.graft.surrogateShuffleKeys=true`` (recommend_spark/canon.py)
replaces the raw n-gram/word STRING shuffle keys of the shingle family
with a 96-bit (xxhash64, crc32) surrogate.  The keys are internal — they
never reach the output — so the flag must be a pure physical-layout
lever: byte-identical result values either way.  This test proves that
on the fixtures for every op that honors the flag; the bytes/wall delta
at sf1 is measured separately (tools/scaleup_r10_surrogate.json).
"""

from __future__ import annotations

import math

import pytest

from recommend_spark.queries import QUERIES
from tests.conftest import SF_DIR

FLAG = "spark.graft.surrogateShuffleKeys"

SURROGATE_OPS = [
    "dedup_span_fraction",
    "pipeline_bpe_pairs",
    "text_bigram_surprisal",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = [
        tuple(
            "NaN" if isinstance(r[c], float) and math.isnan(r[c]) else r[c]
            for c in cols
        )
        for r in df.collect()
    ]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, rows


@pytest.mark.parametrize("qid", SURROGATE_OPS)
def test_surrogate_keys_value_identical(spark, qid):
    assert spark.conf.get(FLAG, "false") == "false"
    base = _canon(QUERIES[qid](spark, SF_DIR))
    spark.conf.set(FLAG, "true")
    try:
        on = _canon(QUERIES[qid](spark, SF_DIR))
    finally:
        spark.conf.unset(FLAG)
    assert on == base


def _hash_shuffle_key_types(df) -> list[list[str]]:
    """Type names of every hash-exchange's partitioning keys, collected by
    walking the physical plan tree structurally (node classes + expression
    dataTypes, never the formatted plan string — expression-ID rendering
    and node names drift across Spark minor versions; r10 ADVICE)."""
    out: list[list[str]] = []

    def walk(node) -> None:
        cls = node.getClass().getName()
        if cls.endswith("AdaptiveSparkPlanExec"):
            walk(node.executedPlan())
            return
        if cls.endswith("ShuffleExchangeExec"):
            part = node.outputPartitioning()
            if part.getClass().getSimpleName() == "HashPartitioning":
                exprs = part.expressions()
                out.append(
                    [
                        exprs.apply(i).dataType().typeName()
                        for i in range(exprs.size())
                    ]
                )
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_surrogate_flag_changes_the_plan(spark):
    """The flag must actually engage: flag-on, no raw string column may
    survive into dedup_span_fraction's hash exchanges (the shingle column
    is replaced by the two-long surrogate key before the first shuffle);
    flag-off, the same probe DOES see a string-keyed exchange — proving
    the probe detects raw keys and the assertion is not vacuous."""
    off_keys = _hash_shuffle_key_types(QUERIES["dedup_span_fraction"](spark, SF_DIR))
    assert any("string" in ks for ks in off_keys), off_keys
    spark.conf.set(FLAG, "true")
    try:
        on_keys = _hash_shuffle_key_types(
            QUERIES["dedup_span_fraction"](spark, SF_DIR)
        )
    finally:
        spark.conf.unset(FLAG)
    assert on_keys and all("string" not in ks for ks in on_keys), on_keys
