"""Whitespace-convention pins for the packing family.

The corpus fixtures happen to contain no doubled/leading/trailing spaces,
so oracle parity on them cannot distinguish "split and count" from "split,
filter empties, count".  These tests PLANT the pathological docs (double
space, leading/trailing space, empty text) and re-assert Spark/DuckDB
parity on that table, pinning the family-wide convention: the raw
whitespace split WITHOUT empty-token filtering (``_SQL_NTOK``).
"""

from __future__ import annotations

import duckdb
import pytest

from recommend_spark.queries import ORACLES, QUERIES
from tests.conftest import assert_parity

DOCS = [
    ("d1", "en", "web", "hello  world"),           # doubled space -> 3 raw tokens
    ("d2", "en", "web", " leading and trailing "),  # edge empties -> 5 raw tokens
    ("d3", "de", "book", ""),                       # empty text -> 1 raw token
    ("d4", "de", "book", "one two three four"),
    ("d5", "fr", "wiki", "a  b  c"),                # 5 raw tokens, 3 filtered
]


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ws_docs")
    df = spark.createDataFrame(DOCS, "doc_id string, lang string, source string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def planted_ddb(planted_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "qid", ["pipeline_length_buckets", "pipeline_pack_sequences"]
)
def test_whitespace_convention_parity(spark, planted_ddb, planted_dir, qid):
    """Spark and the oracle agree on docs with doubled/edge/empty spaces."""
    df = QUERIES[qid](spark, planted_dir)
    assert_parity(df, planted_ddb, ORACLES[qid], qid=qid)


def test_length_buckets_whitespace(spark, planted_dir):
    """The raw-split convention itself: 'hello  world' counts 3 tokens
    (bucket 0), '' counts 1 — an empty-filtered count would give 2 and 0."""
    df = QUERIES["pipeline_length_buckets"](spark, planted_dir)
    rows = {r["bucket"]: r for r in df.collect()}
    assert rows[0]["n_docs"] == len(DOCS)
    # raw token counts: 3 + 5 + 1 + 4 + 5 = 18 (filtered would be 2+3+0+4+3=12)
    assert rows[0]["total_tokens"] == 18
    assert rows[0]["min_tok"] == 1 and rows[0]["max_tok"] == 5
