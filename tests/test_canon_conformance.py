"""Canon-conformance gate: block the two classes of driver-canon failure
at the schema/type level, BEFORE any value comparison.

The driver fetches both engines' results through pandas
(``df.toPandas()`` / ``con.execute(sql).df()``), sorts the whole frame
with ``sort_values``, and string-renders every cell.  Three type classes
are structurally unsafe on that path, independent of the values:

* **array/map/struct output columns** — list cells crash pandas
  ``sort_values`` (``TypeError: unhashable type: 'list'``); struct cells
  render as ``Row(...)`` vs dict.  Bit r3 (``mm_tensor_reshape``) and r4
  (``mm_embed_pca``, ``mm_embed_pq``) — including ROWS-ONLY ops, which
  the driver also canons.
* **un-cast integer SUMs in oracle SQL** — DuckDB returns HUGEINT, which
  the pandas fetch renders as float64 (``'830.0'`` vs Spark's ``'830'``).
  Bit 4 ops in r4 with 5 more latent.
* **DATE columns** — Spark dates fetch as ``datetime.date`` objects
  (``'2024-01-01'``) while DuckDB dates/truncs fetch as datetime64
  (``'2024-01-01 00:00:00'``).  Found while fixing
  ``win_cumulative_distinct``; the house style is yyyy-MM-dd strings
  (``date_format`` / ``strftime``).

These assertions are cheap — Spark schema + DuckDB prepared-plan types,
no row comparison — so every registered query is walked.  TIMESTAMP is
safe (both engines fetch datetime64 and render identically).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    MapType,
    StructType,
)

from tests.conftest import SF_DIR
from recommend_spark.queries import ORACLES, QUERIES

# DecimalType: Spark DECIMAL str-renders as decimal.Decimal text ('50.00')
# while the DuckDB side fetches DECIMAL as float64 ('50.0') — same silent
# mismatch class as DATE.  House style: cast to double before output.
_SPARK_FORBIDDEN = (ArrayType, MapType, StructType, DateType, DecimalType)


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_spark_output_schema_is_canon_safe(spark, qid):
    df = QUERIES[qid](spark, SF_DIR)
    offenders = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, _SPARK_FORBIDDEN)
    ]
    assert not offenders, (
        f"{qid}: driver-canon-unsafe output columns {offenders} — emit "
        "arrays as joined strings and dates as yyyy-MM-dd strings"
    )


def _duckdb_type_offenders(types, cols):
    out = []
    for c, t in zip(cols, types):
        s = str(t).upper()
        if "HUGEINT" in s:  # un-cast integer SUM
            out.append((c, s, "CAST(... AS BIGINT) the sum"))
        elif s == "DATE":
            out.append((c, s, "strftime(..., '%Y-%m-%d') the date"))
        elif "[]" in s or s.startswith(("STRUCT", "MAP", "LIST", "UNION")):
            out.append((c, s, "serialize to a joined string"))
    return out


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_result_types_are_canon_safe(ddb, qid):
    rel = ddb.sql(ORACLES[qid])  # lazy: plans the query, fetches no rows
    offenders = _duckdb_type_offenders(rel.types, rel.columns)
    assert not offenders, f"{qid}: driver-canon-unsafe oracle types {offenders}"


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_and_spark_column_names_agree(spark, ddb, qid):
    """The driver sorts columns BY NAME before hashing — a name drift
    between the Spark query and its oracle is an automatic mismatch even
    with identical values."""
    s_cols = sorted(QUERIES[qid](spark, SF_DIR).columns)
    d_cols = sorted(ddb.sql(ORACLES[qid]).columns)
    assert s_cols == d_cols, f"{qid}: spark={s_cols} oracle={d_cols}"
