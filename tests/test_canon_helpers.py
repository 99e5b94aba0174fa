"""Cross-engine equivalence of the canon toolkit itself (SURVEY §5.3).

Every oracle-backed operator leans on these helper pairs being
bit-identical between Spark and DuckDB; the parity suite exercises them
indirectly, these tests pin each pair directly over adversarial values."""

from __future__ import annotations

import pyspark.sql.functions as F

from recommend_spark.canon import (
    davg,
    dsum,
    epoch_s,
    md5_int,
    sql_epoch_s,
    sql_md5_int,
)


def _spark_vals(spark, df, col):
    return [r[0] for r in df.select(col).collect()]


def test_md5_int_matches_duckdb(spark, ddb):
    vals = [0, 1, 42, 999999999, -7, 123456789012345]
    sdf = spark.createDataFrame([(v,) for v in vals], "v long")
    got = _spark_vals(spark, sdf, md5_int(F.col("v"), 6).alias("h"))
    want = [
        ddb.execute(
            f"SELECT {sql_md5_int(f'CAST({v} AS VARCHAR)', 6)}"
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_md5_int_various_widths(spark, ddb):
    for hexdigits in (4, 6, 8, 12):
        sdf = spark.createDataFrame([(37,)], "v long")
        got = _spark_vals(spark, sdf, md5_int(F.col("v"), hexdigits).alias("h"))[0]
        expr = sql_md5_int("CAST(37 AS VARCHAR)", hexdigits)
        want = ddb.execute(f"SELECT {expr}").fetchone()[0]
        assert got == want, hexdigits


def test_dsum_davg_match_duckdb_decimal_twins(spark, ddb):
    # adversarial: values whose double sum depends on order
    vals = [0.1, 0.2, 0.3, 1e12, -1e12, 7.77, 123456.78, -0.05]
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    got_sum = _spark_vals(spark, sdf.agg(dsum("v", "s")), "s")[0]
    got_avg = _spark_vals(spark, sdf.agg(davg("v", "a")), "a")[0]
    lits = ", ".join(f"({v!r})" for v in vals)
    want_sum = ddb.execute(
        f"SELECT CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) "
        f"FROM (VALUES {lits}) t(v)"
    ).fetchone()[0]
    want_avg = ddb.execute(
        f"SELECT CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / COUNT(v) "
        f"FROM (VALUES {lits}) t(v)"
    ).fetchone()[0]
    assert got_sum == want_sum
    assert got_avg == want_avg


def test_epoch_s_matches_duckdb(spark, ddb):
    stamps = [
        "2024-01-01 00:00:00",
        "2024-06-15 23:59:59",
        "1999-12-31 12:34:56",
    ]
    sdf = spark.createDataFrame([(s,) for s in stamps], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    got = _spark_vals(spark, sdf.select(epoch_s("ts", "e")), "e")
    want = [
        ddb.execute(
            f"SELECT {sql_epoch_s(f'TIMESTAMP ' + repr(s))}"
        ).fetchone()[0]
        for s in stamps
    ]
    assert got == want
