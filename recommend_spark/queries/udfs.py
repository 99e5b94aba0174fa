"""§2.12 UDF / UDAF / UDTF surface.

Policy: every built-in-expressible query in this engine avoids UDFs (they
break whole-stage codegen and re-enter Python); these operators exist to
prove the extension surface works, Arrow-batched where possible.

Oracle determinism for Python-side float math: money values are exact
multiples of 0.01, so UDFs convert to integer cents (exact int64 sums) and
replicate the oracle's IEEE op sequence exactly — see each docstring.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..io import load_table
from ..registry import register


@register(
    "udf_scalar_py",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
)
def udf_scalar_py(spark, sf_dir):
    """Row-at-a-time Python UDF (the slow path, kept off hot queries).
    Per-row IEEE arithmetic matches the SQL twin bit-for-bit."""

    @udf("double")
    def net(price, discount):
        return price * (1.0 - discount)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
)
def udf_scalar_pandas(spark, sf_dir):
    """Same function as udf_scalar_py but Arrow-vectorized (numpy float64
    elementwise == IEEE scalar ops) — the 10-100x faster Python path."""

    @pandas_udf("double")
    def net(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "udaf_grouped_agg",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
    FROM lineitem GROUP BY l_partkey
    """,
)
def udaf_grouped_agg(spark, sf_dir):
    """Grouped-agg pandas UDF: quantity-weighted mean price per part.

    Exactness: price*qty and qty are exact multiples of 0.01 → sum in integer
    cents (int64, no overflow at this scale), then one double division —
    bit-identical to the DECIMAL oracle."""

    @pandas_udf("double")
    def wavg(pq: pd.Series, q: pd.Series) -> float:
        pq_cents = (pq * 100).round().astype("int64").sum()
        q_cents = (q * 100).round().astype("int64").sum()
        return (pq_cents / 100.0) / (q_cents / 100.0)

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "pq", F.col("l_extendedprice") * F.col("l_quantity")
    )
    return li.groupBy("l_partkey").agg(wavg("pq", "l_quantity").alias("wavg_price"))


@register(
    "udtf_grouped_map",
    oracle="""
    WITH s AS (
      SELECT l_partkey,
             count(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sx2
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
           CASE WHEN s.n > 1
                 AND (s.sx2 - s.n * (s.sx / s.n) * (s.sx / s.n)) / (s.n - 1) > 0
                THEN (l.l_extendedprice - s.sx / s.n)
                     / sqrt((s.sx2 - s.n * (s.sx / s.n) * (s.sx / s.n)) / (s.n - 1))
                END AS z_price
    FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
    """,
)
def udtf_grouped_map(spark, sf_dir):
    """applyInPandas per-group transform: z-score of price within part.

    The UDF computes mean/std from exact integer-cent sums and replicates
    the oracle's float op sequence (sx/n, (sx2 - n*m*m)/(n-1), sqrt) so the
    z-scores match bit-for-bit; degenerate groups (n==1 or zero variance)
    emit NULL in both engines.

    Scale shape: grouping directly on l_partkey hands applyInPandas ~20k
    tiny groups (one Python call each — pure overhead).  Instead we group
    on a 64-way hash bucket of the key and do the per-key math vectorized
    inside each pandas batch: same semantics, 64 UDF invocations, and the
    bucket count scales with executor count rather than key cardinality."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # int64 cents are exact: |price| < ~1e7 cents, squares < 1e14,
        # per-key sums stay far below 2^63 at any plausible group size.
        cents = (pdf["l_extendedprice"] * 100).round().astype("int64")
        g = pdf.assign(_c=cents, _c2=cents * cents).groupby(
            "l_partkey", sort=False
        )
        stats = g.agg(n=("_c", "size"), sc=("_c", "sum"), sc2=("_c2", "sum"))
        sx = stats["sc"].to_numpy() / 100.0
        sx2 = stats["sc2"].to_numpy() / 10000.0
        n = stats["n"].to_numpy().astype(np.float64)
        m = sx / n
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (sx2 - n * m * m) / (n - 1)
        sd = np.sqrt(np.where(var > 0, var, np.nan))
        m = np.where(n > 1, m, np.nan)
        lookup = pd.DataFrame(
            {"l_partkey": stats.index, "_m": m, "_sd": sd}
        )
        out = pdf.merge(lookup, on="l_partkey", how="left")
        out["z_price"] = (out["l_extendedprice"] - out["_m"]) / out["_sd"]
        return out[["l_orderkey", "l_linenumber", "l_partkey", "z_price"]]

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
    )
    return (
        li.withColumn("bucket", F.pmod(F.col("l_partkey"), F.lit(64)))
        .groupBy("bucket")
        .applyInPandas(
            lambda pdf: zscore(pdf),
            "l_orderkey long, l_linenumber int, l_partkey long, z_price double",
        )
    )


@register(
    "udtf_map_partitions",
    oracle="""
    SELECT o_orderkey, 'base' AS component, o_totalprice AS amount FROM orders
    UNION ALL
    SELECT o_orderkey, 'fee' AS component, o_totalprice * 0.05 AS amount FROM orders
    """,
)
def udtf_map_partitions(spark, sf_dir):
    """mapInPandas 1->N row expansion (order -> base + fee components),
    Arrow-batched; numpy vectorized * is IEEE so amounts match the oracle."""

    def expand(batches):
        for pdf in batches:
            base = pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"],
                    "component": "base",
                    "amount": pdf["o_totalprice"],
                }
            )
            fee = pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"],
                    "component": "fee",
                    "amount": pdf["o_totalprice"] * 0.05,
                }
            )
            yield pd.concat([base, fee])

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.mapInPandas(expand, "o_orderkey long, component string, amount double")


@register(
    "udtf_python",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           array_to_string(toks[(i * 10 + 1):((i + 1) * 10)], ' ') AS chunk
    FROM t, unnest(generate_series(0, CAST(ceil(len(toks) / 10.0) AS BIGINT) - 1)) AS g(i)
    """,
)
def udtf_python(spark, sf_dir):
    """Python UDTF (Spark >=3.5 @udtf) exploding each document into 10-token
    chunks via a LATERAL join — the row-generating extension point."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_id int, chunk string")
    class ChunkDoc:
        def eval(self, doc_id, text):
            toks = text.lower().split(" ")
            for i in range(0, (len(toks) + 9) // 10):
                yield doc_id, i, " ".join(toks[i * 10 : (i + 1) * 10])

    spark.udtf.register("rs_chunk_doc", ChunkDoc)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("rs_docs_udtf")
    return spark.sql(
        "SELECT c.* FROM rs_docs_udtf, LATERAL rs_chunk_doc(doc_id, text) c"
    )


@register(
    "udf_batch_inference",
    oracle="""
    SELECT doc_id,
           CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang),
                                  1, 8) AS BIGINT) / 4294967296.0 AS score,
           CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang),
                                  1, 8) AS BIGINT) / 4294967296.0 > 0.5
             AS keep
    FROM documents
    """,
)
def udf_batch_inference(spark, sf_dir):
    """Batch model-inference harness over mapInPandas: score every document
    with an Arrow-batched "model" and gate on the score — the exact
    plumbing (batch iterator in, schema'd frame out, model loaded once per
    worker, never per row) that real classifier/reward-model scoring uses
    in a training-data pipeline.  The model here is a deterministic md5
    stand-in (the container ships no inference runtime), which makes this
    the rare UDF op with a full value-hash oracle: the oracle recomputes
    the same scores in SQL, proving the Python boundary transports values
    exactly.  Swap `fake_model_scores` for an ONNX/torch call and nothing
    else changes."""
    import hashlib

    import pandas as pd

    def fake_model_scores(keys: pd.Series) -> pd.Series:
        # stands in for model.predict(batch); loaded-once semantics would
        # wrap this in a module-level lazy init
        return keys.map(
            lambda k: int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
            / 4294967296.0
        )

    def infer(batches):
        for pdf in batches:
            if len(pdf):
                keys = pdf["doc_id"].astype(str) + ":" + pdf["lang"]
                scores = fake_model_scores(keys)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "score": scores,
                        "keep": scores > 0.5,
                    }
                )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return docs.mapInPandas(infer, "doc_id long, score double, keep boolean")


@register(
    "udf_map_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * l_quantity AS gross
    FROM lineitem
    """,
)
def udf_map_arrow(spark, sf_dir):
    """mapInArrow: the zero-copy Arrow-native batch surface (Spark ≥3.3) —
    completes the Python-boundary matrix alongside row-UDF, pandas-UDF,
    grouped map/agg, mapInPandas and UDTF.  The kernel works directly on
    pyarrow RecordBatches with Arrow compute (no pandas materialization,
    no object boxing), which is the right boundary for columnar libraries
    (polars, numpy via zero-copy buffers, onnxruntime's IOBinding).

    Determinism: one IEEE multiply per row — Arrow's multiply is the same
    binary64 op Catalyst and DuckDB execute, so this op carries a full
    value-hash oracle, proving the Arrow boundary transports values
    bit-exactly.  Plan: narrow map, no shuffle; at 100 TB this is the
    cheapest possible Python surface (Arrow batches stream through
    shared-memory-sized chunks, GIL held only per-batch)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )

    def gross(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("l_orderkey"),
                    b.column("l_linenumber"),
                    pc.multiply(
                        b.column("l_extendedprice"), b.column("l_quantity")
                    ),
                ],
                ["l_orderkey", "l_linenumber", "gross"],
            )

    return li.mapInArrow(
        gross, "l_orderkey long, l_linenumber int, gross double"
    )
