"""Skew-injection stress gate — the fixtures are uniform, real data isn't.

The corpus tables are key-uniform, so nothing in the oracle suite ever
exercises the hot-key path the skew recipes exist for.  This gate INJECTS
the pathology: a synthetic fact table where one tenant owns 30% of all
rows (the docstring scenario of ``join_skew_salted``), then checks the
three claims the 100 TB design leans on:

1. the manual salt recipe is *value-identical* to the plain join under
   real skew (bit-identical canonicalized rows, decimal sums included);
2. the salt measurably SPREADS the hot key: max per-partition share after
   a (key, salt) exchange drops by >=4x vs a key-only exchange;
3. AQE's skew-join split actually engages on the session's config when a
   sort-merge join sees a skewed partition (``skew=true`` in the final
   adaptive plan) — i.e. nothing in our session setup disables the
   runtime safety net that handles the skew we did NOT predict;
4. the hot-key AGGREGATE shape: two-stage partial aggregation bounds the
   shuffle to tasks*keys records (measured via the exchange's
   ``shuffleRecordsWritten`` metric), value-exact vs a pandas recompute;
5. the hot-key WINDOW shape: row_number()<=k rewrites to WindowGroupLimit
   whose partial mode prunes map-side, bounding the wire to tasks*keys*k
   records — the hot tenant never ships 30% of the table to one reducer.

Deterministic: numpy PCG64 with a fixed seed, written to parquet once per
session so every check reads a real scan, not a parallelized local list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F
from pyspark.sql import Window as W

from tests.conftest import canon_rows

N_ROWS = 240_000
N_KEYS = 2_000
HOT_KEY = 7
HOT_FRAC = 0.30
N_SALT = 8


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("skew")
    rng = np.random.default_rng(42)
    n_hot = int(N_ROWS * HOT_FRAC)
    keys = np.concatenate(
        [
            np.full(n_hot, HOT_KEY, dtype=np.int64),
            rng.integers(0, N_KEYS, size=N_ROWS - n_hot, dtype=np.int64),
        ]
    )
    fact = pd.DataFrame(
        {
            "row_id": np.arange(N_ROWS, dtype=np.int64),
            "key": keys,
            # two-decimal prices so the DECIMAL(18,2) sum is exact
            "price": np.round(rng.uniform(1, 1000, size=N_ROWS), 2),
        }
    )
    dim = pd.DataFrame(
        {
            "key": np.arange(N_KEYS, dtype=np.int64),
            "segment": [f"SEG{k % 5}" for k in range(N_KEYS)],
        }
    )
    fact_path, dim_path = str(root / "fact.parquet"), str(root / "dim.parquet")
    # 8 input files so the fact scan starts parallel, like a real table
    spark.createDataFrame(fact).repartition(8).write.mode("overwrite").parquet(
        fact_path
    )
    spark.createDataFrame(dim).coalesce(1).write.mode("overwrite").parquet(
        dim_path
    )
    return {"fact": fact_path, "dim": dim_path}


def _agg(joined):
    return joined.groupBy("segment").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("price").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


def _canon(df):
    cols = df.columns
    return canon_rows(cols, [tuple(r) for r in df.collect()])


def test_salted_join_identical_under_skew(spark, skew_dir):
    """Claim 1: salt + explode(dim) == plain join, bit-for-bit."""
    fact = spark.read.parquet(skew_dir["fact"])
    dim = spark.read.parquet(skew_dir["dim"])

    plain = _agg(fact.join(dim, "key"))

    salted_fact = fact.withColumn(
        "salt", F.pmod(F.col("row_id"), F.lit(N_SALT))
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)]))
    )
    salted = _agg(
        salted_fact.join(
            salted_dim,
            (salted_fact.key == salted_dim.key)
            & (salted_fact.salt == salted_dim.salt),
        )
    )
    assert _canon(plain) == _canon(salted)


def test_salt_spreads_hot_key(spark, skew_dir):
    """Claim 2: the (key, salt) exchange caps the max partition share."""
    fact = spark.read.parquet(skew_dir["fact"])

    def max_share(df, *cols):
        counts = (
            df.repartition(32, *[F.col(c) for c in cols])
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in counts) / N_ROWS

    unsalted = max_share(fact, "key")
    salted = max_share(
        fact.withColumn("salt", F.pmod(F.col("row_id"), F.lit(N_SALT))),
        "key",
        "salt",
    )
    # hot key alone is 30% of rows -> its reducer holds >=30% unsalted;
    # split 8 ways it carries ~3.75% + the uniform background (~3%)
    assert unsalted >= HOT_FRAC
    assert salted <= unsalted / 4, (
        f"salt failed to spread the hot key: {unsalted:.3f} -> {salted:.3f}"
    )


def test_aqe_skew_join_engages(spark, skew_dir):
    """Claim 3: the runtime skew-split is live on this session's config.

    Thresholds are lowered (test data is MBs, the default trigger is
    256 MB) — the point is that AQE skew handling is enabled and reaches
    the final plan, not to reproduce production byte sizes."""
    fact = spark.read.parquet(skew_dir["fact"])
    dim = spark.read.parquet(skew_dir["dim"])
    overrides = {
        # force a sort-merge join (broadcast would hide the skew path)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # keep AQE from pre-coalescing everything into one partition
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        joined = _agg(fact.join(dim, "key"))
        result = {r["segment"]: r["n_rows"] for r in joined.collect()}
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, (
        "AQE skew-join split did not engage on a 30%-hot-key join"
    )
    # and the skew-split join is still correct
    assert sum(result.values()) == N_ROWS


def _shuffle_records_written(df):
    """Execute df and total shuffleRecordsWritten over all exchanges."""
    df.collect()
    ep = df._jdf.queryExecution().executedPlan()
    if ep.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        ep = ep.executedPlan()
    total = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if "QueryStageExec" in name:
            walk(node.plan())
            return
        if name == "ShuffleExchangeExec":
            total.append(node.metrics().apply("shuffleRecordsWritten").value())
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(ep)
    return sum(total)


def test_partial_agg_bounds_hot_key_shuffle(spark, skew_dir):
    """Hot-key AGGREGATE shape: two-stage aggregation means the 30% hot
    key never crosses the wire as rows — each of the 8 map tasks sends at
    most one partial row per key, so the shuffle carries <= tasks*keys
    records no matter how skewed the input.  Values are checked exactly
    against a pandas recompute in integer cents."""
    import pyarrow.parquet as pq

    fact = spark.read.parquet(skew_dir["fact"])
    agg = fact.groupBy("key").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("price").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents"),
    )
    shuffled = _shuffle_records_written(agg)
    # 8 input files x <= N_KEYS partial rows each; the unaggregated rows
    # would be 240k with 72k on the hot key's reducer
    assert shuffled <= 8 * N_KEYS, f"partial agg missing: {shuffled} records"
    assert shuffled < N_ROWS / 5

    pdf = pq.read_table(skew_dir["fact"]).to_pandas()
    pdf["cents"] = (pdf["price"] * 100).round().astype("int64")
    want = pdf.groupby("key").agg(n=("key", "size"), cents=("cents", "sum"))
    got = {r["key"]: (r["n"], r["cents"]) for r in agg.collect()}
    assert got == {k: (int(v.n), int(v.cents)) for k, v in want.iterrows()}


def test_window_topk_prunes_hot_key_map_side(spark, skew_dir):
    """Hot-key WINDOW shape: the row_number()<=k filter must be rewritten
    to WindowGroupLimit, whose PARTIAL mode prunes each map task to its
    own top-k per key BEFORE the exchange — so the hot tenant contributes
    tasks*k rows to the wire, not 30% of the table.  Results checked
    exactly against a pandas top-3."""
    import pyarrow.parquet as pq

    fact = spark.read.parquet(skew_dir["fact"])
    w = W.partitionBy("key").orderBy(F.col("price").desc(), "row_id")
    top3 = (
        fact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("key", "row_id")
    )
    plan = top3._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:3000]
    shuffled = _shuffle_records_written(top3)
    assert shuffled <= 8 * N_KEYS * 3, f"map-side group-limit missing: {shuffled}"
    assert shuffled < N_ROWS / 5

    pdf = pq.read_table(skew_dir["fact"]).to_pandas()
    pdf = pdf.sort_values(["key", "price", "row_id"], ascending=[True, False, True])
    want = set(map(tuple, pdf.groupby("key").head(3)[["key", "row_id"]].values))
    got = {(r["key"], r["row_id"]) for r in top3.collect()}
    assert got == want


def test_max_audience_guard_under_basket_skew(spark, tmp_path):
    """rec_user_user's MAX_AUDIENCE guard, exercised for real (r12): the
    fixtures and even the perturbed-sf1 campaign corpus never cross the
    cap (max audience 53), so this injects the pathology — one item
    bought by EVERY user (audience 5,000 ≫ 1,000) over an otherwise
    uniform basket table — and checks the two claims the guard makes:

    1. the hyper item is dropped BEFORE the quadratic stage: the pair
       expansion volume equals the guarded Σ C(audience, 2), not the
       ~12.5M-pair explosion the hyper item alone would contribute;
    2. the output equals the same pipeline run on the corpus with the
       hyper item removed by hand (the guard IS the semantics)."""
    import math

    import numpy as np

    from recommend_spark.queries.recommender import (
        MAX_AUDIENCE,
        _user_user_pairs,
    )

    n_users, n_items, per_user = 5_000, 4_000, 12
    rng = np.random.default_rng(17)
    rows = [
        (u, int(i))
        for u in range(n_users)
        for i in rng.choice(n_items, size=per_user, replace=False)
    ]
    hyper = n_items + 1
    rows += [(u, hyper) for u in range(n_users)]  # audience = n_users
    b = spark.createDataFrame(rows, "u long, i long").repartition(16)
    b.write.mode("overwrite").parquet(str(tmp_path / "baskets"))
    b = spark.read.parquet(str(tmp_path / "baskets"))

    assert n_users > MAX_AUDIENCE  # the planted item must cross the cap

    # (1) expansion volume: guarded candidate join emits SUM C(aud, 2)
    # over surviving items only
    from pyspark.sql import functions as F

    aud = b.groupBy("i").agg(F.count("*").alias("a"))
    keep = aud.filter(F.col("a") <= MAX_AUDIENCE)
    expect_pairs = (
        keep.select(F.sum(F.col("a") * (F.col("a") - 1) / 2).alias("s"))
        .first()["s"]
    )
    g = b.join(keep.select("i"), "i", "left_semi")
    x, y = g.alias("x"), g.alias("y")
    measured = (
        x.join(
            y,
            (F.col("x.i") == F.col("y.i")) & (F.col("x.u") < F.col("y.u")),
        ).count()
    )
    assert measured == int(expect_pairs), (measured, expect_pairs)
    # the hyper item ALONE would have added C(n_users, 2) pairs on top
    assert math.comb(n_users, 2) > 20 * measured

    # (2) guard semantics: pipeline output == pipeline on hand-pruned corpus
    got = {tuple(r) for r in _user_user_pairs(b).collect()}
    pruned = {
        tuple(r)
        for r in _user_user_pairs(b.filter(F.col("i") != hyper)).collect()
    }
    assert got == pruned and got, (len(got), len(pruned))


def test_max_basket_guard_under_hyper_user_skew(spark, tmp_path):
    """The item-side dual: MAX_BASKET drops hyper-ACTIVE users before the
    co-purchase self-join (a user with B items contributes C(B, 2) item
    pairs).  Same injection shape as the audience test — one user who
    bought every item — pinning the guarded expansion volume exactly and
    guard-equals-hand-pruning semantics."""
    import numpy as np

    from recommend_spark.queries.recommender import (
        MAX_BASKET,
        _copurchase_pairs_from,
        _guard_baskets,
    )

    n_users, n_items, per_user = 3_000, 6_000, 10
    rng = np.random.default_rng(23)
    rows = [
        (u, int(i))
        for u in range(n_users)
        for i in rng.choice(n_items, size=per_user, replace=False)
    ]
    hyper_u = n_users + 1
    rows += [(hyper_u, i) for i in range(n_items)]  # basket = n_items
    b = spark.createDataFrame(rows, "u long, i long").repartition(16)
    b.write.mode("overwrite").parquet(str(tmp_path / "baskets"))
    b = spark.read.parquet(str(tmp_path / "baskets"))

    assert n_items > MAX_BASKET

    g = _guard_baskets(b)
    # the guard removes exactly the hyper user's rows
    assert g.filter(F.col("u") == hyper_u).count() == 0
    assert g.count() == n_users * per_user

    # expansion volume equals SUM C(basket_len, 2) over surviving users
    expect = (
        g.groupBy("u")
        .agg(F.count("*").alias("n"))
        .select(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("s"))
        .first()["s"]
    )
    x, y = g.alias("x"), g.alias("y")
    measured = x.join(
        y, (F.col("x.u") == F.col("y.u")) & (F.col("x.i") < F.col("y.i"))
    ).count()
    assert measured == int(expect), (measured, expect)

    got = {tuple(r) for r in _copurchase_pairs_from(g).collect()}
    pruned = {
        tuple(r)
        for r in _copurchase_pairs_from(
            b.filter(F.col("u") != hyper_u)
        ).collect()
    }
    assert got == pruned, (len(got), len(pruned))
