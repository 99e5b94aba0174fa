"""Deterministic sampling / dataset-split operators (post-survey addition).

A training-data pipeline needs reproducible splits: the same row must land
in the same split on every run, on any cluster size, with no shuffle and no
coordination.  Random `df.sample()` can't give that across engines (RNG
streams are engine- and partitioning-specific), so these operators derive
the split from a *content hash of the key*: bucket = first 6 hex digits of
md5(key) mod 100.  That is engine-neutral (md5 is md5 everywhere), stable
under repartitioning, and embarrassingly parallel — the 100 TB plan is a
map-only scan, zero shuffles.

At real scale you would swap md5 for xxhash64 (Spark-side only, ~10×
faster); md5 is used here because the DuckDB oracle must reproduce the
bucket bit-for-bit (SURVEY.md §5.3 determinism discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from ..canon import md5_int, sql_md5_int
from ..io import hint_if, load_table, spread_width, table_rows
from ..registry import register


def _bucket(key_col: str):
    """Engine-neutral hash bucket in [0,100): first 6 md5 hex digits mod 100."""
    return md5_int(F.col(key_col), 6) % 100


def _sql_bucket(key_expr: str) -> str:
    return f"{sql_md5_int(f'CAST({key_expr} AS VARCHAR)', 6)} % 100"


def _uniform(key_col: str):
    """md5-as-uniform draw in [0,1): first 32 hash bits / 2^32 (one shared
    definition for the Bernoulli samplers)."""
    return md5_int(F.col(key_col), 8).cast("double") / 4294967296.0


@register(
    "sample_hash_split",
    oracle=f"""
    SELECT o_orderkey,
           CASE WHEN {_sql_bucket('o_orderkey')} < 80 THEN 'train'
                WHEN {_sql_bucket('o_orderkey')} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM orders
    """,
)
def sample_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment keyed on
    md5(o_orderkey).  Map-only: no shuffle, no RNG state, identical on
    1 or 1000 executors — the reproducible-split primitive every training
    pipeline needs."""
    o = load_table(spark, sf_dir, "orders")
    b = _bucket("o_orderkey")
    return o.select(
        "o_orderkey",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_sql_bucket('doc_id')} < 25
    """,
)
def sample_stratified(spark, sf_dir):
    """Deterministic ~25% per-stratum sample of the corpus.  Because the
    hash is uniform and independent of `lang`, filtering bucket<25 samples
    every stratum at the same rate without a per-group pass — contrast
    `df.sampleBy`, which needs per-key fractions and an RNG.  Map-only at
    any scale; the rate is exact in expectation and verified per-lang in
    tests/test_ml_quality.py."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_bucket("doc_id") < 25).select("doc_id", "lang", "source")


@register(
    "sample_weighted",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           least(1.0, o_totalprice / 400000.0) AS keep_prob
    FROM orders
    WHERE CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
               AS BIGINT) / 4294967296.0
          < least(1.0, o_totalprice / 400000.0)
    """,
)
def sample_weighted(spark, sf_dir):
    """Deterministic weighted Bernoulli sample: each order survives with
    probability proportional to its value (importance sampling for training
    mixes — upweight rare high-value rows without an RNG).  The uniform
    draw is md5(key)'s first 32 bits / 2^32 — engine-neutral, repartition-
    stable, map-only; the same hash-as-uniform trick as sample_hash_split
    with a per-row threshold instead of a global one."""
    o = load_table(spark, sf_dir, "orders")
    u = _uniform("o_orderkey")
    p = F.least(F.lit(1.0), F.col("o_totalprice") / 400000.0)
    return o.filter(u < p).select(
        "o_orderkey", "o_totalprice", p.alias("keep_prob")
    )


@register(
    "sample_temperature",
    oracle="""
    WITH mass AS (
      SELECT source, sum(n_chars) AS m FROM documents GROUP BY source
    ), lo AS (SELECT min(m) AS m_min FROM mass),
    rate AS (
      SELECT source,
             sqrt(CAST(m_min AS DOUBLE) / CAST(m AS DOUBLE)) AS keep_prob
      FROM mass CROSS JOIN lo
    )
    SELECT d.doc_id, d.source, r.keep_prob
    FROM documents d JOIN rate r ON d.source = r.source
    WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) / 4294967296.0
          < r.keep_prob
    """,
)
def sample_temperature(spark, sf_dir):
    """Temperature-weighted source rebalancing (T = 0.5): the LLM-corpus
    mixture recipe that upsamples small sources and downsamples dominant
    ones so the sampled corpus' source shares follow mass^T instead of raw
    mass.  Per-doc keep probability is p_s = (m_min / m_s)^0.5 — the
    smallest source keeps 100%, a source 100x its size keeps 10%.

    Determinism: m_s and m_min are exact integer char masses; p_s is one
    IEEE division + one IEEE sqrt (both correctly rounded, so engine-
    identical), and the Bernoulli draw is the same md5-as-uniform trick as
    sample_weighted — no RNG, repartition-stable.  Plan: the per-source
    mass table is |sources|-sized (tiny) and BROADCAST back onto the doc
    scan, so at 100 TB this is one partial-agg pass plus a map-only
    filter — no shuffle of the corpus itself."""
    d = load_table(spark, sf_dir, "documents")
    # localCheckpoint: mass feeds both the min() scalar and the rate table;
    # the cut keeps this at the 2-pass minimum (one aggregate pass + one
    # filter pass) instead of re-scanning the corpus for the minimum
    mass = d.groupBy("source").agg(F.sum("n_chars").alias("m")).localCheckpoint(eager=False)
    lo = mass.agg(F.min("m").alias("m_min"))
    rate = (
        mass.crossJoin(F.broadcast(lo))
        .withColumn(
            "keep_prob",
            F.sqrt(F.col("m_min").cast("double") / F.col("m").cast("double")),
        )
        .select("source", "keep_prob")
    )
    u = _uniform("doc_id")
    return (
        d.join(F.broadcast(rate), "source")
        .filter(u < F.col("keep_prob"))
        .select("doc_id", "source", "keep_prob")
    )


@register(
    "sample_reservoir",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 16) AS h
    FROM orders
    ORDER BY h, o_orderkey LIMIT 500
    """,
)
def sample_reservoir(spark, sf_dir):
    """Deterministic fixed-size uniform sample (the reservoir-sampling
    contract without the RNG): rank every row by md5(key) and keep the k
    smallest.  Because the hash is uniform over keys, the k winners are a
    uniform k-subset — and unlike a classic reservoir, the SAME subset on
    every run, any partitioning, any engine (the reproducible-eval-set
    primitive: "the" 500 held-out orders).

    Plan: ORDER BY + LIMIT compiles to TakeOrderedAndProject — each task
    keeps a local k-heap and only k rows per task travel to the driver, so
    at 100 TB this is a map-only pass moving O(k × tasks) rows, never a
    global sort (plan-asserted in tests/test_plans.py).  The hash column
    is emitted so downstream consumers can merge reservoirs: the union of
    two reservoirs re-ranked by h is the reservoir of the union."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_totalprice",
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 16).alias("h"),
        )
        .orderBy("h", "o_orderkey")
        .limit(500)
    )


@register(
    "sample_class_balanced",
    oracle=f"""
    WITH m AS (
      SELECT min(cnt) AS m FROM (
        SELECT count(*) AS cnt FROM embeddings GROUP BY label
      )
    ), r AS (
      SELECT vec_id, label,
             row_number() OVER (
               PARTITION BY label
               ORDER BY {sql_md5_int("CAST(vec_id AS VARCHAR)", 8)}, vec_id
             ) AS sample_rank
      FROM embeddings
    )
    SELECT vec_id, label, sample_rank FROM r, m WHERE sample_rank <= m.m
    """,
)
def sample_class_balanced(spark, sf_dir):
    """Class-balanced downsampling: every label keeps exactly min-class-size
    rows — the class-imbalance fix for classifier training data (upsampled
    heads drown minority labels; balancing by the SMALLEST class needs no
    replication).  Which rows survive is decided by md5(vec_id) rank, so
    the subsample is deterministic, engine-neutral, and repartition-stable
    (no RNG) — the same hash-as-uniform primitive as sample_hash_split,
    lifted from a global threshold to a per-group quota.

    Scale shape: one count aggregate (|labels| rows, broadcast as a 1-row
    scalar), one row_number window partitioned by label.  The window
    shuffles on label — for a 100 TB corpus with few labels, the skew-safe
    variant first filters with the uniform draw to ~2x the quota per class
    (map-only), THEN ranks the survivors; the fixture's 10 labels x 50
    rows need no such pre-filter."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    m = e.groupBy("label").count().agg(F.min("count").alias("m"))
    w = W.partitionBy("label").orderBy(md5_int(F.col("vec_id"), 8), "vec_id")
    return (
        e.withColumn("sample_rank", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .filter(F.col("sample_rank") <= F.col("m"))
        .select("vec_id", "label", "sample_rank")
    )


@register(
    "sample_negative_pairs",
    oracle=f"""
    WITH users AS (SELECT DISTINCT o_custkey AS user_id FROM orders),
    pos AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    items AS (
      SELECT p_partkey AS item_id,
             row_number() OVER (ORDER BY p_partkey) AS rn
      FROM part
    ),
    n AS (SELECT count(*) AS n_items FROM part),
    cand AS (
      SELECT u.user_id, gs.j,
             1 + {sql_md5_int("CAST(u.user_id AS VARCHAR) || '#' || CAST(gs.j AS VARCHAR)", 6)} % n.n_items AS rn
      FROM users u
      CROSS JOIN n
      CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS j) gs
    ),
    negs AS (
      SELECT c.user_id, i.item_id, min(c.j) AS first_draw
      FROM cand c JOIN items i USING (rn)
      WHERE NOT EXISTS (
        SELECT 1 FROM pos p
        WHERE p.user_id = c.user_id AND p.item_id = i.item_id
      )
      GROUP BY c.user_id, i.item_id
    )
    SELECT user_id, item_id, neg_rank FROM (
      SELECT user_id, item_id,
             row_number() OVER (
               PARTITION BY user_id ORDER BY first_draw, item_id
             ) AS neg_rank
      FROM negs
    ) WHERE neg_rank <= 3
    """,
)
def sample_negative_pairs(spark, sf_dir):
    """Deterministic negative sampling for contrastive / implicit-feedback
    training: for every user, draw 8 candidate catalog items via the
    engine-neutral md5(user#draw) trick, drop any the user actually bought
    (anti-join against the positives), and keep the first 3 survivors.
    RNG-free, so the same (user, negative) pairs come out on any cluster
    size or partitioning — the property that makes training re-runs and
    ablations comparable.

    100 TB: the item catalog (with its row_number index) and the item
    count are broadcast — catalogs are millions of rows while users are
    billions, so the only shuffles are the positives' distinct and the
    anti-join, both keyed on (user_id, item_id).  The candidate fan-out is
    a map-side explode of a literal 1..8 sequence.  The global row_number
    over the catalog is the one full sort; it touches only the small side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    users = o.select(F.col("o_custkey").alias("user_id")).distinct()
    pos = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .distinct()
    )
    items = p.select(
        F.col("p_partkey").alias("item_id"),
        F.row_number().over(W.orderBy("p_partkey")).alias("rn"),
    )
    n = p.agg(F.count(F.lit(1)).alias("n_items"))
    cand = (
        users.select(
            "user_id", F.explode(F.sequence(F.lit(1), F.lit(8))).alias("j")
        )
        .crossJoin(F.broadcast(n))
        .select(
            "user_id",
            "j",
            (
                1
                + md5_int(
                    F.concat_ws("#", F.col("user_id"), F.col("j")), 6
                )
                % F.col("n_items")
            ).alias("rn"),
        )
    )
    negs = (
        # items is catalog-derived (scales with parts): gated hint
        cand.join(hint_if(items, table_rows(sf_dir, "part") * 16), "rn")
        .join(pos, ["user_id", "item_id"], "left_anti")
        .groupBy("user_id", "item_id")
        .agg(F.min("j").alias("first_draw"))
    )
    w = W.partitionBy("user_id").orderBy("first_draw", "item_id")
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= 3)
        .select("user_id", "item_id", "neg_rank")
    )


@register(
    "sample_importance_downweight",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(CASE WHEN n_chars < 200 THEN 0.25
                       WHEN n_chars < 400 THEN 0.5
                       ELSE 1.0 END AS DOUBLE) AS p_keep
      FROM documents
    )
    SELECT doc_id, n_chars, p_keep,
           CAST(1.0 AS DOUBLE) / p_keep AS weight
    FROM d
    WHERE {sql_md5_int("CAST(doc_id AS VARCHAR)", 8)} / 4294967296.0 < p_keep
    """,
)
def sample_importance_downweight(spark, sf_dir):
    """Importance downsampling with correction weights: over-represented
    strata (here: short boilerplate-ish documents) are kept with
    probability p < 1, and every survivor carries weight = 1/p so any
    downstream weighted statistic stays unbiased — the standard way to
    shrink a skewed corpus without biasing the training mixture
    (Horvitz-Thompson estimator).

    The accept draw is the md5-as-uniform primitive (md5(doc_id) first 32
    bits / 2^32 — engine-neutral, RNG-free, repartition-stable), shared
    with sample_hash_split.  Determinism: p is one of {{0.25, 0.5, 1.0}}
    (exact binary fractions, so 1/p is exactly 4, 2, 1), the draw is an
    exact integer scaled by an exact power of two, and the comparison is a
    single IEEE <.  Scale: map-only — filter + two projected columns, zero
    shuffles, pushdown-friendly (the n_chars predicate and doc_id hash
    both run at the scan)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    p = (
        F.when(F.col("n_chars") < 200, 0.25)
        .when(F.col("n_chars") < 400, 0.5)
        .otherwise(1.0)
    )
    return (
        d.withColumn("p_keep", p)
        .filter(_uniform("doc_id") < F.col("p_keep"))
        .select(
            "doc_id",
            "n_chars",
            "p_keep",
            (F.lit(1.0) / F.col("p_keep")).alias("weight"),
        )
    )


# Poisson(1) CDF cutpoints for the inverse-CDF bootstrap draw: P(X <= k)
# for k = 0..6 (beyond that the residual mass is ~8e-5; the draw caps at 7).
# Written as explicit double literals so BOTH engines compare the exact
# same 64-bit constants.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def _sql_pois1(u_expr: str) -> str:
    branches = "".join(
        f" WHEN {u_expr} < {c!r} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE{branches} ELSE 7 END"


@register(
    "sample_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT o.o_orderkey, o.o_totalprice, r.r AS rep,
             {_sql_pois1(
                 "CAST('0x' || substring(md5(CAST(o.o_orderkey AS VARCHAR)"
                 " || '#' || CAST(r.r AS VARCHAR)), 1, 8) AS BIGINT)"
                 " / 4294967296.0"
             )} AS w
      FROM orders o CROSS JOIN (SELECT unnest(range(32)) AS r) r
    )
    SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(CAST(w * o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / SUM(w) AS boot_mean
    FROM reps WHERE w > 0
    GROUP BY rep
    """,
)
def sample_bootstrap_ci(spark, sf_dir):
    """Deterministic Poisson bootstrap: 32 resample replicates of the mean
    order value, each row contributing a Poisson(1)-distributed integer
    weight per replicate — the distributed-bootstrap recipe (a true
    n-out-of-n resample needs global coordination; Poisson weights are
    independent per row, so the whole thing is map-side).  Downstream, the
    spread of the 32 replicate means IS the sampling-error estimate for
    the corpus statistic.

    The Poisson draw is inverse-CDF over the md5-as-uniform primitive
    keyed on (order, replicate) — engine-neutral, RNG-free,
    repartition-stable — against 7 explicit double CDF cutpoints shared
    verbatim with the oracle, so every weight is bit-identical.  Replicate
    sums accumulate w*price in exact DECIMAL (order-free), one IEEE
    division per replicate at the end.  Scale: a 32x row expansion
    map-side (spread across cores first — see the repartition note below),
    immediately partial-aggregated to 32 groups BEFORE the shuffle —
    per-executor state is 32 rows, wire traffic O(32 x tasks); at 100 TB
    the expansion never materializes."""
    # orders ships as one parquet file -> one input partition; without an
    # explicit spread the 32x explode + 4.8M md5 draws run on ONE core
    # (measured 15.3 -> 1.1 s at sf0.1 with the spread).  On a cluster
    # this is the one-hot-core vs N-cores difference (the text_tfidf_ml
    # lesson); the round-robin exchange moves only the 2-column projection.
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartition(spread_width(spark))
    )
    reps = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("rep"),
    )
    u = (
        md5_int(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit("#"),
                F.col("rep").cast("string"),
            ),
            8,
        ).cast("double")
        / 4294967296.0
    )
    w = F.lit(7)
    for k, c in reversed(list(enumerate(_POIS1_CDF))):
        w = F.when(u < F.lit(c), k).otherwise(w)
    return (
        reps.withColumn("w", w)
        .filter(F.col("w") > 0)
        .groupBy("rep")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            (
                F.sum(
                    (F.col("w") * F.col("o_totalprice")).cast("decimal(18,2)")
                ).cast("double")
                / F.sum("w")
            ).alias("boot_mean"),
        )
    )


@register(
    "pipeline_dp_counts",
    oracle="""
    WITH grp AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day_idx,
           CASE WHEN n < 25 THEN NULL
                ELSE GREATEST(
                  n + CAST('0x' || substring(
                        md5(event_type || ':' || CAST(day_idx AS VARCHAR)),
                        1, 8) AS BIGINT) % 21 - 10,
                  0)
           END AS noisy_n,
           n < 25 AS suppressed
    FROM grp
    """,
)
def pipeline_dp_counts(spark, sf_dir):
    """Privacy-preserving release of grouped counts: integer noise drawn
    deterministically per GROUP (md5-seeded uniform on [-10, 10], the
    randomized-response / discrete-noise shape of a DP release) plus
    k-anonymity suppression — groups under k=25 publish NULL, never the
    true count.  The released table carries ONLY noisy_n and the
    suppression flag; the true count exists in the plan but not the
    output, which is the actual contract of an anonymized export.
    Seeding noise from a content hash of the group key (canon.py
    md5_int doctrine) makes the release reproducible across engines and
    partitionings — a real DP deployment swaps the hash for calibrated
    Laplace draws, the pipeline shape is identical.

    100 TB: one partial-agg exchange collapsing to |types|×|days| rows;
    noise + suppression are row-local over that tiny rollup, so the
    privacy layer adds zero data-scale cost."""
    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) DIV {DAY_US}").alias("day_idx"),
    ).agg(F.count("*").alias("n"))
    noise = (
        md5_int(F.concat_ws(":", "event_type", "day_idx"), 8) % 21 - 10
    )
    return grp.select(
        "event_type",
        "day_idx",
        F.when(F.col("n") < 25, F.lit(None).cast("long"))
        .otherwise(F.greatest(F.col("n") + noise, F.lit(0)))
        .alias("noisy_n"),
        (F.col("n") < 25).alias("suppressed"),
    )


@register(
    "sample_neyman_alloc",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc
      FROM events
    ), m AS (
      SELECT event_type, count(*) AS n,
             CAST(SUM(xc) AS DOUBLE) / 100.0 AS s1,
             CAST(SUM(CAST(xc AS DECIMAL(19,0)) * xc) AS DOUBLE)
               / 10000.0 AS s2
      FROM c GROUP BY event_type
    ), s AS (
      SELECT event_type, n,
             CASE WHEN n >= 2 AND s2 - n * (s1 / n) * (s1 / n) > 0
                  THEN sqrt((s2 - n * (s1 / n) * (s1 / n)) / (n - 1))
                  ELSE 0.0 END AS sd
      FROM m
    ), q AS (
      SELECT event_type, n, sd,
             CAST(floor(CAST(n AS DOUBLE) * sd * 1000000.0) AS BIGINT)
               AS nsq
      FROM s
    )
    SELECT event_type, n AS n_rows, sd AS stddev,
           CASE WHEN SUM(nsq) OVER () > 0
                THEN CAST(nsq AS DOUBLE) / CAST(SUM(nsq) OVER () AS DOUBLE)
           END AS weight,
           CASE WHEN SUM(nsq) OVER () > 0
                THEN CAST(floor(1000.0 * CAST(nsq AS DOUBLE)
                           / CAST(SUM(nsq) OVER () AS DOUBLE)) AS BIGINT)
           END AS n_alloc
    FROM q
    """,
)
def sample_neyman_alloc(spark, sf_dir):
    """Neyman optimal allocation for stratified sampling: split a fixed
    sample budget (1000) across strata proportional to N_h·S_h — the
    design that minimizes estimator variance, and the step EVERY
    serious stratified sampler (sample_stratified draws; this op decides
    HOW MUCH to draw) runs first.  Per-stratum stddev comes from exact
    integer-cent moments (the agg_stddev_exact recipe, DECIMAL-promoted
    before the square per the ts_autocorr wrap lesson); N_h·S_h is then
    floor-quantized to integer micro-units BEFORE the cross-strata
    total, because a SUM of doubles is shuffle-order-dependent but an
    integer sum is associative — the determinism trick that makes the
    allocation itself oracle-able.

    100 TB: one partial-agg exchange to |strata| rows; the allocation
    math is a window over that tiny table.  sqrt is IEEE-exact in both
    engines (unlike ln/exp), so S_h is bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    xc = F.round(F.col("value") * 100).cast("long")
    m = (
        ev.select("event_type", xc.alias("xc"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum("xc").cast("double") / 100.0).alias("s1"),
            (
                F.sum(F.col("xc").cast("decimal(19,0)") * F.col("xc")).cast(
                    "double"
                )
                / 10000.0
            ).alias("s2"),
        )
    )
    # lazily-guarded CASE: a single-row stratum ((n-1)=0 divides by zero —
    # Spark runs ANSI-on where that THROWS while DuckDB yields NULL) or a
    # constant-value stratum (float cancellation can push the variance an
    # epsilon negative, where DuckDB's sqrt ERRORS and Spark yields NaN)
    # clamps to sd=0: no variance evidence -> zero Neyman budget, the same
    # semantics the planted zero-variance test pins.
    var = (
        F.col("s2")
        - F.col("n") * (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
    )
    sd = F.when(
        (F.col("n") >= 2) & (var > 0), F.sqrt(var / (F.col("n") - 1))
    ).otherwise(F.lit(0.0))
    q = m.select(
        "event_type",
        "n",
        sd.alias("sd"),
    ).withColumn(
        "nsq",
        F.floor(F.col("n").cast("double") * F.col("sd") * 1000000.0).cast(
            "long"
        ),
    )
    tot = F.sum("nsq").over(W.partitionBy())
    # all-degenerate corpus (every stratum clamped to sd=0) zeroes the
    # total: NULL weight in both engines instead of an ANSI 0/0 throw
    ratio = F.when(
        tot > 0, F.col("nsq").cast("double") / tot.cast("double")
    )
    return q.select(
        "event_type",
        F.col("n").alias("n_rows"),
        F.col("sd").alias("stddev"),
        ratio.alias("weight"),
        F.floor(1000.0 * ratio).cast("long").alias("n_alloc"),
    )
