"""Partition-invariance gate — the mechanical check behind every "identical
on 1 or 1000 executors" claim in the docstrings.

Each sampled operator is executed twice in the same session with radically
different shuffle fan-outs (spark.sql.shuffle.partitions = 32 then 3,
runtime-settable so no session restart) and must produce bit-identical
canonicalized rows.  This is what actually breaks when a query leans on
float accumulation order, RNG state, or zipWithIndex-style physical row
order — the three classic partition-count leaks; the canon discipline
(DECIMAL sums, md5-as-uniform draws, total ordering) exists precisely so
this property holds.
"""

from __future__ import annotations

import pytest

from recommend_spark.queries import QUERIES
from tests.conftest import SF_DIR, canon_rows

# Shuffle-heavy representatives of each determinism mechanism:
# decimal-exact aggregation, md5 sampling/bucketing, window ordering,
# hash-join + top-k, banded LSH, sequence packing.
_OPS = [
    "tpch_q1",                 # decimal sums over a group-by
    "agg_stddev_exact",        # decimal moment accumulation
    "agg_cube",                # two-level re-aggregation under Expand
    "agg_percentile_cont",     # single-buffer multi-fraction percentile
    "sample_hash_split",       # md5 bucketing (map-only)
    "sample_negative_pairs",   # md5 draws + anti-join + window top-k
    "win_time_weighted_avg",   # window + decimal-weighted agg
    "events_outlier_mad",      # rank-element medians via windows
    "text_tfidf_sql",          # broadcast idf + per-doc top-k window
    "dedup_minhash_banded",    # banded LSH bucket join
    "pipeline_pack_sequences", # bucketed running-offset packing
    "pipeline_token_budget",   # per-language budget window
    "dedup_simhash",           # hamming-band self-join
    "graph_triangles",         # basket self-join + edge-set reuse
    "events_funnel",           # ordered multi-stage window match
    "pipeline_decontam",       # broadcast shingle-mass anti-filter
    "agg_hll_sketch",          # HLL register max-merge (order-free)
    "text_unigram_surprisal",  # broadcast unigram model join
    "join_skew_salted",        # salt explode + de-salt agg
    "rec_popularity_topk",     # distinct-rewrite two-level agg + top-k
    "sample_temperature",      # temperature-weighted md5 sampling
    "win_sessionize",          # gaps-and-islands session ids
    # the as-of family: union-merge correctness leans entirely on window
    # ordering — exactly what the 32-vs-3 fan-out stresses
    "join_asof",               # backward as-of union-merge
    "join_asof_nearest",       # nearest-mode two-frame union-merge
    "join_asof_tolerance",     # bounded-staleness as-of
    "join_point_in_time",      # SCD2 point-in-time enrichment
    # round-7 additions (agg_heavy_hitters is deliberately absent: its
    # estimates depend on batch boundaries by design — see its docstring)
    "events_session_attribution",  # session window + ignorenulls frames
    "rec_sequential_markov",   # per-customer sequence window + top-k
    "dq_freshness",            # tiny agg + broadcast watermark join
    "mm_embed_matryoshka",     # map-only sequential folds
    "sample_importance_downweight",  # md5-uniform accept + 1/p weights
    "graph_label_propagation", # sparsify window + integer-weight fixpoint
    "events_ab_test",          # md5 arms + exact-moment z statistics
    "sample_bootstrap_ci",     # md5-Poisson weights + decimal replicate sums
    "dq_lang_drift",           # integer share counts + broadcast totals
    "join_asof_forward",       # forward union-merge window ordering
    "ts_seasonal_decompose",   # decimal re-aggregated seasonal indices
    "win_match_recognize",     # ordered session-string fold + regex
    "rec_markov_attribution",  # exact-count matrix -> fixed small solve
    # round-7 second batch
    "agg_quantile_binned",     # mergeable histogram sketch (the claim itself)
    "text_bigram_surprisal",   # per-doc window bigrams + broadcast LM join
    "pipeline_interleave_shards",  # per-shard windows + arithmetic step
    "graph_jaccard_neighbors", # wedge join + broadcast degree join
    "events_cohort_ltv",       # cohort join + decimal revenue cells
    "events_funnel_time",      # two user-keyed aggs + exact percentiles
    "ts_changepoint",          # decimal window sums over the day series
    "ts_autocorr",             # integer-cent moment sums under lag unions
    "events_inter_event_time", # user-keyed lag window + exact-mean agg
    "sql_correlated_subquery", # decorrelated scalar-agg + semi joins
    "rec_user_user",           # item-keyed pair join + symmetric top-k
    "dedup_normalized",        # normalize map + md5 keeper groupBy
    "ts_drawdown",             # decimal prefix-max window
    "events_hourly_profile",   # two-level count aggregate + share join
    "graph_bfs_distances",     # frontier rounds: integer min under unions
    "agg_gini",                # rank window + exact decimal rank-weighted sums
    "pipeline_length_buckets", # map bucketing + integer aggregate
    "dq_benford",              # digit counts + broadcast scalar total
    "rec_eval_hitrate",        # rank-split windows + transition top-k
    "ts_seasonal_outliers",    # dow-index broadcast over decimal dailies
    "mm_embed_dim_stats",      # nano-unit integer moment aggregation
    # round-8 additions
    "win_tumble_tvf",          # window-bucket agg + distinct-user rewrite
    "win_hop_tvf",             # Expand 3x assignment + partial agg
    "win_session_tvf",         # native session_window merge aggregate
    "join_set_similarity",     # prefix-token candidate join + rescore
    "pipeline_ivm_upsert",     # sign-weighted delta full-outer merge
    "rec_eval_replay",         # rank-predicate split + broadcast model
    # round-8 second and third batches
    "pipeline_cdc_apply",      # op-log union + last-writer-wins rank
    "events_concurrency",      # day-partitioned sweep prefix sum + carry
    "ts_linear_forecast",      # integer OLS moments + per-type min window
    "dq_snapshot_diff",        # full-outer key merge + decimal drift sum
    "pipeline_dp_counts",      # md5-seeded noise over a partial agg
    "scan_time_travel",        # log-replayed file-list snapshot reads
    "text_unicode_clean",      # map-only normalization kernel + md5 hash
    "pipeline_bpe_pairs",      # vocab rollup + pair expansion + top-k
    "sample_neyman_alloc",     # exact moments + micro-unit quantized total
    "events_survival_hazard",  # reverse-cumulative risk-set window
    "pipeline_compaction_planner",  # source-partitioned prefix-sum bins
    "ts_forecast_backtest",    # cumulative-moment window + per-row fit
    "agg_weighted_median",     # tie-insensitive cumulative-weight boundary
    "join_spatial_grid",       # cell-bucketed radius join, integer dist
    "graph_kcore",             # bounded peel cascade, integer degrees
]


def _run_canon(spark, qid):
    df = QUERIES[qid](spark, SF_DIR)
    return canon_rows(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("qid", _OPS)
def test_result_invariant_to_shuffle_partitions(spark, qid):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _run_canon(spark, qid)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _run_canon(spark, qid)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert wide == narrow, f"{qid} output depends on shuffle partition count"


# Cluster-fanout leg: 200 shuffle partitions is the shape a multi-hundred
# executor deployment actually runs (3 and 32 both fit in one task wave on
# local[32]; 200 forces multi-wave scheduling, near-empty partitions, and
# single-row window frames — a different physical regime).  One
# representative per determinism mechanism rather than all of _OPS, since
# the 32-vs-3 sweep already covers the full list every run.
_OPS_CLUSTER = [
    "tpch_q1",                 # decimal sums over a group-by
    "agg_percentile_cont",     # rank-element percentile buffers
    "sample_negative_pairs",   # md5 draws + anti-join + window top-k
    "win_time_weighted_avg",   # window + decimal-weighted agg
    "dedup_minhash_banded",    # banded LSH bucket join
    "join_asof",               # union-merge window ordering
    "join_point_in_time",      # SCD2 as-of union-merge
    "pipeline_pack_sequences", # bucketed running-offset packing
    "graph_bfs_distances",     # iterative frontier unions
    "win_match_recognize",     # ordered session-string fold
    "agg_quantile_binned",     # mergeable histogram sketch
    "events_funnel",           # ordered multi-stage window match
]


@pytest.mark.parametrize("qid", _OPS_CLUSTER)
def test_result_invariant_at_cluster_fanout(spark, qid):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _run_canon(spark, qid)
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        cluster = _run_canon(spark, qid)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert wide == cluster, f"{qid} output depends on 200-partition fan-out"
