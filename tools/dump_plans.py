#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for headline queries.

Run from the repo root: ``python tools/dump_plans.py``.  Each plan's
interesting property is noted above its block; the same properties are
asserted mechanically in tests/test_plans.py — this file exists so a human
can read the plans without running Spark.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from recommend_spark.queries import QUERIES  # noqa: E402
from recommend_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

HEADLINE = {
    "tpch_q6": "all three predicates pushed to the parquet scan; single partial+final agg",
    "tpch_q3": "broadcast dims, pushed date filters, TakeOrderedAndProject top-10",
    "join_broadcast": "dim chain broadcast: fact side never shuffles",
    "join_bucketed": "co-located bucketed SMJ: zero Exchange below the join",
    "win_topk_per_group": "rank-filter recognized as WindowGroupLimit (partial top-k before shuffle)",
    "sample_hash_split": "deterministic split is map-only: no Exchange anywhere",
    "agg_count_avg": "hash aggregate with map-side partial aggregation",
    "sim_knn_join": "zero-shuffle block kernel for exact kNN",
    "join_bloom_filter": "build side collapsed to 128 broadcast slots; fact filtered map-side",
    "rec_item_item": "basket self-join + broadcast count dims; top-k window after min-count prune",
    "agg_argmax": "arg-max as one partial+final struct-max aggregate (no window sort)",
    "events_anomaly_days": "daily pre-agg, then broadcast moment join — no second fact shuffle",
    "agg_bitmap_distinct": "exact distinct via two constant-width aggregates (bit_or bitmap + popcount), no expanding distinct shuffle",
    "dedup_paragraph": "chunk explode, ONE hash shuffle on chunk hash, small shared set broadcast back onto the stream",
    "sql_recursive_cte": "recursion reads the staged edge artifact (parquet scan in the loop), not the quadratic derivation",
    "pipeline_pack_sequences": "window (running offset) and per-bin agg share ONE bucket-key Exchange",
    "sample_reservoir": "md5-rank k-sample compiles to TakeOrderedAndProject (per-task heaps)",
    "text_pmi_collocations": "vocab-sized unigram tables broadcast back twice; corpus-sized stage is only the token explode",
    "win_time_weighted_avg": "lead window and grouped agg share ONE user_id Exchange; DECIMAL-exact partial agg",
    "sample_negative_pairs": "item catalog + count broadcast (user fan-out never shuffles for the lookup); per-user top-3 pushed down as WindowGroupLimit",
    "pipeline_doc_chunks": "stride-window chunking is pure map-side: zero Exchange",
    "pipeline_quality_filter": "Gopher rules via higher-order functions: pure narrow map, zero Exchange",
    "pipeline_interleave_shards": "global training order with NO SinglePartition exchange: per-shard windows + 8-row broadcast",
    "agg_quantile_binned": "histogram sketch: partial+final count merge, shuffle carries |groups|x|bins| rows",
    "sql_correlated_subquery": "EXISTS and scalar COUNT decorrelated into keyed joins sharing one o_custkey shuffle",
    "rec_user_user": "item-keyed pair join; basket sizes broadcast; per-user top-3 as WindowGroupLimit",
    "pipeline_cdc_apply": "op-log union + last-writer-wins rank: ONE key exchange, same bill as a GROUP BY",
    "events_concurrency": "day-partitioned sweep-line: no SinglePartition exchange; midnight carry joins broadcast",
    "text_unicode_clean": "normalization kernel: zero Exchange, one codegen span over the scan",
    "join_spatial_grid": "radius join as cell equi-join: 3x3 probe expand, exact integer distance filter, no cartesian",
    "agg_weighted_median": "weights collapse to distinct values via partial agg BEFORE the ordered window",
    "pipeline_bpe_pairs": "vocab rollup, then pair expansion over |vocab| (corpus-size-free); TakeOrdered top-20",
    "scan_time_travel": "two snapshot reads planning only log-live files; no joins, per-priority rollups union",
    "join_set_similarity": "prefix-filter candidates via token equi-join; rarity order lives in the per-doc window (no global-rank SinglePartition sort)",
    "agg_tdigest": "partial digests map-side (mapInPandas); the exchange carries |partitions|x|groups| centroid lists, never rows",
    "agg_quantile_disc": "rows collapse to (group, value, count) via partial agg; the rank window runs over ~50 distinct values, never raw rows (r13)",
    "rec_user_user_sampled": "md5-rank audience sample as WindowGroupLimit (per-task top-64 heaps); integer-weighted pair agg — per-item work bounded at C(64,2) (r13)",
    "er_name_match": "cost-routed: fixture names pick the block path with the length band INSIDE the join condition — levenshtein runs only on band-surviving pairs (r13)",
    "tpch_q21": "EXISTS/NOT-EXISTS qualify as ONE multi-distinct aggregate (Expand) — no fact-wide DISTINCT shuffles, no semi/anti joins (r13)",
    "tpch_q18": "the HAVING subquery's per-order sum IS the result column: one lineitem aggregation, no re-join, no re-aggregate (r13)",
}


def main() -> None:
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of headline queries (sf0.01, AQE on)",
        "",
        "Regenerate: `python tools/dump_plans.py` (this file is its output).",
        "What to look for per plan is noted above each block; the same",
        "properties are asserted mechanically in `tests/test_plans.py`.",
        "",
        "Each header notes `built with N Spark jobs`: jobs fired while",
        "CONSTRUCTING the DataFrame (warm io.stats_memo catalog — the",
        "cost-gate scalars plan job-free after the first build; r12",
        "verdict item 5).  The floor is the parquet reader's one schema",
        "job per distinct file; kernel ops add their broadcast-operand",
        "staging collect, which IS the plan, not a gate.",
        "",
    ]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    tracker = spark.sparkContext.statusTracker()
    for qid, note in HEADLINE.items():
        # max-id delta, not len(): job ids are globally sequential and
        # survive the status tracker's retainedJobs eviction
        before = max(tracker.getJobIdsForGroup(), default=-1)
        df = QUERIES[qid](spark, SF)
        built = max(tracker.getJobIdsForGroup(), default=-1) - before
        plan = df._jdf.queryExecution().explainString(mode)
        out.append(
            f"## {qid}\n\n*{note}*\n\n*built with {built} Spark jobs*"
            f"\n\n```\n{plan.strip()}\n```\n"
        )
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    spark.stop()


if __name__ == "__main__":
    main()
