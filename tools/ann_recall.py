#!/usr/bin/env python
"""Recall@k of the ANN family vs the exact twin, across scale factors.

Usage: python tools/ann_recall.py OUT.json SF_DIR [SF_DIR ...]

The fixture-scale quality gates (tests/test_ml_quality.py) pin recall at
sf0.001; this campaign answers the scale question they cannot: does
recall decay when the SAME nprobe/bands parameters face 10x denser
cells/buckets?  For each sf_dir it runs the exact brute-force twin
(sim_cosine_topk) and each approximate op, and reports per-op recall@5
(pair-set intersection over the same 10 queries) plus wall seconds.

Caveat (default-synth legs only): a corpus built WITHOUT
--plant-embeddings replicates embedding vectors byte-identically with
shifted ids (tools/scaleup_synth.py), so the denser corpus is tie-heavy —
exact top-5 is then id-tie-broken among equal cosines while ANN candidate
sets include all replicas of a matching vector; recall measured there is
a lower bound for organically denser data.  r11+: run the planted-cluster
legs (scaleup_synth --plant-embeddings) so IVF/PQ recall is measured in
the clustered regime those indexes are built for, alongside the original
random-vector fixture leg for the no-structure regime.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

APPROX = ["sim_ann_lsh", "sim_ivf_topk", "sim_ivf_pq"]
EXACT = "sim_cosine_topk"


def pair_set(df) -> set:
    return {(r[0], r[1]) for r in df.select(df.columns[0], df.columns[1]).collect()}


def main() -> None:
    out_path, legs = sys.argv[1], sys.argv[2:]

    from recommend_spark.queries import QUERIES
    from recommend_spark.session import get_spark

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    record: dict = {"k": 5, "n_queries": 10, "legs": {}}
    for sf_dir in legs:
        t0 = time.monotonic()
        exact = pair_set(QUERIES[EXACT](spark, sf_dir))
        leg = {
            "exact_pairs": len(exact),
            "exact_wall_s": round(time.monotonic() - t0, 2),
            "ops": {},
        }
        for qid in APPROX:
            t0 = time.monotonic()
            approx = pair_set(QUERIES[qid](spark, sf_dir))
            leg["ops"][qid] = {
                "recall_at_5": round(len(exact & approx) / max(len(exact), 1), 4),
                "pairs": len(approx),
                "wall_s": round(time.monotonic() - t0, 2),
            }
            print(sf_dir, qid, leg["ops"][qid], flush=True)
        record["legs"][sf_dir] = leg

    spark.stop()
    Path(out_path).write_text(json.dumps(record, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
