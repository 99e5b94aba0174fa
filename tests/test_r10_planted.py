"""Planted-value pins for the round-10 kernels.

The r10 rewrites moved three hot kernels onto new machinery; these tests
pin the exact semantic claims the rewrites make:

* banded_hamming_pairs — LOSSLESSNESS: the 4x6-bit block-banding
  equi-join must return exactly the brute-force Hamming<=3 pair set
  (pigeonhole), and the first-matching-block filter must emit each pair
  exactly once even when signatures collide on several blocks;
* _cc_min_local — the vectorized min-label propagation must converge on
  a DEEP chain (the pointer-jumping path) and label every node with its
  component minimum;
* kcore_peel local fixpoint — the numpy peel must dedupe duplicate input
  edges (the old set()-based kernel's contract) and converge a cascade
  to the exact core.
"""

from __future__ import annotations

import itertools

from recommend_spark.queries.dedup import _cc_min_local, banded_hamming_pairs
from recommend_spark.queries.recommender import kcore_peel


def test_banded_pairs_lossless_vs_bruteforce(spark):
    # deterministic pseudo-random 24-bit population + adversarial cases:
    sigs = [(i * 2654435761) % (1 << 24) for i in range(120)]
    base = sigs[0]
    sigs += [
        base,                                   # hamming 0 twin (all 4 blocks collide)
        base ^ 0b1,                             # hamming 1
        base ^ (1 | 1 << 6 | 1 << 12),          # hamming 3 across 3 blocks -> only block 3 matches
        base ^ (1 | 1 << 6 | 1 << 12 | 1 << 18),  # hamming 4 across all 4 blocks -> no candidate
        base ^ 0b1111,                          # hamming 4 inside one block -> candidate, filtered
    ]
    rows = [(i, s) for i, s in enumerate(sigs)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in banded_hamming_pairs(df).collect()
    ]
    # exactly-once emission even for multi-block collisions (hamming-0 twin)
    assert len(got) == len(set(got))
    want = {
        (a, b, bin(sa ^ sb).count("1"))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if a < b and bin(sa ^ sb).count("1") <= 3
    }
    assert set(got) == want
    # the planted hamming-3-across-3-blocks pair IS in the result
    assert (0, 122, 3) in want and (0, 122, 3) in set(got)
    # the planted hamming-4 cases are NOT
    assert not any(a == 0 and b in (123, 124) for a, b, _ in got)


def test_cc_min_local_deep_chain(spark):
    # a 1500-link path (deep pointer-jumping) + a disjoint second component
    edges = [(i, i + 1) for i in range(1500)]
    edges += [(5000 + i, 5000 + i + 1) for i in range(50)]
    edges += [(10, 11), (5000, 5001)]  # duplicate edges must be harmless
    df = spark.createDataFrame(edges, "src long, dst long")
    lab = {r["v"]: r["m"] for r in _cc_min_local(df).collect()}
    assert all(lab[v] == 0 for v in range(1501))
    assert all(lab[5000 + v] == 5000 for v in range(51))


def test_kcore_local_fixpoint_dedupes_and_converges(spark):
    # 4-clique {1,2,3,4} + a pendant chain 4-5-6; k=2 peels the chain
    # exactly (two cascade steps) and keeps the clique.  Duplicate edge
    # rows pin the set()-contract the numpy kernel inherited.
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    sym = und + [(b, a) for a, b in und] + [(1, 2), (2, 1)]  # dup rows
    df = spark.createDataFrame(sym, "src long, dst long")
    # huge threshold forces the single-task local fixpoint immediately
    core = kcore_peel(df, k=2, rounds=6, local_threshold=10_000)
    got = {(r["src"], r["dst"]) for r in core.collect()}
    clique = {(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a != b}
    assert got == clique
