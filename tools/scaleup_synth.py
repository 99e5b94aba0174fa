#!/usr/bin/env python
"""Synthesize a larger scale-factor corpus from an existing fixture dir.

Usage: python tools/scaleup_synth.py SRC_DIR DST_DIR [FACTOR]
           [--perturb] [--plant-embeddings]

Builds FACTOR key-shifted replicas of every scaling table (TPC-H style:
``nation``/``region`` stay fixed-size dims) so that a synthesized ``sf1``
can answer the question the local fixtures cannot: what does the NEXT 10x
cost?  Referential integrity is preserved by shifting every int64 id key
by the same per-replica offset (events.user_id joins c_custkey and
embeddings.vec_id joins doc_id in the inventory, so one shared offset
keeps every join family consistent).  Timestamps are left unchanged —
like TPC-H, a bigger sf means a DENSER history over the same date range,
so date filters keep their selectivity fraction.

Default mode (the r4-r10 campaign corpus): document text gets a replica
marker prepended (``r3 `` ...) so exact dedup does not collapse replicas
into one cluster; the marker leaves the rest of the shingle stream
intact, which makes EVERY cross-replica pair a near-duplicate — maximal
candidate pressure, but the true pair set grows quadratically in FACTOR
and byte-identical signatures mean the banding/prefix-filter PRUNING
power is never exercised (r10 verdict item 1).  Embedding vectors are
byte-identical across replicas in this mode.

``--perturb`` (r11): replicas additionally get deterministic token-level
mutations at tiered edit rates — replicas 1..3 at 5% (still
near-duplicates of the original: Jaccard ~0.87, above the 0.8 family
threshold, but with DIFFERENT shingle signatures, so banding must
actually find them) and replicas 4+ at 35% (Jaccard ~0.45, honest
negatives the filters must PRUNE).  True near-dup clusters are then
~4 members instead of FACTOR — realistic near-dup density: pair output
grows linearly in the corpus while candidate pruning does real work.
Mutations (drop / replace-with-reversed / duplicate per token) derive
from a splitmix-style hash of (doc_id, replica, token_index) — pure
arithmetic, no RNG state.

``--plant-embeddings``: regenerates the embeddings table (ALL replicas)
as K=|labels| well-separated unit centers + controlled intra-cluster
noise (center[label] + 0.35·noise, renormalized; seeded numpy
PCG64 — deterministic across runs).  The fixture's random unit vectors
carry no cluster structure, so IVF/PQ recall there measures the
nprobe/ncells ratio, not the index (r10 verdict item 3/4); the planted
corpus measures the regime IVF/PQ is built for, with cells that match
the coarse quantizer's label stand-in.

Determinism: pure arithmetic on the source tables; the only RNG is the
fixed-seed PCG64 behind --plant-embeddings (bit-stable across runs).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# One offset family for ALL int64 id keys (see module docstring).
OFFSET = 1_000_000_000

FIXED_DIMS = ("region", "nation")

# table -> int64 id columns that shift per replica
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


# --perturb tiers: replicas 1..LIGHT_REPLICAS stay near-duplicates of the
# source doc (edit rate ~5% keeps token-set Jaccard ~0.87, above the 0.8
# family threshold); later replicas mutate past the threshold (~0.45) so
# the banding/prefix filters have honest negatives to prune.
LIGHT_REPLICAS = 3
LIGHT_RATE, HEAVY_RATE = 0.05, 0.35


def _h64(a: int, b: int, c: int) -> int:
    """Deterministic 64-bit mix of (doc_id, replica, token_index) —
    splitmix64-style finalizer, pure arithmetic (no RNG state)."""
    x = (a * 1_000_003 + b * 7_919 + c * 2_654_435_761) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _mutate_text(text: str, doc_id: int, i: int, rate: float) -> str:
    toks = text.split()
    out: list[str] = []
    gate = int(rate * 10_000)
    for idx, tok in enumerate(toks):
        h = _h64(doc_id, i, idx)
        if h % 10_000 < gate:
            op = (h >> 16) % 3
            if op == 0:
                continue  # drop
            if op == 1:
                out.append(tok[::-1])  # replace with an out-of-vocab token
                continue
            out.append(tok)
            out.append(tok)  # duplicate
        else:
            out.append(tok)
    return " ".join(out)


def _replica(table: pa.Table, name: str, i: int, perturb: bool = False) -> pa.Table:
    if i == 0:
        return table
    off = pa.scalar(i * OFFSET, type=pa.int64())
    for col in SHIFT_KEYS[name]:
        idx = table.schema.get_field_index(col)
        table = table.set_column(
            idx, table.schema.field(idx), pc.add_checked(table.column(col), off)
        )
    if name == "documents":
        marker = f"r{i} "
        idx = table.schema.get_field_index("text")
        if perturb:
            rate = LIGHT_RATE if i <= LIGHT_REPLICAS else HEAVY_RATE
            # shifted ids: recover the source doc_id for the hash so the
            # mutation stream is keyed by (source doc, replica)
            ids = [v - i * OFFSET for v in table.column("doc_id").to_pylist()]
            texts = table.column("text").to_pylist()
            new_text = pa.array(
                [
                    marker + _mutate_text(t, d, i, rate)
                    for t, d in zip(texts, ids)
                ],
                type=pa.string(),
            )
        else:
            new_text = pc.binary_join_element_wise(
                pa.scalar(marker), table.column("text").cast(pa.string()), ""
            )
        table = table.set_column(idx, table.schema.field(idx), new_text)
        nidx = table.schema.get_field_index("n_chars")
        table = table.set_column(
            nidx,
            table.schema.field(nidx),
            pc.utf8_length(new_text).cast(pa.int64()),
        )
    return table


#: --plant-embeddings knobs: PLANT_NOISE_NORM is the expected NORM of the
#: noise vector relative to the unit center (per-dim sigma = norm/sqrt(d),
#: so the knob is dimension-independent).  0.4 gives intra-cluster cosine
#: ~0.93 and inter-cluster ~0 — separated enough that exact top-k is
#: same-cluster, noisy enough that within-cluster ranking (what PQ codes
#: must preserve) is non-trivial.
PLANT_NOISE_NORM = 0.4
PLANT_SEED = 20260815


def _plant_embeddings(table: pa.Table) -> pa.Table:
    import numpy as np

    labels = np.asarray(table.column("label").to_pylist(), dtype=np.int64)
    dim = len(table.column("embedding")[0])
    k = int(labels.max()) + 1
    rng = np.random.default_rng(PLANT_SEED)
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # one noise draw per OUTPUT row: deterministic given the (fixed)
    # replica-concatenation row order
    noise = rng.standard_normal((len(labels), dim))
    vecs = centers[labels] + (PLANT_NOISE_NORM / dim**0.5) * noise
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.array(
        vecs.astype(np.float32).tolist(), type=pa.list_(pa.float32())
    )
    idx = table.schema.get_field_index("embedding")
    return table.set_column(idx, table.schema.field(idx), emb)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    unknown = flags - {"--perturb", "--plant-embeddings"}
    if len(args) < 2 or unknown:
        sys.exit(__doc__)
    perturb = "--perturb" in flags
    plant = "--plant-embeddings" in flags
    src, dst = Path(args[0]), Path(args[1])
    factor = int(args[2]) if len(args) > 2 else 10
    dst.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.parquet")):
        name = f.stem
        t0 = time.monotonic()
        table = pq.read_table(f)
        if name in FIXED_DIMS:
            out = table
        else:
            out = pa.concat_tables(
                _replica(table, name, i, perturb=perturb) for i in range(factor)
            )
        if plant and name == "embeddings":
            out = _plant_embeddings(out)
        # one row group per source-size chunk: Spark splits files by byte
        # range anyway, but bounded groups keep the statistics usable for
        # row-group skipping on the shifted key ranges
        pq.write_table(
            out, dst / f.name, row_group_size=max(len(table), 1)
        )
        print(
            f"{name:12s} {len(table):>9,} -> {len(out):>10,} rows "
            f"({time.monotonic() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
