#!/usr/bin/env python
"""Synthesize a larger scale-factor corpus from an existing fixture dir.

Usage: python tools/scaleup_synth.py SRC_DIR DST_DIR [FACTOR]

Builds FACTOR key-shifted replicas of every scaling table (TPC-H style:
``nation``/``region`` stay fixed-size dims) so that a synthesized ``sf1``
can answer the question the local fixtures cannot: what does the NEXT 10x
cost?  Referential integrity is preserved by shifting every int64 id key
by the same per-replica offset (events.user_id joins c_custkey and
embeddings.vec_id joins doc_id in the inventory, so one shared offset
keeps every join family consistent).  Timestamps are left unchanged —
like TPC-H, a bigger sf means a DENSER history over the same date range,
so date filters keep their selectivity fraction.

Document text gets a replica marker prepended (``r3 `` ...) so exact
dedup does not collapse replicas into one cluster; the marker leaves the
rest of the shingle stream intact, which makes cross-replica docs
NEAR-duplicates — deliberately a harder workload for the banded-LSH /
simhash family than organic text (bucket groups of ~FACTOR everywhere).
``n_chars`` is recomputed to stay consistent with the new text.
Embedding vectors are byte-identical across replicas (cosine work is
O(pairs) regardless of values, and identical vectors maximize candidate
pressure on threshold ops).

Determinism: pure arithmetic on the source tables, no RNG anywhere.
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


def _replica(table: pa.Table, name: str, i: int) -> pa.Table:
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


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    src, dst = Path(sys.argv[1]), Path(sys.argv[2])
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.parquet")):
        name = f.stem
        t0 = time.monotonic()
        table = pq.read_table(f)
        if name in FIXED_DIMS:
            out = table
        else:
            out = pa.concat_tables(
                _replica(table, name, i) for i in range(factor)
            )
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
