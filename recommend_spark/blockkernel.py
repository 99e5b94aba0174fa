"""Sizing policy for driver-staged broadcast block kernels.

``sim_knn_join`` and ``dedup_embed_cosine`` ship the candidate embedding
matrix to executors via ``sparkContext.broadcast`` — one torrent transfer,
shared read-only by every task.  That matrix is materialized ON THE DRIVER
first (``pq.read_table``), so it is bounded by driver RAM:

    bytes = N_candidates × dim × 8   (float64)

At the fixtures' 64-dim embeddings the default 2 GiB budget corresponds to
N ≈ 4.2M candidate vectors; a 100 TB corpus is far past it.  Callers check
``block_kernel_fits`` (a parquet FOOTER read — row count only, no data) and
route oversized candidate sides to their bucketed cogroup fallback, which
shuffles bucket-sized blocks instead of staging anything driver-side.  See
SCALE.md §"Block kernels".
"""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq

#: Driver-RAM budget for a staged candidate matrix (override for tests /
#: small drivers via SPARK_GRAFT_BLOCK_KERNEL_MAX_BYTES).
DEFAULT_MAX_BYTES = 2 << 30

#: Upper bound on fallback bucket count: replication cost of the bucketed
#: paths grows linearly with it, and past ~64 the per-bucket block is small
#: enough that scheduler overhead dominates the kernel.
MAX_BUCKETS = 64


def candidate_matrix_bytes(parquet_path: str, dim: int) -> int:
    """float64 bytes needed to stage the candidate matrix driver-side.

    Metadata-only: reads the parquet footer's row count, never the data.
    """
    n = pq.ParquetFile(parquet_path).metadata.num_rows
    return n * dim * 8


def max_staged_bytes() -> int:
    return int(
        os.environ.get("SPARK_GRAFT_BLOCK_KERNEL_MAX_BYTES", DEFAULT_MAX_BYTES)
    )


def block_kernel_fits(parquet_path: str, dim: int) -> bool:
    """True if the candidate side may be staged on the driver + broadcast."""
    return candidate_matrix_bytes(parquet_path, dim) <= max_staged_bytes()


def fallback_buckets(parquet_path: str, dim: int) -> int:
    """Bucket count for the cogroup fallback: each bucket's candidate block
    stays within the staging budget, capped at MAX_BUCKETS."""
    b = math.ceil(candidate_matrix_bytes(parquet_path, dim) / max_staged_bytes())
    return max(1, min(MAX_BUCKETS, b))


def index_ordered_dot_block(a_mat, b_mat):
    """Dense dot-product block via an index-ordered left fold over the
    dimensions: acc[i,j] = (((0 + a[i,0]·b[j,0]) + a[i,1]·b[j,1]) + …) —
    bit-identical to the scalar fold that Spark's ``F.aggregate`` and
    DuckDB's ``list_reduce`` evaluate, which is what lets the broadcast
    kernels, their bucketed cogroup twins, and the SQL oracles all
    hash-match.  THE single definition: a BLAS matmul would be faster and
    WRONG here (blocked/FMA accumulation order varies with shape), and a
    second copy of this loop risks the two paths silently diverging.
    Shared by sim_knn_join, dedup_embed_cosine and both their fallbacks.
    """
    import numpy as np

    acc = np.zeros((a_mat.shape[0], b_mat.shape[0]))
    for k in range(b_mat.shape[1]):
        acc += np.multiply.outer(a_mat[:, k], b_mat[:, k])
    return acc
