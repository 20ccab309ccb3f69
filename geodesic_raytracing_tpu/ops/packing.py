"""O(N) bucket partitions — TPU-friendly replacements for argsort.

TPU sorts are bitonic: O(N log^2 N) full-array passes that cost more than
the ray march itself at frame-sized key counts (~2M).  Both the tile packer
(ops/pallas/raymarch.py) and the EWA probe-pixel selector
(render/background.py) only need *grouping by a small integer key*, which a
stable counting partition does in O(N * n_buckets) elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bucket_sort_perm(bucket: Array, n_buckets: int) -> tuple[Array, Array]:
    """Stable ascending partition by a small integer key.

    ``bucket``: (N,) int32 in [0, n_buckets).  Returns ``(perm, dest)``:
    ``x[perm]`` is grouped by bucket (stable within a bucket) and
    ``x_grouped[dest]`` restores the original order.
    """
    n = bucket.shape[0]
    dest = jnp.zeros((n,), dtype=jnp.int32)
    offset = jnp.int32(0)
    for k in range(n_buckets):
        in_k = bucket == k
        rank = jnp.cumsum(in_k.astype(jnp.int32)) - 1
        dest = jnp.where(in_k, offset + rank, dest)
        offset = offset + jnp.sum(in_k.astype(jnp.int32))
    perm = jnp.zeros((n,), dtype=jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return perm, dest
