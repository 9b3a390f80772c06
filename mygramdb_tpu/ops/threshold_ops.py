"""Threshold-count merge: the FUZZY search backbone.

Reference Index::SearchByThreshold (index.cpp:448-528) k-way heap-merges G
posting lists and keeps doc ids appearing in >= t of them. The TPU shape:
concatenate the padded posting slices, sort the flat vector, and rank-count
runs with two vectorized binary searches — O(M log M) vector work instead of
a scalar heap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .posting_ops import SENTINEL


@functools.partial(jax.jit, static_argnames=("max_out",))
def threshold_merge(padded_slices: jax.Array, min_count: jax.Array,
                    max_out: int):
    """padded_slices: (G, C2) int32 (SENTINEL padded, each row sorted).

    Returns (count, (max_out,) doc ids ascending, -1 padded) of doc ids whose
    multiplicity across rows >= min_count.
    """
    flat = jnp.sort(padded_slices.reshape(-1))
    max_out = min(max_out, flat.shape[0])
    left = jnp.searchsorted(flat, flat, side="left")
    right = jnp.searchsorted(flat, flat, side="right")
    counts = (right - left).astype(jnp.int32)
    pos = jnp.arange(flat.shape[0], dtype=jnp.int32)
    is_first = left == pos
    ok = (counts >= min_count) & is_first & (flat != SENTINEL)
    total = jnp.sum(ok.astype(jnp.int32))
    # Extract up to max_out matching ids in ascending order.
    keys = jnp.where(ok, -flat, jnp.int32(-(2 ** 31) + 1))
    vals, _ = jax.lax.top_k(keys, max_out)
    ids = jnp.where(vals > -(2 ** 31) + 1, -vals, -1)
    return total, ids
