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

from .posting_ops import SENTINEL, gather_slices


@functools.partial(jax.jit, static_argnames=("g_sparse", "c_bucket"))
def threshold_count_bitmap(bitmaps: jax.Array, rows: jax.Array,
                           postings: jax.Array, offs: jax.Array,
                           lens: jax.Array, min_count: jax.Array,
                           deleted: jax.Array, *, g_sparse: int,
                           c_bucket: int) -> jax.Array:
    """Mixed dense+sparse threshold count, fully on device.

    Counts, per doc, how many of the given posting sets contain it and
    returns the ``count >= min_count`` result as a packed bitmap
    (W32,) uint32 with tombstones cleared (reference SearchByThreshold,
    index.cpp:448-528 — the k-way heap becomes a bit-count accumulate).

    bitmaps: (R, W32) uint32 dense rows; rows: (G,) int32 row indices,
    padding entries must point at an all-zero row. postings/offs/lens:
    sparse CSR slices (g_sparse of them; g_sparse=0 compiles the
    dense-only variant). Dense counts are accumulated per (word, bit)
    lane; sparse ids scatter-add into the flat per-doc counter.
    """
    w32 = bitmaps.shape[1]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :]

    def body(i, cnt):
        row = bitmaps[rows[i]]
        bits = jnp.bitwise_and(jnp.right_shift(row[:, None], shifts), 1)
        return cnt + bits.astype(jnp.int32)

    cnt = jax.lax.fori_loop(0, rows.shape[0], body,
                            jnp.zeros((w32, 32), jnp.int32))
    flat = cnt.reshape(-1)
    if g_sparse:
        slices = gather_slices(postings, offs, lens, c_bucket)
        # SENTINEL pads are far out of range -> dropped by the scatter
        flat = flat.at[slices.reshape(-1)].add(1, mode="drop")
    ok = (flat >= min_count).reshape(w32, 32)
    words = jnp.sum(
        jnp.left_shift(ok.astype(jnp.uint32), shifts), axis=1,
        dtype=jnp.uint32)
    return jnp.bitwise_and(words, jnp.bitwise_not(deleted))


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
