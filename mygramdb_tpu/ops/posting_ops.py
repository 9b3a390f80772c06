"""Sparse posting-list kernels.

Sparse terms live in one packed, per-term-sorted int32 doc-id array (CSR:
``postings`` + per-term ``offset``/``length``). Query-time set intersection
becomes: gather the rarest term's slice as the candidate vector (padded to a
static bucket), then probe every other term by vectorized binary search
(``searchsorted``) — the TPU-shaped equivalent of the reference's
selectivity-planned Intersect chain / FilterByNgrams probe
(index.cpp:201-376).

All shapes are static; the query planner buckets candidate/probe widths so
jit caches a small set of variants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SENTINEL = jnp.int32(2 ** 31 - 1)  # pads posting slices; sorts after any doc


@functools.partial(jax.jit, static_argnames=("bucket",))
def gather_slices(postings: jax.Array, offsets: jax.Array,
                  lengths: jax.Array, bucket: int) -> jax.Array:
    """Gather K posting slices into a padded (K, bucket) int32 matrix.

    postings: (P,) packed sorted-per-term doc ids
    offsets/lengths: (K,) int32. Entries beyond a term's length = SENTINEL.
    """
    pos = jnp.arange(bucket, dtype=jnp.int32)[None, :]
    valid = pos < lengths[:, None]
    idx = jnp.where(valid, offsets[:, None] + pos, 0)
    vals = postings[idx]
    return jnp.where(valid, vals, SENTINEL)


_MEMBER_BLK = 128


@jax.jit
def membership_sorted(padded: jax.Array, candidates: jax.Array) -> jax.Array:
    """candidates (C,) in each sorted row of padded (K, C2) -> (K, C) bool.

    Two-level blocked probe: rank each candidate against the C2/BLK block
    minima (one dense compare), gather its block (contiguous DMA row),
    compare within the block. O(C * (C2/BLK + BLK)) vectorized ops —
    orders faster on TPU than jnp.searchsorted's data-dependent gather
    loop at C2 >= 16k (measured 890ms -> ~15ms for the 65536 bucket)."""
    c2 = padded.shape[-1]
    if c2 % _MEMBER_BLK or c2 <= _MEMBER_BLK:
        def probe_small(row):
            pos = jnp.minimum(jnp.searchsorted(row, candidates), c2 - 1)
            return row[pos] == candidates
        return jax.vmap(probe_small)(padded)
    nb = c2 // _MEMBER_BLK

    def probe(row):
        blocks = row.reshape(nb, _MEMBER_BLK)
        starts = blocks[:, 0]
        bidx = jnp.sum((starts[None, :] <= candidates[:, None]).astype(
            jnp.int32), axis=1) - 1
        bidx = jnp.clip(bidx, 0, nb - 1)
        mine = blocks[bidx]  # (C, BLK)
        return jnp.any(mine == candidates[:, None], axis=1)

    return jax.vmap(probe)(padded)


@jax.jit
def bitmap_membership(bitmaps: jax.Array, rows: jax.Array,
                      candidates: jax.Array) -> jax.Array:
    """candidates (C,) against dense bitmap rows (K,) -> (K, C) bool."""
    w = jnp.right_shift(candidates, 5)
    b = jnp.bitwise_and(candidates, 31).astype(jnp.uint32)
    words = bitmaps[rows[:, None], w[None, :]]  # (K, C)
    return jnp.bitwise_and(jnp.right_shift(words, b[None, :]), jnp.uint32(1)) == 1


@functools.partial(jax.jit, static_argnames=("n", "descending"))
def mask_to_topn(candidates: jax.Array, mask: jax.Array, n: int,
                 descending: bool = True):
    """(C,) candidates + (C,) bool -> (count, (n,) doc ids sorted by doc id).

    -1 pads the id vector. Candidates must be valid doc ids or SENTINEL.
    """
    ok = jnp.logical_and(mask, candidates != SENTINEL)
    count = jnp.sum(ok.astype(jnp.int32))
    if descending:
        keys = jnp.where(ok, candidates, -1)
        vals, _ = jax.lax.top_k(keys, n)
        ids = jnp.where(vals >= 0, vals, -1)
    else:
        keys = jnp.where(ok, -candidates, jnp.int32(-(2 ** 31) + 1))
        vals, _ = jax.lax.top_k(keys, n)
        ids = jnp.where(vals > -(2 ** 31) + 1, -vals, -1)
    return count, ids


@functools.partial(jax.jit, static_argnames=())
def intersect_candidates(cand_mask: jax.Array, probe_masks: jax.Array,
                         probe_valid: jax.Array) -> jax.Array:
    """AND candidate mask (C,) with probe rows (K, C) where probe_valid (K,).

    Invalid probe rows (padding terms) are treated as all-true.
    """
    rows = jnp.where(probe_valid[:, None], probe_masks, True)
    return jnp.logical_and(cand_mask, jnp.all(rows, axis=0))
