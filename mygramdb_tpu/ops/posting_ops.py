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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import runtime

SENTINEL = jnp.int32(2 ** 31 - 1)  # pads posting slices; sorts after any doc

# Postings arrays consumed by the Pallas slice-gather must be padded with
# this many trailing entries (DMA reads [off, off+bucket) for off <= P).
SLICE_GATHER_PAD = 65536


@functools.partial(jax.jit, static_argnames=("bucket",))
def _gather_slices_jnp(postings: jax.Array, offsets: jax.Array,
                       lengths: jax.Array, bucket: int) -> jax.Array:
    pos = jnp.arange(bucket, dtype=jnp.int32)[None, :]
    valid = pos < lengths[:, None]
    idx = jnp.where(valid, offsets[:, None] + pos, 0)
    vals = postings[idx]
    return jnp.where(valid, vals, SENTINEL)


_SLICE_ROWS = 8  # slices DMA'd per grid step (sublane-aligned output)


def _slice_gather_kernel(bucket: int):
    def kern(lens_ref, offs_ref, post_hbm, out_ref, scratch, sems):
        i = pl.program_id(0)

        def dma(j):
            return pltpu.make_async_copy(
                post_hbm.at[pl.ds(offs_ref[i * _SLICE_ROWS + j], bucket)],
                scratch.at[j], sems.at[j])

        for j in range(_SLICE_ROWS):
            dma(j).start()
        for j in range(_SLICE_ROWS):
            dma(j).wait()
        lens = jnp.stack([lens_ref[i * _SLICE_ROWS + j]
                          for j in range(_SLICE_ROWS)])
        pos = jax.lax.broadcasted_iota(
            jnp.int32, (_SLICE_ROWS, bucket), 1)
        out_ref[...] = jnp.where(pos < lens[:, None], scratch[...],
                                 jnp.int32(2 ** 31 - 1))  # == SENTINEL
    return kern


@functools.partial(jax.jit, static_argnames=("bucket", "interpret"))
def _gather_slices_pallas(postings: jax.Array, offsets: jax.Array,
                          lengths: jax.Array, bucket: int,
                          interpret: bool = False) -> jax.Array:
    """CSR slices are CONTIGUOUS — stream each as one DMA instead of
    bucket element-gathers (XLA lowers the fancy-index form to a serial
    gather: measured ~35 ns/element on TPU, 280 ms for a 64-query probe
    batch). Scalar-prefetched offsets drive dynamic-start HBM->VMEM
    copies, 8 slices per grid step.

    postings MUST carry >= bucket trailing pad entries (the DMA for
    offset ``off`` spans [off, off+bucket) unconditionally; DeviceIndex
    pads its device CSR with SLICE_GATHER_PAD sentinels)."""
    N = offsets.shape[0]
    Np = ((N + _SLICE_ROWS - 1) // _SLICE_ROWS) * _SLICE_ROWS
    if Np != N:
        offsets = jnp.concatenate(
            [offsets, jnp.zeros(Np - N, dtype=offsets.dtype)])
        lengths = jnp.concatenate(
            [lengths, jnp.zeros(Np - N, dtype=lengths.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lengths, offsets
        grid=(Np // _SLICE_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_SLICE_ROWS, bucket),
                               lambda i, lens_ref, offs_ref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_SLICE_ROWS, bucket), jnp.int32),
            pltpu.SemaphoreType.DMA((_SLICE_ROWS,)),
        ],
    )
    out = pl.pallas_call(
        _slice_gather_kernel(bucket),
        out_shape=jax.ShapeDtypeStruct((Np, bucket), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths, offsets, postings)
    return out[:N]


@functools.partial(jax.jit, static_argnames=("bucket",))
def _gather_slices_scan(postings: jax.Array, offsets: jax.Array,
                        lengths: jax.Array, bucket: int) -> jax.Array:
    """Slice gather as a scan of dynamic_slices: XLA lowers each step to
    one contiguous HBM DMA — the fancy-index gather form is a serial
    element gather on TPU (~35 ns/element: 280 ms for a 64-query probe
    batch vs ~2 ms here). Requires the SLICE_GATHER_PAD tail so
    off+bucket never crosses the array end (no clamp shift)."""
    pos = jnp.arange(bucket, dtype=jnp.int32)

    def step(_, ol):
        off, ln = ol
        sl = jax.lax.dynamic_slice(postings, (off,), (bucket,))
        return _, jnp.where(pos < ln, sl, SENTINEL)

    # unroll: the while-loop iteration overhead (~50 us/step) dominates
    # the DMAs themselves for big batches
    _, out = jax.lax.scan(step, 0, (offsets, lengths), unroll=8)
    return out


def gather_slices(postings: jax.Array, offsets: jax.Array,
                  lengths: jax.Array, bucket: int) -> jax.Array:
    """Gather K posting slices into a padded (K, bucket) int32 matrix.

    postings: (P,) packed sorted-per-term doc ids — on TPU this MUST be
    the DeviceIndex copy carrying SLICE_GATHER_PAD trailing sentinels
    (see pad_postings), because the fast path reads [off, off+bucket).
    offsets/lengths: (K,) int32. Entries beyond a term's length = SENTINEL.

    Call at BATCH level (outside vmap): the scan fast path serializes
    per-slice DMAs and vmap would turn it back into an element gather.
    """
    if runtime.use_pallas() and bucket <= SLICE_GATHER_PAD:
        return _gather_slices_scan(postings, offsets, lengths, bucket)
    return _gather_slices_jnp(postings, offsets, lengths, bucket)


def pad_postings(postings):
    """Host-side: append the SLICE_GATHER_PAD sentinel tail the Pallas
    slice gather requires (uploads go through this once per segment)."""
    import numpy as np
    return np.concatenate([
        np.asarray(postings, dtype=np.int32),
        np.full(SLICE_GATHER_PAD, int(SENTINEL), dtype=np.int32)])


_MEMBER_BLK = 128
# Candidate-axis chunk for the blocked probe: the block gather
# (``blocks[bidx]`` -> (C, BLK) int32) cannot fuse into its consumer, so
# under the callers' vmap (batch x probe-terms rows) its HLO temp is
# rows * C * BLK * 4 bytes — 8 GB at (64*8 rows, C=32768), the 10M-doc
# OOM. Scanning candidate chunks keeps one chunk's gather live at a time
# (rows * CHUNK * BLK * 4 <= 512 MB at 64*8 rows) with the same total
# work; the rank pass fuses into a reduction either way.
_MEMBER_CHUNK = 2048


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
    C = candidates.shape[0]

    def probe(row):
        blocks = row.reshape(nb, _MEMBER_BLK)
        starts = blocks[:, 0]

        def member(cand):
            bidx = jnp.sum((starts[None, :] <= cand[:, None]).astype(
                jnp.int32), axis=1) - 1
            bidx = jnp.clip(bidx, 0, nb - 1)
            mine = blocks[bidx]  # (chunk, BLK)
            return jnp.any(mine == cand[:, None], axis=1)

        if C <= _MEMBER_CHUNK:
            return member(candidates)
        # ceil-div chunking: pad the candidate axis so a user-configured
        # bucket that is not a multiple of _MEMBER_CHUNK (e.g. 3072) still
        # takes the chunked path — the unchunked (C, BLK) gather is the
        # exact OOM this scan exists to avoid. Pad probes are SENTINEL
        # (sorts after any doc id) and their outputs are sliced off.
        n_chunks = (C + _MEMBER_CHUNK - 1) // _MEMBER_CHUNK
        Cp = n_chunks * _MEMBER_CHUNK
        cand_p = candidates
        if Cp != C:
            cand_p = jnp.concatenate(
                [candidates,
                 jnp.full((Cp - C,), SENTINEL, dtype=candidates.dtype)])
        chunks = cand_p.reshape(n_chunks, _MEMBER_CHUNK)
        _, out = jax.lax.scan(lambda c, ch: (c, member(ch)), 0, chunks)
        return out.reshape(Cp)[:C]

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

    -1 pads the id vector. Candidates must be ASCENDING doc ids (SENTINEL
    padded) — every caller feeds a CSR posting slice or a compaction of
    one, both id-sorted. Selection is therefore a first/last-k rank pass
    (cumsum + first-k positions), not a top_k sort: lax.top_k over
    (C=4096,) lanes measured ~17 ms per 64-query batch; this is ~2 ms.
    """
    from .bitmap_ops import _select_first_k
    ok = jnp.logical_and(mask, candidates != SENTINEL)
    count = jnp.sum(ok.astype(jnp.int32))
    C = candidates.shape[-1]
    flags = ok.astype(jnp.int32)
    if descending:
        flags = flags[::-1]
    pos, valid = _select_first_k(flags[None, :], min(n, C))
    pos, valid = pos[0], valid[0]
    idx = (C - 1 - pos) if descending else pos
    ids = jnp.where(valid, candidates[idx], -1)
    if n > C:
        ids = jnp.concatenate(
            [ids, jnp.full((n - C,), -1, dtype=ids.dtype)])
    return count, ids


@functools.partial(jax.jit, static_argnames=())
def intersect_candidates(cand_mask: jax.Array, probe_masks: jax.Array,
                         probe_valid: jax.Array) -> jax.Array:
    """AND candidate mask (C,) with probe rows (K, C) where probe_valid (K,).

    Invalid probe rows (padding terms) are treated as all-true.
    """
    rows = jnp.where(probe_valid[:, None], probe_masks, True)
    return jnp.logical_and(cand_mask, jnp.all(rows, axis=0))
