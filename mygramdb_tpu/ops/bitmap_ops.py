"""Bitmap kernels: the dense-term data plane.

Documents are bits in fixed-width uint32 word vectors (doc j lives at bit
``j % 32`` of word ``j // 32``). Dense n-gram terms each own one bitmap row
of an HBM-resident matrix; SEARCH AND/OR over dense terms is a row-gather +
bitwise reduce, COUNT is a popcount — replacing the reference's Roaring
set ops (posting_list.cpp) with VPU-shaped word arithmetic.

Row index conventions used by callers (see index/device_index.py):
the bitmap matrix is materialized with two sentinel rows appended —
row D   = all-ones  (AND identity, used to pad missing terms)
row D+1 = all-zeros (OR identity)
so kernels need no validity masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import runtime

U32_ONES = 0xFFFFFFFF

# Pallas word-block: 8 sublanes x 128 lanes of uint32 = 4096 words/block.
WBLOCK = 1024


def popcount_words(words: jax.Array) -> jax.Array:
    """Sum of set bits along the last axis. words: (..., W) uint32 -> (...)"""
    return jnp.sum(jnp.bitwise_count(words).astype(jnp.int32), axis=-1)


def count_bitmap(words: jax.Array) -> jax.Array:
    return popcount_words(words)


def andnot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.bitwise_and(a, jnp.bitwise_not(b))


# ---------------------------------------------------------------------------
# Row-gather + reduce (AND / OR)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("op",))
def _reduce_rows_jnp(bitmaps: jax.Array, rows: jax.Array, op: str) -> jax.Array:
    """(V+2, W) x (B, K) -> (B, W): scan over K so peak HBM traffic is
    K x (B, W) instead of one (B, K, W) materialized gather."""
    B, K = rows.shape
    W = bitmaps.shape[1]
    if op == "and":
        init = jnp.full((B, W), U32_ONES, dtype=jnp.uint32)
    else:
        init = jnp.zeros((B, W), dtype=jnp.uint32)

    def body(k, acc):
        g = bitmaps[rows[:, k]]  # (B, W)
        if op == "and":
            return jnp.bitwise_and(acc, g)
        return jnp.bitwise_or(acc, g)

    return jax.lax.fori_loop(0, K, body, init)


@functools.partial(jax.jit, static_argnames=("has_not", "has_extra"))
def dense_query(bitmaps: jax.Array, rows: jax.Array, nrows: jax.Array,
                deleted: jax.Array, extra: jax.Array,
                has_not: bool = False, has_extra: bool = False):
    """Fused dense AND query: one compile, one dispatch.

    rows (B, K) AND-reduced (pad with the all-ones sentinel row);
    nrows (B, Kn) OR-reduced and removed (pad with all-zeros sentinel);
    deleted (W,) tombstones; extra (F, W) filter bitmaps AND'ed in.
    -> (count (B,), result_words (B, W)).
    """
    res = _reduce_rows_jnp(bitmaps, rows, "and")
    if has_not:
        res = jnp.bitwise_and(
            res, jnp.bitwise_not(_reduce_rows_jnp(bitmaps, nrows, "or")))
    res = jnp.bitwise_and(res, jnp.bitwise_not(deleted)[None, :])
    if has_extra:
        acc = jax.lax.reduce(extra, jnp.uint32(U32_ONES), jnp.bitwise_and,
                             dimensions=(0,))
        res = jnp.bitwise_and(res, acc[None, :])
    count = jnp.sum(jnp.bitwise_count(res).astype(jnp.int32), axis=-1)
    return count, res


# ---------------------------------------------------------------------------
# Fused Pallas dense query: row-gather AND reduce + tombstone mask in one
# kernel. Each grid step streams one FULL bitmap row as an (8, W/8) uint32
# tile — long contiguous DMA reads at HBM speed-of-light (small 4KB tiles
# measured 20x slower, DMA-setup-bound). Grid (B, K) with the scalar-
# prefetched row ids driving the HBM->VMEM index map; the output tile is
# the AND accumulator across the K axis. VMEM: 3 row tiles (W*4 bytes each,
# ~140KB at Wikipedia scale).
# ---------------------------------------------------------------------------

PBLOCK = 1024  # minimum W granularity: (8, 128) uint32 base tile
_MAX_ROW_TILE_WORDS = 131072  # cap VMEM per tile at 512KB; wider W splits
_KOP_MAX = 16  # K-operand kernel bound: 2*(K+2) row tiles of VMEM


def _wide_chunk_words(W: int, cap: int = None) -> int:
    """Largest multiple of PBLOCK that divides W and fits the VMEM row-tile
    cap. Callers assert W % PBLOCK == 0, so PBLOCK itself always qualifies
    (worst case: W/PBLOCK grid steps along the width axis)."""
    cap = cap or _MAX_ROW_TILE_WORDS
    units = W // PBLOCK
    best = 1
    c = 1
    while c * c <= units:
        if units % c == 0:
            if c * PBLOCK <= cap:
                best = max(best, c)
            d = units // c
            if d * PBLOCK <= cap:
                best = max(best, d)
        c += 1
    return best * PBLOCK


def _dense_query_kernel(nsteps: int):
    def kern(rows_ref, bm_ref, del_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[...] = bm_ref[...]

        @pl.when(k > 0)
        def _():
            out_ref[...] = jnp.bitwise_and(out_ref[...], bm_ref[...])

        @pl.when(k == nsteps - 1)
        def _():
            out_ref[...] = jnp.bitwise_and(
                out_ref[...], jnp.bitwise_not(del_ref[...]))
    return kern


def _dense_query_kernel_blocked(nsteps: int):
    def kern(rows_ref, bm_ref, del_ref, out_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            out_ref[...] = bm_ref[...]

        @pl.when(k > 0)
        def _():
            out_ref[...] = jnp.bitwise_and(out_ref[...], bm_ref[...])

        @pl.when(k == nsteps - 1)
        def _():
            out_ref[...] = jnp.bitwise_and(
                out_ref[...], jnp.bitwise_not(del_ref[...]))
    return kern


def _dense_query_kernel_kop(K: int):
    """All K row tiles fetched in ONE grid step (K concurrent DMAs) and
    AND-reduced in VMEM. The per-(b, k) grid serializes one row DMA per
    step — measured 8.3 us/step at W=34816 (~17 GB/s effective, DMA-
    latency-bound); fetching the K rows per step overlaps their DMAs and
    cuts grid steps K-fold."""
    def kern(rows_ref, *refs):
        bm_refs = refs[:K]
        del_ref, out_ref = refs[K], refs[K + 1]
        acc = jnp.bitwise_and(bm_refs[0][...], bm_refs[1][...]) \
            if K > 1 else bm_refs[0][...]
        for i in range(2, K):
            acc = jnp.bitwise_and(acc, bm_refs[i][...])
        out_ref[...] = jnp.bitwise_and(acc, jnp.bitwise_not(del_ref[...]))
    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_query_pallas(bitmaps: jax.Array, rows: jax.Array,
                       deleted: jax.Array, interpret: bool = False):
    """Fused dense AND query (no NOT/extra rows — those queries take the
    jnp path). -> (count (B,), result_words (B, W))."""
    B, K = rows.shape
    V, W = bitmaps.shape
    assert W % PBLOCK == 0, f"W={W} not a multiple of {PBLOCK}"
    if W <= _MAX_ROW_TILE_WORDS and K <= _KOP_MAX:
        # one grid step per query: all K row tiles DMA concurrently
        L = W // 8
        bm3 = bitmaps.reshape(V, 8, L)
        del3 = deleted.reshape(1, 8, L)

        def _row_spec(i):
            return pl.BlockSpec(
                (1, 8, L), lambda b, rows_ref, i=i: (rows_ref[b, i], 0, 0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[_row_spec(i) for i in range(K)] + [
                pl.BlockSpec((1, 8, L), lambda b, rows_ref: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, L),
                                   lambda b, rows_ref: (b, 0, 0)),
        )
        res = pl.pallas_call(
            _dense_query_kernel_kop(K),
            out_shape=jax.ShapeDtypeStruct((B, 8, L), jnp.uint32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(rows, *([bm3] * K), del3).reshape(B, W)
    elif W <= _MAX_ROW_TILE_WORDS:
        # one full row per tile: (8, W/8) — W/8 is a multiple of 128
        L = W // 8
        bm3 = bitmaps.reshape(V, 8, L)
        del3 = deleted.reshape(1, 8, L)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, K),
            in_specs=[
                pl.BlockSpec((1, 8, L),
                             lambda b, k, rows_ref: (rows_ref[b, k], 0, 0)),
                pl.BlockSpec((1, 8, L), lambda b, k, rows_ref: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, L),
                                   lambda b, k, rows_ref: (b, 0, 0)),
        )
        res = pl.pallas_call(
            _dense_query_kernel(K),
            out_shape=jax.ShapeDtypeStruct((B, 8, L), jnp.uint32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(rows, bm3, del3).reshape(B, W)
    else:
        # very wide corpora: split rows into VMEM-sized chunks. The chunk
        # must divide W exactly (10M docs: W=313344 is NOT a multiple of
        # the 131072 cap), so take the largest PBLOCK-multiple divisor
        # that fits the VMEM tile cap.
        chunk = _wide_chunk_words(W)
        nblk = W // chunk
        L = chunk // 8
        bm4 = bitmaps.reshape(V, nblk, 8, L)
        del4 = deleted.reshape(1, nblk, 8, L)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nblk, K),
            in_specs=[
                pl.BlockSpec((1, 1, 8, L),
                             lambda b, w, k, rows_ref:
                             (rows_ref[b, k], w, 0, 0)),
                pl.BlockSpec((1, 1, 8, L),
                             lambda b, w, k, rows_ref: (0, w, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 8, L),
                                   lambda b, w, k, rows_ref: (b, w, 0, 0)),
        )
        res = pl.pallas_call(
            _dense_query_kernel_blocked(K),
            out_shape=jax.ShapeDtypeStruct((B, nblk, 8, L), jnp.uint32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(rows, bm4, del4).reshape(B, W)
    count = jnp.sum(jnp.bitwise_count(res).astype(jnp.int32), axis=-1)
    return count, res


def dense_query_auto(bitmaps, rows, nrows, deleted, extra,
                     has_not: bool = False, has_extra: bool = False):
    """dense_query with automatic Pallas fusion on TPU for the common
    no-NOT/no-extra shape (the overwhelming majority of SEARCH traffic).
    Multi-device (doc-sharded) inputs take the jnp path, which XLA
    auto-partitions under the arrays' NamedSharding."""
    runtime.dispatches.bump()
    single_device = True
    try:
        single_device = len(bitmaps.sharding.device_set) == 1
    except AttributeError:
        pass
    if (single_device and not has_not and not has_extra
            and runtime.use_pallas() and bitmaps.shape[1] % PBLOCK == 0):
        return dense_query_pallas(bitmaps, rows, deleted)
    return dense_query(bitmaps, rows, nrows, deleted, extra,
                       has_not=has_not, has_extra=has_extra)


def _reduce_rows_kernel(op: str):
    def kern(rows_ref, bm_ref, out_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            out_ref[...] = bm_ref[...]

        @pl.when(k > 0)
        def _():
            if op == "and":
                out_ref[...] = jnp.bitwise_and(out_ref[...], bm_ref[...])
            else:
                out_ref[...] = jnp.bitwise_or(out_ref[...], bm_ref[...])
    return kern


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def _reduce_rows_pallas(bitmaps: jax.Array, rows: jax.Array, op: str = "and",
                        interpret: bool = False) -> jax.Array:
    """Pallas row-gather-reduce over (8, 128) uint32 tiles: grid
    (B, W/WBLOCK, K), scalar-prefetched row ids drive the HBM->VMEM index
    map so only K tiles are streamed per output tile — no (B, K, W)
    materialization in HBM."""
    B, K = rows.shape
    V, W = bitmaps.shape
    assert W % WBLOCK == 0, f"bitmap width {W} not a multiple of {WBLOCK}"
    nblk = W // WBLOCK
    bm4 = bitmaps.reshape(V, nblk, 8, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nblk, K),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda b, w, k, rows_ref:
                         (rows_ref[b, k], w, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128),
                               lambda b, w, k, rows_ref: (b, w, 0, 0)),
    )
    out4 = pl.pallas_call(
        _reduce_rows_kernel(op),
        out_shape=jax.ShapeDtypeStruct((B, nblk, 8, 128), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows, bm4)
    return out4.reshape(B, W)


def _single_device(arr) -> bool:
    try:
        return len(arr.sharding.device_set) == 1
    except AttributeError:
        return True


def and_rows(bitmaps: jax.Array, rows: jax.Array,
             force_jnp: bool = False) -> jax.Array:
    """AND of selected bitmap rows. rows: (B, K) int32 (pad with the all-ones
    sentinel row id). Returns (B, W) uint32. Doc-sharded bitmaps take the
    jnp path (XLA auto-partitions under the arrays' NamedSharding)."""
    runtime.dispatches.bump()
    if not force_jnp and _single_device(bitmaps) and runtime.use_pallas() \
            and bitmaps.shape[1] % WBLOCK == 0:
        return _reduce_rows_pallas(bitmaps, rows, op="and")
    return _reduce_rows_jnp(bitmaps, rows, "and")


def or_rows(bitmaps: jax.Array, rows: jax.Array,
            force_jnp: bool = False) -> jax.Array:
    """OR of selected bitmap rows (pad with the all-zeros sentinel row id)."""
    runtime.dispatches.bump()
    if not force_jnp and _single_device(bitmaps) and runtime.use_pallas() \
            and bitmaps.shape[1] % WBLOCK == 0:
        return _reduce_rows_pallas(bitmaps, rows, op="or")
    return _reduce_rows_jnp(bitmaps, rows, "or")


# ---------------------------------------------------------------------------
# Bit expansion / extraction
# ---------------------------------------------------------------------------

def expand_bits(words: jax.Array) -> jax.Array:
    """(..., W) uint32 -> (..., W*32) bool, bit i of word j -> doc j*32+i."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = jnp.bitwise_and(
        jnp.right_shift(words[..., None], shifts), jnp.uint32(1))
    return bits.reshape(*words.shape[:-1], words.shape[-1] * 32).astype(jnp.bool_)


def bit_member(words: jax.Array, doc_ids: jax.Array) -> jax.Array:
    """Membership probe: words (W,) or (B, W); doc_ids (..., C) -> bool."""
    w = jnp.right_shift(doc_ids, 5)
    b = jnp.bitwise_and(doc_ids, 31).astype(jnp.uint32)
    if words.ndim == 1:
        picked = words[w]
    else:
        picked = jnp.take_along_axis(words, w, axis=-1)
    return jnp.bitwise_and(jnp.right_shift(picked, b), jnp.uint32(1)) == 1


_HIER_MIN_WORDS = 1024   # >= 32k docs: use the hierarchical extractor


@functools.partial(jax.jit, static_argnames=("n", "descending"))
def _topn_direct(words: jax.Array, n: int, descending: bool) -> jax.Array:
    B, W = words.shape
    bits = expand_bits(words)  # (B, N)
    ids = jnp.arange(W * 32, dtype=jnp.int32)
    if descending:
        keys = jnp.where(bits, ids[None, :], -1)
        vals, _ = jax.lax.top_k(keys, n)
        return jnp.where(vals >= 0, vals, -1)
    keys = jnp.where(bits, -ids[None, :], jnp.int32(-(2 ** 31) + 1))
    vals, _ = jax.lax.top_k(keys, n)
    return jnp.where(vals > -(2 ** 31) + 1, -vals, -1)


_SELECT_BSEARCH_MIN_L = 16384  # broadcast-compare wins below this width


def _select_first_k(flags_dir: jax.Array, k: int):
    """Positions (direction-order) of the first k set flags per row.

    flags_dir: (B, L) int32 0/1 in DIRECTION order.
    -> (pos (B, k) int32, valid (B, k) bool).

    Two regimes over the inclusive cumsum (pos_j = searchsorted-left of
    rank j+1):
    - small L: one fused (B, k, L) broadcast compare+sum on the VPU.
    - large L (Wikipedia scale, W ~ 127k words at 4M docs): the broadcast
      matrix is O(B*k*L) ~ 16G ops per batch and dominated the whole
      dense dispatch; a fixed-iteration vectorized binary search costs
      log2(L) gathers of (B, k) instead. (jnp.searchsorted itself is a
      data-dependent gather loop on TPU — hand-rolled fori_loop keeps it
      static.)
    """
    L = flags_dir.shape[-1]
    csum = jnp.cumsum(flags_dir, axis=-1)  # non-decreasing
    targets = jnp.arange(1, k + 1, dtype=csum.dtype)
    if L < _SELECT_BSEARCH_MIN_L:
        pos = jnp.sum((csum[:, None, :] < targets[None, :, None])
                      .astype(jnp.int32), axis=-1)
        valid = pos < L
        return jnp.where(valid, pos, 0).astype(jnp.int32), valid
    B = flags_dir.shape[0]
    tgt = jnp.broadcast_to(targets[None, :], (B, k))
    lo = jnp.zeros((B, k), dtype=jnp.int32)
    hi = jnp.full((B, k), L, dtype=jnp.int32)
    # search space is [0, L] inclusive (L+1 states): L.bit_length() halvings
    steps = max(1, L.bit_length())

    def body(_, lohi):
        lo, hi = lohi
        mid = jnp.minimum((lo + hi) >> 1, L - 1)
        v = jnp.take_along_axis(csum, mid, axis=1)
        smaller = v < tgt
        return (jnp.where(smaller, mid + 1, lo),
                jnp.where(smaller, hi, mid))

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    valid = lo < L
    return jnp.where(valid, lo, 0).astype(jnp.int32), valid


_SELECT_BLOCK_WORDS = 256  # blocked-select granularity (see below)


def _select_first_k_blocked(occ_dir: jax.Array, k: int):
    """Positions (direction order) of the first k set flags per row,
    TWO-LEVEL: per-block set counts -> tiny cumsum over W/256 blocks ->
    per-rank block lookup -> inner select within one gathered block.

    The flat _select_first_k pays a full-width (B, W) int32 cumsum (a
    log-depth scan: ~15 passes over 570 MB at W=35k, measured 56 ms of
    the 64 ms dense batch); this reads the flags once for block counts,
    gathers only the k addressed blocks, and keeps every intermediate
    k-or-block sized. -> (pos (B, k) int32, valid (B, k) bool)."""
    B, L = occ_dir.shape
    Wb = _SELECT_BLOCK_WORDS
    assert L % Wb == 0
    nb = L // Wb
    blocks = occ_dir.reshape(B, nb, Wb)
    bc = jnp.sum(blocks, axis=-1, dtype=jnp.int32)     # (B, nb)
    bcs = jnp.cumsum(bc, axis=-1)                      # (B, nb) tiny
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)    # ranks
    # block holding rank j: searchsorted-left over the block cumsum
    pos_b = jnp.sum((bcs[:, None, :] < targets[None, :, None])
                    .astype(jnp.int32), axis=-1)       # (B, k) in [0, nb]
    valid = pos_b < nb
    pb = jnp.where(valid, pos_b, 0)
    base = jnp.where(pb > 0,
                     jnp.take_along_axis(bcs, jnp.maximum(pb - 1, 0),
                                         axis=1), 0)
    rj = targets[None, :] - base                       # rank within block
    sel = jnp.take_along_axis(blocks, pb[:, :, None], axis=1)  # (B, k, Wb)
    ics = jnp.cumsum(sel.astype(jnp.int32), axis=-1)
    pos_in = jnp.sum((ics < rj[:, :, None]).astype(jnp.int32), axis=-1)
    valid = jnp.logical_and(valid, pos_in < Wb)
    pos = pb * Wb + pos_in
    return jnp.where(valid, pos, 0).astype(jnp.int32), valid


@functools.partial(jax.jit, static_argnames=("n", "descending"))
def _topn_hierarchical(words: jax.Array, n: int,
                       descending: bool) -> jax.Array:
    """Two-stage sort-free top-n set-bit extraction for large corpora.

    Stage 1 selects the first <= n non-empty WORDS in direction order
    via the blocked two-level select (no full-width cumsum, no top_k —
    both dominated the whole dense batch at Wikipedia scale). Stage 2
    expands only those words' bits (n*32 candidates) and compacts the
    first n set bits. Everything is memory-bound block-reduce/gather
    work; the only full-width passes are the popcount and block counts,
    which XLA fuses into one read of the result words.
    """
    B, W = words.shape
    pc = jnp.bitwise_count(words).astype(jnp.uint8)  # (B, W), 0..32
    count = jnp.sum(pc.astype(jnp.int32), axis=-1)
    m = min(n, W)
    occ_dir = (pc > 0).astype(jnp.uint8)
    if descending:
        occ_dir = occ_dir[:, ::-1]
    # small W: the flat one-shot broadcast select is cheaper than the
    # block gather machinery (measured 5.3 vs 8.7 ms/batch at W=4096)
    if W % _SELECT_BLOCK_WORDS == 0 and W >= _SELECT_BSEARCH_MIN_L:
        pos, valid = _select_first_k_blocked(occ_dir, m)
    else:
        pos, valid = _select_first_k(occ_dir.astype(jnp.int32), m)
    wid = (W - 1 - pos) if descending else pos     # original word index
    sel_ids = jnp.where(valid, wid, 0)
    sel_words = jnp.take_along_axis(words, sel_ids, axis=1)
    sel_words = jnp.where(valid, sel_words, jnp.uint32(0))

    # stage 2: bits of selected words, flattened in direction order
    bits = expand_bits(sel_words[..., None])       # (B, m, 32) bit i = doc*32+i
    local = jnp.arange(32, dtype=jnp.int32)
    if descending:
        bits = bits[:, :, ::-1]
        docids = sel_ids[:, :, None] * 32 + (31 - local)[None, None, :]
    else:
        docids = sel_ids[:, :, None] * 32 + local[None, None, :]
    flat_bits = bits.reshape(B, m * 32).astype(jnp.int32)
    flat_ids = docids.reshape(B, m * 32)
    pos2, valid2 = _select_first_k(flat_bits, n)
    out = jnp.take_along_axis(flat_ids, pos2, axis=1)
    return jnp.where(valid2, out, -1), count


def topn_from_bitmap(words: jax.Array, n: int,
                     descending: bool = True) -> jax.Array:
    """Top-n set bit positions (doc ids) of each bitmap, ordered by doc id.

    words: (B, W) -> (B, n) int32, -1 padded. This is the SEARCH
    "SORT <pk> LIMIT n" path when doc-id order == PK order (the reference's
    Top-N shortcut, search_pipeline.h:348).
    """
    W = words.shape[-1]
    runtime.dispatches.bump()
    if W >= _HIER_MIN_WORDS:
        return _topn_hierarchical(words, n, descending)[0]
    return _topn_direct(words, n, descending)


@functools.partial(jax.jit, static_argnames=("has_not", "has_extra", "n",
                                             "descending", "use_pallas"))
def _dense_search_topn(bitmaps, rows, nrows, deleted, extra,
                       has_not: bool, has_extra: bool,
                       n: int, descending: bool, use_pallas: bool):
    if use_pallas:
        _, res = dense_query_pallas(bitmaps, rows, deleted)
    else:
        _, res = dense_query(bitmaps, rows, nrows, deleted, extra,
                             has_not=has_not, has_extra=has_extra)
    if res.shape[-1] >= _HIER_MIN_WORDS:
        ids, count = _topn_hierarchical(res, n, descending)
    else:
        ids = _topn_direct(res, n, descending)
        count = popcount_words(res)
    return count, ids


def dense_search_topn(bitmaps, rows, nrows, deleted, extra,
                      has_not: bool, has_extra: bool,
                      n: int, descending: bool = True):
    """Fused dense AND search + top-n id extraction: ONE compiled program,
    ONE dispatch. The (B, W) result words never round-trip through HBM
    twice or cross to the host — only (B,) counts and (B, n) ids do.

    This is the serving-path replacement for dense_query_auto +
    topn_from_bitmap (which cost two dispatches and a full top_k over the
    doc domain)."""
    single_device = True
    try:
        single_device = len(bitmaps.sharding.device_set) == 1
    except AttributeError:
        pass
    use_pallas = (single_device and not has_not and not has_extra
                  and runtime.use_pallas()
                  and bitmaps.shape[1] % PBLOCK == 0)
    runtime.dispatches.bump()
    return _dense_search_topn(bitmaps, rows, nrows, deleted, extra,
                              has_not, has_extra, n, descending, use_pallas)


# ---------------------------------------------------------------------------
# Delta-packed uint16 result transport. Batched SEARCH throughput on
# tunneled backends is bound by the device->host result pull, not device
# compute (measured: the fused dense kernel finishes in ~0.1 ms while the
# (B,)+(B,128) int32 pull costs 25-140 ms depending on tunnel weather).
# Top-n ids are direction-sorted, so consecutive deltas almost always fit
# 16 bits: [cnt_lo, cnt_hi|flag, id0_lo, id0_hi, d1..d(n-1)] uint16 halves
# the bytes AND collapses two pulls (count, ids) into one. Rows whose
# deltas overflow set bit 15 of cnt_hi; the caller then falls back to one
# extra pull of the full int32 ids (kept alive on device) — counts are
# never approximated.
# ---------------------------------------------------------------------------

def _pack_topn_u16(count: jax.Array, ids: jax.Array, descending: bool
                   ) -> jax.Array:
    valid = ids >= 0
    diff = jnp.abs(ids[:, :-1] - ids[:, 1:])
    diff = jnp.where(valid[:, 1:], diff, 0).astype(jnp.uint32)
    over = jnp.any(diff > 0xFFFF, axis=1).astype(jnp.uint32)
    id0 = jnp.where(valid[:, 0], ids[:, 0], 0).astype(jnp.uint32)
    cnt = count.astype(jnp.uint32)
    u16 = jnp.concatenate([
        (cnt & 0xFFFF)[:, None],
        ((cnt >> 16) | (over << 15))[:, None],
        (id0 & 0xFFFF)[:, None],
        (id0 >> 16)[:, None],
        jnp.minimum(diff, 0xFFFF),
    ], axis=1)
    return u16.astype(jnp.uint16)


def unpack_topn_u16(u16: "np.ndarray", ids_dev, n: int, descending: bool):
    """Host-side decode of _pack_topn_u16 -> (counts int64 (B,),
    ids int32 (B, n), -1 padded). ids_dev is the device-resident int32
    ids array, pulled ONLY when a row's deltas overflowed 16 bits."""
    import numpy as np
    u = u16.astype(np.int64)
    cnt_hi = u[:, 1]
    over = (cnt_hi >> 15) & 1
    cnt = u[:, 0] | ((cnt_hi & 0x7FFF) << 16)
    if over.any():
        return cnt, np.asarray(ids_dev)
    id0 = u[:, 2] | (u[:, 3] << 16)
    sign = -1 if descending else 1
    B = u.shape[0]
    ids = np.empty((B, n), dtype=np.int64)
    ids[:, 0] = id0
    ids[:, 1:] = id0[:, None] + sign * np.cumsum(u[:, 4:], axis=1)
    m = np.minimum(cnt, n)
    ids[np.arange(n)[None, :] >= m[:, None]] = -1
    return cnt, ids.astype(np.int32)


@functools.partial(jax.jit, static_argnames=(
    "has_not", "has_extra", "n", "descending", "use_pallas"))
def _dense_search_topn_packed(bitmaps, rows, nrows, deleted, extra,
                              has_not, has_extra, n, descending,
                              use_pallas):
    count, ids = _dense_search_topn(
        bitmaps, rows, nrows, deleted, extra, has_not, has_extra, n,
        descending, use_pallas)
    return _pack_topn_u16(count, ids, descending), ids


def dense_search_topn_packed(bitmaps, rows, nrows, deleted, extra,
                             has_not: bool, has_extra: bool,
                             n: int, descending: bool = True):
    """dense_search_topn with delta-packed uint16 transport: returns
    numpy (counts (B,) int64, ids (B, n) int32). ONE device->host pull
    of ~(4+n) uint16 per query in the common case (see _pack_topn_u16)."""
    import numpy as np
    single_device = True
    try:
        single_device = len(bitmaps.sharding.device_set) == 1
    except AttributeError:
        pass
    use_pallas = (single_device and not has_not and not has_extra
                  and runtime.use_pallas()
                  and bitmaps.shape[1] % PBLOCK == 0)
    runtime.dispatches.bump()
    u16, ids_dev = _dense_search_topn_packed(
        bitmaps, rows, nrows, deleted, extra, has_not, has_extra, n,
        descending, use_pallas)
    return unpack_topn_u16(np.asarray(u16), ids_dev, n, descending)


# ---------------------------------------------------------------------------
# Device bitmap algebra (boolean-AST path: reference Roaring set ops,
# index.cpp:378-446 — here whole trees evaluate on device and only the
# final W words cross to the host)
# ---------------------------------------------------------------------------

@jax.jit
def bm_and(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.bitwise_and(a, b)


@jax.jit
def bm_or(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.bitwise_or(a, b)


@jax.jit
def bm_andnot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.bitwise_and(a, jnp.bitwise_not(b))


@functools.partial(jax.jit, static_argnames=("bucket", "n_words"))
def bitmap_from_postings(postings: jax.Array, off: jax.Array, ln: jax.Array,
                         *, bucket: int, n_words: int) -> jax.Array:
    """Scatter one CSR posting slice into a (W,) word bitmap on device
    (no host round-trip of the id list)."""
    from .posting_ops import gather_slices
    ids = gather_slices(postings, off[None], ln[None], bucket)[0]
    w = jnp.right_shift(ids, 5)
    bit = jnp.left_shift(jnp.uint32(1),
                         jnp.bitwise_and(ids, 31).astype(jnp.uint32))
    w = jnp.where((ids >= 0) & (w < n_words), w, n_words)  # pad -> dropped
    words = jnp.zeros((n_words + 1,), dtype=jnp.uint32)
    # scatter-add == scatter-or here: a slice's doc ids are unique, so
    # every (word, bit) contribution is distinct
    words = words.at[w].add(bit)
    return words[:n_words]


@functools.partial(jax.jit, static_argnames=("K", "S", "bucket", "n_words"))
def term_bitmap(bitmaps: jax.Array, rows: jax.Array, postings: jax.Array,
                offs: jax.Array, lens: jax.Array, deleted: jax.Array,
                *, K: int, S: int, bucket: int, n_words: int,
                real=None) -> jax.Array:
    """(W,) bitmap of docs containing ALL grams of one term: AND of dense
    rows (padded with the all-ones sentinel) and scattered sparse slices
    (len 0 slots = padding = AND identity). Tombstones cleared.

    ``real`` ((S,) bool, optional): marks slots holding a REAL term whose
    slice may legitimately be empty — e.g. a shard of the doc-sharded CSR
    with no postings for that term. A real empty slot contributes ZEROS
    (the term matches nothing there), not the all-ones padding identity;
    without it the mesh AST path turns term-free shards into match-all."""
    words = _reduce_rows_jnp(bitmaps, rows[None], "and")[0]

    def body(i, acc):
        wi = bitmap_from_postings(postings, offs[i], lens[i],
                                  bucket=bucket, n_words=n_words)
        if real is None:
            fill = jnp.uint32(U32_ONES)
        else:
            fill = jnp.where(real[i], jnp.uint32(0), jnp.uint32(U32_ONES))
        wi = jnp.where(lens[i] > 0, wi, fill)
        return jnp.bitwise_and(acc, wi)

    words = jax.lax.fori_loop(0, S, body, words)
    return jnp.bitwise_and(words, jnp.bitwise_not(deleted))


@functools.partial(jax.jit, static_argnames=("n", "descending", "count_only"))
def bitmap_count_topn(words: jax.Array, n: int, descending: bool,
                      count_only: bool = False):
    """Final AST reduction: (count, top-n ids) from one (W,) bitmap."""
    w2 = words[None, :]
    count = popcount_words(w2)[0]
    if count_only:
        return count, jnp.zeros((1,), dtype=jnp.int32)
    if words.shape[-1] >= _HIER_MIN_WORDS:
        ids, _ = _topn_hierarchical(w2, n, descending)
    else:
        ids = _topn_direct(w2, n, descending)
    return count, ids[0]


def make_bitmap_from_ids(doc_ids, n_words: int):
    """Host helper: numpy sorted/unique doc ids -> uint32 word array."""
    import numpy as np
    words = np.zeros(n_words, dtype=np.uint32)
    ids = np.asarray(doc_ids, dtype=np.int64)
    if ids.size:
        np.bitwise_or.at(words, ids >> 5,
                         np.left_shift(np.uint32(1), (ids & 31).astype(np.uint32)))
    return words
