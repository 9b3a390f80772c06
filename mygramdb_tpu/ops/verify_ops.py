"""Device-side verify_text: batched substring check over packed texts.

The reference's verify_text post-filter scans candidate documents' stored
normalized text for every query term (search_pipeline.h:159-190) — a
host hot loop. Here the normalized corpus lives in HBM as one flat
code-point array (+ per-doc offset/length) or a padded (N, maxT) matrix,
and verification is a fused window-compare kernel:

    match_at(i) = AND_k ( k >= needle_len  OR  text[i+k] == needle[k] )
    contains    = OR_i ( match_at(i) AND i + needle_len <= doc_len )

evaluated for every candidate x needle in one dispatch — O(C * maxT * L)
vectorized compares on the VPU instead of per-doc Python/C host scans.

Kernel shape notes (the round-3 rewrite; measured on the 1.1M-doc bench):

- The window loop is STATICALLY UNROLLED over the needle-cap bucket with
  static column slices ``text[:, k:k+maxT]``.  The previous
  ``fori_loop`` + ``dynamic_slice`` form forced XLA to materialize a full
  (C, maxT) window copy per step — cap x Nn times the memory traffic.
  Static slices fuse into ONE elementwise pass over the text tile.
- Compares run in the pack's native dtype (uint16 for BMP corpora —
  halves both HBM gather bytes and VPU compare work). Needle code points
  that don't fit the narrow dtype are mapped to the padding sentinel,
  which can never match an in-range text cell, so a non-BMP needle
  correctly fails device-side (non-BMP documents are host-verified).
- ``maxT`` may be SMALLER than the padded matrix row width: the gather
  slices columns, so callers that know a candidate-length bound (e.g.
  the max doc length over a sparse driver term's postings) pay
  O(C * bound) instead of O(C * global_p99).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEEDLE_CAP = 32  # needles longer than this fall back to host verification
_CAP_BUCKETS = (4, 8, 16, 32)


def needle_cap_bucket(max_len: int) -> int:
    """Static window-loop bound: the compare loop costs O(cap * C * maxT),
    so a 2-char CJK needle must not pay the full 32-step cap."""
    for c in _CAP_BUCKETS:
        if max_len <= c:
            return c
    return NEEDLE_CAP


def _sentinel_of(dtype) -> int:
    return 0xFFFF if dtype == jnp.uint16 else 0xFFFFFFFF


def _cast_needles(needles: jax.Array, dtype):
    """needles (Nn, CAP) uint32 -> text dtype. Code points that don't fit
    the narrow dtype become the padding sentinel — which never equals an
    in-range text cell (in-range cells are real sub-sentinel text), so the
    compare correctly never matches."""
    if dtype == jnp.uint16:
        sent = jnp.uint32(0xFFFF)
        return jnp.minimum(needles, sent).astype(jnp.uint16)
    return needles.astype(jnp.uint32)


def _gather_text_flat(codepoints, offsets, lengths, cand_ids, maxT,
                      cap=NEEDLE_CAP, need_len=True):
    """(C, maxT+cap) text window via element gather from the flat pack,
    in the pack's native dtype (uint16 for BMP-only corpora).
    -> (text, doc_len, maxT) — the window width the compare loop should
    sweep (= maxT here; the padded layout returns its physical width).

    offsets is a (group, remainder) int32 pair in 1024-cell units
    (DeviceTextStore._upload): a 10M-doc pack crosses 2^31 cells, past
    int32 flat indexing, so the gather addresses a (P/1024, 1024) view
    with per-cell (group, lane) coordinates — all math int32-safe."""
    off_grp, off_rem = offsets
    ids = jnp.maximum(cand_ids, 0)
    g0 = off_grp[ids]
    r0 = off_rem[ids]
    doc_len = lengths[ids]
    sent = _sentinel_of(codepoints.dtype)
    pos = jnp.arange(maxT + cap, dtype=jnp.int32)[None, :]
    valid = pos < doc_len[:, None]
    t = r0[:, None] + pos            # < 1024 + maxT + cap
    g = g0[:, None] + (t >> 10)
    r = jnp.bitwise_and(t, 1023)
    cp2 = codepoints.reshape(-1, 1024)
    g = jnp.minimum(jnp.where(valid, g, 0), cp2.shape[0] - 1)
    r = jnp.where(valid, r, 0)
    text = cp2[g, r]
    text = jnp.where(valid, text, jnp.asarray(sent, dtype=codepoints.dtype))
    return text, doc_len, maxT


def _gather_text_padded(padded, lengths, cand_ids, maxT, cap=NEEDLE_CAP,
                        need_len=True):
    """Text rows via FULL-WIDTH row gather from the (N, rowT) padded
    matrix — contiguous DMA rows; column-sliced gathers measured ~10x
    slower on TPU, so the physical row always transfers whole. The pad
    builder bakes NEEDLE_CAP sentinel columns into rowT, so no concat
    pass is needed: the compare window sweep is rowT - cap.

    doc_len (score-path norm / in-range checks) is recovered from the
    sentinel fill only when needed — it costs one extra full pass over
    the gathered tile."""
    ids = jnp.maximum(cand_ids, 0)
    rows = padded[ids]
    rowT = padded.shape[1]
    doc_len = None
    if need_len:
        sent = jnp.asarray(_sentinel_of(padded.dtype), dtype=padded.dtype)
        doc_len = jnp.sum((rows != sent).astype(jnp.int32), axis=1)
    if rowT >= maxT + cap:
        return rows, doc_len, rowT - cap
    # legacy layout without baked pad columns: append them
    sent = jnp.asarray(_sentinel_of(padded.dtype), dtype=padded.dtype)
    pad = jnp.full((rows.shape[0], cap), sent, dtype=padded.dtype)
    return jnp.concatenate([rows, pad], axis=1), doc_len, rowT


def gather_text(codepoints, offsets, lengths, cand_ids, maxT,
                cap=NEEDLE_CAP, need_len=True):
    """Dispatch on pack layout: (N, rowT) padded matrix -> row gather;
    (P,) flat pack -> element gather. -> (text, doc_len|None, window)."""
    if codepoints.ndim == 2:
        return _gather_text_padded(codepoints, lengths, cand_ids, maxT,
                                   cap, need_len)
    return _gather_text_flat(codepoints, offsets, lengths, cand_ids, maxT,
                             cap, need_len)


def _match_at(text, ndl, nlen, maxT: int, cap: int):
    """match_at (C, maxT) bool for ONE needle. text (C, maxT+cap) native
    dtype; ndl (cap,) same dtype; nlen traced scalar. Statically unrolled:
    XLA fuses the cap shifted compares into one pass over the text tile."""
    m = None
    for k in range(cap):
        cmp = jnp.logical_or(k >= nlen, text[:, k:k + maxT] == ndl[k])
        m = cmp if m is None else jnp.logical_and(m, cmp)
    return m


def contains_all(text, doc_len, needles, needle_lens, maxT: int, Nn: int,
                 cap: int, use_range: bool = True):
    """(C,) bool: text contains EVERY (non-empty) needle. needles (Nn, CAP)
    uint32 (cast to the text dtype internally); needle_lens (Nn,) int32.

    use_range=False skips the start+len <= doc_len mask (and doc_len may
    be None): when every needle cell compares BELOW the padding sentinel,
    a window overlapping the sentinel fill can never match, so the range
    check is redundant — one less (C, maxT) mask pass. Callers MUST keep
    use_range=True when a needle cell can equal the sentinel (non-BMP
    needles against a uint16 pack)."""
    ndl = _cast_needles(needles, text.dtype)
    starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]
    acc = None
    for j in range(Nn):
        nlen = needle_lens[j]
        m = _match_at(text, ndl[j], nlen, maxT, cap)
        if use_range:
            m = jnp.logical_and(m, starts + nlen <= doc_len[:, None])
        contains = jnp.any(m, axis=1)
        contains = jnp.logical_or(contains, nlen == 0)
        acc = contains if acc is None else jnp.logical_and(acc, contains)
    return acc


def tf_matrix(text, doc_len, needles, needle_lens, maxT: int, Nn: int,
              cap: int, use_range: bool = True):
    """(C, Nn) int32 all-positions match counts (== the reference's
    non-overlapping count for needles with no proper border).
    use_range semantics: see contains_all."""
    ndl = _cast_needles(needles, text.dtype)
    starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]
    cols = []
    for j in range(Nn):
        nlen = needle_lens[j]
        m = _match_at(text, ndl[j], nlen, maxT, cap)
        if use_range:
            m = jnp.logical_and(m, starts + nlen <= doc_len[:, None])
        count = jnp.sum(m.astype(jnp.int32), axis=1)
        cols.append(jnp.where(nlen == 0, 0, count))
    return jnp.stack(cols, axis=1)


def tf_matrix_nonoverlap(text, doc_len, needles, needle_lens, maxT: int,
                         Nn: int, cap: int, use_range: bool = True):
    """(C, Nn) int32 NON-OVERLAPPING (leftmost-greedy) match counts — the
    reference's CountTermOccurrences semantics (bm25_scorer.h:36-40) for
    needles with a proper border (e.g. "aa" in "aaaa" -> 2, not 3).

    A lax.scan walks match positions left-to-right with a per-candidate
    next-free cursor; each step is a tiny vectorized op over (C,), so this
    is maxT sequential VPU steps — only used when a query term actually
    self-overlaps (rare), replacing the much slower host fallback."""
    ndl = _cast_needles(needles, text.dtype)
    starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]
    cols = []
    for j in range(Nn):
        nlen = needle_lens[j]
        m = _match_at(text, ndl[j], nlen, maxT, cap)
        if use_range:
            m = jnp.logical_and(m, starts + nlen <= doc_len[:, None])
        hits = m  # (C, maxT)

        def step(carry, inp):
            nextf, cnt = carry
            pos, col = inp
            take = jnp.logical_and(col, pos >= nextf)
            cnt = cnt + take.astype(jnp.int32)
            nextf = jnp.where(take, pos + nlen, nextf)
            return (nextf, cnt), None

        C = hits.shape[0]
        init = (jnp.zeros((C,), jnp.int32), jnp.zeros((C,), jnp.int32))
        pos_arr = jnp.arange(maxT, dtype=jnp.int32)
        (_, count), _ = jax.lax.scan(step, init, (pos_arr, hits.T))
        cols.append(jnp.where(nlen == 0, 0, count))
    return jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("C", "maxT", "Nn", "cap",
                                             "use_range"))
def substring_verify_device(codepoints: jax.Array, offsets: jax.Array,
                            lengths: jax.Array, cand_ids: jax.Array,
                            needles: jax.Array, needle_lens: jax.Array,
                            *, C: int, maxT: int, Nn: int,
                            cap: int = NEEDLE_CAP,
                            use_range: bool = True) -> jax.Array:
    """-> (C,) bool: candidate text contains ALL needles.

    codepoints: (P,) packed corpus OR (N, rowT) padded text matrix
    (row-gather fast path), uint16 or uint32; offsets/lengths: (N,) int32
    indexed by doc id; cand_ids: (C,) int32 (pad with -1); needles:
    (Nn, NEEDLE_CAP) uint32 (0 padded); needle_lens: (Nn,) int32
    (0 len = vacuously true row). use_range: see contains_all.
    """
    text, doc_len, win = gather_text(codepoints, offsets, lengths,
                                     cand_ids, maxT, cap,
                                     need_len=use_range)
    mask = contains_all(text, doc_len, needles, needle_lens, win, Nn, cap,
                        use_range)
    return jnp.logical_and(mask, cand_ids >= 0)


@functools.partial(jax.jit, static_argnames=("C", "maxT", "Nn", "cap",
                                             "use_range"))
def substring_masks_device(codepoints: jax.Array, offsets: jax.Array,
                           lengths: jax.Array, cand_ids: jax.Array,
                           needles: jax.Array, needle_lens: jax.Array,
                           *, C: int, maxT: int, Nn: int,
                           cap: int = NEEDLE_CAP,
                           use_range: bool = True) -> jax.Array:
    """-> (C, Nn) bool: per-needle contains columns (the boolean-AST
    exact-text post-filter evaluates the tree over these with numpy
    algebra instead of a per-doc Python loop)."""
    text, doc_len, win = gather_text(codepoints, offsets, lengths,
                                     cand_ids, maxT, cap,
                                     need_len=use_range)
    ndl = _cast_needles(needles, text.dtype)
    starts = jnp.arange(win, dtype=jnp.int32)[None, :]
    cols = []
    for j in range(Nn):
        nlen = needle_lens[j]
        m = _match_at(text, ndl[j], nlen, win, cap)
        if use_range:
            m = jnp.logical_and(m, starts + nlen <= doc_len[:, None])
        contains = jnp.any(m, axis=1)
        cols.append(jnp.logical_or(contains, nlen == 0))
    masks = jnp.stack(cols, axis=1)
    return jnp.logical_and(masks, (cand_ids >= 0)[:, None])


@functools.partial(jax.jit, static_argnames=("C", "maxT", "Nn", "cap",
                                             "nonoverlap"))
def count_occurrences_device(codepoints: jax.Array, offsets: jax.Array,
                             lengths: jax.Array, cand_ids: jax.Array,
                             needles: jax.Array, needle_lens: jax.Array,
                             *, C: int, maxT: int, Nn: int,
                             cap: int = NEEDLE_CAP,
                             nonoverlap: bool = False):
    """BM25 TF on device: -> (tf (C, Nn) int32, doc_len (C,) int32).

    nonoverlap=False counts ALL match positions (== the reference's
    non-overlapping count for borderless needles); nonoverlap=True runs
    the exact leftmost-greedy scan (self-overlapping query terms).
    doc_len is always materialized (the BM25 norm needs it), so the
    range mask is kept too (it is nearly free once doc_len exists).
    """
    text, doc_len, win = gather_text(codepoints, offsets, lengths,
                                     cand_ids, maxT, cap, need_len=True)
    fn = tf_matrix_nonoverlap if nonoverlap else tf_matrix
    tf = fn(text, doc_len, needles, needle_lens, win, Nn, cap)
    alive = (cand_ids >= 0)[:, None]
    return jnp.where(alive, tf, 0), jnp.where(cand_ids >= 0, doc_len, 0)


def bm25_scores(tf, doc_len, idf, k1, b, avgdl):
    """(C,) float32 BM25 from a TF matrix (reference bm25_scorer.h:41)."""
    tff = tf.astype(jnp.float32)
    norm = k1 * (1.0 - b + b * doc_len.astype(jnp.float32)[:, None] /
                 jnp.maximum(avgdl, 1e-9))
    return jnp.sum(idf[None, :] * tff * (k1 + 1.0) /
                   jnp.maximum(tff + norm, 1e-9), axis=1)


@functools.partial(jax.jit, static_argnames=("C", "maxT", "Nn", "n", "cap",
                                             "nonoverlap"))
def bm25_topk_device(codepoints: jax.Array, offsets: jax.Array,
                     lengths: jax.Array, cand_ids: jax.Array,
                     needles: jax.Array, needle_lens: jax.Array,
                     idf: jax.Array, k1: jax.Array, b: jax.Array,
                     avgdl: jax.Array, *, C: int, maxT: int, Nn: int,
                     n: int, cap: int = NEEDLE_CAP,
                     nonoverlap: bool = False):
    """Fused BM25: TF count -> score -> top-n, ONE dispatch. Only the top
    n (score, id) pairs cross to the host — replacing the
    materialize-all-ids + host-sort path for ``SORT _score`` queries
    (reference bm25_scorer.h:41 + search_handler.cpp:431 semantics: score
    desc, ties doc-id desc).

    idf: (Nn,) float32 per-needle IDF (0 for padding needles).
    -> (top_ids (n,) int32 -1 padded, top_scores (n,) float32).
    """
    tf, dl = count_occurrences_device(
        codepoints, offsets, lengths, cand_ids, needles, needle_lens,
        C=C, maxT=maxT, Nn=Nn, cap=cap, nonoverlap=nonoverlap)
    score = bm25_scores(tf, dl, idf, k1, b, avgdl)
    score = jnp.where(cand_ids >= 0, score, -jnp.inf)
    # two-key sort: score desc, doc id desc
    neg_score = -score
    neg_id = -cand_ids
    _, _, ids_sorted, score_sorted = jax.lax.sort(
        (neg_score, neg_id, cand_ids, score), num_keys=2)
    return ids_sorted[:n], score_sorted[:n]


# --------------------------------------------------------------------------
# Pallas fused row-gather + TF over the padded text layout
# --------------------------------------------------------------------------
#
# The XLA padded-row gather (`padded[ids]`) moves candidate rows at
# ~24 GB/s (measured: 11.3 of 16.6 ms of a 64-query fused-verify batch at
# 1.1M docs) and materializes the (B*Kv, rowT) tile to HBM before the
# compare passes read it back. This kernel instead streams candidate rows
# HBM->VMEM with explicit double-buffered DMAs (next step's rows prefetch
# while the current step's window compares run) and computes the per-needle
# match counts in-kernel — the gathered text never touches HBM.
#
# Layout contract: `padded` is the DeviceTextStore padded matrix with the
# NEEDLE_CAP sentinel pad columns baked in and rowT 128-lane aligned.
# Candidate ids arrive flattened (B*Kv,) with Kv % _TF_ROWS == 0, so every
# grid step's _TF_ROWS rows belong to one query and the per-query needle
# block is selected by `(step * _TF_ROWS) // Kv`.

_TF_ROWS = 16  # candidate rows DMA'd + verified per grid step


def _window_tf_emit(rows, dl2, ndl_ref, nlen_ref, out_ref, R: int, Nn: int,
                    cap: int, win: int, use_range: bool):
    """Shared kernel tail: rows (R, >=win+cap) int32 (sentinel-masked past
    doc end), dl2 (R, 1) int32 doc lengths -> out_ref[...] = [tf | dl].

    Everything here stays rank-2: mosaic's vector layout inference has no
    lowering for 1-D <-> N-D shape casts (e.g. vector<16xi32> ->
    vector<16x1xi32>), so reductions keep dims and columns concatenate
    along lanes instead of stacking 1-D vectors."""
    starts = jax.lax.broadcasted_iota(jnp.int32, (R, win), 1)
    cols = []
    for j in range(Nn):
        nl = nlen_ref[0, 0, j]
        m = None
        for k in range(cap):
            val = ndl_ref[0, 0, j * cap + k]
            cmp = jnp.logical_or(k >= nl, rows[:, k:k + win] == val)
            m = cmp if m is None else jnp.logical_and(m, cmp)
        if use_range:
            m = jnp.logical_and(m, starts + nl <= dl2)
        tf = jnp.sum(m.astype(jnp.int32), axis=1, keepdims=True)
        cols.append(jnp.where(nl == 0, 0, tf))
    out_ref[...] = jnp.concatenate(cols + [dl2], axis=1)


def _tf_rows_kernel(R: int, Nn: int, cap: int, W: int, sentinel: int,
                    use_range: bool):
    # W: DMA'd row width (a 128 multiple <= the physical rowT, chosen
    # from the batch's maxT bucket) — lane slices [0, W) of the padded
    # matrix are tile-aligned, so short-doc batches copy a fraction of
    # the physical row. Docs longer than W-cap never reach this kernel
    # (the planner's maxT bucket bounds candidate lengths).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    win = W - cap

    def compute(scratch, buf, id_at, ndl_ref, nlen_ref, out_ref):
        # scratch[buf]: (R, 8, rowT) — each candidate's 8-doc tile group;
        # the target row is selected per candidate by a scalar one-hot
        # mask+sum over sublanes (mosaic has no dynamic sublane index,
        # and 1-D vectors don't lower — stay rank-2 throughout). Compares
        # run in int32: u16/u32 tiles upcast once (the u32 sentinel
        # 0xFFFFFFFF wraps to -1; needle values are codepoints <=
        # 0x10FFFF so they can never alias it)
        parts = []
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        for j in range(R):
            grp = scratch[buf, j].astype(jnp.int32)  # (8, W)
            hit = sub_iota == jnp.bitwise_and(id_at(j), 7)
            parts.append(jnp.sum(jnp.where(hit, grp, 0), axis=0,
                                 keepdims=True))
        rows = jnp.concatenate(parts, axis=0)  # (R, W)
        dl2 = jnp.sum((rows != sentinel).astype(jnp.int32), axis=1,
                      keepdims=True)
        _window_tf_emit(rows, dl2, ndl_ref, nlen_ref, out_ref, R, Nn, cap,
                        win, use_range)

    def kern(ids_ref, idsn_ref, ndl_ref, nlen_ref, text_ref, out_ref,
             scratch, sems):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def dma(buf, j, idref):
            # text_ref is the (N//8, 8, rowT) grouped view: slices along
            # the untiled leading dim lower for any offset; a direct
            # (1, rowT) row slice of the 2-D padded matrix would violate
            # the (8, 128) HBM tiling. The lane slice [0, W) is
            # tile-aligned (W % 128 == 0).
            g0 = jax.lax.shift_right_logical(idref[0, 0, j], 3)
            src = (text_ref.at[pl.ds(g0, 1)]
                   if W == text_ref.shape[2]
                   else text_ref.at[pl.ds(g0, 1), :, pl.ds(0, W)])
            return pltpu.make_async_copy(
                src, scratch.at[buf, pl.ds(j, 1)], sems.at[buf, j])

        def start_all(buf, idref):
            for j in range(R):
                dma(buf, j, idref).start()

        def finish(buf):
            # the waits reconstruct the exact descriptors started for this
            # step (ids_ref here == idsn_ref of the step that started them)
            for j in range(R):
                dma(buf, j, ids_ref).wait()
            compute(scratch, buf, lambda j: ids_ref[0, 0, j],
                    ndl_ref, nlen_ref, out_ref)

        even = jnp.equal(jnp.remainder(i, 2), 0)

        @pl.when(i == 0)
        def _():
            start_all(0, ids_ref)

        @pl.when(jnp.logical_and(i + 1 < nsteps, even))
        def _():
            start_all(1, idsn_ref)

        @pl.when(jnp.logical_and(i + 1 < nsteps, jnp.logical_not(even)))
        def _():
            start_all(0, idsn_ref)

        @pl.when(even)
        def _():
            finish(0)

        @pl.when(jnp.logical_not(even))
        def _():
            finish(1)

    return kern


def cast_needles_i32(needles: jax.Array, dtype, cap: int) -> jax.Array:
    """(B, Nn, CAP) uint32 -> (B, Nn*cap) int32 in the kernel's compare
    domain: clamped to the u16 sentinel for narrow packs (the clamped cell
    then never matches — same semantics as _cast_needles), plain widening
    for u32 packs (codepoints <= 0x10FFFF stay positive; the u32 sentinel
    upcasts to -1 in-kernel, so no aliasing)."""
    ndl = needles[:, :, :cap]
    if dtype == jnp.uint16:
        ndl = jnp.minimum(ndl, jnp.uint32(0xFFFF))
    return ndl.astype(jnp.int32).reshape(needles.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("Kv", "Nn", "cap", "use_range",
                                             "width", "interpret"))
def tf_rows_pallas(padded: jax.Array, ids: jax.Array, ndl_i32: jax.Array,
                   nlen_i32: jax.Array, *, Kv: int, Nn: int, cap: int,
                   use_range: bool, width: int = 0,
                   interpret: bool = False) -> jax.Array:
    """Fused row-gather + TF: -> (M, Nn+1) int32 — per-candidate per-needle
    window match counts (range-masked when use_range) with doc_len in the
    last column.

    padded: (N, rowT) DeviceTextStore padded matrix (sentinel-filled past
    doc end, NEEDLE_CAP pad columns baked in); ids: (M,) flattened
    candidate ids, M = B*Kv, Kv % _TF_ROWS == 0, invalid lanes pre-clamped
    to 0; ndl_i32: (B, Nn*cap) via cast_needles_i32; nlen_i32: (B, Nn).
    width: DMA'd row prefix (128 multiple covering the batch's maxT
    bucket + cap; 0 = full rows) — every candidate doc length must be
    <= width - cap.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = ids.shape[0]
    N, rowT = padded.shape
    if N % 8 or rowT % 128:
        raise ValueError("padded matrix must be (8k, 128m) — the group "
                         "DMA slices whole (8, rowT) HBM tiles (got %s)"
                         % str(padded.shape))
    W = width or rowT
    if W % 128 or W > rowT or W <= cap:
        raise ValueError("width must be a 128 multiple in (cap, rowT]")
    R = _TF_ROWS
    nsteps = M // R
    sent = 0xFFFF if padded.dtype == jnp.uint16 else -1
    # mosaic block rule: the last two block dims must be (8,128)-divisible
    # OR equal the array dims. Scalar SMEM operands therefore travel as
    # rank-3 (rows, 1, X) arrays with (1, 1, X) blocks — both trailing
    # block dims equal the array's, valid for any rows/X. The text matrix
    # is viewed as (N//8, 8, rowT) 8-doc groups (a free leading-dim split)
    # so the per-candidate DMA slices its untiled group dim.
    ids3 = ids.reshape(nsteps, 1, R)
    ndl3 = ndl_i32[:, None, :]
    nlen3 = nlen_i32[:, None, :]
    text3 = padded.reshape(N // 8, 8, rowT)
    return pl.pallas_call(
        _tf_rows_kernel(R, Nn, cap, W, sent, use_range),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R),
                         lambda i: (jnp.minimum(i + 1, nsteps - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Nn * cap), lambda i: ((i * R) // Kv, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Nn), lambda i: ((i * R) // Kv, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, Nn + 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Nn + 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, R, 8, W), padded.dtype),
                        pltpu.SemaphoreType.DMA((2, R))],
        interpret=interpret,
    )(ids3, ids3, ndl3, nlen3, text3)


def _tf_flat_kernel(R: int, Nn: int, cap: int, win: int, SG: int,
                    sentinel: int, use_range: bool):
    # Region-fetch design. A flat pack's 1-D HBM memref is coarse-tiled
    # (1024 cells) and dynamic slice offsets must be provably
    # tile-aligned, so per-candidate window DMAs at arbitrary doc offsets
    # cannot lower. Instead the pack is viewed as (P//1024, 8, 128)
    # groups; each candidate DMAs the SG whole groups covering
    # [off, off+win+cap) (the group dim is untiled — any offset lowers),
    # and the window TF runs over the fetched region in its native
    # (rows, 128) shape with shifted-lane compares + a relative-position
    # start mask — no realignment pass, no reshapes below rank 2.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S_tot = SG * 8           # region rows per candidate
    RS = R * S_tot           # stacked region rows per grid step
    REG = S_tot * 128        # region cells per candidate

    def scalars_col(vals):
        """R scalars -> (R*S_tot, 1) with each scalar splat over its
        candidate's S_tot rows (1-D vectors don't lower; concat stays
        rank-2)."""
        return jnp.concatenate(
            [jnp.full((S_tot, 1), v, jnp.int32) for v in vals], axis=0)

    def compute(region_u, q_col, dl_col, dl_at, ndl_ref, nlen_ref,
                out_ref):
        t = region_u.astype(jnp.int32)  # (RS, 128)
        # cell position relative to each candidate's doc start
        row_i = jax.lax.broadcasted_iota(jnp.int32, (RS, 128), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (RS, 128), 1)
        base = (row_i // S_tot) * REG  # start row offset of own region
        rel = (row_i * 128 + lane_i - base) - q_col
        t = jnp.where(jnp.logical_and(rel >= 0, rel < dl_col), t, sentinel)
        # sh[k] = text shifted k cells left in flat order (lane shift
        # with row carry). Cross-candidate leakage at region boundaries
        # only reaches start positions the rel-mask already kills.
        down = jnp.concatenate(
            [t[1:], jnp.full((1, 128), sentinel, jnp.int32)], axis=0)
        sh = [t]
        for k in range(1, cap):
            sh.append(jnp.concatenate([t[:, k:], down[:, :k]], axis=1))
        startmask = jnp.logical_and(rel >= 0, rel < win)
        rows_out = []
        for j in range(R):
            cols = []
            lo, hi = j * S_tot, (j + 1) * S_tot
            for jn in range(Nn):
                nl = nlen_ref[0, 0, jn]
                m = None
                for k in range(cap):
                    val = ndl_ref[0, 0, jn * cap + k]
                    cmp = jnp.logical_or(k >= nl, sh[k] == val)
                    m = cmp if m is None else jnp.logical_and(m, cmp)
                m = jnp.logical_and(m, startmask)
                if use_range:
                    m = jnp.logical_and(m, rel + nl <= dl_col)
                tf = jnp.sum(m[lo:hi].astype(jnp.int32))
                cols.append(jnp.full((1, 1),
                                     jnp.where(nl == 0, 0, tf), jnp.int32))
            cols.append(jnp.full((1, 1), dl_at(j), jnp.int32))
            rows_out.append(jnp.concatenate(cols, axis=1))
        out_ref[...] = jnp.concatenate(rows_out, axis=0)

    def kern(grp_ref, grpn_ref, rem_ref, len_ref, ndl_ref, nlen_ref,
             text_ref, out_ref, scratch, sems):
        # offsets arrive pre-split as (group, remainder) int32 pairs —
        # a 10M-doc pack crosses 2^31 cells, past int32 flat offsets
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def dma(buf, j, gref):
            return pltpu.make_async_copy(
                text_ref.at[pl.ds(gref[0, 0, j], SG)],
                scratch.at[buf, j], sems.at[buf, j])

        def start_all(buf, gref):
            for j in range(R):
                dma(buf, j, gref).start()

        def finish(buf):
            for j in range(R):
                dma(buf, j, grp_ref).wait()
            region = scratch[buf].reshape(RS, 128)
            q_col = scalars_col([rem_ref[0, 0, j] for j in range(R)])
            dl_col = scalars_col([len_ref[0, 0, j] for j in range(R)])
            compute(region, q_col, dl_col,
                    lambda j: len_ref[0, 0, j], ndl_ref, nlen_ref, out_ref)

        even = jnp.equal(jnp.remainder(i, 2), 0)

        @pl.when(i == 0)
        def _():
            start_all(0, grp_ref)

        @pl.when(jnp.logical_and(i + 1 < nsteps, even))
        def _():
            start_all(1, grpn_ref)

        @pl.when(jnp.logical_and(i + 1 < nsteps, jnp.logical_not(even)))
        def _():
            start_all(0, grpn_ref)

        @pl.when(even)
        def _():
            finish(0)

        @pl.when(jnp.logical_not(even))
        def _():
            finish(1)

    return kern


@functools.partial(jax.jit, static_argnames=("Kv", "Nn", "cap", "win",
                                             "use_range", "interpret"))
def tf_rows_flat_pallas(codepoints: jax.Array, grp: jax.Array,
                        rem: jax.Array, ln: jax.Array, ndl_i32: jax.Array,
                        nlen_i32: jax.Array, *, Kv: int, Nn: int, cap: int,
                        win: int, use_range: bool,
                        interpret: bool = False) -> jax.Array:
    """Flat-pack variant of tf_rows_pallas: each candidate DMAs the
    1024-cell groups covering [off, off+win+cap) from the flat code-point
    array — no padded matrix needed. Serves the verified path at corpus
    sizes past the padded-layout HBM budget (see _tf_flat_kernel for the
    region-fetch design forced by the 1-D HBM tiling rules).

    codepoints: (P,) flat pack, P % 1024 == 0, CARRYING the
    FLAT_GATHER_PAD sentinel tail (DeviceTextStore.flat_padded);
    grp/rem: (M,) int32 per-candidate pack offsets SPLIT into 1024-cell
    group + in-group remainder (off = grp*1024 + rem — packs past 2^31
    cells cannot ship flat int32 offsets); ln: (M,) int32 doc lengths
    (invalid lanes pre-clamped to doc 0 = len 0);
    -> (M, Nn+1) int32 [tf | doc_len], like tf_rows_pallas.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = grp.shape[0]
    P = codepoints.shape[0]
    if P % 1024:
        raise ValueError("flat pack length must be a multiple of 1024 "
                         "(DeviceTextStore pads it; got %d)" % P)
    R = _TF_ROWS
    nsteps = M // R
    sent = 0xFFFF if codepoints.dtype == jnp.uint16 else -1
    # groups covering [off, off+win+cap) for any in-group offset q<=1023
    SG = (1023 + win + cap + 1023) // 1024
    text3 = codepoints.reshape(P // 1024, 8, 128)
    # mosaic block rule (see tf_rows_pallas): scalar SMEM operands travel
    # rank-3 with (1, 1, X) blocks whose trailing dims equal the array's
    grp3 = grp.reshape(nsteps, 1, R)
    rem3 = rem.reshape(nsteps, 1, R)
    ln3 = ln.reshape(nsteps, 1, R)
    ndl3 = ndl_i32[:, None, :]
    nlen3 = nlen_i32[:, None, :]
    return pl.pallas_call(
        _tf_flat_kernel(R, Nn, cap, win, SG, sent, use_range),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R),
                         lambda i: (jnp.minimum(i + 1, nsteps - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Nn * cap), lambda i: ((i * R) // Kv, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Nn), lambda i: ((i * R) // Kv, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, Nn + 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Nn + 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, R, SG, 8, 128), codepoints.dtype),
                        pltpu.SemaphoreType.DMA((2, R))],
        interpret=interpret,
    )(grp3, grp3, rem3, ln3, ndl3, nlen3, text3)


def _tf_flat_owner_kernel(R: int, Nn: int, cap: int, win: int, SG: int,
                         sentinel: int, use_range: bool):
    """Owner-indexed + live-skipping variant of _tf_flat_kernel for
    GLOBALLY-COMPACTED candidate rows (fused._tf_rows_flat_global):

    - rows arrive packed across queries, so the per-step needle block
      cannot be selected by the static (i*R)//Kv map — instead each row
      carries its OWNER query id and the full (B, Nn*cap) needle table
      sits in SMEM, indexed dynamically per row (scalar-core loads that
      feed the vector compares as splat columns, same rank-2 shapes as
      the base kernel).
    - valid rows form a PREFIX of length V (the pack is a cumsum rank
      scatter), so steps past ceil(V/R) skip both their DMAs and their
      compute — kernel cost tracks the batch's actual survivor count,
      the same property the XLA scan stage gives padded layouts.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S_tot = SG * 8
    RS = R * S_tot
    REG = S_tot * 128

    def scalars_col(vals):
        return jnp.concatenate(
            [jnp.full((S_tot, 1), v, jnp.int32) for v in vals], axis=0)

    def compute(region_u, q_col, dl_col, dl_at, own_at, ndl_ref,
                nlen_ref, out_ref):
        t = region_u.astype(jnp.int32)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (RS, 128), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (RS, 128), 1)
        base = (row_i // S_tot) * REG
        rel = (row_i * 128 + lane_i - base) - q_col
        t = jnp.where(jnp.logical_and(rel >= 0, rel < dl_col), t, sentinel)
        down = jnp.concatenate(
            [t[1:], jnp.full((1, 128), sentinel, jnp.int32)], axis=0)
        sh = [t]
        for k in range(1, cap):
            sh.append(jnp.concatenate([t[:, k:], down[:, :k]], axis=1))
        startmask = jnp.logical_and(rel >= 0, rel < win)
        masks = []
        for jn in range(Nn):
            nl_col = scalars_col(
                [nlen_ref[own_at(j), 0, jn] for j in range(R)])
            m = None
            for k in range(cap):
                val_col = scalars_col(
                    [ndl_ref[own_at(j), 0, jn * cap + k]
                     for j in range(R)])
                cmp = jnp.logical_or(k >= nl_col, sh[k] == val_col)
                m = cmp if m is None else jnp.logical_and(m, cmp)
            m = jnp.logical_and(m, startmask)
            if use_range:
                m = jnp.logical_and(m, rel + nl_col <= dl_col)
            masks.append(m)
        rows_out = []
        for j in range(R):
            lo, hi = j * S_tot, (j + 1) * S_tot
            cols = []
            for jn in range(Nn):
                nl = nlen_ref[own_at(j), 0, jn]
                tf = jnp.sum(masks[jn][lo:hi].astype(jnp.int32))
                cols.append(jnp.full((1, 1),
                                     jnp.where(nl == 0, 0, tf), jnp.int32))
            cols.append(jnp.full((1, 1), dl_at(j), jnp.int32))
            rows_out.append(jnp.concatenate(cols, axis=1))
        out_ref[...] = jnp.concatenate(rows_out, axis=0)

    def kern(grp_ref, grpn_ref, rem_ref, len_ref, own_ref, v_ref,
             ndl_ref, nlen_ref, text_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        v = v_ref[0, 0, 0]
        live_here = i * R < v
        live_next = (i + 1) * R < v

        def dma(buf, j, gref):
            return pltpu.make_async_copy(
                text_ref.at[pl.ds(gref[0, 0, j], SG)],
                scratch.at[buf, j], sems.at[buf, j])

        def start_all(buf, gref):
            for j in range(R):
                dma(buf, j, gref).start()

        def finish(buf):
            for j in range(R):
                dma(buf, j, grp_ref).wait()
            region = scratch[buf].reshape(RS, 128)
            q_col = scalars_col([rem_ref[0, 0, j] for j in range(R)])
            dl_col = scalars_col([len_ref[0, 0, j] for j in range(R)])
            compute(region, q_col, dl_col,
                    lambda j: len_ref[0, 0, j],
                    lambda j: own_ref[0, 0, j],
                    ndl_ref, nlen_ref, out_ref)

        even = jnp.equal(jnp.remainder(i, 2), 0)

        @pl.when(jnp.logical_and(i == 0, live_here))
        def _():
            start_all(0, grp_ref)

        @pl.when(jnp.logical_and(
            jnp.logical_and(i + 1 < nsteps, even), live_next))
        def _():
            start_all(1, grpn_ref)

        @pl.when(jnp.logical_and(
            jnp.logical_and(i + 1 < nsteps, jnp.logical_not(even)),
            live_next))
        def _():
            start_all(0, grpn_ref)

        @pl.when(jnp.logical_and(even, live_here))
        def _():
            finish(0)

        @pl.when(jnp.logical_and(jnp.logical_not(even), live_here))
        def _():
            finish(1)

        @pl.when(jnp.logical_not(live_here))
        def _():
            # dead suffix: rows here are pack padding; the XLA wrapper's
            # scatter-back drops them, but the output block must still be
            # written deterministically
            out_ref[...] = jnp.zeros((R, Nn + 1), jnp.int32)

    return kern


# SMEM budget for the replicated needle table (B * Nn * cap int32 plus
# the nlen table): stay well under the scalar-memory ceiling
_OWNER_NDL_SMEM_MAX = 4096


@functools.partial(jax.jit, static_argnames=("B", "Nn", "cap", "win",
                                             "use_range", "interpret"))
def tf_rows_flat_global_pallas(codepoints: jax.Array, grp: jax.Array,
                               rem: jax.Array, ln: jax.Array,
                               owner: jax.Array, v: jax.Array,
                               ndl_i32: jax.Array, nlen_i32: jax.Array,
                               *, B: int, Nn: int, cap: int, win: int,
                               use_range: bool,
                               interpret: bool = False) -> jax.Array:
    """Globally-compacted flat-pack gather+TF: like tf_rows_flat_pallas
    but rows are packed across queries (valid prefix of length `v`),
    each row carries its owner query id, and steps past the live prefix
    skip their DMAs — per-batch cost ∝ actual AND survivors instead of
    B*Kv pad slots (the 10M verified-path fix, r4 verdict next #3).

    grp/rem/ln/owner: (M,) int32, dead rows clamped to doc 0 / owner 0;
    v: () int32 live-prefix length; ndl_i32 (B, Nn*cap) int32 full
    needle table; nlen_i32 (B, Nn) int32. -> (M, Nn+1) [tf | doc_len].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = grp.shape[0]
    P = codepoints.shape[0]
    if P % 1024:
        raise ValueError("flat pack length must be a multiple of 1024 "
                         "(DeviceTextStore pads it; got %d)" % P)
    R = _TF_ROWS
    if M % R:
        raise ValueError("packed row count must be a multiple of "
                         f"{R} (got {M})")
    nsteps = M // R
    sent = 0xFFFF if codepoints.dtype == jnp.uint16 else -1
    SG = (1023 + win + cap + 1023) // 1024
    text3 = codepoints.reshape(P // 1024, 8, 128)
    grp3 = grp.reshape(nsteps, 1, R)
    rem3 = rem.reshape(nsteps, 1, R)
    ln3 = ln.reshape(nsteps, 1, R)
    own3 = owner.reshape(nsteps, 1, R)
    v3 = v.astype(jnp.int32).reshape(1, 1, 1)
    ndl3 = ndl_i32.reshape(B, 1, Nn * cap)
    nlen3 = nlen_i32.astype(jnp.int32).reshape(B, 1, Nn)
    return pl.pallas_call(
        _tf_flat_owner_kernel(R, Nn, cap, win, SG, sent, use_range),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R),
                         lambda i: (jnp.minimum(i + 1, nsteps - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1, Nn * cap), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1, Nn), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, Nn + 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Nn + 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, R, SG, 8, 128), codepoints.dtype),
                        pltpu.SemaphoreType.DMA((2, R))],
        interpret=interpret,
    )(grp3, grp3, rem3, ln3, own3, v3, ndl3, nlen3, text3)


def has_self_overlap(term: str) -> bool:
    """True when the term has a proper border (prefix == suffix), i.e. the
    all-positions count can exceed the non-overlapping count."""
    n = len(term)
    for i in range(1, n):
        if term[:i] == term[n - i:]:
            return True
    return False
