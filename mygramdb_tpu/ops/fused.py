"""Fully-fused verified search: match -> extract -> verify -> score -> top-k
in ONE device dispatch.

The north-star workload (CJK bigram + verify_text [+ BM25 SORT _score],
BASELINE.md) previously issued 2-3 sequential dispatches per query (search,
window-verify, TF/score) — each a full RTT on tunneled backends. This
program chains them on-device:

1. dense AND over bitmap rows (+tombstones), or the rarest sparse term's
   CSR slice probed by the other grams                  [VPU / Pallas]
2. COMPACT the first Kv masked candidates (rank scatter): the window
   verify then runs over the actual match set, not the full driver slice.
   The kernel also returns the pre-verify match count; when it exceeds Kv
   the caller falls back to the exact multi-dispatch path (rare: Kv covers
   the AND-intersection, which is far smaller than the driver df).
3. gather candidate texts — column-sliced to the query's doc-length bound
   (maxT bucket), native dtype (uint16 for BMP corpora)
4. one statically-unrolled window pass computing per-needle match COUNTS
   (tf): verify mask = every needle count > 0 — verify and BM25 term
   frequencies come from the same compare pass
5. verified count; top-n by doc id, or by BM25 (score desc, ties id desc)
   when score_mode

Only (counts, n ids [, n scores]) cross back to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import runtime
from .bitmap_ops import (_topn_hierarchical, dense_query, dense_query_pallas,
                         PBLOCK, _single_device)
from .posting_ops import SENTINEL
from .verify_ops import (NEEDLE_CAP, _OWNER_NDL_SMEM_MAX, _TF_ROWS,
                         _cast_needles, bm25_scores, cast_needles_i32,
                         contains_all, gather_text, needle_cap_bucket,
                         tf_matrix, tf_matrix_nonoverlap,
                         tf_rows_flat_global_pallas, tf_rows_flat_pallas,
                         tf_rows_pallas)


def compact_first_k(cands: jax.Array, mask: jax.Array, Kv: int):
    """First Kv masked candidates (input order), SENTINEL-padded, via a
    rank scatter — O(C) work, no per-slot compare matrix.
    -> (sel (Kv,) int32, pre_count scalar int32)."""
    m = mask.astype(jnp.int32)
    rank = jnp.cumsum(m) - 1
    pre = jnp.sum(m)
    idx = jnp.where(jnp.logical_and(mask, rank < Kv), rank, Kv)
    sel = jnp.full((Kv + 1,), SENTINEL, dtype=jnp.int32)
    sel = sel.at[idx].set(cands, mode="drop")[:Kv]
    return sel, pre


def _verify_topn(sel, codepoints, offsets, lengths, needles, needle_lens,
                 idf, k1, b, avgdl, *, Kv, n, Nn, maxT, cap, descending,
                 score_mode, nonoverlap, require_match=True,
                 use_range=True):
    """Shared tail: window-verify a compacted candidate vector and reduce
    to (verified count, top-n ids [, scores]).

    require_match=False (score_mode only): keep ALL candidates — scoring
    a non-verify_text query must not drop gram matches whose text lacks
    the literal term (their TF is 0, score ~0; the reference scores the
    raw SearchAnd result set, search_handler.cpp:431).
    use_range=False skips the doc_len recovery + in-range mask when no
    needle cell can alias the padding sentinel (see verify_ops)."""
    from .posting_ops import mask_to_topn
    alive = sel != SENTINEL
    safe = jnp.where(alive, sel, 0)
    need_len = score_mode or use_range
    text, doc_len, win = gather_text(codepoints, offsets, lengths, safe,
                                     maxT, cap, need_len=need_len)
    if score_mode:
        fn = tf_matrix_nonoverlap if nonoverlap else tf_matrix
        tf = fn(text, doc_len, needles, needle_lens, win, Nn, cap)
        if require_match:
            present = needle_lens > 0
            ok = jnp.logical_or(tf > 0, jnp.logical_not(present)[None, :])
            vmask = jnp.logical_and(jnp.all(ok, axis=1), alive)
        else:
            vmask = alive
        count = jnp.sum(vmask.astype(jnp.int32))
        score = bm25_scores(tf, doc_len, idf, k1, b, avgdl)
        score = jnp.where(vmask, score, -jnp.inf)
        ids_for_sort = jnp.where(alive, sel, -1)
        _, _, ids_sorted, score_sorted = jax.lax.sort(
            (-score, -ids_for_sort, ids_for_sort, score), num_keys=2)
        ids_out = jnp.where(jnp.isfinite(score_sorted[:n]),
                            ids_sorted[:n], -1)
        return count, ids_out, score_sorted[:n]
    vmask = contains_all(text, doc_len, needles, needle_lens, win, Nn, cap,
                         use_range)
    vmask = jnp.logical_and(vmask, alive)
    count, ids_out = mask_to_topn(sel, vmask, n, descending)
    return count, ids_out, jnp.zeros((n,), dtype=jnp.float32)


def _reduce_from_tf(sel, tf, doc_len, needle_lens, idf_row, k1, b, avgdl,
                    *, n, descending, score_mode, require_match):
    """Per-query tail over a precomputed TF matrix (the Pallas fused
    gather+TF kernel's output): verify mask = every present needle's count
    > 0; then count + top-n (or BM25 score + top-n). Mirrors _verify_topn's
    reductions exactly — only the text gather + compare pass moved into
    the kernel."""
    from .posting_ops import mask_to_topn
    alive = sel != SENTINEL
    present = needle_lens > 0
    ok = jnp.logical_or(tf > 0, jnp.logical_not(present)[None, :])
    matched = jnp.all(ok, axis=1)
    if score_mode:
        vmask = jnp.logical_and(matched, alive) if require_match else alive
        count = jnp.sum(vmask.astype(jnp.int32))
        score = bm25_scores(tf, doc_len, idf_row, k1, b, avgdl)
        score = jnp.where(vmask, score, -jnp.inf)
        ids_for_sort = jnp.where(alive, sel, -1)
        _, _, ids_sorted, score_sorted = jax.lax.sort(
            (-score, -ids_for_sort, ids_for_sort, score), num_keys=2)
        ids_out = jnp.where(jnp.isfinite(score_sorted[:n]),
                            ids_sorted[:n], -1)
        return count, ids_out, score_sorted[:n]
    vmask = jnp.logical_and(matched, alive)
    count, ids_out = mask_to_topn(sel, vmask, n, descending)
    return count, ids_out, jnp.zeros((n,), dtype=jnp.float32)


def _tf_rows_global(sel_all, codepoints, offsets, lengths, needles,
                    needle_lens, *, Kv, Nn, maxT, cap, M, use_range,
                    need_len):
    """Cross-query candidate compaction ahead of the text gather: flatten
    the (B, Kv) per-query candidate vectors, pack the valid (non-sentinel)
    entries into the first M slots, gather + window-TF only those M rows
    (each row carries its owner query's needles), and scatter the TF
    matrix back into the (B, Kv, Nn) layout the shared reductions expect.

    Why: per-query candidate vectors are padded to the driver-df bucket,
    but the actual AND-survivor fill is 35-55% at 1.1M (host probe,
    2026-08-19), and the row gather is ROW-COUNT bound (~32 ns/row fixed
    vs ~124 GB/s marginal width cost — /tmp/probe_gather on TPU). Halving
    gathered rows halves the dominant verify stage; it also makes the
    verify cost track sum(pre) instead of B*C, the reference's cost shape
    (search_pipeline.cpp:660-682 scans actual candidates only).

    If the batch's total valid count V exceeds M, slots past M never
    receive a TF row and their candidates would silently fail the verify
    (undercount). The HOST wrapper detects this — sum(min(pre, Kv)) > M —
    and re-runs the batch with global compaction off, so the fused result
    is always exact.
    """
    B = sel_all.shape[0]
    BK = B * Kv
    flat = sel_all.reshape(-1)
    valid = flat != SENTINEL
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(jnp.logical_and(valid, pos < M), pos, M)
    src = jnp.zeros((M,), jnp.int32).at[tgt].set(
        jnp.arange(BK, dtype=jnp.int32), mode="drop")
    V = jnp.sum(valid.astype(jnp.int32))
    live = jnp.arange(M, dtype=jnp.int32) < V
    ids_m = jnp.where(live, flat[src], 0)
    owner = src // Kv
    text, dl, win = gather_text(codepoints, offsets, lengths, ids_m,
                                maxT, cap, need_len=need_len)
    ndl_m = _cast_needles(needles, text.dtype)[owner]   # (M, Nn, CAP)
    nlen_m = needle_lens.astype(jnp.int32)[owner]       # (M, Nn)
    starts = jnp.arange(win, dtype=jnp.int32)[None, :]
    cols = []
    for j in range(Nn):
        nl = nlen_m[:, j][:, None]
        m = None
        for k in range(cap):
            cmp = jnp.logical_or(
                k >= nl, text[:, k:k + win] == ndl_m[:, j, k][:, None])
            m = cmp if m is None else jnp.logical_and(m, cmp)
        if use_range:
            m = jnp.logical_and(m, starts + nl <= dl[:, None])
        cnt = jnp.sum(m.astype(jnp.int32), axis=1)
        cols.append(jnp.where(nlen_m[:, j] == 0, 0, cnt))
    tf_m = jnp.stack(cols, axis=1)                      # (M, Nn)
    back = jnp.where(live, src, BK)                     # dead slots drop
    tf = jnp.zeros((BK, Nn), jnp.int32).at[back].set(tf_m, mode="drop")
    if dl is None:
        dl_full = jnp.zeros((B, Kv), dtype=jnp.int32)
    else:
        dl_full = jnp.zeros((BK,), jnp.int32).at[back].set(
            dl.astype(jnp.int32), mode="drop").reshape(B, Kv)
    return tf.reshape(B, Kv, Nn), dl_full


def _tf_rows_global_scan(sel_all, codepoints, offsets, lengths, needles,
                         needle_lens, *, Kv, Nn, maxT, cap, M, use_range,
                         need_len):
    """Exact chunked cross-query compaction: like _tf_rows_global, but a
    lax.while_loop walks the packed candidate list in fixed (M,)-row
    chunks until every valid candidate has its TF row — so no batch can
    ever clip (no host rerun, no _GlobalClipMemo), verify cost tracks the
    batch's ACTUAL survivor total V = sum(min(pre, Kv)) instead of the
    padded B*Kv, and device memory stays bounded at one (M, maxT+cap)
    text tile regardless of Kv. This is what lets the dense-driver path
    drop its _VERIFY_WORKSPACE bail (r4 verdict missing #2): Kv can equal
    a 65536-wide dense candidate bucket and the loop still only gathers
    the documents that actually matched.

    The reference's verify cost shape is the model here: its substring
    post-filter scans exactly the candidate set each query produced
    (search_pipeline.h:159-190) — cost ∝ matches, never ∝ a pad width.
    """
    B = sel_all.shape[0]
    BK = B * Kv
    flat = sel_all.reshape(-1)
    valid = flat != SENTINEL
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(valid, pos, BK)
    # src[j] = flat index of the j-th valid candidate (packed order)
    src = jnp.zeros((BK,), jnp.int32).at[tgt].set(
        jnp.arange(BK, dtype=jnp.int32), mode="drop")
    V = jnp.sum(valid.astype(jnp.int32))
    ndl_all = _cast_needles(needles, codepoints.dtype)   # (B, Nn, cap)
    nlen_all = needle_lens.astype(jnp.int32)             # (B, Nn)

    def chunk_tf(k, tf, dl_out):
        idx = k * M + jnp.arange(M, dtype=jnp.int32)
        live = idx < V
        src_k = jnp.where(live, src[jnp.minimum(idx, BK - 1)], 0)
        ids_m = jnp.where(live, flat[src_k], 0)
        text, dl, win = gather_text(codepoints, offsets, lengths, ids_m,
                                    maxT, cap, need_len=need_len)
        owner = src_k // Kv
        ndl_m = ndl_all[owner]                           # (M, Nn, cap)
        nlen_m = nlen_all[owner]                         # (M, Nn)
        starts = jnp.arange(win, dtype=jnp.int32)[None, :]
        cols = []
        for j in range(Nn):
            nl = nlen_m[:, j][:, None]
            m = None
            for c in range(cap):
                cmp = jnp.logical_or(
                    c >= nl, text[:, c:c + win] == ndl_m[:, j, c][:, None])
                m = cmp if m is None else jnp.logical_and(m, cmp)
            if use_range:
                m = jnp.logical_and(m, starts + nl <= dl[:, None])
            cnt = jnp.sum(m.astype(jnp.int32), axis=1)
            cols.append(jnp.where(nlen_m[:, j] == 0, 0, cnt))
        tf_m = jnp.stack(cols, axis=1)                   # (M, Nn)
        back = jnp.where(live, src_k, BK)                # dead slots drop
        tf = tf.at[back].set(tf_m, mode="drop")
        if dl_out is not None:
            dl_out = dl_out.at[back].set(dl.astype(jnp.int32), mode="drop")
        return tf, dl_out

    tf0 = jnp.zeros((BK, Nn), jnp.int32)
    if need_len:
        def body(state):
            k, tf, dl_out = state
            tf, dl_out = chunk_tf(k, tf, dl_out)
            return k + 1, tf, dl_out
        _, tf, dl_flat = jax.lax.while_loop(
            lambda s: s[0] * M < V, body,
            (jnp.int32(0), tf0, jnp.zeros((BK,), jnp.int32)))
        dl_full = dl_flat.reshape(B, Kv)
    else:
        def body(state):
            k, tf = state
            tf, _ = chunk_tf(k, tf, None)
            return k + 1, tf
        _, tf = jax.lax.while_loop(
            lambda s: s[0] * M < V, body, (jnp.int32(0), tf0))
        dl_full = jnp.zeros((B, Kv), dtype=jnp.int32)
    return tf.reshape(B, Kv, Nn), dl_full


def _verify_stage(sel_all, codepoints, offsets, lengths, needles,
                  needle_lens, idf, k1, b, avgdl, *, Kv, n, Nn, maxT, cap,
                  descending, score_mode, nonoverlap, require_match,
                  use_range, pallas_tf, ptf_interpret=False,
                  global_m: int = 0, global_scan: int = 0,
                  global_pack: int = 0):
    """Batched verify tail: sel_all (B, Kv) compacted candidates ->
    (count (B,), ids (B, n), scores (B, n)).

    pallas_tf=True routes the gather+TF through the fused Pallas kernel at
    BATCH level (one kernel over all B*Kv rows — per-lane gathers under
    vmap lower to serial element gathers), then vmaps only the cheap
    reductions. pallas_tf=False is the XLA path (row gather + unrolled
    window compares), also used as the runtime fallback."""
    if pallas_tf:
        safe = jnp.where(sel_all != SENTINEL, sel_all, 0).reshape(-1)
        ndl = cast_needles_i32(needles, codepoints.dtype, cap)
        nlen = needle_lens.astype(jnp.int32)
        if codepoints.ndim == 1 and global_pack:
            # globally-compacted flat kernel: pack valid candidates to a
            # live prefix, owner-index the needle table, and let the
            # kernel's live-skip bound DMA work by the batch's ACTUAL
            # survivor count — the pallas analog of _tf_rows_global_scan.
            # global_pack = the packed width M (caller-bounded by the
            # batch's host-known survivor ceiling; V can never exceed it)
            B = sel_all.shape[0]
            BK = B * Kv
            Mp = min(global_pack, BK)
            flat = sel_all.reshape(-1)
            valid = flat != SENTINEL
            pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
            tgt = jnp.where(valid, pos, BK)
            src = jnp.zeros((BK,), jnp.int32).at[tgt].set(
                jnp.arange(BK, dtype=jnp.int32), mode="drop")
            V = jnp.sum(valid.astype(jnp.int32))
            src_m = src[:Mp]
            live = jnp.arange(Mp, dtype=jnp.int32) < V
            src_s = jnp.where(live, src_m, 0)
            ids_m = jnp.where(live, flat[src_s], 0)
            own_m = jnp.where(live, src_s // Kv, 0)
            off_grp, off_rem = offsets
            ln_m = jnp.where(live, lengths[ids_m], 0)
            out = tf_rows_flat_global_pallas(
                codepoints, off_grp[ids_m], off_rem[ids_m], ln_m,
                own_m, V, ndl, nlen, B=B, Nn=Nn, cap=cap, win=maxT,
                use_range=bool(score_mode or use_range),
                interpret=ptf_interpret)
            back = jnp.where(live, src_s, BK)
            tf = jnp.zeros((BK, Nn), jnp.int32).at[back].set(
                out[:, :Nn], mode="drop").reshape(B, Kv, Nn)
            dl = jnp.zeros((BK,), jnp.int32).at[back].set(
                out[:, Nn], mode="drop").reshape(B, Kv)
            red = functools.partial(
                _reduce_from_tf, k1=k1, b=b, avgdl=avgdl, n=n,
                descending=descending, score_mode=score_mode,
                require_match=require_match)
            return jax.vmap(lambda s_, t, d, nl, i: red(s_, t, d, nl, i))(
                sel_all, tf, dl, needle_lens, idf)
        if codepoints.ndim == 2:
            # DMA only the row prefix covering the batch's candidate
            # length bound (maxT bucket): short-doc batches move up to
            # rowT/W fewer bytes per candidate
            rowT = codepoints.shape[1]
            W = min(rowT, ((maxT + cap + 127) // 128) * 128)
            out = tf_rows_pallas(codepoints, safe, ndl, nlen, Kv=Kv,
                                 Nn=Nn, cap=cap,
                                 use_range=bool(score_mode or use_range),
                                 width=W, interpret=ptf_interpret)
        else:
            # flat pack: per-candidate [off, off+maxT+cap) window DMAs;
            # offsets travel as a (group, remainder) int32 pair (packs
            # past 2^31 cells cannot ship flat int32 offsets)
            off_grp, off_rem = offsets
            out = tf_rows_flat_pallas(
                codepoints, off_grp[safe], off_rem[safe], lengths[safe],
                ndl, nlen, Kv=Kv, Nn=Nn, cap=cap, win=maxT,
                use_range=bool(score_mode or use_range),
                interpret=ptf_interpret)
        B = sel_all.shape[0]
        tf = out[:, :Nn].reshape(B, Kv, Nn)
        dl = out[:, Nn].reshape(B, Kv)
        red = functools.partial(
            _reduce_from_tf, k1=k1, b=b, avgdl=avgdl, n=n,
            descending=descending, score_mode=score_mode,
            require_match=require_match)
        return jax.vmap(lambda s, t, d, nl, i: red(s, t, d, nl, i))(
            sel_all, tf, dl, needle_lens, idf)

    if (global_scan > 0 or global_m > 0) and not nonoverlap:
        if global_scan > 0:
            tf, dl = _tf_rows_global_scan(
                sel_all, codepoints, offsets, lengths, needles,
                needle_lens, Kv=Kv, Nn=Nn, maxT=maxT, cap=cap,
                M=global_scan, use_range=use_range,
                need_len=bool(score_mode or use_range))
        else:
            tf, dl = _tf_rows_global(
                sel_all, codepoints, offsets, lengths, needles,
                needle_lens, Kv=Kv, Nn=Nn, maxT=maxT, cap=cap, M=global_m,
                use_range=use_range,
                need_len=bool(score_mode or use_range))
        red = functools.partial(
            _reduce_from_tf, k1=k1, b=b, avgdl=avgdl, n=n,
            descending=descending, score_mode=score_mode,
            require_match=require_match)
        return jax.vmap(lambda s, t, d, nl, i: red(s, t, d, nl, i))(
            sel_all, tf, dl, needle_lens, idf)

    def one(sel, ndl_set, nlen_set, idf_row):
        return _verify_topn(
            sel, codepoints, offsets, lengths, ndl_set, nlen_set,
            idf_row, k1, b, avgdl, Kv=Kv, n=n, Nn=Nn, maxT=maxT,
            cap=cap, descending=descending, score_mode=score_mode,
            nonoverlap=nonoverlap, require_match=require_match,
            use_range=use_range)

    return jax.vmap(one)(sel_all, needles, needle_lens, idf)


def _pack_out(pre, count, ids, scores, score_mode: bool):
    """Fuse the four result tensors into ONE int32 array
    [pre | count | ids | scores-bitcast]: every jax->numpy leaf pull is a
    separate device->host round trip on tunneled backends (~20 ms each,
    measured) — one packed array costs one."""
    cols = [pre[:, None], count[:, None], ids]
    if score_mode:
        cols.append(jax.lax.bitcast_convert_type(scores, jnp.int32))
    return jnp.concatenate(cols, axis=1)


def _unpack_out(arr, n: int, score_mode: bool):
    import numpy as np
    pre = arr[:, 0]
    count = arr[:, 1]
    ids = arr[:, 2:2 + n]
    if score_mode:
        scores = arr[:, 2 + n:2 + 2 * n].copy().view(np.float32)
        return pre, count, ids, scores
    return pre, count, ids, None


@functools.partial(jax.jit, static_argnames=(
    "C", "Kv", "n", "Nn", "maxT", "descending", "score_mode", "use_pallas",
    "cap", "nonoverlap", "require_match", "use_range", "has_extra",
    "pallas_tf", "ptf_interpret", "global_m", "global_scan",
    "global_pack"))
def _search_verify_topn_batch(bitmaps, rows, nrows, deleted, extra,
                              codepoints, offsets, lengths,
                              needles, needle_lens, idf, k1, b, avgdl,
                              *, C: int, Kv: int, n: int, Nn: int,
                              maxT: int, descending: bool, score_mode: bool,
                              use_pallas: bool, cap: int = NEEDLE_CAP,
                              nonoverlap: bool = False,
                              require_match: bool = True,
                              use_range: bool = True,
                              has_extra: bool = False,
                              pallas_tf: bool = False,
                              ptf_interpret: bool = False,
                              global_m: int = 0,
                              global_scan: int = 0,
                              global_pack: int = 0):
    """Batched dense-driver fused verified search: B queries, each with its
    OWN needle set, in one dispatch. rows: (B, K); needles: (B, Nn, CAP);
    needle_lens: (B, Nn); idf: (B, Nn) f32.
    -> packed (B, 2+n[+n]) int32 (see _pack_out).

    The dense AND result words are compacted to the first C matching ids
    (ascending); pre > C means the extraction clipped and the caller must
    fall back (its verified count would be under-reported)."""
    if use_pallas and not has_extra:
        _, res = dense_query_pallas(bitmaps, rows, deleted)
    else:
        _, res = dense_query(bitmaps, rows, nrows, deleted, extra,
                             has_not=False, has_extra=has_extra)
    cand, pre = _topn_hierarchical(res, C, False)  # (B, C) asc, -1 pad
    sel_all = jnp.where(cand >= 0, cand, SENTINEL)
    if Kv < C:
        sel_all = sel_all[:, :Kv]
    count, ids, scores = _verify_stage(
        sel_all, codepoints, offsets, lengths, needles, needle_lens,
        idf, k1, b, avgdl, Kv=min(Kv, C), n=n, Nn=Nn, maxT=maxT, cap=cap,
        descending=descending, score_mode=score_mode, nonoverlap=nonoverlap,
        require_match=require_match, use_range=use_range,
        pallas_tf=pallas_tf, ptf_interpret=ptf_interpret,
        global_m=global_m, global_scan=global_scan,
        global_pack=global_pack)
    return _pack_out(pre, count, ids, scores, score_mode)


@functools.partial(jax.jit, static_argnames=(
    "C", "Cmax", "Kv", "n", "Nn", "maxT", "descending", "score_mode",
    "n_words", "cap", "nonoverlap", "use_dense_probes",
    "check_tombstones", "require_match", "use_range", "has_extra",
    "pallas_tf", "ptf_interpret", "global_m", "global_scan",
    "global_pack"))
def _sparse_search_verify_topn_batch(postings, bitmaps, deleted,
                                     d_off, d_len, sp_off, sp_len, sp_inv,
                                     dn_rows, dn_inv, extra,
                                     codepoints, offsets, lengths,
                                     needles, needle_lens,
                                     idf, k1, b, avgdl,
                                     *, C: int, Cmax: int, Kv: int, n: int,
                                     Nn: int, maxT: int, descending: bool,
                                     score_mode: bool, n_words: int,
                                     cap: int, nonoverlap: bool = False,
                                     use_dense_probes: bool = True,
                                     check_tombstones: bool = True,
                                     require_match: bool = True,
                                     use_range: bool = True,
                                     has_extra: bool = False,
                                     pallas_tf: bool = False,
                                     ptf_interpret: bool = False,
                                     global_m: int = 0,
                                     global_scan: int = 0,
                                     global_pack: int = 0):
    """Sparse-driver fused verified search, batched: the rarest term's CSR
    slice is the candidate vector (so C is bounded by its df — exactly the
    queries whose rarest gram is sparse), probed by the other grams,
    compacted to the first Kv survivors, window-verified, counted,
    top-n'd (or BM25-scored) — ONE dispatch. At Wikipedia scale this is
    THE north-star query shape (CJK + verify_text: the rarest kanji
    unigram is almost always in the sparse tail).

    -> (pre (B,), counts (B,), ids (B, n), scores (B, n)); pre > Kv means
    the compaction clipped and that query must take the exact path."""
    from .bitmap_ops import bit_member
    from .posting_ops import (bitmap_membership, gather_slices,
                              membership_sorted)

    # broadcast equality only for small probe matrices: at C*Cmax ~ 2^26
    # the compare pass alone costs ~60 ms/batch on the VPU, while the
    # blocked membership probe stays ~28 ms and scales better
    compare_all = C * Cmax <= (1 << 24)
    B, Ks = sp_off.shape
    # PROBELESS fast path: when the driver slice already fits the verify
    # width and the needles cover every query gram, the window verify
    # subsumes ALL gram membership probes (text contains term => text
    # contains each gram) — no sparse membership (~70 ms/batch of block
    # gathers), no dense bitmap probe, no compaction. This is the common
    # CJK + verify_text serving shape (rare-gram driver df <= Kv).
    probeless = (not use_dense_probes) and C <= Kv
    # batch-level slice gathers: the Pallas DMA fast path runs outside
    # the vmap (per-lane gathers lower to serial element gathers —
    # measured 280 ms vs ~1 ms for a 64-query probe batch)
    cands_all = gather_slices(postings, d_off, d_len, C)
    if probeless:
        sp_all = jnp.zeros((B, 1, 1), dtype=jnp.int32)
    else:
        sp_all = gather_slices(postings, sp_off.reshape(B * Ks),
                               sp_len.reshape(B * Ks), Cmax
                               ).reshape(B, Ks, Cmax)
    # tombstones are zero in the steady state (compaction folds them in);
    # the host wrapper switches check_tombstones off when none are set,
    # saving a (B, C) element gather into the deleted bitmap
    check_tomb = check_tombstones

    def one_sel(cands, sp, sinv, drows, dinv):
        cmask = cands != SENTINEL
        clip = jnp.clip(cands, 0, n_words * 32 - 1)
        mask = cmask
        if check_tomb:
            mask = mask & jnp.logical_not(bit_member(deleted, clip))
        if has_extra:
            # EQ-filter bitmap rows (shared across the batch: the
            # micro-batcher groups by filter identity) AND into the
            # candidate mask — filters are NOT subsumed by the window
            # verify, so they apply even in probeless mode
            for f in range(extra.shape[0]):
                mask = mask & bit_member(extra[f], clip)
        if not probeless:
            if compare_all:
                # probe by fused broadcast equality (vectorizes on the
                # VPU; binary-search gathers measured ~5x slower)
                spm = jax.vmap(lambda row: jnp.any(
                    row[None, :] == cands[:, None], axis=1))(sp)
            else:
                spm = membership_sorted(sp, cands)
            spm = jnp.logical_xor(spm, sinv[:, None])
            mask = mask & jnp.all(spm, axis=0)
            if use_dense_probes:
                dnm = jnp.logical_xor(
                    bitmap_membership(bitmaps, drows, clip),
                    dinv[:, None])
                mask = mask & jnp.all(dnm, axis=0)
        if probeless and Kv == C:
            # driver slice IS the candidate vector: pre <= Kv always
            sel = jnp.where(mask, cands, SENTINEL)
            pre = jnp.sum(mask.astype(jnp.int32))
        else:
            sel, pre = compact_first_k(cands, mask, Kv)
        return sel, pre

    sel_all, pre = jax.vmap(one_sel)(
        cands_all, sp_all, sp_inv, dn_rows, dn_inv)
    count, ids_out, scores = _verify_stage(
        sel_all, codepoints, offsets, lengths, needles, needle_lens,
        idf, k1, b, avgdl, Kv=Kv, n=n, Nn=Nn, maxT=maxT, cap=cap,
        descending=descending, score_mode=score_mode, nonoverlap=nonoverlap,
        require_match=require_match, use_range=use_range,
        pallas_tf=pallas_tf, ptf_interpret=ptf_interpret,
        global_m=global_m, global_scan=global_scan,
        global_pack=global_pack)
    return _pack_out(pre, count, ids_out, scores, score_mode)


def _zero_idf(B, Nn):
    import numpy as np
    return np.zeros((B, Nn), dtype=np.float32)


def _needles_need_range(text_store, needles) -> bool:
    """True when the in-range window mask is REQUIRED for correctness:
    only when the pack is uint16 and a needle code point clamps to the
    0xFFFF padding sentinel (the clamped cell would otherwise match the
    sentinel fill past doc end). uint32 packs use a non-codepoint
    sentinel, so the mask is always redundant there — skipping it saves
    a doc_len recovery pass plus a (C, maxT) mask per needle."""
    import numpy as np
    if getattr(text_store, "dtype", None) != np.uint16:
        return False
    mx = int(np.max(needles)) if np.size(needles) else 0
    return mx >= 0xFFFF


class _PallasTFState:
    """Process-wide kill switch for the fused Pallas gather+TF kernel: if
    it ever fails to compile or execute on the running backend, wrappers
    permanently fall back to the XLA verify path (results are identical;
    only the gather strategy differs)."""
    __slots__ = ("enabled",)

    def __init__(self) -> None:
        self.enabled = True


_pallas_tf_state = _PallasTFState()


def _pallas_tf_eligible(text_store, Kv: int, nonoverlap: bool) -> bool:
    """The fused gather+TF kernels require: TPU backend, a single-device
    text layout the DMAs understand (padded matrix with baked sentinel
    pad columns, or a flat pack carrying the FLAT_GATHER_PAD tail), a
    compaction width divisible by the kernel's row block, and
    all-positions TF semantics (the non-overlapping greedy scan stays on
    the XLA path)."""
    import os
    if not _pallas_tf_state.enabled:
        return False
    if os.environ.get("MYGRAM_DISABLE_PALLAS_VERIFY") == "1":
        return False
    if not runtime.use_pallas():
        return False
    cp = getattr(text_store, "codepoints", None)
    if cp is None or not _single_device(cp):
        return False
    if nonoverlap or Kv % _TF_ROWS:
        return False
    if getattr(cp, "ndim", 1) == 2:
        # Padded layout: the XLA full-row gather WINS the measured A/B at
        # this scale (r3 runbook: 5.6k QPS xla vs 4.5k pallas at 1.1M —
        # the group-DMA kernel moves 8x the bytes selecting one row per
        # (8, rowT) group), so the scale crossover is automatic: padded
        # corpora (<= the padded HBM budget) take the XLA gather; flat
        # corpora (10M+, where the XLA gather's HBM window materialization
        # OOMs) take the Pallas region-fetch kernel. Opt back in with
        # MYGRAM_FORCE_PALLAS_VERIFY=1 for A/B runs.
        if os.environ.get("MYGRAM_FORCE_PALLAS_VERIFY") != "1":
            return False
        return (cp.shape[1] >= text_store.maxT + NEEDLE_CAP
                and cp.shape[0] % 8 == 0 and cp.shape[1] % 128 == 0)
    # flat region-fetch kernel views the pack as (P//1024, 8, 128)
    return bool(getattr(text_store, "flat_padded", False)
                and cp.shape[0] % 1024 == 0)


class _GlobalClipMemo:
    """Per-shape adaptive disable for the global compaction stage: a
    workload whose batches run >50% full clips every time and pays a
    wasted extra dispatch — after 3 consecutive clips on a (B, Kv) shape
    the stage turns itself off for that shape for the process."""
    __slots__ = ("streak",)
    LIMIT = 3

    def __init__(self) -> None:
        self.streak: dict = {}

    def allowed(self, key) -> bool:
        return self.streak.get(key, 0) < self.LIMIT

    def record(self, key, clipped: bool) -> None:
        self.streak[key] = self.streak.get(key, 0) + 1 if clipped else 0


_global_clip_memo = _GlobalClipMemo()


_SCAN_CHUNK = int(__import__("os").environ.get("MYGRAM_SCAN_CHUNK",
                                               "16384"))
# Global stages only pay off when the candidate vectors are mostly pad:
# measured at 1.1M (ab_1m_scan.json, 2026-08-20) the sparse buckets run
# 58-85% FULL (pre_mean/C), where the scan's unfused while_loop compares
# (~5 ms/16k-row chunk vs fused) cost 10x what the skipped gather saves
# — the direct vmapped path (XLA fuses the shifted compares) won that
# A/B 5,582 vs 914 QPS. Low-fill batches (wide buckets, rare drivers)
# are where tracking V wins.
_FILL_MAX = float(__import__("os").environ.get("MYGRAM_GLOBAL_FILL_MAX",
                                               "0.35"))


def _global_pack_policy(text_store, B: int, Kv: int, Nn: int, cap: int,
                        nonoverlap: bool, vbound=None) -> int:
    """Packed width M for the owner-indexed live-skip flat Pallas kernel
    (tf_rows_flat_global_pallas), 0 = off. Same enable conditions as the
    XLA scan stage (so the disable/A-B envs apply uniformly), flat packs
    only, and the replicated needle table must fit the kernel's SMEM
    budget.

    vbound: host-known upper bound on the batch's valid candidate count
    (sum of min(driver_df, Kv) — probes only shrink it). The kernel's
    dead-grid floor is ~0.8 us/step on v5e, so M is bucketed to the
    bound instead of B*Kv: a batch of rare-driver queries pays a grid
    proportional to its actual survivors, not the pad."""
    # NB: no fill gate here (unlike the XLA scan) — the owner kernel's
    # packed prefix is always <= B*Kv rows, so it never does more DMA
    # work than the per-pad-slot flat kernel it replaces; vbound only
    # buckets the grid width below.
    if _global_scan_policy(B, Kv, nonoverlap) <= 0:
        return 0
    cp = getattr(text_store, "codepoints", None)
    if cp is None or getattr(cp, "ndim", 1) != 1:
        return 0
    if B * Nn * cap > _OWNER_NDL_SMEM_MAX:
        return 0
    bk = B * Kv
    m = bk if vbound is None else max(min(bk, int(vbound)), 1)
    M = 4096
    while M < m:
        M <<= 1
    return min(M, bk)


def _global_scan_policy(B: int, Kv: int, nonoverlap: bool,
                        vbound=None) -> int:
    """Chunk width for the EXACT scanned cross-query compaction
    (_tf_rows_global_scan), 0 = off. Default mode for the XLA verify
    path: cost tracks the batch's actual survivor count with no clip
    rerun, so it is safe at any Kv (including dense buckets far past the
    old fixed-M policy's 16384 cap). Off for the non-overlapping TF scan
    (per-query lax.scan doesn't decompose across owners) and for batches
    that fit one chunk anyway (the direct B*Kv gather is the same work
    without the packing pass). MYGRAM_GLOBAL_FIXED=1 restores the r4
    fixed-M stage for A/B; MYGRAM_DISABLE_GLOBAL_VERIFY=1 turns both
    off."""
    import os
    if nonoverlap or os.environ.get("MYGRAM_DISABLE_GLOBAL_VERIFY") == "1":
        return 0
    if os.environ.get("MYGRAM_GLOBAL_FIXED") == "1":
        return 0
    if B * Kv <= _SCAN_CHUNK:
        return 0
    if vbound is not None and vbound > _FILL_MAX * B * Kv:
        return 0  # high fill: the direct fused-compare path wins
    return _SCAN_CHUNK


def _global_m_policy(B: int, Kv: int, nonoverlap: bool) -> int:
    """M bucket for cross-query candidate compaction (_tf_rows_global),
    0 = off. B*Kv // 2 covers the measured p99 batch fill for the
    C <= 16384 verify buckets at 1.1M (V_p99/BK ~ 0.42-0.47); bigger
    buckets run >50% full, where the rerun-on-clip cost outweighs the
    halved gather — policy keeps them on the direct path. Off for tiny
    dispatches (single-flight RTT dominates) and for the non-overlapping
    TF scan (per-query lax.scan doesn't decompose across owners)."""
    import os
    if nonoverlap or os.environ.get("MYGRAM_DISABLE_GLOBAL_VERIFY") == "1":
        return 0
    if os.environ.get("MYGRAM_GLOBAL_FIXED") != "1":
        return 0  # the exact scanned stage is the default now
    bk = B * Kv
    if bk < 8192 or Kv > 16384:
        return 0
    if not _global_clip_memo.allowed((B, Kv)):
        return 0
    return bk // 2


def _global_clipped(pre, Kv: int, gm: int) -> bool:
    """True when the batch's total valid candidates exceeded the global
    compaction bucket — slots past gm never got a TF row, so the packed
    result undercounts and the wrapper must re-run with global_m=0."""
    import numpy as np
    return bool(np.minimum(pre, Kv).sum() > gm)


def _ptf_interpret() -> bool:
    """Tests set MYGRAM_PALLAS_VERIFY_INTERPRET=1 to run the fused verify
    kernel through the Pallas interpreter on CPU (full-path parity)."""
    import os
    return os.environ.get("MYGRAM_PALLAS_VERIFY_INTERPRET") == "1"


def _run_with_tf_fallback(run, ptf: bool):
    """np.asarray(run(ptf)) with a one-time permanent fallback to the XLA
    verify path if the Pallas kernel path fails (materialization is where
    compile/execute errors surface)."""
    import logging
    import numpy as np
    if ptf:
        try:
            return np.asarray(run(True))
        except Exception:
            _pallas_tf_state.enabled = False
            logging.getLogger(__name__).warning(
                "Pallas fused verify kernel failed; falling back to the "
                "XLA verify path for this process", exc_info=True)
    return np.asarray(run(False))


def sparse_search_verify_topn_batch(postings, bitmaps, deleted,
                                    d_off, d_len, sp_off, sp_len, sp_inv,
                                    dn_rows, dn_inv, text_store,
                                    C: int, Cmax: int, n: int,
                                    needles, needle_lens, n_words: int,
                                    descending: bool = True,
                                    Kv: int = 0, maxT: int = 0,
                                    idf=None, k1: float = 1.2,
                                    b: float = 0.75, avgdl: float = 1.0,
                                    score_mode: bool = False,
                                    nonoverlap: bool = False,
                                    use_dense_probes: bool = True,
                                    check_tombstones: bool = True,
                                    require_match: bool = True,
                                    extra=None, defer: bool = False):
    """numpy wrapper; see _sparse_search_verify_topn_batch.

    extra: optional (F, W) EQ-filter word rows AND'ed into every lane's
    candidate mask (shared across the batch).
    -> (pre, count, ids[, scores if score_mode]). Entries with
    pre > Kv clipped compaction: their count/ids are invalid and the
    caller must re-run those queries on the exact path."""
    import numpy as np

    Kv = Kv or min(C, 4096)
    maxT = maxT or text_store.maxT
    B = d_off.shape[0] if hasattr(d_off, "shape") else len(d_off)
    if idf is None:
        idf = _zero_idf(B, needles.shape[1])
    has_extra = extra is not None
    if extra is None:
        extra = jnp.zeros((1, 1), dtype=jnp.uint32)
    runtime.dispatches.bump()

    cap_b = needle_cap_bucket(max(int(np.max(needle_lens)), 1))

    def run(ptf: bool, gm: int = 0, gs: int = 0, gp: int = 0):
        return _sparse_search_verify_topn_batch(
            postings, bitmaps, deleted,
            jnp.asarray(d_off), jnp.asarray(d_len),
            jnp.asarray(sp_off), jnp.asarray(sp_len), jnp.asarray(sp_inv),
            jnp.asarray(dn_rows), jnp.asarray(dn_inv), extra,
            text_store.codepoints, text_store.offsets, text_store.lengths,
            jnp.asarray(needles), jnp.asarray(needle_lens),
            jnp.asarray(idf, dtype=jnp.float32), jnp.float32(k1),
            jnp.float32(b), jnp.float32(avgdl),
            C=C, Cmax=Cmax, Kv=Kv, n=n, Nn=needles.shape[1], maxT=maxT,
            descending=descending, score_mode=score_mode, n_words=n_words,
            cap=cap_b,
            nonoverlap=nonoverlap, use_dense_probes=use_dense_probes,
            check_tombstones=check_tombstones, require_match=require_match,
            use_range=_needles_need_range(text_store, needles),
            has_extra=has_extra, pallas_tf=ptf,
            ptf_interpret=ptf and _ptf_interpret(),
            global_m=0 if ptf else gm,
            global_scan=0 if ptf else gs,
            global_pack=gp if ptf else 0)

    ptf_ok = _pallas_tf_eligible(text_store, Kv, nonoverlap)
    try:
        vbound = int(np.minimum(np.asarray(d_len, dtype=np.int64),
                                Kv).sum())
    except Exception:
        vbound = None
    gs = 0 if ptf_ok else _global_scan_policy(B, Kv, nonoverlap,
                                              vbound=vbound)
    gm = 0 if (ptf_ok or gs) else _global_m_policy(B, Kv, nonoverlap)
    gp = (_global_pack_policy(text_store, B, Kv, needles.shape[1],
                              cap_b, nonoverlap, vbound=vbound)
          if ptf_ok else 0)
    if defer:
        # amortized-timing mode (bench only): return the packed DEVICE
        # array unsynced so callers can queue M dispatches and force one
        # (the wrappers' np.asarray would serialize every call on the
        # tunnel RTT). No clip handling — callers use it with the exact
        # scanned stage or accept fixed-stage semantics.
        return run(ptf_ok, gm, gs, gp)
    arr = _run_with_tf_fallback(lambda p: run(p, gm, gs, gp), ptf_ok)
    pre, count, ids, scores = _unpack_out(arr, n, score_mode)
    if gm:
        clipped = _global_clipped(pre, Kv, gm)
        _global_clip_memo.record((B, Kv), clipped)
        if clipped:
            runtime.dispatches.bump()
            arr = _run_with_tf_fallback(lambda p: run(p, 0), False)
            pre, count, ids, scores = _unpack_out(arr, n, score_mode)
    if score_mode:
        return pre, count, ids, scores
    return pre, count, ids


def search_verify_topn_batch(bitmaps, rows, nrows, deleted, extra,
                             text_store, cand_bucket: int, n: int,
                             needles, needle_lens, descending: bool = True,
                             maxT: int = 0, idf=None, k1: float = 1.2,
                             b: float = 0.75, avgdl: float = 1.0,
                             score_mode: bool = False,
                             nonoverlap: bool = False,
                             require_match: bool = True,
                             has_extra: bool = False,
                             defer: bool = False, vbound=None):
    """One-dispatch batched dense-driver verified search.
    vbound: optional host-known ceiling on the batch's total AND-survivor
    count (sum of per-query min dense df) — bounds the packed width of
    the global pallas stage.
    Returns numpy (pre, counts, ids[, scores]); pre > cand_bucket means
    the extraction clipped (caller falls back for that query)."""
    import numpy as np

    use_pallas = (_single_device(bitmaps) and runtime.use_pallas()
                  and bitmaps.shape[1] % PBLOCK == 0)
    maxT = maxT or text_store.maxT
    B = rows.shape[0] if hasattr(rows, "shape") else len(rows)
    if idf is None:
        idf = _zero_idf(B, needles.shape[1])
    runtime.dispatches.bump()

    cap_b = needle_cap_bucket(int(np.max(needle_lens))
                              if np.max(needle_lens) > 0 else 1)

    def run(ptf: bool, gm: int = 0, gs: int = 0, gp: int = 0):
        return _search_verify_topn_batch(
            bitmaps, rows, nrows, deleted, extra,
            text_store.codepoints, text_store.offsets, text_store.lengths,
            jnp.asarray(needles), jnp.asarray(needle_lens),
            jnp.asarray(idf, dtype=jnp.float32), jnp.float32(k1),
            jnp.float32(b), jnp.float32(avgdl),
            C=cand_bucket, Kv=cand_bucket, n=n, Nn=needles.shape[1],
            maxT=maxT, descending=descending, score_mode=score_mode,
            use_pallas=use_pallas,
            cap=cap_b,
            nonoverlap=nonoverlap, require_match=require_match,
            use_range=_needles_need_range(text_store, needles),
            has_extra=has_extra, pallas_tf=ptf,
            ptf_interpret=ptf and _ptf_interpret(),
            global_m=0 if ptf else gm,
            global_scan=0 if ptf else gs,
            global_pack=gp if ptf else 0)

    ptf_ok = _pallas_tf_eligible(text_store, cand_bucket, nonoverlap)
    gs = 0 if ptf_ok else _global_scan_policy(B, cand_bucket, nonoverlap,
                                              vbound=vbound)
    gm = 0 if (ptf_ok or gs) else _global_m_policy(B, cand_bucket,
                                                   nonoverlap)
    gp = (_global_pack_policy(text_store, B, cand_bucket,
                              needles.shape[1], cap_b, nonoverlap,
                              vbound=vbound)
          if ptf_ok else 0)
    if defer:
        # see the sparse wrapper's defer note
        return run(ptf_ok, gm, gs, gp)
    arr = _run_with_tf_fallback(lambda p: run(p, gm, gs, gp), ptf_ok)
    pre, count, ids, scores = _unpack_out(arr, n, score_mode)
    if gm:
        clipped = _global_clipped(pre, cand_bucket, gm)
        _global_clip_memo.record((B, cand_bucket), clipped)
        if clipped:
            runtime.dispatches.bump()
            arr = _run_with_tf_fallback(lambda p: run(p, 0), False)
            pre, count, ids, scores = _unpack_out(arr, n, score_mode)
    if score_mode:
        return pre, count, ids, scores
    return pre, count, ids
