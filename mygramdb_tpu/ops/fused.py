"""Fully-fused verified search: match -> extract -> verify -> score -> top-k
in ONE device dispatch.

The north-star workload (CJK bigram + verify_text [+ BM25 SORT _score],
BASELINE.md) previously issued 2-3 sequential dispatches per query (search,
window-verify, TF/score) — each a full RTT on tunneled backends. This
program chains them on-device:

1. dense AND over bitmap rows (+tombstones)            [VPU / Pallas]
2. extract ALL matching doc ids up to a static bucket C (the pipeline
   routes here only when the rarest gram's df bounds the candidate count)
3. gather candidate texts, one window pass computing per-needle match
   COUNTS (tf): verify mask = every needle count > 0 — verify and BM25
   term frequencies come from the same compare pass
4. verified count = popcount(mask); top-n by doc id, or by BM25
   (score desc, ties id desc) when score_mode

Only (count, n ids, n scores) cross back to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import runtime
from .bitmap_ops import (_topn_hierarchical, dense_query, dense_query_pallas,
                         PBLOCK, _single_device)
from .verify_ops import (NEEDLE_CAP, _gather_text_flat,
                         _gather_text_padded, needle_cap_bucket)


@functools.partial(jax.jit, static_argnames=(
    "C", "n", "Nn", "maxT", "descending", "score_mode", "use_pallas",
    "cap"))
def _search_verify_score_topn(bitmaps, rows, nrows, deleted, extra,
                              codepoints, offsets, lengths,
                              needles, needle_lens, idf, k1, b, avgdl,
                              *, C: int, n: int, Nn: int, maxT: int,
                              descending: bool, score_mode: bool,
                              use_pallas: bool, cap: int = NEEDLE_CAP):
    """Single query (B=1 shapes on the bitmap side). needles: (Nn, CAP);
    idf: (Nn,) f32. -> (count, ids (n,), scores (n,) f32)."""
    if use_pallas:
        _, res = dense_query_pallas(bitmaps, rows, deleted)
    else:
        _, res = dense_query(bitmaps, rows, nrows, deleted, extra,
                             has_not=False, has_extra=False)
    # ALL matching ids, ascending, -1 padded (caller guarantees <= C)
    cand, _ = _topn_hierarchical(res, C, False)
    cand = cand[0]
    alive = cand >= 0

    if codepoints.ndim == 2:
        text, doc_len = _gather_text_padded(codepoints, lengths, cand, maxT)
    else:
        text, doc_len = _gather_text_flat(codepoints, offsets, lengths,
                                          cand, maxT)
    starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]

    def one_needle(j, tf):
        ndl = needles[j]
        nlen = needle_lens[j]

        def step(k, m):
            window = jax.lax.dynamic_slice_in_dim(text, k, maxT, axis=1)
            cmp = jnp.logical_or(k >= nlen, window == ndl[k])
            return jnp.logical_and(m, cmp)

        match_at = jax.lax.fori_loop(
            0, cap, step, jnp.ones((C, maxT), dtype=jnp.bool_))
        in_range = starts + nlen <= doc_len[:, None]
        count = jnp.sum(jnp.logical_and(match_at, in_range
                                        ).astype(jnp.int32), axis=1)
        count = jnp.where(nlen == 0, 0, count)
        return tf.at[:, j].set(count)

    tf = jax.lax.fori_loop(0, Nn, one_needle,
                           jnp.zeros((C, Nn), dtype=jnp.int32))
    # verified = contains every (present) needle
    present = needle_lens > 0
    ok = jnp.logical_or(tf > 0, jnp.logical_not(present)[None, :])
    mask = jnp.logical_and(jnp.all(ok, axis=1), alive)
    count = jnp.sum(mask.astype(jnp.int32))

    if score_mode:
        tff = tf.astype(jnp.float32)
        norm = k1 * (1.0 - b + b * doc_len.astype(jnp.float32)[:, None] /
                     jnp.maximum(avgdl, 1e-9))
        score = jnp.sum(idf[None, :] * tff * (k1 + 1.0) /
                        jnp.maximum(tff + norm, 1e-9), axis=1)
        score = jnp.where(mask, score, -jnp.inf)
        neg_score = -score
        neg_id = -cand
        _, _, ids_sorted, score_sorted = jax.lax.sort(
            (neg_score, neg_id, cand, score), num_keys=2)
        ids_out = jnp.where(jnp.isfinite(score_sorted[:n]),
                            ids_sorted[:n], -1)
        return count, ids_out, score_sorted[:n]
    # PK order: top-n masked candidates by doc id
    from .posting_ops import mask_to_topn
    safe = jnp.where(alive, cand, jnp.int32(2 ** 31 - 1))
    _, ids_out = mask_to_topn(safe, mask, n, descending)
    return count, ids_out, jnp.zeros((n,), dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "C", "n", "Nn", "maxT", "descending", "use_pallas", "cap"))
def _search_verify_topn_batch(bitmaps, rows, nrows, deleted, extra,
                              codepoints, offsets, lengths,
                              needles, needle_lens,
                              *, C: int, n: int, Nn: int, maxT: int,
                              descending: bool, use_pallas: bool,
                              cap: int = NEEDLE_CAP):
    """Batched fused verified search (PK order, no scoring): B queries,
    each with its OWN needle set, in one dispatch. rows: (B, K);
    needles: (B, Nn, CAP); needle_lens: (B, Nn).
    -> (counts (B,), ids (B, n))."""
    from .posting_ops import mask_to_topn

    if use_pallas:
        _, res = dense_query_pallas(bitmaps, rows, deleted)
    else:
        _, res = dense_query(bitmaps, rows, nrows, deleted, extra,
                             has_not=False, has_extra=False)
    cand, _ = _topn_hierarchical(res, C, False)  # (B, C) ascending, -1 pad

    def one(cand_row, ndl_set, nlen_set):
        alive = cand_row >= 0
        if codepoints.ndim == 2:
            text, doc_len = _gather_text_padded(codepoints, lengths,
                                                cand_row, maxT)
        else:
            text, doc_len = _gather_text_flat(codepoints, offsets, lengths,
                                              cand_row, maxT)
        starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]

        def one_needle(j, acc):
            ndl = ndl_set[j]
            nlen = nlen_set[j]

            def step(k, m):
                window = jax.lax.dynamic_slice_in_dim(text, k, maxT, axis=1)
                cmp = jnp.logical_or(k >= nlen, window == ndl[k])
                return jnp.logical_and(m, cmp)

            match_at = jax.lax.fori_loop(
                0, cap, step, jnp.ones((C, maxT), dtype=jnp.bool_))
            in_range = starts + nlen <= doc_len[:, None]
            contains = jnp.any(jnp.logical_and(match_at, in_range), axis=1)
            contains = jnp.logical_or(contains, nlen == 0)
            return jnp.logical_and(acc, contains)

        mask = jax.lax.fori_loop(0, Nn, one_needle,
                                 jnp.ones((C,), dtype=jnp.bool_))
        mask = jnp.logical_and(mask, alive)
        count = jnp.sum(mask.astype(jnp.int32))
        safe = jnp.where(alive, cand_row, jnp.int32(2 ** 31 - 1))
        _, ids_out = mask_to_topn(safe, mask, n, descending)
        return count, ids_out

    return jax.vmap(one)(cand, needles, needle_lens)


@functools.partial(jax.jit, static_argnames=(
    "C", "Cmax", "n", "Nn", "maxT", "descending", "n_words", "cap"))
def _sparse_search_verify_topn_batch(postings, bitmaps, deleted,
                                     d_off, d_len, sp_off, sp_len, sp_inv,
                                     dn_rows, dn_inv,
                                     codepoints, offsets, lengths,
                                     needles, needle_lens,
                                     *, C: int, Cmax: int, n: int, Nn: int,
                                     maxT: int, descending: bool,
                                     n_words: int, cap: int):
    """Sparse-driver fused verified search, batched: the rarest term's CSR
    slice is the candidate vector (so C is bounded by its df — exactly the
    queries whose rarest gram is sparse), probed by the other grams, then
    window-verified, counted, top-n'd — ONE dispatch. At Wikipedia scale
    this is THE north-star query shape (CJK bigram + verify_text: the
    rarest kanji unigram is almost always in the sparse tail)."""
    from .bitmap_ops import bit_member
    from .posting_ops import (SENTINEL, bitmap_membership, gather_slices,
                              mask_to_topn, membership_sorted)

    compare_all = C * Cmax <= (1 << 26)

    def one(doff, dlen, soff, slen, sinv, drows, dinv, ndl_set, nlen_set):
        cands = gather_slices(postings, doff[None], dlen[None], C)[0]
        cmask = cands != SENTINEL
        clip = jnp.clip(cands, 0, n_words * 32 - 1)
        sp = gather_slices(postings, soff, slen, Cmax)
        if compare_all:
            # probe by fused broadcast equality (vectorizes on the VPU;
            # binary-search gathers measured ~5x slower at these shapes)
            spm = jax.vmap(lambda row: jnp.any(
                row[None, :] == cands[:, None], axis=1))(sp)
        else:
            spm = membership_sorted(sp, cands)
        spm = jnp.logical_xor(spm, sinv[:, None])
        dnm = jnp.logical_xor(bitmap_membership(bitmaps, drows, clip),
                              dinv[:, None])
        alive = jnp.logical_not(bit_member(deleted, clip))
        mask = (cmask & jnp.all(spm, axis=0) & jnp.all(dnm, axis=0) & alive)

        # window verify over the candidate slice
        safe_ids = jnp.where(cmask, cands, 0)
        if codepoints.ndim == 2:
            text, doc_len = _gather_text_padded(codepoints, lengths,
                                                safe_ids, maxT)
        else:
            text, doc_len = _gather_text_flat(codepoints, offsets, lengths,
                                              safe_ids, maxT)
        starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]

        def one_needle(j, acc):
            ndl = ndl_set[j]
            nlen = nlen_set[j]

            def step(k, m):
                window = jax.lax.dynamic_slice_in_dim(text, k, maxT, axis=1)
                cmp = jnp.logical_or(k >= nlen, window == ndl[k])
                return jnp.logical_and(m, cmp)

            match_at = jax.lax.fori_loop(
                0, cap, step, jnp.ones((C, maxT), dtype=jnp.bool_))
            in_range = starts + nlen <= doc_len[:, None]
            contains = jnp.any(jnp.logical_and(match_at, in_range), axis=1)
            contains = jnp.logical_or(contains, nlen == 0)
            return jnp.logical_and(acc, contains)

        vmask = jax.lax.fori_loop(0, Nn, one_needle,
                                  jnp.ones((C,), dtype=jnp.bool_))
        mask = jnp.logical_and(mask, vmask)
        count = jnp.sum(mask.astype(jnp.int32))
        _, ids_out = mask_to_topn(cands, mask, n, descending)
        return count, ids_out

    return jax.vmap(one)(d_off, d_len, sp_off, sp_len, sp_inv,
                         dn_rows, dn_inv, needles, needle_lens)


def sparse_search_verify_topn_batch(postings, bitmaps, deleted,
                                    d_off, d_len, sp_off, sp_len, sp_inv,
                                    dn_rows, dn_inv, text_store,
                                    C: int, Cmax: int, n: int,
                                    needles, needle_lens, n_words: int,
                                    descending: bool = True):
    """numpy wrapper; see _sparse_search_verify_topn_batch."""
    import numpy as np

    runtime.dispatches.bump()
    count, ids = _sparse_search_verify_topn_batch(
        postings, bitmaps, deleted,
        jnp.asarray(d_off), jnp.asarray(d_len),
        jnp.asarray(sp_off), jnp.asarray(sp_len), jnp.asarray(sp_inv),
        jnp.asarray(dn_rows), jnp.asarray(dn_inv),
        text_store.codepoints, text_store.offsets, text_store.lengths,
        jnp.asarray(needles), jnp.asarray(needle_lens),
        C=C, Cmax=Cmax, n=n, Nn=needles.shape[1], maxT=text_store.maxT,
        descending=descending, n_words=n_words,
        cap=needle_cap_bucket(max(int(np.max(needle_lens)), 1)))
    return np.asarray(count), np.asarray(ids)


def search_verify_topn_batch(bitmaps, rows, nrows, deleted, extra,
                             text_store, cand_bucket: int, n: int,
                             needles, needle_lens, descending: bool = True):
    """One-dispatch batched verified search (see _search_verify_topn_batch).
    Returns numpy (counts, ids)."""
    import numpy as np

    use_pallas = (_single_device(bitmaps) and runtime.use_pallas()
                  and bitmaps.shape[1] % PBLOCK == 0)
    runtime.dispatches.bump()
    count, ids = _search_verify_topn_batch(
        bitmaps, rows, nrows, deleted, extra,
        text_store.codepoints, text_store.offsets, text_store.lengths,
        jnp.asarray(needles), jnp.asarray(needle_lens),
        C=cand_bucket, n=n, Nn=needles.shape[1], maxT=text_store.maxT,
        descending=descending, use_pallas=use_pallas,
        cap=needle_cap_bucket(int(np.max(needle_lens))
                              if np.max(needle_lens) > 0 else 1))
    return np.asarray(count), np.asarray(ids)


def search_verify_score_topn(bitmaps, rows, nrows, deleted, extra,
                             text_store, cand_bucket: int, n: int,
                             needles, needle_lens, idf=None,
                             k1: float = 1.2, b: float = 0.75,
                             avgdl: float = 1.0, descending: bool = True,
                             score_mode: bool = False):
    """One-dispatch verified search over a DeviceTextStore. needles /
    needle_lens: packed (Nn, CAP) uint32 / (Nn,) int32."""
    import numpy as np

    use_pallas = (_single_device(bitmaps) and runtime.use_pallas()
                  and bitmaps.shape[1] % PBLOCK == 0)
    Nn = needles.shape[0]
    if idf is None:
        idf = jnp.zeros((Nn,), dtype=jnp.float32)
    runtime.dispatches.bump()
    import numpy as _np
    count, ids, scores = _search_verify_score_topn(
        bitmaps, rows, nrows, deleted, extra,
        text_store.codepoints, text_store.offsets, text_store.lengths,
        jnp.asarray(needles), jnp.asarray(needle_lens),
        jnp.asarray(idf, dtype=jnp.float32), jnp.float32(k1),
        jnp.float32(b), jnp.float32(avgdl),
        C=cand_bucket, n=n, Nn=Nn, maxT=text_store.maxT,
        descending=descending, score_mode=score_mode,
        use_pallas=use_pallas,
        cap=needle_cap_bucket(int(_np.max(needle_lens))
                              if int(_np.max(needle_lens)) > 0 else 1))
    return int(count), np.asarray(ids), np.asarray(scores)
