"""Device-side verify_text: batched substring check over packed texts.

The reference's verify_text post-filter scans candidate documents' stored
normalized text for every query term (search_pipeline.h:159-190) — a
host hot loop. Here the normalized corpus lives in HBM as one flat
code-point array (+ per-doc offset/length), and verification is a fused
window-compare kernel:

    match_at(i) = AND_k ( k >= needle_len  OR  text[i+k] == needle[k] )
    contains    = OR_i ( match_at(i) AND i + needle_len <= doc_len )

evaluated for every candidate x needle in one dispatch — O(C * maxT * L)
vectorized compares on the VPU instead of per-doc Python/C host scans.
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


def _gather_text_flat(codepoints, offsets, lengths, cand_ids, maxT):
    """(C, maxT+CAP) text window via element gather from the flat pack.

    The pack may be uint16 (BMP-only corpora — halves HBM bytes; the
    store routes non-BMP docs to the host path). Comparison happens in
    uint32: XLA fuses the post-gather convert into the gather, so only
    the HBM read is narrow.
    """
    ids = jnp.maximum(cand_ids, 0)
    off = offsets[ids]
    doc_len = lengths[ids]
    pos = jnp.arange(maxT + NEEDLE_CAP, dtype=jnp.int32)[None, :]
    idx = off[:, None] + pos
    valid = pos < doc_len[:, None]
    idx = jnp.where(valid, idx, 0)
    idx = jnp.minimum(idx, codepoints.shape[0] - 1)
    text = codepoints[idx].astype(jnp.uint32)
    text = jnp.where(valid, text, jnp.uint32(0xFFFFFFFF))
    return text, doc_len


def _gather_text_padded(padded, lengths, cand_ids, maxT):
    """(C, maxT+CAP) text window via ROW gather from a (N, maxT) padded
    matrix — contiguous DMA rows instead of C*maxT random element gathers
    (order-of-magnitude faster on TPU for large candidate sets). The
    matrix may be uint16 (see _gather_text_flat)."""
    ids = jnp.maximum(cand_ids, 0)
    doc_len = lengths[ids]
    rows = padded[ids].astype(jnp.uint32)  # (C, maxT)
    pos = jnp.arange(maxT, dtype=jnp.int32)[None, :]
    valid = pos < doc_len[:, None]
    rows = jnp.where(valid, rows, jnp.uint32(0xFFFFFFFF))
    pad = jnp.full((rows.shape[0], NEEDLE_CAP), 0xFFFFFFFF, dtype=jnp.uint32)
    return jnp.concatenate([rows, pad], axis=1), doc_len


@functools.partial(jax.jit, static_argnames=("C", "maxT", "Nn", "cap"))
def substring_verify_device(codepoints: jax.Array, offsets: jax.Array,
                            lengths: jax.Array, cand_ids: jax.Array,
                            needles: jax.Array, needle_lens: jax.Array,
                            *, C: int, maxT: int, Nn: int,
                            cap: int = NEEDLE_CAP) -> jax.Array:
    """-> (C,) bool: candidate text contains ALL needles.

    codepoints: (P,) uint32 packed corpus OR (N, maxT) padded text matrix
    (row-gather fast path); offsets/lengths: (N,) int32 indexed by doc id;
    cand_ids: (C,) int32 (pad with -1); needles: (Nn, NEEDLE_CAP) uint32
    (0 padded); needle_lens: (Nn,) int32 (0 len = vacuously true row).
    """
    if codepoints.ndim == 2:
        text, doc_len = _gather_text_padded(codepoints, lengths, cand_ids,
                                            maxT)
    else:
        text, doc_len = _gather_text_flat(codepoints, offsets, lengths,
                                          cand_ids, maxT)

    def one_needle(n, acc):
        ndl = needles[n]
        nlen = needle_lens[n]

        def step(k, m):
            window = jax.lax.dynamic_slice_in_dim(text, k, maxT, axis=1)
            cmp = jnp.logical_or(k >= nlen, window == ndl[k])
            return jnp.logical_and(m, cmp)

        match_at = jax.lax.fori_loop(
            0, cap, step,
            jnp.ones((C, maxT), dtype=jnp.bool_))
        starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]
        in_range = starts + nlen <= doc_len[:, None]
        contains = jnp.any(jnp.logical_and(match_at, in_range), axis=1)
        contains = jnp.logical_or(contains, nlen == 0)
        return jnp.logical_and(acc, contains)

    mask = jax.lax.fori_loop(0, Nn, one_needle,
                             jnp.ones((C,), dtype=jnp.bool_))
    return jnp.logical_and(mask, cand_ids >= 0)


@functools.partial(jax.jit, static_argnames=("C", "maxT", "Nn", "cap"))
def count_occurrences_device(codepoints: jax.Array, offsets: jax.Array,
                             lengths: jax.Array, cand_ids: jax.Array,
                             needles: jax.Array, needle_lens: jax.Array,
                             *, C: int, maxT: int, Nn: int,
                             cap: int = NEEDLE_CAP):
    """BM25 TF on device: -> (tf (C, Nn) int32, doc_len (C,) int32).

    Counts ALL match positions, which equals the reference's
    non-overlapping count for needles with no proper border (callers route
    self-overlapping needles — rare — to the host path).
    """
    if codepoints.ndim == 2:
        text, doc_len = _gather_text_padded(codepoints, lengths, cand_ids,
                                            maxT)
    else:
        text, doc_len = _gather_text_flat(codepoints, offsets, lengths,
                                          cand_ids, maxT)
    starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]

    def one_needle(n, tf):
        ndl = needles[n]
        nlen = needle_lens[n]

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
        return tf.at[:, n].set(count)

    tf = jax.lax.fori_loop(0, Nn, one_needle,
                           jnp.zeros((C, Nn), dtype=jnp.int32))
    alive = (cand_ids >= 0)[:, None]
    return jnp.where(alive, tf, 0), jnp.where(cand_ids >= 0, doc_len, 0)


@functools.partial(jax.jit, static_argnames=("C", "maxT", "Nn", "n", "cap"))
def bm25_topk_device(codepoints: jax.Array, offsets: jax.Array,
                     lengths: jax.Array, cand_ids: jax.Array,
                     needles: jax.Array, needle_lens: jax.Array,
                     idf: jax.Array, k1: jax.Array, b: jax.Array,
                     avgdl: jax.Array, *, C: int, maxT: int, Nn: int,
                     n: int, cap: int = NEEDLE_CAP):
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
        C=C, maxT=maxT, Nn=Nn, cap=cap)
    tff = tf.astype(jnp.float32)
    norm = k1 * (1.0 - b + b * dl.astype(jnp.float32)[:, None] /
                 jnp.maximum(avgdl, 1e-9))
    score = jnp.sum(idf[None, :] * tff * (k1 + 1.0) /
                    jnp.maximum(tff + norm, 1e-9), axis=1)
    score = jnp.where(cand_ids >= 0, score, -jnp.inf)
    # two-key sort: score desc, doc id desc
    neg_score = -score
    neg_id = -cand_ids
    _, _, ids_sorted, score_sorted = jax.lax.sort(
        (neg_score, neg_id, cand_ids, score), num_keys=2)
    return ids_sorted[:n], score_sorted[:n]


def has_self_overlap(term: str) -> bool:
    """True when the term has a proper border (prefix == suffix), i.e. the
    all-positions count can exceed the non-overlapping count."""
    n = len(term)
    for i in range(1, n):
        if term[:i] == term[n - i:]:
            return True
    return False
