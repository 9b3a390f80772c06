"""Positional verification kernels: substring verify WITHOUT text gathers.

The text-window verify (ops/verify_ops.py) is the TPU analog of the
reference's verify_text substring scan (search_pipeline.h:159-190): it
row-gathers every candidate's stored text (~2 KB each) and window-compares
— measured gather-bound at 1.1M docs (11.3 of 16.6 ms per 64-query batch).

This module replaces the text scan for covered query shapes with a
POSITIONAL OCCURRENCE INDEX — the classic IR phrase-query design the
reference does not have. For every (term, doc) posting the index stores
the positions of the gram's occurrences in the normalized text
(index/positional.py). A query term with grams g_i at in-term offsets o_i
matches doc d at anchor position p iff every (d, p + o_i - o_drv) is an
occurrence of g_i. When the grams COVER every position of the term (the
same condition as pipeline._coverage_requires_text_check), anchored gram
equality pins every code point, so this is EXACTLY substring containment
— and the anchor count is exactly the all-positions term frequency the
BM25 scorer needs (reference bm25_scorer.h:36-40 semantics for
borderless terms).

Data movement per query: 2-3 CONTIGUOUS slice DMAs per gram (doc slice,
occurrence-count slice, occurrence-position slice) instead of one ~2 KB
row fetch per candidate — at C=2048 candidates that is ~300 slice DMAs
per 64-query batch vs 131,072 row fetches.

Kernel-shape rules (all hard-won on the axon TPU backend, see CLAUDE.md):
no per-element gathers (serial on TPU), no scatters (serial on TPU), no
searchsorted (data-dependent gather loop). Everything here is built from
four proven-fast primitives:
  - contiguous slice DMAs (lax.scan of dynamic_slice — posting_ops)
  - 128-lane block ROW gathers (`blocks[bidx]` — the membership_sorted
    pattern), chunked so the gathered temp stays bounded under vmap
  - dense compares + keepdims reductions
  - cumulative/associative scans (segmented sums with no scatter)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .posting_ops import SENTINEL, _MEMBER_CHUNK, gather_slices

BLK = 128
I32_MAX = jnp.int32(2 ** 31 - 1)

# occ_pos / occ_doc device arrays must carry this many trailing pad cells
# (slice DMAs read [off, off+bucket) unconditionally, like SLICE_GATHER_PAD)
OCC_GATHER_PAD = 131072 + 128

# occurrence term regions are 128-cell aligned and the device arrays are
# viewed as (O//128, 128): the minor dim IS the TPU lane width, so the
# arrays live tiled with ZERO padding and the row slice gather needs no
# relayout. The first occ_doc build used 8-cell rows — XLA materialized a
# T(8,128)-tiled copy of the whole (N, 8) int32 array (16x padding,
# 15.8 GB at 1.1M docs: the r4 OOM).
OCC_ROW = 128


# ---------------------------------------------------------------------------
# u16 slice gathers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("bucket", "fill"))
def gather_slices_u16(arr: jax.Array, offsets: jax.Array,
                      lengths: jax.Array, bucket: int,
                      fill: int = 0) -> jax.Array:
    """(K,) u16 slices [off, off+len) -> (K, bucket) int32, pad `fill`.

    arr: (P + OCC_GATHER_PAD,) uint16; offsets int32 (valid for P < 2^31 —
    occ_cnt parallels the postings CSR, same offsets)."""
    pos = jnp.arange(bucket, dtype=jnp.int32)

    def step(_, ol):
        off, ln = ol
        sl = jax.lax.dynamic_slice(arr, (off,), (bucket,)).astype(jnp.int32)
        return _, jnp.where(pos < ln, sl, fill)

    _, out = jax.lax.scan(step, 0, (offsets, lengths), unroll=8)
    return out


@functools.partial(jax.jit, static_argnames=("bucket", "fill"))
def gather_rows_u16(arr8: jax.Array, base8: jax.Array, lengths: jax.Array,
                    bucket: int, fill: int = -1) -> jax.Array:
    """Row-aligned slice gather for arrays past 2^31 cells.

    arr8: an occurrence array VIEWED as (O//128, 128) (uint16 positions
    or int32 doc ids; lane-width minor dim — tiled with zero padding, no
    relayout copy) — every term's region starts at a 128-aligned offset
    (the positional finalize pads regions), so base8 = start // 128
    stays int32 up to 2^38 cells. -> (K, bucket) int32, entries >=
    length -> `fill`."""
    rows = bucket // OCC_ROW
    pos = jnp.arange(bucket, dtype=jnp.int32)

    def step(_, bl):
        b8, ln = bl
        sl = jax.lax.dynamic_slice(arr8, (b8, 0), (rows, OCC_ROW))
        sl = sl.reshape(bucket).astype(jnp.int32)
        return _, jnp.where(pos < ln, sl, fill)

    _, out = jax.lax.scan(step, 0, (base8, lengths), unroll=8)
    return out


# ---------------------------------------------------------------------------
# Blocked primitives (row-gather + in-register one-hot — never element
# gathers). All inputs padded to a 128 multiple by the callers.
# ---------------------------------------------------------------------------

def _chunked(fn, idx_like, *broadcast):
    """Apply fn over <=_MEMBER_CHUNK chunks of the leading query axis so
    the (chunk, BLK) row-gather temp stays bounded under the callers'
    vmap (the 10M OOM lesson from posting_ops)."""
    N = idx_like.shape[0]
    if N <= _MEMBER_CHUNK:
        return fn(idx_like, *broadcast)
    n_chunks = (N + _MEMBER_CHUNK - 1) // _MEMBER_CHUNK
    Np = n_chunks * _MEMBER_CHUNK
    pad = Np - N
    x = idx_like if not pad else jnp.concatenate(
        [idx_like, jnp.zeros((pad,) + idx_like.shape[1:],
                             dtype=idx_like.dtype)])
    chunks = x.reshape((n_chunks, _MEMBER_CHUNK) + idx_like.shape[1:])
    _, out = jax.lax.scan(lambda c, ch: (c, fn(ch, *broadcast)), 0, chunks)
    return out.reshape((Np,) + out.shape[2:])[:N]


def blocked_take(values: jax.Array, idx: jax.Array) -> jax.Array:
    """values[idx] without an element gather: 128-lane block row gather +
    one-hot lane select. values (C,) int32, C % 128 == 0; idx (N,) int32
    (out-of-range clamped)."""
    blocks = values.reshape(-1, BLK)
    nb = blocks.shape[0]

    def take(ix):
        safe = jnp.clip(ix, 0, nb * BLK - 1)
        mine = blocks[safe >> 7]                      # (chunk, BLK) rows
        lane = jnp.bitwise_and(safe, BLK - 1)
        onehot = jax.lax.broadcasted_iota(
            jnp.int32, mine.shape, 1) == lane[:, None]
        return jnp.sum(jnp.where(onehot, mine, 0), axis=1)

    return _chunked(take, idx)


def blocked_rank_le(sorted_vals: jax.Array, queries: jax.Array) -> jax.Array:
    """Count of sorted_vals <= q per query (the rank primitive behind the
    occurrence->candidate mapping). sorted_vals (C,) int32 ascending with
    I32_MAX pads, C % 128 == 0; queries (N,) int32."""
    blocks = sorted_vals.reshape(-1, BLK)
    starts = blocks[:, 0]
    nb = blocks.shape[0]

    def rank(q):
        bidx = jnp.sum((starts[None, :] <= q[:, None]).astype(jnp.int32),
                       axis=1) - 1
        bidx = jnp.clip(bidx, 0, nb - 1)
        mine = blocks[bidx]                            # (chunk, BLK) rows
        inblk = jnp.sum((mine <= q[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(q < starts[0], 0, bidx * BLK + inblk)

    return _chunked(rank, queries)


def _pair_le(ad, ap, bd, bp):
    """Lexicographic (ad, ap) <= (bd, bp) elementwise."""
    return jnp.logical_or(ad < bd, jnp.logical_and(ad == bd, ap <= bp))


# super-block fan-in for the hierarchical rank: one super = _SUPER blocks
_SUPER = 128


def membership_pairs(pair_doc: jax.Array, pair_pos: jax.Array,
                     q_doc: jax.Array, q_pos: jax.Array) -> jax.Array:
    """(q_doc, q_pos) in the lexicographically-sorted (pair_doc, pair_pos)
    list -> (N,) bool. Pairs are unique ((term, doc, pos) occurrences);
    pads carry pair_doc = I32_MAX. Two parallel int32 arrays stand in for
    the composite key TPUs cannot pack into one int32 at 10M-doc scale.

    Block ranking is HIERARCHICAL past 256 blocks: rank among super-block
    minima (one per _SUPER blocks), row-gather that super's block-minima
    tile, rank within, then compare inside the final block — O(supers +
    3*BLK) per query instead of O(blocks), which is what keeps 512k-pair
    probe lists servable (the flat scan measured linear in list length)."""
    bd = pair_doc.reshape(-1, BLK)
    bp = pair_pos.reshape(-1, BLK)
    sd = bd[:, 0]
    sp = bp[:, 0]
    nb = bd.shape[0]
    hier = nb >= 256 and nb % _SUPER == 0
    if hier:
        sd2 = sd.reshape(-1, _SUPER)    # (ns, SUPER) block minima tiles
        sp2 = sp.reshape(-1, _SUPER)
        ssd = sd2[:, 0]                 # super minima
        ssp = sp2[:, 0]

    def member(qd, qp):
        if hier:
            sle = _pair_le(ssd[None, :], ssp[None, :],
                           qd[:, None], qp[:, None])
            sidx = jnp.clip(jnp.sum(sle.astype(jnp.int32), axis=1) - 1,
                            0, sd2.shape[0] - 1)
            msd = sd2[sidx]             # (chunk, SUPER) row gathers
            msp = sp2[sidx]
            ble = _pair_le(msd, msp, qd[:, None], qp[:, None])
            bin_ = jnp.clip(jnp.sum(ble.astype(jnp.int32), axis=1) - 1,
                            0, _SUPER - 1)
            bidx = jnp.clip(sidx * _SUPER + bin_, 0, nb - 1)
        else:
            le = _pair_le(sd[None, :], sp[None, :],
                          qd[:, None], qp[:, None])
            bidx = jnp.clip(jnp.sum(le.astype(jnp.int32), axis=1) - 1,
                            0, nb - 1)
        md = bd[bidx]                                  # row gathers
        mp = bp[bidx]
        return jnp.any(jnp.logical_and(md == qd[:, None],
                                       mp == qp[:, None]), axis=1)

    # chunk both query arrays together
    N = q_doc.shape[0]
    if N <= _MEMBER_CHUNK:
        return member(q_doc, q_pos)
    n_chunks = (N + _MEMBER_CHUNK - 1) // _MEMBER_CHUNK
    Np = n_chunks * _MEMBER_CHUNK
    pad = Np - N
    qd = q_doc if not pad else jnp.concatenate(
        [q_doc, jnp.full((pad,), -1, dtype=q_doc.dtype)])
    qp = q_pos if not pad else jnp.concatenate(
        [q_pos, jnp.full((pad,), -1, dtype=q_pos.dtype)])
    _, out = jax.lax.scan(
        lambda c, ch: (c, member(ch[0], ch[1])), 0,
        (qd.reshape(n_chunks, _MEMBER_CHUNK),
         qp.reshape(n_chunks, _MEMBER_CHUNK)))
    return out.reshape(Np)[:N]


def segmented_cumsum(values: jax.Array, seg_start: jax.Array) -> jax.Array:
    """Inclusive cumulative sum resetting at seg_start flags — per-segment
    totals with NO scatter (associative_scan, O(log n) vector passes)."""
    def op(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), jnp.logical_or(fa, fb)

    out, _ = jax.lax.associative_scan(
        op, (values, seg_start.astype(jnp.bool_)))
    return out


# ---------------------------------------------------------------------------
# The fused positional verified search
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "C", "Co", "C2", "Co2", "G", "n", "n_words", "descending",
    "score_mode", "require_match", "use_doc_probes", "has_extra"))
def positional_verify_topn_batch(
        postings, occ_doc8, occ_pos8, deleted, extra, doc_len_pad,
        d_off, d_len, d_base8, d_olen,
        p_off, p_len, p_base8, p_olen, p_delta, p_valid,
        idf, k1, b, avgdl,
        *, C: int, Co: int, C2: int, Co2: int, G: int, n: int,
        n_words: int, descending: bool, score_mode: bool,
        require_match: bool = True, use_doc_probes: bool = False,
        has_extra: bool = False):
    """Batched single-term verified search over the positional index:
    ONE dispatch for B queries sharing the shape bucket.

    Per query: the term's rarest gram (the DRIVER) supplies both the
    candidate docs and the anchor positions; every other gram (PROBE g,
    at in-term offset delta_g relative to the driver) must occur at
    (doc, anchor + delta_g). Anchors surviving all probes are exact
    term occurrences; per-candidate anchor counts are the term TF.

    The occurrence stream ships BOTH parallel arrays per entry — doc id
    (occ_doc8) and position (occ_pos8) — so driver anchors and probe
    pair lists are plain contiguous slice gathers with zero expansion
    work (the v1 rank-based expansion measured O(Co2 * C2/BLK) per lane
    and dominated the batch).

    Inputs (B-batched):
      postings (P+pad,) int32 CSR doc ids (pre/use_doc_probes only);
      occ_doc8 (O//128, 128) int32 occurrence doc ids; occ_pos8
      (O//128, 128) uint16 positions (128-aligned term regions); deleted (W,)
      uint32 tombstones; extra (F, W) uint32 AND-filter rows;
      doc_len_pad (cap128,) int32 doc lengths (128-padded).
      d_off/d_len (B,) driver CSR slice (pre only); d_base8/d_olen (B,)
      driver occurrence region; p_* (B, G) probe equivalents; p_delta
      (B, G) int32 anchor-relative offsets; p_valid (B, G) bool.
      idf — (B, 1) float32 single-term IDF row (score mode).

    Returns packed (B, 3+n[+n]) int32:
      [pre | verified_count | ok_flag | ids (n) | scores bitcast (n)]
    pre = gram-AND doc count (all probes doc-member — only when
    use_doc_probes, else driver df); ok_flag reserved (always 1 — shape
    eligibility is checked host-side before dispatch).
    """
    from .posting_ops import membership_sorted, mask_to_topn
    from .bitmap_ops import bit_member

    B = d_off.shape[0]
    # ---- batch-level contiguous gathers (outside the vmap) ----
    adoc_all = gather_rows_u16(occ_doc8, d_base8, d_olen, Co,
                               fill=int(SENTINEL))
    dpos_all = gather_rows_u16(occ_pos8, d_base8, d_olen, Co, fill=-1)
    pdoc_all = gather_rows_u16(occ_doc8, p_base8.reshape(B * G),
                               p_olen.reshape(B * G), Co2,
                               fill=int(I32_MAX)).reshape(B, G, Co2)
    ppos_all = gather_rows_u16(occ_pos8, p_base8.reshape(B * G),
                               p_olen.reshape(B * G), Co2,
                               fill=-1).reshape(B, G, Co2)
    if use_doc_probes:
        cands_all = gather_slices(postings, d_off, d_len, C)      # (B, C)
        psl_all = gather_slices(postings, p_off.reshape(B * G),
                                p_len.reshape(B * G), C2
                                ).reshape(B, G, C2)
    else:
        cands_all = jnp.zeros((B, 8), dtype=jnp.int32)
        psl_all = jnp.zeros((B, G, 8), dtype=jnp.int32)

    def one(cands, a_doc, dpos, dolen, psl, pdoc, ppos,
            pdelta, pvalid, idf_row):
        i_vec = jnp.arange(Co, dtype=jnp.int32)
        a_valid = i_vec < dolen
        a_doc = jnp.where(a_valid, a_doc, SENTINEL)
        anchor_ok = a_valid
        if use_doc_probes:
            pre_mask = cands != SENTINEL
            # pre = the reference's SearchAnd().size() (live gram-AND
            # count, the single-term BM25 df) — exclude tombstones like
            # the text path's probe mask does
            cclip = jnp.clip(jnp.where(pre_mask, cands, 0), 0,
                             n_words * 32 - 1)
            pre_mask = jnp.logical_and(
                pre_mask, jnp.logical_not(bit_member(deleted, cclip)))
        for g in range(G):
            target = jnp.where(dpos >= 0, dpos + pdelta[g], -1)
            hit = membership_pairs(pdoc[g], ppos[g], a_doc, target)
            anchor_ok = jnp.logical_and(
                anchor_ok, jnp.where(pvalid[g], hit, True))
            if use_doc_probes:
                dochit = membership_sorted(psl[g][None], cands)[0]
                pre_mask = jnp.logical_and(
                    pre_mask, jnp.where(pvalid[g], dochit, True))
        # segment reduce in anchor space (segments = candidates)
        prev_doc = jnp.concatenate(
            [jnp.full((1,), -2, jnp.int32), a_doc[:-1]])
        seg_start = jnp.logical_and(a_valid, a_doc != prev_doc)
        if use_doc_probes:
            pre = jnp.sum(pre_mask.astype(jnp.int32))
        else:
            # probeless pre = driver df (the raw candidate bound, like
            # the probeless text path's mask count)
            pre = jnp.sum(seg_start.astype(jnp.int32))
        tf_in = segmented_cumsum(anchor_ok.astype(jnp.int32), seg_start)
        next_doc = jnp.concatenate(
            [a_doc[1:], jnp.full((1,), -2, jnp.int32)])
        seg_last = jnp.logical_and(a_valid, a_doc != next_doc)
        tf = jnp.where(seg_last, tf_in, 0)
        ids_stream = jnp.where(seg_last, a_doc, SENTINEL)
        clip_doc = jnp.clip(jnp.where(seg_last, a_doc, 0), 0,
                            n_words * 32 - 1)
        alive = jnp.logical_not(bit_member(deleted, clip_doc))
        ok = jnp.logical_and(seg_last, alive)
        if has_extra:
            for f in range(extra.shape[0]):
                ok = jnp.logical_and(ok, bit_member(extra[f], clip_doc))
        matched = tf > 0
        vmask = jnp.logical_and(ok, matched) if require_match else ok
        count = jnp.sum(vmask.astype(jnp.int32))
        if score_mode:
            from .verify_ops import bm25_scores
            dl = blocked_take(doc_len_pad, clip_doc)
            score = bm25_scores(tf[:, None], dl, idf_row, k1, b, avgdl)
            score = jnp.where(vmask, score, -jnp.inf)
            ids_sort = jnp.where(vmask, ids_stream, -1)
            _, _, ids_sorted, score_sorted = jax.lax.sort(
                (-score, -ids_sort, ids_sort, score), num_keys=2)
            ids_out = jnp.where(jnp.isfinite(score_sorted[:n]),
                                ids_sorted[:n], -1)
            return pre, count, ids_out, score_sorted[:n]
        sel = jnp.where(vmask, ids_stream, SENTINEL)
        _, ids_out = mask_to_topn(sel, vmask, n, descending)
        return pre, count, ids_out, jnp.zeros((n,), dtype=jnp.float32)

    pre, count, ids, scores = jax.vmap(one)(
        cands_all, adoc_all, dpos_all, d_olen,
        psl_all, pdoc_all, ppos_all, p_delta, p_valid, idf)
    cols = [pre[:, None], count[:, None],
            jnp.ones((B, 1), dtype=jnp.int32), ids]
    if score_mode:
        cols.append(jax.lax.bitcast_convert_type(scores, jnp.int32))
    return jnp.concatenate(cols, axis=1)


def positional_verify_batch(postings, occ_doc8, occ_pos8, deleted,
                            doc_len_pad, plans, n: int, n_words: int,
                            descending: bool, score_mode: bool = False,
                            idf=None, k1: float = 1.2, b: float = 0.75,
                            avgdl: float = 1.0, require_match: bool = True,
                            use_doc_probes: bool = False, extra=None):
    """numpy wrapper over positional_verify_topn_batch: stack B per-query
    plans (dicts from DeviceIndex.plan_positional, all sharing one shape
    bucket tuple), dispatch once, pull once.
    -> (pre (B,), counts (B,), ids (B, n) [, scores (B, n)])."""
    import numpy as np
    from . import runtime

    B = len(plans)
    p0 = plans[0]
    C, Co, C2, Co2, G = (p0["C"], p0["Co"], p0["C2"], p0["Co2"], p0["G"])
    d_off = np.asarray([p["d_off"] for p in plans], dtype=np.int32)
    d_len = np.asarray([p["d_len"] for p in plans], dtype=np.int32)
    d_base8 = np.asarray([p["d_base8"] for p in plans], dtype=np.int32)
    d_olen = np.asarray([p["d_olen"] for p in plans], dtype=np.int32)
    p_off = np.asarray([p["p_off"] for p in plans], dtype=np.int32)
    p_len = np.asarray([p["p_len"] for p in plans], dtype=np.int32)
    p_base8 = np.asarray([p["p_base8"] for p in plans], dtype=np.int32)
    p_olen = np.asarray([p["p_olen"] for p in plans], dtype=np.int32)
    p_delta = np.asarray([p["p_delta"] for p in plans], dtype=np.int32)
    p_valid = np.asarray([p["p_valid"] for p in plans], dtype=bool)
    if idf is None:
        idf = np.zeros((B, 1), dtype=np.float32)
    has_extra = extra is not None
    if extra is None:
        extra = jnp.zeros((1, 1), dtype=jnp.uint32)
    runtime.dispatches.bump()
    arr = np.asarray(positional_verify_topn_batch(
        postings, occ_doc8, occ_pos8, deleted, extra, doc_len_pad,
        jnp.asarray(d_off), jnp.asarray(d_len), jnp.asarray(d_base8),
        jnp.asarray(d_olen), jnp.asarray(p_off), jnp.asarray(p_len),
        jnp.asarray(p_base8), jnp.asarray(p_olen), jnp.asarray(p_delta),
        jnp.asarray(p_valid),
        jnp.asarray(idf, dtype=jnp.float32), jnp.float32(k1),
        jnp.float32(b), jnp.float32(avgdl),
        C=C, Co=Co, C2=C2, Co2=Co2, G=G, n=n, n_words=n_words,
        descending=descending, score_mode=score_mode,
        require_match=require_match, use_doc_probes=use_doc_probes,
        has_extra=has_extra))
    pre = arr[:, 0]
    count = arr[:, 1]
    ids = arr[:, 3:3 + n]
    if score_mode:
        scores = arr[:, 3 + n:3 + 2 * n].copy().view(np.float32)
        return pre, count, ids, scores
    return pre, count, ids
