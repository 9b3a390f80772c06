"""Multi-chip sharding of the bitmap index (jax.sharding + shard_map).

The reference is single-node by design (SURVEY.md §2.11); this module is the
TPU-native scale-out path it never had: the document axis is sharded across
chips (each chip owns a contiguous doc-id range of every term's bitmap row),
queries are batch-sharded (dp), and the collectives ride ICI:

- COUNT: per-shard popcount partials -> ``psum`` over the 'docs' axis.
- SEARCH top-k: per-shard local top-k (doc ids globally offset) ->
  ``all_gather`` over 'docs' -> merge-k. Only k ids per shard cross the
  interconnect, never the bitmaps.
- UPDATE (delta apply): (term_row, doc_id) pairs broadcast; each shard
  scatters only the bits in its own range — no cross-chip traffic at all.

Mesh axes: ('dp', 'docs'). dp shards the query batch (pure data
parallelism); 'docs' shards the corpus (the tensor-parallel analog for an
inverted index).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import bitmap_ops


def make_mesh(n_devices: Optional[int] = None, dp: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    assert n % dp == 0, f"dp={dp} must divide device count {n}"
    docs = n // dp
    arr = np.asarray(devices).reshape(dp, docs)
    return Mesh(arr, axis_names=("dp", "docs"))


def shard_index_arrays(mesh: Mesh, bitmaps: jax.Array,
                       deleted: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Place (V, W) bitmaps and (W,) tombstones doc-sharded on the mesh."""
    bm = jax.device_put(bitmaps, NamedSharding(mesh, P(None, "docs")))
    dl = jax.device_put(deleted, NamedSharding(mesh, P("docs")))
    return bm, dl


def _local_query(bitmaps, rows, deleted, n: int, descending: bool,
                 shard_words: int):
    """Per-shard body: AND-reduce rows, mask tombstones, local count+topk."""
    g = bitmaps[rows]  # (B, K, Wl)
    res = jax.lax.reduce(g, jnp.uint32(0xFFFFFFFF), jnp.bitwise_and,
                         dimensions=(1,))
    res = jnp.bitwise_and(res, jnp.bitwise_not(deleted)[None, :])
    count_local = jnp.sum(jnp.bitwise_count(res).astype(jnp.int32), axis=-1)
    ids_local = bitmap_ops.topn_from_bitmap(res, n, descending)  # (B, n)
    shard = jax.lax.axis_index("docs")
    offset = shard.astype(jnp.int32) * jnp.int32(shard_words * 32)
    ids_local = jnp.where(ids_local >= 0, ids_local + offset, -1)
    return count_local, ids_local


def sharded_query_step(mesh: Mesh, n: int = 128, descending: bool = True,
                       shard_words: int = 0):
    """Build the jitted multi-chip batched query step.

    fn(bitmaps (V, W) sharded P(None,'docs'), rows (B, K) sharded P('dp',),
       deleted (W,) sharded P('docs',))
      -> counts (B,) P('dp'), top_ids (B, n) P('dp')
    """
    from jax import shard_map

    def step(bitmaps, rows, deleted):
        def body(bm, rw, dl):
            count_l, ids_l = _local_query(bm, rw, dl, n, descending,
                                          shard_words)
            count = jax.lax.psum(count_l, "docs")
            gathered = jax.lax.all_gather(ids_l, "docs")  # (S, B, n)
            S = gathered.shape[0]
            cat = jnp.swapaxes(gathered, 0, 1).reshape(rw.shape[0], S * n)
            if descending:
                vals, _ = jax.lax.top_k(cat, n)
                ids = jnp.where(vals >= 0, vals, -1)
            else:
                keys = jnp.where(cat >= 0, -cat, jnp.int32(-(2 ** 31) + 1))
                vals, _ = jax.lax.top_k(keys, n)
                ids = jnp.where(vals > -(2 ** 31) + 1, -vals, -1)
            return count, ids

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(None, "docs"), P("dp", None), P("docs")),
            out_specs=(P("dp"), P("dp", None)),
            check_vma=False)(bitmaps, rows, deleted)

    return jax.jit(step)


@functools.lru_cache(maxsize=64)
def _sharded_sparse_program(mesh_id: int, C: int, Cmax: int, limit_b: int,
                            descending: bool, shard_docs: int,
                            words_local: int):
    """Compiled shard_map sparse candidate-probe step (cached per shape).
    mesh_id keys the cache to a specific Mesh object (see
    sharded_sparse_query)."""
    mesh = _MESH_BY_ID[mesh_id]
    from jax import shard_map
    from ..ops.posting_ops import (SENTINEL, bitmap_membership,
                                   gather_slices, mask_to_topn,
                                   membership_sorted)
    from ..ops.bitmap_ops import bit_member

    def step(post_sh, bitmaps, deleted, d_off, d_len, sp_off, sp_len,
             sp_inv, dn_rows, dn_inv):
        def body(post_l, bm_l, dl_l, doff, dlen, soff, slen, sinv,
                 drows, dinv):
            post = post_l[0]           # (Pmax,) shard-local postings
            shard = jax.lax.axis_index("docs").astype(jnp.int32)
            B = doff.shape[0]
            Ks = soff.shape[1]
            cands_all = gather_slices(post, doff[:, 0], dlen[:, 0], C)
            sp_all = gather_slices(
                post, soff[:, :, 0].reshape(B * Ks),
                slen[:, :, 0].reshape(B * Ks), Cmax).reshape(B, Ks, Cmax)

            def one(cands, dl_q, sp, si_, dr_, di_):
                cmask = cands != SENTINEL
                clip = jnp.clip(cands, 0, words_local * 32 - 1)
                spm = jnp.logical_xor(membership_sorted(sp, cands),
                                      si_[:, None])
                dnm = jnp.logical_xor(
                    bitmap_membership(bm_l, dr_, clip), di_[:, None])
                alive = jnp.logical_not(bit_member(dl_l, clip))
                mask = (cmask & jnp.all(spm, axis=0) & jnp.all(dnm, axis=0)
                        & alive)
                count_l = jnp.sum(mask.astype(jnp.int32))
                _, ids_l = mask_to_topn(cands, mask, limit_b, descending)
                ids_g = jnp.where(ids_l >= 0,
                                  ids_l + shard * shard_docs, -1)
                return count_l, ids_g

            count_l, ids_l = jax.vmap(one)(
                cands_all, dlen[:, 0], sp_all,
                sinv[:, :, 0], drows, dinv)
            count = jax.lax.psum(count_l, "docs")
            gathered = jax.lax.all_gather(ids_l, "docs")  # (S, B, n)
            S = gathered.shape[0]
            B = ids_l.shape[0]
            cat = jnp.swapaxes(gathered, 0, 1).reshape(B, S * limit_b)
            if descending:
                vals, _ = jax.lax.top_k(cat, limit_b)
                ids = jnp.where(vals >= 0, vals, -1)
            else:
                keys = jnp.where(cat >= 0, -cat,
                                 jnp.int32(-(2 ** 31) + 1))
                vals, _ = jax.lax.top_k(keys, limit_b)
                ids = jnp.where(vals > -(2 ** 31) + 1, -vals, -1)
            return count, ids

        return shard_map(
            body, mesh=mesh,
            in_specs=(P("docs", None), P(None, "docs"), P("docs"),
                      P(None, "docs"), P(None, "docs"),
                      P(None, None, "docs"), P(None, None, "docs"),
                      P(None, None, "docs"), P(None), P(None)),
            out_specs=(P(None), P(None, None)),
            check_vma=False)(post_sh, bitmaps, deleted, d_off, d_len,
                             sp_off, sp_len, sp_inv, dn_rows, dn_inv)

    return jax.jit(step)


_MESH_BY_ID = {}


def sharded_sparse_query(mesh: Mesh, post_sh, bitmaps, deleted,
                         d_off, d_len, sp_off, sp_len, sp_inv,
                         dn_rows, dn_inv, *, C: int, Cmax: int,
                         limit_b: int, descending: bool, shard_docs: int,
                         words_local: int):
    """Batched sparse candidate-probe over the doc-sharded CSR.

    Per-query driver/probe slices are PER SHARD: d_off/d_len (B, S);
    sp_off/sp_len/sp_inv (B, Ks, S) — built from DeviceIndex.offsets_sh /
    lengths_sh. Each shard probes only its local postings + bitmap block;
    counts meet in a psum and per-shard top-n ids merge over an
    all_gather (limit_b ids per shard, never the slices)."""
    _MESH_BY_ID[id(mesh)] = mesh
    fn = _sharded_sparse_program(id(mesh), C, Cmax, limit_b, descending,
                                 shard_docs, words_local)
    return fn(post_sh, bitmaps, deleted,
              jnp.asarray(d_off), jnp.asarray(d_len),
              jnp.asarray(sp_off), jnp.asarray(sp_len),
              jnp.asarray(sp_inv), jnp.asarray(dn_rows),
              jnp.asarray(dn_inv))


@functools.lru_cache(maxsize=64)
def _sharded_ast_program(mesh_id: int, sig: tuple, K: int, S: int,
                         bucket: int, words_local: int):
    """Compiled shard_map boolean-AST evaluation over the doc-sharded
    CSR + bitmap blocks (the multi-chip analog of
    device_index._ast_words_program). Each shard builds every leaf's
    LOCAL word row from its bitmap block (dense rows are doc-sharded
    P(None,'docs') so row slices are local) and its shard-local postings
    (scatters of shard-LOCAL doc ids into the local words), evaluates
    the tree algebra locally, and the result words come back doc-sharded
    P('docs') — no collective at all: bitmap algebra is embarrassingly
    parallel over the doc axis."""
    mesh = _MESH_BY_ID[mesh_id]
    from jax import shard_map
    from ..ops.bitmap_ops import term_bitmap

    def build(node, leaves, universe):
        tag = node[0]
        if tag == "t":
            return leaves[node[1]]
        if tag == "!":
            return jnp.bitwise_and(
                universe, jnp.bitwise_not(build(node[1], leaves, universe)))
        out = build(node[1], leaves, universe)
        for ch in node[2:]:
            nxt = build(ch, leaves, universe)
            out = (jnp.bitwise_and(out, nxt) if tag == "&"
                   else jnp.bitwise_or(out, nxt))
        return out

    def step(post_sh, bitmaps, deleted, universe, rows, offs, lens, real):
        def body(post_l, bm_l, dl_l, uni_l, rw, of, ln, rl):
            post = post_l[0]
            T = rw.shape[0]
            # real slots with a shard-empty slice must contribute ZEROS
            # (term absent from this doc range), not the padding identity
            leaves = [term_bitmap(
                bm_l, rw[i], post, of[i, :, 0], ln[i, :, 0], dl_l,
                K=K, S=S, bucket=bucket, n_words=words_local,
                real=rl[i])
                for i in range(T)]
            words = build(sig, leaves, uni_l)
            return jnp.bitwise_and(words, jnp.bitwise_not(dl_l))

        return shard_map(
            body, mesh=mesh,
            in_specs=(P("docs", None), P(None, "docs"), P("docs"),
                      P("docs"), P(None, None),
                      P(None, None, "docs"), P(None, None, "docs"),
                      P(None, None)),
            out_specs=P("docs"),
            check_vma=False)(post_sh, bitmaps, deleted, universe,
                             rows, offs, lens, real)

    return jax.jit(step)


def sharded_ast_words(mesh: Mesh, post_sh, bitmaps, deleted, universe,
                      rows, offs, lens, real, *, sig: tuple, K: int, S: int,
                      bucket: int, words_local: int):
    """Boolean-AST word-bitmap algebra over the doc-sharded index.

    rows (T, K) replicated dense leaf rows; offs/lens (T, S, S_shards)
    PER-SHARD sparse slices (from DeviceIndex.offsets_sh/lengths_sh);
    real (T, S) bool marks slots holding a real term (vs S-padding).
    universe: (W,) all-live bitmap doc-sharded. -> (W,) result words
    (device, doc-sharded; np.asarray gathers)."""
    _MESH_BY_ID[id(mesh)] = mesh
    fn = _sharded_ast_program(id(mesh), sig, K, S, bucket, words_local)
    return fn(post_sh, bitmaps, deleted, universe,
              jnp.asarray(rows), jnp.asarray(offs), jnp.asarray(lens),
              jnp.asarray(real))


@functools.lru_cache(maxsize=64)
def _sharded_fused_verify_program(mesh_id: int, C: int, Cmax: int, Ks: int,
                                  Kv: int, n: int, Nn: int, cap: int,
                                  descending: bool, probeless: bool,
                                  has_extra: bool, use_range: bool,
                                  shard_docs: int, words_local: int,
                                  score_mode: bool = False,
                                  require_match: bool = True):
    """Compiled shard_map fused verified search (the multi-chip analog of
    fused._sparse_search_verify_topn_batch). Per shard: gather the
    driver term's LOCAL CSR slice (shard-local doc ids), probe the other
    sparse grams' local slices + tombstones + filter rows, compact to the
    first Kv survivors, window-verify them against the LOCAL doc-sharded
    text rows (candidates never cross chips — only k verified ids ride
    the all_gather), then psum counts and merge per-shard top-n.

    score_mode adds the BM25 tail the single-chip kernel has
    (fused._verify_topn): the same compare pass yields per-needle TF,
    each shard scores its own survivors with the REPLICATED idf/avgdl
    (shard-local tf + doc_len are all the formula needs), and the global
    merge sorts the gathered (ids, scores) by score desc, id desc — the
    north-star CJK BM25 verified workload runs sharded end-to-end.

    Output (B, 3+n) int32 rows [pre_sum | clipped | count | ids...], or
    (B, 3+2n) with f32 scores bitcast into the tail when score_mode;
    clipped > 0 means some shard's survivor set exceeded Kv and the
    caller must take the exact path (its count would under-report)."""
    mesh = _MESH_BY_ID[mesh_id]
    from jax import shard_map
    from ..ops.bitmap_ops import bit_member
    from ..ops.fused import compact_first_k
    from ..ops.posting_ops import (SENTINEL, gather_slices, mask_to_topn,
                                   membership_sorted)
    from ..ops.verify_ops import (_gather_text_padded, bm25_scores,
                                  contains_all, tf_matrix)

    def step(post_sh, deleted, text_pad, text_len, d_off, d_len,
             sp_off, sp_len, sp_inv, needles, needle_lens, extra,
             idf, k1, b, avgdl):
        def body(post_l, dl_l, txt_l, tlen_l, doff, dlen, soff, slen,
                 sinv, ndl, nlen, ext, idf_r, k1_r, b_r, avgdl_r):
            post = post_l[0]
            shard = jax.lax.axis_index("docs").astype(jnp.int32)
            B = doff.shape[0]
            cands_all = gather_slices(post, doff[:, 0], dlen[:, 0], C)
            if probeless:
                sp_all = jnp.zeros((B, 1, 1), dtype=jnp.int32)
            else:
                sp_all = gather_slices(
                    post, soff[:, :, 0].reshape(B * Ks),
                    slen[:, :, 0].reshape(B * Ks), Cmax).reshape(B, Ks,
                                                                 Cmax)

            def one(cands, sp, si_, ndl_q, nlen_q, idf_q):
                cmask = cands != SENTINEL
                clip = jnp.clip(cands, 0, words_local * 32 - 1)
                mask = cmask & jnp.logical_not(bit_member(dl_l, clip))
                if has_extra:
                    for f in range(ext.shape[0]):
                        mask = mask & bit_member(ext[f], clip)
                if not probeless:
                    spm = jnp.logical_xor(membership_sorted(sp, cands),
                                          si_[:, None])
                    mask = mask & jnp.all(spm, axis=0)
                sel, pre = compact_first_k(cands, mask, Kv)
                alive = sel != SENTINEL
                safe = jnp.where(alive, sel, 0)
                text, doc_len, win = _gather_text_padded(
                    txt_l, tlen_l, safe, 0, cap,
                    need_len=use_range or score_mode)
                if score_mode:
                    tf = tf_matrix(text, doc_len, ndl_q, nlen_q, win,
                                   Nn, cap, use_range)
                    if require_match:
                        present = nlen_q > 0
                        ok = jnp.logical_or(
                            tf > 0, jnp.logical_not(present)[None, :])
                        vmask = jnp.logical_and(jnp.all(ok, axis=1),
                                                alive)
                    else:
                        vmask = alive
                    cnt = jnp.sum(vmask.astype(jnp.int32))
                    score = bm25_scores(tf, doc_len, idf_q, k1_r, b_r,
                                        avgdl_r)
                    score = jnp.where(vmask, score, -jnp.inf)
                    ids_glob = jnp.where(alive,
                                         sel + shard * shard_docs, -1)
                    _, _, ids_s, score_s = jax.lax.sort(
                        (-score, -ids_glob, ids_glob, score), num_keys=2)
                    ids_g = jnp.where(jnp.isfinite(score_s[:n]),
                                      ids_s[:n], -1)
                    return pre, cnt, ids_g, score_s[:n]
                vmask = contains_all(text, doc_len, ndl_q, nlen_q, win,
                                     Nn, cap, use_range)
                vmask = jnp.logical_and(vmask, alive)
                cnt, ids_l = mask_to_topn(sel, vmask, n, descending)
                ids_g = jnp.where(ids_l >= 0,
                                  ids_l + shard * shard_docs, -1)
                return pre, cnt, ids_g, jnp.zeros((n,), jnp.float32)

            pre_l, cnt_l, ids_l, sc_l = jax.vmap(one)(
                cands_all, sp_all, sinv[:, :, 0], ndl, nlen, idf_r)
            pre = jax.lax.psum(pre_l, "docs")
            clipped = jax.lax.psum((pre_l > Kv).astype(jnp.int32), "docs")
            count = jax.lax.psum(cnt_l, "docs")
            gathered = jax.lax.all_gather(ids_l, "docs")  # (S, B, n)
            Ssh = gathered.shape[0]
            cat = jnp.swapaxes(gathered, 0, 1).reshape(B, Ssh * n)
            if score_mode:
                gsc = jax.lax.all_gather(sc_l, "docs")    # (S, B, n)
                sc_cat = jnp.swapaxes(gsc, 0, 1).reshape(B, Ssh * n)
                _, _, ids_m, sc_m = jax.lax.sort(
                    (-sc_cat, -cat, cat, sc_cat), num_keys=2)
                ids = jnp.where(jnp.isfinite(sc_m[:, :n]),
                                ids_m[:, :n], -1)
                return jnp.concatenate(
                    [pre[:, None], clipped[:, None], count[:, None], ids,
                     jax.lax.bitcast_convert_type(sc_m[:, :n],
                                                  jnp.int32)], axis=1)
            if descending:
                vals, _ = jax.lax.top_k(cat, n)
                ids = jnp.where(vals >= 0, vals, -1)
            else:
                keys = jnp.where(cat >= 0, -cat, jnp.int32(-(2 ** 31) + 1))
                vals, _ = jax.lax.top_k(keys, n)
                ids = jnp.where(vals > -(2 ** 31) + 1, -vals, -1)
            return jnp.concatenate(
                [pre[:, None], clipped[:, None], count[:, None], ids],
                axis=1)

        return shard_map(
            body, mesh=mesh,
            in_specs=(P("docs", None), P("docs"), P("docs", None),
                      P("docs"), P(None, "docs"), P(None, "docs"),
                      P(None, None, "docs"), P(None, None, "docs"),
                      P(None, None, "docs"), P(None, None, None),
                      P(None, None), P(None, "docs"),
                      P(None, None), P(), P(), P()),
            out_specs=P(None, None),
            check_vma=False)(post_sh, deleted, text_pad, text_len,
                             d_off, d_len, sp_off, sp_len, sp_inv,
                             needles, needle_lens, extra,
                             idf, k1, b, avgdl)

    return jax.jit(step)


def sharded_fused_verify(mesh: Mesh, post_sh, deleted, text_pad, text_len,
                         d_off, d_len, sp_off, sp_len, sp_inv,
                         needles, needle_lens, extra, *, C: int, Cmax: int,
                         Ks: int, Kv: int, n: int, Nn: int, cap: int,
                         descending: bool, probeless: bool,
                         use_range: bool, shard_docs: int,
                         words_local: int, score_mode: bool = False,
                         require_match: bool = True, idf=None,
                         k1: float = 1.2, b: float = 0.75,
                         avgdl: float = 1.0):
    """Batched fused verified search over the doc-sharded CSR + text.

    d_off/d_len (B, S_shards); sp_off/sp_len/sp_inv (B, Ks, S_shards);
    needles (B, Nn, cap) uint32; extra (F, W) filter word rows (pass a
    (0, W) array when unused); idf (B, Nn) f32 replicated (score_mode).
    -> (B, 3+n) int32 [pre|clipped|count|ids], plus n bitcast-f32 score
    columns when score_mode."""
    _MESH_BY_ID[id(mesh)] = mesh
    has_extra = int(extra.shape[0]) > 0
    if not has_extra:
        # unused but must still split over 'docs': one word per shard
        extra = jnp.zeros((1, int(mesh.shape["docs"])), dtype=jnp.uint32)
    if idf is None:
        idf = np.zeros((int(d_off.shape[0]), Nn), dtype=np.float32)
    fn = _sharded_fused_verify_program(
        id(mesh), C, Cmax, Ks, Kv, n, Nn, cap, descending, probeless,
        has_extra, use_range, shard_docs, words_local,
        score_mode=score_mode, require_match=require_match)
    return fn(post_sh, deleted, text_pad, text_len,
              jnp.asarray(d_off), jnp.asarray(d_len),
              jnp.asarray(sp_off), jnp.asarray(sp_len),
              jnp.asarray(sp_inv), jnp.asarray(needles),
              jnp.asarray(needle_lens), extra,
              jnp.asarray(idf, dtype=jnp.float32), jnp.float32(k1),
              jnp.float32(b), jnp.float32(avgdl))


def sharded_update_step(mesh: Mesh, shard_words: int):
    """Build the jitted multi-chip delta-apply step (index mutation).

    fn(bitmaps (V, W) P(None,'docs'), term_rows (U,) replicated,
       doc_ids (U,) replicated) -> new bitmaps. Each shard sets only the
    bits falling in its doc range; pad entries with doc_id = -1.
    """
    from jax import shard_map

    def step(bitmaps, term_rows, doc_ids):
        def body(bm, tr, di):
            shard = jax.lax.axis_index("docs").astype(jnp.int32)
            lo = shard * jnp.int32(shard_words * 32)
            local = di - lo
            valid = (di >= 0) & (local >= 0) & (local < shard_words * 32)
            word = jnp.where(valid, jnp.right_shift(local, 5), 0)
            bit = jnp.left_shift(
                jnp.uint32(1),
                jnp.bitwise_and(local, 31).astype(jnp.uint32))
            bit = jnp.where(valid, bit, jnp.uint32(0))
            rows = jnp.where(valid, tr, 0)
            upd = jnp.zeros_like(bm)
            # distinct bits per (row, word) pair: add == bitwise-or
            upd = upd.at[rows, word].add(bit)
            return jnp.bitwise_or(bm, upd)

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(None, "docs"), P(None), P(None)),
            out_specs=P(None, "docs"),
            check_vma=False)(bitmaps, term_rows, doc_ids)

    return jax.jit(step, donate_argnums=(0,))


class ShardedQueryEngine:
    """Convenience wrapper owning sharded arrays + compiled steps."""

    def __init__(self, mesh: Mesh, bitmaps: np.ndarray, deleted: np.ndarray,
                 topk: int = 128):
        self.mesh = mesh
        n_docs_shards = mesh.shape["docs"]
        V, W = bitmaps.shape
        assert W % n_docs_shards == 0, \
            f"bitmap width {W} not divisible by docs axis {n_docs_shards}"
        self.shard_words = W // n_docs_shards
        self.bitmaps, self.deleted = shard_index_arrays(
            mesh, jnp.asarray(bitmaps), jnp.asarray(deleted))
        self.query = sharded_query_step(mesh, n=topk,
                                        shard_words=self.shard_words)
        self.update = sharded_update_step(mesh, self.shard_words)

    def search(self, rows: np.ndarray):
        counts, ids = self.query(self.bitmaps,
                                 jnp.asarray(rows, dtype=jnp.int32),
                                 self.deleted)
        return np.asarray(counts), np.asarray(ids)

    def apply_delta(self, term_rows: np.ndarray, doc_ids: np.ndarray) -> None:
        self.bitmaps = self.update(self.bitmaps,
                                   jnp.asarray(term_rows, dtype=jnp.int32),
                                   jnp.asarray(doc_ids, dtype=jnp.int32))
