"""Bisect the probeless fused verify kernel: time cumulative prefixes of
its stage chain on real shapes to localize device time (every dispatch
pays the same tunnel RTT, so deltas between rows are device time).

Stages (B=64, C=Kv=4096, maxT=1024, padded u16 rows):
  1. driver CSR gather only
  2. + text row gather (raw)
  3. + doc_len sentinel scan + cap pad
  4. + window verify (contains_all)
  5. + verified count + mask_to_topn   (== full non-score kernel)
  6. full kernel via sparse_search_verify_topn_batch (sanity)

Usage: python -u e2e/profile_probeless.py [--docs 1100000]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, warm=2, iters=6):
    # block_until_ready UNDER-REPORTS on the tunneled backend — force a
    # host materialization of every output (CLAUDE.md hard-won rule)
    import jax

    def force(r):
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf)
    for _ in range(warm):
        force(fn(*args))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return lat[len(lat) // 2] * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_100_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mygramdb_tpu.ops.posting_ops import (SENTINEL, gather_slices,
                                              mask_to_topn)
    from mygramdb_tpu.ops.verify_ops import contains_all

    rng = np.random.default_rng(0)
    B, C, maxT, cap, Nn = 64, 4096, 1024, 4, 2
    print(f"# backend={jax.default_backend()} B={B} C={C} maxT={maxT}",
          flush=True)

    P = 50_000_000
    postings = jax.device_put(
        np.sort(rng.integers(1, args.docs, size=P)).astype(np.int32))
    d_off = jnp.asarray(rng.integers(0, P - C, size=B).astype(np.int32))
    d_len = jnp.asarray(np.full(B, 3000, dtype=np.int32))

    cap_docs = ((args.docs // 32 + 1024) // 1024 * 1024) * 32
    lengths_np = np.minimum(
        rng.integers(20, 400, size=cap_docs), maxT).astype(np.int32)
    pad_np = np.full((cap_docs, maxT), 0xFFFF, dtype=np.uint16)
    # realistic fill: row r holds lengths[r] real cells then sentinel
    # (vectorized: mask by broadcast compare)
    pos = np.arange(maxT, dtype=np.int32)[None, :]
    fill = rng.integers(0, 60000, size=(cap_docs, maxT)).astype(np.uint16)
    np.copyto(pad_np, fill, where=pos < lengths_np[:, None])
    padded = jax.device_put(pad_np)
    del pad_np, fill

    ndl = jnp.asarray(np.full((B, Nn, 32), 30000, dtype=np.uint32))
    nlen_np = np.zeros((B, Nn), dtype=np.int32)
    nlen_np[:, 0] = 2
    nlen = jnp.asarray(nlen_np)

    def driver(postings, d_off, d_len):
        cands = gather_slices(postings, d_off, d_len, C)
        return cands

    @jax.jit
    def s1(postings, d_off, d_len):
        return jnp.sum(driver(postings, d_off, d_len))
    print(f"1 driver gather:            {timeit(s1, postings, d_off, d_len):8.2f} ms", flush=True)

    @jax.jit
    def s2(postings, d_off, d_len, padded):
        cands = driver(postings, d_off, d_len)
        safe = jnp.where(cands != SENTINEL, cands, 0)
        rows = padded[safe]                      # (B, C, maxT)
        return jnp.sum(rows.astype(jnp.uint32))
    print(f"2 + text row gather:        {timeit(s2, postings, d_off, d_len, padded):8.2f} ms", flush=True)

    sent16 = jnp.uint16(0xFFFF)

    @jax.jit
    def s3(postings, d_off, d_len, padded):
        cands = driver(postings, d_off, d_len)
        safe = jnp.where(cands != SENTINEL, cands, 0)
        rows = padded[safe]
        doc_len = jnp.sum((rows != sent16).astype(jnp.int32), axis=2)
        padc = jnp.full((B, C, cap), sent16, dtype=jnp.uint16)
        text = jnp.concatenate([rows, padc], axis=2)
        return jnp.sum(text.astype(jnp.uint32)) + jnp.sum(doc_len)
    print(f"3 + doc_len scan + pad:     {timeit(s3, postings, d_off, d_len, padded):8.2f} ms", flush=True)

    @jax.jit
    def s4(postings, d_off, d_len, padded, ndl, nlen):
        cands = driver(postings, d_off, d_len)

        def one(cand, nd, nl):
            safe = jnp.where(cand != SENTINEL, cand, 0)
            rows = padded[safe]
            doc_len = jnp.sum((rows != sent16).astype(jnp.int32), axis=1)
            padc = jnp.full((C, cap), sent16, dtype=jnp.uint16)
            text = jnp.concatenate([rows, padc], axis=1)
            return contains_all(text, doc_len, nd, nl, maxT, Nn, cap)
        return jax.vmap(one)(cands, ndl, nlen)
    print(f"4 + window verify:          {timeit(s4, postings, d_off, d_len, padded, ndl, nlen):8.2f} ms", flush=True)

    @jax.jit
    def s5(postings, d_off, d_len, padded, ndl, nlen):
        cands = driver(postings, d_off, d_len)

        def one(cand, nd, nl):
            alive = cand != SENTINEL
            safe = jnp.where(alive, cand, 0)
            rows = padded[safe]
            doc_len = jnp.sum((rows != sent16).astype(jnp.int32), axis=1)
            padc = jnp.full((C, cap), sent16, dtype=jnp.uint16)
            text = jnp.concatenate([rows, padc], axis=1)
            vm = contains_all(text, doc_len, nd, nl, maxT, Nn, cap) & alive
            count = jnp.sum(vm.astype(jnp.int32))
            _, ids = mask_to_topn(cand, vm, 128, True)
            return count, ids
        return jax.vmap(one)(cands, ndl, nlen)
    print(f"5 + count + mask_to_topn:   {timeit(s5, postings, d_off, d_len, padded, ndl, nlen):8.2f} ms", flush=True)

    from mygramdb_tpu.ops import fused as fused_ops

    class TS:
        pass
    ts = TS()
    ts.codepoints = padded
    ts.offsets = jax.device_put(np.zeros(cap_docs, dtype=np.int32))
    ts.lengths = jax.device_put(lengths_np)
    ts.maxT = maxT

    W = cap_docs // 32
    bitmaps = jax.device_put(np.zeros((4, W), dtype=np.uint32))
    deleted = jax.device_put(np.zeros(W, dtype=np.uint32))
    sp_off = np.zeros((B, 8), dtype=np.int32)
    sp_len = np.zeros((B, 8), dtype=np.int32)
    sp_inv = np.ones((B, 8), dtype=bool)
    dn_rows = np.zeros((B, 8), dtype=np.int32)
    dn_inv = np.zeros((B, 8), dtype=bool)

    def s6():
        return fused_ops.sparse_search_verify_topn_batch(
            postings, bitmaps, deleted, np.asarray(d_off),
            np.asarray(d_len), sp_off, sp_len, sp_inv, dn_rows, dn_inv,
            ts, C, 2048, 128, np.asarray(ndl), np.asarray(nlen), W,
            Kv=C, maxT=maxT, use_dense_probes=False,
            check_tombstones=False)
    print(f"6 full fused kernel:        {timeit(s6):8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
