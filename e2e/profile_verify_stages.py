"""Stage-level timing for the fused sparse verified-search kernel.

Times each candidate stage variant separately on the real device so the
kernel composition is driven by data, not guesses:

  A. driver CSR gather               (B, C)
  B. probe: broadcast compare_all    (B, Ks, C, Cmax)
  C. probe: blocked membership       (B, Ks, C)
  D. compact: rank scatter           (B, C) -> (B, Kv)
  E. compact: two-key sort           (B, C) -> (B, Kv)
  F. text gather: full-width rows    (B, Kv, 1024)
  G. text gather: column-sliced rows (B, Kv, 512 of 1024)
  H. text gather: narrow matrix rows (B, Kv, 512 of 512)
  I. window verify unrolled          (B, Kv, maxT, cap=4, Nn=2)
  J. window verify fori+dyn-slice    (same shape, round-2 form)

Usage: python -u e2e/profile_verify_stages.py [--docs 1100000]
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
    import jax
    for _ in range(warm):
        r = fn(*args)
    for leaf in jax.tree_util.tree_leaves(r):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        for leaf in jax.tree_util.tree_leaves(r):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
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
                                              membership_sorted)

    rng = np.random.default_rng(0)
    B, C, Cmax, Ks, Kv, maxT, cap, Nn = 64, 4096, 16384, 8, 2048, 1024, 4, 2
    print(f"# backend={jax.default_backend()} B={B} C={C} Cmax={Cmax} "
          f"Kv={Kv}", flush=True)

    P = 50_000_000
    postings = jax.device_put(
        np.sort(rng.integers(1, args.docs, size=P)).astype(np.int32))
    d_off = jnp.asarray(rng.integers(0, P - C, size=B).astype(np.int32))
    d_len = jnp.asarray(np.full(B, 3000, dtype=np.int32))
    sp_off = jnp.asarray(
        rng.integers(0, P - Cmax, size=(B, Ks)).astype(np.int32))
    sp_len = jnp.asarray(np.full((B, Ks), 9000, dtype=np.int32))

    # A. driver gather
    @jax.jit
    def stage_a(postings, d_off, d_len):
        return jax.vmap(lambda o, l: gather_slices(
            postings, o[None], l[None], C)[0])(d_off, d_len)
    cands = stage_a(postings, d_off, d_len)
    print(f"A driver gather (BxC):          {timeit(stage_a, postings, d_off, d_len):8.2f} ms", flush=True)

    # B. compare_all probe
    @jax.jit
    def stage_b(postings, sp_off, sp_len, cands):
        def one(soff, slen, cand):
            sp = gather_slices(postings, soff, slen, Cmax)
            return jax.vmap(lambda row: jnp.any(
                row[None, :] == cand[:, None], axis=1))(sp)
        return jax.vmap(one)(sp_off, sp_len, cands)
    print(f"B probe compare_all:            {timeit(stage_b, postings, sp_off, sp_len, cands):8.2f} ms", flush=True)

    # C. blocked membership probe
    @jax.jit
    def stage_c(postings, sp_off, sp_len, cands):
        def one(soff, slen, cand):
            sp = gather_slices(postings, soff, slen, Cmax)
            return membership_sorted(sp, cand)
        return jax.vmap(one)(sp_off, sp_len, cands)
    print(f"C probe blocked membership:     {timeit(stage_c, postings, sp_off, sp_len, cands):8.2f} ms", flush=True)

    mask = np.zeros((B, C), dtype=bool)
    mask[:, ::7] = True  # ~585 survivors per query
    mask_j = jnp.asarray(mask)

    # D. rank-scatter compact
    @jax.jit
    def stage_d(cands, mask):
        def one(cand, m):
            rank = jnp.cumsum(m.astype(jnp.int32)) - 1
            idx = jnp.where(m & (rank < Kv), rank, Kv)
            sel = jnp.full((Kv + 1,), SENTINEL, dtype=jnp.int32)
            return sel.at[idx].set(cand, mode="drop")[:Kv]
        return jax.vmap(one)(cands, mask)
    print(f"D compact rank-scatter:         {timeit(stage_d, cands, mask_j):8.2f} ms", flush=True)

    # E. sort compact
    @jax.jit
    def stage_e(cands, mask):
        def one(cand, m):
            pos = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]
            key = jnp.where(m, pos, jnp.int32(2 ** 31 - 1))
            key_s, val_s = jax.lax.sort((key, cand), num_keys=1)
            return jnp.where(key_s[:Kv] < 2 ** 31 - 1, val_s[:Kv], SENTINEL)
        return jax.vmap(one)(cands, mask)
    print(f"E compact sort:                 {timeit(stage_e, cands, mask_j):8.2f} ms", flush=True)

    sel = stage_e(cands, mask_j)
    cap_docs = ((args.docs // 32 + 1024) // 1024 * 1024) * 32
    padded = jax.device_put(
        rng.integers(0, 60000, size=(cap_docs, maxT)).astype(np.uint16))
    padded512 = jax.device_put(
        rng.integers(0, 60000, size=(cap_docs, 512)).astype(np.uint16))
    lengths = jax.device_put(np.minimum(
        rng.integers(20, 400, size=cap_docs), maxT).astype(np.int32))

    def gtime(label, fn):
        print(f"{label} {timeit(fn):8.2f} ms", flush=True)

    # F. full-width row gather
    @jax.jit
    def stage_f(padded, sel):
        def one(s):
            ids = jnp.where(s != SENTINEL, s, 0)
            return padded[ids]
        return jax.vmap(one)(sel)
    gtime("F text gather full 1024:      ", lambda: stage_f(padded, sel))

    # G. column-sliced gather (512 of 1024)
    @jax.jit
    def stage_g(padded, sel):
        def one(s):
            ids = jnp.where(s != SENTINEL, s, 0)
            return padded[ids, :512]
        return jax.vmap(one)(sel)
    gtime("G text gather sliced 512/1024:", lambda: stage_g(padded, sel))

    # H. narrow-matrix gather (512-wide rows)
    @jax.jit
    def stage_h(padded512, sel):
        def one(s):
            ids = jnp.where(s != SENTINEL, s, 0)
            return padded512[ids]
        return jax.vmap(one)(sel)
    gtime("H text gather narrow 512:     ", lambda: stage_h(padded512, sel))

    texts = stage_f(padded, sel)
    ndl = jnp.asarray(np.full((B, Nn, cap), 30000, dtype=np.uint32))
    nlen = jnp.asarray(np.full((B, Nn), 2, dtype=np.int32))

    # I. unrolled window verify
    @jax.jit
    def stage_i(texts, lengths, sel, ndl, nlen):
        def one(text, s, nd, nl):
            ids = jnp.where(s != SENTINEL, s, 0)
            dl = lengths[ids]
            t16 = text
            starts = jnp.arange(maxT - cap, dtype=jnp.int32)[None, :]
            acc = None
            for j in range(Nn):
                ndj = jnp.minimum(nd[j], 0xFFFF).astype(jnp.uint16)
                m = None
                for k in range(cap):
                    cmp = jnp.logical_or(
                        k >= nl[j], t16[:, k:k + maxT - cap] == ndj[k])
                    m = cmp if m is None else jnp.logical_and(m, cmp)
                ok = jnp.any(m & (starts + nl[j] <= dl[:, None]), axis=1)
                ok = ok | (nl[j] == 0)
                acc = ok if acc is None else acc & ok
            return acc
        return jax.vmap(one)(texts, sel, ndl, nlen)
    gtime("I window verify unrolled:     ",
          lambda: stage_i(texts, lengths, sel, ndl, nlen))

    # J. round-2 form: fori_loop + dynamic_slice
    @jax.jit
    def stage_j(texts, lengths, sel, ndl, nlen):
        def one(text, s, nd, nl):
            ids = jnp.where(s != SENTINEL, s, 0)
            dl = lengths[ids]
            starts = jnp.arange(maxT - cap, dtype=jnp.int32)[None, :]

            def one_needle(j, acc):
                ndj = nd[j]
                nlj = nl[j]

                def step(k, m):
                    window = jax.lax.dynamic_slice_in_dim(
                        text, k, maxT - cap, axis=1)
                    return jnp.logical_and(m, jnp.logical_or(
                        k >= nlj, window.astype(jnp.uint32) == ndj[k]))
                m = jax.lax.fori_loop(
                    0, cap, step,
                    jnp.ones((Kv, maxT - cap), dtype=jnp.bool_))
                ok = jnp.any(m & (starts + nlj <= dl[:, None]), axis=1)
                return acc & (ok | (nlj == 0))
            return jax.lax.fori_loop(0, Nn, one_needle,
                                     jnp.ones((Kv,), dtype=jnp.bool_))
        return jax.vmap(one)(texts, sel, ndl, nlen)
    gtime("J window verify fori/dyn:     ",
          lambda: stage_j(texts, lengths, sel, ndl, nlen))
    return 0


if __name__ == "__main__":
    sys.exit(main())
