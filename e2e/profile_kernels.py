"""Kernel-level profiler for the dense search and fused verify paths.

Builds SYNTHETIC device arrays at a target corpus scale (no corpus build,
no host index) and times each stage of the hot programs separately so we
can see where the per-batch milliseconds go:

  dense path:  row-gather AND (pallas)  |  popcount  |  topn extraction
  fused path:  CSR candidate gather     |  probes    |  text gather | window

Usage:  python e2e/profile_kernels.py --docs 1100000 [--batch 1024]
Times are DEVICE time (block_until_ready on device-resident outputs) plus
a separate host-roundtrip measurement (np.asarray) for the serving shape.
"""

from __future__ import annotations

import argparse
import functools
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _block(r)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        _block(r)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return lat[len(lat) // 2] * 1000  # ms


def _block(r):
    import jax
    for leaf in jax.tree_util.tree_leaves(r):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_100_000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--verify-batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mygramdb_tpu.ops import bitmap_ops
    from mygramdb_tpu.ops.bitmap_ops import (
        dense_query_pallas, _topn_hierarchical, _select_first_k,
        dense_search_topn, popcount_words)

    rng = np.random.default_rng(0)
    WBLOCK = 1024
    W = ((args.docs // 32) + WBLOCK) // WBLOCK * WBLOCK
    V = 1024
    B, K, N = args.batch, 8, 128
    print(f"# backend={jax.default_backend()} W={W} V={V} B={B}", flush=True)

    # dense bitmap matrix: ~20% fill (typical dense-gram density)
    bm = rng.integers(0, 2**32, size=(V, W), dtype=np.uint32)
    bm &= rng.integers(0, 2**32, size=(V, W), dtype=np.uint32)
    bm[V - 2] = 0xFFFFFFFF
    bm[V - 1] = 0
    bitmaps = jax.device_put(bm)
    deleted = jax.device_put(np.zeros(W, dtype=np.uint32))
    rows = jax.device_put(
        rng.integers(0, V - 2, size=(B, K)).astype(np.int32))
    nrows = jax.device_put(np.full((B, 1), V - 1, dtype=np.int32))
    extra = jax.device_put(np.full((1, W), 0xFFFFFFFF, dtype=np.uint32))

    t = timeit(lambda: dense_query_pallas(bitmaps, rows, deleted)[0])
    gb = B * K * W * 4 / 1e9
    print(f"dense_query_pallas (count only): {t:8.2f} ms   "
          f"[{gb:.2f} GB gathered -> {gb / (t/1e3):.0f} GB/s]", flush=True)

    # result words for downstream stages
    @jax.jit
    def _full(bitmaps, rows, deleted):
        return dense_query_pallas(bitmaps, rows, deleted)[1]
    res = _full(bitmaps, rows, deleted)
    res.block_until_ready()

    t = timeit(lambda: _topn_hierarchical(res, N, True))
    print(f"_topn_hierarchical (n={N}):      {t:8.2f} ms", flush=True)

    t = timeit(lambda: popcount_words(res))
    print(f"  popcount full:                 {t:6.2f} ms", flush=True)

    t = timeit(lambda: dense_search_topn(
        bitmaps, rows, nrows, deleted, extra, False, False, N, True))
    print(f"dense_search_topn fused:         {t:8.2f} ms  "
          f"(device only)", flush=True)

    def host_step():
        c, i = dense_search_topn(bitmaps, rows, nrows, deleted, extra,
                                 False, False, N, True)
        return np.asarray(c), np.asarray(i)
    for _ in range(2):
        host_step()
    lat = []
    for _ in range(8):
        t0 = time.perf_counter()
        host_step()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    print(f"dense_search_topn + host pull:   {lat[4]*1e3:8.2f} ms  "
          f"({B*N*4/1e6:.2f} MB ids)", flush=True)

    # ---------------- fused sparse verify path ----------------
    from mygramdb_tpu.ops import fused as fused_ops
    from mygramdb_tpu.ops.verify_ops import _gather_text_padded

    Bv = args.verify_batch
    C, Cmax, maxT, Nn, cap = 4096, 16384, 1024, 2, 4
    P = 50_000_000  # postings pool
    postings = jax.device_put(
        np.sort(rng.integers(1, args.docs, size=P)).astype(np.int32))
    cap_docs = W * 32
    lengths_np = np.minimum(
        rng.integers(20, 400, size=cap_docs), maxT).astype(np.int32)
    padded = jax.device_put(
        rng.integers(0, 60000, size=(cap_docs, maxT)).astype(np.uint16))
    lengths = jax.device_put(lengths_np)
    offsets = jax.device_put(np.zeros(cap_docs, dtype=np.int32))

    d_off = rng.integers(0, P - C, size=Bv).astype(np.int32)
    d_len = np.full(Bv, 3000, dtype=np.int32)
    sp_off = rng.integers(0, P - Cmax, size=(Bv, 8)).astype(np.int32)
    sp_len = np.full((Bv, 8), 9000, dtype=np.int32)
    sp_len[:, 2:] = 0
    sp_inv = np.zeros((Bv, 8), dtype=bool)
    sp_inv[:, 2:] = True
    dn_rows = np.full((Bv, 8), V - 2, dtype=np.int32)
    dn_inv = np.zeros((Bv, 8), dtype=bool)
    ndl = np.zeros((Bv, Nn, 32), dtype=np.uint32)
    ndl[:, 0, :2] = 30000
    nlen = np.zeros((Bv, Nn), dtype=np.int32)
    nlen[:, 0] = 2

    class TS:
        pass
    ts = TS()
    ts.codepoints = padded
    ts.offsets = offsets
    ts.lengths = lengths
    ts.maxT = maxT

    def vstep():
        return fused_ops.sparse_search_verify_topn_batch(
            postings, bitmaps, deleted, d_off, d_len, sp_off, sp_len,
            sp_inv, dn_rows, dn_inv, ts, C, Cmax, 128, ndl, nlen, W)
    for _ in range(2):
        vstep()
    lat = []
    for _ in range(6):
        t0 = time.perf_counter()
        vstep()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    print(f"fused sparse verify (B={Bv} C={C} Cmax={Cmax} maxT={maxT}): "
          f"{lat[3]*1e3:8.2f} ms", flush=True)

    # stage splits
    from mygramdb_tpu.ops.posting_ops import gather_slices

    @functools.partial(jax.jit, static_argnames=("C",))
    def g1(postings, d_off, d_len, *, C):
        return jax.vmap(lambda o, l: gather_slices(
            postings, o[None], l[None], C)[0])(d_off, d_len)
    cands = g1(postings, jnp.asarray(d_off), jnp.asarray(d_len), C=C)
    t = timeit(lambda: g1(postings, jnp.asarray(d_off),
                          jnp.asarray(d_len), C=C))
    print(f"  cand gather (B x C):           {t:6.2f} ms", flush=True)

    @functools.partial(jax.jit, static_argnames=("C", "Cmax"))
    def g2(postings, sp_off, sp_len, cands, *, C, Cmax):
        def one(soff, slen, cand):
            sp = gather_slices(postings, soff, slen, Cmax)
            return jax.vmap(lambda row: jnp.any(
                row[None, :] == cand[:, None], axis=1))(sp)
        return jax.vmap(one)(sp_off, sp_len, cands)
    t = timeit(lambda: g2(postings, jnp.asarray(sp_off),
                          jnp.asarray(sp_len), cands, C=C, Cmax=Cmax))
    print(f"  probe compare_all (BxKsxCxCmax): {t:6.2f} ms", flush=True)

    @functools.partial(jax.jit, static_argnames=("maxT",))
    def g3(padded, lengths, cands, *, maxT):
        return jax.vmap(lambda c: _gather_text_padded(
            padded, lengths, c, maxT)[0])(cands)
    t = timeit(lambda: g3(padded, lengths, cands, maxT=maxT))
    gbt = Bv * C * maxT * 2 / 1e9
    print(f"  text row-gather (BxCxmaxT u16): {t:6.2f} ms  "
          f"[{gbt:.2f} GB -> {gbt / (t/1e3):.0f} GB/s]", flush=True)

    texts = g3(padded, lengths, cands, maxT=maxT)

    @functools.partial(jax.jit, static_argnames=("maxT", "Nn", "cap"))
    def g4(texts, lengths, cands, ndl, nlen, *, maxT, Nn, cap):
        def one(text, cand, ndl_s, nlen_s):
            doc_len = lengths[jnp.maximum(cand, 0)]
            starts = jnp.arange(maxT, dtype=jnp.int32)[None, :]

            def one_needle(j, acc):
                n_ = ndl_s[j]
                nl = nlen_s[j]

                def step(k, m):
                    window = jax.lax.dynamic_slice_in_dim(
                        text, k, maxT, axis=1)
                    return jnp.logical_and(
                        m, jnp.logical_or(k >= nl, window == n_[k]))
                match_at = jax.lax.fori_loop(
                    0, cap, step, jnp.ones((C, maxT), dtype=jnp.bool_))
                ok = jnp.any(match_at & (starts + nl <= doc_len[:, None]),
                             axis=1)
                return acc & (ok | (nl == 0))
            return jax.lax.fori_loop(0, Nn, one_needle,
                                     jnp.ones((C,), dtype=jnp.bool_))
        return jax.vmap(one)(texts, cands, ndl, nlen)
    t = timeit(lambda: g4(texts, lengths, cands, jnp.asarray(ndl),
                          jnp.asarray(nlen), maxT=maxT, Nn=Nn, cap=cap))
    print(f"  window verify (BxNnxcapxCxmaxT): {t:6.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
