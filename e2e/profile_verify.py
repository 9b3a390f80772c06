"""Focused timing of the fused sparse verified-search kernel at bench
shapes (synthetic device arrays; no corpus build).

Round-3 kernel rewrite check: statically-unrolled window compares +
candidate compaction (Kv) + maxT column slice + native-u16 compares.
Round-2 baseline for the same (B=64, C=4096, Cmax=16384, maxT=1024)
shape: 302 ms/batch (BENCH_1M.json ja_cjk_verified).

Usage: python -u e2e/profile_verify.py [--docs 1100000] [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, warm=2, iters=6):
    for _ in range(warm):
        r = fn()
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return lat[len(lat) // 2] * 1000, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_100_000)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    from mygramdb_tpu.ops import fused as fused_ops

    rng = np.random.default_rng(0)
    WBLOCK = 1024
    W = ((args.docs // 32) + WBLOCK) // WBLOCK * WBLOCK
    V = 1024
    print(f"# backend={jax.default_backend()} W={W}", flush=True)

    P = 50_000_000
    postings = jax.device_put(
        np.sort(rng.integers(1, args.docs, size=P)).astype(np.int32))
    bm = rng.integers(0, 2**32, size=(V, W), dtype=np.uint32)
    bm[V - 2] = 0xFFFFFFFF
    bm[V - 1] = 0
    bitmaps = jax.device_put(bm)
    deleted = jax.device_put(np.zeros(W, dtype=np.uint32))

    cap_docs = W * 32
    maxT_store = 1024
    lengths_np = np.minimum(
        rng.integers(20, 400, size=cap_docs), maxT_store).astype(np.int32)
    padded = jax.device_put(
        rng.integers(0, 60000, size=(cap_docs, maxT_store)).astype(np.uint16))

    class TS:
        pass
    ts = TS()
    ts.codepoints = padded
    ts.offsets = jax.device_put(np.zeros(cap_docs, dtype=np.int32))
    ts.lengths = jax.device_put(lengths_np)
    ts.maxT = maxT_store

    Bv = args.batch
    C, Cmax, Nn = 4096, 16384, 2
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

    # sweep: (probe mode, C, Kv, maxT, score_mode). probeless+C<=Kv is the
    # serving shape (search_and_verified passes use_dense_probes=False).
    cases = [
        ("probed ", True, 4096, 4096, 1024, False),
        ("probeless", False, 4096, 4096, 1024, False),
        ("probeless", False, 2048, 4096, 1024, False),
        ("probeless", False, 4096, 4096, 512, False),
        ("probeless", False, 4096, 4096, 256, False),
        ("probeless", False, 4096, 4096, 1024, True),
    ]
    for label, probes, Cc, Kv, maxT, score in cases:
        dl = np.minimum(d_len, Cc)
        idf = np.zeros((Bv, Nn), dtype=np.float32)
        idf[:, 0] = 1.5

        def step():
            return fused_ops.sparse_search_verify_topn_batch(
                postings, bitmaps, deleted, d_off, dl, sp_off, sp_len,
                sp_inv, dn_rows, dn_inv, ts, Cc, Cmax, 128, ndl, nlen, W,
                Kv=Kv, maxT=maxT, use_dense_probes=probes,
                check_tombstones=probes, score_mode=score, idf=idf)
        t, out = bench(step)
        pre = out[0]
        print(f"fused {label} B={Bv} C={Cc} Kv={Kv} maxT={maxT} "
              f"score={int(score)}: {t:8.2f} ms "
              f"({t / Bv * 1000:6.0f} us/q, pre p50={int(np.median(pre))})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
