"""Validate + time the Pallas slice gather and compaction pieces on TPU.

Usage: python -u e2e/profile_gather.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, warm=2, iters=6):
    import jax
    for _ in range(warm):
        r = fn()
    jax.block_until_ready(r)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return lat[len(lat) // 2] * 1000


def main():
    import jax
    import jax.numpy as jnp
    import functools
    from mygramdb_tpu.ops.posting_ops import (
        SENTINEL, SLICE_GATHER_PAD, _gather_slices_jnp,
        _gather_slices_scan as _gather_slices_pallas, pad_postings)

    rng = np.random.default_rng(0)
    P = 50_000_000
    post_np = np.sort(rng.integers(1, 1_100_000, size=P)).astype(np.int32)
    post = jax.device_put(pad_postings(post_np))
    print(f"# backend={jax.default_backend()}", flush=True)

    B, Ks, C, Cmax = 64, 8, 4096, 16384
    offs = rng.integers(0, P - Cmax, size=B * Ks).astype(np.int32)
    lens = np.full(B * Ks, 9000, dtype=np.int32)
    offs_j, lens_j = jnp.asarray(offs), jnp.asarray(lens)

    # correctness first
    got = np.asarray(_gather_slices_pallas(post, offs_j, lens_j, Cmax))
    want = np.asarray(_gather_slices_jnp(post, offs_j, lens_j, Cmax))
    assert np.array_equal(got, want), "pallas slice gather mismatch"
    print("pallas slice gather parity OK", flush=True)

    t = timeit(lambda: _gather_slices_pallas(post, offs_j, lens_j, Cmax))
    gb = B * Ks * Cmax * 4 / 1e9
    print(f"slice gather pallas (BKs x Cmax): {t:8.2f} ms "
          f"[{gb:.2f} GB -> {gb/(t/1e3):.0f} GB/s]", flush=True)
    t = timeit(lambda: _gather_slices_jnp(post, offs_j, lens_j, Cmax))
    print(f"slice gather jnp    (BKs x Cmax): {t:8.2f} ms", flush=True)

    # compaction pieces at (B, C)
    mask = jnp.asarray((rng.random((B, C)) < 0.15))
    cands = jnp.asarray(rng.integers(0, 1 << 20, size=(B, C)).astype(np.int32))

    @jax.jit
    def just_cumsum(m):
        return jnp.cumsum(m.astype(jnp.int32), axis=-1)
    print(f"cumsum (B x C):                   {timeit(lambda: just_cumsum(mask)):8.2f} ms", flush=True)

    @jax.jit
    def scatter_compact(cands, m):
        def one(cand, mm):
            rank = jnp.cumsum(mm.astype(jnp.int32)) - 1
            idx = jnp.where(mm & (rank < 2048), rank, 2048)
            sel = jnp.full((2049,), SENTINEL, dtype=jnp.int32)
            return sel.at[idx].set(cand, mode="drop")[:2048]
        return jax.vmap(one)(cands, m)
    print(f"scatter compact:                  {timeit(lambda: scatter_compact(cands, mask)):8.2f} ms", flush=True)

    @jax.jit
    def topk_compact(cands, m):
        def one(cand, mm):
            keys = jnp.where(mm, -cand, jnp.int32(-(2 ** 31) + 1))
            vals, _ = jax.lax.top_k(keys, 2048)
            return jnp.where(vals > -(2 ** 31) + 1, -vals, SENTINEL)
        return jax.vmap(one)(cands, m)
    print(f"top_k compact:                    {timeit(lambda: topk_compact(cands, mask)):8.2f} ms", flush=True)

    # row gather via pallas scalar-prefetch ids
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    N, rowT = 1_130_496, 1024
    padded = jax.device_put(
        rng.integers(0, 60000, size=(N, rowT)).astype(np.uint16))
    R = B * 2048
    ids = jnp.asarray(rng.integers(0, N, size=R).astype(np.int32))

    def row_kern(ids_ref, mat_ref, out_ref):
        out_ref[...] = mat_ref[...]

    @jax.jit
    def rows_pallas(padded, ids):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R,),
            in_specs=[pl.BlockSpec((1, rowT),
                                   lambda i, ids_ref: (ids_ref[i], 0))],
            out_specs=pl.BlockSpec((1, rowT), lambda i, ids_ref: (i, 0)),
        )
        return pl.pallas_call(
            row_kern,
            out_shape=jax.ShapeDtypeStruct((R, rowT), jnp.uint16),
            grid_spec=grid_spec)(ids, padded)

    got = np.asarray(rows_pallas(padded, ids)[:100])
    want = np.asarray(padded)[np.asarray(ids)[:100]]
    assert np.array_equal(got, want), "pallas row gather mismatch"
    t = timeit(lambda: rows_pallas(padded, ids))
    gb = R * rowT * 2 / 1e9
    print(f"row gather pallas (R x rowT):     {t:8.2f} ms "
          f"[{gb:.2f} GB -> {gb/(t/1e3):.0f} GB/s]", flush=True)

    @jax.jit
    def rows_jnp(padded, ids):
        return padded[ids]
    t = timeit(lambda: rows_jnp(padded, ids))
    print(f"row gather jnp:                   {t:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
