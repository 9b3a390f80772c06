"""Upload-path A/B probes (r3 verdict #8: pipelined upload).

Measures, on the real TPU over the tunnel:
  1. h2d bandwidth: one big device_put vs chunked puts from a small
     thread pool (does concurrency hide host-side staging?).
  2. device-side derived-tensor builds, to stop SHIPPING derived tensors:
     a. dense bitmap matrix from postings via flat scatter-add
        (replaces host np.bitwise_or.at + shipping V_dense x W words)
     b. occ_doc expansion from postings + occ_cnt via repeat + scatter
        (replaces the host page-fault storm + shipping 4 B/occurrence)
     c. postings u16lo/u8hi wire split + device recombine (25% wire cut)

block_until_ready() lies on the axon backend: device time is measured
amortized (queue M dispatches, np.asarray only the last, divide by M) and
transfers are timed to the first element's readback.

Usage: python e2e/profile_upload.py [--docs-scale small|large]
Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(arr):
    """Force completion: pull one element (ordered after the transfer)."""
    np.asarray(jax.device_get(arr.ravel()[:1]))


def probe_put_bandwidth():
    """One 256 MB put vs 8x32MB chunked (serial and 4-thread pool)."""
    nbytes = 256 << 20
    big = np.random.default_rng(0).integers(
        0, 2**31, size=nbytes // 4, dtype=np.int32)
    out = {}
    t0 = time.time()
    d = jax.device_put(big)
    _sync(d)
    out["single_256mb_s"] = round(time.time() - t0, 2)
    del d
    chunks = big.reshape(8, -1)
    t0 = time.time()
    ds = [jax.device_put(c) for c in chunks]
    for d in ds:
        _sync(d)
    out["chunked_serial_s"] = round(time.time() - t0, 2)
    del ds
    t0 = time.time()
    with ThreadPoolExecutor(4) as ex:
        ds = list(ex.map(jax.device_put, chunks))
    for d in ds:
        _sync(d)
    out["chunked_4thread_s"] = round(time.time() - t0, 2)
    out["mb"] = nbytes >> 20
    del ds, big
    return out


def probe_bitmap_scatter():
    """Dense bitmap build on device: scatter-add bits of 60M postings
    into a (928, 34376->pad) u32 matrix (the 1.1M-doc dense shape)."""
    rng = np.random.default_rng(1)
    n_rows, n_words = 928, 34432
    P = 60_000_000
    # synthetic: postings already on device (they ship for the CSR anyway)
    post = rng.integers(1, n_words * 32, size=P, dtype=np.int32)
    row_of = rng.integers(0, n_rows, size=P, dtype=np.int32)
    t0 = time.time()
    post_d = jax.device_put(post)
    row_d = jax.device_put(row_of)
    _sync(post_d)
    _sync(row_d)
    up_s = time.time() - t0

    @jax.jit
    def build(post, rows):
        word = post >> 5
        bit = jnp.left_shift(jnp.uint32(1),
                             jnp.bitwise_and(post, 31).astype(jnp.uint32))
        flat = rows.astype(jnp.int64) * n_words + word.astype(jnp.int64)
        bm = jnp.zeros((n_rows * n_words,), dtype=jnp.uint32)
        # same (row, word) from two docs -> different bits -> add == or;
        # duplicate (row, doc) pairs never occur in a CSR
        bm = bm.at[flat].add(bit)
        return bm.reshape(n_rows, n_words)

    t0 = time.time()
    bm = build(post_d, row_d)
    _sync(bm)
    first_s = time.time() - t0
    M = 3
    t0 = time.time()
    for _ in range(M):
        bm = build(post_d, row_d)
    _sync(bm)
    amort_s = (time.time() - t0) / M
    return {"postings": P, "upload_s": round(up_s, 2),
            "first_call_s": round(first_s, 2),
            "amortized_s": round(amort_s, 2)}


def probe_occ_doc_expand():
    """occ_doc on device: repeat postings by occ_cnt into the aligned
    regions (1.1M-doc shape: ~112M postings, ~130M occurrences)."""
    rng = np.random.default_rng(2)
    P = 20_000_000           # scaled 1/5 to bound probe time; linear cost
    cnt = rng.integers(1, 3, size=P).astype(np.int32)
    O = int(cnt.sum())
    post = rng.integers(1, 1_100_000, size=P, dtype=np.int32)
    start = (np.cumsum(cnt, dtype=np.int64) - cnt)  # unaligned; fine for
    # the probe: the real layout adds per-term alignment to `start`
    t0 = time.time()
    post_d = jax.device_put(post)
    cnt_d = jax.device_put(cnt)
    start_d = jax.device_put(start.astype(np.int32))
    _sync(post_d); _sync(cnt_d); _sync(start_d)
    up_s = time.time() - t0
    OA = ((O + 127) // 128) * 128

    @jax.jit
    def expand(post, cnt, start):
        run = jnp.cumsum(cnt) - cnt    # unaligned occ prefix per posting
        # owner-of-cell WITHOUT searchsorted (data-dependent gather loops
        # are catastrophic on TPU): scatter a 1 at each posting's first
        # occurrence cell, cumsum -> 1-based owner index. cnt=0 postings
        # collide on the next posting's start; the add accumulates and
        # the cumsum skips them — exactly right.
        ind = jnp.zeros((O,), dtype=jnp.int32).at[run].add(
            jnp.ones((P,), dtype=jnp.int32), mode="drop")
        owner = jnp.cumsum(ind) - 1
        tot = jnp.arange(O, dtype=jnp.int32)
        within = tot - run[owner]
        idx = start[owner] + within
        odoc = jnp.full((OA,), 2**31 - 1, dtype=jnp.int32)
        return odoc.at[idx].set(post[owner])

    t0 = time.time()
    od = expand(post_d, cnt_d, start_d)
    _sync(od)
    first_s = time.time() - t0
    M = 3
    t0 = time.time()
    for _ in range(M):
        od = expand(post_d, cnt_d, start_d)
    _sync(od)
    amort_s = (time.time() - t0) / M
    return {"postings": P, "occ": O, "upload_s": round(up_s, 2),
            "first_call_s": round(first_s, 2),
            "amortized_s": round(amort_s, 2)}


def probe_split_recombine():
    """postings u16lo + u8hi wire split -> device recombine to int32."""
    rng = np.random.default_rng(3)
    P = 112_000_000
    post = rng.integers(1, 1_100_000, size=P, dtype=np.int32)
    lo = (post & 0xFFFF).astype(np.uint16)
    hi = (post >> 16).astype(np.uint8)
    t0 = time.time()
    lo_d = jax.device_put(lo)
    hi_d = jax.device_put(hi)
    _sync(lo_d); _sync(hi_d)
    up_s = time.time() - t0

    @jax.jit
    def recombine(lo, hi):
        return (hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32)

    t0 = time.time()
    p = recombine(lo_d, hi_d)
    _sync(p)
    first_s = time.time() - t0
    M = 3
    t0 = time.time()
    for _ in range(M):
        p = recombine(lo_d, hi_d)
    _sync(p)
    amort_s = (time.time() - t0) / M
    ok = bool(np.asarray(jax.device_get(p[:1000]) ==
                         post[:1000]).all())
    # reference: raw int32 put of the same postings
    t0 = time.time()
    d32 = jax.device_put(post)
    _sync(d32)
    raw_s = time.time() - t0
    return {"postings": P, "split_upload_s": round(up_s, 2),
            "raw_int32_upload_s": round(raw_s, 2),
            "recombine_first_s": round(first_s, 2),
            "recombine_amortized_s": round(amort_s, 2), "parity": ok}


def main():
    budget = float(os.environ.get("PROBE_BUDGET_S", "900"))
    t_start = time.time()
    probes = [("put_bandwidth", probe_put_bandwidth),
              ("split_recombine", probe_split_recombine),
              ("bitmap_scatter", probe_bitmap_scatter),
              ("occ_doc_expand", probe_occ_doc_expand)]
    for name, fn in probes:
        if time.time() - t_start > budget:
            print(json.dumps({"probe": name, "skipped": "budget"}))
            continue
        try:
            r = fn()
            print(json.dumps({"probe": name, **r}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
