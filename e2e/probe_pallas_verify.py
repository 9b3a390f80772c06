"""Bounded real-TPU lowering + parity probe for the fused gather+TF
Pallas kernels (verify_ops.tf_rows_pallas / tf_rows_flat_pallas).

Run this BEFORE burning a full A/B: a mosaic lowering regression
otherwise only surfaces minutes into a scale run as a silent XLA
fallback. Tiny shapes, one compile each, parity vs interpret mode.

    timeout 900 python e2e/probe_pallas_verify.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from mygramdb_tpu.ops.verify_ops import (
        NEEDLE_CAP, cast_needles_i32, tf_rows_pallas, tf_rows_flat_pallas)

    devs = jax.devices()
    print(f"devices: {devs}", flush=True)

    rng = np.random.default_rng(7)
    # rowT must be a 128 multiple (store contract; HBM lane tiling)
    N, rowT = 64, 256
    Kv, B, Nn, cap = 32, 2, 2, NEEDLE_CAP
    M = B * Kv
    sent = 0xFFFF
    lens = rng.integers(4, rowT - cap, size=N).astype(np.int32)
    padded = np.full((N, rowT), sent, dtype=np.uint16)
    for i in range(N):
        padded[i, :lens[i]] = rng.integers(1, 400, size=lens[i])
    ids = rng.integers(0, N, size=M).astype(np.int32)
    needles = np.zeros((B, Nn, cap), dtype=np.uint32)
    nlen = np.zeros((B, Nn), dtype=np.int32)
    for bq in range(B):
        for j in range(Nn):
            L = int(rng.integers(1, 4))
            src = padded[ids[bq * Kv + j], :4].astype(np.uint32)
            needles[bq, j, :L] = src[:L]
            nlen[bq, j] = L
    ndl = cast_needles_i32(jnp.asarray(needles), jnp.uint16, cap)
    nlenj = jnp.asarray(nlen)

    only = sys.argv[1] if len(sys.argv) > 1 else ""
    ok = True
    cases = ([(False, 0), (True, 0), (True, 128)]
             if only in ("", "padded") else [])
    for use_range, width in cases:
        t0 = time.time()
        ref = np.asarray(tf_rows_pallas(
            jnp.asarray(padded), jnp.asarray(ids), ndl, nlenj, Kv=Kv,
            Nn=Nn, cap=cap, use_range=use_range, width=width,
            interpret=True))
        got = np.asarray(tf_rows_pallas(
            jnp.asarray(padded), jnp.asarray(ids), ndl, nlenj, Kv=Kv,
            Nn=Nn, cap=cap, use_range=use_range, width=width,
            interpret=False))
        match = bool((ref == got).all())
        ok &= match
        print(f"tf_rows_pallas use_range={use_range} width={width}: "
              f"parity={match} ({time.time() - t0:.1f}s)", flush=True)

    # flat pack: concatenated codepoints + per-doc offsets, with the
    # gather-pad tail the kernel's fixed-width window DMAs read past end
    win = 128
    off = np.zeros(N, dtype=np.int32)
    pos = 0
    flat_parts = []
    for i in range(N):
        off[i] = pos
        flat_parts.append(padded[i, :lens[i]])
        pos += lens[i]
    # tail covers the kernel's group reads + pads the pack to 1024k cells
    tail = ((1023 + win + cap + 1023) // 1024) * 1024
    tail += -(pos + tail) % 1024
    flat = np.concatenate(flat_parts + [
        np.full(tail, sent, dtype=np.uint16)])
    for use_range in (False, True) if only in ("", "flat") else ():
        t0 = time.time()
        oi = off[ids]
        ref = np.asarray(tf_rows_flat_pallas(
            jnp.asarray(flat), jnp.asarray(oi >> 10),
            jnp.asarray(oi & 1023),
            jnp.asarray(lens[ids]), ndl, nlenj, Kv=Kv, Nn=Nn, cap=cap,
            win=win, use_range=use_range, interpret=True))
        got = np.asarray(tf_rows_flat_pallas(
            jnp.asarray(flat), jnp.asarray(oi >> 10),
            jnp.asarray(oi & 1023),
            jnp.asarray(lens[ids]), ndl, nlenj, Kv=Kv, Nn=Nn, cap=cap,
            win=win, use_range=use_range, interpret=False))
        match = bool((ref == got).all())
        ok &= match
        print(f"tf_rows_flat_pallas use_range={use_range}: parity={match} "
              f"({time.time() - t0:.1f}s)", flush=True)

    print(f"PROBE {'OK' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
