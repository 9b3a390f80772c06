"""Same-process interleaved A/B of the fused-verify text-TF kernels.

The round-3 pallas-vs-xla verified-path comparison came from three
SEPARATE full bench runs whose tunnel weather differed wildly (upload
93 s vs 228 s vs 476 s for the identical corpus), so the recorded QPS
gap (5582 xla vs 4547 pallas at 1.1M) may be weather, not kernels.
This probe builds the index ONCE and alternates short measurement
rounds xla/pallas/xla/pallas..., so both kernels see the same weather
within each adjacent pair; medians across rounds cancel drift.

Usage:
    python e2e/ab_verify_kernels.py --docs 1100000 --rounds 4

Prints one JSON line: per-bucket, per-mode round QPS lists + medians.
TPU-resident; single-tenant device — kill other TPU processes first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_100_000)
    ap.add_argument("--ja-ratio", type=float, default=0.45)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--threads", type=int, default=48)
    ap.add_argument("--rounds", type=int, default=4,
                    help="measurement rounds per mode (interleaved)")
    ap.add_argument("--batches-per-round", type=int, default=96)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax.numpy as jnp
    from mygramdb_tpu.index.builder import IndexBuilder
    from mygramdb_tpu.index.device_index import DeviceIndex
    from mygramdb_tpu.ops import fused as fused_ops
    from mygramdb_tpu.ops.verify_ops import NEEDLE_CAP
    from mygramdb_tpu.storage.device_text import DeviceTextStore
    from mygramdb_tpu.storage.document_store import DocumentStore
    from mygramdb_tpu.storage.frozen_docs import FrozenDocBuilder
    from mygramdb_tpu.utils import textproc
    from mygramdb_tpu.utils.corpusgen import CorpusGenerator

    gen = CorpusGenerator(args.docs, ja_ratio=args.ja_ratio, seed=args.seed)

    def norm(t):
        return textproc.normalize_text(t, True, "keep", True)

    b = IndexBuilder(ngram_size=2, kanji_ngram_size=1,
                     cross_boundary_ngrams=True)
    fb = FrozenDocBuilder(store_texts=True)
    t0 = time.time()
    n_done = 0
    for batch in gen.batches(10_000):
        normed = [(did, norm(text)) for did, text in batch]
        b.add_batch(normed)
        fb.append([str(did) for did, _ in normed], [nt for _, nt in normed])
        n_done += len(batch)
        if n_done % 200_000 == 0:
            print(f"# built {n_done}/{args.docs}", file=sys.stderr)
    built = b.finalize()
    doc_store = DocumentStore.from_frozen(fb, True, True, str(args.docs))
    build_secs = time.time() - t0
    t0 = time.time()
    idx = DeviceIndex(built, dense_df_ratio=0.005, max_dense_terms=8192)
    dev_text = DeviceTextStore.from_doc_store(doc_store,
                                              idx.n_docs_capacity)
    upload_secs = time.time() - t0

    def grams_of(term):
        return textproc.generate_query_ngrams(norm(term), 2, 1, True)

    # assemble sparse-driver payloads exactly like scale_bench --verify
    B = 64
    Ks, Kd = 8, 8
    C_LIMIT = idx.candidate_buckets[-1]
    payload = []
    for term in gen.sample_ja_terms(B * 60):
        g = sorted(set(grams_of(term)))
        tids = [built.term_dict.get(x) for x in g]
        if any(t is None for t in tids):
            continue
        dense, sparse = idx.classify(tids)
        if not sparse:
            continue
        sparse = sorted(sparse, key=lambda t: int(idx.lengths[t]))
        dlen = int(idx.lengths[sparse[0]])
        if dlen == 0 or idx.verify_cand_bucket(dlen) > C_LIMIT:
            continue
        cp = np.frombuffer(term.encode("utf-32-le"), dtype=np.uint32)
        if cp.size > NEEDLE_CAP:
            continue
        sp_off = [int(idx.offsets32[t]) for t in sparse[1:]]
        sp_len = [int(idx.lengths[t]) for t in sparse[1:]]
        sp_inv = [False] * len(sp_off)
        while len(sp_off) < Ks:
            sp_off.append(0); sp_len.append(0); sp_inv.append(True)
        dn = list(dense)
        dn_inv = [False] * len(dn)
        while len(dn) < Kd:
            dn.append(idx.ones_row); dn_inv.append(False)
        ndl = np.zeros((2, NEEDLE_CAP), dtype=np.uint32)
        ndl[0, :cp.size] = cp
        nlen = np.zeros(2, dtype=np.int32)
        nlen[0] = cp.size
        payload.append((int(idx.offsets32[sparse[0]]), dlen, sp_off,
                        sp_len, sp_inv, dn, dn_inv, ndl, nlen,
                        sparse[0], idx.verify_cand_bucket(dlen)))
        if len(payload) == B * 8:
            break

    groups = {}
    for p in payload:
        groups.setdefault(p[10], []).append(p)

    def mk_vstep(items, C):
        rep = [items[i % len(items)] for i in range(B)]
        d_off = np.asarray([p[0] for p in rep], dtype=np.int32)
        d_len = np.asarray([p[1] for p in rep], dtype=np.int32)
        sp_off = np.asarray([p[2] for p in rep], dtype=np.int32)
        sp_len = np.asarray([p[3] for p in rep], dtype=np.int32)
        sp_inv = np.asarray([p[4] for p in rep], dtype=bool)
        dn_rows = np.asarray([p[5] for p in rep], dtype=np.int32)
        dn_inv = np.asarray([p[6] for p in rep], dtype=bool)
        ndl_j = np.stack([p[7] for p in rep])
        nlen_j = np.stack([p[8] for p in rep])
        Cmax = idx._cand_bucket(int(sp_len.max()) if sp_len.size else 1)
        Kv = min(C, idx._KV_BUCKET)
        maxT = max(idx.verify_maxT(dev_text, p[9]) for p in rep)

        def vstep(_):
            return fused_ops.sparse_search_verify_topn_batch(
                idx.postings, idx.bitmaps, idx.deleted,
                d_off, d_len, sp_off, sp_len, sp_inv, dn_rows, dn_inv,
                dev_text, C, Cmax, 128, ndl_j, nlen_j, idx.n_words,
                Kv=Kv, maxT=maxT, use_dense_probes=False)
        return vstep

    vsteps = [mk_vstep(items, Cb) for Cb, items in sorted(groups.items())]
    if not vsteps:
        print(json.dumps({"error": "no qualifying queries"}))
        return 1

    def set_mode(mode: str):
        if mode == "pallas":
            os.environ.pop("MYGRAM_DISABLE_PALLAS_VERIFY", None)
            fused_ops._pallas_tf_state.enabled = True
        else:
            os.environ["MYGRAM_DISABLE_PALLAS_VERIFY"] = "1"

    # compile+warm both modes up front so rounds measure steady state
    for mode in ("xla", "pallas"):
        set_mode(mode)
        for v in vsteps:
            v(0); v(0)
        print(f"# warmed {mode}", file=sys.stderr)

    ex = ThreadPoolExecutor(args.threads)
    results = {"xla": [], "pallas": []}
    lat = {"xla": [], "pallas": []}
    nb = args.batches_per_round
    order = ["xla", "pallas"] * args.rounds
    for mode in order:
        set_mode(mode)
        # single-flight batch latency (median of 5, round-robin buckets)
        ls = []
        for i in range(5):
            t0 = time.perf_counter()
            vsteps[i % len(vsteps)](i)
            ls.append(time.perf_counter() - t0)
        lat[mode].append(sorted(ls)[2] * 1000)
        # concurrent throughput
        t0 = time.perf_counter()
        list(ex.map(lambda i: vsteps[i % len(vsteps)](i), range(nb)))
        wall = time.perf_counter() - t0
        results[mode].append(round(nb * B / wall, 1))
        print(f"# {mode}: {results[mode][-1]} qps", file=sys.stderr)
    ex.shutdown(wait=False)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    out = {
        "metric": "verified_ab_qps",
        "docs": args.docs,
        "rounds": {m: results[m] for m in results},
        "qps_median": {m: med(results[m]) for m in results},
        "batch_ms_median": {m: round(med(lat[m]), 2) for m in lat},
        "buckets": sorted(groups),
        "n_queries": len(payload),
        "build_secs": round(build_secs, 1),
        "upload_secs": round(upload_secs, 1),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
