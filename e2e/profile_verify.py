"""Verified-path device-time profile (r3 verdict #2: >=10k QPS at 1.1M).

Separates the three candidate costs of the fused verified search so the
optimization target is measured, not guessed:
  1. amortized DEVICE time per batch/bucket (queue M dispatches, pull
     only the last — block_until_ready lies on the axon backend and
     single-shot walls are RTT-floored),
  2. host serialization ceiling (sequential wrapper calls with result
     pull = what one thread can sustain; the thread-pool QPS divides by
     this when host-bound),
  3. batch-size scaling: per-query device time at B=64/128/256 — if
     fixed per-dispatch overhead dominates, larger B is free QPS.

Reads the scale_bench build cache (e2e/build_cache/<stem>.{npz,pkl});
run AFTER a cached bench run. One JSON line per probe.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mygramdb_tpu.index.device_index import DeviceIndex  # noqa: E402
from mygramdb_tpu.storage.document_store import DocumentStore  # noqa: E402
from mygramdb_tpu.storage.device_text import DeviceTextStore  # noqa: E402
from mygramdb_tpu.utils import textproc  # noqa: E402


def load_cache(stem):
    from e2e.scale_bench import _load_build_cache
    with open(stem + ".pkl", "rb") as fh:
        meta = pickle.load(fh)
    return _load_build_cache(stem, meta["key"])


def norm(t):
    return textproc.normalize_text(t, True, "keep", True)


def grams_of(term):
    return textproc.generate_query_ngrams(norm(term), 2, 1, True)


def main() -> int:
    stem = sys.argv[1] if len(sys.argv) > 1 else "e2e/build_cache/c1mpos"
    built, frozen, sample_grams, sample_texts = load_cache(stem)

    class _PreBuilt:
        def build(self):
            return frozen

    doc_store = DocumentStore.from_frozen(_PreBuilt(), True, True, "t")
    t0 = time.time()
    idx = DeviceIndex(built, dense_df_ratio=0.005, max_dense_terms=8192)
    print(json.dumps({"probe": "upload", "secs": round(time.time() - t0, 1),
                      "detail": idx.upload_detail}), flush=True)
    t0 = time.time()
    dev_text = DeviceTextStore.from_doc_store(doc_store,
                                              idx.n_docs_capacity)
    print(json.dumps({"probe": "text_pack",
                      "secs": round(time.time() - t0, 1),
                      "rowT": int(dev_text.codepoints.shape[1])
                      if dev_text.codepoints.ndim == 2 else -1,
                      "hbm_mb": round(dev_text.memory_usage() / 1e6, 1)}),
          flush=True)

    # ---- replicate the bench's ja-CJK verified payload construction ----
    from mygramdb_tpu.ops import fused as fused_ops
    from mygramdb_tpu.ops.verify_ops import NEEDLE_CAP
    from mygramdb_tpu.utils.corpusgen import CorpusGenerator

    gen = CorpusGenerator(1_100_000, ja_ratio=0.45, seed=1234)
    ja_q = gen.sample_ja_terms(64 * 60)
    C_LIMIT = idx.candidate_buckets[-1]
    Ks = 8
    payload = []
    for term in ja_q:
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
        ndl = np.zeros((2, NEEDLE_CAP), dtype=np.uint32)
        ndl[0, :cp.size] = cp
        nlen = np.zeros(2, dtype=np.int32)
        nlen[0] = cp.size
        payload.append((int(idx.offsets32[sparse[0]]), dlen, sp_off,
                        sp_len, sp_inv, ndl, nlen, sparse[0],
                        idx.verify_cand_bucket(dlen)))
        if len(payload) >= 64 * 8:
            break
    groups = {}
    for p in payload:
        groups.setdefault(p[8], []).append(p)
    print(json.dumps({"probe": "payload",
                      "hist": {str(k): len(v)
                               for k, v in sorted(groups.items())}}),
          flush=True)

    def build_args(items, C, B):
        rep = [items[i % len(items)] for i in range(B)]
        d_off = np.asarray([p[0] for p in rep], dtype=np.int32)
        d_len = np.asarray([p[1] for p in rep], dtype=np.int32)
        sp_off = np.asarray([p[2] for p in rep], dtype=np.int32)
        sp_len = np.asarray([p[3] for p in rep], dtype=np.int32)
        sp_inv = np.asarray([p[4] for p in rep], dtype=bool)
        ndl_j = np.stack([p[5] for p in rep])
        nlen_j = np.stack([p[6] for p in rep])
        Cmax = idx._cand_bucket(int(sp_len.max()) if sp_len.size else 1)
        Kv = min(C, idx._KV_BUCKET)
        maxT = max(idx.verify_maxT(dev_text, p[7]) for p in rep)
        return (d_off, d_len, sp_off, sp_len, sp_inv, ndl_j, nlen_j,
                Cmax, Kv, maxT)

    def run_queued(args_t, C, B, M):
        """Queue M dispatches of the INNER jitted program, pull only the
        last -> amortized device+queue time per batch."""
        import jax.numpy as jnp
        (d_off, d_len, sp_off, sp_len, sp_inv, ndl_j, nlen_j,
         Cmax, Kv, maxT) = args_t
        from mygramdb_tpu.ops.fused import (_sparse_search_verify_topn_batch,
                                            _zero_idf)
        from mygramdb_tpu.ops.posting_ops import SENTINEL  # noqa: F401
        from mygramdb_tpu.ops.verify_ops import needle_cap_bucket
        idf = _zero_idf(B, ndl_j.shape[1])
        extra = jnp.zeros((1, 1), dtype=jnp.uint32)

        def once():
            return _sparse_search_verify_topn_batch(
                idx.postings, idx.bitmaps, idx.deleted,
                jnp.asarray(d_off), jnp.asarray(d_len),
                jnp.asarray(sp_off), jnp.asarray(sp_len),
                jnp.asarray(sp_inv),
                jnp.asarray(np.zeros((B, 8), dtype=np.int32)),
                jnp.asarray(np.zeros((B, 8), dtype=bool)), extra,
                dev_text.codepoints, dev_text.offsets, dev_text.lengths,
                jnp.asarray(ndl_j), jnp.asarray(nlen_j),
                jnp.asarray(idf), jnp.float32(1.2), jnp.float32(0.75),
                jnp.float32(1.0),
                C=C, Cmax=Cmax, Kv=Kv, n=128, Nn=ndl_j.shape[1],
                maxT=maxT, descending=True, score_mode=False,
                n_words=idx.n_words,
                cap=needle_cap_bucket(int(np.max(nlen_j))),
                use_dense_probes=False, check_tombstones=True,
                use_range=False, has_extra=False, pallas_tf=False)

        out = once()
        np.asarray(out[:1, :1])  # compile + settle
        t0 = time.perf_counter()
        for _ in range(M):
            out = once()
        np.asarray(out[:1, :1])
        amort = (time.perf_counter() - t0) / M
        # single-shot wall (includes RTT)
        t0 = time.perf_counter()
        out = once()
        np.asarray(out[:1, :1])
        single = time.perf_counter() - t0
        # host serialization: full-result pull per call, sequential
        t0 = time.perf_counter()
        for _ in range(4):
            np.asarray(once())
        seq = (time.perf_counter() - t0) / 4
        return amort, single, seq

    budget = float(os.environ.get("PROBE_BUDGET_S", "1500"))
    t_start = time.time()
    for C in sorted(groups):
        if time.time() - t_start > budget:
            break
        items = groups[C]
        for B in (64, 128, 256):
            if time.time() - t_start > budget:
                break
            try:
                args_t = build_args(items, C, B)
                amort, single, seq = run_queued(args_t, C, B, M=8)
                print(json.dumps({
                    "probe": "fused_verify", "C": C, "B": B,
                    "Kv": args_t[8], "maxT": args_t[9],
                    "amortized_batch_ms": round(amort * 1000, 2),
                    "single_shot_ms": round(single * 1000, 2),
                    "seq_pull_ms": round(seq * 1000, 2),
                    "amortized_per_query_us": round(amort / B * 1e6, 1),
                    "device_qps_bound": round(B / amort, 0)}),
                    flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"probe": "fused_verify", "C": C, "B": B,
                                  "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
