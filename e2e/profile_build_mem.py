"""Host-memory breakdown of the scale-bench build path (CPU-only).

Replicates e2e/scale_bench.py's build phase (IndexBuilder + FrozenDocBuilder
over the synthetic EN+JA corpus) and reports peak RSS plus per-structure
byte attributions, so host-memory work (VERDICT r2 #3: <= 2.5 GB per 1M
docs) can be profiled without the TPU.

Usage: JAX_PLATFORMS=cpu python e2e/profile_build_mem.py --docs 400000
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only by design (host-memory profiling): the env var alone does not
# stick on the axon platform — force it through the config API
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def cur_rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return -1.0


def deep_np_bytes(obj, seen) -> int:
    """Crude recursive numpy-array byte counter over attributes/containers."""
    oid = id(obj)
    if oid in seen:
        return 0
    seen.add(oid)
    if isinstance(obj, np.ndarray):
        return obj.nbytes
    total = 0
    if isinstance(obj, dict):
        for v in obj.values():
            total += deep_np_bytes(v, seen)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            total += deep_np_bytes(v, seen)
    elif hasattr(obj, "__dict__"):
        for v in vars(obj).values():
            total += deep_np_bytes(v, seen)
    elif hasattr(obj, "__slots__"):
        for s in obj.__slots__:
            total += deep_np_bytes(getattr(obj, s, None), seen)
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--ja-ratio", type=float, default=0.45)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--verify", action="store_true", default=True)
    args = ap.parse_args()

    from mygramdb_tpu.index.builder import IndexBuilder
    from mygramdb_tpu.storage.document_store import DocumentStore
    from mygramdb_tpu.storage.frozen_docs import FrozenDocBuilder
    from mygramdb_tpu.utils import textproc
    from mygramdb_tpu.utils.corpusgen import CorpusGenerator

    gen = CorpusGenerator(args.docs, ja_ratio=args.ja_ratio, seed=args.seed)

    def norm(t):
        return textproc.normalize_text(t, True, "keep", True)

    print(f"# start rss={cur_rss_mb():.0f} MB", file=sys.stderr)
    b = IndexBuilder(ngram_size=2, kanji_ngram_size=1,
                     cross_boundary_ngrams=True)
    fb = FrozenDocBuilder(store_texts=args.verify)
    t0 = time.time()
    n_done = 0
    for batch in gen.batches(10_000):
        normed = [(did, norm(text)) for did, text in batch]
        b.add_batch(normed)
        fb.append([str(did) for did, _ in normed],
                  [nt for _, nt in normed] if args.verify else
                  [""] * len(normed))
        n_done += len(batch)
        if n_done % 100_000 == 0:
            print(f"# {n_done} docs rss={cur_rss_mb():.0f} MB "
                  f"({n_done/(time.time()-t0):.0f} docs/s)", file=sys.stderr)
    shred_secs = time.time() - t0
    rss_after_loop = cur_rss_mb()

    t0 = time.time()
    built = b.finalize()
    fin_secs = time.time() - t0
    rss_after_finalize = cur_rss_mb()

    t0 = time.time()
    doc_store = DocumentStore.from_frozen(fb, args.verify, True,
                                          str(args.docs))
    ds_secs = time.time() - t0
    rss_after_docstore = cur_rss_mb()

    per1m = 1e6 / args.docs
    report = {
        "docs": args.docs,
        "shred_secs": round(shred_secs, 1),
        "finalize_secs": round(fin_secs, 1),
        "docstore_secs": round(ds_secs, 1),
        "docs_per_sec": round(args.docs / (shred_secs + fin_secs), 1),
        "rss_after_loop_mb": round(rss_after_loop, 1),
        "rss_after_finalize_mb": round(rss_after_finalize, 1),
        "rss_after_docstore_mb": round(rss_after_docstore, 1),
        "peak_rss_mb": round(rss_mb(), 1),
        "peak_per_1m_mb": round(rss_mb() * per1m, 1),
    }
    # structure attribution
    seen: set = set()
    report["bytes_postings_mb"] = round(built.postings.nbytes / 1e6, 1)
    report["bytes_built_np_mb"] = round(deep_np_bytes(built, seen) / 1e6, 1)
    seen2: set = set()
    report["bytes_docstore_np_mb"] = round(
        deep_np_bytes(doc_store, seen2) / 1e6, 1)
    td = built.term_dict
    report["n_terms"] = built.n_terms
    try:
        import sys as _s
        report["term_dict_py_mb"] = round(sum(
            _s.getsizeof(k) for k in getattr(td, "_strings", [])) / 1e6, 1)
    except Exception:
        pass
    import json
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
