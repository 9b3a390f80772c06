"""Query micro-batching: one device dispatch for many connections.

The keystone of the TPU serving design (SURVEY.md §7, BASELINE north star):
instead of the reference's thread-per-request model, concurrent queries are
collected for up to ``window_us`` (or until ``max_batch``) and executed as
ONE fused device dispatch, amortizing host<->device latency across every
query in the batch.

Two program families are batched:

- **dense**: PK-sorted dense AND SEARCH -> fused (B, K) dense_search_topn.
  Grouped per (limit bucket, direction).
- **sparse**: candidate-probe queries (rarest sparse term drives) ->
  vmapped _sparse_query_batch. Grouped per (C, Cmax, Ks, Kd, limit bucket,
  direction) shape bucket so jit compiles a bounded set of variants.

Requests are padded with the AND-identity sentinel row / zero-length probe
slices. Callers block on a per-request event (they already run on the
server's worker pool).
"""

from __future__ import annotations

import contextlib
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

MAX_K = 32  # dense row bucket ceiling for batched queries

# Multi-device (virtual mesh) XLA-CPU executions deadlock when launched
# concurrently from several Python threads onto the same device set;
# serialize them process-wide. Single-device backends skip this.
_MESH_DISPATCH_LOCK = threading.Lock()


@dataclass
class _Request:
    rows: List[int]
    event: threading.Event = field(default_factory=threading.Event)
    total: int = 0
    ids: Optional[np.ndarray] = None
    error: Optional[BaseException] = None
    # sparse payload (None for dense requests)
    sparse: Optional[dict] = None
    scores: Optional[np.ndarray] = None
    # fused-verify: the match set exceeded the verify compaction width, so
    # this request's result is invalid — caller re-runs on the exact path
    clipped: bool = False
    # fused-verify: pre-verify gram-AND match count (BM25 term df source)
    pre: int = 0


class MicroBatcher:
    def __init__(self, device_index, max_batch: int = 64,
                 window_us: int = 200):
        self.idx = device_index
        self.max_batch = max(1, max_batch)
        self.window = window_us / 1e6
        self._lock = threading.Lock()
        self._queues: Dict[tuple, List[_Request]] = {}
        self.batches_executed = 0
        self.queries_batched = 0
        self.sparse_batches = 0

    # ------------------------------------------------------------------
    def _enqueue(self, key: tuple, req: _Request) -> None:
        """Requester-driven batching: the queue collects for up to the
        window; the first waiter whose window expires (or the arrival
        that fills max_batch) executes the whole batch on ITS OWN worker
        thread. No timer threads — execution on daemon timers raced other
        multi-device dispatches and is one thread pool harder to bound.
        _flush is idempotent, so concurrent waiters flushing is safe."""
        flush_now = False
        with self._lock:
            q = self._queues.setdefault(key, [])
            q.append(req)
            if len(q) >= self.max_batch:
                flush_now = True
        if flush_now:
            self._flush(key)
        # Generous overall bound: first-ever XLA compiles of a shape bucket
        # run inside the flusher and can take minutes on tunneled/1-CPU
        # hosts.
        import time as _time
        deadline = _time.monotonic() + 600
        waited = max(self.window, 0.0005)
        while not req.event.wait(timeout=waited):
            if _time.monotonic() >= deadline:
                break
            self._flush(key)
            waited = 5.0
        if req.error is not None:
            raise req.error
        if req.ids is None:
            raise TimeoutError("micro-batch execution timed out")

    def submit(self, dense_rows: List[int], limit_b: int,
               descending: bool, extra=()) -> Tuple[int, np.ndarray]:
        """Blocking submit; returns (total, top ids desc/asc, -1 padded).
        extra: tuple of device word rows AND'ed into the result — queries
        batch with peers sharing the SAME filter rows (grouped by array
        identity, e.g. every concurrent 'FILTER status = 1')."""
        if len(dense_rows) > MAX_K:
            # dropping rows would drop AND constraints (false positives);
            # callers must route >MAX_K queries to the unbatched path
            raise ValueError(
                f"micro-batch supports at most {MAX_K} dense rows, "
                f"got {len(dense_rows)}")
        req = _Request(rows=list(dense_rows), sparse={"extra": extra})
        self._enqueue(("dense", limit_b, descending,
                       tuple(id(x) for x in extra)), req)
        return req.total, req.ids

    def submit_fused_verify(self, dense_rows: List[int], needles,
                            needle_lens, text_store, C: int, limit_b: int,
                            descending: bool, score_mode: bool = False,
                            idf=None, k1: float = 1.2, b: float = 0.75,
                            avgdl: float = 1.0, nonoverlap: bool = False,
                            require_match: bool = True, extra=(),
                            vbound=None):
        """Blocking submit of a fused verified search (PK order or BM25
        score order). needles: (Nn, CAP) uint32 already padded to the Nn
        bucket. extra: shared EQ-filter word rows (grouped by identity —
        queries with the same filter value batch together). Returns
        (total, ids, scores, pre) or None when the match set exceeded the
        extraction width (caller re-runs exact)."""
        if len(dense_rows) > MAX_K:
            raise ValueError(
                f"micro-batch supports at most {MAX_K} dense rows")
        req = _Request(rows=list(dense_rows), sparse={
            "needles": needles, "nlens": needle_lens, "store": text_store,
            "idf": idf, "extra": extra,
            "vbound": C if vbound is None else int(vbound)})
        key = ("fusedv", id(text_store), C, needles.shape[0],
               limit_b, descending, score_mode, nonoverlap,
               round(k1, 6), round(b, 6), round(avgdl, 3), require_match,
               tuple(id(x) for x in extra))
        self._enqueue(key, req)
        if req.clipped:
            return None
        return req.total, req.ids, req.scores, req.pre

    def submit_fused_sparse_verify(self, d_off: int, d_len: int,
                                   sp_off, sp_len, sp_inv, dn_rows, dn_inv,
                                   needles, needle_lens, text_store,
                                   C: int, Cmax: int, limit_b: int,
                                   descending: bool, Kv: int = 0,
                                   maxT: int = 0, score_mode: bool = False,
                                   idf=None, k1: float = 1.2,
                                   b: float = 0.75, avgdl: float = 1.0,
                                   nonoverlap: bool = False,
                                   require_match: bool = True,
                                   force_probes: bool = False,
                                   extra=()):
        """Blocking submit of a sparse-driver fused verified search.
        extra: shared EQ-filter word rows (grouped by identity). Returns
        (total, ids, scores, pre) or None when the match set exceeded
        the verify compaction width Kv (caller re-runs exact)."""
        req = _Request(rows=[], sparse={
            "d_off": d_off, "d_len": d_len, "sp_off": sp_off,
            "sp_len": sp_len, "sp_inv": sp_inv, "dn_rows": dn_rows,
            "dn_inv": dn_inv, "needles": needles, "nlens": needle_lens,
            "store": text_store, "idf": idf, "extra": extra})
        Kv = Kv or min(C, 4096)
        maxT = maxT or text_store.maxT
        key = ("fusedsv", id(text_store), C, Cmax, len(sp_off),
               len(dn_rows), needles.shape[0], limit_b, descending,
               Kv, maxT, score_mode, nonoverlap,
               round(k1, 6), round(b, 6), round(avgdl, 3),
               require_match, force_probes,
               tuple(id(x) for x in extra))
        self._enqueue(key, req)
        if req.clipped:
            return None
        return req.total, req.ids, req.scores, req.pre

    def submit_positional(self, plan: dict, n: int, descending: bool,
                          score_mode: bool = False, idf: float = 0.0,
                          k1: float = 1.2, b: float = 0.75,
                          avgdl: float = 1.0, require_match: bool = True,
                          use_doc_probes: bool = False, extra=()):
        """Blocking submit of a positional verified search (anchored
        occurrence probes; ops/positional_ops.py). Queries batch with
        peers sharing the plan's shape-bucket tuple and filter identity.
        Returns (total, ids, scores, pre) — never clips."""
        req = _Request(rows=[], sparse={"plan": plan, "idf": idf,
                                        "extra": extra})
        key = ("pos", plan["C"], plan["Co"], plan["C2"], plan["Co2"],
               plan["G"], n, descending, score_mode, require_match,
               use_doc_probes, round(k1, 6), round(b, 6),
               round(avgdl, 3), tuple(id(x) for x in extra))
        self._enqueue(key, req)
        return req.total, req.ids, req.scores, req.pre

    def _execute_positional(self, q: List[_Request], key: tuple) -> None:
        from ..ops.positional_ops import positional_verify_batch
        idx = self.idx
        (_, C, Co, C2, Co2, G, n, descending, score_mode, require_match,
         use_doc_probes, k1, b_, avgdl, _eids) = key
        pp = idx.positional
        # pad to a bucketed batch width with inert plans (zero-length
        # driver slices produce count 0) so compile shapes stay bounded
        B = len(q)
        B_pad = self._pad_b(B)
        dead = {"d_off": 0, "d_len": 0, "d_base8": 0, "d_olen": 0,
                "p_off": [0] * G, "p_len": [0] * G, "p_base8": [0] * G,
                "p_olen": [0] * G, "p_delta": [0] * G,
                "p_valid": [False] * G,
                "C": C, "Co": Co, "C2": C2, "Co2": Co2, "G": G}
        plans = [r.sparse["plan"] for r in q] + [dead] * (B_pad - B)
        idf = np.zeros((B_pad, 1), dtype=np.float32)
        for i, r in enumerate(q):
            idf[i, 0] = r.sparse.get("idf") or 0.0
        extra_rows = list((q[0].sparse or {}).get("extra", ()))
        out = positional_verify_batch(
            idx.postings, pp.occ_doc8, pp.occ_pos8, idx.deleted,
            pp.doc_len_pad, plans, n, idx.n_words, descending,
            score_mode=score_mode, idf=idf, k1=k1, b=b_, avgdl=avgdl,
            require_match=require_match, use_doc_probes=use_doc_probes,
            extra=(idx._pack_extra(extra_rows) if extra_rows else None))
        if score_mode:
            pre, count, ids, scores = out
        else:
            pre, count, ids = out
            scores = None
        self.batches_executed += 1
        self.queries_batched += B
        for i, r in enumerate(q):
            r.pre = int(pre[i])
            r.total = int(count[i])
            r.ids = ids[i]
            r.scores = scores[i] if scores is not None else None
            r.event.set()

    def submit_sparse(self, d_off: int, d_len: int,
                      sp_off: List[int], sp_len: List[int],
                      sp_inv: List[bool],
                      dn_rows: List[int], dn_inv: List[bool],
                      C: int, Cmax: int, limit_b: int,
                      descending: bool, extra=()) -> Tuple[int, np.ndarray]:
        """Blocking submit of a sparse candidate-probe query. Probe arrays
        must already be padded to their Ks/Kd buckets by the caller.
        extra: shared AND-filter rows (grouped by identity, see submit)."""
        req = _Request(rows=[], sparse={
            "d_off": d_off, "d_len": d_len, "sp_off": sp_off,
            "sp_len": sp_len, "sp_inv": sp_inv, "dn_rows": dn_rows,
            "dn_inv": dn_inv, "extra": extra})
        # covered-exact shape: nothing to probe — batch with peers on the
        # probe-free program (the no-op probe stages cost real gathers)
        probe_free = (all(not l for l in sp_len)
                      and all(r == self.idx.ones_row and not i
                              for r, i in zip(dn_rows, dn_inv)))
        key = ("sparse", C, Cmax, len(sp_off), len(dn_rows),
               limit_b, descending, probe_free,
               tuple(id(x) for x in extra))
        self._enqueue(key, req)
        return req.total, req.ids

    # ------------------------------------------------------------------
    def _dispatch_guard(self):
        if getattr(self.idx, "_row_sharding", None) is not None:
            return _MESH_DISPATCH_LOCK
        return contextlib.nullcontext()

    def _flush(self, key: tuple) -> None:
        with self._lock:
            q = self._queues.pop(key, [])
        if not q:
            return
        try:
            with self._dispatch_guard():
                if key[0] == "dense":
                    self._execute_dense(q, key[1], key[2])
                elif key[0] == "fusedv":
                    self._execute_fused_verify(q, key)
                elif key[0] == "fusedsv":
                    self._execute_fused_sparse_verify(q, key)
                elif key[0] == "pos":
                    self._execute_positional(q, key)
                else:
                    self._execute_sparse(q, key)
        except BaseException as e:  # noqa: BLE001 — propagate to waiters
            for r in q:
                r.error = e
                r.event.set()

    @staticmethod
    def _pad_b(B: int) -> int:
        for b in (8, 16, 32, 64, 128, 256):
            if B <= b:
                return b
        return ((B + 255) // 256) * 256

    def _execute_dense(self, q: List[_Request], limit_b: int,
                       descending: bool) -> None:
        import jax.numpy as jnp
        from ..ops import bitmap_ops
        idx = self.idx
        B = len(q)
        K = 1
        for r in q:
            K = max(K, len(r.rows))
        K = 8 if K <= 8 else MAX_K
        B_pad = self._pad_b(B)
        rows = np.full((B_pad, K), idx.ones_row, dtype=np.int32)
        rows[B:] = idx.zeros_row  # pad lanes match nothing (see fused path)
        for i, r in enumerate(q):
            rows[i, :len(r.rows)] = r.rows
        nrows = np.full((B_pad, 1), idx.zeros_row, dtype=np.int32)
        # extra filter rows are identical across the batch (grouped by
        # identity in the queue key)
        extra_rows = list((q[0].sparse or {}).get("extra", ()))
        extra = idx._pack_extra(extra_rows)
        # fused search + top-n: one program, one dispatch per batch;
        # delta-packed uint16 transport (ONE ~(4+n)-u16-per-query pull —
        # the result pull, not device compute, bounds batched throughput
        # on tunneled backends)
        count_np, ids_np = bitmap_ops.dense_search_topn_packed(
            idx.bitmaps, jnp.asarray(rows), jnp.asarray(nrows),
            idx.deleted, extra, False, bool(extra_rows), limit_b,
            descending)
        self.batches_executed += 1
        self.queries_batched += B
        for i, r in enumerate(q):
            r.total = int(count_np[i])
            r.ids = ids_np[i]
            r.event.set()

    def _execute_fused_verify(self, q: List[_Request], key: tuple) -> None:
        import jax.numpy as jnp
        from ..ops import fused as fused_ops
        from ..ops.verify_ops import NEEDLE_CAP
        idx = self.idx
        (_, _sid, C, Nn, limit_b, descending, score_mode, nonoverlap,
         k1, b_, avgdl, require_match, _extra_ids) = key
        store = q[0].sparse["store"]
        # the text-window workspace is B*C*maxT*4 bytes; chunk the flush so
        # one dispatch never exceeds ~512MB of HBM scratch
        b_cap = max(1, (512 << 20) // max(C * store.maxT * 4, 1))
        pos = 0
        while pos < len(q):
            chunk = q[pos:pos + b_cap]
            pos += b_cap
            B = len(chunk)
            B_pad = min(self._pad_b(B), max(b_cap, 1))
            B_pad = max(B_pad, B)
            K = 8 if max(len(r.rows) for r in chunk) <= 8 else MAX_K
            rows = np.full((B_pad, K), idx.ones_row, dtype=np.int32)
            # PAD LANES (B direction) must match NOTHING: an all-ones pad
            # lane matched every doc, so it paid a full C-row gather+verify
            # of garbage per lane AND inflated the global-compaction clip
            # check (sum(min(pre, Kv)) counted n_docs per pad lane)
            rows[len(chunk):] = idx.zeros_row
            ndl = np.zeros((B_pad, Nn, NEEDLE_CAP), dtype=np.uint32)
            nlens = np.zeros((B_pad, Nn), dtype=np.int32)
            idf = np.zeros((B_pad, Nn), dtype=np.float32)
            for i, r in enumerate(chunk):
                rows[i, :len(r.rows)] = r.rows
                ndl[i] = r.sparse["needles"]
                nlens[i] = r.sparse["nlens"]
                if r.sparse.get("idf") is not None:
                    idf[i] = r.sparse["idf"]
            nrows = np.full((B_pad, 1), idx.zeros_row, dtype=np.int32)
            # filter rows are identical across the batch (grouped by key)
            extra_rows = list((q[0].sparse or {}).get("extra", ()))
            extra = idx._pack_extra(extra_rows)
            out = fused_ops.search_verify_topn_batch(
                idx.bitmaps, jnp.asarray(rows), jnp.asarray(nrows),
                idx.deleted, extra, store, C, limit_b, ndl, nlens,
                descending=descending, idf=idf, k1=k1, b=b_, avgdl=avgdl,
                score_mode=score_mode, nonoverlap=nonoverlap,
                require_match=require_match, has_extra=bool(extra_rows),
                vbound=sum(r.sparse.get("vbound", C) for r in chunk))
            pre, count, ids = out[0], out[1], out[2]
            scores = out[3] if score_mode else None
            self.batches_executed += 1
            self.queries_batched += B
            for i, r in enumerate(chunk):
                r.clipped = int(pre[i]) > C
                r.pre = int(pre[i])
                r.total = int(count[i])
                r.ids = ids[i]
                r.scores = scores[i] if scores is not None else None
                r.event.set()

    def _execute_fused_sparse_verify(self, q: List[_Request],
                                     key: tuple) -> None:
        from ..ops import fused as fused_ops
        from ..ops.verify_ops import NEEDLE_CAP
        idx = self.idx
        (_, _sid, C, Cmax, Ks, Kd, Nn, limit_b, descending, Kv, maxT,
         score_mode, nonoverlap, k1, b_, avgdl, require_match,
         force_probes, _extra_ids) = key
        store = q[0].sparse["store"]
        # compaction (Kv) bounds the text workspace; the candidate probe
        # matrix (C x Cmax compares) bounds the rest
        b_cap = max(1, (512 << 20) // max(Kv * maxT * 4, 1))
        pos = 0
        while pos < len(q):
            chunk = q[pos:pos + b_cap]
            pos += b_cap
            B = len(chunk)
            d_off = np.zeros(B, dtype=np.int32)
            d_len = np.zeros(B, dtype=np.int32)
            sp_off = np.zeros((B, Ks), dtype=np.int32)
            sp_len = np.zeros((B, Ks), dtype=np.int32)
            sp_inv = np.ones((B, Ks), dtype=bool)
            dn_rows = np.full((B, Kd), idx.ones_row, dtype=np.int32)
            dn_inv = np.zeros((B, Kd), dtype=bool)
            ndl = np.zeros((B, Nn, NEEDLE_CAP), dtype=np.uint32)
            nlens = np.zeros((B, Nn), dtype=np.int32)
            idf = np.zeros((B, Nn), dtype=np.float32)
            for i, r in enumerate(chunk):
                s = r.sparse
                d_off[i] = s["d_off"]
                d_len[i] = s["d_len"]
                sp_off[i] = s["sp_off"]
                sp_len[i] = s["sp_len"]
                sp_inv[i] = s["sp_inv"]
                dn_rows[i] = s["dn_rows"]
                dn_inv[i] = s["dn_inv"]
                ndl[i] = s["needles"]
                nlens[i] = s["nlens"]
                if s.get("idf") is not None:
                    idf[i] = s["idf"]
            extra_rows = list((q[0].sparse or {}).get("extra", ()))
            out = fused_ops.sparse_search_verify_topn_batch(
                idx.postings, idx.bitmaps, idx.deleted,
                d_off, d_len, sp_off, sp_len, sp_inv, dn_rows, dn_inv,
                store, C, Cmax, limit_b, ndl, nlens, idx.n_words,
                descending, Kv=Kv, maxT=maxT, idf=idf, k1=k1, b=b_,
                avgdl=avgdl, score_mode=score_mode, nonoverlap=nonoverlap,
                # needles cover every gram, so the verify subsumes probes —
                # unless the caller needs pre = exact AND count (score df)
                use_dense_probes=force_probes,
                require_match=require_match,
                extra=(idx._pack_extra(extra_rows) if extra_rows
                       else None))
            pre, count, ids = out[0], out[1], out[2]
            scores = out[3] if score_mode else None
            self.batches_executed += 1
            self.queries_batched += B
            for i, r in enumerate(chunk):
                r.clipped = int(pre[i]) > Kv
                r.pre = int(pre[i])
                r.total = int(count[i])
                r.ids = ids[i]
                r.scores = scores[i] if scores is not None else None
                r.event.set()

    def _execute_sparse(self, q: List[_Request], key: tuple) -> None:
        import jax.numpy as jnp
        from ..index.device_index import _sparse_query_batch
        idx = self.idx
        _, C, Cmax, Ks, Kd, limit_b, descending, probe_free, _eids = key
        B = len(q)
        B_pad = self._pad_b(B)
        d_off = np.zeros(B_pad, dtype=np.int32)
        d_len = np.zeros(B_pad, dtype=np.int32)   # len 0 -> all-SENTINEL
        sp_off = np.zeros((B_pad, Ks), dtype=np.int32)
        sp_len = np.zeros((B_pad, Ks), dtype=np.int32)
        sp_inv = np.ones((B_pad, Ks), dtype=bool)  # len0+invert = all-true
        dn_rows = np.full((B_pad, Kd), idx.ones_row, dtype=np.int32)
        dn_inv = np.zeros((B_pad, Kd), dtype=bool)
        for i, r in enumerate(q):
            s = r.sparse
            d_off[i] = s["d_off"]
            d_len[i] = s["d_len"]
            sp_off[i] = s["sp_off"]
            sp_len[i] = s["sp_len"]
            sp_inv[i] = s["sp_inv"]
            dn_rows[i] = s["dn_rows"]
            dn_inv[i] = s["dn_inv"]
        from ..ops import runtime as _rt
        _rt.dispatches.bump()
        extra_rows = list((q[0].sparse or {}).get("extra", ()))
        extra = idx._pack_extra(extra_rows)
        count, ids = _sparse_query_batch(
            idx.postings, idx.bitmaps, idx.deleted,
            jnp.asarray(d_off), jnp.asarray(d_len),
            jnp.asarray(sp_off), jnp.asarray(sp_len), jnp.asarray(sp_inv),
            jnp.asarray(dn_rows), jnp.asarray(dn_inv), extra,
            C=C, Cmax=Cmax, limit_b=limit_b, descending=descending,
            n_words=idx.n_words, has_extra=bool(extra_rows),
            probe_free=probe_free)
        count_np = np.asarray(count)
        ids_np = np.asarray(ids)
        self.batches_executed += 1
        self.sparse_batches += 1
        self.queries_batched += B
        for i, r in enumerate(q):
            r.total = int(count_np[i])
            r.ids = ids_np[i]
            r.event.set()

    # ------------------------------------------------------------------
    def stats(self) -> Dict[str, int]:
        return {"batches_executed": self.batches_executed,
                "queries_batched": self.queries_batched,
                "sparse_batches": self.sparse_batches,
                "avg_batch": (self.queries_batched //
                              max(self.batches_executed, 1))}
