"""Query micro-batching: one device dispatch for many connections.

The keystone of the TPU serving design (SURVEY.md §7, BASELINE north star):
instead of the reference's thread-per-request model, concurrent PK-sorted
dense SEARCH queries are collected for up to ``window_us`` (or until
``max_batch``) and executed as ONE fused (B, K) dense_query + top-k
dispatch, amortizing host<->device latency across every query in the batch.

Requests are grouped per (limit bucket, descending) program; rows are
padded with the AND-identity sentinel row. Callers block on a per-request
future (they already run on the server's worker pool).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

MAX_K = 32  # dense row bucket ceiling for batched queries


@dataclass
class _Request:
    rows: List[int]
    event: threading.Event = field(default_factory=threading.Event)
    total: int = 0
    ids: Optional[np.ndarray] = None
    error: Optional[BaseException] = None


class MicroBatcher:
    def __init__(self, device_index, max_batch: int = 64,
                 window_us: int = 200):
        self.idx = device_index
        self.max_batch = max(1, max_batch)
        self.window = window_us / 1e6
        self._lock = threading.Lock()
        self._queues: Dict[Tuple[int, bool], List[_Request]] = {}
        self._timers: Dict[Tuple[int, bool], threading.Timer] = {}
        self.batches_executed = 0
        self.queries_batched = 0

    # ------------------------------------------------------------------
    def submit(self, dense_rows: List[int], limit_b: int,
               descending: bool) -> Tuple[int, np.ndarray]:
        """Blocking submit; returns (total, top ids desc/asc, -1 padded)."""
        if len(dense_rows) > MAX_K:
            # dropping rows would drop AND constraints (false positives);
            # callers must route >MAX_K queries to the unbatched path
            raise ValueError(
                f"micro-batch supports at most {MAX_K} dense rows, "
                f"got {len(dense_rows)}")
        req = _Request(rows=list(dense_rows))
        key = (limit_b, descending)
        flush_now = False
        with self._lock:
            q = self._queues.setdefault(key, [])
            q.append(req)
            if len(q) >= self.max_batch:
                flush_now = True
            elif len(q) == 1:
                t = threading.Timer(self.window, self._flush, args=(key,))
                t.daemon = True
                self._timers[key] = t
                t.start()
        if flush_now:
            self._flush(key)
        req.event.wait(timeout=120)
        if req.error is not None:
            raise req.error
        if req.ids is None:
            raise TimeoutError("micro-batch execution timed out")
        return req.total, req.ids

    # ------------------------------------------------------------------
    def _flush(self, key: Tuple[int, bool]) -> None:
        with self._lock:
            q = self._queues.pop(key, [])
            t = self._timers.pop(key, None)
            if t is not None:
                t.cancel()
        if not q:
            return
        limit_b, descending = key
        try:
            self._execute(q, limit_b, descending)
        except BaseException as e:  # noqa: BLE001 — propagate to waiters
            for r in q:
                r.error = e
                r.event.set()

    def _execute(self, q: List[_Request], limit_b: int,
                 descending: bool) -> None:
        import jax.numpy as jnp
        from ..ops import bitmap_ops
        idx = self.idx
        B = len(q)
        K = 1
        for r in q:
            K = max(K, len(r.rows))
        K = 8 if K <= 8 else MAX_K
        # bucket B to bounded shapes
        B_pad = 1
        for b in (8, 16, 32, 64, 128, 256):
            if B <= b:
                B_pad = b
                break
        else:
            B_pad = ((B + 255) // 256) * 256
        rows = np.full((B_pad, K), idx.ones_row, dtype=np.int32)
        for i, r in enumerate(q):
            rows[i, :len(r.rows)] = r.rows
        nrows = np.full((B_pad, 1), idx.zeros_row, dtype=np.int32)
        extra = idx._pack_extra([])
        # fused search + top-n: one program, one dispatch per batch
        count, ids = bitmap_ops.dense_search_topn(
            idx.bitmaps, jnp.asarray(rows), jnp.asarray(nrows),
            idx.deleted, extra, False, False, limit_b, descending)
        count_np = np.asarray(count)
        ids_np = np.asarray(ids)
        self.batches_executed += 1
        self.queries_batched += B
        for i, r in enumerate(q):
            r.total = int(count_np[i])
            r.ids = ids_np[i]
            r.event.set()

    # ------------------------------------------------------------------
    def stats(self) -> Dict[str, int]:
        return {"batches_executed": self.batches_executed,
                "queries_batched": self.queries_batched,
                "avg_batch": (self.queries_batched //
                              max(self.batches_executed, 1))}
