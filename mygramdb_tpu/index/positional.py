"""Positional occurrence index: host finalize + device store.

For every (term, doc) posting of the CSR index this stores the POSITIONS
at which the gram occurs in the doc's normalized text, enabling exact
substring verification by anchored position probes instead of text
window scans (see ops/positional_ops.py for the query-side design and
the parity argument). The reference has no equivalent — it re-scans
stored text per candidate (search_pipeline.h:159-190); this is a
beyond-reference axis that makes verify_text cost O(occurrences moved)
instead of O(candidates x text bytes).

Layout:
  occ_cnt  (P,)  uint16 — occurrences per posting, parallel to the CSR
                  postings array (same per-term offsets/lengths)
  occ_pos  (O,)  uint16 — positions grouped by (term, doc, pos) in CSR
                  order; every TERM's region starts 128-aligned (pad
                  cells are 0xFFFF): the device arrays view as
                  (O//128, 128) — lane-width rows that tile with zero
                  padding (8-cell rows cost a 16x tiled relayout copy on
                  TPU) and keep row addressing int32-safe past 2^31
                  total occurrences (10M-doc corpora)
  occ_base (V,)  int64  — aligned region start per term
  occ_len  (V,)  int64  — real (unpadded) occurrences per term

Positions are uint16; documents longer than POS_CAP code points land in
``overflow_docs`` and disqualify the positional path for the segment
(the text/host verify paths still cover them) — real corpora cap far
below this.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Set, Tuple

import numpy as np

POS_CAP = 65534          # uint16 minus the 0xFFFF pad sentinel
POS_PAD = 0xFFFF
OCC_ALIGN = 128          # term-region alignment (device lane width)


@dataclass
class PositionalPostings:
    """Host-side finalize product (travels with BuiltIndex)."""
    occ_cnt: np.ndarray    # (P,) uint16
    occ_pos: np.ndarray    # (O8,) uint16, 8-aligned term regions
    occ_base: np.ndarray   # (V,) int64 aligned region starts
    occ_len: np.ndarray    # (V,) int64 occurrences per term
    overflow_docs: Set[int] = field(default_factory=set)

    @property
    def n_occurrences(self) -> int:
        return int(self.occ_len.sum())

    def nbytes(self) -> int:
        return int(self.occ_cnt.nbytes + self.occ_pos.nbytes)

    def state(self) -> dict:
        """Msgpack-able form for the dump TABLE section
        (storage/dump.py TableState.positional_state)."""
        from ..storage.dump import _pack_array
        return {"align": OCC_ALIGN,
                "occ_cnt": _pack_array(self.occ_cnt),
                "occ_pos": _pack_array(self.occ_pos),
                "occ_base": _pack_array(self.occ_base),
                "occ_len": _pack_array(self.occ_len),
                "overflow": sorted(self.overflow_docs)}

    @classmethod
    def from_state(cls, d: dict) -> Optional["PositionalPostings"]:
        """None when the dump's region alignment predates the current
        device layout — the restored table serves through the text path
        until the next SYNC/optimize rebuilds positions."""
        if d.get("align", 8) != OCC_ALIGN:
            return None
        from ..storage.dump import _unpack_array
        return cls(_unpack_array(d["occ_cnt"]), _unpack_array(d["occ_pos"]),
                   _unpack_array(d["occ_base"]), _unpack_array(d["occ_len"]),
                   set(d.get("overflow", ())))

    def term_occurrences(self, tid: int, offsets: np.ndarray,
                         lengths: np.ndarray, postings: np.ndarray
                         ) -> List[Tuple[int, np.ndarray]]:
        """[(doc, positions)] for one term (tests / host fallback)."""
        o = int(offsets[tid])
        ln = int(lengths[tid])
        docs = postings[o:o + ln]
        cnts = self.occ_cnt[o:o + ln].astype(np.int64)
        starts = np.zeros(ln, dtype=np.int64)
        if ln:
            np.cumsum(cnts[:-1], out=starts[1:])
        base = int(self.occ_base[tid])
        return [(int(d), self.occ_pos[base + s:base + s + c].astype(
            np.int32)) for d, s, c in zip(docs, starts, cnts)]


# shape buckets for the positional verify programs (each combination is
# one XLA program; cold compiles on tunneled backends cost minutes, so
# the lists stay SHORT — CJK serving traffic lands in the first 1-2)
C_BUCKETS = (512, 4096, 32768)          # driver df
CO_BUCKETS = (1024, 8192, 65536)        # driver occurrences
C2_BUCKETS = (4096, 65536)              # probe df
CO2_BUCKETS = (16384, 131072)           # probe occurrences
G_BUCKETS = (2, 4, 8)                   # probe grams per term


def _bucket(n: int, buckets) -> Optional[int]:
    for b in buckets:
        if n <= b:
            return b
    return None


def _expand_occ_doc_impl(post, cnt, offsets, occ_base, occ_prefix,
                         P: int, O: int, OA: int):
    """Device build of the per-occurrence doc-id array.

    post (>=P,) int32 CSR postings (already HBM-resident for the index);
    cnt (P,) uint16 occurrences per posting; offsets (V,) int32 CSR term
    starts; occ_base/occ_prefix (V,) int32 aligned/unaligned region
    starts. Owner-of-cell is recovered WITHOUT searchsorted (a
    data-dependent gather loop, catastrophic on TPU): scatter a 1 at
    each posting's/term's first cell, cumsum -> owner index. Zero-length
    owners collide on the next owner's start; the add accumulates and
    the cumsum skips them — exactly right."""
    import jax.numpy as jnp
    ind = jnp.zeros((P,), jnp.int32).at[offsets].add(1, mode="drop")
    term_of = jnp.cumsum(ind) - 1
    cnt32 = cnt.astype(jnp.int32)
    run_p = jnp.cumsum(cnt32) - cnt32       # unaligned occ prefix/posting
    start = occ_base[term_of] + (run_p - occ_prefix[term_of])
    own = jnp.zeros((O,), jnp.int32).at[run_p].add(1, mode="drop")
    owner = jnp.cumsum(own) - 1
    tot = jnp.arange(O, dtype=jnp.int32)
    idx = start[owner] + (tot - run_p[owner])
    odoc = jnp.full((OA,), jnp.int32(2 ** 31 - 1))
    return odoc.at[idx].set(post[owner]).reshape(-1, OCC_ALIGN)


_expand_occ_doc = None  # module-level jit, built on first use


def _get_expand_occ_doc():
    global _expand_occ_doc
    if _expand_occ_doc is None:
        import functools
        import jax
        _expand_occ_doc = functools.partial(
            jax.jit, static_argnames=("P", "O", "OA"))(
            _expand_occ_doc_impl)
    return _expand_occ_doc


class DevicePositional:
    """HBM-resident occurrence index for one immutable segment.

    occ_cnt rides the CSR offsets (same d_off/d_len as postings); occ_pos
    is addressed by 8-aligned term regions (int32-safe past 2^31 total
    occurrences). doc_len powers the BM25 norm in score mode."""

    def __init__(self, pp: PositionalPostings, capacity: int,
                 doc_len: Optional[np.ndarray] = None, device=None,
                 postings: Optional[np.ndarray] = None,
                 offsets: Optional[np.ndarray] = None,
                 lengths: Optional[np.ndarray] = None,
                 postings_dev=None):
        import jax
        import time as _time
        from ..ops import runtime
        from ..ops.positional_ops import OCC_GATHER_PAD
        self.upload_detail: dict = {}
        _t0 = _time.time()
        opos = pp.occ_pos
        tail = OCC_GATHER_PAD + (-(opos.size + OCC_GATHER_PAD) % OCC_ALIGN)
        OA = opos.size + tail
        # tail pads on DEVICE (chunk + concat): a host concatenate would
        # first-touch a fresh O-sized array (minutes under VM memory
        # weather — see runtime.chunked_device_put)
        self.occ_pos8 = runtime.chunked_device_put(
            opos, device,
            tail=np.full(tail, POS_PAD, dtype=np.uint16)
        ).reshape(-1, OCC_ALIGN)
        self.upload_detail["occ_pos_put_s"] = round(_time.time() - _t0, 2)
        _t0 = _time.time()
        # per-occurrence DOC ids, same aligned layout as occ_pos: the
        # kernel's probe pair lists and driver anchors become plain slice
        # gathers with zero expansion work (the rank-based expansion of
        # the doc ids from the CSR measured O(occ * df/128) per query
        # lane and dominated the batch). Expanded ON DEVICE from the
        # already-resident CSR postings + the (P,) occurrence counts —
        # the host expansion allocated ~3 P/O-sized intermediates at
        # ~35 MB/s first-touch (104 s at 1.1M docs) and then shipped
        # 4 B/occurrence; the device build ships 2 B/posting and runs in
        # device-cumsum time (e2e/profile_upload.py occ_doc_expand).
        have = (postings is not None and pp.occ_cnt.size == postings.size
                and postings.size)
        P = int(pp.occ_cnt.size)
        dev_ok = (have and postings_dev is not None
                  and OA < 2 ** 31 and int(pp.occ_base.max(initial=0)) +
                  int(pp.occ_len.max(initial=0)) < 2 ** 31)
        if dev_ok:
            occ_prefix = (np.cumsum(pp.occ_len) - pp.occ_len).astype(
                np.int32)
            cnt_dev = runtime.chunked_device_put(pp.occ_cnt, device)
            self.occ_doc8 = _get_expand_occ_doc()(
                postings_dev, cnt_dev,
                jax.device_put(offsets.astype(np.int32), device),
                jax.device_put(pp.occ_base.astype(np.int32), device),
                jax.device_put(occ_prefix, device),
                P=P, O=int(pp.occ_len.sum()), OA=OA)
            self.occ_doc8.block_until_ready()
            self.upload_detail["occ_doc_dev_s"] = round(
                _time.time() - _t0, 2)
        else:
            odoc = np.full(OA, int(2 ** 31 - 1), dtype=np.int32)
            if have:
                cnt64 = pp.occ_cnt.astype(np.int64)
                occ_prefix = np.cumsum(pp.occ_len) - pp.occ_len
                run = np.cumsum(cnt64) - cnt64  # global unaligned prefix
                V = pp.occ_len.shape[0]
                term_of = np.repeat(np.arange(V, dtype=np.int64),
                                    lengths.astype(np.int64))
                start = pp.occ_base[term_of] + (run - occ_prefix[term_of])
                del term_of, run
                idx = np.repeat(start, cnt64) + (
                    np.arange(int(cnt64.sum()), dtype=np.int64) -
                    np.repeat(np.cumsum(cnt64) - cnt64, cnt64))
                del start
                odoc[idx] = np.repeat(postings, cnt64)
                del idx
            self.upload_detail["occ_doc_host_s"] = round(
                _time.time() - _t0, 2)
            _t0 = _time.time()
            self.occ_doc8 = runtime.chunked_device_put(
                odoc.reshape(-1, OCC_ALIGN), device)
            del odoc
            self.upload_detail["occ_doc_put_s"] = round(
                _time.time() - _t0, 2)
        self.occ_base8 = (pp.occ_base // OCC_ALIGN).astype(np.int32)  # host
        self.occ_len = pp.occ_len                              # host int64
        self.occ_cnt_host = pp.occ_cnt                         # host/debug
        cap128 = ((capacity + 127) // 128) * 128
        dl = np.zeros(cap128, dtype=np.int32)
        if doc_len is not None:
            n = min(doc_len.shape[0], capacity)
            dl[:n] = doc_len[:n]
        self.doc_len_pad = jax.device_put(dl, device)
        self.overflow = set(pp.overflow_docs)

    def memory_usage(self) -> int:
        return int(self.occ_doc8.size * 4 + self.occ_pos8.size * 2 +
                   self.doc_len_pad.size * 4)


def finalize_with_positions_np(tids: np.ndarray, docs: np.ndarray,
                               pos: np.ndarray, V: int
                               ) -> Tuple[np.ndarray, np.ndarray,
                                          PositionalPostings]:
    """Vectorized numpy finalize of a full occurrence stream: returns the
    deduped doc CSR AND the positional arrays, both derived from one
    lexsort (the native chunked two-pass scatter covers 10M-scale
    builds; this is the fallback and the test oracle).

    tids/docs: (E,) int32 one entry PER OCCURRENCE; pos: (E,) uint16
    in-doc positions. -> (postings int32, lengths int32, positional)."""
    E = tids.size
    if E == 0:
        return (np.zeros(0, dtype=np.int32), np.zeros(V, dtype=np.int32),
                PositionalPostings(
                    np.zeros(0, dtype=np.uint16),
                    np.full(OCC_ALIGN, POS_PAD, dtype=np.uint16),
                    np.zeros(V, dtype=np.int64),
                    np.zeros(V, dtype=np.int64)))
    order = np.lexsort((pos, docs, tids))
    st = tids[order]
    sd = docs[order]
    sp = pos[order]
    del order
    occ_len = np.bincount(st, minlength=V).astype(np.int64)
    aligned = (occ_len + OCC_ALIGN - 1) & ~np.int64(OCC_ALIGN - 1)
    occ_base = np.zeros(V, dtype=np.int64)
    np.cumsum(aligned[:-1], out=occ_base[1:])
    O8 = int(aligned.sum())
    occ_pos = np.full(max(O8, OCC_ALIGN), POS_PAD, dtype=np.uint16)
    starts = np.zeros(V, dtype=np.int64)
    np.cumsum(occ_len[:-1], out=starts[1:])
    idx_in_term = np.arange(E, dtype=np.int64) - starts[st]
    occ_pos[occ_base[st] + idx_in_term] = sp
    # posting groups: (term, doc) changes; group order IS CSR order
    # (term asc, doc asc within term after the lexsort)
    newp = np.empty(E, dtype=bool)
    newp[0] = True
    np.logical_or(st[1:] != st[:-1], sd[1:] != sd[:-1], out=newp[1:])
    postings = sd[newp].astype(np.int32)
    lengths = np.bincount(st[newp], minlength=V).astype(np.int32)
    bounds = np.flatnonzero(newp)
    occ_cnt = np.diff(np.concatenate([bounds, [E]])).astype(np.uint16)
    return postings, lengths, PositionalPostings(occ_cnt, occ_pos,
                                                 occ_base, occ_len)
