"""Device-resident normalized text store for verify_text.

Packs the corpus's normalized texts into one flat HBM code-point array at
compaction time; `verify()` runs the fused substring kernel over candidate
batches, with automatic host fallback for docs that exceed the packed
length cap, for needles longer than the kernel cap, and for delta docs not
yet packed.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.verify_ops import (NEEDLE_CAP, bm25_topk_device,
                              count_occurrences_device, has_self_overlap,
                              needle_cap_bucket, substring_verify_device)
from ..ops import runtime
from .. import native

# chunked-verify candidate buckets: wide tail added in r5 so a 131k-
# candidate fuzzy/synonym verify costs 2 dispatches, not 9 — each
# dispatch is a tunnel RTT, and the (C, maxT) gather stays < 100 MB
# even at the 65536 bucket with a tight per-chunk maxT
_C_BUCKETS = (2048, 4096, 8192, 16384, 32768, 65536)
# Padded text layout cap (row-gather path). v5e HBM is 16 GB; the index
# itself is ~0.5 GB/1M docs, so the padded matrix can take most of the
# rest — at 4M docs it needs 8.4 GB and turns the verified path's text
# access from C*maxT element gathers into contiguous row DMAs. Corpora
# past ~5M docs fall back to the flat pack (+ maxT column buckets).
_PADDED_BUDGET_BYTES = 11 << 30
_MAXT_CHOICES = (256, 512, 1024, 2048, 4096)
_U16_MAX = 0xFFFF  # BMP ceiling; docs with any cp >= this stay uint32/host
# Flat packs carry this many trailing sentinel cells so the Pallas flat
# verify kernel can DMA every 1024-cell group covering [off, off+win+cap)
# unconditionally, for any window up to the largest maxT bucket and any
# in-group offset (mirrors posting_ops.SLICE_GATHER_PAD). The pack's
# total length is further padded to a 1024 multiple so it reshapes to
# the kernel's (P//1024, 8, 128) group view.
FLAT_GATHER_PAD = ((1023 + _MAXT_CHOICES[-1] + NEEDLE_CAP + 1023)
                   // 1024) * 1024


def _pad_on_device_impl(flat: jax.Array, offsets: jax.Array,
                        lengths: jax.Array, maxT: int, sentinel
                        ) -> jax.Array:
    """(P,) flat pack -> (capacity, maxT) padded rows, sentinel-filled."""
    pos = jnp.arange(maxT, dtype=jnp.int32)[None, :]
    idx = offsets[:, None] + pos
    valid = pos < lengths[:, None]
    idx = jnp.clip(jnp.where(valid, idx, 0), 0, flat.shape[0] - 1)
    return jnp.where(valid, flat[idx], sentinel)


_pad_on_device = functools.partial(jax.jit, static_argnames=("maxT",))(
    _pad_on_device_impl)


_PAD_BLOCK_ROWS = 65536


@functools.partial(jax.jit, static_argnames=("block", "maxT"),
                   donate_argnums=(0,))
def _pad_block_into(out: jax.Array, flat: jax.Array, offsets: jax.Array,
                    lengths: jax.Array, r0: jax.Array, *, block: int,
                    maxT: int, sentinel) -> jax.Array:
    """Write rows [r0, r0+block) of the padded matrix into the donated
    ``out`` buffer. The whole-matrix `_pad_on_device` materializes an
    int32 (capacity, maxT) index fusion — 18.6 GB at 4M docs, an HBM OOM
    even though the uint16 result fits — so large corpora build the
    matrix block-wise with bounded intermediates."""
    off_b = jax.lax.dynamic_slice(offsets, (r0,), (block,))
    len_b = jax.lax.dynamic_slice(lengths, (r0,), (block,))
    vals = _pad_on_device(flat, off_b, len_b, maxT, sentinel)
    return jax.lax.dynamic_update_slice(out, vals, (r0, 0))


@functools.partial(jax.jit, static_argnames=("rows", "maxT", "dtype"))
def _sentinel_matrix(rows: int, maxT: int, dtype, sentinel) -> jax.Array:
    return jnp.full((rows, maxT), sentinel, dtype=dtype)


def _pad_on_device_blocked(flat: jax.Array, offsets: jax.Array,
                           lengths: jax.Array, maxT: int, sentinel,
                           dtype) -> jax.Array:
    """Blocked padded-matrix build (see _pad_block_into). The tail block
    re-covers rows already written (r0 clamps to rows-block); recomputing
    them writes identical values, so the overlap is benign."""
    rows = offsets.shape[0]
    if rows <= _PAD_BLOCK_ROWS:
        return _pad_on_device(flat, offsets, lengths, maxT,
                              jnp.asarray(sentinel, dtype=dtype))
    sent = jnp.asarray(sentinel, dtype=dtype)
    out = _sentinel_matrix(rows, maxT, dtype, sent)
    block = _PAD_BLOCK_ROWS
    r0 = 0
    while r0 < rows:
        r = min(r0, rows - block)
        out = _pad_block_into(out, flat, offsets, lengths,
                              jnp.int32(r), block=block, maxT=maxT,
                              sentinel=sent)
        r0 += block
    return out


# doc-sharded padded builds: jitted-with-out_shardings variants, cached
# per (sharding identity, maxT). The sharding object itself is not
# hashable-stable across calls, so it parks in a registry keyed by id().
_TEXT_SHARDING_BY_KEY: Dict[int, object] = {}


@functools.lru_cache(maxsize=16)
def _sharded_pad_fn(sharding_key: int, maxT: int):
    sharding = _TEXT_SHARDING_BY_KEY[sharding_key]
    return jax.jit(functools.partial(_pad_on_device_impl, maxT=maxT),
                   out_shardings=sharding)


def _pad_on_device_sharded(flat: jax.Array, offsets: jax.Array,
                           lengths: jax.Array, maxT: int, sentinel,
                           dtype, sharding) -> jax.Array:
    """Doc-sharded padded-matrix build: the (capacity, rowT) matrix comes
    out P('docs', None) on the index mesh, so each chip holds only its
    doc range's text rows (~S x less HBM than the replicated layout; the
    mesh fused-verify kernel then row-gathers candidates locally). The
    compact flat pack is replicated during the build and freed after —
    only the padded matrix persists."""
    _TEXT_SHARDING_BY_KEY[id(sharding)] = sharding
    fn = _sharded_pad_fn(id(sharding), maxT)
    return fn(flat, offsets, lengths,
              sentinel=jnp.asarray(sentinel, dtype=dtype))


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


class DeviceTextStore:
    def __init__(self, texts_by_doc: Dict[int, str], capacity: int,
                 device=None, doc_sharding=None):
        """texts_by_doc: doc id -> normalized text (snapshot at build)."""
        self._doc_sharding = doc_sharding
        ids_arr = np.asarray(list(texts_by_doc.keys()), dtype=np.int64)
        lens_arr = np.asarray([len(t) for t in texts_by_doc.values()],
                              dtype=np.int64)
        # one encode over the whole corpus (per-doc encode at 1M+ docs is
        # a multi-minute Python loop)
        flat = np.frombuffer(
            "".join(texts_by_doc.values()).encode("utf-32-le"),
            dtype=np.uint32).copy()
        self._build(ids_arr, lens_arr, flat, capacity, device)

    @classmethod
    def from_doc_store(cls, doc_store, capacity: int, device=None,
                       doc_sharding=None) -> "DeviceTextStore":
        """Build from a hybrid DocumentStore. The frozen columnar base
        streams straight from its utf-8 blob — no per-doc Python strings
        for the bulk of the corpus (at 1M+ docs the dict snapshot path
        costs minutes and gigabytes); post-freeze overlay texts append
        after, shadowing their frozen rows. doc_sharding: optional
        NamedSharding P('docs', None) from the index mesh (see _upload)."""
        frozen = getattr(doc_store, "frozen", None)
        if frozen is None or frozen.txt_blob is None:
            return cls(doc_store.texts_snapshot(), capacity, device,
                       doc_sharding)
        overlay = doc_store.text_overlay()
        fast = cls._from_frozen_native(frozen, overlay, capacity, device,
                                       doc_sharding)
        if fast is not None:
            return fast
        ov_ids = np.asarray(list(overlay.keys()), dtype=np.int64)
        id_parts: List[np.ndarray] = []
        len_parts: List[np.ndarray] = []
        flat_parts: List[np.ndarray] = []
        for first, flat, lens in frozen.iter_text_codepoints():
            ids = np.arange(first, first + lens.size, dtype=np.int64)
            if ov_ids.size:
                keep = ~np.isin(ids, ov_ids)
                if not keep.all():
                    flat = flat[np.repeat(keep, lens)]
                    ids = ids[keep]
                    lens = lens[keep]
            id_parts.append(ids)
            len_parts.append(lens)
            flat_parts.append(flat)
        if overlay:
            texts = list(overlay.values())
            id_parts.append(ov_ids)
            len_parts.append(np.asarray([len(t) for t in texts],
                                        dtype=np.int64))
            flat_parts.append(np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype=np.uint32))
        obj = cls.__new__(cls)
        obj._doc_sharding = doc_sharding
        obj._build(
            np.concatenate(id_parts) if id_parts else
            np.zeros(0, dtype=np.int64),
            np.concatenate(len_parts) if len_parts else
            np.zeros(0, dtype=np.int64),
            np.concatenate(flat_parts) if flat_parts else
            np.zeros(0, dtype=np.uint32),
            capacity, device)
        return obj

    @classmethod
    def _from_frozen_native(cls, frozen, overlay: Dict[int, str],
                            capacity: int, device, doc_sharding=None
                            ) -> Optional["DeviceTextStore"]:
        """One-pass native pack from the frozen store's UTF-8 blob.

        The Python route (chunked str decode -> uint32 parts -> concat ->
        astype(uint16)) allocates ~5x the corpus in intermediates; on
        hosts where first-touch page faults dominate (measured 35 MB/s
        faulting vs 4.8 GB/s warm) that IS the pack cost — 120 s of the
        1.1M-doc build. mg_utf8_decode_u16 writes the final uint16 buffer
        directly; non-BMP / malformed docs flag per-doc and route to the
        host verify path (same semantics as _build's segmax check).
        Overlay texts (post-freeze binlog writes) append after the frozen
        cells and shadow their rows via offsets/lengths — the stale
        frozen cells are simply never addressed."""
        if frozen.cp_lens is None or not native.available():
            return None
        n = frozen.n
        cp_lens = frozen.cp_lens
        cp_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cp_lens, out=cp_off[1:])
        total = int(cp_off[-1])

        # overlay docs: few (binlog-rate writes since the freeze); encode
        # in Python and append after the frozen cells
        ov_ids: List[int] = []
        ov_cps: List[np.ndarray] = []
        bad_overlay: List[int] = []
        for d, t in overlay.items():
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            if cp.size and int(cp.max()) >= _U16_MAX:
                bad_overlay.append(int(d))
                continue
            ov_ids.append(int(d))
            ov_cps.append(cp.astype(np.uint16))
        ov_total = sum(c.size for c in ov_cps)

        flat = np.empty(max(total + ov_total, 1), dtype=np.uint16)
        bad = native.utf8_decode_u16(frozen.txt_blob, frozen.txt_off,
                                     cp_off, flat, _U16_MAX)
        if bad is None:  # stale .so without the entry point
            return None

        obj = cls.__new__(cls)
        obj._doc_sharding = doc_sharding
        obj.capacity = capacity
        if n:
            p99 = int(np.percentile(cp_lens, 99))
            obj.maxT = next((m for m in _MAXT_CHOICES if m >= p99),
                            _MAXT_CHOICES[-1])
        else:
            obj.maxT = _MAXT_CHOICES[0]
        obj.dtype = np.uint16
        lengths = np.zeros(capacity, dtype=np.int32)
        # int64: at 10M docs the pack crosses 2^31 code points and int32
        # offsets silently wrap (the device split is group+remainder int32
        # pairs, see _upload)
        offsets = np.zeros(capacity, dtype=np.int64)
        m = min(n, capacity - 1)  # frozen rows are doc ids 1..n
        lengths[1:m + 1] = cp_lens[:m]
        offsets[1:m + 1] = cp_off[:m]
        obj._overflow = set()
        kill = np.flatnonzero((bad[:m] != 0) | (cp_lens[:m] > obj.maxT)) + 1
        obj._overflow.update(int(d) for d in kill.tolist())
        obj._overflow.update(range(m + 1, n + 1))
        lengths[kill] = 0
        # overlay: append + shadow (or overflow when unpackable)
        pos = total
        for d, cp in zip(ov_ids, ov_cps):
            if d < 1 or d >= capacity or cp.size > obj.maxT:
                obj._overflow.add(d)
                if 1 <= d < capacity:
                    lengths[d] = 0
                continue
            flat[pos:pos + cp.size] = cp
            offsets[d] = pos
            lengths[d] = cp.size
            obj._overflow.discard(d)
            pos += cp.size
        for d in bad_overlay:
            obj._overflow.add(d)
            if 1 <= d < capacity:
                lengths[d] = 0
        obj._upload(flat, offsets, lengths, capacity, device, _U16_MAX)
        # overlay docs shadowing a frozen row replace it, not add to it
        n_new = sum(1 for d in overlay if not (1 <= int(d) <= n))
        obj.n_packed = n + n_new - len(obj._overflow)
        return obj

    def _build(self, ids_arr: np.ndarray, lens_arr: np.ndarray,
               flat: np.ndarray, capacity: int, device) -> None:
        """Core pack from parallel (ids, lengths, flat codepoints)."""
        self.capacity = capacity
        n_total = ids_arr.size
        lengths = np.zeros(capacity, dtype=np.int32)
        offsets = np.zeros(capacity, dtype=np.int64)
        # choose maxT covering ~p99 of lengths (cap 4096)
        if lens_arr.size:
            p99 = int(np.percentile(lens_arr, 99))
            self.maxT = next((m for m in _MAXT_CHOICES if m >= p99),
                             _MAXT_CHOICES[-1])
        else:
            self.maxT = _MAXT_CHOICES[0]
        self._overflow = set()
        drop = (ids_arr >= capacity) | (lens_arr > self.maxT) | (ids_arr < 1)
        if drop.any():
            self._overflow.update(int(d) for d in ids_arr[drop].tolist())
            flat = flat[np.repeat(~drop, lens_arr)]
            ids_arr = ids_arr[~drop]
            lens_arr = lens_arr[~drop]
        starts = np.zeros(lens_arr.size, dtype=np.int64)
        if lens_arr.size:
            np.cumsum(lens_arr[:-1], out=starts[1:])
        # BMP check per doc: non-BMP docs fall back to the host verify path
        # so the pack can be uint16 (halves HBM bytes + doubles the padded
        # row-gather budget). U+FFFF itself is excluded too — it is the
        # padding sentinel (a Unicode noncharacter, never in real text).
        if flat.size and flat.max() >= _U16_MAX:
            nonzero = lens_arr > 0
            segmax = np.zeros(lens_arr.size, dtype=np.uint32)
            if nonzero.any():
                segmax[nonzero] = np.maximum.reduceat(flat,
                                                      starts[nonzero])
            bad = segmax >= _U16_MAX
            if bad.any():
                for d in ids_arr[bad].tolist():
                    self._overflow.add(int(d))
                keep_cp = np.repeat(~bad, lens_arr)
                flat = flat[keep_cp]
                ids_arr = ids_arr[~bad]
                lens_arr = lens_arr[~bad]
                starts = np.zeros(lens_arr.size, dtype=np.int64)
                if lens_arr.size:
                    np.cumsum(lens_arr[:-1], out=starts[1:])
        self.dtype = np.uint16 if (not flat.size
                                   or flat.max() < _U16_MAX) else np.uint32
        sentinel = _U16_MAX if self.dtype == np.uint16 else 0xFFFFFFFF
        flat = flat.astype(self.dtype, copy=False)
        if not flat.size:
            flat = np.zeros(1, dtype=self.dtype)
        offsets[ids_arr] = starts
        lengths[ids_arr] = lens_arr.astype(np.int32)
        self._upload(flat, offsets, lengths, capacity, device, sentinel)
        self.n_packed = int(n_total) - len(self._overflow)

    def _upload(self, flat: np.ndarray, offsets: np.ndarray,
                lengths: np.ndarray, capacity: int, device,
                sentinel: int) -> None:
        """Ship the pack to HBM. Padded (N, maxT) layout when it fits the
        budget: the kernels then ROW-gather candidate texts (contiguous
        DMA) instead of C*maxT element gathers — order-of-magnitude
        faster at large C. Large corpora keep the compact flat pack.

        When ``self._doc_sharding`` is set (a NamedSharding P('docs',
        None) from the index mesh), the padded matrix builds doc-sharded:
        each chip keeps only its doc range's rows and the mesh fused
        verify gathers candidates locally (parallel/mesh.py)."""
        itemsize = np.dtype(self.dtype).itemsize
        doc_sharding = getattr(self, "_doc_sharding", None)
        self.doc_sharded = False
        # round the row count up to a multiple of 8: the Pallas fused
        # verify kernel DMAs (8, rowT) doc GROUPS (single rows of the
        # (8,128)-tiled HBM matrix are not tile-aligned slices); the pad
        # rows have length 0 and are never addressed
        if capacity % 8:
            pad = 8 - capacity % 8
            offsets = np.concatenate(
                [offsets, np.zeros(pad, dtype=offsets.dtype)])
            lengths = np.concatenate(
                [lengths, np.zeros(pad, dtype=lengths.dtype)])
        self.lengths_host = lengths  # numpy copy: planners bound candidate
        # text lengths host-side (maxT column-slice buckets) with no pull
        self.offsets_host = offsets.astype(np.int64)  # authoritative
        # Device offsets travel as (group, remainder) int32 pairs in
        # 1024-cell units: a >=10M-doc pack crosses 2^31 code points, past
        # both int32 flat indexing and XLA's s32 scalar-argument range.
        # All in-kernel math stays int32-safe up to 2^31 GROUPS (2.2T cp).
        from ..ops import runtime as _rt
        self.offsets = (
            _rt.chunked_device_put((self.offsets_host >> 10).astype(
                np.int32), device),
            _rt.chunked_device_put((self.offsets_host & 1023).astype(
                np.int32), device))
        self.lengths = _rt.chunked_device_put(lengths, device)
        # round the physical row up to a 128-lane multiple: the fused
        # Pallas row-TF kernel DMAs whole rows into VMEM tiles (and the
        # XLA path is indifferent — extra columns are sentinel fill that
        # can never match a sub-sentinel needle)
        rowT = ((self.maxT + NEEDLE_CAP + 127) // 128) * 128
        # MYGRAM_TEXT_LAYOUT=flat|padded overrides the budget heuristic
        # (perf A/B: the Pallas flat kernel copies per-batch maxT-bucket
        # windows — often narrower than the padded physical row — while
        # the padded layout is what the XLA fallback gathers fastest)
        import os
        layout = os.environ.get("MYGRAM_TEXT_LAYOUT", "auto")
        fits = capacity * rowT * itemsize <= _PADDED_BUDGET_BYTES
        # the padded builder scatters from the flat pack with int32 flat
        # indices — impossible once the pack crosses 2^31 cells; such
        # corpora MUST keep the group-addressed flat layout
        fits = fits and flat.size < 2 ** 31
        if layout == "padded" and flat.size >= 2 ** 31:
            layout = "flat"
        rows_total = offsets.shape[0]
        # sharded build is viable only when the row axis divides evenly
        # over the mesh (no row pad shifted the shard boundaries: capacity
        # is a 32-multiple so the %8 pad above is a no-op there) and the
        # one-shot pad's int32 index intermediate fits per device
        n_sh = (doc_sharding.mesh.shape["docs"]
                if doc_sharding is not None else 1)
        shard_ok = (doc_sharding is not None and rows_total == capacity
                    and capacity % n_sh == 0
                    and capacity // n_sh * rowT * 4 <= (4 << 30))
        if layout == "padded" or (layout != "flat" and fits):
            # build the (capacity, maxT + NEEDLE_CAP) padded layout ON
            # DEVICE from the flat pack: host->HBM transfer is the flat
            # bytes only (~3x less than shipping the padded matrix — at
            # 1.1M docs that is the dominant text-store build cost on
            # tunneled backends). The NEEDLE_CAP sentinel columns are
            # baked in so the window kernels row-gather a ready tile
            # (no per-dispatch concat pass; see _gather_text_padded)
            from ..ops import runtime as _runtime
            flat_dev = _runtime.chunked_device_put(flat, device)
            offs32 = jax.device_put(
                self.offsets_host.astype(np.int32), device)  # < 2^31 here
            if shard_ok:
                import jax.sharding as jshard
                self.codepoints = _pad_on_device_sharded(
                    flat_dev, offs32, self.lengths, rowT, sentinel,
                    self.dtype, doc_sharding)
                row_sh = jshard.NamedSharding(
                    doc_sharding.mesh, jshard.PartitionSpec("docs"))
                self.lengths = jax.device_put(lengths, row_sh)
                self.doc_sharded = True
            else:
                self.codepoints = _pad_on_device_blocked(
                    flat_dev, offs32, self.lengths, rowT, sentinel,
                    self.dtype)
                self.doc_sharded = False
            self.codepoints.block_until_ready()
            self.flat_padded = False
            del flat_dev
        else:
            # sentinel tail: the Pallas flat verify kernel DMAs whole
            # 1024-cell groups covering [off, off+win+cap) unconditionally
            # (win <= largest maxT bucket); cells past doc end are masked
            # to sentinel in-kernel from `lengths`, so the tail only
            # needs to keep the copies in-bounds. Total length pads to a
            # 1024 multiple for the kernel's (P//1024, 8, 128) view.
            tail = FLAT_GATHER_PAD + (-(flat.size + FLAT_GATHER_PAD)
                                      % 1024)
            from ..ops import runtime as _runtime
            # tail pads on device — a host concatenate first-touches a
            # fresh pack-sized array (minutes at 10M-doc scale under VM
            # memory weather; see runtime.chunked_device_put)
            self.codepoints = _runtime.chunked_device_put(
                flat, device,
                tail=np.full(tail, sentinel, dtype=self.dtype))
            self.flat_padded = True
        del flat

    # coarse on purpose: each bucket is a separate XLA program and cold
    # compiles on tunneled TPU backends cost minutes
    _MAXT_SLICE_BUCKETS = (128, 512, 2048)

    def maxT_bucket(self, bound: int) -> int:
        """Smallest column-slice bucket covering ``bound`` (a known upper
        bound on candidate text lengths). The window kernels pay
        O(C * maxT), so verifying short-doc candidate sets at the global
        p99 tile width wastes most of the pass."""
        for m in self._MAXT_SLICE_BUCKETS:
            if m >= bound and m <= self.maxT:
                return m
        return self.maxT

    def _chunk_maxT(self, chunk: np.ndarray) -> int:
        # column-sliced row gathers are ~10x slower than full rows on TPU
        # (measured): the bucket only pays on the flat-pack layout
        if self.codepoints.ndim == 2:
            return self.maxT
        ok = (chunk >= 0) & (chunk < self.lengths_host.shape[0])
        bound = int(self.lengths_host[chunk[ok]].max()) if ok.any() else 1
        return self.maxT_bucket(max(bound, 1))

    # ------------------------------------------------------------------
    def verify(self, cand_ids: np.ndarray, needles: Sequence[str],
               texts_fallback, dirty=frozenset()) -> np.ndarray:
        """-> bool mask over cand_ids (contains ALL needles).

        texts_fallback(ids) -> list[Optional[str]] used for overflow docs,
        ``dirty`` docs (mutated since the pack — their packed text is
        stale), and for needles beyond the kernel cap.
        """
        if cand_ids.size == 0:
            return np.zeros(0, dtype=bool)
        needles = [n for n in needles if n]
        if not needles:
            return np.ones(cand_ids.size, dtype=bool)
        if any(len(n) > NEEDLE_CAP for n in needles):
            return native.substring_verify(texts_fallback(cand_ids.tolist()),
                                           list(needles))
        device_ok = np.asarray(
            [0 < d < self.capacity and d not in self._overflow
             and d not in dirty for d in cand_ids.tolist()])
        # overflow/out-of-range docs -> host
        host_ids = cand_ids[~device_ok]
        mask = np.zeros(cand_ids.size, dtype=bool)
        if host_ids.size:
            mask[~device_ok] = native.substring_verify(
                texts_fallback(host_ids.tolist()), list(needles))
        dev_ids = cand_ids[device_ok]
        if dev_ids.size:
            mask[device_ok] = self._verify_device(dev_ids, needles)
        return mask

    def _needles_need_range(self, ndl: np.ndarray) -> bool:
        """In-range window mask needed only when a needle code point
        clamps to the uint16 padding sentinel (see fused._needles_need_
        range); skipping it drops a doc_len pass + per-needle mask."""
        return (self.dtype == np.uint16 and ndl.size > 0
                and int(ndl.max()) >= 0xFFFF)

    def _verify_device(self, ids: np.ndarray,
                       needles: List[str]) -> np.ndarray:
        Nn = len(needles)
        ndl = np.zeros((Nn, NEEDLE_CAP), dtype=np.uint32)
        nlens = np.zeros(Nn, dtype=np.int32)
        for i, n in enumerate(needles):
            cp = np.frombuffer(n.encode("utf-32-le"), dtype=np.uint32)
            ndl[i, :cp.size] = cp
            nlens[i] = cp.size
        out = np.zeros(ids.size, dtype=bool)
        pos = 0
        while pos < ids.size:
            chunk = ids[pos:pos + _C_BUCKETS[-1]]
            C = _bucket(chunk.size, _C_BUCKETS)
            padded = np.full(C, -1, dtype=np.int32)
            padded[:chunk.size] = chunk
            runtime.dispatches.bump()
            m = substring_verify_device(
                self.codepoints, self.offsets, self.lengths,
                jnp.asarray(padded), jnp.asarray(ndl), jnp.asarray(nlens),
                C=C, maxT=self._chunk_maxT(chunk), Nn=Nn,
                cap=needle_cap_bucket(int(nlens.max())),
                use_range=self._needles_need_range(ndl))
            out[pos:pos + chunk.size] = np.asarray(m)[:chunk.size]
            pos += chunk.size
        return out

    # ------------------------------------------------------------------
    def contains_masks(self, cand_ids: np.ndarray, needles: Sequence[str],
                       texts_fallback, dirty=frozenset()) -> np.ndarray:
        """-> (C, Nn) bool per-needle contains matrix (boolean-AST text
        post-filter). Host fallback per needle for overflow/dirty docs and
        over-cap needles."""
        from ..ops.verify_ops import substring_masks_device
        n = cand_ids.size
        Nn = len(needles)
        out = np.zeros((n, Nn), dtype=bool)
        if n == 0 or Nn == 0:
            return out
        if any(len(nd) > NEEDLE_CAP or not nd for nd in needles):
            texts = texts_fallback(cand_ids.tolist())
            for j, nd in enumerate(needles):
                out[:, j] = native.substring_verify(texts, [nd]) if nd \
                    else True
            return out
        device_ok = np.asarray(
            [0 < d < self.capacity and d not in self._overflow
             and d not in dirty for d in cand_ids.tolist()])
        host_ids = cand_ids[~device_ok]
        if host_ids.size:
            texts = texts_fallback(host_ids.tolist())
            for j, nd in enumerate(needles):
                out[~device_ok, j] = native.substring_verify(texts, [nd])
        dev_ids = cand_ids[device_ok]
        if dev_ids.size:
            ndl, nlens = self._pack_needles(needles)
            dev_out = np.zeros((dev_ids.size, Nn), dtype=bool)
            pos = 0
            while pos < dev_ids.size:
                chunk = dev_ids[pos:pos + _C_BUCKETS[-1]]
                C = _bucket(chunk.size, _C_BUCKETS)
                padded = np.full(C, -1, dtype=np.int32)
                padded[:chunk.size] = chunk
                runtime.dispatches.bump()
                m = substring_masks_device(
                    self.codepoints, self.offsets, self.lengths,
                    jnp.asarray(padded), jnp.asarray(ndl),
                    jnp.asarray(nlens), C=C, maxT=self._chunk_maxT(chunk),
                    Nn=Nn, cap=needle_cap_bucket(int(nlens.max())),
                    use_range=self._needles_need_range(ndl))
                dev_out[pos:pos + chunk.size] = \
                    np.asarray(m)[:chunk.size]
                pos += chunk.size
            out[device_ok] = dev_out
        return out

    # ------------------------------------------------------------------
    def count_tf(self, cand_ids: np.ndarray, terms: Sequence[str],
                 texts_fallback, dirty=frozenset()):
        """BM25 TF matrix + doc lengths; device kernel with host fallback
        (overflow/dirty docs; self-overlapping or over-cap needles)."""
        n = cand_ids.size
        tf = np.zeros((n, len(terms)), dtype=np.int32)
        dl = np.zeros(n, dtype=np.int32)
        if n == 0 or not terms:
            return tf, dl
        if any(len(t) > NEEDLE_CAP or len(t) == 0 for t in terms):
            return native.count_occurrences(
                texts_fallback(cand_ids.tolist()), list(terms))
        # self-overlapping terms route to the exact leftmost-greedy device
        # scan (reference CountTermOccurrences non-overlap semantics)
        nonoverlap = any(has_self_overlap(t) for t in terms)
        device_ok = np.asarray(
            [0 < d < self.capacity and d not in self._overflow
             and d not in dirty for d in cand_ids.tolist()])
        host_ids = cand_ids[~device_ok]
        if host_ids.size:
            h_tf, h_dl = native.count_occurrences(
                texts_fallback(host_ids.tolist()), list(terms))
            tf[~device_ok] = h_tf
            dl[~device_ok] = h_dl
        dev_ids = cand_ids[device_ok]
        if dev_ids.size:
            Nn = len(terms)
            ndl = np.zeros((Nn, NEEDLE_CAP), dtype=np.uint32)
            nlens = np.zeros(Nn, dtype=np.int32)
            for i, t in enumerate(terms):
                cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                ndl[i, :cp.size] = cp
                nlens[i] = cp.size
            d_tf = np.zeros((dev_ids.size, Nn), dtype=np.int32)
            d_dl = np.zeros(dev_ids.size, dtype=np.int32)
            pos = 0
            while pos < dev_ids.size:
                chunk = dev_ids[pos:pos + _C_BUCKETS[-1]]
                C = _bucket(chunk.size, _C_BUCKETS)
                padded = np.full(C, -1, dtype=np.int32)
                padded[:chunk.size] = chunk
                runtime.dispatches.bump()
                t_m, l_m = count_occurrences_device(
                    self.codepoints, self.offsets, self.lengths,
                    jnp.asarray(padded), jnp.asarray(ndl),
                    jnp.asarray(nlens), C=C, maxT=self._chunk_maxT(chunk),
                    Nn=Nn, cap=needle_cap_bucket(int(nlens.max())),
                    nonoverlap=nonoverlap)
                d_tf[pos:pos + chunk.size] = np.asarray(t_m)[:chunk.size]
                d_dl[pos:pos + chunk.size] = np.asarray(l_m)[:chunk.size]
                pos += chunk.size
            tf[device_ok] = d_tf
            dl[device_ok] = d_dl
        return tf, dl

    @staticmethod
    def _pack_needles(terms: Sequence[str]):
        Nn = len(terms)
        ndl = np.zeros((Nn, NEEDLE_CAP), dtype=np.uint32)
        nlens = np.zeros(Nn, dtype=np.int32)
        for i, t in enumerate(terms):
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            ndl[i, :cp.size] = cp
            nlens[i] = cp.size
        return ndl, nlens

    def score_topk(self, cand_ids: np.ndarray, terms: Sequence[str],
                   idf: np.ndarray, avgdl: float, k1: float, b: float,
                   n: int, texts_fallback, dirty=frozenset()):
        """Fused BM25 TF->score->top-n on device: only n (id, score) pairs
        cross to the host per chunk (the SORT _score path at scale no
        longer hauls the full candidate TF matrix over PCIe). Overflow /
        dirty docs and uncountable needles score host-side and merge.

        -> (ids (<=n,) int32 score-desc (ties id-desc), scores float64).
        Returns None when no device fast path applies (caller falls back).
        """
        if cand_ids.size == 0 or not terms:
            return None
        if any(len(t) > NEEDLE_CAP or len(t) == 0 for t in terms):
            return None
        nonoverlap = any(has_self_overlap(t) for t in terms)
        device_ok = np.asarray(
            [0 < d < self.capacity and d not in self._overflow
             and d not in dirty for d in cand_ids.tolist()])
        pairs: List[Tuple[float, int]] = []  # (score, id)
        host_ids = cand_ids[~device_ok]
        if host_ids.size:
            from ..query.bm25 import BM25Scorer
            h_tf, h_dl = native.count_occurrences(
                texts_fallback(host_ids.tolist()), list(terms))
            tff = h_tf.astype(np.float64)
            norm = k1 * (1.0 - b + b * h_dl.astype(np.float64)[:, None] /
                         max(avgdl, 1e-9))
            h_sc = np.sum(idf[None, :] * tff * (k1 + 1.0) /
                          np.maximum(tff + norm, 1e-9), axis=1)
            pairs.extend(zip(h_sc.tolist(), host_ids.tolist()))
        dev_ids = cand_ids[device_ok]
        if dev_ids.size:
            ndl, nlens = self._pack_needles(terms)
            Nn = len(terms)
            pos = 0
            while pos < dev_ids.size:
                chunk = dev_ids[pos:pos + _C_BUCKETS[-1]]
                C = _bucket(chunk.size, _C_BUCKETS)
                padded = np.full(C, -1, dtype=np.int32)
                padded[:chunk.size] = chunk
                runtime.dispatches.bump()
                t_ids, t_sc = bm25_topk_device(
                    self.codepoints, self.offsets, self.lengths,
                    jnp.asarray(padded), jnp.asarray(ndl),
                    jnp.asarray(nlens),
                    jnp.asarray(idf, dtype=jnp.float32),
                    jnp.float32(k1), jnp.float32(b), jnp.float32(avgdl),
                    C=C, maxT=self._chunk_maxT(chunk), Nn=Nn, n=min(n, C),
                    cap=needle_cap_bucket(int(nlens.max())),
                    nonoverlap=nonoverlap)
                t_ids = np.asarray(t_ids)
                t_sc = np.asarray(t_sc)
                keep = t_ids >= 0
                pairs.extend(zip(t_sc[keep].tolist(),
                                 t_ids[keep].tolist()))
                pos += chunk.size
        pairs.sort(key=lambda p: (-p[0], -p[1]))
        pairs = pairs[:n]
        ids = np.asarray([p[1] for p in pairs], dtype=np.int32)
        scores = np.asarray([p[0] for p in pairs], dtype=np.float64)
        return ids, scores

    def memory_usage(self) -> int:
        return int(self.codepoints.size * self.codepoints.dtype.itemsize
                   + self.offsets[0].size * 8)
