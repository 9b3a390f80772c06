"""u16 delta-packed host->device transport for the CSR postings array.

The tunnel's h2d throughput is the dominant index-upload cost (postings
put measured 361-1,735 s for 447 MB at 1.1M docs depending on weather;
the link swings 0.26-20 MB/s between sessions). The postings array is a
concatenation of per-term sorted doc-id runs (index/builder.py
BuiltIndex: offsets = exclusive cumsum of lengths, postings sorted per
term), so in-row deltas are small positive integers: ship them as u16
and rebuild the int32 array ON DEVICE with two cumsums. Halves the
bytes on the wire for any weather.

Wire format per row-range segment (segments keep every device temp
< ~0.5 GB so the 10M-doc corpus, 1.017B postings, decodes without an
HBM spike):

  low      u16 (E,)   delta to the previous element; 0 at row starts
  starts   i32 (R,)   segment-local offsets of NON-EMPTY rows, ascending
  firsts   i32 (R,)   absolute first doc id of those rows
  exc_idx  i32 (X,)   positions whose delta >= 2^16 (interior only)
  exc_high i32 (X,)   the missing high bits (delta >> 16)

Decode (all on device, shapes padded to pow2 buckets so the jit
compiles a handful of shapes total):

  d    = low + (exc_high << 16 scattered at exc_idx)
  c    = cumsum(d)                    # row-crossing garbage in c ...
  base = cumsum(scatter(diff(firsts - c[starts]) at starts))
  ids  = c + base                     # ... cancelled per row by base

For element i of row r: base[i] = firsts[r] - c[starts[r]], so
ids[starts[r]] = firsts[r] and interior elements add their deltas.

There is no reference analog — MygramDB's PostingList lives in host RAM
(src/index/posting_list.h); the wire problem is tunnel-specific.
"""

from __future__ import annotations

import os

import numpy as np

# Segment cap: decoded i32 temp = 4 * _MAX_SEG_E bytes (512 MB).
_MAX_SEG_E = 1 << 27
_MIN_E = 1 << 16
# Below this many bytes the plain chunked put wins (pack + extra
# dispatch overhead, plus one more compiled program per shape).
_MIN_WIRE_BYTES = 32 << 20

_decode_cache: dict = {}


def _bucket(n: int, floor: int = 1) -> int:
    b = floor
    while b < n:
        b <<= 1
    return b


def _decode_fn(Ep: int, Rp: int, Xp: int):
    key = (Ep, Rp, Xp)
    fn = _decode_cache.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    def decode(low, starts, firsts, exc_idx, exc_high):
        # NB: padded index slots hold the duplicate sentinel Ep, so
        # unique_indices must stay False (duplicates + unique_indices is
        # undefined per the scatter contract even under mode="drop").
        d = low.astype(jnp.int32)
        d = d.at[exc_idx].add(
            jnp.left_shift(exc_high, 16), mode="drop",
            indices_are_sorted=True)
        c = jnp.cumsum(d)
        base_at = firsts - jnp.where(starts < Ep, c[jnp.minimum(
            starts, Ep - 1)], 0)
        bd = jnp.concatenate([base_at[:1], jnp.diff(base_at)])
        z = jnp.zeros((Ep,), jnp.int32).at[starts].add(
            bd, mode="drop", indices_are_sorted=True)
        return c + jnp.cumsum(z)

    fn = jax.jit(decode, donate_argnums=(0,))
    _decode_cache[key] = fn
    return fn


def _pack_segment(post: np.ndarray, starts_loc: np.ndarray,
                  scratch: np.ndarray):
    """post (E,) i32 segment; starts_loc segment-local non-empty row
    starts (ascending, first == 0 unless the segment starts mid-... it
    never does: segments split at row boundaries). Returns the wire
    tuple. `scratch` is a caller-owned i32 buffer >= E reused across
    segments (first-touch pages cost ~35 MB/s on this VM — allocate
    once)."""
    E = post.size
    d = scratch[:E]
    np.subtract(post[1:], post[:-1], out=d[1:])
    d[0] = 0
    d[starts_loc] = 0  # row starts carry no delta (firsts are absolute)
    if np.any(d < 0):
        # Violated sorted-per-term precondition: a negative delta would
        # be silently truncated to its low 16 bits and corrupt doc ids
        # on device. Degrade to the raw transport instead.
        return None
    exc_idx = np.nonzero(d >= (1 << 16))[0].astype(np.int32)
    exc_high = np.right_shift(d[exc_idx], 16).astype(np.int32)
    low = d.astype(np.uint16)  # truncates exception highs; restored dev-side
    firsts = post[starts_loc].astype(np.int32)
    return low, starts_loc.astype(np.int32), firsts, exc_idx, exc_high


def delta_put_postings(postings: np.ndarray, offsets: np.ndarray,
                       lengths: np.ndarray, target, tail=None,
                       detail: dict | None = None):
    """Drop-in for runtime.chunked_device_put(postings, target, tail=...)
    when target is a single device: ships u16 deltas + per-row firsts and
    decodes on device. Returns the int32 device array (with `tail`
    appended). Falls back to the raw chunked put for sharded targets,
    small arrays, or MYGRAM_DISABLE_U16_WIRE=1."""
    import jax
    from . import runtime

    sharded = target is not None and not isinstance(target, jax.Device)
    if (sharded or not isinstance(postings, np.ndarray)
            or postings.dtype != np.int32
            or postings.size == 0
            or postings.nbytes < _MIN_WIRE_BYTES
            or os.environ.get("MYGRAM_DISABLE_U16_WIRE") == "1"):
        # size == 0 is already below _MIN_WIRE_BYTES, but keep the
        # explicit guard: the segment loop below assumes >= 1 part.
        return runtime.chunked_device_put(postings, target, tail=tail)

    import jax.numpy as jnp

    E_total = postings.size
    nz = lengths > 0
    row_starts = offsets[nz].astype(np.int64)

    # split at row boundaries into segments of <= _MAX_SEG_E elements
    seg_bounds = [0]
    while seg_bounds[-1] < E_total:
        lo = seg_bounds[-1]
        hi = min(lo + _MAX_SEG_E, E_total)
        if hi < E_total:
            # last row start <= hi becomes the boundary: rows never span
            # segments (a spanning row would break the per-segment d[0]=0
            # reset). A single row longer than the cap (df > 134M docs)
            # cannot be split — take the raw path instead.
            k = int(np.searchsorted(row_starts, hi, side="right")) - 1
            if row_starts[k] <= lo:
                return runtime.chunked_device_put(postings, target,
                                                  tail=tail)
            hi = int(row_starts[k])
        seg_bounds.append(hi)

    # Preallocate the final decoded buffer and donate-update each
    # segment into it: the old per-segment parts + concatenate pattern
    # left multi-hundred-MB arena holes (see runtime.chunked_device_put's
    # fragmentation note — the r5 10M OOM).
    tail_n = 0 if tail is None else int(tail.shape[0])
    with jax.default_device(target if isinstance(target, jax.Device)
                            else None):
        import jax.numpy as _jnp
        buf = _jnp.zeros((E_total + tail_n,), dtype=_jnp.int32)

    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def _upd(b, c, i):
        return jax.lax.dynamic_update_slice(b, c, (i,))

    scratch = np.empty(min(_MAX_SEG_E, E_total), dtype=np.int32)
    wire_bytes = 0
    for lo, hi in zip(seg_bounds[:-1], seg_bounds[1:]):
        E = hi - lo
        a = int(np.searchsorted(row_starts, lo, side="left"))
        b = int(np.searchsorted(row_starts, hi, side="left"))
        starts_loc = (row_starts[a:b] - lo).astype(np.int64)
        packed = _pack_segment(postings[lo:hi], starts_loc, scratch)
        if packed is None:  # unsorted row: precondition violated
            return runtime.chunked_device_put(postings, target, tail=tail)
        low, st, fi, xi, xh = packed
        Ep = _bucket(E, _MIN_E)
        Rp = _bucket(max(st.size, 1), 1 << 12)
        Xp = _bucket(max(xi.size, 1), 1 << 10)
        st_p = np.full(Rp, Ep, dtype=np.int32)
        st_p[:st.size] = st
        fi_p = np.zeros(Rp, dtype=np.int32)
        fi_p[:fi.size] = fi
        xi_p = np.full(Xp, Ep, dtype=np.int32)
        xi_p[:xi.size] = xi
        xh_p = np.zeros(Xp, dtype=np.int32)
        xh_p[:xh.size] = xh
        wire_bytes += low.nbytes + st_p.nbytes + fi_p.nbytes + \
            xi_p.nbytes + xh_p.nbytes
        # Pad low to the Ep bucket ON DEVICE: a host np.concatenate here
        # is the first-touch-allocation stall 061a9eb eliminated (pad can
        # approach 100% of E just above a pow2 bucket), and shipping
        # explicit zeros would waste wire on a 0.26-20 MB/s link. The
        # padded cells only feed cumsum garbage that ids[:E] slices off.
        low_dev = runtime.chunked_device_put(low, target)
        if Ep != E:
            with jax.default_device(target):
                low_dev = jnp.concatenate(
                    [low_dev, jnp.zeros(Ep - E, jnp.uint16)])
        ids = _decode_fn(Ep, Rp, Xp)(
            low_dev, jax.device_put(st_p, target),
            jax.device_put(fi_p, target), jax.device_put(xi_p, target),
            jax.device_put(xh_p, target))
        buf = _upd(buf, ids if Ep == E else ids[:E], jnp.int32(lo))
    if tail is not None:
        buf = _upd(buf, jax.device_put(
            np.ascontiguousarray(tail).astype(np.int32), target),
            jnp.int32(E_total))
    if detail is not None:
        detail["postings_wire_mb"] = round(wire_bytes / 2 ** 20, 1)
    return buf
