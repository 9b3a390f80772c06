"""Backend/platform selection for the ops layer."""

from __future__ import annotations

import functools
import os
import time as _time

_cache_configured = False


def configure_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache: compiles survive process restarts,
    which matters doubly on tunneled TPU backends where every compile is a
    network roundtrip."""
    global _cache_configured
    if _cache_configured:
        return
    import jax
    try:
        if jax.default_backend() == "cpu":
            # CPU AOT artifacts are machine-feature specific (SIGILL risk
            # across hosts) and CPU compiles are fast anyway — skip.
            _cache_configured = True
            return
    except Exception:
        return
    cache_dir = path or os.environ.get(
        "MYGRAM_XLA_CACHE", os.path.expanduser("~/.cache/mygramdb_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _cache_configured = True
    except Exception:
        pass


@functools.lru_cache(maxsize=1)
def backend() -> str:
    import jax
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


@functools.lru_cache(maxsize=1)
def is_tpu() -> bool:
    b = backend()
    # the axon tunnel reports TPU devices under a custom platform name
    if b in ("tpu", "axon"):
        return True
    try:
        import jax
        return any(d.platform in ("tpu", "axon") or "TPU" in str(d)
                   for d in jax.devices())
    except Exception:
        return False


def use_pallas() -> bool:
    """Pallas kernels only on real TPU (interpret mode is for tests only)."""
    if os.environ.get("MYGRAM_FORCE_PALLAS") == "1":
        return True
    if os.environ.get("MYGRAM_DISABLE_PALLAS") == "1":
        return False
    return is_tpu()


# Host->device transfers over the axon tunnel collapse on large one-shot
# puts: a single 256 MB device_put measured 201 s (1.3 MB/s) while the
# SAME bytes as 32 MB chunks took 3.6 s (71 MB/s) — e2e/profile_upload.py.
# Threading the chunks adds nothing (serial chunks already saturate), so
# the helper is deliberately sequential.
_PUT_CHUNK_BYTES = 32 << 20


def chunked_device_put(arr, target, chunk_bytes: int = _PUT_CHUNK_BYTES,
                       tail=None):
    """device_put `arr` (host numpy) in ~chunk_bytes row slabs, then
    reassemble on device with one concatenate. Equivalent to
    jax.device_put(np.concatenate([arr, tail]), target) but far faster
    for multi-hundred-MB arrays on tunneled backends. Falls through to a
    plain put for small arrays or non-numpy inputs. Chunks split along
    axis 0.

    `tail` (optional small numpy array, same trailing dims): sentinel
    padding appended ON DEVICE — callers must never np.concatenate a
    pad tail onto a large host array first: the fresh first-touch
    allocation stalls at ~1 MB/s under VM memory weather (a 447 MB
    pad_postings concatenate measured 396 s; the same bytes as borrowed
    chunk views + a device-side concat take ~6 s)."""
    import jax
    import numpy as np
    if not isinstance(arr, np.ndarray):
        assert tail is None
        return jax.device_put(arr, target)
    sharded = target is not None and not isinstance(target, jax.Device)
    if arr.nbytes <= chunk_bytes or arr.shape[0] < 2 or sharded:
        # sharding target: chunking would shard each CHUNK over the mesh
        # instead of the whole array — keep the one-shot put
        if tail is not None:
            arr = np.concatenate([arr, tail])  # small here
        return jax.device_put(arr, target)
    rows_per = max(1, chunk_bytes // max(arr.nbytes // arr.shape[0], 1))
    n = arr.shape[0]
    debug = os.environ.get("MYGRAM_PUT_DEBUG") == "1"
    t0 = _time.time() if debug else 0.0
    # Preallocate the FINAL buffer on device and donate-update chunks
    # into it. The old parts-list + concatenate pattern left the freed
    # 32 MB chunk buffers as permanent arena holes — after a 10M-doc
    # upload (~7.5 GB of chunked arrays) the device could not satisfy a
    # 256 MB request with gigabytes nominally free (measured r5:
    # headroom 0.0 GB after build, RESOURCE_EXHAUSTED on the first
    # verified dispatch). One contiguous allocation per array + a
    # recycled per-chunk staging buffer leaves the arena clean.
    import jax.numpy as jnp
    from jax import lax
    tail_rows = 0 if tail is None else tail.shape[0]
    final_shape = (n + tail_rows,) + arr.shape[1:]
    with jax.default_device(target if isinstance(target, jax.Device)
                            else None):
        buf = jnp.zeros(final_shape, dtype=arr.dtype)

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=())
    def upd(b, c, i):
        idx = (i,) + (0,) * (b.ndim - 1)
        return lax.dynamic_update_slice(b, c, idx)

    for i in range(0, n, rows_per):
        chunk = np.ascontiguousarray(arr[i:i + rows_per])
        buf = upd(buf, jax.device_put(chunk, target), jnp.int32(i))
    if tail is not None:
        buf = upd(buf, jax.device_put(np.ascontiguousarray(tail), target),
                  jnp.int32(n))
    if debug:
        np.asarray(jax.device_get(buf.ravel()[:1]))
        import sys
        print(f"# chunked_put {arr.nbytes >> 20} MB in "
              f"{_time.time() - t0:.2f}s "
              f"({arr.nbytes / 2 ** 20 / max(_time.time() - t0, 1e-9):.1f}"
              " MB/s)", file=sys.stderr, flush=True)
    return buf


class _DispatchCounter:
    """Process-wide count of device dispatches issued by the ops layer.

    On tunneled backends every dispatch costs a network RTT, so the number
    of sequential dispatches per query IS the latency structure of the
    engine — e2e gates bound it (environment-independently) instead of
    wall-clock that mostly measures the tunnel. Incremented by the ops-
    layer entry points (search, verify, TF/score, threshold); plain int
    += under the GIL is atomic enough for gating purposes.
    """

    __slots__ = ("count",)

    def __init__(self) -> None:
        self.count = 0

    def bump(self, n: int = 1) -> None:
        self.count += n


dispatches = _DispatchCounter()


def transport_stamp(device=None, mb: int = 8, n_rtt: int = 5) -> dict:
    """Measure tunnel transport health for embedding in bench artifacts.

    Every performance record must carry its own weather evidence (r4
    verdict weak #1: trend regressions were attributed to tunnel weather
    with no proof in the artifact). Returns
    {h2d_MBps, d2h_MBps, rtt_ms, when} or {"error": ...}; costs ~2*mb MB
    of wire plus n_rtt tiny dispatches, so call it once per bench run.

    rtt_ms is the min over n_rtt single-scalar pulls of an already-
    computed device value — the per-dispatch floor that batching
    amortizes (block_until_ready lies on the axon backend; np.asarray of
    a fresh result is the only truthful sync, see CLAUDE.md).
    """
    import time
    import numpy as np
    try:
        import jax
        import jax.numpy as jnp
        dev = device or jax.devices()[0]
        x = np.arange((mb << 20) // 4, dtype=np.int32)
        t0 = time.perf_counter()
        d = jax.device_put(x, dev)
        d.block_until_ready()
        np.asarray(d[-1:])  # force the put to have really landed
        t1 = time.perf_counter()
        # pull a COMPUTED alias: np.asarray of the raw put can answer
        # from the cached host buffer without touching the wire
        _ = np.asarray(d + 0)
        t2 = time.perf_counter()
        # RTT must pull a freshly COMPUTED device value each time: a
        # device_put array (and any already-pulled result) answers from
        # the cached host copy with no round trip at all (measured
        # rtt=0.0 ms), and block_until_ready lies on axon.
        f = jax.jit(lambda v, i: v[:1] + i)
        np.asarray(f(d, 0))  # compile
        rtts = []
        for _i in range(1, n_rtt + 1):
            t = time.perf_counter()
            np.asarray(f(d, _i))
            rtts.append(time.perf_counter() - t)
        return {
            "h2d_MBps": round(mb / max(t1 - t0, 1e-9), 2),
            "d2h_MBps": round(mb / max(t2 - t1, 1e-9), 2),
            "rtt_ms": round(min(rtts) * 1000, 2),
            "when": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
    except Exception as e:  # never sink a bench run on a weather probe
        return {"error": repr(e)[:200]}


def amortized_device_us(step, m: int = 8) -> float:
    """Amortized per-dispatch device time for a zero-arg dispatch fn:
    queue m dispatches back-to-back and force only the LAST result, then
    divide. Single-shot np.asarray walls are RTT-floored (~35-50 ms) and
    block_until_ready returns early on the axon backend, so this is the
    only honest kernel-time measure over the tunnel (r3 hard-won note).
    The caller must have warmed/compiled `step` already."""
    import time
    import numpy as np
    t0 = time.perf_counter()
    out = None
    for _ in range(m):
        out = step()
    # force materialization of one leaf of the last result only
    leaf = out
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    np.asarray(leaf)
    return (time.perf_counter() - t0) / m * 1e6
