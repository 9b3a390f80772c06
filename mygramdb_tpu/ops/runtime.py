"""Backend/platform selection for the ops layer."""

from __future__ import annotations

import functools
import os

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


def chunked_device_put(arr, target, chunk_bytes: int = _PUT_CHUNK_BYTES):
    """device_put `arr` (host numpy) in ~chunk_bytes row slabs, then
    reassemble on device with one concatenate. Equivalent to
    jax.device_put(arr, target) but ~50x faster for multi-hundred-MB
    arrays on tunneled backends. Falls through to a plain put for small
    arrays or non-numpy inputs. Chunks split along axis 0."""
    import jax
    import numpy as np
    if not isinstance(arr, np.ndarray) or arr.nbytes <= chunk_bytes \
            or arr.shape[0] < 2:
        return jax.device_put(arr, target)
    if target is not None and not isinstance(target, jax.Device):
        # sharding target: chunking would shard each CHUNK over the mesh
        # instead of the whole array — keep the one-shot put
        return jax.device_put(arr, target)
    rows_per = max(1, chunk_bytes // max(arr.nbytes // arr.shape[0], 1))
    n = arr.shape[0]
    parts = [jax.device_put(np.ascontiguousarray(arr[i:i + rows_per]),
                            target)
             for i in range(0, n, rows_per)]
    if len(parts) == 1:
        return parts[0]
    import jax.numpy as jnp
    out = jnp.concatenate(parts)
    if target is not None:
        out = jax.device_put(out, target)  # no-op when already placed
    return out


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
