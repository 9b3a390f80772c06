"""Backend/platform selection for the ops layer."""

from __future__ import annotations

import functools
import os


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
