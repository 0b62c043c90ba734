"""Shared JAX runtime config: the persistent compilation cache.

Mosaic/XLA compiles for the device kernels take seconds (CPU/XLA) to
minutes (the axon remote Pallas compile service) PER PROCESS; the
persistent cache makes each a one-time per-machine cost.  Backends that
cannot serialize executables skip the cache with a JAX warning — never an
error — so enabling it unconditionally is safe.

SAVONT_NO_JAX_CACHE=1 opts out; JAX_COMPILATION_CACHE_DIR overrides the
location (default ~/.cache/savont_tpu/jax).
"""
from __future__ import annotations

import os

_DONE = False


def ensure_jax_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    if os.environ.get("SAVONT_NO_JAX_CACHE"):
        return
    try:
        import jax

        # CPU excluded: XLA:CPU AOT entries embed host machine-feature
        # lists that vary across processes (prefer-no-scatter etc.), and a
        # mismatched load warns about possible SIGILL — CPU compiles are
        # seconds anyway.  TPU/axon is where the cache pays (remote kernel
        # compiles are minutes; measured 385 s -> 4 s fresh-process start).
        if jax.default_backend() == "cpu":
            return
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "savont_tpu", "jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # compiles under a second aren't worth the disk round-trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # the cache is purely an optimization
        pass
