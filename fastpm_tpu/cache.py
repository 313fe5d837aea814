"""Persistent XLA compilation cache (jax_compilation_cache_dir).

On the axon-tunneled TPU terminal every XLA program compiles on a
remote helper at ~40-70 s per program; the persistent cache makes
repeat runs (CLI invocations, bench, tests) skip that entirely.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/fastpm_tpu_xla")


def enable_compilation_cache(path: str = None) -> None:
    """Best-effort enablement; harmless if unsupported.

    OPT-IN via FASTPM_TPU_XLA_CACHE=1: on the axon terminal the cache
    write path can hang the remote compile helper for large programs,
    so it must not be on by default."""
    if os.environ.get("FASTPM_TPU_XLA_CACHE") != "1":
        return
    import jax
    try:
        os.makedirs(path or _DEFAULT, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
