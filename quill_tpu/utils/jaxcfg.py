"""JAX configuration: persistent compilation cache + lazy import helpers.

The field kernels are large unrolled integer graphs (~2.5k HLO ops); per-op
compile is O(10s).  The engine keeps every kernel fixed-shape (chunked
execution) so each compiles once per process, and the persistent cache reuses
them across processes/rounds.
"""

from __future__ import annotations

import os

_CONFIGURED = False


def configure_jax() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    import jax

    cache_dir = os.environ.get(
        "QUILL_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                        "quill_tpu_jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
