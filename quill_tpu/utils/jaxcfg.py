"""JAX configuration: persistent compilation cache + lazy import helpers.

The field kernels are large unrolled integer graphs (~2.5k HLO ops); per-op
compile is O(10s).  The engine keeps every kernel fixed-shape (chunked
execution) so each compiles once per process, and the persistent cache reuses
them across processes/rounds.
"""

from __future__ import annotations

import os

_CONFIGURED = False


def _host_fingerprint() -> str:
    """Short hash of the CPU's identity + feature flags.  XLA:CPU AOT blobs
    embed machine features; loading an entry compiled on a different CPU
    spews `cpu_aot_loader` mismatch errors and risks SIGILL (seen in the
    round-2 MULTICHIP logs when ~/.cache carried a previous machine's
    executables).  CPU-backend processes therefore use a per-machine cache
    subdir; TPU processes share the plain dir (their executables are
    compiled remotely for the one TPU type)."""
    import hashlib

    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    ident.append(line.strip())
                    if len(ident) >= 2:
                        break
    except OSError:
        import platform

        ident.append(platform.processor() or platform.machine())
    return hashlib.sha256("\n".join(ident).encode()).hexdigest()[:12]


def configure_jax() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    import jax

    cache_dir = os.environ.get(
        "QUILL_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                        "quill_tpu_jax_cache"))
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms:
        is_cpu = ("cpu" in platforms and "tpu" not in platforms
                  and "axon" not in platforms)
    else:
        # JAX_PLATFORMS unset: the process resolves to the axon TPU backend
        # only when the relay plugin is dialed in (sitecustomize requires
        # PALLAS_AXON_POOL_IPS and the `axon` module on the path); any
        # other unset-platform process falls back to XLA:CPU and must use
        # the per-machine cache subdir too (stale-AOT-blob hazard).
        import importlib.util

        has_axon = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
        if has_axon:
            try:
                has_axon = importlib.util.find_spec("axon") is not None
            except (ImportError, ValueError):
                has_axon = False
        is_cpu = not has_axon
    if is_cpu:
        cache_dir = f"{cache_dir}-cpu-{_host_fingerprint()}"
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
