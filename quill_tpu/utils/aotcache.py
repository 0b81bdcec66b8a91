"""AOT kernel cache: skip per-process trace + MLIR lowering of big kernels.

The XLA persistent compilation cache only caches the *compiled executable*;
every process still pays Python tracing and Pallas/Mosaic MLIR lowering to
reconstruct the module before the cache key can even be computed -- measured
at 30-50s per process for the MSM kernel family alone (the kernel bodies
inline ~10^5 limb ops).  `jax.export` serializes the fully-lowered module
(StableHLO + embedded Mosaic payloads); reloading it costs milliseconds and
the wrapped module still hits the XLA executable cache.

Usage: wrap a top-level jit-style function whose arguments are plain arrays

    run = aot_wrap("msm8.sort_gather", run)

Keys include a hash of the kernel's source dependencies and the jax
version.  By default that is every quill_tpu source file, so any edit
invalidates the entry (correctness over reuse); kernel families whose
lowering only depends on a few subpackages pass `deps=("ec", "fields",
"utils")`-style lists so edits to unrelated layers (engine orchestration,
piops, pcs) keep their multi-minute exports warm.  Disabled on the CPU
backend (tests run interpret-mode Pallas there; exports are
platform-specific) and via QUILL_AOT_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import jax
import jax.numpy as jnp

_CODE_HASHES: dict = {}


def _dep_paths(deps: tuple | None,
               root: pathlib.Path | None = None) -> list:
    """The source files a deps tuple covers (dirs expand recursively)."""
    if root is None:
        root = pathlib.Path(__file__).resolve().parent.parent
    if deps is None:
        return sorted(root.rglob("*.py"))
    paths = []
    for d in deps:
        p = root / d
        if p.is_dir():
            paths.extend(sorted(p.rglob("*.py")))
        else:
            paths.append(p)
    return paths


def _hash_paths(paths: list, root: pathlib.Path) -> str:
    hs = hashlib.sha256(jax.__version__.encode())
    for p in paths:
        hs.update(str(p.relative_to(root)).encode())
        hs.update(p.read_bytes())
    return hs.hexdigest()[:16]


def _code_hash(deps: tuple | None) -> str:
    h = _CODE_HASHES.get(deps)
    if h is None:
        root = pathlib.Path(__file__).resolve().parent.parent
        h = _hash_paths(_dep_paths(deps, root), root)
        _CODE_HASHES[deps] = h
    return h


def _cache_dir() -> pathlib.Path:
    d = os.environ.get(
        "QUILL_AOT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "quill_tpu_aot"))
    p = pathlib.Path(d)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _enabled() -> bool:
    if os.environ.get("QUILL_AOT_CACHE", "1") == "0":
        return False
    return jax.default_backend() != "cpu"


class _AotCall:
    def __init__(self, name: str, fn, deps: tuple | None = None):
        self._name = name
        self._jit = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
        self._deps = deps
        self._per_sig: dict = {}

    def __call__(self, *args):
        if not _enabled():
            return self._jit(*args)
        leaves = jax.tree_util.tree_leaves(args)
        sig = tuple((tuple(jnp.shape(a)), jnp.result_type(a).name)
                    for a in leaves)
        call = self._per_sig.get(sig)
        if call is None:
            call = self._load_or_export(args, sig)
            self._per_sig[sig] = call
        return call(*args)

    def _load_or_export(self, args, sig):
        tag = hashlib.sha256(
            (self._name + repr(sig) + _code_hash(self._deps)).encode()
        ).hexdigest()[:24]
        path = _cache_dir() / f"{tag}.jaxexport"
        if path.exists():
            exp = jax.export.deserialize(path.read_bytes())
            return jax.jit(exp.call)
        shapes = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
            args)
        exp = jax.export.export(self._jit)(*shapes)
        blob = exp.serialize()
        tmp = path.with_suffix(".tmp")
        try:
            tmp.write_bytes(blob)
            tmp.replace(path)
        except OSError:
            pass
        return jax.jit(exp.call)


def aot_wrap(name: str, fn, deps: tuple | None = None) -> _AotCall:
    """Wrap a function of plain-array arguments (no static args) in the AOT
    export cache.  Equivalent to jax.jit(fn) semantically.  `deps` lists
    the quill_tpu subpackages / files whose sources the kernel's lowering
    depends on (default: the whole package)."""
    return _AotCall(name, fn, deps)
