"""Micro-probe: cost of the MSM data-movement primitives on the axon chip.

Separates the msm3 `sortg` stage (109 ms/chunk measured) into parts:
sort_key_val, permutation gathers at different row counts, int32 scatter,
histogram/cumsum machinery for a sort-free ranking pipeline, and raw
elementwise bandwidth for calibration.
"""
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 1 << 20  # one chunk's flat space ~ 1.31M; use 2^20 for round numbers
BINS = 1 << 13
TILE = 256


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0):
            np.asarray(jax.lax.slice(leaf, (0,) * leaf.ndim,
                                     (1,) * leaf.ndim))


def t(label, fn, *a, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*a)
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn_j(*a)
        _sync(out)
        times.append(time.time() - t0)
    print(f"{label}: {min(times)*1e3:.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, BINS, size=(N,), dtype=np.int32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    rows99 = jnp.asarray(rng.standard_normal((99, N)).astype(np.float32))
    rows66 = rows99[:66]
    rows8 = rows99[:8]

    print(f"N = {N}", flush=True)
    t("elementwise copy (99, N) f32 [calibration]", lambda x: x + 1.0, rows99)
    t("sort_key_val (N,) i32", lambda k: jax.lax.sort_key_val(
        k, jax.lax.iota(jnp.int32, N)), keys)
    t("sort (N,) i32 keys only", lambda k: jnp.sort(k), keys)
    t("gather (99, N) by perm", lambda x, p: x[:, p], rows99, perm)
    t("gather (66, N) by perm", lambda x, p: x[:, p], rows66, perm)
    t("gather (8, N) by perm", lambda x, p: x[:, p], rows8, perm)
    t("gather (1, N) by perm", lambda x, p: x[0, p], rows99, perm)
    # gather with the SAME index row used for all 99 rows via take along
    # a transposed layout: (N, 99) rows gathered by perm
    rows_t = jnp.asarray(np.ascontiguousarray(
        np.asarray(rows99).T))
    t("gather (N, 99) rows by perm [transposed layout]",
      lambda x, p: x[p, :], rows_t, perm)
    t("scatter i32: out[pos] = iota", lambda p: jnp.zeros(
        (N,), jnp.int32).at[p].set(jax.lax.iota(jnp.int32, N)), perm)
    t("scatter f32 rows (N, 8): out[pos] = val",
      lambda p, v: jnp.zeros((N, 8), jnp.float32).at[p].set(v),
      perm, jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32)))

    def within_tile_rank(k):
        k2 = k.reshape(N // TILE, TILE)
        less = (k2[:, None, :] == k2[:, :, None]) & (
            jax.lax.iota(jnp.int32, TILE)[None, None, :]
            < jax.lax.iota(jnp.int32, TILE)[None, :, None])
        return jnp.sum(less.astype(jnp.int32), axis=2)

    t("within-tile equal-rank (O(T^2) compares)", within_tile_rank, keys)

    t("searchsorted 8192 queries in sorted N",
      lambda k: jnp.searchsorted(k, jax.lax.iota(jnp.int32, BINS)),
      jnp.sort(keys))


if __name__ == "__main__":
    main()
