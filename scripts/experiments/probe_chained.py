"""Chained-op probe: true pipelined costs of sort/gather/copy on the chip.

The first probe showed a ~27 ms sync floor per dispatch; here each op is
iterated K times INSIDE one jit (dependent chain, so XLA cannot elide), and
the per-iteration cost = (t(K) - t(1)) / (K - 1).
"""
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 1 << 20
K = 10


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0):
            np.asarray(jax.lax.slice(leaf, (0,) * leaf.ndim,
                                     (1,) * leaf.ndim))


def bench(label, make_fn, *args):
    f1 = jax.jit(make_fn(1))
    fk = jax.jit(make_fn(K))
    _sync(f1(*args)); _sync(fk(*args))
    t1s, tks = [], []
    for _ in range(3):
        t0 = time.time(); _sync(f1(*args)); t1s.append(time.time() - t0)
        t0 = time.time(); _sync(fk(*args)); tks.append(time.time() - t0)
    per = (min(tks) - min(t1s)) / (K - 1)
    print(f"{label}: {per*1e3:.2f} ms/iter   (t1={min(t1s)*1e3:.1f} "
          f"tK={min(tks)*1e3:.1f})", flush=True)


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 13, size=(N,), dtype=np.int32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    rows99 = jnp.asarray((rng.integers(0, 256, size=(99, N)))
                         .astype(np.float32))
    rows66b = rows99[:66].astype(jnp.bfloat16)

    def mk_copy(k):
        def f(x):
            for _ in range(k):
                x = x + 1.0
            return x
        return f

    def mk_sortkv(k):
        def f(kk):
            for _ in range(k):
                kk, v = jax.lax.sort_key_val(kk, jax.lax.iota(jnp.int32, N))
                kk = kk ^ (v & 1)  # dependency, cheap
            return kk
        return f

    def mk_sort_rows(k):
        def f(kk):
            kk2 = kk.reshape(20, N // 20 // 128 * 128)
            for _ in range(k):
                kk2 = jnp.sort(kk2, axis=1) ^ 1
            return kk2
        return f

    def mk_gather99(k):
        def f(x, p):
            for _ in range(k):
                x = x[:, p]
            return x
        return f

    def mk_gather66b(k):
        def f(x, p):
            for _ in range(k):
                x = x[:, p]
            return x
        return f

    def mk_scatter(k):
        def f(p):
            out = jnp.zeros((N,), jnp.int32)
            for _ in range(k):
                out = out.at[p].set(jax.lax.iota(jnp.int32, N) + out[0])
            return out
        return f

    bench("copy+1 (99, 2^20) f32 [831MB rw]", mk_copy, rows99)
    bench("sort_key_val 2^20 i32", mk_sortkv, keys)
    bench("20 row-sorts of 52k  [one dispatch]", mk_sort_rows, keys)
    bench("gather (99, 2^20) f32 by perm", mk_gather99, rows99, perm)
    bench("gather (66, 2^20) bf16 by perm", mk_gather66b, rows66b, perm)
    bench("scatter i32 2^20", mk_scatter, perm)


if __name__ == "__main__":
    main()
