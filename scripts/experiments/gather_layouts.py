"""Microbenchmark: MSM sort+gather layout options on the axon chip.

Measures, at the v3/v5 chunk scale (flat = W*N = 1.31M elements):
  1. int32 key sort (1.31M keys)
  2. column gather, (3L, flat) f32      -- the v3 sortg data path
  3. column gather, (2L, flat) bf16     -- the v5 data path
  4. row gather, (flat, 128) bf16       -- row-major alternative
  5. row gather + transpose back to (2L, flat)

Run: PYTHONPATH=.:/root/.axon_site python scripts/experiments/gather_layouts.py
"""
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FLAT = 20 * 65536


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench(label, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 8192, FLAT, dtype=np.int32))
    perm_np = rng.permutation(FLAT).astype(np.int32)
    perm = jnp.asarray(perm_np)

    f32col = jnp.asarray(rng.integers(0, 255, (99, FLAT)).astype(np.float32))
    b16col = jnp.asarray(
        rng.integers(0, 255, (66, FLAT)).astype(np.float32)).astype(
        jnp.bfloat16)
    b16row = jnp.asarray(
        rng.integers(0, 255, (FLAT, 128)).astype(np.float32)).astype(
        jnp.bfloat16)

    iota = jax.lax.iota(jnp.int32, FLAT)
    bench("sort 1.31M int32 keys",
          jax.jit(lambda k: jax.lax.sort_key_val(k, iota)[1]), keys)
    bench("col-gather (99, flat) f32  [519 MB]",
          jax.jit(lambda b, p: b[:, p]), f32col, perm)
    bench("col-gather (66, flat) bf16 [173 MB]",
          jax.jit(lambda b, p: b[:, p]), b16col, perm)
    bench("row-gather (flat, 128) bf16 [336 MB]",
          jax.jit(lambda b, p: b[p, :]), b16row, perm)
    bench("row-gather + transpose to (128, flat)",
          jax.jit(lambda b, p: b[p, :].T), b16row, perm)
    # the v5 leaf reshape: (2L, S*MB) -> (S, 2L, MB)
    bench("col-gather bf16 + leaf transpose",
          jax.jit(lambda b, p: jnp.transpose(
              b[:, p].reshape(66, 256, FLAT // 256), (1, 0, 2))),
          b16col, perm)


if __name__ == "__main__" and not __import__("os").environ.get(
        "QUILL_PROBES"):
    main()


def extra_probes():
    """Program-overhead + batched-sort probes (round-3 follow-up)."""
    rng = np.random.default_rng(1)
    tiny = jnp.ones((8, 128), jnp.float32)
    bench("XLA trivial (x+1 on 4KB)", jax.jit(lambda x: x + 1.0), tiny)
    big = jnp.asarray(rng.integers(0, 255, (99, FLAT)).astype(np.float32))
    bench("XLA elementwise 519MB (x+1)", jax.jit(lambda x: x + 1.0), big)
    keys1 = jnp.asarray(rng.integers(0, 8192, FLAT, dtype=np.int32))
    bench("sort single-int32 (no payload) 1.31M",
          jax.jit(lambda k: jax.lax.sort(k)), keys1)
    keys16 = jnp.asarray(rng.integers(0, 8192, (16, FLAT), dtype=np.int32))
    iota = jax.lax.iota(jnp.int32, FLAT)
    bench("sort_key_val vmapped (16, 1.31M)",
          jax.jit(lambda k: jax.lax.sort_key_val(
              k, jnp.broadcast_to(iota, k.shape), dimension=1)[1]), keys16)
    keys4 = keys16[:4]
    bench("sort_key_val vmapped (4, 1.31M)",
          jax.jit(lambda k: jax.lax.sort_key_val(
              k, jnp.broadcast_to(iota, k.shape), dimension=1)[1]), keys4)
    b16 = jnp.asarray(rng.integers(0, 255, (4, 66, FLAT)).astype(
        np.float32)).astype(jnp.bfloat16)
    perm4 = jnp.asarray(
        np.stack([rng.permutation(FLAT) for _ in range(4)]).astype(np.int32))
    bench("batched col-gather (4, 66, flat) bf16",
          jax.jit(jax.vmap(lambda b, p: b[:, p])), b16, perm4)


if __name__ == "__main__" and __import__("os").environ.get("QUILL_PROBES"):
    extra_probes()
