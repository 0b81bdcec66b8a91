"""Round-4 MSM experiments, part 2: the primitives that survived part 1.

1. Pallas-internal MXU bf16 matmul rate (is the 5 TFLOP/s XLA number an
   XLA-path artifact?).
2. Pallas one-hot tile permute: gather 2048 rows of 64 bf16 via a
   (2048x2048) one-hot matmul built in-kernel from iota==idx.
3. tpu.dynamic_gather envelope: take_along_axis at small shapes, axis 0/1.
4. XLA gather per-row cost vs row width (is it per-row or per-byte?).
5. Point-add rate sanity (pt_add_stacked on 2^20 lanes).

Run: PYTHONPATH=.:/root/.axon_site python scripts/experiments/exp_gather2.py
"""

import functools
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def bench(name, fn, *args, reps=8):
    try:
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"[OK] {name}: {dt*1e3:.3f} ms/call", flush=True)
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)
        return None


# --- 1: Pallas matmul ------------------------------------------------------


def pallas_matmul(m, k, n, grid_m):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            grid=(m // grid_m,),
            in_specs=[pl.BlockSpec((grid_m, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((grid_m, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(a, b)

    return run


# --- 2: Pallas one-hot tile permute ---------------------------------------


def onehot_permute(tiles, t, rows):
    """(tiles*t, rows) bf16 data + (tiles*t,) int32 idx (tile-local) ->
    permuted rows per tile via one-hot matmul."""
    def kernel(d_ref, i_ref, o_ref):
        iot = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        oh = (i_ref[:].reshape(t, 1) == iot).astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(oh, d_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    @jax.jit
    def run(data, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((tiles * t, rows), jnp.bfloat16),
            grid=(tiles,),
            in_specs=[pl.BlockSpec((t, rows), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((t,), lambda i: (i,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((t, rows), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(data, idx)

    return run


# --- 3: dynamic_gather envelope -------------------------------------------


def taa(rows, cols, axis, dtype=jnp.float32):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=axis)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def taa_grid(rows, cols, axis, tiles):
    """Grid version: many independent (rows, cols) shuffles."""
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=axis)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((tiles * rows, cols),
                                           jnp.float32),
            grid=(tiles,),
            in_specs=[pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # 1: Pallas matmul rate
    m, k, n = 8192, 2048, 512
    a = jnp.asarray(rng.random((m, k), dtype=np.float32), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.random((k, n), dtype=np.float32), dtype=jnp.bfloat16)
    dt = bench(f"1 pallas matmul {m}x{k}x{n} bf16", pallas_matmul(m, k, n, 512),
               a, b)
    if dt:
        print(f"    -> {2*m*k*n/dt/1e12:.1f} TFLOP/s", flush=True)

    # 2: one-hot tile permute, t=2048, rows=64, 32 tiles (65536 elements)
    tiles, t, rows = 32, 2048, 64
    data = jnp.asarray(rng.random((tiles * t, rows), dtype=np.float32),
                       dtype=jnp.bfloat16)
    idx = np.concatenate([rng.permutation(t) for _ in range(tiles)])
    idx = jnp.asarray(idx.astype(np.int32))
    dt = bench(f"2 pallas onehot permute {tiles}x{t}x{rows}",
               onehot_permute(tiles, t, rows), data, idx)
    if dt:
        tot = tiles * t
        print(f"    -> {tot/dt/1e6:.1f} M rows/s "
              f"({2*tiles*t*t*rows/dt/1e12:.1f} TFLOP/s)", flush=True)

    # 3: dynamic_gather envelope
    for rows_, cols_, axis in [(8, 128, 0), (32, 128, 0), (64, 128, 0),
                               (128, 128, 0), (512, 128, 0),
                               (8, 128, 1), (32, 128, 1), (64, 256, 0),
                               (32, 1024, 0)]:
        tb = jnp.asarray(rng.random((rows_, cols_), dtype=np.float32))
        ix = jnp.asarray(rng.integers(
            0, rows_ if axis == 0 else cols_,
            (rows_, cols_)).astype(np.int32))
        bench(f"3 taa axis{axis} ({rows_}x{cols_})", taa(rows_, cols_, axis),
              tb, ix)

    # 3b: grid of many (32,128) sublane shuffles -> rate
    tiles2 = 256
    tb = jnp.asarray(rng.random((tiles2 * 32, 128), dtype=np.float32))
    ix = jnp.asarray(rng.integers(0, 32, (tiles2 * 32, 128)).astype(np.int32))
    dt = bench("3b grid taa axis0 256x(32x128)", taa_grid(32, 128, 0, tiles2),
               tb, ix)
    if dt:
        print(f"    -> {tiles2*32*128/dt/1e6:.1f} M elems/s", flush=True)

    # 4: XLA gather row-width scaling (const total bytes gathered)
    for rows_, cols_ in [(1 << 19, 128), (1 << 17, 512), (1 << 15, 2048)]:
        nout = 16384
        tb = jnp.asarray(rng.random((rows_, cols_), dtype=np.float32))
        ix = jnp.asarray(rng.integers(0, rows_, nout).astype(np.int32))

        @jax.jit
        def g(tb, ix):
            return jnp.take(tb, ix, axis=0)

        dt = bench(f"4 xla take rows of {cols_*4}B", g, tb, ix)
        if dt:
            print(f"    -> {nout/dt/1e6:.2f} M rows/s, "
                  f"{nout*cols_*4/dt/1e9:.1f} GB/s", flush=True)

    # 5: point-add rate (existing kernel)
    from quill_tpu.fields import pallas8 as p8
    n5 = 1 << 20
    x = jnp.asarray(rng.integers(0, 255, (99, n5)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 255, (99, n5)).astype(np.float32))
    dt = bench("5 pt_add_stacked 2^20", p8.pt_add_stacked, x, y, reps=4)
    if dt:
        print(f"    -> {n5/dt/1e6:.1f} M adds/s", flush=True)

    # 6: XLA sort_key_val 2^20 (per-chunk scale)
    n6 = 1 << 20
    keys = jnp.asarray(rng.integers(0, 1 << 30, n6).astype(np.int32))
    iota = jnp.arange(n6, dtype=jnp.int32)

    @jax.jit
    def kv(k, v):
        return jax.lax.sort_key_val(k, v)

    dt = bench("6 xla sort_key_val 2^20", kv, keys, iota)
    if dt:
        print(f"    -> {n6/dt/1e6:.0f} M keys/s", flush=True)


if __name__ == "__main__":
    main()
