"""Round-4 MSM experiments, part 3: pin down the MXU peak and the last
movement primitives.

1. Compute-bound Pallas matmul (VMEM-resident, K-looped in kernel): the
   true MXU rate -- decides whether one-hot permutes can ever be cheap.
2. dynamic_gather axis=1 rate at scale (grid of (32,128) lane shuffles).
3. Dynamic-offset VMEM stores in a fori loop (run-copy viability).
4. XLA column gather (v5's layout) at 2^20: reconfirm ns/element.
5. Roll-based lane XOR-exchange stage cost (bitonic viability).

Run: PYTHONPATH=.:/root/.axon_site python scripts/experiments/exp_gather3.py
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


# 1: compute-bound matmul: C = A@B iterated ITER times entirely in VMEM
def mxu_probe(mm, kk, nn, iters, dtype):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(a_ref[:], b_ref[:],
                                 preferred_element_type=jnp.float32)
        acc = jnp.zeros((mm, nn), jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, iters, body, acc)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((mm, nn), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    return run


# 2: grid of lane shuffles
def lane_shuffle_grid(rows, tiles):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((tiles * rows, 128), jnp.float32),
            grid=(tiles,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(table, idx)

    return run


# 3: dynamic-offset VMEM stores in a loop (proxy for exact run copies)
def dyn_store_loop(n_iters, width, out_rows):
    def kernel(src_ref, off_ref, o_ref):
        def body(i, _):
            off = off_ref[i]
            o_ref[pl.ds(off, width), :] = src_ref[pl.ds(i % 64, width), :]
            return 0
        jax.lax.fori_loop(0, n_iters, body, 0)

    @jax.jit
    def run(src, offs):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, offs)

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # 1: MXU probe at several shapes/dtypes
    for mm, kk, nn, iters, dt_ in [(128, 128, 128, 512, jnp.bfloat16),
                                   (256, 256, 256, 256, jnp.bfloat16),
                                   (512, 512, 512, 64, jnp.bfloat16),
                                   (256, 256, 256, 256, jnp.float32),
                                   (512, 2048, 64, 256, jnp.bfloat16)]:
        a = jnp.asarray(rng.random((mm, kk), dtype=np.float32), dtype=dt_)
        b = jnp.asarray(rng.random((kk, nn), dtype=np.float32), dtype=dt_)
        t = bench(f"1 mxu {mm}x{kk}x{nn} x{iters} {dt_.__name__}",
                  mxu_probe(mm, kk, nn, iters, dt_), a, b, reps=4)
        if t:
            print(f"    -> {2*mm*kk*nn*iters/t/1e12:.1f} TFLOP/s", flush=True)

    # 2: lane shuffle rate
    tiles = 512
    tb = jnp.asarray(rng.random((tiles * 32, 128), dtype=np.float32))
    ix = jnp.asarray(rng.integers(0, 128, (tiles * 32, 128)).astype(np.int32))
    t = bench("2 grid lane-shuffle 512x(32x128)", lane_shuffle_grid(32, tiles),
              tb, ix)
    if t:
        print(f"    -> {tiles*32*128/t/1e6:.0f} M elems/s", flush=True)

    # 3: dynamic store loop: 4096 iterations of 8-row stores
    n_it, width, out_rows = 4096, 8, 8192
    src = jnp.asarray(rng.random((128, 128), dtype=np.float32))
    offs = jnp.asarray((rng.integers(0, out_rows - width, n_it))
                       .astype(np.int32))
    t = bench(f"3 dyn VMEM stores x{n_it} (8x128 f32 each)",
              dyn_store_loop(n_it, width, out_rows), src, offs)
    if t:
        print(f"    -> {t/n_it*1e9:.0f} ns/store, "
              f"{n_it*width*128*4/t/1e9:.1f} GB/s", flush=True)

    # 4: XLA column gather at 2^20 (v5 layout)
    n4 = 1 << 20
    base = jnp.asarray(rng.random((64, n4), dtype=np.float32),
                       dtype=jnp.bfloat16)
    ix4 = jnp.asarray(rng.integers(0, n4, n4).astype(np.int32))

    @jax.jit
    def colg(b, i):
        return b[:, i]

    t = bench("4 xla column gather (64, 2^20) bf16", colg, base, ix4, reps=4)
    if t:
        print(f"    -> {t/n4*1e9:.0f} ns/elem", flush=True)

    # 5: one bitonic lane-stage on a big array: 2 rolls + selects
    n5r = 8192   # rows
    x5 = jnp.asarray(rng.random((n5r, 128), dtype=np.float32))
    k5 = jnp.asarray(rng.integers(0, 1 << 20, (n5r, 128)).astype(np.int32))

    @jax.jit
    def lane_stage(keys, vals):
        d = 16
        pk = jnp.roll(keys, -d, axis=1)
        pv = jnp.roll(vals, -d, axis=1)
        qk = jnp.roll(keys, d, axis=1)
        qv = jnp.roll(vals, d, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
        up = (lane & d) == 0
        ok = jnp.where(up, pk, qk)
        ov = jnp.where(up, pv, qv)
        keep_min = up == (keys <= ok)
        return jnp.where(keep_min, keys, ok), jnp.where(keep_min, vals, ov)

    t = bench("5 xla bitonic lane stage (8192x128 kv)", lane_stage, k5, x5)
    if t:
        print(f"    -> {n5r*128/t/1e6:.0f} M elems/s/stage", flush=True)


if __name__ == "__main__":
    main()
