"""Round-4 MSM data-movement experiments.

Probes, on the real chip, the primitives the msm6 grouping redesign can be
built from: Pallas in-VMEM dynamic gathers (jnp.take lowering via Mosaic),
XLA sort scaling, MXU one-hot matmul rates, and the XLA-gather baseline.
Each experiment is independently guarded -- a Mosaic lowering rejection
prints the error and moves on.

Run: PYTHONPATH=.:/root/.axon_site python scripts/experiments/exp_gather.py
"""

import functools
import time
import traceback

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
        print(f"[OK] {name}: {dt*1e3:.3f} ms/call")
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


# ---------------------------------------------------------------------------
# A/B/C: Pallas dynamic gather variants
# ---------------------------------------------------------------------------


def pallas_take_axis0(rows, cols, nout, dtype=jnp.float32):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nout, cols), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def pallas_take_axis1(rows, cols, nout):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=1)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, nout), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def pallas_taa_sublane(rows, cols):
    """Per-lane independent gather along sublanes: idx (rows, cols)."""
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def pallas_grid_take(rows, cols, nout, block):
    """Gather with the big table resident in VMEM across grid steps and the
    output blocked -- the shape a real leaf-gather kernel would use."""
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nout, cols), jnp.float32),
            grid=(nout // block,),
            in_specs=[pl.BlockSpec((rows, cols), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((block,), lambda i: (i,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # --- A: take axis=0, moderate table -------------------------------
    rows, cols, nout = 8192, 128, 2048
    table = jnp.asarray(rng.random((rows, cols), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, rows, nout).astype(np.int32))
    dt = bench("A pallas take axis0 (8192x128 f32 -> 2048)",
               pallas_take_axis0(rows, cols, nout), table, idx)
    if dt:
        print(f"    -> {nout/dt/1e6:.1f} M rows/s")

    # --- B: take axis=0, big table ------------------------------------
    rows2, cols2, nout2 = 32768, 64, 8192
    table2 = jnp.asarray(rng.random((rows2, cols2), dtype=np.float32))
    idx2 = jnp.asarray(rng.integers(0, rows2, nout2).astype(np.int32))
    dt = bench("B pallas take axis0 (32768x64 f32 -> 8192)",
               pallas_take_axis0(rows2, cols2, nout2), table2, idx2)
    if dt:
        print(f"    -> {nout2/dt/1e6:.1f} M rows/s")

    # --- C: take axis=1 (lanes) ---------------------------------------
    t3 = jnp.asarray(rng.random((64, 8192), dtype=np.float32))
    i3 = jnp.asarray(rng.integers(0, 8192, 2048).astype(np.int32))
    dt = bench("C pallas take axis1 (64x8192 f32 -> 2048 cols)",
               pallas_take_axis1(64, 8192, 2048), t3, i3)
    if dt:
        print(f"    -> {2048/dt/1e6:.1f} M cols/s")

    # --- D: per-lane sublane gather -----------------------------------
    t4 = jnp.asarray(rng.random((256, 128), dtype=np.float32))
    i4 = jnp.asarray(rng.integers(0, 256, (256, 128)).astype(np.int32))
    dt = bench("D pallas take_along_axis sublane (256x128)",
               pallas_taa_sublane(256, 128), t4, i4)
    if dt:
        print(f"    -> {256*128/dt/1e6:.1f} M elems/s")

    # --- E: grid-blocked take (realistic leaf gather shape) -----------
    rows5, cols5, nout5, blk = 16384, 128, 65536, 2048
    t5 = jnp.asarray(rng.random((rows5, cols5), dtype=np.float32))
    i5 = jnp.asarray(rng.integers(0, rows5, nout5).astype(np.int32))
    dt = bench("E pallas grid take (16384x128 f32 -> 65536, blk 2048)",
               pallas_grid_take(rows5, cols5, nout5, blk), t5, i5)
    if dt:
        print(f"    -> {nout5/dt/1e6:.1f} M rows/s, "
              f"{nout5*cols5*4/dt/1e9:.1f} GB/s")

    # --- F: XLA gather baseline on the same shape ---------------------
    @jax.jit
    def xla_take(t, i):
        return jnp.take(t, i, axis=0)

    dt = bench("F xla take (16384x128 f32 -> 65536)", xla_take, t5, i5)
    if dt:
        print(f"    -> {nout5/dt/1e6:.1f} M rows/s")

    # --- G: XLA sort scaling ------------------------------------------
    for lg in (21, 24):
        n = 1 << lg
        keys = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))

        @jax.jit
        def packed_sort(k):
            return jnp.sort(k)

        dt = bench(f"G xla sort 2^{lg} int32", packed_sort, keys, reps=4)
        if dt:
            print(f"    -> {n/dt/1e6:.0f} M keys/s")

        iota = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def kv_sort(k, v):
            return jax.lax.sort_key_val(k, v)

        dt = bench(f"G xla sort_key_val 2^{lg}", kv_sort, keys, iota, reps=4)
        if dt:
            print(f"    -> {n/dt/1e6:.0f} M keys/s")

    # --- H: MXU bf16 one-hot-permute-rate proxy -----------------------
    a = jnp.asarray(rng.random((8192, 4096), dtype=np.float32),
                    dtype=jnp.bfloat16)
    b = jnp.asarray(rng.random((4096, 256), dtype=np.float32),
                    dtype=jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    dt = bench("H bf16 matmul 8192x4096x256", mm, a, b)
    if dt:
        flops = 2 * 8192 * 4096 * 256
        print(f"    -> {flops/dt/1e12:.1f} TFLOP/s")

    # --- I: dynamic roll inside a kernel (sanity) ---------------------
    def roll_kernel(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

    @jax.jit
    def run_roll(x, s):
        return pl.pallas_call(
            roll_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s)

    x = jnp.asarray(rng.random((128, 1024), dtype=np.float32))
    s = jnp.asarray([17], dtype=jnp.int32)
    bench("I pallas dynamic roll (128x1024)", run_roll, x, s)


if __name__ == "__main__":
    main()
