"""Hardware probes for the Pallas field-kernel redesign (roadmap #1).

Measures, on the real chip:
  1. VPU f32 FMA throughput inside a Pallas kernel (VMEM-resident)
  2. VPU int32 multiply throughput inside a Pallas kernel
  3. MXU matmul throughput at REDC-like shapes (N, K) @ (K, K') for
     f32 / bf16 and at (N, 128) @ (128, 128)
  4. a realistic 8-bit-limb schoolbook convolution kernel (the a*b pass
     of a Montgomery mul) in f32

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_pallas.py
"""
import time
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- VPU f32 FMA
def fma_kernel(a_ref, b_ref, o_ref, *, inner):
    a = a_ref[:]
    b = b_ref[:]
    accs = [a * (i + 1.0) for i in range(4)]
    for i in range(inner):
        j = i % 4
        accs[j] = accs[j] * a + b
    o_ref[:] = accs[0] + accs[1] + accs[2] + accs[3]


def probe_vpu_f32(n_rows=2048, inner=256, grid=64):
    shape = (grid * 8, n_rows // 8 * 128)  # big enough to amortize
    a = jnp.ones(shape, jnp.float32) * 0.5
    b = jnp.ones(shape, jnp.float32) * 0.25
    f = pl.pallas_call(
        functools.partial(fma_kernel, inner=inner),
        out_shape=jax.ShapeDtypeStruct((8, shape[1]), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((8, shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8, shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    dt = timeit(f, a, b)
    flops = 2 * inner * shape[0] * shape[1]
    print(f"VPU f32 FMA: {flops/dt/1e9:.1f} GFLOP/s ({inner} FMAs on {shape})  [{dt*1e3:.2f} ms]")
    return flops / dt


def mul_i32_kernel(a_ref, b_ref, o_ref, *, inner):
    a = a_ref[:]
    b = b_ref[:]
    accs = [a + i for i in range(4)]
    for i in range(inner):
        j = i % 4
        accs[j] = accs[j] * b + a
    o_ref[:] = accs[0] + accs[1] + accs[2] + accs[3]


def probe_vpu_i32(n_rows=2048, inner=256, grid=64):
    shape = (grid * 8, n_rows // 8 * 128)
    a = jnp.ones(shape, jnp.int32)
    b = jnp.ones(shape, jnp.int32) * 3
    f = pl.pallas_call(
        functools.partial(mul_i32_kernel, inner=inner),
        out_shape=jax.ShapeDtypeStruct((8, shape[1]), jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((8, shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8, shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    dt = timeit(f, a, b)
    ops = 2 * inner * shape[0] * shape[1]  # mul+add
    print(f"VPU int32 mul+add: {ops/dt/1e9:.1f} Gop/s ({inner} iters on {shape})  [{dt*1e3:.2f} ms]")
    return ops / dt


# ---------------------------------------------------------------- MXU matmuls
def probe_matmul(n, k, m, dtype, acc_dtype, iters_inner=8):
    def kern(a_ref, b_ref, o_ref):
        acc = jnp.zeros((a_ref.shape[0], b_ref.shape[1]), acc_dtype)
        for _ in range(iters_inner):
            acc = acc + jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)
        o_ref[:] = acc

    a = jnp.ones((n, k), dtype)
    b = jnp.ones((k, m), dtype)
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, m), acc_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    dt = timeit(f, a, b)
    flops = 2 * n * k * m * iters_inner
    print(f"MXU {dtype.__name__}({n},{k})@({k},{m})->{acc_dtype.__name__}: "
          f"{flops/dt/1e12:.2f} TFLOP/s  [{dt*1e3:.3f} ms]")
    return flops / dt


# -------------------------------------------------- realistic conv (a*b pass)
def conv_kernel(a_ref, b_ref, o_ref, *, K):
    # a, b: (K, T) f32 8-bit limbs; out: (2K-1, T) column sums
    a = [a_ref[i, :] for i in range(K)]
    b = [b_ref[i, :] for i in range(K)]
    cols = [None] * (2 * K - 1)
    for i in range(K):
        for j in range(K):
            t = a[i] * b[j]
            kk = i + j
            cols[kk] = t if cols[kk] is None else cols[kk] + t
    for kk in range(2 * K - 1):
        o_ref[kk, :] = cols[kk]


def probe_conv_f32(K=33, T=64 * 128, grid=128):
    a = jnp.ones((K, grid * T // 128, 128), jnp.float32)

    def kern(a_ref, b_ref, o_ref):
        conv_kernel(a_ref, b_ref, o_ref, K=K)

    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2 * K - 1, T // 128, 128), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((K, T // 128, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((2 * K - 1, T // 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ))
    dt = timeit(f, a, a)
    n_elems = grid * T
    print(f"conv f32 K={K}: {n_elems/dt/1e6:.1f} M elem-muls/s "
          f"({2*K*K*n_elems/dt/1e9:.0f} Gflop/s)  [{dt*1e3:.2f} ms]")
    return n_elems / dt


def conv_i32_kernel(a_ref, b_ref, o_ref, *, K):
    a = [a_ref[i, :] for i in range(K)]
    b = [b_ref[i, :] for i in range(K)]
    cols = [None] * (2 * K - 1)
    for i in range(K):
        for j in range(K):
            t = a[i] * b[j]
            kk = i + j
            cols[kk] = t if cols[kk] is None else cols[kk] + t
    for kk in range(2 * K - 1):
        o_ref[kk, :] = cols[kk]


def probe_conv_i32(K=22, T=64 * 128, grid=128):
    a = jnp.ones((K, grid * T // 128, 128), jnp.int32)

    def kern(a_ref, b_ref, o_ref):
        conv_i32_kernel(a_ref, b_ref, o_ref, K=K)

    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2 * K - 1, T // 128, 128), jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((K, T // 128, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((2 * K - 1, T // 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ))
    dt = timeit(f, a, a)
    n_elems = grid * T
    print(f"conv i32 K={K}: {n_elems/dt/1e6:.1f} M elem-muls/s "
          f"({2*K*K*n_elems/dt/1e9:.0f} Gop/s)  [{dt*1e3:.2f} ms]")
    return n_elems / dt


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_vpu_f32()
    probe_vpu_i32()
    for dt_, acc in [(jnp.float32, jnp.float32), (jnp.bfloat16, jnp.float32),
                     (jnp.int8, jnp.int32)]:
        probe_matmul(1024, 128, 128, dt_, acc)
        probe_matmul(1024, 64, 128, dt_, acc)
        probe_matmul(4096, 128, 256, dt_, acc)
    probe_conv_f32(K=33)
    probe_conv_f32(K=30)
    probe_conv_i32(K=22)
