"""Honest hardware probes: all repetition happens INSIDE one jitted program
(lax.fori_loop around the Pallas kernel body or XLA op), completion is forced
by pulling a scalar to the host, and rates are computed from the difference
between two iteration counts (cancels dispatch/transfer overhead).

Calibrates against HBM copy bandwidth, which must come out <= ~819 GB/s on a
v5e chip; if it doesn't, timings in this environment cannot be trusted.

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_honest.py
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_scalar(f, *args):
    """Dispatch and force completion by fetching a scalar."""
    out = f(*args)
    return float(np.asarray(jax.device_get(out.ravel()[0])))


def diff_time(build, n_small, n_large, *args, reps=5):
    """build(n) -> jitted fn; returns seconds per unit-iteration."""
    f_s, f_l = build(n_small), build(n_large)
    run_scalar(f_s, *args); run_scalar(f_l, *args)  # compile
    ts, tl = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run_scalar(f_s, *args)
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_scalar(f_l, *args)
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (n_large - n_small)


# ---------------------------------------------------------------- HBM stream
def probe_hbm():
    x = jnp.arange(32 * 1024 * 1024, dtype=jnp.float32)  # 128 MB

    def build(n):
        def body(v):
            def it(i, v):
                return v * 1.0000001 + 1e-9
            return jax.lax.fori_loop(0, n, it, v)
        return jax.jit(body)

    dt = diff_time(build, 2, 114, x, reps=5)
    gb = 2 * x.size * 4 / 1e9
    print(f"HBM stream 128MB r+w: {gb/dt:.0f} GB/s  [{dt*1e3:.3f} ms/pass]")


# ------------------------------------------------------------- VPU compute
def _vpu_probe(name, dtype, mul_c, add_c, post, inner=256, shape=(256, 512)):
    def build(n):
        def kern(x_ref, o_ref):
            def it(_, a):
                accs = list(a)
                for i in range(inner):
                    j = i % 4
                    accs[j] = accs[j] * mul_c + add_c
                return tuple(accs)
            a0 = tuple(x_ref[:] + post(i) for i in range(4))
            accs = jax.lax.fori_loop(0, n, it, a0)
            s = accs[0]
            for j in range(1, 4):
                s = s + accs[j]
            o_ref[:] = s

        return jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    x = jnp.ones(shape, dtype)
    dt = diff_time(build, 10, 2010, x, reps=5)
    ops = 2 * inner * shape[0] * shape[1] * 4  # 4 parallel accumulator chains
    # NOTE: inner loop does `inner` FMAs on EACH of 4 accumulators? No --
    # one accumulator per step, 4 rotating: total inner FMAs per fori iter.
    ops = 2 * inner * shape[0] * shape[1]
    print(f"{name}: {ops/dt/1e9:.0f} Gop/s  [{dt*1e6:.1f} us/iter]")


def probe_vpu():
    _vpu_probe("VPU f32 FMA", jnp.float32, 1.0000001, 1e-9, float)
    _vpu_probe("VPU i32 mul+add", jnp.int32, 12289, 7, int)


# ---------------------------------------------------------------- MXU matmul
def probe_mxu(dtype, n=512, k=128, m=256):
    def build(nit):
        def kern(x_ref, w_ref, o_ref):
            def it(_, acc):
                y = jnp.dot(acc.astype(dtype), w_ref[:],
                            preferred_element_type=jnp.float32)
                return y * 1e-3
            acc = jax.lax.fori_loop(0, nit, it, x_ref[:])
            o_ref[:] = acc
        return jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    x = jnp.ones((n, m), jnp.float32)
    w = jnp.ones((k, m), dtype) * jnp.astype(0.01, dtype)
    # use square-ish W: need acc (n, m) @ w (m, m)? keep k == m
    assert k == m or True

    def build2(nit):
        def kern(x_ref, w_ref, o_ref):
            acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
            def it(_, acc):
                y = jnp.dot(acc.astype(dtype), w_ref[:],
                            preferred_element_type=acc_t)
                if dtype == jnp.int8:
                    return (y & 127).astype(jnp.float32)
                return y * 1e-3 + 1.0
            acc = jax.lax.fori_loop(0, nit, it, x_ref[:])
            o_ref[:] = acc
        return jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    w = jnp.ones((m, m), dtype)
    dt = diff_time(build2, 100, 16100, x, w, reps=5)
    flops = 2 * n * m * m
    print(f"MXU {np.dtype(dtype).name} ({n},{m})@({m},{m}): "
          f"{flops/dt/1e12:.2f} TFLOP/s  [{dt*1e6:.1f} us/matmul]")


# ------------------------------------------------ f32/i32 limb convolution
def probe_conv(dtype, K, rows=16):
    shape = (K, rows, 128)

    def build(n):
        def kern(x_ref, o_ref):
            def it(_, state):
                a = [state[i] for i in range(K)]
                cols = [None] * (2 * K - 1)
                for i in range(K):
                    for j in range(K):
                        t = a[i] * a[j]
                        kk = i + j
                        cols[kk] = t if cols[kk] is None else cols[kk] + t
                out = []
                for i in range(K):
                    v = cols[i]
                    if K + i < 2 * K - 1:
                        v = v + cols[K + i]
                    if dtype == jnp.float32:
                        out.append(v * 1e-6 + 1.0)
                    else:
                        out.append((v & 1023) + 1)
                return jnp.stack(out, 0)

            st = jax.lax.fori_loop(0, n, it, x_ref[:])
            o_ref[:] = st

        return jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    x = jnp.ones(shape, dtype)
    dt = diff_time(build, 20, 8020, x, reps=5)
    n_elems = rows * 128
    print(f"conv {np.dtype(dtype).name} K={K}: {n_elems/dt/1e6:.1f} M elem-muls/s "
          f"({2*K*K*n_elems/dt/1e9:.0f} Gop/s)  [{dt*1e6:.1f} us/iter]")


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_hbm()
    probe_vpu()
    probe_mxu(jnp.float32)
    probe_mxu(jnp.bfloat16)
    probe_mxu(jnp.int8)
    probe_conv(jnp.float32, 33)
    probe_conv(jnp.int32, 22)
    probe_conv(jnp.float32, 16)
