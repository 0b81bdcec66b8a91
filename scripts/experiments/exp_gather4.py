"""Round-4 MSM experiments, part 4: re-run part 3 with 10-100x more work
per call -- part 3 showed a ~3.3 ms dispatch floor that swamped every
measurement.  Also: point-add kernel at bigger BLOCK and bf16-at-rest to
find the true add-rate ceiling (part 3 implies the add kernels are
HBM-bound at ~55 GB/s, so bf16 + fewer grid steps should nearly double it).

Run: PYTHONPATH=.:/root/.axon_site python scripts/experiments/exp_gather4.py
"""

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


def bench(name, fn, *args, reps=4):
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


def mxu_probe(mm, kk, nn, iters, dtype):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(a_ref[:], b_ref[:],
                                 preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((mm, nn), jnp.float32))

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((mm, nn), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    return run


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
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def dyn_store_loop(n_iters, width, out_rows):
    def kernel(src_ref, off_ref, o_ref):
        def body(i, _):
            o_ref[pl.ds(off_ref[i], width), :] = \
                src_ref[pl.ds((i % 16) * width, width), :]
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

    # 1: MXU peak, 550 GFLOP/call
    for mm, kk, nn, iters in [(512, 512, 512, 2048), (256, 2048, 256, 2048)]:
        a = jnp.asarray(rng.random((mm, kk), dtype=np.float32),
                        dtype=jnp.bfloat16)
        b = jnp.asarray(rng.random((kk, nn), dtype=np.float32),
                        dtype=jnp.bfloat16)
        t = bench(f"1 mxu {mm}x{kk}x{nn} x{iters}",
                  mxu_probe(mm, kk, nn, iters, jnp.bfloat16), a, b, reps=2)
        if t:
            print(f"    -> {2*mm*kk*nn*iters/t/1e12:.1f} TFLOP/s", flush=True)

    # 2: lane shuffle at 33.5M elems
    tiles = 8192
    tb = jnp.asarray(rng.random((tiles * 32, 128), dtype=np.float32))
    ix = jnp.asarray(rng.integers(0, 128, (tiles * 32, 128)).astype(np.int32))
    t = bench("2 grid lane-shuffle 8192x(32x128)",
              lane_shuffle_grid(32, tiles), tb, ix, reps=2)
    if t:
        print(f"    -> {tiles*32*128/t/1e6:.0f} M elems/s, "
              f"{tiles*32*128*4*3/t/1e9:.1f} GB/s", flush=True)

    # 3: dyn stores, 65536 iterations
    n_it, width, out_rows = 65536, 8, 8192
    src = jnp.asarray(rng.random((128, 128), dtype=np.float32))
    offs = jnp.asarray(rng.integers(0, out_rows - width, n_it)
                       .astype(np.int32))
    t = bench(f"3 dyn VMEM stores x{n_it}",
              dyn_store_loop(n_it, width, out_rows), src, offs, reps=2)
    if t:
        print(f"    -> {t/n_it*1e9:.0f} ns/store, "
              f"{n_it*width*128*4/t/1e9:.1f} GB/s", flush=True)

    # 4: bitonic lane stage at 16.8M kv
    n4r = 131072
    x4 = jnp.asarray(rng.random((n4r, 128), dtype=np.float32))
    k4 = jnp.asarray(rng.integers(0, 1 << 20, (n4r, 128)).astype(np.int32))

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

    t = bench("4 xla bitonic lane stage 16.8M kv", lane_stage, k4, x4,
              reps=2)
    if t:
        print(f"    -> {n4r*128/t/1e6:.0f} M elems/s/stage", flush=True)

    # 5: point adds at bigger BLOCK, f32 and bf16 at rest
    from quill_tpu.fields import pallas8 as p8
    n5 = 1 << 21
    x = jnp.asarray(rng.integers(0, 255, (99, n5)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 255, (99, n5)).astype(np.float32))
    for blk in (1024, 4096, 16384):
        fn = p8._stacked_combine_call(blk, False)
        t = bench(f"5 pt_add_stacked 2^21 blk={blk}", fn, x, y, reps=2)
        if t:
            print(f"    -> {n5/t/1e6:.1f} M adds/s", flush=True)

    xb = x.astype(jnp.bfloat16)
    yb = y.astype(jnp.bfloat16)

    # bf16-in/bf16-out variant: same body, casts at the edges
    from quill_tpu.fields import device8 as f8

    def addb16_call(blk):
        pack = p8.consts_pack(f8.FQ8.modulus)
        cspec = pl.BlockSpec((3 * f8.L, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM)

        def kern(c_ref, a_ref, b_ref, o_ref):
            spec = p8.unpack_spec(f8.FQ8.modulus, c_ref[:])
            n = a_ref.shape[-1]
            s3 = (f8.L, n // 128, 128)
            av = p8._split3(a_ref[:].astype(jnp.float32)
                            .reshape((3 * f8.L,) + s3[1:]))
            bv = p8._split3(b_ref[:].astype(jnp.float32)
                            .reshape((3 * f8.L,) + s3[1:]))
            X3, Y3, Z3 = p8.emit_pt_add(av, bv, spec)
            out = jnp.concatenate(
                [f8.normal_form(v) for v in (X3, Y3, Z3)], axis=0)
            o_ref[:] = out.reshape(3 * f8.L, n).astype(jnp.bfloat16)

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(a.shape, jnp.bfloat16),
                grid=(a.shape[-1] // blk,),
                in_specs=[pl.BlockSpec((p8._PACK_ROWS, f8.L),
                                       lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          cspec, cspec],
                out_specs=cspec,
                interpret=p8._interpret(),
            )(pack, a, b)

        return run

    for blk in (4096, 16384):
        t = bench(f"5b pt_add bf16io 2^21 blk={blk}", addb16_call(blk),
                  xb, yb, reps=2)
        if t:
            print(f"    -> {n5/t/1e6:.1f} M adds/s", flush=True)


if __name__ == "__main__":
    main()
