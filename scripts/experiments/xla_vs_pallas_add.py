"""Probe: complete G1 add as plain XLA vs Pallas, dispatch floors, and
dynamic pltpu.roll support -- decides where the MSM glue stages must live.

Run: PYTHONPATH=.:/root/.axon_site python scripts/experiments/xla_vs_pallas_add.py
"""
import functools
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from quill_tpu.fields import device8 as f8  # noqa: E402
from quill_tpu.fields import pallas8 as p8  # noqa: E402
from quill_tpu.ec import msm3  # noqa: E402

L = f8.L
L3 = 3 * L


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

    for n in (8192, 65536):
        a = jnp.asarray(rng.integers(0, 255, (L3, n)).astype(np.float32))
        b = jnp.asarray(rng.integers(0, 255, (L3, n)).astype(np.float32))

        bench(f"XLA 1x pt-add (3L, {n})",
              jax.jit(lambda x, y: msm3._xadd(x, y, f8.FQ8)), a, b)
        bench(f"Pallas 1x pt-add (3L, {n})", p8.pt_add_stacked, a, b)

        def xla8(x, y):
            for _ in range(8):
                x = msm3._xadd(x, y, f8.FQ8)
            return x

        bench(f"XLA 8x chained pt-add (3L, {n})", jax.jit(xla8), a, b)

    # dynamic pltpu.roll probe: one Pallas kernel, fori over shifts
    n = 8192

    def roll_kernel(x_ref, o_ref):
        def body(t, v):
            sh = jnp.int32(1) << t
            return v + pltpu.roll(v, sh, axis=1)

        o_ref[:] = jax.lax.fori_loop(0, 13, body, x_ref[:])

    def roll_call(x):
        return pl.pallas_call(
            roll_kernel,
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
            interpret=p8._interpret(),
        )(x)

    x = jnp.ones((8, n), jnp.float32)
    try:
        out = bench("Pallas dynamic-roll fori (8, 8192) x13", jax.jit(roll_call), x)
        print("dynamic roll OK; out[0,0] =", float(np.asarray(out[0, 0])),
              flush=True)
    except Exception as e:
        print(f"dynamic roll FAILED: {e!r}"[:300], flush=True)

    # Pallas ladder feasibility: one kernel, fori over 13 dynamic-shift
    # point-add steps on (3L, 8192) resident in VMEM
    pack = p8.consts_pack(f8.FQ8.modulus)

    def ladder_kernel(c_ref, x_ref, o_ref):
        spec = p8.unpack_spec(f8.FQ8.modulus, c_ref[:])
        ident = p8.identity_stacked(n)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        def body(t, v):
            sh = jnp.int32(1) << t
            rolled = pltpu.roll(v, sh, axis=1)
            # wrapped head -> identity (complete add absorbs it)
            rolled = jnp.where(idx < sh, ident, rolled)
            out = p8.emit_pt_add(
                (v[:L], v[L:2 * L], v[2 * L:]),
                (rolled[:L], rolled[L:2 * L], rolled[2 * L:]), spec)
            return jnp.concatenate(out, axis=0)

        o_ref[:] = jax.lax.fori_loop(0, 13, body, x_ref[:])

    def ladder_call(x):
        return pl.pallas_call(
            ladder_kernel,
            out_shape=jax.ShapeDtypeStruct((L3, n), jnp.float32),
            in_specs=[pl.BlockSpec((p8._PACK_ROWS, L),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=p8._interpret(),
        )(pack, x)

    a = jnp.asarray(rng.integers(0, 255, (L3, n)).astype(np.float32))
    try:
        bench("Pallas ladder fori 13x pt-add (3L, 8192)",
              jax.jit(ladder_call), a)
    except Exception as e:
        print(f"Pallas ladder FAILED: {e!r}"[:300], flush=True)


if __name__ == "__main__":
    main()
