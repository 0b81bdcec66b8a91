"""Isolate seg_scan cost and variants.
Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_scan.py
"""
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.fields import device8 as f8  # noqa: E402
from quill_tpu.fields import pallas8 as p8  # noqa: E402


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
        jax.block_until_ready(l)
    np.asarray(jax.device_get(leaves[0].ravel()[0]))
    return x


def timed(name, fn, *args, reps=3):
    out = sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms")
    return out


def main():
    S, M = 256, 5120
    one = jnp.asarray(f8.FQ8.one_mont, jnp.float32)
    gx = jnp.broadcast_to(one[None, :, None] * 0 + 3, (S, f8.L, M)).astype(
        jnp.float32)
    gy = jnp.broadcast_to(one[None, :, None], (S, f8.L, M)).astype(
        jnp.float32)
    gz = jnp.broadcast_to(one[None, :, None], (S, f8.L, M)).astype(
        jnp.float32)
    gf = jnp.zeros((S, 1, M), jnp.float32)

    n_adds = S * M
    for bc in (4, 8):
        f = jax.jit(lambda a, b, c, d, bc=bc: p8.seg_scan(
            (a, b, c), d, bc=bc))
        out = timed(f"seg_scan bc={bc}", f, gx, gy, gz, gf)

    # ideal reference: same number of adds via the standalone kernel
    px = gx.reshape(S * f8.L, M)[: f8.L]
    big = (jnp.broadcast_to(gx[0][:, None, :], (f8.L, S, M)).reshape(
        f8.L, S * M),) * 3
    f = jax.jit(lambda a, b, c: p8.pt_add_b16((a, b, c), (a, b, c)))
    timed(f"pt_add_b16 on {n_adds} elems", f, *big)


if __name__ == "__main__":
    main()


def overhead_probe():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    timed("sync overhead (tiny op)", f, x)

    # chained pt_add inside one jit: per-iteration diff cancels overhead
    M = 1310720
    one = jnp.asarray(f8.FQ8.one_mont, jnp.float32)
    px = jnp.broadcast_to(one[:, None] * 0 + 3, (f8.L, M)).astype(jnp.float32)
    py = jnp.broadcast_to(one[:, None], (f8.L, M)).astype(jnp.float32)
    pz = py

    def build(n):
        def body(x, y, z):
            def it(_, p):
                return p8.pt_add_b16(p, (x, y, z))
            return jax.lax.fori_loop(0, n, it, (x, y, z))
        return jax.jit(body)

    f2, f8_ = build(2), build(10)
    sync(f2(px, py, pz)); sync(f8_(px, py, pz))
    t2 = []
    t8 = []
    for _ in range(3):
        t0 = time.perf_counter(); sync(f2(px, py, pz))
        t2.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(f8_(px, py, pz))
        t8.append(time.perf_counter() - t0)
    dt = (min(t8) - min(t2)) / 8
    print(f"pt_add chained diff: {dt*1e3:.1f} ms / {M} adds "
          f"({M/dt/1e6:.1f} M adds/s)")


overhead_probe()
