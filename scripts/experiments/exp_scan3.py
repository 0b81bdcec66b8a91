"""Bisect the scan-kernel slowdown: dynamic slicing vs dependency chain."""
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

L = f8.L


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
        jax.block_until_ready(l)
    np.asarray(jax.device_get(leaves[0].ravel()[0]))
    return x


def timed(name, fn, *args, reps=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms (incl ~52ms sync)")


BC, SUB = 8, 8
S, M = 256, 5120
MT = M // 128


def make(mode):
    pack = p8.consts_pack(f8.FQ8.modulus)
    n_out = 3 if mode in ("out3", "flags", "totals") else 1

    def kern(c_ref, xx, xy, xz, xf, *refs):
        if mode == "totals":
            ox, oy, oz, tx, ty, tz, sx, sy, sz = refs
        elif mode in ("out3", "flags"):
            ox, oy, oz, sx, sy, sz = refs
        else:
            ox, sx, sy, sz = refs
        spec = p8.unpack_spec(f8.FQ8.modulus, c_ref[:], vpu_redc=True)
        s3 = (L, SUB, 128)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            zx, oy_i, zz = p8._ident_rows(s3)
            sx[:] = zx
            sy[:] = oy_i
            sz[:] = zz

        def step(s, carry):
            xt = tuple(r[pl.ds(s, 1)].reshape(s3) for r in (xx, xy, xz))
            if mode == "indep":
                cur = xt
            else:
                cur = (sx[:], sy[:], sz[:])
            X3, Y3, Z3 = p8.emit_pt_add(cur, xt, spec)
            new = (X3, Y3, Z3)
            if mode in ("flags", "totals"):
                ft = xf[pl.ds(s, 1)].reshape((1,) + s3[1:])
                m = ft > 0.5
                new = tuple(jnp.where(m, t, v) for t, v in zip(xt, new))
            if mode != "indep":
                sx[:] = new[0]
                sy[:] = new[1]
                sz[:] = new[2]
            if mode in ("out3", "flags", "totals"):
                ox[pl.ds(s, 1)] = new[0].reshape((1,) + s3)
                oy[pl.ds(s, 1)] = new[1].reshape((1,) + s3)
                oz[pl.ds(s, 1)] = new[2].reshape((1,) + s3)
            else:
                ox[pl.ds(s, 1)] = new[0].reshape((1,) + s3)
            return carry

        jax.lax.fori_loop(0, BC, step, 0)
        if mode == "totals":
            tx[:] = sx[:]
            ty[:] = sy[:]
            tz[:] = sz[:]

    cspec = pl.BlockSpec((BC, L, SUB, 128), lambda i, j: (j, 0, i, 0),
                         memory_space=pltpu.VMEM)

    fspec = pl.BlockSpec((BC, 1, SUB, 128), lambda i, j: (j, 0, i, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((L, SUB, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((S, L, MT, 128), jnp.float32)
    tshape = jax.ShapeDtypeStruct((L, MT, 128), jnp.float32)
    if mode == "totals":
        out_shape = [oshape] * 3 + [tshape] * 3
        out_specs = [cspec] * 3 + [tspec] * 3
    elif mode in ("out3", "flags"):
        out_shape = [oshape] * 3
        out_specs = [cspec] * 3
    else:
        out_shape = [oshape]
        out_specs = [cspec]

    def run(xx, xy, xz, xf):
        def r4(a):
            return a.reshape(S, a.shape[1], MT, 128)
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=(MT // SUB, S // BC),
            in_specs=[pl.BlockSpec((p8._PACK_ROWS, L), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)]
                     + [cspec] * 3 + [fspec],
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((L, SUB, 128), jnp.float32)] * 3,
        )(pack, r4(xx), r4(xy), r4(xz), r4(gf))

    return jax.jit(run)


one = jnp.asarray(f8.FQ8.one_mont, jnp.float32)
gx = jnp.broadcast_to(one[None, :, None] * 0 + 3, (S, L, M)).astype(
    jnp.float32)
gy = jnp.broadcast_to(one[None, :, None], (S, L, M)).astype(jnp.float32)
gz = gy

gf = jnp.zeros((S, 1, M), jnp.float32)
timed("A: indep adds, fori+dyn slices", make("indep"), gx, gy, gz, gf)
timed("B: dependent chain via scratch", make("dep"), gx, gy, gz, gf)
timed("C: B + 3 coord outputs", make("out3"), gx, gy, gz, gf)
timed("D: C + flag select logic", make("flags"), gx, gy, gz, gf)
timed("E: D + totals outputs", make("totals"), gx, gy, gz, gf)
