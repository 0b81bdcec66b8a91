"""Experiment: mont_mul Pallas kernel variants to find the fast shape.
Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_mul_variants.py
"""
import functools
import random
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
from quill_tpu.fields.bn254 import R  # noqa: E402

L = f8.L
RNG = random.Random(11)


def run_scalar(f, *args):
    out = f(*args)
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jax.device_get(leaves[0].ravel()[0])))


def diff_time(build, n_small, n_large, *args, reps=4):
    f_s, f_l = build(n_small), build(n_large)
    run_scalar(f_s, *args); run_scalar(f_l, *args)
    ts, tl = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run_scalar(f_s, *args)
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_scalar(f_l, *args)
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (n_large - n_small)


def to_dev(xs, modulus):
    mont = [x * ((1 << 264) % modulus) % modulus for x in xs]
    return jnp.asarray(f8.ints_to_limbs8(mont))


SPEC = f8.FR8


def mont_mul_3d(a, b, spec, use_dots=True):
    """mont_mul with conv/carries on (33, S, 128) 3D tiles."""
    block = a.shape[-1]
    s = block // 128
    a3 = a.reshape(L, s, 128)
    b3 = b.reshape(L, s, 128)
    t_cols = f8._conv_full(a3, b3)
    t_cols.append(jnp.zeros_like(t_cols[0]))
    t = jnp.stack(t_cols, axis=0)
    t_low = f8._carry_n(t[:L], 4, mod_r=True)
    if use_dots:
        m = f8._redc_dot(spec.pp_mat, t_low.reshape(L, block)).reshape(
            L, s, 128)
    else:
        pp = np.asarray(f8.FieldSpec8.make(spec_modulus).pp_mat)
        m = None
    m = f8._carry_n(m, 4, mod_r=True)
    mp = f8._redc_dot(spec.p_mat, m.reshape(L, block)).reshape(2 * L, s, 128)
    total = t + mp
    total = f8._carry_n(total, 2, mod_r=False)
    low = total[:L]
    hi = total[L:]
    w = np.ldexp(np.ones(L), 8 * np.arange(L) - 264).astype(np.float32)
    sdot = f8._scalar_dot(low, w)
    spill = jnp.floor(sdot + 0.5)
    hi = jnp.concatenate([hi[:1] + spill[None], hi[1:]], axis=0)
    return hi.reshape(L, block)


def mont_mul_3d_vpu(a, b, pp_l, p_l):
    """3D variant with REDC as unrolled scalar-constant VPU FMAs."""
    block = a.shape[-1]
    s = block // 128
    a3 = a.reshape(L, s, 128)
    b3 = b.reshape(L, s, 128)
    t_cols = f8._conv_full(a3, b3)
    t_cols.append(jnp.zeros_like(t_cols[0]))
    t = jnp.stack(t_cols, axis=0)
    t_low = f8._carry_n(t[:L], 4, mod_r=True)

    tl = [t_low[i] for i in range(L)]
    m_cols = [None] * L
    for j in range(L):
        tj = tl[j]
        for k in range(j, L):
            c = float(pp_l[k - j])
            if c == 0.0:
                continue
            term = tj * c
            m_cols[k] = term if m_cols[k] is None else m_cols[k] + term
    m_cols = [jnp.zeros_like(tl[0]) if x is None else x for x in m_cols]
    m = f8._carry_n(jnp.stack(m_cols, 0), 4, mod_r=True)

    ml = [m[i] for i in range(L)]
    mp_cols = [None] * (2 * L)
    for j in range(L):
        mj = ml[j]
        for k in range(L):
            c = float(p_l[k])
            if c == 0.0:
                continue
            kk = j + k
            term = mj * c
            mp_cols[kk] = term if mp_cols[kk] is None else mp_cols[kk] + term
    mp_cols = [jnp.zeros_like(tl[0]) if x is None else x for x in mp_cols]
    total = t + jnp.stack(mp_cols, 0)
    total = f8._carry_n(total, 2, mod_r=False)
    low = total[:L]
    hi = total[L:]
    w = np.ldexp(np.ones(L), 8 * np.arange(L) - 264).astype(np.float32)
    sdot = f8._scalar_dot(low, w)
    spill = jnp.floor(sdot + 0.5)
    hi = jnp.concatenate([hi[:1] + spill[None], hi[1:]], axis=0)
    return hi.reshape(L, block)


def make_variant(name, block, body3d):
    pack = jnp.asarray(p8.consts_pack(R))

    def kern(c_ref, a_ref, b_ref, o_ref):
        spec = p8.unpack_spec(R, c_ref[:])
        o_ref[:] = body3d(a_ref[:], b_ref[:], spec)

    dspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)

    def call(a, b):
        grid = (a.shape[-1] // block,)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
            grid=grid,
            in_specs=[p8._consts_spec(), dspec, dspec],
            out_specs=dspec,
        )(pack, a, b)

    return name, jax.jit(call)


def bench(name, call, n=1 << 18, check=True):
    xs = [RNG.randrange(R) for _ in range(256)] * (n // 256)
    a = to_dev(xs, R)
    b = jnp.roll(a, 1, axis=1)
    if check:
        out = call(a, b)
        can = np.asarray(jax.jit(
            lambda v: f8.lazy_to_canonical(v, SPEC))(out[:, :512]))
        rinv = pow(1 << 264, -1, R)
        got = [v * rinv % R for v in f8.limbs8_to_ints(can)]
        ys = [int(x) for x in xs]
        exp = [ys[i] * ys[(i - 1) % 256 if i % 256 == 0 else i - 1] % R
               for i in range(512)]
        # roll(axis=1) shifts elements right by 1: b[i] = a[i-1]
        exp = [ys[i] * ys[(i - 1) % n] % R for i in range(512)]
        assert got == exp, f"{name} WRONG"

    def build(nit):
        def body(x, y):
            def it(_, v):
                return call(v, y)
            return jax.lax.fori_loop(0, nit, it, x)
        return jax.jit(body)

    dt = diff_time(build, 2, 66, a, b)
    print(f"{name}: {n/dt/1e6:.0f} M muls/s  [{dt*1e3:.3f} ms]")


if __name__ == "__main__":
    print("devices:", jax.devices())
    variants = []
    for blk in (1024, 2048, 4096):
        variants.append(make_variant(
            f"3d+dots b={blk}", blk,
            lambda a, b, spec: mont_mul_3d(a, b, spec)))
    pp_l = tuple(np.array(
        [(int((-pow(R, -1, 1 << 264)) % (1 << 264)) >> (8 * i)) & 255
         for i in range(L)], dtype=np.float32))
    p_l = tuple(np.asarray(SPEC.p_limbs))
    for blk in (1024, 2048):
        variants.append(make_variant(
            f"3d+vpu  b={blk}", blk,
            lambda a, b, spec: mont_mul_3d_vpu(a, b, pp_l, p_l)))
    for name, call in variants:
        bench(name, call)
