"""Exactness check + throughput bench for the 8-bit Pallas field kernels on
hardware.  Run: PYTHONPATH=.:/root/.axon_site python scripts/bench_field8.py
"""
import random
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.fields import device8 as f8  # noqa: E402
from quill_tpu.fields import pallas8 as p8  # noqa: E402
from quill_tpu.fields.bn254 import P, R  # noqa: E402

RNG = random.Random(7)


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


def jac_mul(pt, k):
    acc = None
    base = pt
    while k:
        if k & 1:
            acc = base if acc is None else acc.add(base)
        base = base.double()
        k >>= 1
    return acc


def to_dev(xs, modulus):
    mont = [x * ((1 << 264) % modulus) % modulus for x in xs]
    return jnp.asarray(f8.ints_to_limbs8(mont))


def from_dev(a, spec):
    rinv = pow(1 << 264, -1, spec.modulus)
    can = np.asarray(jax.jit(
        lambda v: f8.lazy_to_canonical(v, spec))(a))
    return [v * rinv % spec.modulus for v in f8.limbs8_to_ints(can)]


def check_exact():
    n = 2048
    xs = [RNG.randrange(R) for _ in range(n)]
    ys = [RNG.randrange(R) for _ in range(n)]
    a, b = to_dev(xs, R), to_dev(ys, R)
    out = from_dev(p8.mont_mul_vec(a, b, f8.FR8), f8.FR8)
    assert out == [x * y % R for x, y in zip(xs, ys)], "mont_mul_vec mismatch"
    print("mont_mul_vec exact on", n, "elements")

    # pt_add: random multiples of the generator, compare vs host curve
    from quill_tpu.ec import curve
    g = curve.g1_generator()
    m = 64
    ks = [RNG.randrange(1, R) for _ in range(m)]
    js = [RNG.randrange(1, R) for _ in range(m)]
    p_host = [jac_mul(g, k) for k in ks]
    q_host = [jac_mul(g, k) for k in js]
    def load(pts):
        aff = [p.to_affine() for p in pts]
        xs8 = to_dev([int(p.x.v) for p in aff], P)
        ys8 = to_dev([int(p.y.v) for p in aff], P)
        one = jnp.broadcast_to(
            jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None], xs8.shape)
        return xs8, ys8, one
    p1 = load(p_host)
    p2 = load(q_host)
    X3, Y3, Z3 = p8.pt_add_vec(p1, p2)
    xs_o = from_dev(X3, f8.FQ8)
    ys_o = from_dev(Y3, f8.FQ8)
    zs_o = from_dev(Z3, f8.FQ8)
    for i in range(m):
        exp = (p_host[i].add(q_host[i])).to_affine()
        zi = pow(zs_o[i], -1, P)
        assert xs_o[i] * zi % P == int(exp.x.v)
        assert ys_o[i] * zi % P == int(exp.y.v)
    print("pt_add_vec exact on", m, "points")


def bench_mul(n=1 << 18):
    xs = [RNG.randrange(R) for _ in range(256)] * (n // 256)
    a = to_dev(xs, R)
    b = jnp.roll(a, 1, axis=1)

    def build(nit):
        def body(x, y):
            def it(_, v):
                return p8.mont_mul_vec(v, y, f8.FR8)
            return jax.lax.fori_loop(0, nit, it, x)
        return jax.jit(body)

    dt = diff_time(build, 2, 66, a, b)
    print(f"pallas mont_mul_vec: {n/dt/1e6:.0f} M muls/s  "
          f"[{dt*1e3:.3f} ms / {n} elems]")


def bench_pt_add(n=1 << 16):
    from quill_tpu.ec import curve
    g = curve.g1_generator()
    base = [jac_mul(g, RNG.randrange(1, R)).to_affine() for _ in range(64)]
    xs = to_dev([int(p.x.v) for p in base] * (n // 64), P)
    ys = to_dev([int(p.y.v) for p in base] * (n // 64), P)
    one = jnp.broadcast_to(
        jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None], xs.shape)

    def build(nit):
        def body(x1, y1, z1):
            def it(_, p):
                return p8.pt_add_vec(p, (x1, y1, z1))
            return jax.lax.fori_loop(0, nit, it, (x1, y1, z1))
        return jax.jit(body)

    dt = diff_time(build, 2, 34, xs, ys, one)
    print(f"pallas pt_add_vec: {n/dt/1e6:.1f} M point-adds/s  "
          f"({14*n/dt/1e6:.0f} M field-muls/s)  [{dt*1e3:.3f} ms / {n} pts]")


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_exact()
    bench_mul()
    bench_pt_add()
