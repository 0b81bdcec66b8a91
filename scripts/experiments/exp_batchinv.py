"""Probe: can a batched-affine up-sweep beat the 12-mul projective add?

VERDICT round-4 item 4 lever 1 ("batch-affine tree levels") demands the
cap argument be earned with measurements.  A batched-affine level add
costs, per element:

  detect exceptional pairs   ~2 canonicalizations (x-eq, y-eq tests)
  numerator/denominator      ~1.5 muls (3x^2 doubling branch + selects)
  batched inversion          2 serial-scan muls (fwd prefix + bwd walk)
                             + ~380/S muls Fermat on per-lane totals
  lambda, x3, y3             ~4 muls
  ------------------------------------------------------------------
  total                      ~9.5 mul-equivalents  (vs 12 projective)
  traffic                    2L rows in/out        (vs 3L)

This script MEASURES the three unknown factors on the real chip:
  1. mul-scan throughput (the `pallas8.seg_scan` pattern with mont_mul
     instead of pt_add): serial prefix products at S=256;
  2. Fermat inversion throughput on (L, M) via f8 ops;
  3. `lazy_to_canonical` throughput (the equality-test cost).

Run: PYTHONPATH=.:/root/.axon_site python scripts/experiments/exp_batchinv.py
Exactness of the scan+inversion pipeline is asserted against host
big-int inverses on a slice before timing.
"""

import functools
import random
import time

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from quill_tpu.fields import device8 as f8  # noqa: E402
from quill_tpu.fields import pallas8 as p8  # noqa: E402
from quill_tpu.fields.bn254 import P  # noqa: E402
from quill_tpu.fields.scalar import inv as sinv  # noqa: E402

L = f8.L


def _mul_scan_kernel(bc, sub, c_ref, xs_ref, ys_ref, sv):
    """Serial prefix PRODUCT along the step axis (the seg_scan pattern of
    `fields/pallas8.py:379` with mont_mul bodies, no flags)."""
    spec = p8.unpack_spec(f8.FQ8.modulus, c_ref[:], vpu_redc=True)
    j = pl.program_id(1)
    s3 = (L, sub, 128)

    @pl.when(j == 0)
    def _():
        one = f8.FQ8.one_mont
        sv[:] = jnp.stack([jnp.full(s3[1:], float(one[i]), jnp.float32)
                           for i in range(L)], axis=0)

    def step(s, carry):
        xt = xs_ref[pl.ds(s, 1)].reshape(s3)
        cur = f8.mont_mul(sv[:], xt, spec)
        cur = f8.normal_form(cur)
        ys_ref[pl.ds(s, 1)] = cur.reshape((1,) + s3)
        sv[:] = cur
        return carry

    jax.lax.fori_loop(0, bc, step, 0)


_SUB = 8


@functools.lru_cache(maxsize=None)
def _mul_scan_call(s_len: int, m_len: int, bc: int = 8, sub: int = _SUB):
    pack = p8.consts_pack(f8.FQ8.modulus)
    mt = m_len // 128
    grid = (mt // sub, s_len // bc)
    cspec = pl.BlockSpec((bc, L, sub, 128), lambda i, j: (j, 0, i, 0),
                         memory_space=pltpu.VMEM)
    cshape = jax.ShapeDtypeStruct((s_len, L, mt, 128), jnp.float32)

    def run(xs):
        out = pl.pallas_call(
            functools.partial(_mul_scan_kernel, bc, sub),
            out_shape=cshape,
            grid=grid,
            in_specs=[pl.BlockSpec((p8._PACK_ROWS, L), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM), cspec],
            out_specs=cspec,
            scratch_shapes=[pltpu.VMEM((L, sub, 128), jnp.float32)],
            interpret=p8._interpret(),
        )(pack, xs.reshape(s_len, L, mt, 128))
        return out.reshape(s_len, L, m_len)

    return jax.jit(run)


@jax.jit
def _fermat_inv(x):
    """x^(p-2) on (L, M) via square-and-multiply over the 8-bit core."""
    e = P - 2
    acc = jnp.broadcast_to(
        jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None], x.shape
    ).astype(jnp.float32)
    base = x
    while e:
        if e & 1:
            acc = f8.mont_mul(acc, base, f8.FQ8)
        e >>= 1
        if e:
            base = f8.mont_mul(base, base, f8.FQ8)
    return acc


def _time(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(out[:1, :1] if out.ndim == 2 else out[:1, :1, :1])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return out, best


def main():
    rng = random.Random(1)
    S, M = 256, 1 << 15                       # 2^23 elements
    n = S * M
    print(f"probe at S={S} x M={M} = 2^{n.bit_length()-1} elements",
          flush=True)

    # exactness first, at small scale
    s0, m0 = 16, 256
    vals = [rng.randrange(1, P) for _ in range(s0 * m0)]
    mont = [v * pow(2, f8.R_BITS, P) % P for v in vals]
    xs = jnp.asarray(np.stack(
        [f8.ints_to_limbs8(mont[i * m0:(i + 1) * m0]) for i in range(s0)],
        axis=0), jnp.float32)                 # (S, L, M)
    pref = _mul_scan_call(s0, m0, bc=8, sub=2)(xs)
    got = f8.limbs8_to_ints(np.asarray(
        f8.lazy_to_canonical(pref[-1], f8.FQ8)))
    want = []
    for lane in range(m0):
        acc = 1
        for s in range(s0):
            acc = acc * vals[s * m0 + lane] % P
        want.append(acc * pow(2, f8.R_BITS, P) % P)   # still Montgomery
    # lazy_to_canonical leaves Montgomery form; compare in Montgomery
    assert got == want, "mul-scan prefix product mismatch"
    tot = pref[-1]
    inv_tot = _fermat_inv(tot)
    chk = f8.limbs8_to_ints(np.asarray(f8.lazy_to_canonical(
        f8.mont_mul(tot, inv_tot, f8.FQ8), f8.FQ8)))
    one_m = pow(2, f8.R_BITS, P) % P
    assert all(c == one_m for c in chk), "Fermat inverse mismatch"
    print("exactness: scan prefix + Fermat inverse OK", flush=True)

    if jax.default_backend() == "cpu":
        print("cpu backend: skipping at-scale timings", flush=True)
        return

    # timings at scale
    big = jnp.asarray(
        np.random.default_rng(0).integers(0, 200, (S, L, M)), jnp.float32)
    _, t_scan = _time(f"mul-scan fwd (S={S}, {n/1e6:.0f}M elems)",
                      _mul_scan_call(S, M), big)
    print(f"  -> {n / t_scan / 1e6:.0f} M scan-muls/s", flush=True)

    lane_tot = jnp.asarray(
        np.random.default_rng(1).integers(0, 200, (L, M)), jnp.float32)
    _, t_inv = _time(f"Fermat inversion (L, {M}) lanes", _fermat_inv,
                     lane_tot)
    print(f"  -> amortized {t_inv / n * 1e9:.2f} ns/elem over the level",
          flush=True)

    flat = jnp.asarray(
        np.random.default_rng(2).integers(0, 200, (L, n // 64)),
        jnp.float32)

    def canon(x):
        return f8.lazy_to_canonical(x, f8.FQ8)

    _, t_can = _time(f"lazy_to_canonical (L, {n//64})", jax.jit(canon),
                     flat)
    per = t_can / (n // 64)
    print(f"  -> {per*1e9:.1f} ns/elem per equality test", flush=True)

    # cost model vs the measured projective add floor
    t_add_proj = 1.0 / 45e6                   # measured 45 M adds/s
    t_model = (2 * t_scan / n                 # fwd + bwd serial scans
               + t_inv / n                    # amortized Fermat
               + 2 * per                      # two equality tests
               + 5.5 / 12 * t_add_proj)      # remaining ~5.5 muls of 12
    print(f"batched-affine model: {t_model*1e9:.1f} ns/add "
          f"vs projective {t_add_proj*1e9:.1f} ns/add "
          f"({t_add_proj/t_model:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
