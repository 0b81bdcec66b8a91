"""Correctness + timing check of ec/msm3.py against host aggregation.

Run: PYTHONPATH=.:/root/.axon_site python scripts/check_msm3.py
Env: QUILL_CHECK_LOG2N (default 16).
"""
import os
import random
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import curve, msm as msm12, msm3  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402

RNG = random.Random(7)


def main():
    log2n = int(os.environ.get("QUILL_CHECK_LOG2N", "16"))
    n = 1 << log2n
    nch = max(1, n // msm3.CHUNK)

    # small distinct-point basis, tiled to size (host-checkable)
    g = curve.g1_generator()
    pts = []
    acc = g
    for _ in range(64):
        acc = acc.double().add(g)
        pts.append(acc.to_affine())
    basis = msm12.load_basis(pts * (n // 64))
    scalars = [RNG.randrange(R) for _ in range(n)]
    chunks = [jnp.asarray(ints_to_limbs(
        scalars[j * msm3.CHUNK:(j + 1) * msm3.CHUNK])) for j in range(nch)]

    t0 = time.time()
    sh = msm3.shifted_basis(basis)
    jax.block_until_ready(sh[-1])
    print(f"shifted_basis ({nch} chunks): {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    out = msm3.msm_device(basis, chunks, n)
    t_first = time.time() - t0
    t0 = time.time()
    out = msm3.msm_device(basis, chunks, n)
    t_warm = time.time() - t0
    print(f"msm3 2^{log2n}: first {t_first:.2f}s, warm {t_warm:.2f}s "
          f"({n/t_warm/1e3:.0f}k pts/s)", flush=True)

    # host oracle: group scalars per distinct point
    agg = [0] * 64
    for i, s in enumerate(scalars):
        agg[i % 64] = (agg[i % 64] + s) % R
    expect = curve.Jacobian.identity(curve.Fq(1))
    for p, s in zip(pts, agg):
        expect = expect.add(curve.Jacobian(p.x, p.y, curve.Fq(1)).scalar_mul(s))
    ea, oa = expect.to_affine(), out.to_affine()
    same = (ea.x.v == oa.x.v and ea.y.v == oa.y.v
            and ea.infinity == oa.infinity)
    print("EXACT MATCH" if same else "MISMATCH", flush=True)
    if not same:
        raise SystemExit(1)

    # batched path: 4 MSMs (the third shorter -> zero-padded; the fourth
    # empty, as engine group padding produces) must each match an
    # independent host aggregation.  B=4 matches the prover's tower.
    bsc = []
    bexp = []
    for k in range(4):
        ns = (n if k < 2 else n // 2) if k < 3 else 0
        sc_k = [RNG.randrange(R) for _ in range(ns)] + [0] * (n - ns)
        bsc.append([jnp.asarray(ints_to_limbs(
            sc_k[j * msm3.CHUNK:(j + 1) * msm3.CHUNK]))
            for j in range(nch)] if ns else [])
        agg = [0] * 64
        for i, s in enumerate(sc_k):
            agg[i % 64] = (agg[i % 64] + s) % R
        e = curve.Jacobian.identity(curve.Fq(1))
        for p, s in zip(pts, agg):
            e = e.add(curve.Jacobian(p.x, p.y, curve.Fq(1)).scalar_mul(s))
        bexp.append(e.to_affine())
    t0 = time.time()
    outs = msm3.msm_device_batch(basis, bsc)
    t_first = time.time() - t0
    t0 = time.time()
    outs = msm3.msm_device_batch(basis, bsc)
    t_batch = time.time() - t0
    print(f"msm3 batch x4 2^{log2n}: first {t_first:.2f}s, "
          f"warm {t_batch:.2f}s", flush=True)
    for k, (e, o) in enumerate(zip(bexp, outs)):
        oa = o.to_affine()
        ok = (e.x.v == oa.x.v and e.y.v == oa.y.v
              and e.infinity == oa.infinity)
        print(f"batch[{k}]: {'EXACT MATCH' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            raise SystemExit(1)

    # tau-powers CRS: exercises the fixed-base shifted-basis generator;
    # oracle = (sum_i s_i tau^i) * G, one host scalar mul
    from quill_tpu.ec.fixed_base import device_tau_powers

    tau = 987654321987654321 % R
    t0 = time.time()
    xs2, ys2 = device_tau_powers(tau, n)
    inf2 = [jnp.zeros((msm3.CHUNK,), bool) for _ in xs2]
    basis2 = msm12.DeviceBasis(affines=None, x_chunks=xs2, y_chunks=ys2,
                               inf_chunks=inf2, length=n)
    basis2.tau = tau
    print(f"tau CRS gen: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    sh2 = msm3.shifted_basis(basis2)
    jax.block_until_ready(sh2[-1])
    print(f"fixed-base shifted gen ({nch} chunks): {time.time()-t0:.2f}s",
          flush=True)
    t0 = time.time()
    out2 = msm3.msm_device(basis2, chunks, n)
    print(f"msm3 tau-CRS 2^{log2n}: {time.time()-t0:.2f}s", flush=True)
    agg2, p = 0, 1
    for s in scalars:
        agg2 = (agg2 + s * p) % R
        p = p * tau % R
    e2 = curve.g1_generator().scalar_mul(agg2).to_affine()
    o2 = out2.to_affine()
    ok = (e2.x.v == o2.x.v and e2.y.v == o2.y.v
          and e2.infinity == o2.infinity)
    print(f"tau-CRS: {'EXACT MATCH' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
