"""Correctness + timing check of ec/msm7.py (signed-digit bitrev-tree MSM)
against host aggregation: general basis with an infinity point, scalar edge
values, batched path with short/empty members, and the tau-powers CRS.

Run: PYTHONPATH=.:/root/.axon_site python scripts/check_msm7.py
Env: QUILL_CHECK_LOG2N (default 16).
"""
import os
import random
import time

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import curve, msm as msm12, msm7  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402

RNG = random.Random(7)


def _check(label, got, expect):
    ea, oa = expect.to_affine(), got.to_affine()
    ok = (ea.x.v == oa.x.v and ea.y.v == oa.y.v
          and ea.infinity == oa.infinity)
    print(f"{label}: {'EXACT MATCH' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        raise SystemExit(1)


def main():
    log2n = int(os.environ.get("QUILL_CHECK_LOG2N", "16"))
    n = 1 << log2n
    nch = max(1, n // msm7.CHUNK)

    g = curve.g1_generator()
    pts = []
    acc = g
    for _ in range(64):
        acc = acc.double().add(g)
        pts.append(acc.to_affine())
    pts[5] = curve.Affine(curve.Fq(0), curve.Fq(0), infinity=True)
    basis = msm12.load_basis(pts * (n // 64))
    scalars = [RNG.randrange(R) for _ in range(n)]
    scalars[:4] = [0, 1, R - 1, R - 2]
    chunks = [jnp.asarray(ints_to_limbs(
        scalars[j * msm7.CHUNK:(j + 1) * msm7.CHUNK])) for j in range(nch)]

    t0 = time.time()
    sh = msm7.shifted_basis16(basis)
    jax.block_until_ready(sh)
    print(f"c=16 shifted basis ({nch} chunks): {time.time()-t0:.2f}s",
          flush=True)

    t0 = time.time()
    out = msm7.msm_device(basis, chunks, n)
    t_first = time.time() - t0
    t0 = time.time()
    out = msm7.msm_device(basis, chunks, n)
    t_warm = time.time() - t0
    print(f"msm7 2^{log2n}: first {t_first:.2f}s, warm {t_warm:.2f}s "
          f"({n/t_warm/1e3:.0f}k pts/s)", flush=True)

    agg = [0] * 64
    for i, s in enumerate(scalars):
        agg[i % 64] = (agg[i % 64] + s) % R
    expect = curve.Jacobian.identity(curve.Fq(1))
    for p, s in zip(pts, agg):
        if not p.infinity:
            expect = expect.add(
                curve.Jacobian(p.x, p.y, curve.Fq(1)).scalar_mul(s))
    _check("general basis + infinity + edge scalars", out, expect)

    # batched path with a shorter and an empty member
    bsc, bexp = [], []
    for k in range(4):
        ns = (n if k < 2 else n // 2) if k < 3 else 0
        sc_k = [RNG.randrange(R) for _ in range(ns)] + [0] * (n - ns)
        bsc.append([jnp.asarray(ints_to_limbs(
            sc_k[j * msm7.CHUNK:(j + 1) * msm7.CHUNK]))
            for j in range(max(1, ns // msm7.CHUNK))] if ns else [])
        agg = [0] * 64
        for i, s in enumerate(sc_k):
            agg[i % 64] = (agg[i % 64] + s) % R
        e = curve.Jacobian.identity(curve.Fq(1))
        for p, s in zip(pts, agg):
            if not p.infinity:
                e = e.add(curve.Jacobian(p.x, p.y, curve.Fq(1)).scalar_mul(s))
        bexp.append(e)
    t0 = time.time()
    outs = msm7.msm_device_batch(basis, bsc)
    print(f"msm7 batch x4: {time.time()-t0:.2f}s", flush=True)
    for k, (e, o) in enumerate(zip(bexp, outs)):
        _check(f"batch[{k}]", o, e)

    # tau-powers CRS (the production path).  Drop the general basis' cached
    # shifted basis first: two resident 2.2 GB caches + the tree OOM a
    # 16 GB chip at 2^20.
    root = getattr(basis, "_root", basis)
    root._b6_flat = None
    root._b6_flat_nch = 0
    del sh, basis
    from quill_tpu.ec.fixed_base import device_tau_powers

    tau = 987654321987654321 % R
    xs2, ys2 = device_tau_powers(tau, n)
    inf2 = [jnp.zeros((msm7.CHUNK,), bool) for _ in xs2]
    basis2 = msm12.DeviceBasis(affines=None, x_chunks=xs2, y_chunks=ys2,
                               inf_chunks=inf2, length=n)
    basis2.tau = tau
    t0 = time.time()
    sh2 = msm7.shifted_basis16(basis2)
    jax.block_until_ready(sh2)
    print(f"tau fixed-base c=16 shift ({nch} chunks): "
          f"{time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    out2 = msm7.msm_device(basis2, chunks, n)
    t_first = time.time() - t0
    t0 = time.time()
    out2 = msm7.msm_device(basis2, chunks, n)
    t2 = time.time() - t0
    print(f"msm7 tau-CRS 2^{log2n}: first {t_first:.2f}s, warm {t2:.2f}s "
          f"({n/t2/1e3:.0f}k pts/s)", flush=True)
    agg2, p = 0, 1
    for s in scalars:
        agg2 = (agg2 + s * p) % R
        p = p * tau % R
    _check("tau-CRS", out2, curve.g1_generator().scalar_mul(agg2))


if __name__ == "__main__":
    main()
