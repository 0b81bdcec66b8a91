"""Correctness + timing check of ec/msm5.py (bf16 affine prefix-tree MSM)
against host aggregation, including the infinity-point substitution path.

Run: PYTHONPATH=.:/root/.axon_site python scripts/check_msm5.py
Env: QUILL_CHECK_LOG2N (default 16).
"""
import os
import random
import time

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import curve, msm as msm12, msm5  # noqa: E402
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
    nch = max(1, n // msm5.CHUNK)

    # distinct-point basis tiled to size, with an INFINITY point at slot 5
    # (nonzero scalars): exercises the generator-substitution + digit-zero
    # masking path
    g = curve.g1_generator()
    pts = []
    acc = g
    for _ in range(64):
        acc = acc.double().add(g)
        pts.append(acc.to_affine())
    pts[5] = curve.Affine(curve.Fq(0), curve.Fq(0), infinity=True)
    basis = msm12.load_basis(pts * (n // 64))
    scalars = [RNG.randrange(R) for _ in range(n)]
    chunks = [jnp.asarray(ints_to_limbs(
        scalars[j * msm5.CHUNK:(j + 1) * msm5.CHUNK])) for j in range(nch)]

    t0 = time.time()
    sh = msm5.shifted_basis_affine(basis)
    jax.block_until_ready(sh[-1])
    print(f"affine shifted_basis ({nch} chunks): {time.time()-t0:.2f}s",
          flush=True)

    t0 = time.time()
    out = msm5.msm_device(basis, chunks, n)
    t_first = time.time() - t0
    t0 = time.time()
    out = msm5.msm_device(basis, chunks, n)
    t_warm = time.time() - t0
    print(f"msm5 2^{log2n}: first {t_first:.2f}s, warm {t_warm:.2f}s "
          f"({n/t_warm/1e3:.0f}k pts/s)", flush=True)

    agg = [0] * 64
    for i, s in enumerate(scalars):
        agg[i % 64] = (agg[i % 64] + s) % R
    expect = curve.Jacobian.identity(curve.Fq(1))
    for p, s in zip(pts, agg):
        if not p.infinity:
            expect = expect.add(
                curve.Jacobian(p.x, p.y, curve.Fq(1)).scalar_mul(s))
    _check("general basis + infinity point", out, expect)

    # batched path with a shorter and an empty member (engine padding shape)
    bsc, bexp = [], []
    for k in range(4):
        ns = (n if k < 2 else n // 2) if k < 3 else 0
        sc_k = [RNG.randrange(R) for _ in range(ns)] + [0] * (n - ns)
        bsc.append([jnp.asarray(ints_to_limbs(
            sc_k[j * msm5.CHUNK:(j + 1) * msm5.CHUNK]))
            for j in range(nch)] if ns else [])
        agg = [0] * 64
        for i, s in enumerate(sc_k):
            agg[i % 64] = (agg[i % 64] + s) % R
        e = curve.Jacobian.identity(curve.Fq(1))
        for p, s in zip(pts, agg):
            if not p.infinity:
                e = e.add(curve.Jacobian(p.x, p.y, curve.Fq(1)).scalar_mul(s))
        bexp.append(e)
    t0 = time.time()
    outs = msm5.msm_device_batch(basis, bsc)
    t_first = time.time() - t0
    t0 = time.time()
    outs = msm5.msm_device_batch(basis, bsc)
    print(f"msm5 batch x4 2^{log2n}: first {t_first:.2f}s, "
          f"warm {time.time()-t0:.2f}s", flush=True)
    for k, (e, o) in enumerate(zip(bexp, outs)):
        _check(f"batch[{k}]", o, e)

    # tau-powers CRS (the production path)
    from quill_tpu.ec.fixed_base import device_tau_powers

    tau = 987654321987654321 % R
    xs2, ys2 = device_tau_powers(tau, n)
    inf2 = [jnp.zeros((msm5.CHUNK,), bool) for _ in xs2]
    basis2 = msm12.DeviceBasis(affines=None, x_chunks=xs2, y_chunks=ys2,
                               inf_chunks=inf2, length=n)
    basis2.tau = tau
    t0 = time.time()
    sh2 = msm5.shifted_basis_affine(basis2)
    jax.block_until_ready(sh2[-1])
    print(f"tau fixed-base affine shift ({nch} chunks): "
          f"{time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    out2 = msm5.msm_device(basis2, chunks, n)
    t_first = time.time() - t0
    t0 = time.time()
    out2 = msm5.msm_device(basis2, chunks, n)
    print(f"msm5 tau-CRS 2^{log2n}: first {t_first:.2f}s, warm "
          f"{time.time()-t0:.2f}s", flush=True)
    agg2, p = 0, 1
    for s in scalars:
        agg2 = (agg2 + s * p) % R
        p = p * tau % R
    _check("tau-CRS", out2, curve.g1_generator().scalar_mul(agg2))


if __name__ == "__main__":
    main()
