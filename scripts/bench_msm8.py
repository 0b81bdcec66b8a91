"""Correctness + throughput for the 8-bit Pallas MSM (ec/msm8.py) on chip.
Run: PYTHONPATH=.:/root/.axon_site python scripts/bench_msm8.py [log2_n]
"""
import random
import sys
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import curve, msm as msm12, msm8  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402

RNG = random.Random(5)


def main(log2_n=16):
    n = 1 << log2_n
    print(f"MSM n=2^{log2_n}, c={msm8.WINDOW_BITS}, W={msm8.NUM_WINDOWS}")
    g = curve.g1_generator()
    pts = []
    acc = g
    for _ in range(64):
        acc = acc.double().add(g)
        pts.append(acc.to_affine())
    affs = pts * (n // 64)
    t0 = time.perf_counter()
    basis = msm12.load_basis(affs)
    print(f"load_basis: {time.perf_counter()-t0:.1f}s")
    scalars = [RNG.randrange(R) for _ in range(n)]
    chunks = [jnp.asarray(ints_to_limbs(
        scalars[j * msm8.CHUNK:(j + 1) * msm8.CHUNK]))
        for j in range(n // msm8.CHUNK)]

    t0 = time.perf_counter()
    out = msm8.msm_device(basis, chunks, n)
    print(f"msm8 (cold): {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    out = msm8.msm_device(basis, chunks, n)
    warm = time.perf_counter() - t0
    print(f"msm8 (warm): {warm:.2f}s  ({n/warm/1e3:.0f}k points/s)")

    # independent check: sum over the 64 distinct points of
    # (sum of scalars at that point) * point
    agg = [0] * 64
    for i, s in enumerate(scalars):
        agg[i % 64] = (agg[i % 64] + s) % R
    expect = curve.Jacobian.identity(curve.Fq(1))
    for k, pt in enumerate(pts):
        if agg[k]:
            j = curve.Jacobian(pt.x, pt.y, curve.Fq(1))
            accp = None
            kk = agg[k]
            base = j
            while kk:
                if kk & 1:
                    accp = base if accp is None else accp.add(base)
                base = base.double()
                kk >>= 1
            expect = expect.add(accp)
    ea, oa = expect.to_affine(), out.to_affine()
    assert (ea.infinity == oa.infinity and ea.x == oa.x and ea.y == oa.y), \
        "msm8 MISMATCH"
    print("msm8 result EXACT vs host aggregation")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
