"""Exactness check of ec/msm4.py vs the host oracle on the chip.

Covers: single chunk, multi-super-chunk (5 chunks), zero / edge scalars,
batched MSMs with unequal lengths, and non-chunk-multiple lengths
(zero-padded tails)."""
import random
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import curve, msm as msm12, msm4  # noqa: E402
from quill_tpu.ec.fixed_base import device_tau_powers  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402

RNG = random.Random(11)


def tau_basis(n, tau):
    xs, ys = device_tau_powers(tau, n)
    inf = [jnp.zeros((msm12.CHUNK,), bool) for _ in xs]
    b = msm12.DeviceBasis(affines=None, x_chunks=xs, y_chunks=ys,
                          inf_chunks=inf, length=n)
    b.tau = tau
    return b


def host_expected(tau, scalars):
    from quill_tpu.ec import native_ec

    g = curve.g1_generator()
    powers = [1] * len(scalars)
    for i in range(1, len(scalars)):
        powers[i] = powers[i - 1] * tau % R
    if native_ec.available():
        jacs = native_ec.scalar_mul_many(g.to_affine(), powers)
    else:
        jacs = [g.scalar_mul(p) for p in powers]
    affs = curve.batch_to_affine(jacs)
    return curve.msm_host(affs, scalars)


def chunks_of(scalars):
    ints = list(scalars) + [0] * (-len(scalars) % msm12.CHUNK)
    return [jnp.asarray(ints_to_limbs(ints[o:o + msm12.CHUNK]))
            for o in range(0, len(ints), msm12.CHUNK)]


def main():
    tau = 987654321987654321 % R

    # case 1: one chunk, edge scalars
    n1 = msm12.CHUNK
    basis1 = tau_basis(n1, tau)
    sc1 = [RNG.randrange(R) for _ in range(n1)]
    sc1[0] = 0
    sc1[1] = 1
    sc1[2] = R - 1
    t0 = time.time()
    got = msm4.msm_device(basis1, chunks_of(sc1), n1)
    print(f"case1 first run (incl. exports/compiles): "
          f"{time.time()-t0:.1f}s", flush=True)
    exp = host_expected(tau, sc1)
    assert got == exp, "case1 single-chunk mismatch"
    print("case1 OK (single chunk, edge scalars)", flush=True)

    # warm re-run timing
    t0 = time.time()
    got = msm4.msm_device(basis1, chunks_of(sc1), n1)
    print(f"case1 warm: {time.time()-t0:.3f}s", flush=True)

    # case 2: 5 chunks (2 super-chunks at NSC=4), short length (padding)
    n2 = 4 * msm12.CHUNK + 12345
    basis2 = tau_basis(5 * msm12.CHUNK, tau)
    sc2 = [RNG.randrange(R) for _ in range(n2)]
    got = msm4.msm_device(basis2, chunks_of(sc2), n2)
    exp = host_expected(tau, sc2)
    assert got == exp, "case2 multi-super-chunk mismatch"
    print("case2 OK (5 chunks, padded tail)", flush=True)

    # case 3: batched MSMs, unequal lengths
    sc3a = [RNG.randrange(R) for _ in range(msm12.CHUNK)]
    sc3b = [RNG.randrange(R) for _ in range(777)]
    sc3c = []
    t0 = time.time()
    res = msm4.msm_device_batch(
        basis1, [chunks_of(sc3a), chunks_of(sc3b), chunks_of(sc3c)])
    print(f"case3 batch3: {time.time()-t0:.3f}s", flush=True)
    assert res[0] == host_expected(tau, sc3a), "case3a mismatch"
    assert res[1] == host_expected(tau, sc3b), "case3b mismatch"
    assert res[2].is_identity(), "case3c (empty) not identity"
    print("case3 OK (batched, unequal lengths)", flush=True)
    print("ALL msm4 checks passed", flush=True)


if __name__ == "__main__":
    main()
