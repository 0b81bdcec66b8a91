"""Warm end-to-end msm3 timing at 1 and 4 chunks."""
import random
import time

import jax
import jax.numpy as jnp

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

from quill_tpu.ec import curve, msm as msm12, msm3  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402

RNG = random.Random(7)


def main():
    g = curve.g1_generator()
    pts = []
    acc = g
    for _ in range(64):
        acc = acc.double().add(g)
        pts.append(acc.to_affine())

    for nch in (1, 4):
        n = nch * msm3.CHUNK
        basis = msm12.load_basis(pts * (n // 64))
        chunks = [jnp.asarray(ints_to_limbs(
            [RNG.randrange(R) for _ in range(msm3.CHUNK)]))
            for _ in range(nch)]
        sh = msm3.shifted_basis(basis)
        jax.block_until_ready(sh[-1])
        msm3.msm_device(basis, chunks, n)          # warmup
        times = []
        for _ in range(3):
            t0 = time.time()
            msm3.msm_device(basis, chunks, n)
            times.append(time.time() - t0)
        best = min(times)
        print(f"2^{n.bit_length()-1}: best {best*1e3:.1f} ms "
              f"({n/best/1e6:.2f} M pts/s)", flush=True)


if __name__ == "__main__":
    main()
