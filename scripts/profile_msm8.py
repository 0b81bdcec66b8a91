"""Phase breakdown of msm8 at one chunk.
Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_msm8.py
"""
import random
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import curve, msm as msm12, msm8  # noqa: E402
from quill_tpu.fields import pallas8 as p8  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402

RNG = random.Random(5)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
        jax.block_until_ready(l)
    np.asarray(jax.device_get(leaves[0].ravel()[0]))
    return x


def timed(name, fn, *args, reps=3):
    out = sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms")
    return out


def main():
    n = msm8.CHUNK
    g = curve.g1_generator()
    pts = []
    acc = g
    for _ in range(64):
        acc = acc.double().add(g)
        pts.append(acc.to_affine())
    basis = msm12.load_basis(pts * (n // 64))
    xy = msm8.basis8(basis)
    sc = jnp.asarray(ints_to_limbs([RNG.randrange(R) for _ in range(n)]))

    sg = timed("sort_gather8", msm8._k_sort_gather8,
               sc, xy[0], basis.inf_chunks[0])
    sorted_d, xs, gf = sg
    timed("  big seg_scan alone", jax.jit(
        lambda a, b: msm8.p8.seg_scan(a, b)), xs, gf)
    cs = timed("chunk_scan (big + offsets + cummax)", msm8._k_chunk_scan,
               xs, gf)
    ys, wf, offs = cs
    acc0 = msm8.p8.identity_stacked(msm8.NUM_WINDOWS * msm8.NUM_BUCKETS)
    acc1 = timed("collect8 (fused gather+combine)", msm8._k_collect8,
                 sorted_d, ys, wf, offs, acc0)
    timed("triangle8", msm8._k_triangle, acc1)


if __name__ == "__main__":
    main()
