"""Phase breakdown of the current device MSM at one 2^16 chunk, c=13.
Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_msm.py
"""
import random
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import msm as msm_mod  # noqa: E402
from quill_tpu.ec import device as ed  # noqa: E402
from quill_tpu.ec import curve  # noqa: E402
from quill_tpu.fields import device as fd  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402

RNG = random.Random(3)


def sync(x):
    jax.block_until_ready(x)
    leaves = jax.tree_util.tree_leaves(x)
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
    n = msm_mod.CHUNK
    print("chunk =", n, "windows =", msm_mod.NUM_WINDOWS,
          "buckets =", msm_mod.NUM_BUCKETS)
    # random-ish basis: reuse 64 distinct points tiled (EC math doesn't care)
    g = curve.g1_generator()
    pts = []
    acc = g
    for _ in range(64):
        acc = acc.double().add(g)
        pts.append(acc.to_affine())
    affs = (pts * (n // 64))
    basis = msm_mod.load_basis(affs)
    scalars = jnp.asarray(ints_to_limbs([RNG.randrange(R) for _ in range(n)]))

    sg = timed("sort_gather", msm_mod._k_sort_gather,
               scalars, basis.x_chunks[0], basis.y_chunks[0],
               basis.inf_chunks[0])
    sorted_d, px, py, pz = sg

    prev = jnp.concatenate(
        [jnp.full(sorted_d.shape[:-1] + (1,), -1, jnp.int32),
         sorted_d[..., :-1]], axis=-1)
    flags = sorted_d != prev

    blocks = timed("seg_scan stage1 (blocks)", msm_mod._k_seg_scan_blocks,
                   px, py, pz, flags)
    within, within_f, offs, offs_f = blocks
    pts_scanned = timed("seg_scan stage2 (combine)",
                        msm_mod._k_seg_scan_combine,
                        *within, within_f, *offs, offs_f)

    acc0 = ed.pt_identity((msm_mod.NUM_WINDOWS, msm_mod.NUM_BUCKETS))
    acc1 = timed("bucket_gather_acc", msm_mod._k_bucket_gather_acc,
                 sorted_d, *pts_scanned, *acc0)

    def triangle(ax, ay, az):
        rev = msm_mod._k_reverse_buckets(ax, ay, az)
        suf_rev = msm_mod._hs_scan(
            rev, msm_mod._zero_seg((msm_mod.NUM_WINDOWS,
                                    msm_mod.NUM_BUCKETS)),
            msm_mod.NUM_BUCKETS)
        suf = msm_mod._k_reverse_buckets(*suf_rev)
        tail = tuple(c[:, :, 1:] for c in suf)
        red = msm_mod._hs_scan(
            tail, msm_mod._zero_seg((msm_mod.NUM_WINDOWS,
                                     msm_mod.NUM_BUCKETS - 1)),
            msm_mod.NUM_BUCKETS - 1)
        return msm_mod._k_take_last(*red)

    timed("triangle reduction", triangle, *acc1)


if __name__ == "__main__":
    main()
