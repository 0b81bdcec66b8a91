"""Per-phase timing of ec/msm3.py on one 2^16 chunk.

The chunk pipeline is one fused dispatch (`_k_chunk`), so phases are:
shift (per-CRS-chunk precompute), chunk, finalize.
"""
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


def _sync(out):
    # axon's block_until_ready returns early; a tiny host fetch of one
    # element forces the producing computation to finish.
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape") and leaf.ndim:
            np.asarray(jax.lax.slice(leaf, (0,) * leaf.ndim, (1,) * leaf.ndim))


def t(label, fn, *a):
    out = fn(*a)
    _sync(out)
    t0 = time.time()
    out = fn(*a)
    _sync(out)
    print(f"{label}: {(time.time()-t0)*1e3:.1f} ms", flush=True)
    return out


def main():
    n = msm3.CHUNK
    g = curve.g1_generator()
    pts = []
    acc = g
    for _ in range(64):
        acc = acc.double().add(g)
        pts.append(acc.to_affine())
    basis = msm12.load_basis(pts * (n // 64))
    scalars = [RNG.randrange(R) for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars))

    t0 = time.time()
    sh = msm3.shifted_basis(basis)
    _sync(sh[0])
    print(f"shift (first): {(time.time()-t0)*1e3:.1f} ms", flush=True)

    acc_s = msm3._ident_cols(1)
    acc_t = msm3._ident_cols(1)
    t("chunk", msm3._chunk_run, sc[None], sh[0], acc_s, acc_t)

    t0 = time.time()
    msm3.msm_device(basis, [sc], n)
    print(f"full msm_device: {(time.time()-t0)*1e3:.1f} ms", flush=True)
    t0 = time.time()
    msm3.msm_device(basis, [sc], n)
    print(f"full msm_device (warm): {(time.time()-t0)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
