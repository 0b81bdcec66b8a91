"""Isolate the warm-prove preprocess cost: shift gen vs chunk pipeline vs
scalar conversion, in the same KZG/engine context the prover uses."""
import random
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402

from quill_tpu.engine.device import TpuEngine  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.pcs.kzg import KZG  # noqa: E402


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ndim") and leaf.ndim:
            np.asarray(jax.lax.slice(leaf, (0,) * leaf.ndim,
                                     (1,) * leaf.ndim))


def main():
    rng = random.Random(3)
    eng = TpuEngine()
    n = 1 << 18
    t0 = time.time()
    kzg = KZG.trusted_setup(eng, n - 1)
    print(f"trusted_setup: {time.time()-t0:.2f}s", flush=True)

    from quill_tpu.ec import msm3

    t0 = time.time()
    sh = msm3.shifted_basis(kzg._basis)
    sync(sh[-1])
    print(f"shifted_basis 4 chunks: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    vecs = [eng.vec_from_ints([rng.randrange(R) for _ in range(n)])
            for _ in range(4)]
    sync(vecs[0].chunks[0])
    print(f"vec_from_ints x4: {time.time()-t0:.2f}s", flush=True)

    for tag in ("first", "warm"):
        t0 = time.time()
        comms = kzg.commit_many(vecs)
        print(f"commit_many x4 ({tag}): {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    c = kzg.commit(vecs[0])
    print(f"single commit: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
