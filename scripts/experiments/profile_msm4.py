"""Per-stage timing of the msm4 pipeline on one super-chunk (TPU).

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_msm4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from quill_tpu.utils.jaxcfg import configure_jax  # noqa: E402

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import msm as msm12  # noqa: E402
from quill_tpu.ec import msm3, msm4  # noqa: E402
from quill_tpu.ec.fixed_base import device_tau_powers  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402


def sync(x):
    # axon: block_until_ready returns early; fetch ONE element (slicing
    # first on device -- np.asarray of a big array downloads all of it
    # through the ~45 MB/s tunnel and wrecks the timing)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def t(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    print(f"{name:24s} {best*1000:8.2f} ms", flush=True)
    return out


def main():
    nsc = int(os.environ.get("QUILL_PROF_NSC", "4"))
    rng = np.random.default_rng(0)
    tau = 987654321987654321 % R
    n = nsc * msm12.CHUNK
    xs, ys = device_tau_powers(tau, n)
    inf = [jnp.zeros((msm12.CHUNK,), bool) for _ in xs]
    basis = msm12.DeviceBasis(affines=None, x_chunks=xs, y_chunks=ys,
                              inf_chunks=inf, length=n)
    basis.tau = tau

    t0 = time.time()
    sh = msm4.shifted_affine_basis(basis)
    sync(sh[-1])
    print(f"shifted basis build      {time.time()-t0:8.2f} s (one-time)")

    limbs = rng.integers(0, 4096, size=(nsc, 22, msm12.CHUNK), dtype=np.int32)
    limbs[:, 21] &= 1
    scs = jnp.asarray(limbs)[None]  # (1, nsc, 22, CHUNK)
    base_cat = jnp.concatenate(sh, axis=1)

    keys = t("keys", msm4._k_keys, scs)
    sk, perm, leaves = t("sortg", msm4._k_sortg, keys, base_cat)
    up = msm4._up_fused_call(leaves.shape[-1])
    levels = t("up-sweep", up, leaves)
    lsc = msm4._lane_scan_call(leaves.shape[-1])
    lane_excl = t("lane-scan", lsc, levels[-1].reshape(msm4.L3, -1))
    acc_s = msm3._ident_cols(1)
    acc_t = msm3._ident_cols(1)
    t("collect", msm4._k_collect, sk, perm, base_cat, lane_excl, levels,
      acc_s, acc_t)

    t0 = time.time()
    res = msm4.msm_device_batch(basis, [[jnp.asarray(limbs[i])
                                         for i in range(nsc)]])
    print(f"full msm ({n} pts)       {time.time()-t0:8.2f} s "
          f"({n/(time.time()-t0)/1e6:.2f} M pts/s)")


if __name__ == "__main__":
    main()
