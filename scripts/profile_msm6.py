"""Per-stage timing of the msm6 pipeline at 2^20 (tau CRS, warm kernels).

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_msm6.py
"""
import os
import time

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quill_tpu.ec import msm as msm12, msm6  # noqa: E402
from quill_tpu.ec.fixed_base import device_tau_powers  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def t(label, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return out


def main():
    log2n = int(os.environ.get("QUILL_CHECK_LOG2N", "20"))
    n = 1 << log2n
    nch = n // msm6.CHUNK
    tau = 123456789123456789 % R
    xs, ys = device_tau_powers(tau, n)
    inf = [jnp.zeros((msm6.CHUNK,), bool) for _ in xs]
    basis = msm12.DeviceBasis(affines=None, x_chunks=xs, y_chunks=ys,
                              inf_chunks=inf, length=n)
    basis.tau = tau
    base_flat = msm6.shifted_basis16(basis)
    jax.block_until_ready(base_flat)

    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 4096, size=(nch, 22, msm6.CHUNK),
                         dtype=np.int32)
    limbs[:, 21] &= 1
    chunks = [jnp.asarray(limbs[j]) for j in range(nch)]

    m = 4 + msm6.LOG2_CHUNK + (nch.bit_length() - 1)
    fl = msm6.W * msm6.CHUNK * nch

    def digits():
        parts = [msm6._k_digits16(chunks[j], inf[j]).reshape(-1)
                 for j in range(nch)]
        return jnp.concatenate(parts) if nch > 1 else parts[0]

    keys = t("digits", digits)
    sg = t("sort+bitrev+gather", msm6._k_sort_gather, keys, base_flat, m, fl)
    sorted_k, perm, leaves = sg

    levels = t("up_sweep (all levels)", msm6._up_sweep, leaves)
    lvl0 = t("  level0 alone", msm6._lvl_call(leaves.shape[-1] // 2, True),
             leaves)
    del lvl0
    kmin = len(levels) - 1
    top = levels[kmin]
    brev_idx = jnp.asarray(msm6._brev_half(m - kmin))
    coarse = t("coarse ladder", msm6._k_coarse(top.shape[-1]), top, brev_idx)

    def queries():
        acc, offset, cnt = msm6._k_qinit(kmin)(sorted_k, coarse)
        k = kmin - 1
        while k >= 2:
            acc, offset = msm6._k_qstep_pair(k, m - k)(
                acc, offset, cnt, levels[k], levels[k - 1])
            k -= 2
        if k == 1:
            acc, offset = msm6._k_qstep(1, m - 1)(acc, offset, cnt,
                                                  levels[1])
        return msm6._k_qstep0(m)(acc, offset, cnt, perm, base_flat)

    acc = t("qinit+qsteps", queries)
    acc2 = jnp.concatenate([acc, msm6._ident_cols(1)], axis=1)
    s_col = t("reduce 65536", msm6._reduce_cols, acc2)

    def whole():
        return msm6._msm_one(base_flat, chunks, inf)

    t0 = time.perf_counter()
    whole()
    print(f"WHOLE msm6: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    t0 = time.perf_counter()
    whole()
    print(f"WHOLE msm6 (again): {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
