"""Stage-granular timing of the msm5 chunk pipeline on one 2^16 chunk
(B=1): sortg / up0 / up levels / lane prefix / down / cgather / collect."""
import random
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quill_tpu.ec import msm as msm12, msm3, msm5  # noqa: E402
from quill_tpu.ec.fixed_base import device_tau_powers  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402

RNG = np.random.default_rng(7)


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0):
            np.asarray(jax.lax.slice(leaf, (0,) * leaf.ndim,
                                     (1,) * leaf.ndim))


def t(label, fn, *a, reps=2):
    out = fn(*a)
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*a)
        _sync(out)
        times.append(time.time() - t0)
    print(f"{label}: {min(times)*1e3:.1f} ms", flush=True)
    return out


def main():
    n = msm5.CHUNK
    tau = 123456789123456789 % R
    xs, ys = device_tau_powers(tau, n)
    inf = [jnp.zeros((msm12.CHUNK,), bool) for _ in xs]
    basis = msm12.DeviceBasis(affines=None, x_chunks=xs, y_chunks=ys,
                              inf_chunks=inf, length=n)
    basis.tau = tau

    t0 = time.time()
    sh = msm5.shifted_basis_affine(basis)[0]
    _sync(sh)
    print(f"affine shift (first): {(time.time()-t0)*1e3:.1f} ms", flush=True)

    limbs = RNG.integers(0, 4096, size=(22, n), dtype=np.int32)
    limbs[21] &= 1
    scs = jnp.asarray(limbs)[None]  # B=1
    inf0 = basis.inf_chunks[0]

    sorted_k, perm, leaves = t("sortg (bf16)", msm5._k_sortg, scs, sh, inf0)

    x = t(f"up0 affine: {leaves.shape[0]}x{leaves.shape[-1]}",
          msm5._up0_call(leaves.shape[0] // 2, leaves.shape[-1]), leaves)
    i = 1
    levels = [None, None]
    while x.shape[0] > 1:
        levels.append(x)
        x = t(f"up{i}: {x.shape[0]}x{x.shape[-1]}",
              msm3._up_call(x.shape[0] // 2, x.shape[-1]), x)
        i += 1
    levels.append(x)
    lane = t("lane prefix (ladder 5120)", msm3._prefix_cols, x[0])
    i_arr = lane[None]
    for lvl in reversed(levels[2:-1]):
        i_arr = t(f"down {i_arr.shape[0]}->",
                  msm3._down_call(i_arr.shape[0], i_arr.shape[-1]),
                  i_arr, lvl)

    acc_s = msm3._ident_cols(1)
    acc_t = msm3._ident_cols(1)
    tt, totals = t("cgather", msm5._k_cgather, sorted_k, perm, i_arr, sh,
                   acc_s)
    t("collect (fused)", msm3._k_collect, tt, acc_s, acc_t, totals)

    def chunk():
        return msm5._chunk_run(scs, sh, inf0, acc_s, acc_t)
    t("WHOLE chunk (B=1)", chunk)

    scs4 = jnp.concatenate([scs] * 4, axis=0)
    acc4 = msm3._ident_cols(4)

    def chunk4():
        return msm5._chunk_run(scs4, sh, inf0, acc4, acc4)
    t("WHOLE chunk (B=4)", chunk4)


if __name__ == "__main__":
    main()
