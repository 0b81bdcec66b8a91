"""Device Pippenger MSM v7: v6 with SIGNED c=16 digits (host side).

Same global-sort / bitrev-tree / Fenwick-query pipeline as `ec/msm6.py`
(see its docstring), with digits recoded to d in [-2^15, 2^15]: the
bucket space halves, so the query vectors, qinit searchsorted and the
halving reduction all run at half width (kernel rationale and the
telescoping-exactness argument in `ec/msm7k.py`).  Shares the uint8
affine shifted basis, the level->top kernels, the coarse ladder and the
paired Fenwick dispatches with v6 unchanged.

Digit recoding (host jit, one dispatch): unsigned u_w from
`msm6._k_digits16`, then the standard carry chain
  t = u_w + carry;  d_w = t - 2^16*[t >= 2^15];  carry = [t >= 2^15]
(top window is safe: canonical scalars < r < 2^254 give u_15 < 2^14).
The sort key is key2 = (|d| << 1) | sign so the sign needs no gather.

Counterpart of arkworks `VariableBaseMSM::msm_unchecked`
(`/root/reference/pcs/src/kzg.rs:72`).  Exactness on hardware:
`scripts/check_msm7.py` (general basis + infinity + edge scalars + tau
CRS vs the host oracle).
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device8 as f8  # noqa: E402
from ..fields.bn254 import P  # noqa: E402
from . import msm as msm12  # noqa: E402
from . import msm6  # noqa: E402
from . import msm6k as k6  # noqa: E402
from . import msm7k as k7  # noqa: E402

L = f8.L
L2 = 2 * L
L3 = 3 * L
CHUNK = msm12.CHUNK
LOG2_CHUNK = msm12.LOG2_CHUNK

WBITS = k7.WBITS
W = k7.W
NBUCK7 = k7.NBUCK7

shifted_basis16 = msm6.shifted_basis16


# ---------------------------------------------------------------------------
# signed digit extraction
# ---------------------------------------------------------------------------


@jax.jit
def _k_digits16s(sc, inf):
    """(22, N) canonical limbs + (N,) inf -> (16, N) int32 key2 values
    (|d| << 1 | sign), window-major; infinity rows carry key2 = 0."""
    u = msm6._k_digits16(sc, inf)                     # (16, N) unsigned
    outs = []
    carry = jnp.zeros_like(u[0])
    for w in range(W):
        t = u[w] + carry
        neg = t >= (1 << (WBITS - 1))
        d = t - (neg.astype(jnp.int32) << WBITS)
        carry = neg.astype(jnp.int32)
        outs.append(d)
    d = jnp.stack(outs, axis=0)
    return (jnp.abs(d) << 1) | (d < 0).astype(jnp.int32)


@jax.jit
def _k_digits16s_all(sc_stack, inf_stack):
    """(nch, 22, CHUNK) + (nch, CHUNK) -> flat (nch*W*CHUNK,) key2."""
    d = jax.vmap(_k_digits16s)(sc_stack, inf_stack)   # (nch, W, CHUNK)
    return d.reshape(-1)


# ---------------------------------------------------------------------------
# sort + bitrev + gather (sign plane recovered from the sorted keys)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3))
def _k_sort_gather(keys2, base_flat, m: int, fl_real: int):
    """Like `msm6._k_sort_gather` plus the (1, 2^m) bf16 sign plane in
    bitrev-physical order (sorted_k2 & 1 -- no extra gather; the bitrev
    re-index is two small static gathers + a transpose)."""
    iota = jax.lax.iota(jnp.int32, keys2.shape[0])
    sorted_k2, perm = jax.lax.sort_key_val(keys2, iota)
    perm = jnp.minimum(perm, fl_real - 1)
    pphys = msm6._bitrev_perm(perm, m)
    sphys = msm6._bitrev_perm(sorted_k2 & 1, m).astype(
        jnp.bfloat16)[None, :]
    return (sorted_k2, perm, base_flat[:, pphys].astype(jnp.bfloat16),
            sphys)


def _up_sweep(leaves: jnp.ndarray, sphys: jnp.ndarray) -> list:
    """Signed level 0, then the unchanged v6 projective levels."""
    levels = [None]
    x = k7._lvl0s_call(leaves.shape[-1] // 2)(leaves, sphys)
    del leaves
    levels.append(x)
    while x.shape[-1] > k6._MIN_H and x.shape[-1] > 1:
        x = k6._lvl_call(x.shape[-1] // 2, False)(x)
        levels.append(x)
    return levels


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _finalize_host(s_col, t_col):
    """result = NBUCK7 * T - S (the signed telescoped combine)."""
    return msm6._finalize_host(s_col, t_col, mult=NBUCK7)


def _msm_one(base_flat: jnp.ndarray, scalar_chunks: list,
             inf_chunks: list):
    nch_real = len(scalar_chunks)
    nch = max(1, 1 << (nch_real - 1).bit_length())         # pad to pow2
    m = 4 + LOG2_CHUNK + (nch.bit_length() - 1)            # log2(W*N)
    fl_real = W * CHUNK * nch_real

    keys2 = _k_digits16s_all(jnp.stack(scalar_chunks, axis=0),
                             jnp.stack(inf_chunks, axis=0))
    if nch != nch_real:
        keys2 = jnp.concatenate(
            [keys2, jnp.zeros((nch - nch_real) * W * CHUNK, jnp.int32)])

    sorted_k2, perm, leaves, sphys = _k_sort_gather(keys2, base_flat, m,
                                                    fl_real)
    levels = _up_sweep(leaves, sphys)
    del leaves
    kmin = len(levels) - 1                                  # top level index
    top = levels[kmin]
    brev_idx = jnp.asarray(msm6._brev_half(m - kmin))
    coarse = k6._k_coarse(top.shape[-1])(top, brev_idx)
    acc, offset, cnt = k7._k_qinit7(kmin)(sorted_k2, coarse)
    k = kmin - 1
    while k >= 2:
        acc, offset = k6._k_qstep_pair(k, m - k)(acc, offset, cnt,
                                                 levels[k], levels[k - 1])
        k -= 2
    if k == 1:
        acc, offset = k6._k_qstep(1, m - 1)(acc, offset, cnt, levels[1])
    acc = k7._k_qstep0s(m)(acc, offset, cnt, perm, sorted_k2, base_flat)
    del levels
    # NBUCK7 query columns are already a power of two: no identity pad
    s_col = k6._reduce_cols(acc)
    return _finalize_host(s_col, coarse[:, -1:])


def msm_device(basis: msm12.DeviceBasis, scalar_chunks: list, length: int):
    """Canonical (22, CHUNK) limb scalar chunks -> host `curve.Jacobian`."""
    flat = shifted_basis16(basis, len(scalar_chunks))
    inf = [basis.inf_chunks[j] for j in range(len(scalar_chunks))]
    return _msm_one(flat, list(scalar_chunks), inf)


def msm_device_batch(basis: msm12.DeviceBasis, batch_chunks: list) -> list:
    """B independent MSMs over one CRS basis (same loop as v6)."""
    widest = max((len(c) for c in batch_chunks), default=1)
    flat = shifted_basis16(basis, max(1, widest))
    out = []
    zero = None
    for chunks in batch_chunks:
        if not chunks:
            if zero is None:
                zero = [jnp.zeros((22, CHUNK), jnp.int32)]
            chunks = zero
        inf = [basis.inf_chunks[j] for j in range(len(chunks))]
        out.append(_msm_one(flat, list(chunks), inf))
    return out


load_basis = msm12.load_basis
slice_basis = msm12.slice_basis
