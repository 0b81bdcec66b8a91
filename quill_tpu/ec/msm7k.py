"""msm7 device-kernel bodies: the SIGNED-digit variant of the v6 MSM.

v7 = v6 (global c=16 sort, bitrev tree, Fenwick queries -- `ec/msm6.py`
docstring) with signed digits d in [-2^15, 2^15]: the bucket space halves
(NBUCK7 = 2^15 vs 2^16), so the Fenwick query phase, qinit searchsorted
and the final halving reduction all run on half-width vectors -- the
round-4 profile put the query+reduce phases at ~160 ms of the 0.84 s
2^20 MSM (VERDICT round-4 item 4, "signed-digit windows halve the
Fenwick query count").

Design keys:
- The sign rides the SORT KEY: key2 = (|d| << 1) | sign.  Sorting by
  key2 groups by |d| (sign is the LSB tiebreak), the per-element sign is
  recovered ON DEVICE as `sorted_k2 & 1`, and NO extra gather is needed
  (the round-4 measurements cap any extra 2^24-column gather at ~300 ms,
  which would have eaten the entire win).
- Level 0 applies the sign: y' = select(sign, -y, y) before the 9-mul
  affine add (negation is one lazy_sub, no extra muls).  Levels >= 1,
  the coarse ladder, the paired Fenwick steps and the reduction reuse
  the msm6k kernels UNCHANGED (they are shape-generic; the half-width
  query vectors just produce new AOT signatures of the same kernels).
- The leaf-level Fenwick step gathers the sign with the same 32k-wide
  index used for the leaf itself (`sorted_k2[p] & 1`).

Exactness of the telescoped combine with signed digits: with m' = 2^15
and P[e_b] the signed-leaf prefix at the last sorted index with
|d| <= b, result = m'*T - sum_{b<m'} P[e_b]; an element with digit d
appears in T once and in the (m' - |d|) prefixes b >= |d|, so its
coefficient is m' - (m' - |d|) = |d| applied to sign(d) * P = d * P.
Elements with d = 0 get coefficient 0 (padding / infinity invisible),
and d = -2^15 (|d| = m') appears in no prefix, coefficient m' exactly.

Counterpart of arkworks `VariableBaseMSM::msm_unchecked`
(`/root/reference/pcs/src/kzg.rs:72`).
"""

from __future__ import annotations

import functools

from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ..fields import device8 as f8  # noqa: E402
from ..fields import pallas8 as p8  # noqa: E402
from ..utils.aotcache import aot_wrap  # noqa: E402
from . import msm5  # noqa: E402
from . import msm6k as k6  # noqa: E402

EC7_KDEPS = k6.EC_KDEPS + ('ec/msm7k.py',)

L = f8.L
L2 = 2 * L
L3 = 3 * L

WBITS = 16
W = 16
NBUCK7 = 1 << (WBITS - 1)          # signed bucket count 2^15

_BLK = k6._BLK


def _neg_sel(y, s, spec):
    """select(s, -y, y) in the lazy domain: one lazy_sub from zero (the
    f8.sub body), no multiplications."""
    yneg = f8.sub(jnp.zeros_like(y), y, spec)
    return jnp.where(s.astype(bool), yneg, y)


# ---------------------------------------------------------------------------
# signed level-0 kernel: leaves + sign plane -> projective level 1
# ---------------------------------------------------------------------------


def _lvl0s_kernel(modulus, c_ref, sa_ref, sb_ref, a_ref, b_ref, o_ref):
    """Affine leaf pairs with signs: (2L, blk) bf16 x2 + (1, blk) bf16
    sign planes -> (3L, blk) bf16 normal projective sums."""
    spec = p8.unpack_spec(modulus, c_ref[:])
    n = a_ref.shape[-1]
    s2 = (n // 128, 128)
    av = a_ref[:].astype(jnp.float32).reshape((L2,) + s2)
    bv = b_ref[:].astype(jnp.float32).reshape((L2,) + s2)
    sa = sa_ref[:].astype(jnp.float32).reshape((1,) + s2)
    sb = sb_ref[:].astype(jnp.float32).reshape((1,) + s2)
    ay = _neg_sel(av[L:], sa, spec)
    by = _neg_sel(bv[L:], sb, spec)
    out = msm5.emit_pt_add_aff((av[:L], ay), (bv[:L], by), spec)
    o = jnp.concatenate([f8.normal_form(v) for v in out], axis=0)
    o_ref[:] = o.reshape(L3, n).astype(jnp.bfloat16)


@functools.lru_cache(maxsize=None)
def _lvl0s_call(h: int):
    """Signed level 0: (leaves (2L, 2h) bf16, signs (1, 2h) bf16) ->
    (3L, h) bf16, pairing column c with c + h (same block-contiguous
    double-pass trick as `msm6k._lvl_call`)."""
    blk = min(_BLK, h)
    grid = (h // blk,)
    pack = p8.consts_pack(f8.FQ8.modulus)
    nblk = h // blk
    lo = pl.BlockSpec((L2, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((L2, blk), lambda i: (0, i + nblk),
                      memory_space=pltpu.VMEM)
    slo = pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    shi = pl.BlockSpec((1, blk), lambda i: (0, i + nblk),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L3, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def run(x, s):
        return pl.pallas_call(
            functools.partial(_lvl0s_kernel, f8.FQ8.modulus),
            out_shape=jax.ShapeDtypeStruct((L3, h), jnp.bfloat16),
            grid=grid,
            in_specs=[pl.BlockSpec((p8._PACK_ROWS, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      slo, shi, lo, hi],
            out_specs=out_spec,
            interpret=p8._interpret(),
        )(pack, s, s, x, x)

    return aot_wrap(f"msm7.lvl0s.{h}", run, deps=EC7_KDEPS)


# ---------------------------------------------------------------------------
# signed qinit + leaf-level Fenwick step
# ---------------------------------------------------------------------------


def _qinit7_fn(sorted_k2, coarse, kmin: int):
    """Per-bucket counts over |d| (key2 = |d|<<1 | sign: elements with
    |d| <= b are exactly those with key2 <= 2b+1) + the coarse part of
    every prefix.  nq = NBUCK7 half of v6's."""
    nq = NBUCK7
    buckets = jax.lax.iota(jnp.int32, nq)
    cnt = jnp.searchsorted(sorted_k2, 2 * buckets + 1,
                           side="right").astype(jnp.int32)
    q = cnt >> kmin
    acc = jnp.where((q > 0)[None, :],
                    coarse[:, jnp.maximum(q - 1, 0)], k6._ident_cols(nq))
    offset = q << kmin
    return acc, offset, cnt


@functools.lru_cache(maxsize=None)
def _k_qinit7(kmin: int):
    fn = functools.partial(_qinit7_fn, kmin=kmin)
    return aot_wrap(f"msm7.qinit{kmin}", fn, deps=EC7_KDEPS)


def _qstep0s_fn(acc, offset, cnt, perm, sorted_k2, base_flat, m: int):
    """The k=0 Fenwick level without the leaf array, SIGNED: leaf at
    sorted position p is sign(p) * base_flat[:, perm[p]] with
    sign(p) = sorted_k2[p] & 1 (z = 1 appended)."""
    has = (cnt & 1) == 1
    p = jnp.minimum(offset, (1 << m) - 1)
    node = base_flat[:, perm[p]].astype(acc.dtype)
    s = (sorted_k2[p] & 1)[None, :]
    if base_flat.shape[0] == L2:       # affine coords (skipped by the
        y = _neg_sel(node[L:], s, f8.FQ8)  # integer-mock structure tests)
        one = f8.FQ8.one_mont
        ones = jnp.stack([jnp.full(node.shape[1:], float(one[i]), acc.dtype)
                          for i in range(L)], axis=0)
        node = jnp.concatenate([node[:L], y, ones], axis=0)
    else:
        node = jnp.where(s.astype(bool), -node, node)
    return jnp.where(has[None, :], k6._xadd(acc, node), acc)


@functools.lru_cache(maxsize=None)
def _k_qstep0s(m: int):
    fn = functools.partial(_qstep0s_fn, m=m)
    return aot_wrap(f"msm7.qstep0.{m}", fn, deps=EC7_KDEPS)
