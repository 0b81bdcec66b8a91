"""msm6 device-kernel bodies (the AOT-export-relevant half of MSM v6).

Split out of `ec/msm6.py` so that the AOT export cache keys ONLY on
lowering-relevant sources: every `aot_wrap` of the v6 family lives here and
lists THIS file (not `ec/msm6.py`) in its deps, so edits to the host-side
driver/basis/disk-cache glue in `ec/msm6.py` no longer orphan the ~20-min
MSM export family (the round-4 00:50 incident).  See the module docstring
of `ec/msm6.py` for the algorithm; kernels here implement:

- the up-sweep tree levels (`_lvl_call`): level 0 the 9-mul affine add,
  higher levels the 12-mul complete projective add, bf16 at rest;
- the coarse sorted-order prefix ladder over the top level (`_k_coarse`);
- the Fenwick bucket-prefix query chain (`_k_qinit`, `_k_qstep*`);
- the two-dispatch halving reduction (`_reduce_cols`).

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

EC_KDEPS = ('ec/device.py', 'ec/fixed_base.py', 'ec/msm.py', 'ec/msm5.py',
            'ec/msm6k.py', 'ec/msm8.py', 'fields', 'utils/jaxcfg.py')

L = f8.L
L2 = 2 * L
L3 = 3 * L

WBITS = 16
W = 16
NBUCK = 1 << WBITS

_BLK = 1024      # lanes per level-kernel grid step
_MIN_H = 1024    # smallest Pallas level; coarser nodes go to the ladder


# ---------------------------------------------------------------------------
# up-sweep level kernels (bf16 at rest, block-contiguous halves)
# ---------------------------------------------------------------------------


def _lvl0_kernel(modulus, c_ref, a_ref, b_ref, o_ref):
    """Affine leaf pairs: (2L, blk) bf16 x2 -> (3L, blk) bf16 normal."""
    spec = p8.unpack_spec(modulus, c_ref[:])
    n = a_ref.shape[-1]
    s2 = (n // 128, 128)
    av = a_ref[:].astype(jnp.float32).reshape((L2,) + s2)
    bv = b_ref[:].astype(jnp.float32).reshape((L2,) + s2)
    out = msm5.emit_pt_add_aff((av[:L], av[L:]), (bv[:L], bv[L:]), spec)
    o = jnp.concatenate([f8.normal_form(v) for v in out], axis=0)
    o_ref[:] = o.reshape(L3, n).astype(jnp.bfloat16)


def _lvl_kernel(modulus, c_ref, a_ref, b_ref, o_ref):
    """Projective pairs: (3L, blk) bf16 x2 -> (3L, blk) bf16 normal."""
    spec = p8.unpack_spec(modulus, c_ref[:])
    n = a_ref.shape[-1]
    s2 = (n // 128, 128)
    av = a_ref[:].astype(jnp.float32).reshape((L3,) + s2)
    bv = b_ref[:].astype(jnp.float32).reshape((L3,) + s2)
    out = p8.emit_pt_add((av[:L], av[L:L2], av[L2:]),
                         (bv[:L], bv[L:L2], bv[L2:]), spec)
    o = jnp.concatenate([f8.normal_form(v) for v in out], axis=0)
    o_ref[:] = o.reshape(L3, n).astype(jnp.bfloat16)


@functools.lru_cache(maxsize=None)
def _lvl_call(h: int, affine: bool):
    """One tree level: in (rows_in, 2h) bf16 -> out (3L, h) bf16, pairing
    column c with column c + h (the bitrev layout's adjacent sorted pair).
    The input array is passed TWICE with index maps selecting the low and
    high halves, so reads stay block-contiguous."""
    rows_in = L2 if affine else L3
    blk = min(_BLK, h)
    grid = (h // blk,)
    kern = _lvl0_kernel if affine else _lvl_kernel
    pack = p8.consts_pack(f8.FQ8.modulus)
    lo_spec = pl.BlockSpec((rows_in, blk), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    nblk = h // blk
    hi_spec = pl.BlockSpec((rows_in, blk), lambda i: (0, i + nblk),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L3, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def run(x):
        return pl.pallas_call(
            functools.partial(kern, f8.FQ8.modulus),
            out_shape=jax.ShapeDtypeStruct((L3, h), jnp.bfloat16),
            grid=grid,
            in_specs=[pl.BlockSpec((p8._PACK_ROWS, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      lo_spec, hi_spec],
            out_specs=out_spec,
            interpret=p8._interpret(),
        )(pack, x, x)

    return aot_wrap(f"msm6.lvl{'0' if affine else ''}.{h}", run,
                    deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# coarse prefix ladder + Fenwick queries
# ---------------------------------------------------------------------------


def _ident_cols(n: int) -> jnp.ndarray:
    one = f8.FQ8.one_mont
    z = jnp.zeros((L, n), jnp.float32)
    o = jnp.stack([jnp.full((n,), float(one[i]), jnp.float32)
                   for i in range(L)], axis=0)
    return jnp.concatenate([z, o, z], axis=0)


def _xadd(a, b):
    out = p8.emit_pt_add((a[:L], a[L:L2], a[L2:]),
                         (b[:L], b[L:L2], b[L2:]), f8.FQ8)
    return jnp.concatenate(out, axis=0)


def _coarse_prefix_fn(top_bf16, brev_idx):
    """Sorted-order inclusive point prefix over the top level's nodes:
    re-order the bitrev-physical nodes to sorted order (static-size
    gather on a small array), then a Hillis-Steele ladder."""
    v = top_bf16[:, brev_idx].astype(jnp.float32)
    n = v.shape[-1]
    idx = jax.lax.iota(jnp.int32, n)
    ident = _ident_cols(n)
    sh = 1
    while sh < n:
        shifted = jnp.concatenate([ident[:, :sh], v[:, :-sh]], axis=1)
        comb = _xadd(v, shifted)
        v = jnp.where((idx >= sh)[None, :], comb, v)
        sh *= 2
    return v


@functools.lru_cache(maxsize=None)
def _k_coarse(n: int):
    return aot_wrap(f"msm6.coarse{n}", _coarse_prefix_fn, deps=EC_KDEPS)


def _brev_bits(x: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Vectorized bit reversal of `bits`-wide ints."""
    out = jnp.zeros_like(x)
    for k in range(bits):
        out = out | (((x >> k) & 1) << (bits - 1 - k))
    return out


# The Fenwick evaluation runs as ONE DISPATCH PER LEVEL with a carried
# (acc, offset) state: a single fused program would inline kmin (~14)
# point-add bodies, the exact shape that OOM-killed the remote compile
# helper in round 3 (BASELINE.md v5 counter-finding c).  One add site per
# program keeps every module small; the ~15 dispatches pipeline.


def _qinit_fn(sorted_k, coarse, kmin: int):
    """Per-bucket counts + the coarse part of every prefix.
    Returns (acc (3L, NBUCK-1) f32, offset (NBUCK-1,) i32, cnt)."""
    nq = NBUCK - 1
    buckets = jax.lax.iota(jnp.int32, nq)
    cnt = jnp.searchsorted(sorted_k, buckets, side="right").astype(jnp.int32)
    q = cnt >> kmin
    acc = jnp.where((q > 0)[None, :],
                    coarse[:, jnp.maximum(q - 1, 0)], _ident_cols(nq))
    offset = q << kmin
    return acc, offset, cnt


@functools.lru_cache(maxsize=None)
def _k_qinit(kmin: int):
    fn = functools.partial(_qinit_fn, kmin=kmin)
    return aot_wrap(f"msm6.qinit{kmin}", fn, deps=EC_KDEPS)


def _qstep_fn(acc, offset, cnt, level, k: int, mk: int):
    """One Fenwick level: if bit k of the count remains, add the level-k
    node starting at the running offset.  level is bf16, bitrev-physical;
    the k=0 level is the AFFINE leaf array (z=1 appended here)."""
    has = ((cnt >> k) & 1) == 1
    s = offset >> k                        # sorted-order node index
    c = _brev_bits(s, mk)                  # physical column
    # cast to the accumulator dtype (f32 in production; keeps the integer
    # mock algebra of tests/test_msm6_structure.py exact)
    node = level[:, jnp.minimum(c, (1 << mk) - 1)].astype(acc.dtype)
    if level.shape[0] == L2:
        one = f8.FQ8.one_mont
        ones = jnp.stack([jnp.full(node.shape[1:], float(one[i]),
                                   acc.dtype) for i in range(L)], axis=0)
        node = jnp.concatenate([node, ones], axis=0)
    acc = jnp.where(has[None, :], _xadd(acc, node), acc)
    offset = offset + (has.astype(jnp.int32) << k)
    return acc, offset


@functools.lru_cache(maxsize=None)
def _k_qstep(k: int, mk: int):
    fn = functools.partial(_qstep_fn, k=k, mk=mk)
    return aot_wrap(f"msm6.qstep{k}.{mk}", fn, deps=EC_KDEPS)


def _qstep0_fn(acc, offset, cnt, perm, base_flat, m: int):
    """The k=0 Fenwick level WITHOUT the leaf array: the leaf at sorted
    position p is base_flat[:, perm[p]] (affine; z = 1 appended)."""
    has = (cnt & 1) == 1
    p = jnp.minimum(offset, (1 << m) - 1)
    node = base_flat[:, perm[p]].astype(acc.dtype)
    if base_flat.shape[0] == L2:       # affine coords (skipped by the
        one = f8.FQ8.one_mont          # integer-mock structure tests)
        ones = jnp.stack([jnp.full(node.shape[1:], float(one[i]), acc.dtype)
                          for i in range(L)], axis=0)
        node = jnp.concatenate([node, ones], axis=0)
    return jnp.where(has[None, :], _xadd(acc, node), acc)


@functools.lru_cache(maxsize=None)
def _k_qstep0(m: int):
    fn = functools.partial(_qstep0_fn, m=m)
    return aot_wrap(f"msm6.qstep0.{m}", fn, deps=EC_KDEPS)


def _qstep_pair_fn(acc, offset, cnt, lev_hi, lev_lo, k: int, mk: int):
    """Two consecutive Fenwick levels (k, k-1) per dispatch: the 15-step
    chain was dispatch-overhead-bound (~13 ms/step standalone)."""
    acc, offset = _qstep_fn(acc, offset, cnt, lev_hi, k, mk)
    return _qstep_fn(acc, offset, cnt, lev_lo, k - 1, mk + 1)


@functools.lru_cache(maxsize=None)
def _k_qstep_pair(k: int, mk: int):
    fn = functools.partial(_qstep_pair_fn, k=k, mk=mk)
    return aot_wrap(f"msm6.qpair{k}.{mk}", fn, deps=EC_KDEPS)


# halving reduction in TWO dispatches: 3 wide halving sites (covering 7/8
# of the adds) + a 13-site tail on <= 8192 columns (the 16-dispatch chain
# measured 81 ms, almost all per-dispatch overhead)
def _reduce_wide_fn(acc):
    for _ in range(3):
        h = acc.shape[-1] // 2
        acc = _xadd(acc[:, :h], acc[:, h:])
    return acc


_k_reduce_wide = aot_wrap("msm6.redwide", _reduce_wide_fn, deps=EC_KDEPS)


def _reduce_tail_fn(acc):
    while acc.shape[-1] > 1:
        h = acc.shape[-1] // 2
        acc = _xadd(acc[:, :h], acc[:, h:])
    return acc


_k_reduce_tail = aot_wrap("msm6.redtail", _reduce_tail_fn, deps=EC_KDEPS)


def _reduce_cols(acc: jnp.ndarray) -> jnp.ndarray:
    """(3L, n) f32 -> (3L, 1), n a power of two."""
    while acc.shape[-1] > 8192:
        acc = _k_reduce_wide(acc)
    return _k_reduce_tail(acc)
