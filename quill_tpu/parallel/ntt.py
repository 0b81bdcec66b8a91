"""Sharded 4-step NTT over one mesh-sharded (22, N) Montgomery array.

Closes the last ShardedEngine host round-trip (`parallel/engine.py
poly_mul`, VERDICT round-4 item 5): polynomial products now stay on the
mesh.  Counterpart of the single-chip chunked Bailey NTT (`poly/ntt.py`)
and of the reference's naive products it replaces
(`/root/reference/pcs/src/ipa.rs:147-148`).

Decomposition (N = n1 * n2, both multiples of the mesh size; j = j1*n2
+ j2, k = k1 + n1*k2):

  X[k1 + n1 k2] = DFT_{n2, j2->k2}[ w^{j2 k1} * DFT_{n1, j1->k1}[x] ]

- the array views as (22, n1, n2) with n1 carrying the element sharding
  (high index bits, same convention as every SVec);
- TRANSPOSE (22, n1@x, n2) -> (22, n2@x, n1): the one collective
  (GSPMD all-to-all) per transform step -- local DFTs then run on the
  UNSHARDED axis, identically on every shard;
- local DFTs are radix-2 DIF (natural in, bit-reversed out) rolled as a
  `fori_loop` with dynamic `jnp.roll` partners and ONE mont_mul site
  (the unrolled form costs a multi-second XLA:CPU compile per shape --
  the round-4 dryrun regression; see `engine._jit_ladder`);
- the step-2 twiddle table T[j2, pos] = w^{j2 * brev_n1(pos)} is
  host-built once per (n1, n2) and cached (device-put sharded);
- the inverse runs the mirrored DIT chain (bit-reversed in, natural
  out) with inverse twiddles and one final 1/N scale.

The forward output lives in the fixed [brev(k1)][brev(k2)] permutation;
`poly_mul` only composes NTT -> pointwise -> exact inverse, for which
any fixed permutation cancels.  All arithmetic is the exact 12-bit lazy
Montgomery core: sharded products equal the host engine's bit-for-bit.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..fields.bn254 import FR_ROOT_OF_UNITY, FR_TWO_ADICITY, R
from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device as fd  # noqa: E402
from ..fields.limbs import ints_to_limbs  # noqa: E402

L = fd.L
SPEC = fd.FR
_R_MONT = (1 << fd.R_BITS) % R


def _root_of_unity(log2_n: int) -> int:
    assert log2_n <= FR_TWO_ADICITY
    return pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - log2_n), R)


def _brev(x: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


@lru_cache(maxsize=16)
def _flat_twiddles(log2m: int, inverse: bool) -> np.ndarray:
    """(log2m, 22, m) Montgomery twiddles, FULL length per stage: position
    j carries w_s^{j mod bh} in its block's b-half and 1 elsewhere, so the
    rolled stage body needs no per-stage reshapes."""
    m = 1 << log2m
    if log2m == 0:
        # length-1 transform: no stages (the ndev=1 mesh's n1=1 split)
        return np.zeros((0, L, 1), np.int32)
    w = _root_of_unity(log2m)
    if inverse:
        w = pow(w, R - 2, R)
    out = []
    for s in range(log2m):
        block = m >> s
        bh = block // 2
        ws = pow(w, 1 << s, R)
        pw = [1] * bh
        for j in range(1, bh):
            pw[j] = pw[j - 1] * ws % R
        row = [1] * m
        for j in range(m):
            if (j % block) >= bh:
                row[j] = pw[j % bh]
        out.append(ints_to_limbs([t * _R_MONT % R for t in row]))
    return np.stack(out, axis=0)  # (log2m, 22, m)


@lru_cache(maxsize=16)
def _step_table(log2_n1: int, log2_n2: int, inverse: bool) -> np.ndarray:
    """(22, n2, n1) Montgomery step-2 twiddles T[j2, pos] =
    w_N^{+-j2 * brev_n1(pos)} (pos = the bit-reversed k1 slot the local
    DIF leaves its outputs in).  Host-built once per size and cached;
    ~N python modmuls (instant at dryrun scale, ~30 s at 2^24 -- the
    sharded engine's perf path is the mesh program, not this one-time
    table)."""
    n1, n2 = 1 << log2_n1, 1 << log2_n2
    w = _root_of_unity(log2_n1 + log2_n2)
    if inverse:
        w = pow(w, R - 2, R)
    base = [pow(w, _brev(p, log2_n1), R) for p in range(n1)]
    rows = []
    cur = [1] * n1
    for _ in range(n2):
        rows.append(list(cur))
        cur = [c * b % R for c, b in zip(cur, base)]
    flat = [v * _R_MONT % R for row in rows for v in row]
    return ints_to_limbs(flat).reshape(L, n2, n1)


def _local_dif(x: jnp.ndarray, log2m: int, tw: jnp.ndarray) -> jnp.ndarray:
    """Radix-2 DIF over the LAST (unsharded) axis of (..., m): natural
    order in, bit-reversed out.  One rolled stage body (dynamic roll +
    bit select); tw = _flat_twiddles(log2m, ...) as a runtime arg."""
    if log2m == 0:
        return x
    m = x.shape[-1]
    idx = jax.lax.iota(jnp.int32, m)

    def stage(s, v):
        bh = m >> (s + 1)                      # half-block, traced
        hi = ((idx // jnp.maximum(bh, 1)) & 1) == 1   # b-half positions
        partner_fwd = jnp.roll(v, -bh, axis=-1)       # v[j + bh] at j
        partner_bwd = jnp.roll(v, bh, axis=-1)        # v[j - bh] at j
        t_s = jax.lax.dynamic_index_in_dim(tw, s, axis=0, keepdims=False)
        t_s = jnp.broadcast_to(t_s.reshape((L,) + (1,) * (v.ndim - 2)
                                           + (m,)), v.shape)
        a_out = fd.add(v, partner_fwd, SPEC)          # at a-positions
        b_out = fd.mont_mul(fd.sub(partner_bwd, v, SPEC), t_s, SPEC)
        return jnp.where(hi, b_out, a_out)

    return jax.lax.fori_loop(0, log2m, stage, x)


def _local_dit_inv(x: jnp.ndarray, log2m: int,
                   tw_inv: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of `_local_dif` up to the 1/m factor (folded into the
    caller's single 1/N scale): bit-reversed in, natural out."""
    if log2m == 0:
        return x
    m = x.shape[-1]
    idx = jax.lax.iota(jnp.int32, m)

    def stage(i, v):
        s = log2m - 1 - i                     # run DIF stages in reverse
        bh = m >> (s + 1)
        hi = ((idx // jnp.maximum(bh, 1)) & 1) == 1
        t_s = jax.lax.dynamic_index_in_dim(tw_inv, s, axis=0,
                                           keepdims=False)
        t_s = jnp.broadcast_to(t_s.reshape((L,) + (1,) * (v.ndim - 2)
                                           + (m,)), v.shape)
        tv = fd.mont_mul(v, t_s, SPEC)        # meaningful at b-positions
        a_out = fd.add(v, jnp.roll(tv, -bh, axis=-1), SPEC)
        b_out = fd.sub(jnp.roll(v, bh, axis=-1), tv, SPEC)
        return jnp.where(hi, b_out, a_out)

    return jax.lax.fori_loop(0, log2m, stage, x)
