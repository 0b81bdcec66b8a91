"""Batched KZG quotient computation: all quotients of an `open_many` batch
in one fused device pass per chunk.

Counterpart of the per-opening polynomial division at
`/root/reference/pcs/src/kzg.rs:75-96` (synthetic division by (X - x)),
batched across B openings.  The single-opening path
(`engine/device.py:quotient_by_linear`) pays, per chunk, a prefix-scan
dispatch + a HOST readback of the chunk total (a full device->host sync)
before the combine kernel can run; with ~4 openings per MLPCS proof and
tens of proofs per HyperPlonk trace those syncs dominate the open phase.

Here the B openings are stacked on a middle axis ((22, B, CHUNK) limb
blocks -- the fd ops treat axis 0 as limbs and broadcast the rest) and the
cross-chunk state (prefix offset, x^(j*CHUNK), x^{-(j*CHUNK)}) is carried
BETWEEN chunk dispatches as device arrays, so the whole batch costs
2 * nch fused dispatches and exactly ONE host readback (the y values,
needed for the proof objects anyway).

    q_k = (y - P_k) * x^{-(k+1)}   with   P_k = sum_{t<=k} c_t x^t

Outputs are bit-identical to sequential `quotient_by_linear` calls: the
same prefix-scan/combine formulas evaluated in the same field arithmetic.
"""

from __future__ import annotations

import numpy as np

from ..fields.bn254 import R
from ..fields.scalar import inv
from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device as fd  # noqa: E402
from ..fields.limbs import ints_to_limbs  # noqa: E402

SPEC = fd.FR
L = fd.L

QT_KDEPS = ('engine/quotient.py', 'fields', 'utils/jaxcfg.py')


def _mont_cols(xs: list[int]) -> np.ndarray:
    """Canonical ints -> (22, B, 1) Montgomery limb constants."""
    r_mont = (1 << fd.R_BITS) % R
    return ints_to_limbs([int(x) % R * r_mont % R for x in xs])[:, :, None]


def _prefix3(x, combine, ident_col):
    """Inclusive prefix scan along the LAST axis of (22, B, C)."""
    c = x.shape[-1]
    idx = jax.lax.iota(jnp.int32, c)
    ident = jnp.broadcast_to(ident_col, x.shape).astype(x.dtype)
    v = x
    sh = 1
    while sh < c:
        shifted = jnp.concatenate([ident[..., :sh], v[..., :-sh]], axis=-1)
        comb = combine(v, shifted)
        v = jnp.where((idx >= sh)[None, None, :], comb, v)
        sh *= 2
    return v


def _powtable_fn(pow_stack):
    """pow_stack: (log2C, 22, B, 1) with [k] = x^(2^k) mont -> (22, B, C)
    tables of x^j for j in [0, C)."""
    log2c = pow_stack.shape[0]
    size = 1 << log2c
    nb = pow_stack.shape[2]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    acc = jnp.broadcast_to(jnp.asarray(SPEC.one_mont, jnp.int32)[:, None,
                                                                 None],
                           (L, nb, size)).astype(jnp.int32)
    for k in range(log2c):
        mult = fd.mont_mul(acc, jnp.broadcast_to(pow_stack[k], acc.shape),
                           SPEC)
        acc = jnp.where((((idx >> k) & 1)).astype(bool), mult, acc)
    return acc


def _pass1_fn(chunk, powx_base, pow_carry, off_carry):
    """One chunk of pass 1: w = c * x^j; inclusive prefix scan; returns
    (offset-inclusive scan, new off_carry).

    chunk: (22, B, C) Montgomery coeff limbs; powx_base: (22, B, C) table
    of x^j for j in [0, C); pow_carry: (22, B, 1) = x^(chunk_index * C);
    off_carry: (22, B, 1) running prefix total P_{before this chunk}."""
    powx = fd.mont_mul(powx_base, jnp.broadcast_to(pow_carry, powx_base.shape),
                       SPEC)
    w = fd.mont_mul(chunk, powx, SPEC)
    zero = jnp.zeros((L, 1, 1), jnp.int32)
    scan = _prefix3(w, lambda a, b: fd.add(a, b, SPEC), zero)
    p_incl = fd.add(scan, jnp.broadcast_to(off_carry, scan.shape), SPEC)
    new_off = p_incl[..., -1:]
    return p_incl, new_off


def _pass2_fn(p_incl, powxi_base, powi_carry, y_col, xinv_col):
    """One chunk of pass 2: q = (y - P_j) * xinv^j * xinv^(chunk*C) * xinv."""
    powxi = fd.mont_mul(powxi_base,
                        jnp.broadcast_to(powi_carry, powxi_base.shape), SPEC)
    diff = fd.sub(jnp.broadcast_to(y_col, p_incl.shape), p_incl, SPEC)
    q = fd.mont_mul(diff, powxi, SPEC)
    return fd.mont_mul(q, jnp.broadcast_to(xinv_col, q.shape), SPEC)


def _carry_mul_fn(carry, step):
    return fd.mont_mul(carry, step, SPEC)


_K_CACHE: dict = {}


def _kern(name, fn):
    if name not in _K_CACHE:
        from ..utils.aotcache import aot_wrap

        _K_CACHE[name] = aot_wrap(f"quot.{name}", fn, deps=QT_KDEPS)
    return _K_CACHE[name]


def quotient_many_device(engine, jobs: list) -> list:
    """jobs: [(DVec poly, x int)] with identical chunk counts and x != 0.
    Returns [(y int, DVec q)] bit-identical to per-job
    `engine.quotient_by_linear`."""
    from .device import CHUNK, LOG2_CHUNK, DVec, _lazy_to_int

    nb = len(jobs)
    nch = len(jobs[0][0].chunks)
    xs = [int(x) % R for _, x in jobs]
    xinvs = [inv(x, R) for x in xs]

    # host-side scalar prep (tiny): squaring ladders + chunk-step powers
    def stack_pows(vals):
        cols = []
        cur = list(vals)
        for _ in range(LOG2_CHUNK):
            cols.append(_mont_cols(cur))
            cur = [v * v % R for v in cur]
        return jnp.asarray(np.stack(cols, axis=0))

    powx_base = _kern("powtable", _powtable_fn)(stack_pows(xs))
    powxi_base = _kern("powtable", _powtable_fn)(stack_pows(xinvs))
    xc = jnp.asarray(_mont_cols([pow(x, CHUNK, R) for x in xs]))
    xic = jnp.asarray(_mont_cols([pow(xi, CHUNK, R) for xi in xinvs]))
    xinv_col = jnp.asarray(_mont_cols(xinvs))
    one_carry = jnp.asarray(_mont_cols([1] * nb))

    stack_k = _kern("stack", lambda *cs: jnp.stack(cs, axis=1))
    p1 = _kern("pass1", _pass1_fn)
    p2 = _kern("pass2", _pass2_fn)
    cmul = _kern("carrymul", _carry_mul_fn)

    # pass 1: stacked prefix scans with device-carried offsets
    scans = []
    pow_carry = one_carry
    off_carry = jnp.zeros((L, nb, 1), jnp.int32)
    for j in range(nch):
        cj = stack_k(*[poly.chunks[j] for poly, _ in jobs])
        p_incl, off_carry = p1(cj, powx_base, pow_carry, off_carry)
        if j + 1 < nch:
            pow_carry = cmul(pow_carry, xc)
        scans.append(p_incl)

    # y values: one host readback for the whole batch
    y_lazy = np.asarray(off_carry, dtype=np.int64)[:, :, 0]  # (22, B)
    ys = [_lazy_to_int(y_lazy[:, b]) for b in range(nb)]
    y_col = jnp.asarray(_mont_cols(ys))

    # pass 2: combine into quotient chunks.  scans[j] is consumed (set to
    # None) as its quotient lands: the stacked scans are B x poly-size of
    # HBM (5.8 GB at B=4, 2^24 coeffs) and holding them across the whole
    # pass doubled peak memory at config-5 scale.
    out_chunks: list[list] = [[] for _ in range(nb)]
    powi_carry = one_carry
    for j in range(nch):
        q = p2(scans[j], powxi_base, powi_carry, y_col, xinv_col)
        scans[j] = None
        if j + 1 < nch:
            powi_carry = cmul(powi_carry, xic)
        for b in range(nb):
            out_chunks[b].append(q[:, b, :])

    return [(ys[b], DVec(chunks=out_chunks[b], length=jobs[b][0].length))
            for b in range(nb)]
