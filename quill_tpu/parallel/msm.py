"""Distributed MSM: point partitioning over a device mesh.

Multi-chip counterpart of the single `msm_unchecked` call at
`/root/reference/pcs/src/kzg.rs:72` (SURVEY §2.4 "MSM point partitioning"):
points and scalars are sharded over the mesh element axis; every device runs
a REAL windowed Pippenger over its local points (digit sort -> inclusive
point-prefix scan -> telescoped bucket-end combine -- the same prefix-sum
formulation as the production `ec/msm3.py` pipeline, expressed in portable
XLA over the 12-bit limb representation so it runs identically on a CPU
mesh, a TPU slice, or inside `shard_map` on real ICI); the per-device
partial results (one projective point each) are combined on the host --
point addition is not an XLA reduction, and the combine is ndev-small by
design.

Telescoped bucket combine (`ec/msm3.py` docstring, same identity): with
E_b = sum of all local points whose digit is <= b (a prefix of the
digit-sorted order) and m = 2^c - 1,

    sum_{b=1}^{m} b * B_b  =  m * E_m  -  sum_{b=0}^{m-1} E_b

so empty buckets and zero digits cancel automatically and no segmented
(per-bucket) reduction is needed -- only gathers of prefix values.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as PSpec  # noqa: E402

from ..ec import device as ed  # noqa: E402
from ..fields import device as fd  # noqa: E402

LIMB_BITS = 12
SCALAR_BITS = 254


@functools.lru_cache(maxsize=1)
def _jit_pt_add():
    """Trace-once complete addition: `ed.pt_add` emits ~40 field-op call
    eqns per use, and this module's programs use it at ~35 sites -- raw
    inlining put the XLA CPU compile of the sharded Pippenger at ~5 min
    per process.  A jit wrapper turns every same-shape use into one call
    eqn (identical compiled code)."""
    return jax.jit(ed.pt_add)


def _pt_add(p1: tuple, p2: tuple) -> tuple:
    return _jit_pt_add()(p1, p2)


def pick_window_bits(n_local: int) -> int:
    """arkworks-style window sizing (ln(n) + 2), clamped to [4, 13]."""
    c = int(np.log(max(n_local, 2)) + 2)
    return max(4, min(13, c))


def _digits(scalars: jnp.ndarray, c: int) -> list:
    """Canonical (22, n) 12-bit limb scalars -> per-window c-bit digits
    ((n,) int32 each).  Windows may span up to three limbs (c <= 14)."""
    num_windows = (SCALAR_BITS + c - 1) // c
    mask = (1 << c) - 1
    out = []
    for w in range(num_windows):
        s = w * c
        k0, off = divmod(s, LIMB_BITS)
        d = scalars[k0] >> off
        got = LIMB_BITS - off
        for extra in (1, 2):
            if got < c and k0 + extra < scalars.shape[0]:
                d = d | (scalars[k0 + extra] << got)
                got += LIMB_BITS
        out.append(d & mask)
    return out


def _pt_prefix_scan(p: tuple) -> tuple:
    """Inclusive point-prefix scan along the element axis.

    Rolled Hillis-Steele ladder: a `fori_loop` whose body rolls the array
    by the (dynamic) step shift and masks the wrapped head to the identity
    point -- ONE traced point-add body.  The unrolled ladder put the XLA
    CPU compile of the sharded Pippenger at ~5 minutes per process (the
    optimizer inlines every add body)."""
    n = p[0].shape[-1]
    idx = jax.lax.iota(jnp.int32, n)[None, :]
    ident = tuple(jnp.broadcast_to(i, (fd.L, n))
                  for i in ed.pt_identity((1,)))
    steps = max(1, (n - 1).bit_length())

    def ladder(t, v):
        sh = 1 << t
        shifted = tuple(
            jnp.where(idx < sh, i, jnp.roll(c, sh, axis=1))
            for i, c in zip(ident, v))
        comb = _pt_add(v, shifted)
        keep = idx >= sh
        return tuple(jnp.where(keep, cc, cv)
                     for cc, cv in zip(comb, v))

    return jax.lax.fori_loop(0, steps, ladder, p)


def _pt_col_sum(p: tuple) -> tuple:
    """Point sum over the element axis -> (22, 1) coords, as a rolled scan
    over columns (widths here are <= 2^c buckets; sequential adds inside
    one compiled program are cheap, unrolled trees are not)."""
    cols = jnp.stack([jnp.moveaxis(c, -1, 0) for c in p], axis=1)
    # cols: (n, 3, 22) -> scan over n.  The identity carry is derived from
    # the (device-varying) operands so its vma type matches under
    # shard_map (same trick as local_pippenger's initial accumulator).
    zero1 = p[0][:, :1] * 0
    ident = (zero1, zero1 + jnp.asarray(fd.FQ.one_mont, jnp.int32)[:, None],
             zero1)

    def step(acc, col):
        return _pt_add(acc, (col[0][:, None], col[1][:, None],
                             col[2][:, None])), 0

    acc, _ = jax.lax.scan(step, ident, cols)
    return acc


def local_pippenger(scalars: jnp.ndarray, bx: jnp.ndarray, by: jnp.ndarray,
                    inf: jnp.ndarray, c: int) -> tuple:
    """Windowed Pippenger over one shard's points: (22, n) canonical Fr
    limbs, (22, n) Montgomery Fq affine coords, (n,) bool infinity flags.
    Returns one (22, 1) projective point triple.

    The window loop is a `lax.scan` (top window first, Horner combine in
    the carry) so the traced graph holds ONE window body, not W copies."""
    m = (1 << c) - 1
    pts = ed.affine_to_projective(bx, by, inf)
    digs = jnp.stack(_digits(scalars, c), axis=0)          # (W, n)
    iota = jax.lax.iota(jnp.int32, bx.shape[-1])
    ident1 = ed.pt_identity((1,))

    def window_sum(dig):
        sorted_d, perm = jax.lax.sort_key_val(dig, iota)
        sorted_pts = tuple(cc[:, perm] for cc in pts)
        pref = _pt_prefix_scan(sorted_pts)
        # E_b for b = 0..m-1: prefix value at the last index with digit <= b
        pos = jnp.searchsorted(sorted_d, jnp.arange(m, dtype=jnp.int32),
                               side="right") - 1
        ok = pos >= 0
        pos_c = jnp.maximum(pos, 0)
        gathered = tuple(cc[:, pos_c] for cc in pref)
        gathered = tuple(
            jnp.where(ok[None, :], cc, jnp.broadcast_to(i, cc.shape))
            for cc, i in zip(gathered, ident1))
        neg_sum = _pt_col_sum(gathered)
        total = tuple(cc[:, -1:] for cc in pref)               # E_m
        # m * E_m = 2^c * E_m - E_m (c doublings instead of double-and-add)
        acc_t = jax.lax.fori_loop(0, c, lambda _, a: _pt_add(a, a), total)
        return _pt_add(_pt_add(acc_t, ed.pt_neg(total)),
                       ed.pt_neg(neg_sum))

    def body(acc, dig):
        acc = jax.lax.fori_loop(0, c, lambda _, a: _pt_add(a, a), acc)
        acc = _pt_add(acc, window_sum(dig))
        return acc, jnp.zeros((), jnp.int32)

    # the initial carry must be device-varying under shard_map (vma typing):
    # derive the identity point from the sharded operands
    zero1 = bx[:, :1] * 0
    ident_v = (zero1, zero1 + jnp.asarray(fd.FQ.one_mont,
                                          jnp.int32)[:, None], zero1)
    acc, _ = jax.lax.scan(body, ident_v, digs[::-1])
    return acc


@functools.lru_cache(maxsize=None)
def _sharded_msm_fn(mesh, c: int):
    def per_shard(sc, bx, by, inf):
        px, py, pz = local_pippenger(sc, bx, by, inf, c)
        return px[None], py[None], pz[None]             # (1, 22, 1)

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(PSpec(None, "x"),) * 3 + (PSpec("x"),),
        out_specs=(PSpec("x", None, None),) * 3)
    return jax.jit(fn)


def sharded_msm_partials(mesh, scalars, bx, by, inf=None,
                         window_bits: int | None = None):
    """Partitioned MSM partial sums: inputs sharded over the mesh element
    axis; each device runs `local_pippenger`; returns (ndev, 22, 1)
    projective coordinate arrays for the ndev-small host combine.

    scalars: (22, N) canonical Fr limbs; bx/by: (22, N) Montgomery affine
    Fq coords; inf: (N,) bool (default all-finite)."""
    n = scalars.shape[-1]
    ndev = mesh.devices.size
    if inf is None:
        inf = jnp.zeros((n,), bool)
    if window_bits is None:
        window_bits = pick_window_bits(max(n // ndev, 1))
    return _sharded_msm_fn(mesh, window_bits)(scalars, bx, by, inf)


def combine_partials_host(px, py, pz):
    """Host combine of the (ndev, 22, 1) per-device partials."""
    from ..ec import curve
    from ..ec.device import device_point_to_host

    pxs, pys, pzs = (np.asarray(a) for a in (px, py, pz))
    total = curve.Jacobian.identity(curve.Fq(1))
    for d in range(pxs.shape[0]):
        total = total.add(device_point_to_host(
            (jnp.asarray(pxs[d]), jnp.asarray(pys[d]), jnp.asarray(pzs[d]))))
    return total


def sharded_msm(mesh, scalars, bx, by, inf=None,
                window_bits: int | None = None):
    """Full distributed MSM: partition -> local Pippenger -> host combine.
    Returns a host `ec.curve.Jacobian`."""
    px, py, pz = sharded_msm_partials(mesh, scalars, bx, by, inf,
                                      window_bits)
    return combine_partials_host(px, py, pz)
