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
    """Inclusive point-prefix scan along the element axis (log-depth
    Hillis-Steele ladder of complete additions, full width per step)."""
    n = p[0].shape[-1]
    idx = jax.lax.iota(jnp.int32, n)
    ident = ed.pt_identity((1,))
    v = p
    sh = 1
    while sh < n:
        shifted = tuple(
            jnp.concatenate([jnp.broadcast_to(i, (fd.L, sh)), c[:, :-sh]],
                            axis=1)
            for i, c in zip(ident, v))
        comb = ed.pt_add(v, shifted)
        keep = (idx >= sh)[None, :]
        v = tuple(jnp.where(keep, cc, cv) for cc, cv in zip(comb, v))
        sh *= 2
    return v


def _pt_tree_sum(p: tuple) -> tuple:
    """Pairwise-tree point sum over the element axis -> (22, 1) coords."""
    v = p
    n = v[0].shape[-1]
    while n > 1:
        if n % 2:
            ident = ed.pt_identity((1,))
            v = tuple(jnp.concatenate([c, jnp.broadcast_to(i, (fd.L, 1))],
                                      axis=1) for c, i in zip(v, ident))
            n += 1
        half = n // 2
        v = ed.pt_add(tuple(c[:, :half] for c in v),
                      tuple(c[:, half:] for c in v))
        n = half
    return v


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
        neg_sum = _pt_tree_sum(gathered)
        total = tuple(cc[:, -1:] for cc in pref)               # E_m
        # m * E_m = 2^c * E_m - E_m (c doublings instead of double-and-add)
        acc_t = total
        for _ in range(c):
            acc_t = ed.pt_add(acc_t, acc_t)
        return ed.pt_add(ed.pt_add(acc_t, ed.pt_neg(total)),
                         ed.pt_neg(neg_sum))

    def body(acc, dig):
        for _ in range(c):
            acc = ed.pt_add(acc, acc)
        acc = ed.pt_add(acc, window_sum(dig))
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
