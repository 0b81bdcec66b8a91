"""Device Pippenger multi-scalar multiplication (the headline kernel).

Counterpart of arkworks `VariableBaseMSM::msm_unchecked`
(`/root/reference/pcs/src/kzg.rs:72`), redesigned for TPU (SURVEY §2.4, §7):

- scalars are decomposed into W = ceil(254/c) unsigned c-bit windows on
  device (limb bit surgery, all windows at once);
- per 2^16-element chunk and per window, points are *sorted by bucket index*
  (XLA sort, batched over windows) and bucket sums are produced by a
  batched two-level segmented scan whose combine is the branchless complete
  point addition -- no data-dependent scatter in the hot loop (one small
  dense scatter writes each window's 2^c bucket array);
- chunk bucket arrays are accumulated with one vectorized point addition per
  chunk (fixed shapes: every kernel compiles once);
- bucket reduction is the classic triangle sum, computed as a suffix
  point-scan plus a full reduction, batched over all windows;
- the W window results are combined on the host (c doublings per window --
  O(254) trivial host work).

Multi-chip: chunks are partitioned across devices; each device produces
partial window sums and the host (or an all_gather) combines W points per
device -- point addition is not a `psum`-able monoid XLA knows, so the
partial-sum combine rides the same tiny host path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

from ..fields.bn254 import P, R
from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device as fd  # noqa: E402
from . import device as ed  # noqa: E402

L = fd.L
B = fd.B

LOG2_CHUNK = 16
CHUNK = 1 << LOG2_CHUNK

WINDOW_BITS = 13
NUM_WINDOWS = (254 + WINDOW_BITS - 1) // WINDOW_BITS  # 20
NUM_BUCKETS = 1 << WINDOW_BITS


@dataclass
class DeviceBasis:
    """CRS points resident on device: per-chunk (22, CHUNK) Montgomery Fq
    coordinate arrays + infinity masks, alongside the host affine list for
    the small/fallback path."""

    affines: list
    x_chunks: list
    y_chunks: list
    inf_chunks: list
    length: int


_to_mont_fq = None


def _get_to_mont_fq():
    global _to_mont_fq
    if _to_mont_fq is None:
        _to_mont_fq = jax.jit(lambda x: fd.to_mont(x, fd.FQ))
    return _to_mont_fq


def load_basis(affines: list) -> DeviceBasis:
    from .device import host_affine_to_device

    n = len(affines)
    x_l, y_l, inf = host_affine_to_device(affines)
    pad = (-n) % CHUNK
    if pad:
        x_l = np.pad(x_l, ((0, 0), (0, pad)))
        y_l = np.pad(y_l, ((0, 0), (0, pad)))
        inf = np.pad(inf, (0, pad), constant_values=True)
    xc, yc, ic = [], [], []
    tm = _get_to_mont_fq()
    for j in range((n + pad) // CHUNK):
        sl = slice(j * CHUNK, (j + 1) * CHUNK)
        xc.append(tm(jnp.asarray(x_l[:, sl])))
        yc.append(tm(jnp.asarray(y_l[:, sl])))
        ic.append(jnp.asarray(inf[sl]))
    return DeviceBasis(affines=list(affines), x_chunks=xc, y_chunks=yc,
                       inf_chunks=ic, length=n)


def slice_basis(basis: DeviceBasis, n: int) -> DeviceBasis:
    nch = (n + CHUNK - 1) // CHUNK
    return DeviceBasis(affines=basis.affines[:n],
                       x_chunks=basis.x_chunks[:nch],
                       y_chunks=basis.y_chunks[:nch],
                       inf_chunks=basis.inf_chunks[:nch],
                       length=n)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _extract_digits(scalars):
    """Canonical limb scalars (22, N) -> (W, N) int32 window digits."""
    outs = []
    for w in range(NUM_WINDOWS):
        lo_bit = w * WINDOW_BITS
        limb = lo_bit // B
        sh = lo_bit % B
        d = scalars[limb] >> sh
        have = B - sh
        while have < WINDOW_BITS and limb + 1 < L:
            limb += 1
            d = d | (scalars[limb] << have)
            have += B
        outs.append(d & (NUM_BUCKETS - 1))
    return jnp.stack(outs, axis=0)


def _seg_combine(a, b):
    """Segmented-scan monoid over (point, flag): flag marks 'segment boundary
    seen'; values right of a boundary ignore the left operand."""
    (v1, f1) = a
    (v2, f2) = b
    s = ed.pt_add(v1, v2)
    v = ed.pt_select(f2, v2, s)
    return v, (f1 | f2)


def _two_level_scan_tree(xs_point, xs_flag):
    """Batched inclusive segmented scan along the last axis of point coords
    shaped (22, W, N).  Two-level: sequential lax.scan within 256-element
    blocks (vectorized over blocks), then block-offset scan, then combine."""
    X, Y, Z = xs_point
    W = X.shape[1]
    N = X.shape[2]
    bs = 256
    nb = N // bs

    def resh(a):
        return jnp.moveaxis(a.reshape(L, W, nb, bs), 3, 0)  # (bs, 22, W, nb)

    xs = ((resh(X), resh(Y), resh(Z)),
          jnp.moveaxis(xs_flag.reshape(W, nb, bs), 2, 0))   # flag (bs, W, nb)

    ident = ed.pt_identity((W, nb))
    f0 = jnp.zeros((W, nb), dtype=bool)

    def body(carry, x_t):
        cur = _seg_combine(carry, x_t)
        return cur, cur

    (last_pt, last_f), (ys_pt, ys_f) = jax.lax.scan(body, (ident, f0), xs)
    within = tuple(jnp.moveaxis(a, 0, 3).reshape(L, W, N) for a in ys_pt)
    within_f = jnp.moveaxis(ys_f, 0, 2).reshape(W, N)

    # exclusive block offsets
    tot_xs = (tuple(jnp.moveaxis(a[:, :, :, None], 2, 0) for a in
                    (last_pt[0], last_pt[1], last_pt[2])),
              jnp.moveaxis(last_f[:, :, None], 1, 0))

    ident1 = ed.pt_identity((W, 1))
    f01 = jnp.zeros((W, 1), dtype=bool)

    def body2(carry, t):
        return _seg_combine(carry, t), carry

    _, (off_pt, off_f) = jax.lax.scan(body2, (ident1, f01), tot_xs)
    offs = tuple(jnp.broadcast_to(
        jnp.moveaxis(a, 0, 2).reshape(L, W, nb, 1), (L, W, nb, bs)).reshape(
            L, W, N) for a in off_pt)
    offs_f = jnp.broadcast_to(
        jnp.moveaxis(off_f, 0, 1).reshape(W, nb, 1), (W, nb, bs)).reshape(W, N)

    out, _ = _seg_combine((offs, offs_f), (within, within_f))
    return out


@jax.jit
def _k_msm_chunk(scalars, x, y, inf, acc_x, acc_y, acc_z):
    """One chunk of the MSM: digits -> sort -> gather -> segmented scan ->
    bucket scatter -> accumulate into the running bucket arrays
    (22, W, NUM_BUCKETS)."""
    digits = _extract_digits(scalars)                      # (W, N)
    iota = jax.lax.broadcasted_iota(jnp.int32, (NUM_WINDOWS, CHUNK), 1)
    sorted_d, perm = jax.lax.sort_key_val(digits, iota, dimension=1)

    # gather points into sorted order, per window: (22, W, N)
    gx = x[:, perm]
    gy = y[:, perm]
    ginf = inf[perm]                                       # (W, N)

    pts = ed.affine_to_projective(gx, gy, None)
    # force digit-0 and infinity points to the identity so they vanish
    dead = ginf | (sorted_d == 0)
    pts = ed.pt_select(dead, ed.pt_identity(dead.shape), pts)

    # segment starts where the digit changes
    prev = jnp.concatenate([jnp.full((NUM_WINDOWS, 1), -1, jnp.int32),
                            sorted_d[:, :-1]], axis=1)
    flags = sorted_d != prev

    scanned = _two_level_scan_tree(pts, flags)

    # segment ends: last position of each digit -> scatter into buckets
    nxt = jnp.concatenate([sorted_d[:, 1:],
                           jnp.full((NUM_WINDOWS, 1), -1, jnp.int32)], axis=1)
    boundary = sorted_d != nxt
    idx = jnp.where(boundary, sorted_d, NUM_BUCKETS)       # OOB sentinel
    widx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    flat_idx = (widx * NUM_BUCKETS + idx).reshape(-1)
    oob = (idx == NUM_BUCKETS).reshape(-1)
    flat_idx = jnp.where(oob, NUM_WINDOWS * NUM_BUCKETS, flat_idx)

    ident = ed.pt_identity((NUM_WINDOWS * NUM_BUCKETS,))
    new_buckets = []
    for coord, iv in zip(scanned, ident):
        flat = coord.reshape(L, -1)
        nb = iv.at[:, flat_idx].set(flat, mode="drop")
        new_buckets.append(nb.reshape(L, NUM_WINDOWS, NUM_BUCKETS))

    acc = (acc_x, acc_y, acc_z)
    new_acc = ed.pt_add(acc, tuple(new_buckets))
    return new_acc


@jax.jit
def _k_bucket_reduce(acc_x, acc_y, acc_z):
    """Triangle bucket reduction, batched over windows:
    window_w = sum_b b * S_{w,b} = sum_{k>=1} suffix_{w,k}.
    Returns (22, W) coordinate arrays of the per-window results."""
    acc = (acc_x, acc_y, acc_z)
    # suffix inclusive point scan along the bucket axis (reverse + scan)
    rev = tuple(a[:, :, ::-1] for a in acc)
    flags = jnp.zeros((NUM_WINDOWS, NUM_BUCKETS), dtype=bool)
    suf = _two_level_scan_tree(rev, flags)
    suf = tuple(a[:, :, ::-1] for a in suf)
    # drop suffix_0 (bucket 0 is the zero digit): sum suffix[1:]
    tail = tuple(a[:, :, 1:] for a in suf)
    # reduce along bucket axis with a two-level scan; take the last element
    flags2 = jnp.zeros((NUM_WINDOWS, NUM_BUCKETS - 1), dtype=bool)
    # pad to a power-of-two-friendly length for the blocked scan
    pad = (-(NUM_BUCKETS - 1)) % 256
    ident_pad = ed.pt_identity((NUM_WINDOWS, pad))
    tail = tuple(jnp.concatenate([a, b], axis=2)
                 for a, b in zip(tail, ident_pad))
    flags2 = jnp.concatenate(
        [flags2, jnp.zeros((NUM_WINDOWS, pad), dtype=bool)], axis=1)
    red = _two_level_scan_tree(tail, flags2)
    return tuple(a[:, :, -1] for a in red)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def msm_device(basis: DeviceBasis, scalar_chunks: list, length: int):
    """scalar_chunks: canonical (non-Montgomery) limb chunks (22, CHUNK).
    Returns a host `ec.curve.Jacobian`."""
    from ..fields.limbs import limbs_to_ints
    from . import curve

    acc = ed.pt_identity((NUM_WINDOWS, NUM_BUCKETS))
    for j, sc in enumerate(scalar_chunks):
        acc = _k_msm_chunk(sc, basis.x_chunks[j], basis.y_chunks[j],
                           basis.inf_chunks[j], *acc)
    wx, wy, wz = _k_bucket_reduce(*acc)

    # host combine: W points, c doublings between windows
    fm = jax.jit(lambda a: fd.from_mont(a, fd.FQ))
    X = limbs_to_ints(np.asarray(fm(wx)))
    Y = limbs_to_ints(np.asarray(fm(wy)))
    Z = limbs_to_ints(np.asarray(fm(wz)))
    from ..fields.scalar import inv as sinv

    windows = []
    for xx, yy, zz in zip(X, Y, Z):
        if zz == 0:
            windows.append(curve.Jacobian.identity(curve.Fq(1)))
        else:
            zi = sinv(zz, P)
            windows.append(curve.Jacobian(curve.Fq(xx * zi % P),
                                          curve.Fq(yy * zi % P), curve.Fq(1)))
    result = curve.Jacobian.identity(curve.Fq(1))
    for w in range(NUM_WINDOWS - 1, -1, -1):
        for _ in range(WINDOW_BITS):
            result = result.double()
        result = result.add(windows[w])
    return result
