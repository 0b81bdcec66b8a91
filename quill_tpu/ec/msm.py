"""Device Pippenger multi-scalar multiplication (the headline kernel).

Counterpart of arkworks `VariableBaseMSM::msm_unchecked`
(`/root/reference/pcs/src/kzg.rs:72`), redesigned for TPU (SURVEY §2.4, §7):

- scalars are decomposed into W = ceil(254/c) unsigned c-bit windows on
  device (limb bit surgery, all windows at once);
- per 2^16-element chunk, points are *sorted by bucket index* (XLA sort,
  batched over all windows) and bucket sums are produced by a segmented
  inclusive scan whose combine is the branchless complete point addition.
  Two interchangeable scan strategies (QUILL_MSM_SCAN): the default
  work-efficient two-level lax.scan (~2N additions), and a Hillis-Steele
  variant (N log N additions but log N fixed-shape host dispatches -- the
  only option on backends where scan-with-point-body compiles poorly);
- each window's 2^c bucket array is collected by a batched searchsorted +
  gather (no data-dependent scatter) and accumulated across chunks with one
  vectorized point addition;
- bucket reduction is the classic triangle sum (suffix scan over buckets
  plus one full reduction), batched over all windows;
- the W window results are combined on the host (c doublings per window --
  O(254) trivial host work).

Multi-chip: chunks are partitioned across devices; each device produces
partial window sums and the tiny per-device partials are combined on the
host (point addition is not a psum-able XLA reduction).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fields.bn254 import P
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

import os

WINDOW_BITS = int(os.environ.get("QUILL_MSM_WINDOW_BITS", "13"))
NUM_WINDOWS = (254 + WINDOW_BITS - 1) // WINDOW_BITS  # 20 at c=13
NUM_BUCKETS = 1 << WINDOW_BITS


@dataclass
class DeviceBasis:
    """CRS points resident on device: per-chunk (22, CHUNK) Montgomery Fq
    coordinate arrays + infinity masks, alongside the host affine list for
    the small/fallback path (may be lazily materialized)."""

    affines: list
    x_chunks: list
    y_chunks: list
    inf_chunks: list
    length: int


_to_mont_fq = None
_from_mont_fq = None


def _get_to_mont_fq():
    global _to_mont_fq
    if _to_mont_fq is None:
        _to_mont_fq = jax.jit(lambda x: fd.to_mont(x, fd.FQ))
    return _to_mont_fq


def _get_from_mont_fq():
    """Module-cached (a fresh per-call `jax.jit(lambda ...)` defeats the
    compile cache -- new function identity every call)."""
    global _from_mont_fq
    if _from_mont_fq is None:
        _from_mont_fq = jax.jit(lambda x: fd.from_mont(x, fd.FQ))
    return _from_mont_fq


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
    out = DeviceBasis(affines=basis.affines[:n] if basis.affines else [],
                      x_chunks=basis.x_chunks[:nch],
                      y_chunks=basis.y_chunks[:nch],
                      inf_chunks=basis.inf_chunks[:nch],
                      length=n)
    # slices share the root so per-chunk derived caches (e.g. the 8-bit
    # coordinate repack in ec/msm8.py) convert each CRS chunk once per
    # proof run, not once per commit
    out._root = getattr(basis, "_root", basis)
    return out


# ---------------------------------------------------------------------------
# kernels (each compiled once; host drives the log-step loops)
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


@jax.jit
def _k_sort_gather(scalars, x, y, inf):
    """digits -> sort -> gather; returns (sorted_digits (W,N),
    points (3 x (22,W,N)) with dead lanes forced to the identity)."""
    digits = _extract_digits(scalars)
    iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape, 1)
    sorted_d, perm = jax.lax.sort_key_val(digits, iota, dimension=1)
    gx = x[:, perm]
    gy = y[:, perm]
    ginf = inf[perm]
    pts = ed.affine_to_projective(gx, gy, None)
    dead = ginf | (sorted_d == 0)
    pts = ed.pt_select(dead, ed.pt_identity(dead.shape), pts)
    return sorted_d, pts[0], pts[1], pts[2]


@jax.jit
def _k_seg_scan_step(px, py, pz, seg, shift):
    """One Hillis-Steele segmented-scan step along the last axis:
    v[i] += v[i - shift] where seg[i] == seg[i - shift] and i >= shift.
    `seg` must be sorted so equal ids are contiguous.  Pass a constant `seg`
    to get an *unsegmented* scan."""
    n = seg.shape[-1]
    v = (px, py, pz)
    rolled = tuple(jnp.roll(c, shift, axis=-1) for c in v)
    seg_rolled = jnp.roll(seg, shift, axis=-1)
    idx = jax.lax.broadcasted_iota(jnp.int32, seg.shape, seg.ndim - 1)
    ok = (idx >= shift) & (seg == seg_rolled)
    combined = ed.pt_add(v, rolled)
    out = ed.pt_select(ok, combined, v)
    return out


@jax.jit
def _k_bucket_gather_acc(sorted_d, px, py, pz, acc_x, acc_y, acc_z):
    """Collect per-segment totals into dense (22, W, NUM_BUCKETS) bucket
    arrays by *gathering*: with sorted digits, bucket d's total sits at the
    last occurrence of d, found with a batched searchsorted -- gathers lower
    far better than scatters on TPU."""
    queries = jax.lax.broadcasted_iota(jnp.int32, (NUM_WINDOWS, NUM_BUCKETS),
                                       1)
    # position of last element <= d: searchsorted right - 1
    pos = jax.vmap(lambda row, q: jnp.searchsorted(row, q, side="right"))(
        sorted_d, queries) - 1                     # (W, NB), may be -1
    pos_c = jnp.maximum(pos, 0)
    widx = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 0)
    # gather along the flattened (W*N) axis
    flat_pos = (widx * CHUNK + pos_c).reshape(-1)

    def gather_coord(c):
        flat = c.reshape(L, -1)
        return flat[:, flat_pos].reshape(L, NUM_WINDOWS, NUM_BUCKETS)

    gathered = tuple(gather_coord(c) for c in (px, py, pz))
    # valid iff the element at pos actually has digit d and pos >= 0
    d_at_pos = sorted_d.reshape(-1)[flat_pos].reshape(NUM_WINDOWS, NUM_BUCKETS)
    valid = (pos >= 0) & (d_at_pos == queries)
    ident = ed.pt_identity((NUM_WINDOWS, NUM_BUCKETS))
    new_buckets = ed.pt_select(valid, gathered, ident)
    return ed.pt_add((acc_x, acc_y, acc_z), new_buckets)


@jax.jit
def _k_reverse_buckets(acc_x, acc_y, acc_z):
    return acc_x[:, :, ::-1], acc_y[:, :, ::-1], acc_z[:, :, ::-1]


@jax.jit
def _k_take_last(px, py, pz):
    return px[:, :, -1], py[:, :, -1], pz[:, :, -1]


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _hs_scan(pts, seg, n: int):
    """Full segmented inclusive scan: log2(n) step-kernel dispatches.  The
    shift is passed as a device scalar so every step reuses one compiled
    kernel."""
    shift = 1
    while shift < n:
        pts = _k_seg_scan_step(*pts, seg, jnp.int32(shift))
        shift *= 2
    return pts


# -- work-efficient segmented scan (two-level lax.scan) ----------------------
#
# The Hillis-Steele variant above does N log N point additions; this one does
# ~2N: a sequential lax.scan within 256-element blocks (vectorized over
# blocks and windows), a block-offset scan, and one combine.  lax.scan with a
# point-addition body compiles fine on the TPU backend (the CPU backend
# chokes, hence both variants behind QUILL_MSM_SCAN).


def _seg_combine(a, b):
    (v1, f1) = a
    (v2, f2) = b
    s = ed.pt_add(v1, v2)
    v = ed.pt_select(f2, v2, s)
    return v, (f1 | f2)


@jax.jit
def _k_seg_scan_blocks(px, py, pz, flags):
    """Stage 1 of the work-efficient segmented scan: within-block (256)
    sequential scans, vectorized over blocks and windows.  Returns the
    within-block inclusive scans, their flag-prefix, and per-block exclusive
    offsets (computed by a second tiny scan over block totals)."""
    X, Y, Z = px, py, pz
    W = X.shape[1]
    N = X.shape[2]
    bs = 256
    nb = N // bs

    def resh(a):
        return jnp.moveaxis(a.reshape(L, W, nb, bs), 3, 0)

    xs = ((resh(X), resh(Y), resh(Z)),
          jnp.moveaxis(flags.reshape(W, nb, bs), 2, 0))

    ident = ed.pt_identity((W, nb))
    f0 = jnp.zeros((W, nb), dtype=bool)

    def body(carry, x_t):
        cur = _seg_combine(carry, x_t)
        return cur, cur

    (last_pt, last_f), (ys_pt, ys_f) = jax.lax.scan(body, (ident, f0), xs)
    within = tuple(jnp.moveaxis(a, 0, 3).reshape(L, W, N) for a in ys_pt)
    within_f = jnp.moveaxis(ys_f, 0, 2).reshape(W, N)

    tot_xs = (tuple(jnp.moveaxis(a[:, :, :, None], 2, 0)
                    for a in last_pt),
              jnp.moveaxis(last_f[:, :, None], 1, 0))

    ident1 = ed.pt_identity((W, 1))
    f01 = jnp.zeros((W, 1), dtype=bool)

    def body2(carry, t):
        return _seg_combine(carry, t), carry

    _, (off_pt, off_f) = jax.lax.scan(body2, (ident1, f01), tot_xs)
    offs = tuple(jnp.moveaxis(a, 0, 2).reshape(L, W, nb) for a in off_pt)
    offs_f = jnp.moveaxis(off_f, 0, 1).reshape(W, nb)
    return within, within_f, offs, offs_f


@jax.jit
def _k_seg_scan_combine(wx, wy, wz, wf, ox, oy, oz, of_):
    """Stage 2: broadcast-combine block offsets into the within-block scans
    (separate kernel to halve peak HBM)."""
    W = wx.shape[1]
    N = wx.shape[2]
    nb = ox.shape[2]
    bs = N // nb
    offs = tuple(jnp.broadcast_to(a[:, :, :, None], (L, W, nb, bs)).reshape(
        L, W, N) for a in (ox, oy, oz))
    offs_f = jnp.broadcast_to(of_[:, :, None], (W, nb, bs)).reshape(W, N)
    out, _ = _seg_combine((offs, offs_f), ((wx, wy, wz), wf))
    return out


def _k_seg_scan_2level(px, py, pz, flags):
    within, within_f, offs, offs_f = _k_seg_scan_blocks(px, py, pz, flags)
    return _k_seg_scan_combine(*within, within_f, *offs, offs_f)


def _seg_scan(pts, seg, n: int):
    """Dispatch between scan strategies (env QUILL_MSM_SCAN: 'scan'
    (default, work-efficient) or 'hs')."""
    import os

    if os.environ.get("QUILL_MSM_SCAN", "scan") == "hs":
        return _hs_scan(pts, seg, n)
    prev = jnp.concatenate(
        [jnp.full(seg.shape[:-1] + (1,), -1, jnp.int32), seg[..., :-1]],
        axis=-1)
    flags = seg != prev
    return _k_seg_scan_2level(*pts, flags)


_ZERO_SEG_CACHE: dict = {}


def _zero_seg(shape):
    if shape not in _ZERO_SEG_CACHE:
        _ZERO_SEG_CACHE[shape] = jnp.zeros(shape, dtype=jnp.int32)
    return _ZERO_SEG_CACHE[shape]


def msm_device(basis: DeviceBasis, scalar_chunks: list, length: int):
    """scalar_chunks: canonical (non-Montgomery) limb chunks (22, CHUNK).
    Returns a host `ec.curve.Jacobian`."""
    from ..fields.limbs import limbs_to_ints
    from ..fields.scalar import inv as sinv
    from . import curve

    acc = ed.pt_identity((NUM_WINDOWS, NUM_BUCKETS))
    for j, sc in enumerate(scalar_chunks):
        sorted_d, px, py, pz = _k_sort_gather(
            sc, basis.x_chunks[j], basis.y_chunks[j], basis.inf_chunks[j])
        pts = _seg_scan((px, py, pz), sorted_d, CHUNK)
        acc = _k_bucket_gather_acc(sorted_d, *pts, *acc)

    # triangle reduction: suffix scan over buckets (reverse + plain scan),
    # then sum suffix_k for k >= 1 == (total of all suffixes) - suffix_0;
    # suffix_0 is the sum of ALL buckets incl. bucket 0 -- but bucket 0 was
    # already forced to the identity per chunk (dead lanes), so
    # sum_{k>=1} suffix_k = total_sum_of_suffixes - suffix_0.
    rev = _k_reverse_buckets(*acc)
    suf_rev = _hs_scan(rev, _zero_seg((NUM_WINDOWS, NUM_BUCKETS)), NUM_BUCKETS)
    # suf_rev[..., i] = sum of buckets >= (NUM_BUCKETS-1-i); full prefix scan
    # of the reversed array.  suffix_k corresponds to suf_rev[..., NB-1-k].
    # Reduce all suffix_k for k >= 1: scan the suffix array again.
    # Simpler: total = sum_k suffix_k for k in 1..NB-1; compute by another
    # plain scan over suf (excluding k=0) and take the last element.
    suf = _k_reverse_buckets(*suf_rev)           # suf[..., k] = suffix_k
    tail = tuple(c[:, :, 1:] for c in suf)       # k >= 1, length NB-1
    red = _hs_scan(tail, _zero_seg((NUM_WINDOWS, NUM_BUCKETS - 1)),
                   NUM_BUCKETS - 1)
    wx, wy, wz = _k_take_last(*red)

    # host combine: W points, c doublings between windows
    fm = _get_from_mont_fq()
    X = limbs_to_ints(np.asarray(fm(wx)))
    Y = limbs_to_ints(np.asarray(fm(wy)))
    Z = limbs_to_ints(np.asarray(fm(wz)))

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
