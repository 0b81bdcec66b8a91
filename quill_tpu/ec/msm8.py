"""Device Pippenger MSM over the 8-bit Pallas field kernels (v2 of ec/msm.py).

Same algorithm family as `ec/msm.py` (counterpart of arkworks
`VariableBaseMSM::msm_unchecked`, `/root/reference/pcs/src/kzg.rs:72`):
digit decomposition, sort by bucket, segmented-scan bucket sums, gather,
triangle reduction.  Redesigned around measured chunk profiles
(scripts/profile_msm*.py, scripts/exp_scan*.py):

- point coordinates travel as ONE stacked (3*33, N) f32 lazy-limb array:
  every extra Pallas input/output stream measured ~+50 ms/chunk in
  per-grid-step DMA scheduling, and bf16-at-rest was abandoned (its
  (16,128)-tile relayouts on every cast cost 6.7x the saved bandwidth --
  all these kernels are compute-bound);
- all point additions run inside fused Pallas kernels (fields/pallas8.py,
  ~66 M complete additions/s vs ~3 M for the fused-XLA 12-bit path);
- the segmented bucket scan is ONE pallas_call per chunk with the running
  state in scratch VMEM across a (lane_tile, step_chunk) grid; per-step
  kernel launches (a lax.scan-of-kernels variant) measured ~1 ms each;
- the scan's full-width "combine" pass is fused into bucket collection:
  bucket totals are gathered straight from the within-block scans plus
  shifted block-scan offsets, combining only (W, NUM_BUCKETS) elements
  instead of (W, N) (550 ms/chunk in the old path);
- the triangle reduction reuses the same scan kernel.

The external API mirrors ec/msm.py and accepts its `DeviceBasis` (12-bit
chunks are repacked lazily, cached on the basis object).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device as fd  # noqa: E402
from ..fields import device8 as f8  # noqa: E402
from ..fields import pallas8 as p8  # noqa: E402
from ..fields.bn254 import P  # noqa: E402
from ..utils.aotcache import aot_wrap  # noqa: E402
from . import msm as msm12  # noqa: E402

EC_KDEPS = ('ec/device.py', 'ec/fixed_base.py', 'ec/msm.py', 'ec/msm3.py',
            'ec/msm8.py', 'fields', 'utils/jaxcfg.py')

L = f8.L
L3 = 3 * L
LOG2_CHUNK = msm12.LOG2_CHUNK
CHUNK = msm12.CHUNK
WINDOW_BITS = msm12.WINDOW_BITS
NUM_WINDOWS = msm12.NUM_WINDOWS
NUM_BUCKETS = msm12.NUM_BUCKETS

BS = 256                       # scan steps per block
NB = CHUNK // BS               # blocks per window
LT = NUM_WINDOWS * NB          # scan lanes per chunk

WPAD = 128                     # window-lane padding for the tiny scans


# ---------------------------------------------------------------------------
# basis conversion (12-bit Montgomery chunks -> stacked f32, cached)
# ---------------------------------------------------------------------------


def _k_to_f8_pair(x12, y12):
    """Two (22, N) int32 lazy Montgomery Fq coords -> (66, N) f32 stacked."""
    xc = f8.from12(fd.lazy_to_canonical(x12, fd.FQ))
    yc = f8.from12(fd.lazy_to_canonical(y12, fd.FQ))
    return jnp.concatenate([xc, yc], axis=0)


def basis8(basis: msm12.DeviceBasis):
    """Stacked (66, CHUNK) f32 [x; y] chunks, converted lazily per chunk.

    The cache lives on the ROOT basis (slices carry `_root`, ec/msm.py
    slice_basis), so repeated commits/opens against prefixes of one CRS
    convert each chunk exactly once."""
    root = getattr(basis, "_root", basis)
    cache = getattr(root, "_b8_chunks", None)
    if cache is None:
        cache = {}
        root._b8_chunks = cache
    nch = len(basis.x_chunks)
    # Huge CRSes (2^24 cells = 2.95 GB of 12-bit chunks + 4.2 GB of the
    # 8-bit repack) can't keep both resident: QUILL_BASIS8_DROP12=1 frees
    # each 12-bit chunk once its 8-bit form exists.  Only safe when every
    # MSM impl in the process uses the 8-bit basis (the > QUILL_MSM_SHIFT_MAX
    # routing guarantees that at these scales).
    drop12 = os.environ.get("QUILL_BASIS8_DROP12") == "1"
    out = []
    for j in range(nch):
        if j not in cache:
            cache[j] = _k_to_f8_pair(basis.x_chunks[j], basis.y_chunks[j])
            if drop12:
                root.x_chunks[j] = None
                root.y_chunks[j] = None
                if basis is not root:  # slice lists hold their own refs
                    basis.x_chunks[j] = None
                    basis.y_chunks[j] = None
        out.append(cache[j])
    return out


# ---------------------------------------------------------------------------
# per-chunk kernels
# ---------------------------------------------------------------------------


def _k_sort_gather8(scalars, xy, inf):
    """digits -> sort -> gather straight into scan layout.

    Scan layout: (BS, 3L, LT) with lane = window*NB + block; sorted element
    j = block*BS + step.  The layout transpose happens on the int32 index
    array (cheap), so the one coordinate gather lands directly in place."""
    digits = msm12._extract_digits(scalars)                  # (W, N)
    iota = jax.lax.broadcasted_iota(jnp.int32, digits.shape, 1)
    sorted_d, perm = jax.lax.sort_key_val(digits, iota, dimension=1)

    def to_layout(a):
        """(W, N) -> (BS, LT) in scan layout (index-space transform)."""
        a = a.reshape(NUM_WINDOWS, NB, BS)
        return jnp.transpose(a, (2, 0, 1)).reshape(BS, LT)

    perm_t = to_layout(perm)                                 # (BS, LT)
    dead_t = to_layout((inf[perm] | (sorted_d == 0))
                       .astype(jnp.int32)).astype(bool)[:, None, :]

    one = jnp.asarray(f8.FQ8.one_mont, jnp.float32)
    flat = perm_t.reshape(-1)
    gxy = jnp.transpose(xy[:, flat].reshape(2 * L, BS, LT),
                        (1, 0, 2))                           # (BS, 66, LT)
    onez = jnp.broadcast_to(one[None, :, None], (BS, L, LT))
    zero = jnp.zeros((), jnp.float32)
    gx = jnp.where(dead_t, zero, gxy[:, :L])
    gy = jnp.where(dead_t, onez, gxy[:, L:])
    gz = jnp.where(dead_t, zero, onez)
    xs = jnp.concatenate([gx, gy, gz], axis=1)               # (BS, 99, LT)

    prev = jnp.concatenate(
        [jnp.full((NUM_WINDOWS, 1), -1, jnp.int32), sorted_d[:, :-1]],
        axis=1)
    flags = to_layout((sorted_d != prev)
                      .astype(jnp.int32)).astype(jnp.float32)[:, None, :]

    return sorted_d, xs, flags


def _win_relayout(t: jnp.ndarray, per_win: int) -> jnp.ndarray:
    """(X, W*per_win) window-major lanes -> (per_win, X, WPAD) scan shape."""
    lead = t.shape[0]
    a = t.reshape(lead, NUM_WINDOWS, per_win)
    a = jnp.transpose(a, (2, 0, 1))                          # (per_win, X, W)
    return jnp.pad(a, ((0, 0), (0, 0), (0, WPAD - NUM_WINDOWS)))


def _win_unlayout(a: jnp.ndarray, per_win: int) -> jnp.ndarray:
    """(per_win, X, WPAD) -> (X, W*per_win)."""
    lead = a.shape[1]
    a = a[:, :, :NUM_WINDOWS]
    return jnp.transpose(a, (1, 2, 0)).reshape(lead, NUM_WINDOWS * per_win)


def _shift_ident(bys: jnp.ndarray) -> jnp.ndarray:
    """Inclusive block scan -> exclusive offsets: offs[b] = bys[b-1], with
    the identity at b = 0.  (The downstream combine consults the within-
    block flag, so segment boundaries need no masking here.)"""
    z, o, _ = p8._ident_rows((L, 1, bys.shape[-1]))
    ident = jnp.concatenate([z, o, z], axis=0).reshape(1, L3, bys.shape[-1])
    return jnp.concatenate([ident, bys[:-1]], axis=0)


def _k_chunk_scan(xs, gf):
    """Within-block segmented scans + per-block offsets + flag prefixes."""
    ys = p8.seg_scan(xs, gf)
    wf = jax.lax.cummax(gf, axis=0)                          # flag prefixes
    tot = ys[-1]                                             # (3L, LT)
    tot_f = wf[-1]                                           # (1, LT)
    bxs = _win_relayout(tot, NB)
    bfs = _win_relayout(tot_f, NB)
    bys = p8.seg_scan(bxs, bfs, sub=1)
    offs = _win_unlayout(_shift_ident(bys), NB)              # (3L, LT)
    return ys, wf, offs


def _k_collect8(sorted_d, ys, wf, offs, acc):
    """Fused bucket collection: gather each bucket's segment-final position
    from the within-block scans, combine with its block offset, and
    accumulate into the running (3L, W*NUM_BUCKETS) bucket array."""
    queries = jax.lax.broadcasted_iota(
        jnp.int32, (NUM_WINDOWS, NUM_BUCKETS), 1)
    pos = jax.vmap(lambda row, q: jnp.searchsorted(row, q, side="right"))(
        sorted_d, queries) - 1                     # (W, NBKT), may be -1
    pos_c = jnp.maximum(pos, 0)
    widx = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 0)
    lane = widx * NB + pos_c // BS                 # (W, NBKT)
    step = pos_c % BS

    s_idx = step.reshape(-1)
    l_idx = lane.reshape(-1)

    wg = jnp.transpose(ys[s_idx, :, l_idx], (1, 0))        # (3L, W*NBKT)
    wfg = jnp.transpose(wf[s_idx, :, l_idx], (1, 0))       # (1, W*NBKT)
    og = offs[:, l_idx]                                    # (3L, W*NBKT)

    val = p8.seg_combine_stacked(og, jnp.zeros_like(wfg), wg, wfg)

    d_at_pos = jax.vmap(lambda row, i: row[i])(sorted_d, pos_c)
    valid = ((pos >= 0) & (d_at_pos == queries)).reshape(-1)
    ident = p8.identity_stacked(val.shape[-1])
    val = jnp.where(valid[None], val, ident)

    return p8.pt_add_stacked(acc, val)


# ---------------------------------------------------------------------------
# triangle reduction (full scans over buckets, same scan kernel)
# ---------------------------------------------------------------------------

BS2 = 256
NB2 = NUM_BUCKETS // BS2
LT2 = NUM_WINDOWS * NB2


def _bucket_layout(a):
    """(X, W*NBKT) -> (BS2, X, LT2) scan layout over buckets."""
    lead = a.shape[0]
    a = a.reshape(lead, NUM_WINDOWS, NB2, BS2)
    return jnp.transpose(a, (3, 0, 1, 2)).reshape(BS2, lead, LT2)


def _bucket_unlayout(a):
    """(BS2, X, LT2) -> (X, W*NBKT)."""
    lead = a.shape[1]
    a = a.reshape(BS2, lead, NUM_WINDOWS, NB2)
    return jnp.transpose(a, (1, 2, 3, 0)).reshape(lead, -1)


def _full_scan(coords: jnp.ndarray):
    """Unsegmented inclusive scan over buckets per window; returns full
    scan values (3L, W*NBKT) and per-window totals (3L, W)."""
    xs = _bucket_layout(coords)
    zf = jnp.zeros((BS2, 1, LT2), jnp.float32)
    ys = p8.seg_scan(xs, zf)
    tot = ys[-1]
    bxs = _win_relayout(tot, NB2)
    zf2 = jnp.zeros((NB2, 1, WPAD), jnp.float32)
    bys = p8.seg_scan(bxs, zf2, sub=1)
    offs = _win_unlayout(_shift_ident(bys), NB2)            # (3L, LT2)
    win_tot = bys[-1][:, :NUM_WINDOWS]
    # combine offsets into within-block values (one full-width pass)
    ow = jnp.broadcast_to(offs[None], (BS2, L3, LT2))
    zfl = jnp.zeros((1, BS2 * LT2), jnp.float32)

    def flat(a):
        return jnp.transpose(a, (1, 0, 2)).reshape(L3, BS2 * LT2)

    val = p8.seg_combine_stacked(flat(ow), zfl, flat(ys), zfl)
    full = _bucket_unlayout(
        jnp.transpose(val.reshape(L3, BS2, LT2), (1, 0, 2)))
    return full, win_tot


def _k_triangle(acc: jnp.ndarray):
    """Per-window triangle sum sum_{k>=1} suffix_k from the
    (3L, W*NUM_BUCKETS) bucket array."""
    def winview(a):
        return a.reshape(a.shape[0], NUM_WINDOWS, NUM_BUCKETS)

    rev = winview(acc)[:, :, ::-1].reshape(acc.shape[0], -1)
    full, _ = _full_scan(rev)
    suf = winview(full)[:, :, ::-1].reshape(acc.shape[0], -1)

    kidx = jax.lax.broadcasted_iota(
        jnp.int32, (NUM_WINDOWS, NUM_BUCKETS), 1).reshape(-1)
    ident = p8.identity_stacked(suf.shape[-1])
    tail = jnp.where((kidx >= 1)[None], suf, ident)
    _, win_tot = _full_scan(tail)
    return win_tot                                   # (3L, W)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def msm_device(basis: msm12.DeviceBasis, scalar_chunks: list, length: int):
    """scalar_chunks: canonical (non-Montgomery) 12-bit limb chunks
    (22, CHUNK).  Returns a host `ec.curve.Jacobian`."""
    from ..fields.scalar import inv as sinv
    from . import curve

    xy = basis8(basis)
    acc = p8.identity_stacked(NUM_WINDOWS * NUM_BUCKETS)
    for j, sc in enumerate(scalar_chunks):
        sorted_d, xs, gf = _k_sort_gather8(sc, xy[j], basis.inf_chunks[j])
        ys, wf, offs = _k_chunk_scan(xs, gf)
        acc = _k_collect8(sorted_d, ys, wf, offs, acc)

    win = _k_triangle(acc)
    tx, ty, tz = win[:L], win[L:2 * L], win[2 * L:]

    fm = _get_fm8()
    X = f8.limbs8_to_ints(np.asarray(fm(tx)))
    Y = f8.limbs8_to_ints(np.asarray(fm(ty)))
    Z = f8.limbs8_to_ints(np.asarray(fm(tz)))

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


_FM8 = None


def _get_fm8():
    """Module-cached jit (a fresh per-call lambda defeats the cache)."""
    global _FM8
    if _FM8 is None:
        _FM8 = jax.jit(lambda a: f8.lazy_to_canonical(
            f8.mont_mul_const(a, _one_int_limbs(), f8.FQ8), f8.FQ8))
    return _FM8


@functools.lru_cache(maxsize=None)
def _one_int_limbs():
    one = np.zeros(L, np.float32)
    one[0] = 1.0
    return one


load_basis = msm12.load_basis
slice_basis = msm12.slice_basis


# AOT-cached entry points (trace+lowering skipped on warm processes; the
# kernel bodies above stay plain functions so tests can call them directly)
_k_to_f8_pair = aot_wrap("msm8.to_f8_pair", _k_to_f8_pair, deps=EC_KDEPS)
_k_sort_gather8 = aot_wrap("msm8.sort_gather8", _k_sort_gather8, deps=EC_KDEPS)
_k_chunk_scan = aot_wrap("msm8.chunk_scan", _k_chunk_scan, deps=EC_KDEPS)
_k_collect8 = aot_wrap("msm8.collect8", _k_collect8, deps=EC_KDEPS)
_k_triangle = aot_wrap("msm8.triangle", _k_triangle, deps=EC_KDEPS)
