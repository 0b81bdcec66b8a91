"""Device Pippenger MSM v6: global c=16 flat window space, bit-reversed
tree layout, Fenwick prefix queries instead of a down-sweep.

Counterpart of arkworks `VariableBaseMSM::msm_unchecked`
(`/root/reference/pcs/src/kzg.rs:72`).  Redesign of the v3/v5 prefix-tree
pipeline driven by the round-4 hardware measurements
(`scripts/experiments/exp_gather*.py`):

- XLA sort is cheap when issued at scale (2^24 keys ~57 ms; the old
  per-chunk "33 ms" was dispatch overhead), so ONE global sort replaces 16
  per-chunk sorts.
- The XLA column gather costs ~18 ns/column regardless of payload width;
  it is the only viable per-element shuffle on this stack (Pallas
  `tpu.dynamic_gather` tops out at 8x128 tiles, one-hot MXU permutes cost
  ~16 ns/row at the measured 35 TFLOP/s, payload-carrying bitonic stages
  are ~60x too slow).  So: ONE global gather, and every later stage must
  be gather-free.
- Point adds run ~42 M/s and are compute+traffic bound; smaller at-rest
  dtypes do not speed the adds up but halve HBM residency, so tree levels
  rest in bf16 normal form (exact: limbs in [-1, 256],
  `fields/device8.normal_form`) and the affine basis + leaves rest in
  uint8 (canonical limbs are exactly [0, 255] -- 66 B/point).

Structure per MSM over N = nch * 2^16 points (nch a power of two):

1. c=16 digits of the canonical scalars -> FLAT window space of
   FL = 16 * N elements (FL = 2^24 at N = 2^20), key = digit in
   [0, 2^16).  The shifted basis (2^{16w} P_i, uint8 affine, generated
   once per CRS root) makes all 16 windows share one bucket space.
2. ONE `sort_key_val` over the flat keys; the permutation is re-indexed
   into BIT-REVERSED order so that the reduction tree's level-k pairing
   is (column c, column c + half) -- block-contiguous Pallas reads, no
   transposes, no strided lanes.  bitrev of the 2^m-long perm costs two
   static 2^12-row gathers + one 2-D transpose (bitrev_2m = (bitrev_m x
   bitrev_m) o transpose).
3. ONE XLA column gather pulls the uint8 affine basis into leaf order.
4. Up-sweep: level 0 is the 9-mul affine-affine add; higher levels the
   12-mul complete projective add (`fields/pallas8.emit_pt_add`, RCB15),
   one Pallas dispatch per level, bf16 in/out.  All levels are RETAINED:
   they are exactly the Fenwick node arrays.
5. Bucket sums are never materialized: the Pippenger triangle telescopes
   (v3's identity) to  result = m*T - sum_{b<m} P[e_b]  with m = 2^16-1,
   T the tree root, e_b the last sorted index with digit <= b.  Each
   P[e] is an O(log FL) Fenwick sum over the retained level arrays:
   65535 queries evaluate as pair-fused gather+add dispatches of
   64k-wide vectors -- ~0.7 M adds total, replacing v3/v5's full
   down-sweep (+50% of all adds), lane prefix, cgather and collect
   phases.  The leaf level is not retained; its queries gather the flat
   basis through the kept sort permutation.
6. Host finalize: one 16-bit scalar-mul and one add.

Exactness: every add is the complete RCB15 formula over the exact 8-bit
lazy-Montgomery field core; sort/gather move data only; padded elements
carry digit 0, and any digit-0 element has coefficient 0 in the
telescoped sum, so zero scalars, identity basis points (substituted by
the generator) and power-of-two chunk padding are all algebraically
invisible.  Verified against the host oracle by `scripts/check_msm6.py`.

This file holds the HOST side of v6 (digit extraction, shifted-basis
generation + disk cache, the global sort/gather, the driver and routing).
Every `aot_wrap`-ed device kernel lives in `ec/msm6k.py`, whose EC_KDEPS
deliberately excludes this file: edits to the host glue here must never
invalidate the multi-minute MSM AOT export family
(`tests/test_aot_key_hygiene.py` pins this property).
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device8 as f8  # noqa: E402
from ..fields import pallas8 as p8  # noqa: E402
from ..fields.bn254 import P  # noqa: E402
from . import msm as msm12  # noqa: E402
from . import msm5  # noqa: E402
from . import msm6k as k6  # noqa: E402
# compat re-exports: profiling/check scripts address the whole v6 family
# through this module
from .msm6k import (  # noqa: E402,F401
    EC_KDEPS, _BLK, _MIN_H, _brev_bits, _coarse_prefix_fn, _ident_cols,
    _k_coarse, _k_qinit, _k_qstep, _k_qstep0, _k_qstep_pair, _k_reduce_tail,
    _k_reduce_wide, _lvl0_kernel, _lvl_call, _lvl_kernel, _qinit_fn,
    _qstep0_fn, _qstep_fn, _qstep_pair_fn, _reduce_cols, _reduce_tail_fn,
    _reduce_wide_fn, _xadd,
)

L = f8.L
L2 = 2 * L
L3 = 3 * L
CHUNK = msm12.CHUNK
LOG2_CHUNK = msm12.LOG2_CHUNK

WBITS = k6.WBITS
W = k6.W
NBUCK = k6.NBUCK


# ---------------------------------------------------------------------------
# c=16 digit extraction from canonical 12-bit limbs
# ---------------------------------------------------------------------------


@jax.jit
def _k_digits16(sc, inf):
    """(22, N) canonical int32 limbs + (N,) bool inf -> (16, N) int32
    digits, window-major; digits of infinity points forced to 0."""
    outs = []
    for w in range(W):
        lo = WBITS * w
        i0, sh = divmod(lo, 12)
        v = sc[i0] >> sh
        got = 12 - sh
        if i0 + 1 < 22:
            v = v | (sc[i0 + 1] << got)
            got += 12
        if got < WBITS and i0 + 2 < 22:
            v = v | (sc[i0 + 2] << got)
        outs.append(v & (NBUCK - 1))
    d = jnp.stack(outs, axis=0)
    return jnp.where(inf[None, :], 0, d)


@jax.jit
def _k_digits16_all(sc_stack, inf_stack):
    """(nch, 22, CHUNK) + (nch, CHUNK) -> flat (nch*W*CHUNK,) keys in one
    dispatch (16 separate per-chunk dispatches measured ~30 ms at 2^20)."""
    d = jax.vmap(_k_digits16)(sc_stack, inf_stack)     # (nch, W, CHUNK)
    return d.reshape(-1)


# ---------------------------------------------------------------------------
# shifted basis: per-chunk (2L, W*CHUNK) uint8 affine, 2^{16w} P_i
# ---------------------------------------------------------------------------


@jax.jit
def _k_affpair_to_u8(x12, y12):
    """12-bit lazy Montgomery affine coords -> (2L, N) uint8 canonical.
    Canonical 8-bit limbs are exactly [0, 255], so uint8 at rest is exact
    and HALF the bf16 bytes (66 B/point basis + leaves)."""
    from ..fields import device as fd12

    x8 = f8.from12(fd12.lazy_to_canonical(x12, fd12.FQ))
    y8 = f8.from12(fd12.lazy_to_canonical(y12, fd12.FQ))
    return jnp.concatenate([x8, y8], axis=0).astype(jnp.uint8)


def _shift_doubling16(root, j: int) -> jnp.ndarray:
    """Arbitrary basis: W-1 rounds of WBITS doublings (8-bit stacked),
    identity points substituted with the generator (digits are zeroed in
    `_k_digits16`, so the stand-in never contributes)."""
    from . import curve, msm8

    xy = msm8.basis8(root)[j]                              # (2L, N) mont
    n = xy.shape[-1]
    z = jnp.broadcast_to(
        jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None], (L, n))
    cur = jnp.concatenate([xy[:L], xy[L:], z], axis=0)
    inf = root.inf_chunks[j]
    if bool(np.asarray(jnp.any(inf))):
        g = curve.g1_generator().to_affine()
        gx = jnp.asarray(f8.int_to_limbs8(
            g.x.v * pow(2, f8.R_BITS, P) % P))[:, None]
        gy = jnp.asarray(f8.int_to_limbs8(
            g.y.v * pow(2, f8.R_BITS, P) % P))[:, None]
        gz = jnp.asarray(f8.FQ8.one_mont)[:, None]
        gpt = jnp.concatenate([jnp.broadcast_to(gx, (L, n)),
                               jnp.broadcast_to(gy, (L, n)),
                               jnp.broadcast_to(gz, (L, n))], axis=0)
        cur = jnp.where(inf[None, :], gpt, cur)
    wins = [cur]
    for _ in range(W - 1):
        for _ in range(WBITS):
            cur = p8.pt_add_stacked(cur, cur)
        # drain the dispatch queue: 16x16 queued eager adds otherwise hold
        # every intermediate alive at once (observed ResourceExhausted)
        jax.block_until_ready(cur)
        wins.append(cur)
    stacked = jnp.concatenate(wins, axis=1)                # (3L, W*N)
    parts = [msm5._k_8stacked_to12(stacked[:, w * CHUNK:(w + 1) * CHUNK])
             for w in range(W)]
    del stacked
    from . import fixed_base as fb

    norm = fb._batch_normalize(parts)
    return jnp.concatenate([_k_affpair_to_u8(x, y) for x, y in norm],
                           axis=1)


# basis disk-cache observability (read by bench.py: the "warm" headline is
# only auditable if the JSON says whether the ~260-490 s per-CRS basis
# generation was paid or served from disk)
CACHE_STATS = {"hit": 0, "miss": 0}


def _b6_cache_path(tau: int, j: int):
    """Disk-cache path for one uint8 affine shifted chunk.  Deterministic
    in (tau, j) and the window geometry; follows the same env contract as
    `pcs/kzg._crs_cache_dir` (QUILL_CRS_CACHE=0 disables,
    QUILL_CRS_CACHE_DIR overrides) without importing pcs from ec."""
    import hashlib
    import os
    from pathlib import Path

    if os.environ.get("QUILL_CRS_CACHE", "1") == "0":
        return None
    base = os.environ.get(
        "QUILL_CRS_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "quill_tpu_crs"))
    tag = hashlib.sha256(
        b"b6u8" + tau.to_bytes(32, "little")
        + j.to_bytes(8, "little") + W.to_bytes(2, "little")
        + WBITS.to_bytes(2, "little") + CHUNK.to_bytes(4, "little")
        + L.to_bytes(2, "little")).hexdigest()[:32]
    return Path(base) / f"b6u8_{tag}.npy"


def _b6_cache_load(path):
    """np.load that tolerates a truncated/corrupt cache file: delete it and
    fall through to regeneration instead of crashing the prove."""
    try:
        return jnp.asarray(np.load(path))
    except Exception:
        try:
            path.unlink()
        except OSError:
            pass
        return None


def _b6_cache_store(path, out):
    """Atomic store with a per-writer tmp name: a fixed shared tmp path
    lets two concurrent processes interleave writes and rename a
    partially-written file into place."""
    import os

    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(f".{os.getpid()}.tmp.npy")
    try:
        np.save(tmp, np.asarray(out))
        tmp.replace(path)
    except OSError:
        try:
            tmp.unlink()
        except OSError:
            pass


def _gen_affine16(root, j: int) -> jnp.ndarray:
    """(2L, W*CHUNK) uint8 affine shifted chunk (tau CRS: fixed-base).

    Tau chunks are disk-cached: per-process regeneration measured
    260-490 s per 2^20 CRS, vs ~1.5 s/chunk to reload through the
    45 MB/s tunnel (the round-4 "cheapest big win" item)."""
    from . import fixed_base as fb
    from ..fields.bn254 import R as FR_MOD
    from ..fields import device as fd12
    from ..fields.limbs import ints_to_limbs

    tau = getattr(root, "tau", None)
    if tau is None:
        return _shift_doubling16(root, j)
    path = _b6_cache_path(tau, j)
    if path is not None and path.exists():
        cached = _b6_cache_load(path)
        if cached is not None:
            CACHE_STATS["hit"] += 1
            return cached
    CACHE_STATS["miss"] += 1
    pw_mont = getattr(root, "_b3_pw_mont", None)
    if pw_mont is None:
        powers = [1] * CHUNK
        for i in range(1, CHUNK):
            powers[i] = powers[i - 1] * tau % FR_MOD
        pw = jnp.asarray(ints_to_limbs(powers))
        pw_mont = fd12.to_mont(pw, fd12.FR)
        root._b3_pw_mont = pw_mont
    from . import msm3

    jt = msm3._fb_table()
    base_c = pow(tau, j * CHUNK, FR_MOD)
    wins = []
    for w in range(W):
        c = (pow(2, WBITS * w, FR_MOD) * base_c) % FR_MOD
        c_mont = jnp.asarray(ints_to_limbs(
            [c * pow(2, fd12.R_BITS, FR_MOD) % FR_MOD]))
        sc = msm3._k_scale_canon(pw_mont, c_mont)
        wins.append(fb._k_fixed_base_chunk(sc, *jt))
    norm = fb._batch_normalize([tuple(x) for x in wins])
    out = jnp.concatenate([_k_affpair_to_u8(x, y) for x, y in norm],
                          axis=1)
    if path is not None:
        _b6_cache_store(path, out)
    return out


def shifted_basis16(basis: msm12.DeviceBasis, nch: int | None = None
                    ) -> jnp.ndarray:
    """ONE flat (2L, W*CHUNK*nch) uint8 affine shifted basis covering the
    first `nch` CRS chunks, cached on the root.  The cache holds only the
    concatenated array (per-chunk parts are freed as they land), and a
    wider cached array serves narrower MSMs directly -- `_msm_one` clamps
    its gather to the live prefix, so extra columns are inert."""
    root = getattr(basis, "_root", basis)
    if nch is None:
        nch = len(basis.x_chunks)
    flat = getattr(root, "_b6_flat", None)
    have = getattr(root, "_b6_flat_nch", 0)
    if flat is None or have < nch:
        parts = [flat] if flat is not None else []
        for j in range(have, nch):
            parts.append(_gen_affine16(root, j))
            jax.block_until_ready(parts[-1])
        flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=1)
        del parts
        root._b6_flat = flat
        root._b6_flat_nch = nch
    return flat


# ---------------------------------------------------------------------------
# sort + bitrev re-index + global gather
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _brev_half(mh: int) -> np.ndarray:
    """bitrev permutation of [0, 2^mh) as a host int32 array."""
    n = 1 << mh
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = int(format(i, f"0{mh}b")[::-1], 2) if mh else 0
    return out


def _bitrev_perm(v: jnp.ndarray, m: int) -> jnp.ndarray:
    """out[phi] = v[bitrev_m(phi)] for a 2^m-long int array, via
    bitrev_m = (bitrev_a x bitrev_b) o swap(a, b): two small static row
    gathers + one 2-D transpose (no 2^m-sized index gather)."""
    a = m // 2
    b = m - a
    # phi = r * 2^b + c  ->  brev_m(phi) = brev_b(c) * 2^a + brev_a(r)
    mat = v.reshape(1 << b, 1 << a)          # [hi, lo] of the SOURCE index
    mat = mat[jnp.asarray(_brev_half(b))][:, jnp.asarray(_brev_half(a))]
    return jnp.transpose(mat, (1, 0)).reshape(-1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _k_sort_gather(keys, base_flat, m: int, fl_real: int):
    """keys (2^m,) int32; base_flat (2L, >= fl_real) uint8 -> (sorted keys,
    sorted-order perm, leaves (2L, 2^m) bf16 in bitrev-physical order).
    perm is kept for the leaf-level Fenwick queries (the 2.2 GB leaf array
    itself is freed right after level 0)."""
    iota = jax.lax.iota(jnp.int32, keys.shape[0])
    sorted_k, perm = jax.lax.sort_key_val(keys, iota)
    # padded flat elements (beyond the real basis) carry digit 0; any
    # basis column stands in for them (coefficient 0 in the telescoping)
    perm = jnp.minimum(perm, fl_real - 1)
    pphys = _bitrev_perm(perm, m)
    # the uint8 basis gathers at 66 B/point; leaves convert to bf16 here
    # (XLA) because Mosaic has no uint8->f32 cast inside the level kernel
    return sorted_k, perm, base_flat[:, pphys].astype(jnp.bfloat16)


def _up_sweep(leaves: jnp.ndarray) -> list:
    """bf16 (2L, FL) leaves -> [None, level1, ..., levelK] with levelK of
    width _MIN_H; level k has width FL >> k.  The leaf array (2.2 GB at
    2^24) is NOT retained: its Fenwick role is served by gathering the
    flat basis through the kept perm (`_qstep0_fn`), so it frees as soon
    as level 1 lands (the caller must drop its own reference)."""
    levels = [None]
    x = k6._lvl_call(leaves.shape[-1] // 2, True)(leaves)
    del leaves
    levels.append(x)
    while x.shape[-1] > _MIN_H and x.shape[-1] > 1:
        x = k6._lvl_call(x.shape[-1] // 2, False)(x)
        levels.append(x)
    return levels


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _finalize_host(s_col, t_col, mult: int | None = None):
    """result = mult * T - S on the host (one 16-bit scalar mul).
    mult defaults to the v6 telescoping factor NBUCK - 1; the signed v7
    passes NBUCK7 (`ec/msm7.py`)."""
    from ..fields.scalar import inv as sinv
    from . import curve

    if mult is None:
        mult = NBUCK - 1
    cols = jnp.concatenate([s_col, t_col], axis=1)         # (3L, 2)
    from . import msm3

    fm = msm3._k_canon(cols)
    ints = [f8.limbs8_to_ints(np.asarray(fm[k * L:(k + 1) * L]))
            for k in range(3)]

    def to_jac(i):
        x, y, z = ints[0][i], ints[1][i], ints[2][i]
        if z == 0:
            return curve.Jacobian.identity(curve.Fq(1))
        zi = sinv(z, P)
        return curve.Jacobian(curve.Fq(x * zi % P), curve.Fq(y * zi % P),
                              curve.Fq(1))

    return to_jac(1).scalar_mul(mult).add(to_jac(0).neg())


def _msm_one(base_flat: jnp.ndarray, scalar_chunks: list,
             inf_chunks: list):
    nch_real = len(scalar_chunks)
    nch = max(1, 1 << (nch_real - 1).bit_length())         # pad to pow2
    m = 4 + LOG2_CHUNK + (nch.bit_length() - 1)            # log2(W*N)
    fl_real = W * CHUNK * nch_real

    keys = _k_digits16_all(jnp.stack(scalar_chunks, axis=0),
                           jnp.stack(inf_chunks, axis=0))
    if nch != nch_real:
        keys = jnp.concatenate(
            [keys, jnp.zeros((nch - nch_real) * W * CHUNK, jnp.int32)])

    sorted_k, perm, leaves = _k_sort_gather(keys, base_flat, m, fl_real)
    levels = _up_sweep(leaves)
    del leaves
    kmin = len(levels) - 1                                  # top level index
    top = levels[kmin]
    brev_idx = jnp.asarray(_brev_half(m - kmin))
    coarse = k6._k_coarse(top.shape[-1])(top, brev_idx)
    acc, offset, cnt = k6._k_qinit(kmin)(sorted_k, coarse)
    k = kmin - 1
    while k >= 2:
        acc, offset = k6._k_qstep_pair(k, m - k)(acc, offset, cnt,
                                                 levels[k], levels[k - 1])
        k -= 2
    if k == 1:
        acc, offset = k6._k_qstep(1, m - 1)(acc, offset, cnt, levels[1])
    acc = k6._k_qstep0(m)(acc, offset, cnt, perm, base_flat)
    del levels
    # pad the (NBUCK-1)-wide query results to a power of two with one
    # identity column for the halving reduction
    acc = jnp.concatenate([acc, k6._ident_cols(1)], axis=1)
    s_col = k6._reduce_cols(acc)
    return _finalize_host(s_col, coarse[:, -1:])


def msm_device(basis: msm12.DeviceBasis, scalar_chunks: list, length: int):
    """Canonical (22, CHUNK) limb scalar chunks -> host `curve.Jacobian`."""
    flat = shifted_basis16(basis, len(scalar_chunks))
    inf = [basis.inf_chunks[j] for j in range(len(scalar_chunks))]
    return _msm_one(flat, list(scalar_chunks), inf)


def msm_device_batch(basis: msm12.DeviceBasis, batch_chunks: list) -> list:
    """B independent MSMs over one CRS basis.  v6 has no cross-MSM work
    sharing (the sort/gather/tree all scale with the element count), so
    the batch is a loop; per-MSM fixed costs are already small."""
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
