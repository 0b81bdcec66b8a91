"""Device Pippenger MSM v3: flat window space + log-depth prefix trees.

Counterpart of arkworks `VariableBaseMSM::msm_unchecked`
(`/root/reference/pcs/src/kzg.rs:72`), third redesign of the TPU kernel
pipeline (v1 `ec/msm.py`, v2 `ec/msm8.py`).  Two measured facts drive it:

- the v2 segmented point scan is LATENCY-bound: ~0.47 ms per sequential
  step regardless of lane count (256-step scans cost ~120 ms/chunk while
  the same adds as independent work run at ~66 M adds/s);
- per-MSM fixed costs (bucket-triangle reduction ~75 ms, 20-window host
  combine) dominate small MSMs, and the prover issues dozens of them.

v3 exploits two structural facts the earlier designs left unused:

1. **G1 is a group, not a monoid** -- bucket sums are differences of
   prefix sums, and the whole Pippenger triangle telescopes:
     sum_b b*B_b  =  m*P[N-1] - sum_{b<m} P[e_b],   m = NUM_BUCKETS-1,
   where P is the *unsegmented* inclusive prefix sum of the digit-sorted
   points and e_b = last sorted index with digit <= b (empty buckets
   cancel automatically as P[e] - P[e] = O).  An unsegmented prefix sum
   has a log-depth tree schedule: every level is a batch of INDEPENDENT
   point additions running at the vector-kernel rate.

2. **The CRS is fixed** across all commits/opens of a proof, so the
   per-window shifted points 2^{cw} * P_i are precomputed once per chunk
   (`shifted_basis`).  The 20-window problem then flattens into ONE
   window over W*N (point, digit) pairs sharing a single bucket space:
   one sort, one tree, no per-window combine, and the final result needs
   only one 13-bit host scalar-mul instead of 20 windows x 13 doublings.

Per chunk (N = 2^16, flat S*M = W*N elements laid out as (S=256, 3L, M)):
digit sort -> gather -> 8 Pallas up-sweep rounds to lane totals ->
recursive prefix over the 5120-lane axis (reordered back into the same
tree layout, bottoming out in a 7-step XLA ladder over 128 columns) ->
8 Pallas down-sweep rounds (expand prefixes; subtraction = free Y
negation) -> collect (gather the 8191 bucket-end prefixes per batch +
Pallas pairwise reduction).  Stages are individually AOT-cached
dispatches (a module holding all ~34 kernels OOMs the axon compile
helper) that pipeline on the device stream; B independent MSMs over the
same CRS batch into one pipeline (`msm_device_batch`) by widening the
lane axis B-fold, amortizing every fixed cost.  ~2.7 B*N*W independent
point adds total.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ..fields import device8 as f8  # noqa: E402
from ..fields import pallas8 as p8  # noqa: E402
from ..fields.bn254 import P  # noqa: E402
from ..utils.aotcache import aot_wrap  # noqa: E402
from . import msm as msm12  # noqa: E402
from . import msm8  # noqa: E402

# AOT-cache dependency set: ONLY files whose source affects the lowering of
# these kernels -- host-side ec modules (curve.py, pairing.py, native_ec.py,
# tower.py) must NOT invalidate multi-minute device kernel exports.
EC_KDEPS = ('ec/device.py', 'ec/fixed_base.py', 'ec/msm.py', 'ec/msm3.py',
            'ec/msm8.py', 'fields', 'utils/jaxcfg.py')

L = f8.L
L3 = 3 * L
LOG2_CHUNK = msm12.LOG2_CHUNK
CHUNK = msm12.CHUNK
WINDOW_BITS = msm12.WINDOW_BITS
NUM_WINDOWS = msm12.NUM_WINDOWS
NUM_BUCKETS = msm12.NUM_BUCKETS

S = 256                        # tree leaf-block length (leading axis)
M = NUM_WINDOWS * CHUNK // S   # lanes (5120 at c=13, N=2^16)


# ---------------------------------------------------------------------------
# shifted basis precompute (per CRS chunk, cached on the root basis)
# ---------------------------------------------------------------------------


def _shift_doubling(basis: msm12.DeviceBasis, j: int) -> jnp.ndarray:
    """Fallback for arbitrary point sets: W-1 rounds of WINDOW_BITS
    doublings (eager dispatches -- a single exported module holding ~250
    kernel calls executed pathologically slowly on axon)."""
    xy = msm8.basis8(basis)[j]                             # (2L, N) mont
    n = xy.shape[-1]
    z = jnp.broadcast_to(
        jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None], (L, n))
    cur = jnp.concatenate([xy[:L], xy[L:], z], axis=0)
    # dead points must be the identity for the prefix algebra
    cur = jnp.where(basis.inf_chunks[j][None, :],
                    p8.identity_stacked(n), cur)
    wins = [cur]
    for _ in range(NUM_WINDOWS - 1):
        for _ in range(WINDOW_BITS):
            cur = p8.pt_add_stacked(cur, cur)
        wins.append(cur)
    return jnp.concatenate(wins, axis=1)                   # (3L, W*N)


@jax.jit
def _k_scale_canon(pw_mont, c_mont):
    """(22, N) Montgomery Fr powers * runtime constant -> canonical limbs
    (digit-extractable)."""
    from ..fields import device as fd12

    s = fd12.mont_mul(pw_mont, jnp.broadcast_to(c_mont, pw_mont.shape),
                      fd12.FR)
    return fd12.from_mont(s, fd12.FR)


@jax.jit
def _k_proj_to8(px, py, pz):
    """Projective 12-bit lazy Montgomery Fq coords -> (3L, N) f32 stacked."""
    from ..fields import device as fd12

    return jnp.concatenate([
        f8.from12(fd12.lazy_to_canonical(px, fd12.FQ)),
        f8.from12(fd12.lazy_to_canonical(py, fd12.FQ)),
        f8.from12(fd12.lazy_to_canonical(pz, fd12.FQ))], axis=0)


@functools.lru_cache(maxsize=1)
def _fb_table():
    from . import curve, fixed_base as fb

    tx, ty, tz = fb._build_table(curve.g1_generator())
    return jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tz)


def _shift_fixed_base(root, tau: int, j: int) -> jnp.ndarray:
    """Shifted basis chunk for a tau-powers CRS, by fixed-base generation:
    2^{cw} * tau^i * G = (2^{cw} tau^{jN} * tau^{i mod N} mod r) * G, so
    every window is one constant-scaled power table fed to the fixed-base
    chunk kernel (`ec/fixed_base.py`) -- no per-window doubling ladders.
    Projective outputs feed the prefix tree unnormalized (no inversion)."""
    from ..fields import device as fd12
    from ..fields.bn254 import R as FR_MOD
    from ..fields.limbs import ints_to_limbs
    from . import fixed_base as fb

    pw_mont = getattr(root, "_b3_pw_mont", None)
    if pw_mont is None:
        powers = [1] * CHUNK
        for i in range(1, CHUNK):
            powers[i] = powers[i - 1] * tau % FR_MOD
        pw = jnp.asarray(ints_to_limbs(powers))
        pw_mont = fd12.to_mont(pw, fd12.FR)
        root._b3_pw_mont = pw_mont
    jt = _fb_table()
    base_c = pow(tau, j * CHUNK, FR_MOD)
    parts = []
    for w in range(NUM_WINDOWS):
        c = (pow(2, WINDOW_BITS * w, FR_MOD) * base_c) % FR_MOD
        c_mont = jnp.asarray(ints_to_limbs([c * pow(2, fd12.R_BITS, FR_MOD)
                                            % FR_MOD]))
        sc = _k_scale_canon(pw_mont, c_mont)
        px, py, pz = fb._k_fixed_base_chunk(sc, *jt)
        parts.append(_k_proj_to8(px, py, pz))
    return jnp.concatenate(parts, axis=1)


def shifted_basis(basis: msm12.DeviceBasis) -> list:
    """Per-chunk shifted bases, cached on the ROOT basis (slices share
    `_root`, `ec/msm.py` slice_basis), so a CRS chunk is shifted once per
    process no matter how many commits/opens reuse it.  CRS bases carry
    `tau` (set by trusted setup) and use the fast fixed-base generator."""
    root = getattr(basis, "_root", basis)
    cache = getattr(root, "_b3_chunks", None)
    if cache is None:
        cache = {}
        root._b3_chunks = cache
    tau = getattr(root, "tau", None)
    out = []
    for j in range(len(basis.x_chunks)):
        if j not in cache:
            if tau is not None:
                cache[j] = _shift_fixed_base(root, tau, j)
            else:
                cache[j] = _shift_doubling(basis, j)
        out.append(cache[j])
    return out


# ---------------------------------------------------------------------------
# sort + gather into the tree layout
# ---------------------------------------------------------------------------


def _sort_gather(scs, base_sh):
    """Canonical (B, 22, N) scalar batch -> (sorted keys (B*W*N,) int32,
    leaf array (S, 3L, B*M) in pos = m*S + s order).

    Key = batch*NUM_BUCKETS + digit: the sorted order is batch-major with
    each batch segment digit-sorted, so B independent MSMs share one sort,
    one gather and one prefix tree.  The point of flat element (b, w*N+i)
    is base_sh[:, w*N+i] for every batch."""
    nb = scs.shape[0]
    digits = jax.vmap(msm12._extract_digits)(scs)          # (B, W, N)
    per = digits.shape[1] * digits.shape[2]
    keys = (digits.reshape(nb, per)
            + (jnp.arange(nb, dtype=jnp.int32) * NUM_BUCKETS)[:, None]
            ).reshape(-1)
    iota = jax.lax.iota(jnp.int32, keys.shape[0])
    sorted_k, perm = jax.lax.sort_key_val(keys, iota)
    mb = nb * M
    # leaf layout: pos = m*S + s  ->  A[s, m] = perm[m*S + s]
    perm_t = (perm % per).reshape(mb, S).T                 # (S, MB)
    g = base_sh[:, perm_t.reshape(-1)]                     # (3L, S*MB)
    leaves = jnp.transpose(g.reshape(L3, S, mb), (1, 0, 2))
    return sorted_k, perm, leaves


_k_sortg = aot_wrap("msm3.sortg", _sort_gather, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# Pallas tree kernels: pairwise add / prefix expand along the leading axis
# ---------------------------------------------------------------------------

_RS = 1          # output rows per grid step (body = ONE inlined point add;
                 # rs=4 produced a 406KB-MLIR kernel that OOMed the remote
                 # compile helper -- the grid is the row loop instead)
_MT = 1024       # lanes per grid step


def _consts_spec2():
    """Consts-pack BlockSpec for the 2D-grid tree kernels."""
    return pl.BlockSpec((p8._PACK_ROWS, L), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)


def _split3(v):
    return v[:L], v[L:2 * L], v[2 * L:]


def _row3d(ref, j):
    """Row j of a (rows, 3L, mt) block as a (3L, mt//128, 128) f32 tile."""
    v = ref[j]
    return v.reshape(L3, v.shape[-1] // 128, 128)


def _st_row(ref, j, stacked3):
    x, y, z = stacked3
    out = jnp.concatenate([x, y, z], axis=0)
    ref[j] = out.reshape(L3, out.shape[-2] * 128)


def _up_kernel(modulus, rs, c_ref, x_ref, o_ref):
    """o[j] = x[2j] + x[2j+1] for j in [0, rs)."""
    spec = p8.unpack_spec(modulus, c_ref[:])
    for j in range(rs):
        a = _split3(_row3d(x_ref, 2 * j))
        b = _split3(_row3d(x_ref, 2 * j + 1))
        _st_row(o_ref, j, p8.emit_pt_add(a, b, spec))


def _down_kernel(modulus, rs, c_ref, i_ref, u_ref, o_ref):
    """Prefix expand: o[2j+1] = i[j]; o[2j] = i[j] + neg(u[2j+1])."""
    spec = p8.unpack_spec(modulus, c_ref[:])
    for j in range(rs):
        ij = _split3(_row3d(i_ref, j))
        ux, uy, uz = _split3(_row3d(u_ref, 2 * j + 1))
        even = p8.emit_pt_add(ij, (ux, -uy, uz), spec)
        _st_row(o_ref, 2 * j, even)
        o_ref[2 * j + 1] = i_ref[j]


@functools.lru_cache(maxsize=None)
def _up_call(k_out: int, m_len: int):
    pack = p8.consts_pack(f8.FQ8.modulus)
    rs = min(_RS, k_out)
    mt = min(_MT, m_len)
    grid = (k_out // rs, m_len // mt)
    in_spec = pl.BlockSpec((2 * rs, L3, mt), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rs, L3, mt), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    def run(x):
        return pl.pallas_call(
            functools.partial(_up_kernel, f8.FQ8.modulus, rs),
            out_shape=jax.ShapeDtypeStruct((k_out, L3, m_len), jnp.float32),
            grid=grid,
            in_specs=[_consts_spec2(), in_spec],
            out_specs=out_spec,
            interpret=p8._interpret(),
        )(pack, x)

    return aot_wrap(f"msm3.up{k_out}x{m_len}", run, deps=EC_KDEPS)


@functools.lru_cache(maxsize=None)
def _down_call(k_in: int, m_len: int):
    pack = p8.consts_pack(f8.FQ8.modulus)
    rs = min(_RS, k_in)
    mt = min(_MT, m_len)
    grid = (k_in // rs, m_len // mt)
    i_spec = pl.BlockSpec((rs, L3, mt), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((2 * rs, L3, mt), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)

    def run(i_arr, u_arr):
        return pl.pallas_call(
            functools.partial(_down_kernel, f8.FQ8.modulus, rs),
            out_shape=jax.ShapeDtypeStruct((2 * k_in, L3, m_len),
                                           jnp.float32),
            grid=grid,
            in_specs=[_consts_spec2(), i_spec, u_spec],
            out_specs=u_spec,
            interpret=p8._interpret(),
        )(pack, i_arr, u_arr)

    return aot_wrap(f"msm3.down{k_in}x{m_len}", run, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# prefix tree: full-depth Pallas up/down sweeps + recursive lane scan
# ---------------------------------------------------------------------------


def _xadd(a, b, spec):
    """Stacked (3L, ...) complete addition as plain jnp (fused by XLA)."""
    out = p8.emit_pt_add(_split3(a), _split3(b), spec)
    return jnp.concatenate(out, axis=0)


def _ident_cols(n: int) -> jnp.ndarray:
    one = f8.FQ8.one_mont
    z = jnp.zeros((L, n), jnp.float32)
    o = jnp.stack([jnp.full((n,), float(one[i]), jnp.float32)
                   for i in range(L)], axis=0)
    return jnp.concatenate([z, o, z], axis=0)


def _treetop_up_fn(x16):
    """Fused up-sweep of the small levels: (16, 3L, m) -> packed
    [L8 | L4 | L2 | L1] = (15, 3L, m), one dispatch (each tiny level as its
    own dispatch costs ~5-35 ms on axon regardless of size).  One transpose
    in, one out -- the add steps stay in the limb-leading layout."""
    spec = f8.FQ8
    r = jnp.transpose(x16, (1, 0, 2))                      # (3L, 16, m)
    levels = []
    while r.shape[1] > 1:
        r = _xadd(r[:, 0::2], r[:, 1::2], spec)
        levels.append(r)
    packed = jnp.concatenate(levels, axis=1)               # (3L, 15, m)
    return jnp.transpose(packed, (1, 0, 2))


_k_treetop_up = aot_wrap("msm3.treetopup", _treetop_up_fn, deps=EC_KDEPS)


def _down_t(i_arr, u, spec):
    """One down level in the limb-leading (3L, k, m) layout:
    o[2j+1] = i[j]; o[2j] = i[j] + neg(u[2j+1])  (mirrors `_down_kernel`)."""
    odd = u[:, 1::2]
    neg = jnp.concatenate([odd[:L], -odd[L:2 * L], odd[2 * L:]], axis=0)
    even = _xadd(i_arr, neg, spec)
    k = i_arr.shape[1]
    return jnp.stack([even, i_arr], axis=2).reshape(
        (3 * L, 2 * k) + i_arr.shape[2:])


def _treetop_down_fn(lane_incl, x16, packed):
    """Fused down-sweep of the small levels: global lane prefixes (3L, m)
    + the 16-row level + the packed [L8|L4|L2|L1] -> (16, 3L, m) prefixes
    at the 16-row level, one dispatch."""
    spec = f8.FQ8
    pk = jnp.transpose(packed, (1, 0, 2))                  # (3L, 15, m)
    l8, l4, l2 = pk[:, :8], pk[:, 8:12], pk[:, 12:14]
    x = jnp.transpose(x16, (1, 0, 2))                      # (3L, 16, m)
    i_arr = lane_incl[:, None]                             # (3L, 1, m)
    i_arr = _down_t(i_arr, l2, spec)
    i_arr = _down_t(i_arr, l4, spec)
    i_arr = _down_t(i_arr, l8, spec)
    i_arr = _down_t(i_arr, x, spec)
    return jnp.transpose(i_arr, (1, 0, 2))                 # (16, 3L, m)


_k_treetop_down = aot_wrap("msm3.treetopdown", _treetop_down_fn,
                           deps=EC_KDEPS)


def _tree(leaves, full: bool = True):
    """Global inclusive point-prefixes of (S0, 3L, M0) leaves (element
    order pos = m*S0 + s, so lanes cover contiguous ranges).

    Full-depth up-sweep to lane totals, recursive prefix over the lane
    axis, down-sweep seeded with the lane-level global prefixes.  Each
    Pallas level is its own AOT-cached dispatch: a module holding all ~34
    kernels of a chunk OOM-kills the axon compile helper (one kernel per
    module compiles fine at any call count), and the dispatches pipeline
    on the device stream.

    full=False stops the down-sweep one level early, returning prefixes
    at the 2-element-node level (S0/2, 3L, M0): the collect phase derives
    leaf-level prefixes from it with one gathered correction (P[2j+1] =
    I1[j]; P[2j] = I1[j] - leaf[2j+1]), which skips the single biggest
    down dispatch AND lets the 2-leaf-sized `leaves` buffer die right
    after the first up round (peak-HBM fix for batched MSMs)."""
    x = leaves
    del leaves
    # not-full mode never revisits the leaves: drop the only remaining
    # reference right after the first up round (the caller drops its own)
    levels = [x if full else None]
    if x.shape[0] >= 32:
        # big levels as per-level Pallas dispatches down to 16 rows; the
        # small levels (<= 16 rows, dispatch-overhead-bound) run fused
        while x.shape[0] > 16:
            x = _up_call(x.shape[0] // 2, x.shape[-1])(x)
            levels.append(x)
        packed = _k_treetop_up(x)
        lane_incl = _prefix_cols(packed[14])
        i_arr = _k_treetop_down(lane_incl, x, packed)
        # x (the 16-row level, levels[-1]) was consumed by the treetop; the
        # remaining down inputs are the 32-row level and up (levels[:-1]),
        # finest last -- mirroring `_tree5` (wiring covered by
        # tests/test_msm_tree.py against integer-sum mocks)
        stop = 0 if full else 1
        for lvl in reversed(levels[stop:-1]):
            i_arr = _down_call(i_arr.shape[0], i_arr.shape[-1])(i_arr, lvl)
        return i_arr
    while x.shape[0] > 1:
        x = _up_call(x.shape[0] // 2, x.shape[-1])(x)
        levels.append(x)
    lane_incl = _prefix_cols(x[0])
    i_arr = lane_incl[None]
    stop = 0 if full else 1
    for lvl in reversed(levels[stop:-1]):
        i_arr = _down_call(i_arr.shape[0], i_arr.shape[-1])(i_arr, lvl)
    return i_arr


_LADDER_MAX = 32768


def _prefix_cols(v):
    """Inclusive point-prefix along columns of a stacked (3L, n) array.
    n is identity-padded to a power of two; up to _LADDER_MAX columns run
    as ONE AOT-cached XLA Hillis-Steele ladder dispatch (the recursive
    tree path below costs ~25 tiny dispatches at ~5-35 ms each on axon --
    182 ms measured for 5120 lanes on 10 KB of data, round-3 profile);
    larger sizes reorder into the (np2//128, 3L, 128) tree layout and
    recurse."""
    n = v.shape[-1]
    np2 = max(2, 1 << (n - 1).bit_length())
    if np2 <= _LADDER_MAX:
        return _ladder_call(n)(v)
    if np2 != n:
        v = jnp.concatenate([v, _ident_cols(np2 - n)], axis=1)
    s0 = np2 // 128
    leaves = jnp.transpose(v.reshape(L3, 128, s0), (2, 0, 1))
    i_arr = _tree(leaves)
    out = jnp.transpose(i_arr, (1, 2, 0)).reshape(L3, np2)
    return out[:, :n]


@functools.lru_cache(maxsize=None)
def _ladder_call(n: int):
    np2 = max(2, 1 << (n - 1).bit_length())

    def run(v):
        spec = f8.FQ8
        if np2 != n:
            v = jnp.concatenate([v, _ident_cols(np2 - n)], axis=1)
        idx = jax.lax.iota(jnp.int32, np2)
        ident = _ident_cols(np2)
        sh = 1
        while sh < np2:
            shifted = jnp.concatenate([ident[:, :sh], v[:, :-sh]], axis=1)
            comb = _xadd(v, shifted, spec)
            v = jnp.where((idx >= sh)[None, :], comb, v)
            sh *= 2
        return v[:, :n]

    return aot_wrap(f"msm3.ladder{n}", run, deps=EC_KDEPS)


def _cgather_fn(sorted_k, perm, i1, base_sh, acc_s):
    """Gather the bucket-end prefixes of every batch from the HALF-depth
    prefix array i1 (S/2, 3L, B*M//... node q = lane*(S/2) + s).

    Per batch the telescoped sum cancels across batch boundaries:
    result_b = m*P[end_b] - sum_c P[e_c(b)]  with GLOBAL prefixes P,
    where e_c(b) = last sorted index with key <= b*NUM_BUCKETS + c and
    end_b = e_m(b) -- contributions from earlier batches appear m times
    in both terms.  Leaf-level prefixes come from the 2-node level plus a
    correction gathered straight from the shifted basis:  P[2j+1] =
    I1[j],  P[2j] = I1[j] - point(perm[2j+1]).  Returns the
    (B*128, 3L, 128) reduction layout (per batch: 8191 node values, 8191
    corrections, 2 identity pads -- point addition is commutative, so
    corrections reduce alongside values) and the (3L, B) totals."""
    spec = f8.FQ8
    nb = acc_s.shape[-1]
    m = NUM_BUCKETS - 1
    per = base_sh.shape[-1]
    nq = nb * m + nb
    base = jnp.arange(nb, dtype=jnp.int32)[:, None] * NUM_BUCKETS
    q_buckets = (base + jnp.arange(m, dtype=jnp.int32)[None, :]).reshape(-1)
    q_end = base[:, 0] + m
    queries = jnp.concatenate([q_buckets, q_end])
    pos = jnp.searchsorted(sorted_k, queries, side="right") - 1
    ok = pos >= 0
    pos_c = jnp.maximum(pos, 0)
    half = pos_c // 2
    s2 = S // 2
    vals = i1[half % s2, :, half // s2]                    # (Q, 3L)
    vals = jnp.transpose(vals, (1, 0))                     # (3L, Q)
    vals = jnp.where(ok[None, :], vals, _ident_cols(nq))
    # corrections at even positions: -point at sorted position pos+1
    # (always in range: the last sorted index B*W*N-1 is odd)
    cpt = base_sh[:, perm[pos_c + 1 - (pos_c % 2)] % per]  # (3L, Q)
    neg = jnp.concatenate([cpt[:L], -cpt[L:2 * L], cpt[2 * L:]], axis=0)
    corr_ok = ok & (pos_c % 2 == 0)
    corr = jnp.where(corr_ok[None, :], neg, _ident_cols(nq))

    totals = _xadd(vals[:, nb * m:], corr[:, nb * m:], spec)
    bv = vals[:, :nb * m].reshape(L3, nb, m)
    bc = corr[:, :nb * m].reshape(L3, nb, m)
    pad = jnp.broadcast_to(_ident_cols(nb)[:, :, None], (L3, nb, 2))
    seg = nb * 2 * (m + 1)
    v = jnp.concatenate([bv, bc, pad], axis=2).reshape(L3, seg)
    t = jnp.transpose(v.reshape(L3, seg // 128, 128), (1, 0, 2))
    return t, totals


_k_cgather = aot_wrap("msm3.cgather", _cgather_fn, deps=EC_KDEPS)


def _ctail_fn(red, acc_s, acc_t, totals):
    """Fold the last (B, 3L, 128) reduction rows and accumulate:
    acc_s += per-batch sum of gathered prefixes, acc_t += P[end_b]."""
    spec = f8.FQ8
    r = jnp.transpose(red, (1, 0, 2))                      # (3L, B, 128)
    h = r.shape[-1] // 2
    while h >= 1:
        r = _xadd(r[:, :, :h], r[:, :, h:2 * h], spec)
        h //= 2
    return (_xadd(acc_s, r[:, :, 0], spec),
            _xadd(acc_t, totals, spec))


_k_ctail = aot_wrap("msm3.ctail", _ctail_fn, deps=EC_KDEPS)


def _k_collect(t, acc_s, acc_t, totals):
    """Collect tail: `_up_call` pairwise reductions + `_k_ctail`.  (A fused
    one-dispatch version was tried in round 3 and abandoned: the unrolled
    log-tree's ~16 inlined add bodies OOM-killed the remote compile helper
    at B=4, and a rolled fori variant would serialize ~255 adds at the
    ~0.5 ms/step scan latency.  The dispatch chain pipelines fine.)"""
    nb = acc_s.shape[-1]
    while t.shape[0] > nb:
        t = _up_call(t.shape[0] // 2, 128)(t)
    return _k_ctail(t, acc_s, acc_t, totals)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _chunk_run(scs, base_sh, acc_s, acc_t):
    """One CRS chunk, B batched MSMs: sort+gather, prefix tree, bucket-end
    collect.  Stage-granular AOT dispatches pipelined on the device
    stream (see `_tree` for why this is not one fused jit)."""
    sorted_k, perm, leaves = _k_sortg(scs, base_sh)
    holder = [leaves]
    del leaves          # _tree(full=False) drops the buffer after up0
    i1 = _tree(holder.pop(), full=False)
    t, totals = _k_cgather(sorted_k, perm, i1, base_sh, acc_s)
    del i1
    return _k_collect(t, acc_s, acc_t, totals)


def _finalize_host(acc_s, acc_t):
    """Per batch column: 8191*T_b - S_b on the host (one 13-bit scalar
    mul + one add each).  Returns a list of Jacobians."""
    from ..fields.scalar import inv as sinv
    from . import curve

    nb = acc_s.shape[-1]
    cols = jnp.concatenate([acc_s, acc_t], axis=1)         # (3L, 2B)
    fm = _k_canon(cols)
    ints = [f8.limbs8_to_ints(np.asarray(fm[k * L:(k + 1) * L]))
            for k in range(3)]

    def to_jac(i):
        x, y, z = ints[0][i], ints[1][i], ints[2][i]
        if z == 0:
            return curve.Jacobian.identity(curve.Fq(1))
        zi = sinv(z, P)
        return curve.Jacobian(curve.Fq(x * zi % P), curve.Fq(y * zi % P),
                              curve.Fq(1))

    return [to_jac(nb + b).scalar_mul(NUM_BUCKETS - 1).add(to_jac(b).neg())
            for b in range(nb)]


@jax.jit
def _k_canon(cols):
    one = np.zeros(L, np.float32)
    one[0] = 1.0
    out = [f8.lazy_to_canonical(
        f8.mont_mul_const(cols[k * L:(k + 1) * L], one, f8.FQ8), f8.FQ8)
        for k in range(3)]
    return jnp.concatenate(out, axis=0)


def msm_device(basis: msm12.DeviceBasis, scalar_chunks: list, length: int):
    """scalar_chunks: canonical (non-Montgomery) 12-bit limb chunks
    (22, CHUNK).  Returns a host `ec.curve.Jacobian`."""
    return msm_device_batch(basis, [scalar_chunks])[0]


def msm_device_batch(basis: msm12.DeviceBasis, batch_chunks: list) -> list:
    """B independent MSMs over one CRS basis, fused into one device
    dispatch per chunk (shared sort + prefix tree; B-fold lane widening).
    batch_chunks: per-MSM lists of canonical (22, CHUNK) limb chunks.
    Shorter MSMs are zero-padded: zero digits land in bucket 0, which the
    telescoped sum skips.  Returns a list of host Jacobians."""
    sh = shifted_basis(basis)
    nb = len(batch_chunks)
    nch = max(len(c) for c in batch_chunks)
    zero = None
    acc_s = _ident_cols(nb)
    acc_t = _ident_cols(nb)
    for j in range(nch):
        parts = []
        for bc in batch_chunks:
            if j < len(bc):
                parts.append(bc[j])
            else:
                if zero is None:
                    zero = jnp.zeros((22, CHUNK), jnp.int32)
                parts.append(zero)
        scs = jnp.stack(parts, axis=0)
        acc_s, acc_t = _chunk_run(scs, sh[j], acc_s, acc_t)
    return _finalize_host(acc_s, acc_t)


load_basis = msm12.load_basis
slice_basis = msm12.slice_basis
