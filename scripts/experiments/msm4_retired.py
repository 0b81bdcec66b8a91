"""RETIRED round-2 experiment (kept for the record, not importable from
the package): the fused-dispatch MSM pipeline measured 3x slower than v3
(BASELINE.md v4 post-mortem).  Moved out of quill_tpu in round 4 to keep
the AOT-cache key surface and the live kernel set tight."""

"""Device Pippenger MSM v4: whole-MSM fused pipeline, ~6 dispatches per
super-chunk.

Counterpart of arkworks `VariableBaseMSM::msm_unchecked`
(`/root/reference/pcs/src/kzg.rs:72`), fourth redesign.  The chained-op
probe (`scripts/experiments/probe_chained.py`) showed the v3 cost model was
wrong: a 2^20 sort_key_val costs ~1 ms and elementwise work is nearly free
in a pipelined stream -- v3's 1.97 s at 2^20 was almost entirely
per-dispatch overhead (~2-5 ms x ~580 AOT dispatches).  v4 keeps v3's
algebra (flat shared-bucket window space over a shifted fixed basis +
telescoped prefix-sum bucket combine) and restructures the pipeline into a
handful of fused dispatches per SUPER-chunk (several CRS chunks at once):

1. keys:     digit extraction + batch offsets, one jit
2. sort:     ONE `sort_key_val` over the whole flat space
3. gather:   ONE gather of the bf16 *affine* shifted basis into the
             (S, 2L, M) leaf layout (pos = m*S + s; lanes own contiguous
             ranges)
4. up-sweep: ONE Pallas kernel; all 8 in-lane tree levels in VMEM,
             leaf level specialized for affine (Z1=Z2=1) inputs, every
             level's nodes stored (bf16 normal form) for step 6
5. lane scan: ONE Pallas kernel; sequential-grid block ladder with a
             carried offset point -> exclusive per-lane prefixes
6. collect:  ONE jit; bucket-end positions by searchsorted, per-query
             prefix = lane_excl[lane] + tree nodes along the in-lane path
             (one gather per level, bit-masked), telescoped combine and a
             log-depth reduction to per-batch (sum, total) accumulators

Changes vs v3 that cut work besides dispatch count: the down-sweep is gone
(up-sweep only: F adds instead of ~2.7F), leaves are affine (level-0 adds
specialize to 9M+2m instead of 12M+2m; 2/3 the gather bytes at bf16), and
the bucket collect reads tree nodes directly (no half-depth correction
gathers).  Dead/padded scalars contribute digit 0, and bucket 0 cancels in
the telescoped sum, so dead basis slots are pinned to the generator (a
valid curve point) rather than the identity -- affine form has no identity.

B independent MSMs over one CRS batch into the same pipeline exactly as in
v3 (keys carry batch*NUM_BUCKETS offsets, lanes widen B-fold).
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
from . import msm3  # noqa: E402

EC_KDEPS = msm3.EC_KDEPS + ('ec/msm4.py',)

L = f8.L
L2 = 2 * L
L3 = 3 * L
CHUNK = msm12.CHUNK
WINDOW_BITS = msm12.WINDOW_BITS
NUM_WINDOWS = msm12.NUM_WINDOWS
NUM_BUCKETS = msm12.NUM_BUCKETS

S = 256                    # in-lane tree height (leaf rows per lane)
LOG2_S = 8
_MT = 512                  # lanes per up-sweep grid step: 4 sublane blocks
#                            per op (vs 1 at 128) -- the tree adds are tiny
#                            sequential ops, so sublane occupancy is the
#                            throughput lever; VMEM = ~86 MB double-buffered
_LANE_BLK = 128            # lanes per lane-scan grid step (ladder width)
_LOG2_LANE_BLK = 7

# super-chunk size: CRS chunks fused into one pipeline pass, scaled down
# for batched MSMs to bound device memory (flat bf16 leaves + node levels)
NSC = 4


# ---------------------------------------------------------------------------
# affine bf16 shifted basis (per CRS chunk, cached on the root basis)
# ---------------------------------------------------------------------------


@jax.jit
def _k_prefix_mul8(x):
    """Inclusive Montgomery-product prefix along columns of (33, n)."""
    n = x.shape[-1]
    idx = jax.lax.iota(jnp.int32, n)
    onec = jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None]
    sh = 1
    v = x
    while sh < n:
        ident = jnp.broadcast_to(onec, (L, sh))
        shifted = jnp.concatenate([ident, v[:, :-sh]], axis=1)
        comb = f8.mont_mul(v, shifted, f8.FQ8)
        v = jnp.where((idx >= sh)[None, :], comb, v)
        sh *= 2
    return v


@jax.jit
def _k_suffix_mul8(x):
    return _k_prefix_mul8(x[:, ::-1])[:, ::-1]


@jax.jit
def _k_affine_from_pref(xyz, pe, se, inv_total_mont, gen_cols):
    """inv(z_i) = excl_prefix_i * excl_suffix_i * inv_total; affine coords
    x*invz, y*invz in Montgomery bf16 normal form.  Dead slots (z == 0
    canonical) take the generator columns."""
    spec = f8.FQ8
    x, y, z = xyz[:L], xyz[L:L2], xyz[L2:]
    n = x.shape[-1]
    onec = jnp.broadcast_to(
        jnp.asarray(spec.one_mont, jnp.float32)[:, None], (L, 1))
    pe_x = jnp.concatenate([onec, pe[:, :-1]], axis=1)
    se_x = jnp.concatenate([se[:, 1:], jnp.broadcast_to(onec, (L, 1))],
                           axis=1)
    invz = f8.mont_mul(f8.mont_mul(pe_x, se_x, spec),
                       jnp.broadcast_to(inv_total_mont, (L, n)), spec)
    ax = f8.normal_form(f8.mont_mul(x, invz, spec))
    ay = f8.normal_form(f8.mont_mul(y, invz, spec))
    dead = jnp.all(f8.lazy_to_canonical(z, spec) == 0, axis=0)
    out = jnp.concatenate([ax, ay], axis=0)
    return jnp.where(dead[None, :], gen_cols, out).astype(jnp.bfloat16)


@functools.lru_cache(maxsize=1)
def _generator_cols() -> np.ndarray:
    """(2L, 1) f32 generator affine coords, Montgomery canonical limbs."""
    r_mont = (1 << f8.R_BITS) % P
    gx = 1 * r_mont % P
    gy = 2 * r_mont % P
    return np.concatenate([f8.ints_to_limbs8([gx]),
                           f8.ints_to_limbs8([gy])], axis=0)


def shifted_affine_basis(basis: msm12.DeviceBasis) -> list:
    """Per-CRS-chunk (2L, W*CHUNK) bf16 affine Montgomery shifted bases,
    cached on the ROOT basis (one normalization per chunk per process).
    One host round-trip per chunk: the single total-product inversion."""
    from ..fields.scalar import inv as sinv

    root = getattr(basis, "_root", basis)
    cache = getattr(root, "_b4_chunks", None)
    if cache is None:
        cache = {}
        root._b4_chunks = cache
    tau = getattr(root, "tau", None)
    gen_cols = jnp.asarray(_generator_cols())
    out = []
    for j in range(len(basis.x_chunks)):
        if j not in cache:
            if tau is not None:
                proj = msm3._shift_fixed_base(root, tau, j)
            else:
                proj = msm3._shift_doubling(basis, j)
            z = proj[L2:]
            # dead (z==0) slots would zero the whole product: substitute 1
            zc = f8.lazy_to_canonical(z, f8.FQ8)
            dead = jnp.all(zc == 0, axis=0)
            onec = jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None]
            z_ok = jnp.where(dead[None, :], jnp.broadcast_to(onec, z.shape),
                             z)
            pe = _k_prefix_mul8(z_ok)
            se = _k_suffix_mul8(z_ok)
            total = np.asarray(f8.from_mont(pe[:, -1:], f8.FQ8))
            tot_int = f8.limbs8_to_ints(total)[0]
            inv_int = sinv(tot_int, P) * ((1 << f8.R_BITS) % P) % P
            inv_mont = jnp.asarray(f8.ints_to_limbs8([inv_int]))
            cache[j] = _k_affine_from_pref(proj, pe, se, inv_mont, gen_cols)
            del proj
        out.append(cache[j])
    return out


# ---------------------------------------------------------------------------
# keys + sort + gather
# ---------------------------------------------------------------------------


def _keys_fn(scs):
    """(B, nsc, 22, CHUNK) canonical limbs -> (B*nsc*W*CHUNK,) int32 keys
    ordered (b, c, w, i), key = b*NUM_BUCKETS + digit."""
    nb, nsc = scs.shape[0], scs.shape[1]
    digits = jax.vmap(jax.vmap(msm12._extract_digits))(scs)  # (B,nsc,W,N)
    keys = (digits
            + (jnp.arange(nb, dtype=jnp.int32) * NUM_BUCKETS)[:, None, None,
                                                              None])
    return keys.reshape(-1)


def _sortg_fn(keys, base_cat):
    """Sort keys; gather bf16 affine leaf array (S, 2L, M) in pos = m*S + s
    order.  base_cat: (2L, nsc*W*CHUNK) bf16 (chunk-major, matching the
    (c, w, i) flat order of the keys within one batch)."""
    per = base_cat.shape[-1]
    iota = jax.lax.iota(jnp.int32, keys.shape[0])
    sorted_k, perm = jax.lax.sort_key_val(keys, iota)
    m_total = keys.shape[0] // S
    perm_t = (perm % per).reshape(m_total, S).T           # (S, M)
    g = base_cat[:, perm_t.reshape(-1)]                   # (2L, S*M)
    leaves = jnp.transpose(g.reshape(L2, S, m_total), (1, 0, 2))
    return sorted_k, perm, leaves


_k_keys = aot_wrap("msm4.keys", _keys_fn, deps=EC_KDEPS)
_k_sortg = aot_wrap("msm4.sortg", _sortg_fn, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# fused up-sweep kernel
# ---------------------------------------------------------------------------


def _split3(v):
    return v[:L], v[L:L2], v[L2:]


def _affine_add_emit(a1, a2, spec):
    """Complete addition with Z1 = Z2 = 1 (RCB15 alg 7 specialized):
    t2 = 1, (Y1+Z1)(Y2+Z2)-t1-t2 = Y1+Y2, (X1+Z1)(X2+Z2)-t0-t2 = X1+X2.
    9 full muls + 2 small muls."""
    X1, Y1 = a1
    X2, Y2 = a2
    add = lambda a, b: f8.add(a, b, spec)
    sub = lambda a, b: f8.sub(a, b, spec)
    mul = lambda a, b: f8.mont_mul(a, b, spec)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = sub(sub(mul(add(X1, Y1), add(X2, Y2)), t0), t1)
    t4 = add(Y1, Y2)
    w = add(X1, X2)

    t0_3 = p8._small_mul(t0, 3, spec)
    # b3 * Z1 * Z2 = 9 in Montgomery form, embedded as python-scalar fulls
    # (Pallas kernels cannot capture array constants)
    nine = f8.int_to_limbs8(9 * ((1 << f8.R_BITS) % P) % P)
    t2_9 = jnp.stack([jnp.full(X1.shape[1:], float(nine[i]), jnp.float32)
                      for i in range(L)], axis=0)
    z3p = add(t1, t2_9)
    t1p = sub(t1, t2_9)
    y3m = p8._small_mul(w, 9, spec)

    X3 = sub(mul(t3, t1p), mul(t4, y3m))
    Y3 = add(mul(t1p, z3p), mul(y3m, t0_3))
    Z3 = add(mul(z3p, t4), mul(t0_3, t3))
    return X3, Y3, Z3


def _r3(v, rows, mt):
    """Row read -> 3D (rows, mt//128, 128) f32 tile when lane-aligned."""
    if mt % 128 == 0:
        return v.reshape(rows, mt // 128, 128)
    return v


def _up_fused_kernel(modulus, mt, c_ref, lv_ref, *out_refs):
    """leaves (S, 2L, mt) bf16 -> level outputs out_k (S>>(k+1), 3L, mt)
    bf16 normal form, k = 0..7.  Level k reads level k-1's bf16 output
    (normal-form round trips are exact), so no f32 scratch is needed and
    VMEM holds leaves + all level blocks (~11 MB at mt=128)."""
    spec = p8.unpack_spec(modulus, c_ref[:])

    def body0(s, carry):
        a = _r3(lv_ref[2 * s].astype(jnp.float32), L2, mt)
        b = _r3(lv_ref[2 * s + 1].astype(jnp.float32), L2, mt)
        X3, Y3, Z3 = _affine_add_emit((a[:L], a[L:]), (b[:L], b[L:]), spec)
        nf = f8.normal_form(jnp.concatenate([X3, Y3, Z3], axis=0))
        out_refs[0][pl.ds(s, 1)] = nf.reshape(1, L3, mt).astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, S // 2, body0, 0)

    for k in range(1, LOG2_S):
        def body(s, carry, k=k):
            a = _split3(_r3(out_refs[k - 1][2 * s].astype(jnp.float32),
                            L3, mt))
            b = _split3(_r3(out_refs[k - 1][2 * s + 1].astype(jnp.float32),
                            L3, mt))
            X3, Y3, Z3 = p8.emit_pt_add(a, b, spec)
            nf = f8.normal_form(jnp.concatenate([X3, Y3, Z3], axis=0))
            out_refs[k][pl.ds(s, 1)] = (
                nf.reshape(1, L3, mt).astype(jnp.bfloat16))
            return carry

        jax.lax.fori_loop(0, S >> (k + 1), body, 0)


@functools.lru_cache(maxsize=None)
def _up_fused_call(m_len: int):
    pack = p8.consts_pack(f8.FQ8.modulus)
    mt = min(_MT, m_len)
    grid = (m_len // mt,)
    in_spec = pl.BlockSpec((S, L2, mt), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((S >> (k + 1), L3, mt), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
                 for k in range(LOG2_S)]
    out_shapes = [jax.ShapeDtypeStruct((S >> (k + 1), L3, m_len),
                                       jnp.bfloat16)
                  for k in range(LOG2_S)]

    def run(leaves):
        return pl.pallas_call(
            functools.partial(_up_fused_kernel, f8.FQ8.modulus, mt),
            out_shape=out_shapes,
            grid=grid,
            in_specs=[pl.BlockSpec((p8._PACK_ROWS, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM), in_spec],
            out_specs=out_specs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=p8._interpret(),
        )(pack, leaves)

    return aot_wrap(f"msm4.up{m_len}", run, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# lane scan kernel: exclusive per-lane prefixes with a carried offset
# ---------------------------------------------------------------------------


def _xadd3(a, b, spec, n):
    """Stacked (3L, n) complete add; 3D-tiled when n is lane-aligned (the
    2D layout uses 1 of 8 sublanes -- ~5x slower on the VPU)."""
    if n % 128 == 0 and n >= 128:
        a3 = a.reshape(L3, n // 128, 128)
        b3 = b.reshape(L3, n // 128, 128)
        out = p8.emit_pt_add(_split3(a3), _split3(b3), spec)
        return jnp.concatenate(out, axis=0).reshape(L3, n)
    out = p8.emit_pt_add(_split3(a), _split3(b), spec)
    return jnp.concatenate(out, axis=0)


@functools.lru_cache(maxsize=1)
def _shift_mats() -> np.ndarray:
    """(LOG2_LANE_BLK + 1, blk, blk) stacked 0/1 matrices: for t < 7,
    y = x @ M[t] moves column j to column j + 2^t (columns < 2^t land on
    zero); M[7] broadcasts the LAST column to every lane.  One-hot rows
    with f32 accumulation keep the products exact for normal-form bf16
    limb inputs (same MXU trick as sumcheck8's parity split).  These also
    replace the kernel's column concats/offset slices, which Mosaic
    rejects ("result/input offset mismatch on non-concat dimension")."""
    blk = _LANE_BLK
    mats = np.zeros((_LOG2_LANE_BLK + 1, blk, blk), dtype=np.float32)
    for t in range(_LOG2_LANE_BLK):
        sh = 1 << t
        for j in range(blk - sh):
            mats[t, j, j + sh] = 1.0
    mats[_LOG2_LANE_BLK, blk - 1, :] = 1.0
    return mats


def _lane_scan_kernel(c_ref, m_ref, t_ref, o_ref, sv):
    """Lane totals (3L, blk) bf16 per grid step -> exclusive prefixes
    (3L, blk) bf16; scratch (3L, 1-tile) carries the running offset point
    across sequential grid steps.

    The inclusive ladder is a `fori_loop` whose body shifts via the stacked
    0/1 matrices (m_ref) on the MXU -- ONE traced point-add body instead of
    log2(blk) unrolled ones (the unrolled form produced a 9 MB StableHLO
    module that OOM-killed the remote TPU compile helper)."""
    spec = p8.unpack_spec(f8.FQ8.modulus, c_ref[:])
    blk = _LANE_BLK
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        zero = jnp.zeros((L, 1, 128), jnp.float32)
        one = jnp.stack([jnp.full((1, 128), float(f8.FQ8.one_mont[i]),
                                  jnp.float32) for i in range(L)], axis=0)
        sv[:] = jnp.concatenate([zero, one, zero], axis=0)

    def ident_flat(n):
        zero = jnp.zeros((L, n), jnp.float32)
        one = jnp.stack([jnp.full((n,), float(f8.FQ8.one_mont[i]),
                                  jnp.float32) for i in range(L)], axis=0)
        return jnp.concatenate([zero, one, zero], axis=0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    ident = ident_flat(blk)

    def ladder(t, incl):
        # shifted[:, j] = incl[:, j - 2^t] for j >= 2^t, identity below
        nf = f8.normal_form(incl).astype(jnp.bfloat16)
        moved = jnp.dot(nf, m_ref[t], preferred_element_type=jnp.float32)
        shifted = jnp.where(lane < (1 << t), ident, moved)
        return _xadd3(incl, shifted, spec, blk)

    incl = jax.lax.fori_loop(0, _LOG2_LANE_BLK, ladder,
                             t_ref[:].astype(jnp.float32))

    # exclusive shift (shift-by-1 = ladder matrix 0) + carried offset
    nf_incl = f8.normal_form(incl).astype(jnp.bfloat16)
    moved1 = jnp.dot(nf_incl, m_ref[0], preferred_element_type=jnp.float32)
    excl = jnp.where(lane < 1, ident, moved1)
    off_b = jnp.broadcast_to(sv[:][:, 0, 0:1], (L3, blk))
    with_off = _xadd3(excl, off_b, spec, blk)
    o_ref[:] = f8.normal_form(with_off).astype(jnp.bfloat16)

    # update carry: offset += block total, via the broadcast-last matrix
    # (every lane of the scratch holds the same point)
    last_b = jnp.dot(nf_incl, m_ref[_LOG2_LANE_BLK],
                     preferred_element_type=jnp.float32)
    new_off = _xadd3(off_b, last_b, spec, blk)
    sv[:] = new_off.reshape(L3, 1, blk)


@functools.lru_cache(maxsize=None)
def _lane_scan_call(m_len: int):
    pack = p8.consts_pack(f8.FQ8.modulus)
    blk = _LANE_BLK
    assert m_len % blk == 0
    grid = (m_len // blk,)
    spec = pl.BlockSpec((L3, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((_LOG2_LANE_BLK + 1, blk, blk),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    def run(totals):
        return pl.pallas_call(
            _lane_scan_kernel,
            out_shape=jax.ShapeDtypeStruct((L3, m_len), jnp.bfloat16),
            grid=grid,
            in_specs=[pl.BlockSpec((p8._PACK_ROWS, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM), mspec, spec],
            out_specs=spec,
            scratch_shapes=[pltpu.VMEM((L3, 1, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=p8._interpret(),
        )(pack, jnp.asarray(_shift_mats()).astype(jnp.bfloat16), totals)

    return aot_wrap(f"msm4.lanescan{m_len}", run, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# collect: bucket-end queries via tree-path gathers + telescoped combine
# ---------------------------------------------------------------------------


def _xadd(a, b, spec):
    out = p8.emit_pt_add(_split3(a), _split3(b), spec)
    return jnp.concatenate(out, axis=0)


def _collect_fn(sorted_k, perm, base_cat, lane_excl, levels, acc_s, acc_t):
    """Gather the telescoped bucket-end prefix for every (batch, bucket)
    query and fold into the (3L, B) accumulators.

    P[pos] (inclusive prefix of the first pos+1 sorted elements) =
      lane_excl[lane] + sum over set bits k of r (r = pos%S + 1):
        k = 0  -> the sorted LEAF at flat position (lane*S + (r & ~1)),
                  fetched straight from the shifted basis via perm;
        k >= 1 -> level (k-1) node (r >> k is odd; index (r >> k) // 2).

    Control flow is rolled (lax.map over batches, lax.scan over tree
    levels and over the bucket reduction) so the program holds ~5 traced
    point-add bodies: the fully-unrolled version inflated to ~700k HLO
    instructions after call inlining, which the remote TPU compile helper
    could not hold in memory (SIGKILL)."""
    spec = f8.FQ8
    nb = acc_s.shape[-1]
    m = NUM_BUCKETS - 1
    per = base_cat.shape[-1]
    nq = NUM_BUCKETS  # per batch: buckets 0..m-1, then b = m == E_m (total)

    # flatten the level arrays: row offset of level k-1 in the 255-row pack
    lvl_flat = jnp.concatenate(
        [lv for lv in levels], axis=0)           # (255, 3L, m_len)
    offs = []
    o = 0
    for k in range(LOG2_S):
        offs.append(o)
        o += S >> (k + 1)
    lvl_offs = jnp.asarray(offs, dtype=jnp.int32)           # (8,)
    shifts = jnp.arange(1, LOG2_S + 1, dtype=jnp.int32)     # k = 1..8

    one = jnp.broadcast_to(
        jnp.asarray(spec.one_mont, jnp.float32)[:, None], (L, nq))
    ident = msm3._ident_cols(nq)

    def per_batch(bi):
        q = bi * NUM_BUCKETS + jax.lax.iota(jnp.int32, nq)
        pos = jnp.searchsorted(sorted_k, q, side="right") - 1
        ok = pos >= 0
        pos_c = jnp.maximum(pos, 0)
        lane = pos_c // S
        r = pos_c % S + 1

        acc = lane_excl[:, lane].astype(jnp.float32)

        # leaf contribution (bit 0 of r)
        leaf_flat = lane * S + (r & ~1)
        lp = perm[leaf_flat] % per
        lxy = base_cat[:, lp].astype(jnp.float32)
        leaf_pt = jnp.concatenate([lxy[:L], lxy[L:], one], axis=0)
        use = (r & 1) == 1
        acc = _xadd(acc, jnp.where(use[None, :], leaf_pt, ident), spec)

        # level nodes (bits 1..8 of r): the aligned block for bit k starts
        # at a = (r >> (k+1)) << (k+1) -> level-(k-1) node index a / 2^k
        def level_step(acc, ko):
            k, off = ko
            idx = off + (r >> (k + 1)) * 2
            node = lvl_flat[idx, :, lane].T.astype(jnp.float32)
            use = ((r >> k) & 1) == 1
            return _xadd(acc, jnp.where(use[None, :], node, ident),
                         spec), 0

        acc, _ = jax.lax.scan(level_step, acc, (shifts, lvl_offs))
        return jnp.where(ok[None, :], acc, ident)            # (3L, nq)

    vals = jax.lax.map(per_batch, jnp.arange(nb, dtype=jnp.int32))
    vals = jnp.transpose(vals, (1, 0, 2))                    # (3L, nb, nq)

    totals = vals[:, :, m]                                   # (3L, nb)
    # bucket-prefix sum: mask the b = m slot to identity, then a two-stage
    # rolled reduction (64x128 block scan, then 128-column scan)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nq), 2)
    ident_nb1 = jnp.broadcast_to(msm3._ident_cols(nb)[:, :, None],
                                 (L3, nb, nq))
    bv = jnp.where(col == m, ident_nb1, vals)
    g = nq // 128
    bv4 = jnp.moveaxis(bv.reshape(L3, nb, g, 128), 2, 0)     # (g, 3L, nb, 128)

    def sum_step(acc, x):
        return _xadd(acc, x, spec), 0

    acc128, _ = jax.lax.scan(sum_step, ident_nb1[:, :, :128], bv4)
    cols = jnp.moveaxis(acc128, 2, 0)                        # (128, 3L, nb)
    red, _ = jax.lax.scan(sum_step, msm3._ident_cols(nb), cols)
    return (_xadd(acc_s, red, spec),
            _xadd(acc_t, totals, spec))


_k_collect = aot_wrap("msm4.collect", _collect_fn, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def msm_device(basis: msm12.DeviceBasis, scalar_chunks: list, length: int):
    return msm_device_batch(basis, [scalar_chunks])[0]


def msm_device_batch(basis: msm12.DeviceBasis, batch_chunks: list) -> list:
    """B independent MSMs over one CRS basis.  Super-chunks of
    NSC//ceil(B/..) CRS chunks run the 6-dispatch fused pipeline; per-batch
    (sum, total) accumulators combine across super-chunks; one host
    finalize (`msm3._finalize_host`).

    Shape standardization: every TPU kernel here costs minutes of (cached)
    compile per distinct shape, so the pipeline only ever runs TWO shape
    families -- (nb=1, nsc=NSC) and (nb=NSC, nsc=1), both with
    NSC*W*CHUNK/S lanes.  Batches are padded to NSC MSMs with empty
    scalar lists and chunk counts round up to a multiple of nsc; padding
    scalars are zero, land in bucket 0 and cancel in the telescoped
    combine, and padded chunk slots reuse shifted-basis chunk 0 as an
    inert dummy."""
    sh = shifted_affine_basis(basis)
    true_nb = len(batch_chunks)
    if true_nb > 1 and true_nb < NSC:
        batch_chunks = batch_chunks + [[]] * (NSC - true_nb)
    nb = len(batch_chunks)
    nsc = max(1, NSC // max(1, nb))
    nch = max(len(c) for c in batch_chunks)
    nch = max(nsc, -(-nch // nsc) * nsc)
    zero = None
    acc_s = msm3._ident_cols(nb)
    acc_t = msm3._ident_cols(nb)
    for j0 in range(0, nch, nsc):
        js = list(range(j0, min(j0 + nsc, nch)))
        parts = []
        for bc in batch_chunks:
            for j in js:
                if j < len(bc):
                    parts.append(bc[j])
                else:
                    if zero is None:
                        zero = jnp.zeros((22, CHUNK), jnp.int32)
                    parts.append(zero)
        scs = jnp.stack(parts, axis=0).reshape(nb, len(js), 22, CHUNK)
        base_cat = jnp.concatenate(
            [sh[j] if j < len(sh) else sh[0] for j in js], axis=1)
        keys = _k_keys(scs)
        sorted_k, perm, leaves = _k_sortg(keys, base_cat)
        levels = _up_fused_call(leaves.shape[-1])(leaves)
        lane_excl = _lane_scan_call(leaves.shape[-1])(
            levels[-1].reshape(L3, -1))
        acc_s, acc_t = _k_collect(sorted_k, perm, base_cat, lane_excl,
                                  levels, acc_s, acc_t)
    return msm3._finalize_host(acc_s, acc_t)[:true_nb]


load_basis = msm12.load_basis
slice_basis = msm12.slice_basis
