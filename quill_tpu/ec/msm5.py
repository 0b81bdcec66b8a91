"""Device Pippenger MSM v5: the v3 prefix-tree algebra over a bf16 AFFINE
shifted basis.

Counterpart of arkworks `VariableBaseMSM::msm_unchecked`
(`/root/reference/pcs/src/kzg.rs:72`).  v3 (`ec/msm3.py`) established the
flat-window prefix-tree pipeline; its round-2 profile shows the chunk cost
split between the tree adds and the sort+gather, with the gather moving
(3L, W*N) float32 PROJECTIVE points -- 396 B per flat element.  v5 keeps the
tree algebra bit-for-bit and changes the data:

1. **Affine, bf16 basis.** The shifted basis is batch-normalized to affine
   once per CRS chunk (prefix/suffix Fq product scans + ONE host inversion,
   reusing `ec/fixed_base._batch_normalize`) and stored as (2L, W*N)
   bfloat16 normal-form limbs -- 132 B per element, exactly representable
   (normal-form limbs lie in [0, 255]; `fields/device8.normal_form`).  The
   sort gather therefore moves 3x fewer bytes.

2. **Affine-affine first tree level.** With Z1 = Z2 = 1 the RCB15 complete
   addition collapses: t2 = 1, t4 = Y1+Y2 and w = X1+X2 come free, so the
   leaf-pair level (HALF of all up-sweep adds) runs 9 field muls instead of
   12.  Completeness is preserved (the formulas are valid for any curve
   points; affine inputs are just Z=1).

3. **Identity points** cannot be represented affinely: basis points at
   infinity are substituted with the GENERATOR and their window digits
   forced to 0 at sort time.  A digit-0 element has coefficient 0 in the
   telescoped bucket sum (it appears once in each of the m subtracted
   prefixes and m times in m*P[end]), so any curve-point stand-in is
   algebraically invisible -- this also covers zero-padded scalar batches.

Everything downstream of the leaf level (projective up/down sweeps, lane
prefix, bucket-end collect, host finalize) is shared with v3.
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
from . import msm as msm12  # noqa: E402
from . import msm3  # noqa: E402

EC_KDEPS = msm3.EC_KDEPS + ('ec/msm5.py',)

from ..utils.aotcache import aot_wrap  # noqa: E402

L = f8.L
L2 = 2 * L
L3 = 3 * L
CHUNK = msm3.CHUNK
WINDOW_BITS = msm3.WINDOW_BITS
NUM_WINDOWS = msm3.NUM_WINDOWS
NUM_BUCKETS = msm3.NUM_BUCKETS
S = msm3.S
M = msm3.M


# ---------------------------------------------------------------------------
# affine bf16 shifted basis
# ---------------------------------------------------------------------------


@jax.jit
def _k_affpair_to_b16(x12, y12):
    """12-bit lazy Montgomery affine coords -> (2L, N) bf16 canonical."""
    from ..fields import device as fd12

    x8 = f8.from12(fd12.lazy_to_canonical(x12, fd12.FQ))
    y8 = f8.from12(fd12.lazy_to_canonical(y12, fd12.FQ))
    return jnp.concatenate([x8, y8], axis=0).astype(jnp.bfloat16)


@jax.jit
def _k_8stacked_to12(stacked):
    """(3L, N) stacked 8-bit lazy mont projective -> three (22, N) int32
    12-bit mont arrays (for the 12-bit batch-normalize kernels)."""
    outs = []
    for k in range(3):
        c = f8.lazy_to_canonical(stacked[k * L:(k + 1) * L], f8.FQ8)
        outs.append(f8.to12(c))
    return tuple(outs)


def _gen_affine_b16(root, j: int) -> jnp.ndarray:
    """(2L, W*N) bf16 affine shifted chunk."""
    from . import fixed_base as fb

    tau = getattr(root, "tau", None)
    if tau is not None:
        from ..fields.bn254 import R as FR_MOD
        from ..fields import device as fd12
        from ..fields.limbs import ints_to_limbs

        pw_mont = getattr(root, "_b3_pw_mont", None)
        if pw_mont is None:
            powers = [1] * CHUNK
            for i in range(1, CHUNK):
                powers[i] = powers[i - 1] * tau % FR_MOD
            pw = jnp.asarray(ints_to_limbs(powers))
            pw_mont = fd12.to_mont(pw, fd12.FR)
            root._b3_pw_mont = pw_mont
        jt = msm3._fb_table()
        base_c = pow(tau, j * CHUNK, FR_MOD)
        wins = []
        for w in range(NUM_WINDOWS):
            c = (pow(2, WINDOW_BITS * w, FR_MOD) * base_c) % FR_MOD
            c_mont = jnp.asarray(ints_to_limbs(
                [c * pow(2, fd12.R_BITS, FR_MOD) % FR_MOD]))
            sc = msm3._k_scale_canon(pw_mont, c_mont)
            wins.append(fb._k_fixed_base_chunk(sc, *jt))
    else:
        # arbitrary basis: doubling ladders (8-bit), identity points
        # substituted with the generator (digits are zeroed at sort time)
        stacked = msm3._shift_doubling(root, j)        # (3L, W*N), inf=ident
        inf = root.inf_chunks[j]
        if bool(np.asarray(jnp.any(inf))):
            from . import curve

            g = curve.g1_generator().to_affine()
            gx = jnp.asarray(f8.int_to_limbs8(
                g.x.v * pow(2, f8.R_BITS, f8.FQ8.modulus) % f8.FQ8.modulus)
            )[:, None]
            gy = jnp.asarray(f8.int_to_limbs8(
                g.y.v * pow(2, f8.R_BITS, f8.FQ8.modulus) % f8.FQ8.modulus)
            )[:, None]
            gz = jnp.asarray(f8.FQ8.one_mont)[:, None]
            gpt = jnp.concatenate([
                jnp.broadcast_to(gx, (L, stacked.shape[-1])),
                jnp.broadcast_to(gy, (L, stacked.shape[-1])),
                jnp.broadcast_to(gz, (L, stacked.shape[-1]))], axis=0)
            mask = jnp.tile(inf, NUM_WINDOWS)[None, :]
            stacked = jnp.where(mask, gpt, stacked)
        wins = [_k_8stacked_to12(stacked[:, w * CHUNK:(w + 1) * CHUNK])
                for w in range(NUM_WINDOWS)]
    norm = fb._batch_normalize([tuple(w) for w in wins])
    return jnp.concatenate([_k_affpair_to_b16(x, y) for x, y in norm],
                           axis=1)


def shifted_basis_affine(basis: msm12.DeviceBasis) -> list:
    """Per-chunk (2L, W*N) bf16 affine shifted bases, cached on the root."""
    root = getattr(basis, "_root", basis)
    cache = getattr(root, "_b5_chunks", None)
    if cache is None:
        cache = {}
        root._b5_chunks = cache
    out = []
    for j in range(len(basis.x_chunks)):
        if j not in cache:
            cache[j] = _gen_affine_b16(root, j)
        out.append(cache[j])
    return out


# ---------------------------------------------------------------------------
# sort + gather (bf16 leaves, inf-masked digits)
# ---------------------------------------------------------------------------


def _sort_gather(scs, base_b16, inf):
    """(B, 22, N) canonical scalars + (2L, W*N) bf16 affine basis + (N,)
    bool inf mask -> (sorted keys, perm, leaves (S, 2L, B*M) bf16)."""
    nb = scs.shape[0]
    digits = jax.vmap(msm12._extract_digits)(scs)          # (B, W, N)
    digits = jnp.where(inf[None, None, :], 0, digits)
    per = digits.shape[1] * digits.shape[2]
    keys = (digits.reshape(nb, per)
            + (jnp.arange(nb, dtype=jnp.int32) * NUM_BUCKETS)[:, None]
            ).reshape(-1)
    iota = jax.lax.iota(jnp.int32, keys.shape[0])
    sorted_k, perm = jax.lax.sort_key_val(keys, iota)
    mb = nb * M
    perm_t = (perm % per).reshape(mb, S).T                 # (S, MB)
    g = base_b16[:, perm_t.reshape(-1)]                    # (2L, S*MB)
    leaves = jnp.transpose(g.reshape(L2, S, mb), (1, 0, 2))
    return sorted_k, perm, leaves


_k_sortg = aot_wrap("msm5.sortg", _sort_gather, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# affine-affine complete addition (Z1 = Z2 = 1) + the leaf-pair kernel
# ---------------------------------------------------------------------------


def emit_pt_add_aff(p1: tuple, p2: tuple, spec) -> tuple:
    """(X1, Y1) + (X2, Y2) -> projective (X3, Y3, Z3), complete.  RCB15
    algorithm 7 (a=0, b3=9) specialized to Z1 = Z2 = 1: t2 = 1 so
    t4 = Y1+Y2 and w = X1+X2 come free; 9 full muls + 2 small muls
    (vs 12 + 2 projective).  Inputs: normal-form limbs in [-1, 256]."""
    X1, Y1 = p1
    X2, Y2 = p2
    add = lambda a, b: f8.add(a, b, spec)                  # noqa: E731
    sub = lambda a, b: f8.sub(a, b, spec)                  # noqa: E731
    mul = lambda a, b: f8.mont_mul(a, b, spec)             # noqa: E731

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    # |limb| <= 512 < 640: raw sums feed the multiplier without a reduce
    t3 = sub(sub(mul(X1 + Y1, X2 + Y2), t0), t1)
    t4 = Y1 + Y2
    w = X1 + X2

    t0_3 = p8._small_mul(t0, 3, spec)
    c9 = _c9_like(t1, spec)
    z3p = add(t1, c9)
    t1p = sub(t1, c9)
    y3m = p8._small_mul(w, 9, spec)

    X3 = sub(mul(t3, t1p), mul(t4, y3m))
    Y3 = add(mul(t1p, z3p), mul(y3m, t0_3))
    Z3 = add(mul(z3p, t4), mul(t0_3, t3))
    return X3, Y3, Z3


@functools.lru_cache(maxsize=None)
def _c9_limbs(modulus: int) -> np.ndarray:
    m9 = 9 * pow(2, f8.R_BITS, modulus) % modulus
    return f8.int_to_limbs8(m9)


def _c9_like(x, spec):
    limbs = _c9_limbs(spec.modulus)
    return jnp.stack([jnp.full(x.shape[1:], float(limbs[i]), jnp.float32)
                      for i in range(L)], axis=0)


def _split2(v):
    return v[:L], v[L:]


def _up0_kernel(modulus, rs, c_ref, x_ref, o_ref):
    """Leaf level: o[j] = leaf[2j] + leaf[2j+1], affine bf16 -> proj f32."""
    spec = p8.unpack_spec(modulus, c_ref[:])
    for j in range(rs):
        va = x_ref[2 * j].astype(jnp.float32)
        vb = x_ref[2 * j + 1].astype(jnp.float32)
        mt = va.shape[-1]
        a = _split2(va.reshape(L2, mt // 128, 128))
        b = _split2(vb.reshape(L2, mt // 128, 128))
        out = emit_pt_add_aff(a, b, spec)
        o = jnp.concatenate(out, axis=0)
        o_ref[j] = o.reshape(L3, mt)


@functools.lru_cache(maxsize=None)
def _up0_call(k_out: int, m_len: int):
    pack = p8.consts_pack(f8.FQ8.modulus)
    rs = 1
    mt = min(msm3._MT, m_len)
    grid = (k_out // rs, m_len // mt)
    in_spec = pl.BlockSpec((2 * rs, L2, mt), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rs, L3, mt), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    def run(x):
        return pl.pallas_call(
            functools.partial(_up0_kernel, f8.FQ8.modulus, rs),
            out_shape=jax.ShapeDtypeStruct((k_out, L3, m_len), jnp.float32),
            grid=grid,
            in_specs=[msm3._consts_spec2(), in_spec],
            out_specs=out_spec,
            interpret=p8._interpret(),
        )(pack, x)

    return aot_wrap(f"msm5.up0.{k_out}x{m_len}", run, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# tree: affine leaf level + shared v3 projective levels
# ---------------------------------------------------------------------------


def _tree5(leaves):
    """Prefix tree over (S, 2L, M0) bf16 affine leaves, stopping the
    down-sweep at the 2-node level (msm3 `_tree(full=False)` semantics) --
    leaf-level prefixes are derived in the collect with a gathered affine
    correction.  Small levels (<= 16 rows) run fused (`_k_treetop_up/down`,
    one dispatch each).  Returns i1 (S/2, 3L, M0) f32."""
    x = _up0_call(leaves.shape[0] // 2, leaves.shape[-1])(leaves)
    del leaves
    levels = []            # down inputs: 32-row level and up (2-node stop)
    while x.shape[0] > 16:
        levels.append(x)
        x = msm3._up_call(x.shape[0] // 2, x.shape[-1])(x)
    packed = msm3._k_treetop_up(x)
    lane_incl = msm3._prefix_cols(packed[14])
    i_arr = msm3._k_treetop_down(lane_incl, x, packed)
    for lvl in reversed(levels):
        i_arr = msm3._down_call(i_arr.shape[0], i_arr.shape[-1])(i_arr, lvl)
    return i_arr


def _cgather_fn(sorted_k, perm, i1, base_b16, acc_s):
    """msm3 `_cgather_fn` with corrections gathered from the AFFINE bf16
    basis: corr = (x, -y, 1) at sorted position pos+1 for even pos."""
    spec = f8.FQ8
    nb = acc_s.shape[-1]
    m = NUM_BUCKETS - 1
    per = base_b16.shape[-1]
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
    vals = jnp.where(ok[None, :], vals, msm3._ident_cols(nq))
    cxy = base_b16[:, perm[pos_c + 1 - (pos_c % 2)] % per].astype(jnp.float32)
    ones = jnp.broadcast_to(
        jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None], (L, nq))
    neg = jnp.concatenate([cxy[:L], -cxy[L:], ones], axis=0)
    corr_ok = ok & (pos_c % 2 == 0)
    corr = jnp.where(corr_ok[None, :], neg, msm3._ident_cols(nq))

    totals = msm3._xadd(vals[:, nb * m:], corr[:, nb * m:], spec)
    bv = vals[:, :nb * m].reshape(L3, nb, m)
    bc = corr[:, :nb * m].reshape(L3, nb, m)
    pad = jnp.broadcast_to(msm3._ident_cols(nb)[:, :, None], (L3, nb, 2))
    seg = nb * 2 * (m + 1)
    v = jnp.concatenate([bv, bc, pad], axis=2).reshape(L3, seg)
    t = jnp.transpose(v.reshape(L3, seg // 128, 128), (1, 0, 2))
    return t, totals


_k_cgather = aot_wrap("msm5.cgather", _cgather_fn, deps=EC_KDEPS)


# ---------------------------------------------------------------------------
# driver (mirrors msm3)
# ---------------------------------------------------------------------------


def _chunk_run(scs, base_b16, inf, acc_s, acc_t):
    sorted_k, perm, leaves = _k_sortg(scs, base_b16, inf)
    i1 = _tree5(leaves)
    del leaves
    t, totals = _k_cgather(sorted_k, perm, i1, base_b16, acc_s)
    del i1
    return msm3._k_collect(t, acc_s, acc_t, totals)


def msm_device(basis: msm12.DeviceBasis, scalar_chunks: list, length: int):
    """Canonical 12-bit limb scalar chunks -> host `ec.curve.Jacobian`."""
    return msm_device_batch(basis, [scalar_chunks])[0]


def msm_device_batch(basis: msm12.DeviceBasis, batch_chunks: list) -> list:
    """B independent MSMs over one CRS basis; see msm3.msm_device_batch."""
    sh = shifted_basis_affine(basis)
    nb = len(batch_chunks)
    nch = max(len(c) for c in batch_chunks)
    zero = None
    acc_s = msm3._ident_cols(nb)
    acc_t = msm3._ident_cols(nb)
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
        acc_s, acc_t = _chunk_run(scs, sh[j], basis.inf_chunks[j],
                                  acc_s, acc_t)
    return msm3._finalize_host(acc_s, acc_t)


load_basis = msm12.load_basis
slice_basis = msm12.slice_basis
