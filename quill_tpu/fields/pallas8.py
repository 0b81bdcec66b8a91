"""Pallas TPU kernels over the 8-bit-limb field representation.

The jnp ops in `fields/device8.py` are exact but, at the XLA level, every
multiplication round-trips its 65 product columns through HBM.  These
kernels run the same math inside one `pallas_call`, keeping every
intermediate in VMEM: the VPU does the f32 limb convolution while the MXU
does the bf16 REDC matmuls (the units run concurrently).

Everything here reuses the arithmetic in `device8` verbatim -- the kernel
bodies call the same jnp functions, so the exactness argument (and the
differential tests) carry over; only the memory orchestration changes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import device8 as f8

L = f8.L

# block of elements processed per grid step (lane axis; multiple of 128);
# kernels reshape to (33, BLOCK//128, 128) 3D tiles so per-limb rows span
# full (8, 128) VPU tiles (the 2D layout uses 1 of 8 sublanes -- 5x slower)
BLOCK = 1024

# ---------------------------------------------------------------------------
# constant pack: Pallas kernels cannot capture array constants, so the two
# REDC matrices travel as one (99, 33) f32 operand, re-wrapped inside the
# kernel as a duck-typed spec.  All per-limb constants (p, 4p, weight
# vectors) are consumed as unrolled python scalars by device8 and embed in
# the instruction stream.
# ---------------------------------------------------------------------------

_PACK_ROWS = 3 * L  # pp_mat (33 rows) + p_mat (66 rows)


@dataclasses.dataclass(frozen=True)
class _TracedSpec:
    modulus: int
    p_limbs: np.ndarray
    pp_limbs: np.ndarray
    kp4: np.ndarray
    w_spill: np.ndarray
    w252: np.ndarray
    pp_mat: jnp.ndarray
    p_mat: jnp.ndarray
    vpu_redc: bool = False


@functools.lru_cache(maxsize=None)
def consts_pack(modulus: int) -> np.ndarray:
    spec = f8.FieldSpec8.make(modulus)
    pack = np.concatenate([spec.pp_mat, spec.p_mat], axis=0)
    assert pack.shape == (_PACK_ROWS, L)
    return pack.astype(np.float32)


def unpack_spec(modulus: int, pack, vpu_redc: bool = False) -> _TracedSpec:
    """Rebuild a spec view over a traced consts-pack (inside a kernel)."""
    spec = f8.FieldSpec8.make(modulus)
    return _TracedSpec(
        modulus=modulus,
        p_limbs=spec.p_limbs,
        pp_limbs=spec.pp_limbs,
        kp4=spec.kp4,
        w_spill=spec.w_spill,
        w252=spec.w252,
        pp_mat=pack[:L],
        p_mat=pack[L:3 * L],
        vpu_redc=vpu_redc,
    )


def _to3d(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(L, x.shape[-1] // 128, 128)


def _consts_spec():
    return pl.BlockSpec((_PACK_ROWS, L), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _specs(n_in: int, block: int):
    spec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    return [spec] * n_in, spec


def _pad_cols(x: jnp.ndarray, block: int) -> tuple[jnp.ndarray, int]:
    n = x.shape[-1]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, n


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# vector Montgomery multiply
# ---------------------------------------------------------------------------


def _mul_kernel(modulus: int, c_ref, a_ref, b_ref, o_ref):
    spec = unpack_spec(modulus, c_ref[:])
    n = a_ref.shape[-1]
    out = f8.mont_mul(_to3d(a_ref[:]), _to3d(b_ref[:]), spec)
    o_ref[:] = out.reshape(L, n)


@functools.lru_cache(maxsize=None)
def _mul_call(modulus: int, block: int):
    in_specs, out_spec = _specs(2, block)
    pack = consts_pack(modulus)  # numpy: concrete under any trace

    def run(a, b):
        grid = (a.shape[-1] // block,)
        return pl.pallas_call(
            functools.partial(_mul_kernel, modulus),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
            grid=grid,
            in_specs=[_consts_spec()] + in_specs,
            out_specs=out_spec,
            interpret=_interpret(),
        )(pack, a, b)

    return jax.jit(run)


def mont_mul_vec(a: jnp.ndarray, b: jnp.ndarray,
                 spec: f8.FieldSpec8) -> jnp.ndarray:
    """(33, N) x (33, N) lazy limbs -> (33, N), one fused kernel."""
    a, n = _pad_cols(a, BLOCK)
    b, _ = _pad_cols(b, BLOCK)
    out = _mul_call(spec.modulus, BLOCK)(a, b)
    return out[:, :n]


# ---------------------------------------------------------------------------
# complete G1 addition (RCB15 algorithm 7, a=0, b3=9) over Fq
# ---------------------------------------------------------------------------


def _small_mul(x: jnp.ndarray, k: int, spec: f8.FieldSpec8) -> jnp.ndarray:
    """k*x for tiny k: limb scale + carry round + partial reduction.
    |limb| <= 520 * k < 2^13 before the round."""
    return f8.lazy_reduce(f8.carry_round(x * float(k), mod_r=False), spec)


def emit_pt_add(p1: tuple, p2: tuple, spec: f8.FieldSpec8) -> tuple:
    """Complete projective addition on (33, ...) f8l coordinate arrays.
    Pure jnp -- usable inside Pallas kernel bodies and in XLA programs.
    Mirrors ec/device.py pt_add (12 M + 2 small-mul pattern)."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    add = lambda a, b: f8.add(a, b, spec)
    sub = lambda a, b: f8.sub(a, b, spec)
    mul = lambda a, b: f8.mont_mul(a, b, spec)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(sub(mul(add(X1, Y1), add(X2, Y2)), t0), t1)
    t4 = sub(sub(mul(add(Y1, Z1), add(Y2, Z2)), t1), t2)
    w = sub(sub(mul(add(X1, Z1), add(X2, Z2)), t0), t2)

    t0_3 = _small_mul(t0, 3, spec)
    t2_9 = _small_mul(t2, 9, spec)
    z3p = add(t1, t2_9)
    t1p = sub(t1, t2_9)
    y3m = _small_mul(w, 9, spec)

    X3 = sub(mul(t3, t1p), mul(t4, y3m))
    Y3 = add(mul(t1p, z3p), mul(y3m, t0_3))
    Z3 = add(mul(z3p, t4), mul(t0_3, t3))
    return X3, Y3, Z3


def _pt_add_kernel(modulus, c_ref, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    spec = unpack_spec(modulus, c_ref[:])
    n = x1.shape[-1]
    X3, Y3, Z3 = emit_pt_add(
        (_to3d(x1[:]), _to3d(y1[:]), _to3d(z1[:])),
        (_to3d(x2[:]), _to3d(y2[:]), _to3d(z2[:])), spec)
    ox[:] = X3.reshape(L, n)
    oy[:] = Y3.reshape(L, n)
    oz[:] = Z3.reshape(L, n)


@functools.lru_cache(maxsize=None)
def _pt_add_call(modulus: int, block: int):
    in_specs, out_spec = _specs(6, block)
    pack = consts_pack(modulus)  # numpy: concrete under any trace

    def run(x1, y1, z1, x2, y2, z2):
        grid = (x1.shape[-1] // block,)
        return pl.pallas_call(
            functools.partial(_pt_add_kernel, modulus),
            out_shape=[jax.ShapeDtypeStruct(x1.shape, jnp.float32)] * 3,
            grid=grid,
            in_specs=[_consts_spec()] + in_specs,
            out_specs=[out_spec] * 3,
            interpret=_interpret(),
        )(pack, x1, y1, z1, x2, y2, z2)

    return jax.jit(run)


def pt_add_vec(p1: tuple, p2: tuple) -> tuple:
    """Batched complete G1 addition, one fused kernel over (33, N) coords."""
    coords = []
    n = p1[0].shape[-1]
    for c in (*p1, *p2):
        c, _ = _pad_cols(c, BLOCK)
        coords.append(c)
    out = _pt_add_call(f8.FQ8.modulus, BLOCK)(*coords)
    return tuple(c[:, :n] for c in out)


# ---------------------------------------------------------------------------
# bf16 normal-form variants (points at rest are bf16 limbs in [-1, 256] --
# exact, half the HBM traffic of f32; kernels compute in f32 and re-normalize
# before storing)
# ---------------------------------------------------------------------------


def _ld(ref):
    """Load a (L, block) ref -> f32 3D tile."""
    return _to3d(ref[:])


def _st(ref, val):
    ref[:] = val.reshape(L, val.shape[-2] * 128)


def _pt_add_b16_kernel(modulus, c_ref, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    spec = unpack_spec(modulus, c_ref[:])
    X3, Y3, Z3 = emit_pt_add((_ld(x1), _ld(y1), _ld(z1)),
                             (_ld(x2), _ld(y2), _ld(z2)), spec)
    _st(ox, X3)
    _st(oy, Y3)
    _st(oz, Z3)


@functools.lru_cache(maxsize=None)
def _pt_add_b16_call(block: int):
    dspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    pack = consts_pack(f8.FQ8.modulus)  # numpy: concrete under any trace

    def run(*coords):
        grid = (coords[0].shape[-1] // block,)
        return pl.pallas_call(
            functools.partial(_pt_add_b16_kernel, f8.FQ8.modulus),
            out_shape=[jax.ShapeDtypeStruct(coords[0].shape,
                                            jnp.float32)] * 3,
            grid=grid,
            in_specs=[_consts_spec()] + [dspec] * 6,
            out_specs=[dspec] * 3,
            interpret=_interpret(),
        )(pack, *coords)

    return jax.jit(run)


def pt_add_b16(p1: tuple, p2: tuple) -> tuple:
    """Complete G1 addition on bf16 normal-form coords -> bf16."""
    n = p1[0].shape[-1]
    coords = [_pad_cols(c, BLOCK)[0] for c in (*p1, *p2)]
    out = _pt_add_b16_call(BLOCK)(*coords)
    return tuple(c[:, :n] for c in out)


def _seg_combine_kernel(modulus, c_ref, x1, y1, z1, f1, x2, y2, z2, f2,
                        ox, oy, oz, of):
    """Segmented-scan combine: (v1,f1) . (v2,f2) = (f2 ? v2 : v1+v2, f1|f2).
    Flags are f32 0/1 rows of shape (1, block)."""
    spec = unpack_spec(modulus, c_ref[:])
    X3, Y3, Z3 = emit_pt_add((_ld(x1), _ld(y1), _ld(z1)),
                             (_ld(x2), _ld(y2), _ld(z2)), spec)
    m = f2[:].reshape(1, f2.shape[-1] // 128, 128) > 0.5
    for ref, summed, keep in ((ox, X3, x2), (oy, Y3, y2), (oz, Z3, z2)):
        v = jnp.where(m, _ld(keep), summed)
        ref[:] = v.reshape(L, v.shape[-2] * 128)
    of[:] = jnp.maximum(f1[:], f2[:])


@functools.lru_cache(maxsize=None)
def _seg_combine_call(block: int):
    dspec = pl.BlockSpec((L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    pack = consts_pack(f8.FQ8.modulus)  # numpy: concrete under any trace

    def run(x1, y1, z1, f1, x2, y2, z2, f2):
        grid = (x1.shape[-1] // block,)
        cshape = jax.ShapeDtypeStruct(x1.shape, jnp.float32)
        fshape = jax.ShapeDtypeStruct(f1.shape, jnp.float32)
        return pl.pallas_call(
            functools.partial(_seg_combine_kernel, f8.FQ8.modulus),
            out_shape=[cshape, cshape, cshape, fshape],
            grid=grid,
            in_specs=[_consts_spec()] + [dspec] * 3 + [fspec]
                     + [dspec] * 3 + [fspec],
            out_specs=[dspec] * 3 + [fspec],
            interpret=_interpret(),
        )(pack, x1, y1, z1, f1, x2, y2, z2, f2)

    return jax.jit(run)


def seg_combine(a: tuple, b: tuple) -> tuple:
    """((coords3, flag), (coords3, flag)) -> (coords3, flag); f32 coords,
    (1, N) f32 flags.  The segmented-scan combine for sorted-bucket MSM."""
    (v1, f1), (v2, f2) = a, b
    n = v1[0].shape[-1]
    args = []
    for c in (*v1,):
        args.append(_pad_cols(c, BLOCK)[0])
    args.append(_pad_cols(f1, BLOCK)[0])
    for c in (*v2,):
        args.append(_pad_cols(c, BLOCK)[0])
    args.append(_pad_cols(f2, BLOCK)[0])
    ox, oy, oz, of = _seg_combine_call(BLOCK)(*args)
    return (ox[:, :n], oy[:, :n], oz[:, :n]), of[:, :n]


def pt_identity_b16(n: int) -> tuple:
    """(0 : 1 : 0) lazy-limb coords, (33, n) f32."""
    zero = jnp.zeros((L, n), jnp.float32)
    one = jnp.broadcast_to(
        jnp.asarray(f8.FQ8.one_mont, jnp.float32)[:, None], (L, n))
    return zero, one, zero


# ---------------------------------------------------------------------------
# segmented point scan: the MSM bucket-sum workhorse, ONE pallas_call
# ---------------------------------------------------------------------------
#
# Input layout: coords (33, S, M) bf16 and flags (1, S, M) f32, where S is
# the scan (step) axis and M the lane axis (independent scans).  The grid is
# (lane_tiles, step_chunks); scratch VMEM carries the running state across
# step chunks (TPU grids run sequentially, last dimension innermost), reset
# when a new lane tile begins.  One kernel launch replaces S per-step
# launches (launch overhead measured ~1 ms each -- it dominated a 256-step
# scan as 300 ms/chunk).


def _ident_rows(shape3):
    """Identity point coordinate rows as f32, via python-scalar fulls."""
    one = f8.FQ8.one_mont
    zero = jnp.zeros(shape3, jnp.float32)
    oney = jnp.stack([jnp.full(shape3[1:], float(one[i]), jnp.float32)
                      for i in range(L)], axis=0)
    return zero, oney, zero


def _split3(v):
    """Stacked (3L, ...) coords -> 3 x (L, ...) (static row slices)."""
    return v[:L], v[L:2 * L], v[2 * L:]


def identity_stacked(n: int) -> jnp.ndarray:
    """(0 : 1 : 0) as one stacked (3L, n) f32 array."""
    z, o, _ = pt_identity_b16(n)
    return jnp.concatenate([z, o, z], axis=0)


def _seg_scan_kernel(bc, sub, c_ref, xs_ref, xf, ys_ref, sv, sf):
    """Stacked segmented point scan.  Refs:
      xs/ys: (bc, 3L, sub, 128) -- ONE input and ONE output stream; every
             extra output stream measured +~50 ms per 2^16 chunk (per-grid-
             step DMA scheduling), so coords travel stacked;
      xf:    (bc, 1, sub, 128) segment-start flags;
      sv:    (3L, sub, 128) f32 scratch carrying the running state across
             step-chunks (TPU grids are sequential, last dim innermost);
      sf:    (1, sub, 128) running flag-or (reset per lane tile).
    The step axis leads (untiled) so dynamic per-step slices are legal."""
    spec = unpack_spec(f8.FQ8.modulus, c_ref[:], vpu_redc=True)
    j = pl.program_id(1)
    s3 = (L, sub, 128)

    @pl.when(j == 0)
    def _():
        zx, oy_i, zz = _ident_rows(s3)
        sv[:] = jnp.concatenate([zx, oy_i, zz], axis=0)
        sf[:] = jnp.zeros((1,) + s3[1:], jnp.float32)

    def step(s, carry):
        xt = _split3(xs_ref[pl.ds(s, 1)].reshape((3 * L,) + s3[1:]))
        ft = xf[pl.ds(s, 1)].reshape((1,) + s3[1:])
        cur = _split3(sv[:])
        X3, Y3, Z3 = emit_pt_add(cur, xt, spec)
        m = ft > 0.5
        new = jnp.concatenate(
            [jnp.where(m, t, v) for t, v in zip(xt, (X3, Y3, Z3))], axis=0)
        ys_ref[pl.ds(s, 1)] = new.reshape((1, 3 * L) + s3[1:])
        sv[:] = new
        sf[:] = jnp.maximum(sf[:], ft)
        return carry

    jax.lax.fori_loop(0, bc, step, 0)


_SCAN_SUB = 8


@functools.lru_cache(maxsize=None)
def _seg_scan_call(s_len: int, m_len: int, bc: int, sub: int):
    pack = consts_pack(f8.FQ8.modulus)
    mt = m_len // 128
    grid = (mt // sub, s_len // bc)
    cspec = pl.BlockSpec((bc, 3 * L, sub, 128), lambda i, j: (j, 0, i, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((bc, 1, sub, 128), lambda i, j: (j, 0, i, 0),
                         memory_space=pltpu.VMEM)
    cshape = jax.ShapeDtypeStruct((s_len, 3 * L, mt, 128), jnp.float32)

    def run(xs, xf):
        def r4(a):
            return a.reshape(s_len, a.shape[1], mt, 128)
        out = pl.pallas_call(
            functools.partial(_seg_scan_kernel, bc, sub),
            out_shape=cshape,
            grid=grid,
            in_specs=[pl.BlockSpec((_PACK_ROWS, L), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM), cspec, fspec],
            out_specs=cspec,
            scratch_shapes=[
                pltpu.VMEM((3 * L, sub, 128), jnp.float32),
                pltpu.VMEM((1, sub, 128), jnp.float32),
            ],
            interpret=_interpret(),
        )(pack, r4(xs), r4(xf))
        return out.reshape(s_len, 3 * L, m_len)

    return jax.jit(run)


def seg_scan(xs: jnp.ndarray, flags: jnp.ndarray, bc: int = 8,
             sub: int = _SCAN_SUB) -> jnp.ndarray:
    """Segmented inclusive scan of G1 points along axis 0.

    xs: (S, 3L, M) stacked f32 lazy-limb coords; flags: (S, 1, M) f32 0/1
    segment-start markers.  Returns ys (S, 3L, M); per-lane totals are
    ys[-1].  The within-block flag-prefix is NOT returned -- compute it as
    jnp.cummax(flags, axis=0) (cheap XLA op) when needed."""
    s_len = xs.shape[0]
    m = xs.shape[2]
    pad = (-m) % (sub * 128)
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, pad)))
        flags = jnp.pad(flags, ((0, 0), (0, 0), (0, pad)))
    bc = min(bc, s_len)
    assert s_len % bc == 0
    ys = _seg_scan_call(s_len, m + pad, bc, sub)(xs, flags)
    return ys[..., :m]


# ---------------------------------------------------------------------------
# stacked combine / add (same one-stream principle)
# ---------------------------------------------------------------------------


def _stacked_combine_kernel(with_flags, c_ref, *refs):
    if with_flags:
        a_ref, fa_ref, b_ref, fb_ref, o_ref = refs
    else:
        a_ref, b_ref, o_ref = refs
    spec = unpack_spec(f8.FQ8.modulus, c_ref[:])
    n = a_ref.shape[-1]
    s3 = (L, n // 128, 128)
    av = _split3(a_ref[:].reshape((3 * L,) + s3[1:]))
    bv = _split3(b_ref[:].reshape((3 * L,) + s3[1:]))
    X3, Y3, Z3 = emit_pt_add(av, bv, spec)
    summed = (X3, Y3, Z3)
    if with_flags:
        m = fb_ref[:].reshape((1,) + s3[1:]) > 0.5
        out = jnp.concatenate(
            [jnp.where(m, t, v) for t, v in zip(bv, summed)], axis=0)
    else:
        out = jnp.concatenate(summed, axis=0)
    o_ref[:] = out.reshape(3 * L, n)


@functools.lru_cache(maxsize=None)
def _stacked_combine_call(block: int, with_flags: bool):
    pack = consts_pack(f8.FQ8.modulus)
    cspec = pl.BlockSpec((3 * L, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    in_specs = ([cspec, fspec, cspec, fspec] if with_flags
                else [cspec, cspec])

    def run(*args):
        grid = (args[0].shape[-1] // block,)
        return pl.pallas_call(
            functools.partial(_stacked_combine_kernel, with_flags),
            out_shape=jax.ShapeDtypeStruct(args[0].shape, jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec((_PACK_ROWS, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] + in_specs,
            out_specs=cspec,
            interpret=_interpret(),
        )(pack, *args)

    return jax.jit(run)


def seg_combine_stacked(a, fa, b, fb):
    """Stacked-coords segmented combine: fb ? b : a+b.  (3L, N) arrays."""
    n = a.shape[-1]
    args = [_pad_cols(x, BLOCK)[0] for x in (a, fa, b, fb)]
    out = _stacked_combine_call(BLOCK, True)(*args)
    return out[:, :n]


def pt_add_stacked(a, b):
    """Stacked-coords complete G1 addition: (3L, N) + (3L, N) -> (3L, N)."""
    n = a.shape[-1]
    args = [_pad_cols(x, BLOCK)[0] for x in (a, b)]
    out = _stacked_combine_call(BLOCK, False)(*args)
    return out[:, :n]
