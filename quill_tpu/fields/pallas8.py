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
    kp4: np.ndarray
    w_spill: np.ndarray
    w252: np.ndarray
    pp_mat: jnp.ndarray
    p_mat: jnp.ndarray


@functools.lru_cache(maxsize=None)
def consts_pack(modulus: int) -> np.ndarray:
    spec = f8.FieldSpec8.make(modulus)
    pack = np.concatenate([spec.pp_mat, spec.p_mat], axis=0)
    assert pack.shape == (_PACK_ROWS, L)
    return pack.astype(np.float32)


def unpack_spec(modulus: int, pack) -> _TracedSpec:
    """Rebuild a spec view over a traced consts-pack (inside a kernel)."""
    spec = f8.FieldSpec8.make(modulus)
    return _TracedSpec(
        modulus=modulus,
        p_limbs=spec.p_limbs,
        kp4=spec.kp4,
        w_spill=spec.w_spill,
        w252=spec.w252,
        pp_mat=pack[:L],
        p_mat=pack[L:3 * L],
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
    pack = jnp.asarray(consts_pack(modulus))

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
    pack = jnp.asarray(consts_pack(modulus))

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
