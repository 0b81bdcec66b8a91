"""Device (JAX/XLA) batched G1 arithmetic over Fq limbs.

TPU-first design: points are projective (X : Y : Z) triples of (22, ...) Fq
limb arrays in Montgomery form, and the only group operation is the
Renes-Costello-Batina *complete* addition for a = 0 short-Weierstrass curves
(eprint 2015/1060, algorithm 7).  Complete formulas are branchless by
construction -- identity, doubling and cancellation all flow through the same
12M+2m multiplication pattern -- which is exactly what a vector unit wants
(the reference's arkworks backend branches per point; a TPU lane cannot).

The identity is (0 : 1 : 0).  b3 = 3*b = 9 multiplications use a small-scalar
limb multiply (shift-add + conditional subtracts) instead of a full
Montgomery product.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import device as fd
from ..fields.bn254 import P

FQ = fd.FQ
L = fd.L
B = fd.B
MASK = fd.MASK


def _small_mul(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k*x for tiny k (k <= 16) in the lazy domain: one full-width limb
    scale + carry round + partial reduction."""
    assert 1 <= k <= 16
    # lazy limbs |.| < ~2^13.2, so k*limbs < 2^17.2 -- one carry round
    # restores ~12-bit limbs; value < k * 2.2p, reduced back to < 2.2p
    y = fd._carry_round(x * k, mod_r=False)
    return fd.lazy_reduce(y, FQ)


def pt_identity(shape) -> tuple:
    """(0 : 1 : 0) broadcast to batch shape."""
    zero = jnp.zeros((L,) + tuple(shape), dtype=jnp.int32)
    one = jnp.broadcast_to(
        jnp.asarray(FQ.one_mont, jnp.int32).reshape((L,) + (1,) * len(shape)),
        (L,) + tuple(shape)).astype(jnp.int32)
    return zero, one, zero


def pt_add(p1: tuple, p2: tuple) -> tuple:
    """Complete projective addition (RCB15 algorithm 7, a=0, b3=9).

    The 12 field products are grouped into two *batched* Montgomery
    multiplies of 6 independent products each (stacked on a new axis) --
    the data dependencies of the formula allow exactly this split, and it
    keeps the traced graph tiny while widening the vector work.
    """
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    add = lambda a, b: fd.add(a, b, FQ)
    sub = lambda a, b: fd.sub(a, b, FQ)

    lhs1 = jnp.stack([X1, Y1, Z1, add(X1, Y1), add(Y1, Z1), add(X1, Z1)],
                     axis=1)
    rhs1 = jnp.stack([X2, Y2, Z2, add(X2, Y2), add(Y2, Z2), add(X2, Z2)],
                     axis=1)
    m = fd.mont_mul(lhs1, rhs1, FQ)
    t0, t1, t2 = m[:, 0], m[:, 1], m[:, 2]
    t3 = sub(sub(m[:, 3], t0), t1)         # (X1+Y1)(X2+Y2) - t0 - t1
    t4 = sub(sub(m[:, 4], t1), t2)         # (Y1+Z1)(Y2+Z2) - t1 - t2
    w = sub(sub(m[:, 5], t0), t2)          # (X1+Z1)(X2+Z2) - t0 - t2

    t0_3 = _small_mul(t0, 3)               # 3*t0
    t2_9 = _small_mul(t2, 9)               # b3*t2
    z3p = add(t1, t2_9)
    t1p = sub(t1, t2_9)
    y3m = _small_mul(w, 9)                 # b3*w

    lhs2 = jnp.stack([t4, t3, y3m, t1p, t0_3, z3p], axis=1)
    rhs2 = jnp.stack([y3m, t1p, t0_3, z3p, t3, t4], axis=1)
    mm = fd.mont_mul(lhs2, rhs2, FQ)
    X3 = sub(mm[:, 1], mm[:, 0])           # t3*t1' - t4*y3m
    Y3 = add(mm[:, 3], mm[:, 2])           # t1'*z3' + y3m*t0'
    Z3 = add(mm[:, 5], mm[:, 4])           # z3'*t4 + t0'*t3
    return X3, Y3, Z3


def pt_neg(p: tuple) -> tuple:
    """-P = (X : -Y : Z); negation stays in the lazy limb domain."""
    X, Y, Z = p
    return X, fd.neg(Y, FQ), Z


def pt_select(pred: jnp.ndarray, p1: tuple, p2: tuple) -> tuple:
    """pred (batch shape) ? p1 : p2, coordinate-wise."""
    return tuple(jnp.where(pred[None, ...], a, b) for a, b in zip(p1, p2))


def pt_is_identity(p: tuple) -> jnp.ndarray:
    return fd.is_zero(p[2])


def affine_to_projective(x: jnp.ndarray, y: jnp.ndarray,
                         inf: jnp.ndarray | None = None) -> tuple:
    one = jnp.broadcast_to(
        jnp.asarray(FQ.one_mont, jnp.int32).reshape((L,) + (1,) * (x.ndim - 1)),
        x.shape).astype(jnp.int32)
    z = one
    if inf is not None:
        zero = jnp.zeros_like(x)
        return (jnp.where(inf[None], zero, x),
                jnp.where(inf[None], one, y),
                jnp.where(inf[None], zero, z))
    return x, y, z


# -- host conversion helpers -------------------------------------------------


def host_affine_to_device(points) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """List of ec.curve.Affine (Fq int coords) -> canonical limb arrays
    (x, y, infinity mask), NOT yet in Montgomery form."""
    from ..fields.limbs import ints_to_limbs

    xs, ys, infs = [], [], []
    for pt in points:
        if pt.infinity:
            xs.append(0)
            ys.append(0)
            infs.append(True)
        else:
            xs.append(pt.x.v % P)
            ys.append(pt.y.v % P)
            infs.append(False)
    return (ints_to_limbs(xs), ints_to_limbs(ys),
            np.asarray(infs, dtype=bool))


_FROM_MONT_FQ_JIT = None


def _from_mont_fq_jit():
    """Module-cached jit: a FRESH `jax.jit(lambda ...)` per call defeats
    the compile cache (new function identity every time) -- this function
    runs once per MSM partial per device, and the per-call recompile
    (~2.5 s each on CPU) was the entire 40-minute sharded-prove stall in
    the round-3 driver dryrun."""
    global _FROM_MONT_FQ_JIT
    if _FROM_MONT_FQ_JIT is None:
        import jax

        _FROM_MONT_FQ_JIT = jax.jit(lambda a: fd.from_mont(a, FQ))
    return _FROM_MONT_FQ_JIT


def device_point_to_host(p: tuple):
    """Single device projective point (22, 1) coords (Montgomery) -> host
    ec.curve.Jacobian (projective (X,Y,Z) is also a valid Jacobian encoding
    only when Z in {0,1}; convert properly via affine)."""
    from ..ec import curve
    from ..fields.limbs import limbs_to_ints
    from ..fields.scalar import inv as sinv

    fm = _from_mont_fq_jit()
    x_l, y_l, z_l = (limbs_to_ints(np.asarray(fm(c)))[0] for c in p)
    if z_l == 0:
        return curve.Jacobian.identity(curve.Fq(1))
    z_inv = sinv(z_l, P)
    ax = x_l * z_inv % P
    ay = y_l * z_inv % P
    return curve.Jacobian(curve.Fq(ax), curve.Fq(ay), curve.Fq(1))
