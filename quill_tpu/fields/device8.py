"""8-bit-limb prime-field arithmetic: the MXU-era device representation.

Second-generation field core (the first is the 12-bit VPU core in
`fields/device.py`).  Same role as arkworks' `ark_ff` backend
(`/root/reference/pcs/src/kzg.rs:1-8` consumes it as `PrimeField`), but
designed around what the probes measured on a v5e chip:

- VPU f32 FMA sustains ~3.8 Tops in high-ILP kernels, and the MXU runs
  bf16 matmuls at >100 TFLOP/s, while int32 multiplies cap far lower.
- So: elements are K=33 limbs x 8 bits held in float32 ("f8l" form),
  Montgomery radix R = 2^264 -- the SAME R as the 12-bit core, so
  cross-representation conversion is pure bit repacking (no field ops).
- The schoolbook product a*b runs on the VPU as an exact f32 convolution
  (33 limbs, |limb| <= 640  =>  every column partial sum < 33*640^2 < 2^24,
  so each f32 FMA is exact), and the two Montgomery-reduction passes
  (m = t*p' mod R and m*p) are *constant-matrix* multiplies that ride the
  MXU as bf16 x bf16 -> f32 dots: inputs are carry-normalized to [-1, 256]
  (every such integer is exactly representable in bf16) and column sums
  stay < 2^22, so the MXU arithmetic is exact too.

Lazy domain (mirrors `fields/device.py`):
  representation: (33, ...) float32 limbs, integer-valued,
                  |limb| <= ~640 between ops, |value| < 16p
  invariants:     every public op ends with at least one carry round and
                  returns |limb| <= ~520, |value| < 2.2p (mul: < 1.3p);
                  `lazy_to_canonical` / `from_mont` are the exact exits.

All arithmetic is exact: f32 ops are exact on integers below 2^24 and every
intermediate is bounded below that (bounds stated inline).  Verified
differentially against the host big-int engine and `fields/device.py`.
"""

from __future__ import annotations

import types
from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .bn254 import P as _P_INT
from .bn254 import R as _R_INT
from . import device as fd12

L = 33          # limbs
B = 8           # bits per limb
MASK = 255
R_BITS = L * B  # 264 == fields.device.R_BITS (same Montgomery radix)

assert R_BITS == fd12.R_BITS


def int_to_limbs8(x: int) -> np.ndarray:
    """Non-negative int < 2^264 -> (33,) float32 canonical limbs."""
    return np.array([(x >> (B * i)) & MASK for i in range(L)],
                    dtype=np.float32)


@dataclass(frozen=True)
class FieldSpec8:
    """Montgomery parameters for one modulus, plus the constant REDC
    matrices and weight vectors.  Fields are host numpy here; the Pallas
    layer substitutes a duck-typed spec whose array fields are traced kernel
    operands (Pallas kernels cannot capture array constants) -- every op
    below only reads these via attributes, so both work."""

    modulus: int
    p_limbs: np.ndarray        # (33,) f32
    pp_limbs: np.ndarray       # (33,) f32, limbs of p' = -p^{-1} mod R
    pp_mat: np.ndarray         # (33, 33) f32: [k, j] = p'_{k-j} (k >= j)
    p_mat: np.ndarray          # (66, 33) f32: [k, j] = p_{k-j} (0 <= k-j < 33)
    kp4: np.ndarray            # (33,) f32, canonical limbs of 4*p
    w_spill: np.ndarray        # (33,) f32, 2^(8i-264) (REDC spill detect)
    w252: np.ndarray           # (33,) f32, 2^(8i-252) (lazy_reduce estimate)
    r_mod_p: int
    r2_limbs: np.ndarray       # (33,) f32, R^2 mod p
    one_mont: np.ndarray       # (33,) f32, R mod p

    @staticmethod
    @lru_cache(maxsize=None)
    def make(modulus: int) -> "FieldSpec8":
        r = 1 << R_BITS
        p_prime = (-pow(modulus, -1, r)) % r
        r_mod = r % modulus
        r2 = r_mod * r_mod % modulus
        p_l = int_to_limbs8(modulus)
        pp_l = np.array([(p_prime >> (B * i)) & MASK for i in range(L)],
                        dtype=np.float32)
        pp_mat = np.zeros((L, L), dtype=np.float32)
        p_mat = np.zeros((2 * L, L), dtype=np.float32)
        for j in range(L):
            for k in range(L):
                if j + k < L:
                    pp_mat[j + k, j] = pp_l[k]
                p_mat[j + k, j] = p_l[k]
        # sub-2^-126 weights flush to 0 in f32: benign, those limbs'
        # contribution to the estimates is < 2^-130 (documented at use sites)
        w_spill = np.ldexp(np.ones(L), 8 * np.arange(L) - 264).astype(
            np.float32)
        w252 = np.ldexp(np.ones(L), 8 * np.arange(L) - 252).astype(np.float32)
        return FieldSpec8(
            modulus=modulus,
            p_limbs=p_l,
            pp_limbs=pp_l,
            pp_mat=pp_mat,
            p_mat=p_mat,
            kp4=int_to_limbs8(4 * modulus),
            w_spill=w_spill,
            w252=w252,
            r_mod_p=r_mod,
            r2_limbs=int_to_limbs8(r2),
            one_mont=int_to_limbs8(r_mod),
        )


FR8 = FieldSpec8.make(_R_INT)
FQ8 = FieldSpec8.make(_P_INT)


def _col(arr: np.ndarray, ndim: int) -> jnp.ndarray:
    return jnp.asarray(arr, jnp.float32).reshape((L,) + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# carry rounds (exact: floor/mul-by-2^-8 on f32 integers < 2^24)
# ---------------------------------------------------------------------------


def carry_round(x: jnp.ndarray, mod_r: bool) -> jnp.ndarray:
    """One full-width carry round along axis 0.  Input: integer-valued f32
    columns, |x| < 2^24.  Output limbs: rem in [0, 256) plus the previous
    column's carry.  mod_r=True drops the top carry (value mod 2^(8*K));
    otherwise the top limb absorbs its carry un-masked."""
    c = jnp.floor(x * (1.0 / 256.0))
    rem = x - c * 256.0
    shifted = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    y = rem + shifted
    if not mod_r:
        y = jnp.concatenate([y[:-1], x[-1:] + shifted[-1:]], axis=0)
    return y


def _carry_n(x: jnp.ndarray, rounds: int, mod_r: bool) -> jnp.ndarray:
    for _ in range(rounds):
        x = carry_round(x, mod_r)
    return x


# ---------------------------------------------------------------------------
# multiplication: VPU f32 convolution + MXU bf16 REDC
# ---------------------------------------------------------------------------


def _conv_full(a: jnp.ndarray, b: jnp.ndarray) -> list:
    """Full product columns: a, b (33, ...) f32, |limb| <= 640 ->
    65 columns, each an exact f32 integer < 33*640^2 < 2^24."""
    la = [a[i] for i in range(L)]
    lb = [b[i] for i in range(L)]
    cols = [None] * (2 * L - 1)
    for i in range(L):
        ai = la[i]
        for j in range(L):
            t = ai * lb[j]
            k = i + j
            cols[k] = t if cols[k] is None else cols[k] + t
    return cols


def _redc_dot(mat: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Constant-matrix REDC pass on the MXU: (K_out, 33) @ (33, ...) with
    bf16 inputs, f32 accumulation.  Exact: x in [-1, 256] (bf16-exact
    integers), mat entries in [0, 255], column sums < 33*256*255 < 2^22."""
    batch = x.shape[1:]
    x2 = x.reshape(L, -1).astype(jnp.bfloat16)
    m = jnp.dot(jnp.asarray(mat, jnp.bfloat16), x2,
                preferred_element_type=jnp.float32)
    return m.reshape((mat.shape[0],) + batch)


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p in the lazy 8-bit domain.

    Inputs: |limb| <= 640, |value| < 16p.  Output: limb in [-1, 439],
    |value| < 1.3p.  Exactness argument inline in `_mont_mul_body`.

    Dispatches through a per-(modulus, redc-strategy) `jax.jit` wrapper so
    the ~2k-op unrolled body is traced once per shape; every further call
    site (there are ~20 per sumcheck/point kernel) emits one inlined call
    eqn instead of re-tracing -- this cuts Pallas kernel trace+lower time
    ~5x with an identical compiled program."""
    b = jnp.broadcast_to(b, a.shape)
    if getattr(spec, "vpu_redc", False):
        return _jit_mont_vpu(spec.modulus)(a, b)
    return _jit_mont_mxu(spec.modulus)(a, b, jnp.asarray(spec.pp_mat),
                                       jnp.asarray(spec.p_mat))


@lru_cache(maxsize=None)
def _jit_mont_vpu(modulus: int):
    hspec = FieldSpec8.make(modulus)
    vspec = types.SimpleNamespace(vpu_redc=True, **{
        f: getattr(hspec, f) for f in
        ("modulus", "p_limbs", "pp_limbs", "w_spill")})
    return jax.jit(lambda a, b: _mont_mul_body(a, b, vspec))


@lru_cache(maxsize=None)
def _jit_mont_mxu(modulus: int):
    hspec = FieldSpec8.make(modulus)

    def f(a, b, pp_mat, p_mat):
        spec = types.SimpleNamespace(
            vpu_redc=False, modulus=modulus, pp_mat=pp_mat, p_mat=p_mat,
            p_limbs=hspec.p_limbs, pp_limbs=hspec.pp_limbs,
            w_spill=hspec.w_spill)
        return _mont_mul_body(a, b, spec)
    return jax.jit(f)


def _mont_mul_body(a: jnp.ndarray, b: jnp.ndarray, spec) -> jnp.ndarray:
    # T = a*b: 65 columns, |col| < 33*640^2 < 2^23.8  (exact f32)
    t_cols = _conv_full(a, jnp.broadcast_to(b, a.shape))
    t_cols.append(jnp.zeros_like(t_cols[0]))         # column 65
    t = jnp.stack(t_cols, axis=0)                    # (66, ...)
    return redc_columns(t, spec, carries=4)


def redc_columns(t: jnp.ndarray, spec, carries: int = 4) -> jnp.ndarray:
    """Montgomery-reduce stacked product columns: t (66, ...) integer f32,
    |col| < 2^24, |value| < R*p -> lazy limbs (33, ...) of value*R^{-1} mod p
    (|value| < 1.3p).  `carries` normalizes t mod R to [-1, 256] before the
    bf16 REDC matmuls: 4 rounds from 2^23.8, 2 suffice from < 2^10.

    Montgomery linearity: REDC(sum_j a_j*b_j) = sum_j mont_mul(a_j, b_j), so
    dot-product kernels (NTT matmuls) may accumulate raw product columns and
    reduce ONCE per output element through this function."""
    # t_low = T mod R normalized towards 8-bit limbs
    t_low = _carry_n(t[:L], carries, mod_r=True)

    # m = (t_low * p') mod R, then normalized to [-1, 256]:
    # columns < 2^22 -> 4 carry rounds (mod R).  Two strategies: bf16 MXU
    # matmuls (fastest standalone) or unrolled scalar-constant VPU FMAs
    # (fastest inside scan kernels, where the dot's 2D reshape would force
    # a sublane<->lane relayout of every operand).
    if getattr(spec, "vpu_redc", False):
        m = _tconv_scalar(t_low, spec.pp_limbs, truncate=True)
    else:
        m = _redc_dot(spec.pp_mat, t_low)
    m = _carry_n(m, 4, mod_r=True)

    # total = T + m*p: |col| < 2^23.8 + 2^22 < 2^24  (exact adds)
    if getattr(spec, "vpu_redc", False):
        mp = _tconv_scalar(m, spec.p_limbs, truncate=False)
    else:
        mp = _redc_dot(spec.p_mat, m)
    total = t + mp

    # two value-preserving carry rounds: limbs in (-452, 452)
    total = _carry_n(total, 2, mod_r=False)

    # low 33 limbs hold a value divisible by R with |value| < 452/255*R
    # < 2R  =>  in {-R, 0, R}; detect with a float dot (error << 0.5)
    low = total[:L]
    hi = total[L:]
    s = _scalar_dot(low, spec.w_spill)
    spill = jnp.floor(s + 0.5)
    hi = jnp.concatenate([hi[:1] + spill[None], hi[1:]], axis=0)
    return hi


def _tconv_scalar(x: jnp.ndarray, consts: np.ndarray,
                  truncate: bool) -> jnp.ndarray:
    """Convolution of limb rows with a constant limb vector, unrolled with
    python-scalar multipliers on the VPU.  truncate=True keeps only the low
    L columns (mod R); otherwise emits 2L columns."""
    xl = [x[i] for i in range(L)]
    n_out = L if truncate else 2 * L
    cols = [None] * n_out
    for j in range(L):
        xj = xl[j]
        for k in range(L):
            c = float(consts[k])
            if c == 0.0:
                continue
            kk = j + k
            if kk >= n_out:
                break
            term = xj * c
            cols[kk] = term if cols[kk] is None else cols[kk] + term
    zero = jnp.zeros_like(xl[0])
    return jnp.stack([zero if c is None else c for c in cols], axis=0)


def mont_mul_const(a: jnp.ndarray, c_mont: np.ndarray,
                   spec: FieldSpec8) -> jnp.ndarray:
    c = _col(np.asarray(c_mont, np.float32), a.ndim)
    return mont_mul(a, jnp.broadcast_to(c, a.shape), spec)


# ---------------------------------------------------------------------------
# add / sub / partial reduction
# ---------------------------------------------------------------------------

def _scalar_dot(x: jnp.ndarray, weights: np.ndarray) -> jnp.ndarray:
    """sum_i x[i] * w_i with the weights unrolled as python scalars
    (Mosaic-friendly: no captured constant arrays, no 1D->ND reshapes)."""
    acc = None
    for i in range(x.shape[0]):
        w = float(weights[i])
        if w == 0.0:
            continue
        term = x[i] * w
        acc = term if acc is None else acc + term
    return acc if acc is not None else jnp.zeros_like(x[0])


def _add_scaled_rows(x: jnp.ndarray, q: jnp.ndarray,
                     consts: np.ndarray, sign: float) -> jnp.ndarray:
    """rows x[i] + sign * q * c_i, unrolled python-scalar constants."""
    return jnp.stack(
        [x[i] + q * (sign * float(consts[i])) if float(consts[i]) != 0.0
         else x[i] for i in range(x.shape[0])], axis=0)


def lazy_reduce(x: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    """Partial reduction: subtract q*p with q from a f32 weighted estimate,
    capping |value| back below ~2.2p.  Exact (q is an integer; only its
    choice is approximate and the slack absorbs the error).  Input
    |value| < ~40p, |limb| < 2^22."""
    est = _scalar_dot(x, spec.w252)
    ratio = float(spec.modulus) / float(2.0 ** 252)
    q = jnp.maximum(jnp.floor(est * (1.0 / ratio)) - 1.0, 0.0)
    return carry_round(_add_scaled_rows(x, q, spec.p_limbs, -1.0),
                       mod_r=False)


def normal_form(x: jnp.ndarray) -> jnp.ndarray:
    """Two value-preserving carry rounds: any |limb| <= 2^13 input lands in
    [-1, 256] -- every such integer is exactly representable in bfloat16, so
    normal-form values can be stored as bf16 at rest (halving HBM traffic
    for point/table arrays) and reloaded exactly."""
    return _carry_n(x, 2, mod_r=False)


def lazy_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return carry_round(a + b, mod_r=False)


def lazy_sub(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec8,
             k: int = 4) -> jnp.ndarray:
    kp = spec.kp4 if k == 4 else int_to_limbs8(k * spec.modulus)
    d = a - b
    return carry_round(
        jnp.stack([d[i] + float(kp[i]) for i in range(L)], axis=0),
        mod_r=False)


def add(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    return _jit_addsub(spec.modulus, "add")(a, b)


def sub(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    return _jit_addsub(spec.modulus, "sub")(a, b)


def neg(a: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    return _jit_addsub(spec.modulus, "neg")(a, jnp.zeros_like(a))


@lru_cache(maxsize=None)
def _jit_addsub(modulus: int, op: str):
    """Per-(modulus, op) jitted add/sub/neg (same trace-once rationale as
    `mont_mul`; these bodies are ~100 unrolled ops each)."""
    hspec = FieldSpec8.make(modulus)
    if op == "add":
        f = lambda a, b: lazy_reduce(lazy_add(a, b), hspec)            # noqa: E731
    elif op == "sub":
        f = lambda a, b: lazy_reduce(lazy_sub(a, b, hspec, k=4), hspec)  # noqa: E731
    else:
        f = lambda a, b: lazy_reduce(lazy_sub(b, a, hspec, k=4), hspec)  # noqa: E731
    return jax.jit(f)


# ---------------------------------------------------------------------------
# canonicalization and Montgomery conversion
# ---------------------------------------------------------------------------


def _sub_const_if_ge(limbs: list, const_limbs: np.ndarray) -> list:
    """Branchless conditional subtract of a 33-limb canonical constant."""
    diff = []
    borrow = jnp.zeros_like(limbs[0])
    for i in range(L):
        t = limbs[i] - float(const_limbs[i]) - borrow
        borrow = (t < 0).astype(jnp.float32)
        diff.append(t + borrow * 256.0)
    ge = borrow == 0
    return [jnp.where(ge, d, x) for d, x in zip(diff, limbs)]


def lazy_to_canonical(a: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    return _jit_canonical(spec.modulus)(a)


@lru_cache(maxsize=None)
def _jit_canonical(modulus: int):
    hspec = FieldSpec8.make(modulus)
    return jax.jit(lambda a: _lazy_to_canonical_body(a, hspec))


def _lazy_to_canonical_body(a: jnp.ndarray, spec) -> jnp.ndarray:
    """Exact normalization: add 16p (forces positivity for |value| < 16p),
    sequential carry chain, then binary conditional subtracts to [0, p)."""
    kp = _col(int_to_limbs8(16 * spec.modulus), a.ndim)
    x = a + kp
    # sequential exact carry chain (limbs can be negative: floor handles it)
    out = []
    carry = jnp.zeros_like(x[0])
    for i in range(L):
        v = x[i] + carry
        carry = jnp.floor(v * (1.0 / 256.0))
        out.append(v - carry * 256.0)
    limbs = out
    for kk in (16, 8, 4, 2, 1):
        limbs = _sub_const_if_ge(limbs, int_to_limbs8(kk * spec.modulus))
    return jnp.stack(limbs, axis=0)


def to_mont(a: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    return mont_mul_const(a, spec.r2_limbs, spec)


def from_mont(a: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    """Lazy Montgomery rep -> canonical integer limbs (exact): multiply by
    the integer 1 (REDC strips one R factor), then canonicalize."""
    one = np.zeros(L, np.float32)
    one[0] = 1.0
    return lazy_to_canonical(mont_mul_const(a, one, spec), spec)


def one_mont_like(a: jnp.ndarray, spec: FieldSpec8) -> jnp.ndarray:
    return jnp.broadcast_to(_col(spec.one_mont, a.ndim), a.shape)


def zeros(shape) -> jnp.ndarray:
    return jnp.zeros((L,) + tuple(shape), dtype=jnp.float32)


# ---------------------------------------------------------------------------
# predicates / selects (canonical limbs)
# ---------------------------------------------------------------------------


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=0)


def select(pred: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(pred[None, ...], a, b)


# ---------------------------------------------------------------------------
# 12-bit <-> 8-bit repacking (same R => no field ops, exact bit surgery)
# ---------------------------------------------------------------------------


def from12(a12: jnp.ndarray) -> jnp.ndarray:
    """Canonical 12-bit limbs (22, ...) int32 -> canonical 8-bit (33, ...)
    f32.  Pairs of 12-bit limbs form 24-bit words split into 3 bytes."""
    out = []
    for i in range(11):
        v = a12[2 * i] + (a12[2 * i + 1] << 12)      # < 2^24, int32
        out.append(v & 255)
        out.append((v >> 8) & 255)
        out.append(v >> 16)
    return jnp.stack(out, axis=0).astype(jnp.float32)


def to12(a8: jnp.ndarray) -> jnp.ndarray:
    """Canonical 8-bit limbs (33, ...) f32 -> canonical 12-bit (22, ...)
    int32."""
    x = a8.astype(jnp.int32)
    out = []
    for i in range(11):
        v = x[3 * i] + (x[3 * i + 1] << 8) + (x[3 * i + 2] << 16)  # 24-bit
        out.append(v & 4095)
        out.append(v >> 12)
    return jnp.stack(out, axis=0)


def host_col_to_int(col: np.ndarray, modulus: int) -> int:
    """Exact value of one (33, 1) possibly-lazy f32 limb column, reduced mod
    the modulus and out of the Montgomery domain."""
    total = 0
    for i in range(L):
        total += int(col[i].reshape(-1)[0]) << (B * i)
    r_inv = pow(1 << R_BITS, -1, modulus)
    return total % modulus * r_inv % modulus


def ints_to_limbs8(xs: list[int]) -> np.ndarray:
    """Exact ints -> (33, N) f32 canonical limbs."""
    out = np.zeros((L, len(xs)), dtype=np.float32)
    for j, x in enumerate(xs):
        x = int(x)
        for i in range(L):
            out[i, j] = (x >> (B * i)) & MASK
    return out


def limbs8_to_ints(a: np.ndarray) -> list[int]:
    """Canonical (33, N) limbs -> exact ints."""
    a = np.asarray(a)
    n = a.shape[1]
    return [sum(int(a[i, j]) << (B * i) for i in range(L)) for j in range(n)]
