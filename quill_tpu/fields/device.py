"""Device (JAX/XLA) batched prime-field arithmetic in 12-bit limbs.

This is the compute substrate the whole TPU prover runs on -- the counterpart
of arkworks' `ark_ff` field backend, redesigned for the TPU VPU:

- elements live in Montgomery form (radix R = 2^264) as int32 limb rows of an
  (22, N) array; the N axis is the vector-lane axis;
- the production ops work in a *lazy redundant domain* (see the lazy section
  below): limbs of ~12-bit magnitude (small negatives allowed), values
  bounded by ~2.2p, full-width carry *rounds* instead of sequential chains,
  Montgomery reduction with a one-shot m = T_low * P' mod R and a float32
  spill estimate, and a float32-quotient partial reduction after adds/subs;
- exact canonicalization (`lazy_to_canonical` / `from_mont`) happens only at
  representation boundaries (serialization, digit extraction, host sums);
- everything here is shape-polymorphic jnp code: jit/fusion happens at the
  engine layer, and the same programs run on CPU meshes for differential
  tests against the exact host big-int engine.

Functions are generic over the modulus via a `FieldSpec` (Fr for the proof
system, Fq for curve arithmetic in the MSM kernels).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .bn254 import P as _P_INT
from .bn254 import R as _R_INT
from .limbs import LIMB_BITS, LIMB_MASK, NUM_LIMBS, int_to_limbs

L = NUM_LIMBS
B = LIMB_BITS
MASK = LIMB_MASK
R_BITS = L * B  # 264


@dataclass(frozen=True)
class FieldSpec:
    """Montgomery parameters for one prime modulus, as host numpy constants
    (broadcast into kernels as (22, 1) columns)."""

    modulus: int
    p_limbs: np.ndarray          # (22,)
    p_prime_limbs: np.ndarray    # (22,)  -p^{-1} mod 2^264
    r_mod_p: int                 # R mod p  (Montgomery one)
    r2_limbs: np.ndarray         # (22,)  R^2 mod p
    one_mont: np.ndarray         # (22,)  R mod p

    @staticmethod
    @lru_cache(maxsize=None)
    def make(modulus: int) -> "FieldSpec":
        r = 1 << R_BITS
        p_prime = (-pow(modulus, -1, r)) % r
        r_mod = r % modulus
        r2 = r_mod * r_mod % modulus
        return FieldSpec(
            modulus=modulus,
            p_limbs=np.asarray(int_to_limbs(modulus)),
            p_prime_limbs=np.array(
                [(p_prime >> (B * i)) & MASK for i in range(L)], dtype=np.int32),
            r_mod_p=r_mod,
            r2_limbs=np.asarray(int_to_limbs(r2)),
            one_mont=np.asarray(int_to_limbs(r_mod)),
        )


FR = FieldSpec.make(_R_INT)
FQ = FieldSpec.make(_P_INT)


@lru_cache(maxsize=None)
def _shift_consts(modulus: int):
    """Host constant matrices for the lazy REDC:
    - PP_TRUNC (22, 22): column j = p' shifted up by j limbs, truncated mod R
    - P_SHIFT (44, 22):  column j = p  shifted up by j limbs
    """
    spec = FieldSpec.make(modulus)
    pp = np.zeros((L, L), dtype=np.int32)
    ps = np.zeros((2 * L, L), dtype=np.int32)
    for j in range(L):
        for k in range(L):
            if j + k < L:
                pp[j + k, j] = spec.p_prime_limbs[k]
            ps[j + k, j] = spec.p_limbs[k]
    return pp, ps


def _col(spec_arr: np.ndarray) -> jnp.ndarray:
    """(22,) host constant -> (22, 1) broadcastable column."""
    return jnp.asarray(spec_arr, dtype=jnp.int32)[:, None]


# ---------------------------------------------------------------------------
# carries and canonicalization
# ---------------------------------------------------------------------------


def carry_chain(cols: list, out_limbs: int) -> list:
    """Exact sequential carry propagation: input columns may hold any int32
    values (including negatives -- arithmetic shift handles borrow), output is
    `out_limbs` limbs in [0, 4095] plus any final carry folded into the last
    limb position (callers guarantee no overflow there)."""
    out = []
    carry = None
    for i in range(out_limbs):
        v = cols[i] if i < len(cols) else jnp.zeros_like(cols[0])
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> B
    return out


def carry_scan(cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """`carry_chain` on a stacked (K, ...) column array via lax.scan -- same
    exact semantics, O(1) traced graph size.  Final carry out of the last
    limb is dropped (callers guarantee it is zero or reduce mod R)."""
    import jax

    k = cols.shape[0]
    if k < out_limbs:
        padding = jnp.zeros((out_limbs - k,) + cols.shape[1:], cols.dtype)
        cols = jnp.concatenate([cols, padding], axis=0)
    elif k > out_limbs:
        cols = cols[:out_limbs]

    def body(carry, col):
        v = col + carry
        return v >> B, v & MASK

    _, out = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols)
    return out


def _sub_const_if_ge(limbs: list, const_limbs) -> list:
    """Branchless conditional subtract of a 22-limb host constant: returns
    value - c if value >= c else value (canonical limbs in/out)."""
    diff = []
    borrow = jnp.zeros_like(limbs[0])
    for i in range(L):
        t = limbs[i] - int(const_limbs[i]) - borrow
        borrow = (t >> B) & 1          # 1 iff t < 0 (t in [-4097, 4095])
        diff.append(t & MASK)
    ge = borrow == 0                   # no final borrow -> value >= c
    return [jnp.where(ge, d, x) for d, x in zip(diff, limbs)]


def _sub_p_if_ge(limbs: list, spec: FieldSpec) -> list:
    """Conditional subtract: given canonical-limb value < 2p, return value
    mod p."""
    return _sub_const_if_ge(limbs, spec.p_limbs)


# ---------------------------------------------------------------------------
# core ops (operate on lists of 22 same-shaped int32 arrays)
# ---------------------------------------------------------------------------


def _unstack(x: jnp.ndarray) -> list:
    return [x[i] for i in range(L)]


def _stack(limbs: list) -> jnp.ndarray:
    return jnp.stack(limbs, axis=0)


def add_canonical(a, b, spec: FieldSpec) -> jnp.ndarray:
    la, lb = _unstack(a), _unstack(b)
    s = [x + y for x, y in zip(la, lb)]
    s = carry_chain(s, L)
    return _stack(_sub_p_if_ge(s, spec))


def add(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Lazy-domain addition (see the lazy section below): full-width ops,
    output bound < 2.2p in redundant limbs."""
    return _jit_addsub12(spec.modulus, "add")(a, b)


def sub(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Lazy-domain subtraction: a - b + 4p, partially reduced."""
    return _jit_addsub12(spec.modulus, "sub")(a, b)


def neg(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    return _jit_addsub12(spec.modulus, "neg")(a, jnp.zeros_like(a))


@lru_cache(maxsize=None)
def _jit_addsub12(modulus: int, op: str):
    """Trace-once wrappers (see `mont_mul`): the unrolled bodies trace once
    per shape; callers emit one inlined call eqn each."""
    hspec = FieldSpec.make(modulus)
    if op == "add":
        f = lambda a, b: lazy_reduce(lazy_add(a, b), hspec)              # noqa: E731
    elif op == "sub":
        f = lambda a, b: lazy_reduce(lazy_sub(a, b, hspec, k=4), hspec)  # noqa: E731
    else:
        f = lambda a, b: lazy_reduce(lazy_sub(b, a, hspec, k=4), hspec)  # noqa: E731
    return jax.jit(f)



def _mul_cols_full(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product columns of two stacked limb arrays: a (22, ...),
    b (22, ...) or (22, 1)-broadcastable -> (43, ...) column sums.

    Static form: 22 window accumulations a[i] * b -> columns [i, i+22), each
    a single whole-array multiply + static-slice add.  No control flow (XLA
    compile time for these kernels is dominated by nested loops, and the
    static graph also fuses best); column sums stay < 22 * 2^24."""
    # Unrolled per-column accumulation: 484 elementwise multiplies that XLA
    # fuses into one loop over the batch -- no sliding-window accumulator
    # (dynamic-update-slice variants force large intermediate copies), no
    # scatters (pathological compile).  Compile cost is one-time per kernel
    # and persisted by the compilation cache.
    if b.shape != a.shape:
        b = jnp.broadcast_to(b, a.shape)
    la = [a[i] for i in range(L)]
    lb = [b[j] for j in range(L)]
    cols = [None] * (2 * L - 1)
    for i in range(L):
        ai = la[i]
        for j in range(L):
            prod = ai * lb[j]
            k = i + j
            cols[k] = prod if cols[k] is None else cols[k] + prod
    return jnp.stack(cols, axis=0)


def carry_stack(cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Unrolled exact carry propagation on a stacked (K, ...) column array ->
    (out_limbs, ...) canonical limbs.  Final carry out of the top limb is
    dropped (callers guarantee it is zero or work mod R)."""
    k = cols.shape[0]
    out = []
    carry = None
    for i in range(out_limbs):
        v = cols[i] if i < k else jnp.zeros_like(cols[0])
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> B
    return jnp.stack(out, axis=0)



def mont_mul(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p in the lazy domain: inputs with
    |value| < 16p, output |value| < 1.5p (redundant limbs).

    Routed through a per-modulus `jax.jit` wrapper so the ~1k-op unrolled
    `lazy_mul` body is traced once per shape and each call site emits one
    inlined call eqn (kernels with tens of muls trace ~5x faster; the
    compiled program is unchanged)."""
    return _jit_lazy_mul(spec.modulus)(a, jnp.broadcast_to(b, a.shape))


@lru_cache(maxsize=None)
def _jit_lazy_mul(modulus: int):
    hspec = FieldSpec.make(modulus)
    return jax.jit(lambda a, b: lazy_mul(a, b, hspec))


def mont_mul_const(a: jnp.ndarray, c_mont: np.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery product with a host-resident constant (Montgomery form)."""
    c = jnp.asarray(np.asarray(c_mont).reshape((L,) + (1,) * (a.ndim - 1)),
                    jnp.int32)
    return lazy_mul(a, jnp.broadcast_to(c, a.shape), spec)


def mont_mul_canonical(a, b, spec: FieldSpec) -> jnp.ndarray:
    t = _mul_cols_full(a, jnp.broadcast_to(b, a.shape))
    return _redc_stacked(t, spec)


def _redc_stacked(t: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """One-shot Montgomery reduction of stacked product columns (43, ...)
    -> (22, ...) canonical limbs."""
    batch = t.shape[1:]
    t_low = carry_stack(t[:L], L)                          # t mod R, 12-bit
    pp = jnp.asarray(spec.p_prime_limbs).reshape((L,) + (1,) * len(batch))
    m_cols = _mul_cols_full(t_low, pp)
    m = carry_stack(m_cols[:L], L)                         # (t p') mod R
    p = jnp.asarray(spec.p_limbs).reshape((L,) + (1,) * len(batch))
    mp = _mul_cols_full(m, p)                              # (43, ...)
    total = t + mp
    norm = carry_stack(total, 2 * L)                       # low 22 limbs == 0
    hi = [norm[L + i] for i in range(L)]
    return _stack(_sub_p_if_ge(hi, spec))





# ---------------------------------------------------------------------------
# Montgomery domain conversion
# ---------------------------------------------------------------------------


def to_mont(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    return mont_mul_const(a, spec.r2_limbs, spec)


def from_mont(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Lazy Montgomery rep -> canonical integer limbs (exact)."""
    c = lazy_to_canonical(a, spec)
    t = jnp.concatenate(
        [c, jnp.zeros((L - 1,) + c.shape[1:], dtype=jnp.int32)], axis=0)
    return _redc_stacked(t, spec)


def one_mont_like(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    return jnp.broadcast_to(_col(spec.one_mont), a.shape).astype(jnp.int32)


def zeros(shape, _spec: FieldSpec | None = None) -> jnp.ndarray:
    return jnp.zeros((L,) + tuple(shape), dtype=jnp.int32)


# ---------------------------------------------------------------------------
# predicates / selects
# ---------------------------------------------------------------------------


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """Elementwise zero test on canonical limbs -> bool array of batch shape."""
    return jnp.all(a == 0, axis=0)


def equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


def select(pred: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """pred: bool batch shape; a where pred else b."""
    return jnp.where(pred[None, ...], a, b)


# ---------------------------------------------------------------------------
# lazy (redundant-domain) arithmetic: full-width limb-array ops
# ---------------------------------------------------------------------------
#
# The canonical ops above manipulate per-limb rows ((1, N)-shaped vector ops),
# which wastes 7/8 of the VPU's sublanes and serializes 22-44-step carry
# chains.  The lazy domain trades canonical form for whole-array operations:
#
#   representation: (22, ...) int32 limbs, limb values in [-4, ~4300]
#                   (i.e. ~12-bit magnitude), element value magnitude < 16p
#   invariants:     every op ends with >= 1 full-width carry round;
#                   multiplications require |value| < 16p on both inputs and
#                   return |value| < 1.5p; add/sub grow the bound additively
#                   (callers -- the expression emitter -- track static bounds
#                   and renormalize if a chain would exceed 16p, which none of
#                   the protocol expressions do)
#
# Correctness does not depend on the bound tracking being tight -- bounds only
# guarantee no int32 overflow (columns < 2^31) and REDC range; all arithmetic
# is exact and `lazy_to_canonical` produces the unique canonical limbs.


def _carry_round(x: jnp.ndarray, mod_r: bool) -> jnp.ndarray:
    """One full-width carry round along the limb axis.  mod_r=True drops the
    carry out of the top limb (working mod 2^(12*K)); otherwise the top limb
    absorbs its carry un-masked (value-preserving, callers bound growth)."""
    c = x >> B
    masked = x & MASK
    shifted = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    y = masked + shifted
    if not mod_r:
        # top limb keeps its high bits instead of dropping them
        y = jnp.concatenate([y[:-1], x[-1:] + shifted[-1:]], axis=0)
    return y


def lazy_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _carry_round(a + b, mod_r=False)


def lazy_sub(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec,
             k: int = 4) -> jnp.ndarray:
    """a - b + k*p (keeps values positive for |b| < k*p)."""
    kp = np.asarray(int_to_limbs(k * spec.modulus))  # k*p < 2^264 for k <= 16
    kp_col = jnp.asarray(kp).reshape((L,) + (1,) * (a.ndim - 1))
    return _carry_round(a - b + kp_col, mod_r=False)


_F32_WEIGHTS = None


def _f32_weights(ndim: int):
    w = np.ldexp(np.ones(L), 12 * np.arange(L) - 252).astype(np.float32)
    return jnp.asarray(w).reshape((L,) + (1,) * (ndim - 1))


def lazy_mul(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Montgomery product in the lazy domain: |inputs| < 16p ->
    |output| < 1.5p.  Product columns are accumulated per-column (unrolled
    elementwise graphs fuse without materializing padded (44, ...) buffers),
    carries are full-width rounds."""
    la = [a[i] for i in range(L)]
    lb = [b[i] for i in range(L)]
    # T = a * b column sums (43 columns)
    t_cols = [None] * (2 * L - 1)
    for i in range(L):
        ai = la[i]
        for j in range(L):
            prod = ai * lb[j]
            k = i + j
            t_cols[k] = prod if t_cols[k] is None else t_cols[k] + prod
    t_cols.append(jnp.zeros_like(t_cols[0]))     # column 43
    acc = jnp.stack(t_cols, axis=0)              # (44, batch)
    acc = _carry_round(_carry_round(acc, mod_r=False), mod_r=False)

    # m = (t mod R) * p' mod R, truncated schoolbook with scalar constants
    pp = spec.p_prime_limbs
    t_low = [acc[i] for i in range(L)]
    m_cols = [None] * L
    for j in range(L):
        tj = t_low[j]
        for k in range(j, L):
            c = int(pp[k - j])
            if c == 0:
                continue
            term = tj * c
            m_cols[k] = term if m_cols[k] is None else m_cols[k] + term
    m_cols = [jnp.zeros_like(acc[0]) if x is None else x for x in m_cols]
    m = jnp.stack(m_cols, axis=0)
    m = _carry_round(_carry_round(m, mod_r=True), mod_r=True)

    # total = T + m*p (per-column with scalar constants)
    pl = spec.p_limbs
    ml = [m[i] for i in range(L)]
    mp_cols = [None] * (2 * L)
    for j in range(L):
        mj = ml[j]
        for k in range(L):
            c = int(pl[k])
            if c == 0:
                continue
            kk = j + k
            term = mj * c
            mp_cols[kk] = term if mp_cols[kk] is None else mp_cols[kk] + term
    mp_cols = [jnp.zeros_like(acc[0]) if x is None else x for x in mp_cols]
    total = acc + jnp.stack(mp_cols, axis=0)
    total = _carry_round(_carry_round(total, mod_r=False), mod_r=False)

    # low 22 limbs form a value in {0, R} (divisible by R, bounded): compute
    # the spill bit with an exact-enough float32 dot and fold into the result
    low = total[:L]
    hi = total[L:]
    s = jnp.sum(low.astype(jnp.float32) * _f32_weights(low.ndim), axis=0)
    spill = (s > 2048.0).astype(jnp.int32)
    hi = jnp.concatenate([hi[:1] + spill[None], hi[1:]], axis=0)
    return hi


def lazy_from_canonical(a: jnp.ndarray) -> jnp.ndarray:
    """Canonical limbs are valid lazy limbs."""
    return a


def lazy_to_canonical(a: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Exact normalization: add 16p (forces positivity), sequential carry,
    then binary-weighted conditional subtracts down to [0, p)."""
    kp = jnp.asarray(int_to_limbs(16 * spec.modulus)).reshape(
        (L,) + (1,) * (a.ndim - 1))
    x = a + kp
    limbs = [x[i] for i in range(L)]
    limbs = carry_chain(limbs, L)
    # value < 16p + 16p = 32p: subtract 16p, 8p, 4p, 2p, p conditionally
    for kk in (16, 8, 4, 2, 1):
        limbs = _sub_const_if_ge(
            limbs, np.asarray(int_to_limbs(kk * spec.modulus)))
    return _stack(limbs)


def lazy_reduce(x: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Partial reduction: subtract q*p with q estimated from a float32 limb
    dot product, capping |value| back to < 2.2p.  Exact (q is an integer;
    only its choice is approximate, and the slack absorbs the estimate
    error).  Input |value| < ~40p, limbs |.| < 2^24."""
    est = jnp.sum(x.astype(jnp.float32) * _f32_weights(x.ndim), axis=0)
    ratio = float(spec.modulus) / float(2.0 ** 252)
    q = jnp.maximum(jnp.floor(est / ratio) - 1.0, 0.0).astype(jnp.int32)
    p_col = jnp.asarray(spec.p_limbs, jnp.int32).reshape(
        (L,) + (1,) * (x.ndim - 1))
    return _carry_round(x - q[None] * p_col, mod_r=False)


def host_col_to_int(col: np.ndarray, modulus: int) -> int:
    """Exact value of one (22, 1) possibly-lazy limb column, reduced mod the
    modulus and converted out of the Montgomery domain."""
    total = 0
    for i in range(L):
        total += int(col[i, 0]) << (B * i)
    r_inv = pow(1 << R_BITS, -1, modulus)
    return total % modulus * r_inv % modulus
