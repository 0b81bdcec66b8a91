"""In-chunk NTT on the MXU: DFT-256 stages as exact bf16 matmuls.

Replaces the 16-stage radix-2 in-chunk kernel of `poly/ntt.py` (v1, 12-bit
VPU butterflies with an HBM round-trip per stage) for the same role: the
length-2^16 transform inside the chunked Bailey/4-step NTT that backs
`poly_mul_ntt` (the reference's polynomial products,
`/root/reference/pcs/src/ipa.rs:147-148`).

Math (within one chunk of n = 65536 = 256 x 256 elements, j = j1 + 256*j2):

    X^[k2 + 256*k1] = sum_{j1} W256[k1,j1] * w^(j1*k2)
                        * ( sum_{j2} W256[k2,j2] * x[j1 + 256*j2] )

i.e. stage 1 contracts the slow index j2, a pointwise twiddle w^(j1*k2),
a (256, 256) transpose, and stage 2 contracts again -- both stages are the
SAME kernel shape: a field-valued (256x256) constant matrix times a
(256, lanes) field-valued block.

TPU mapping (exactness argument inline):

- field elements are 33x8-bit canonical Montgomery limbs (fields/device8);
  operands are normal-form integers in [-1, 256] -- exactly representable
  in bfloat16;
- the limb-convolution x matrix contraction factorizes: for each x-limb j'
  one bf16 MXU matmul (33*256, 256) @ (256, lanes) with f32 accumulation
  (partial sums <= 256 * 255 * 256 < 2^24: exact);
- the 33 per-limb products accumulate into 65 diagonal columns in int32
  (<= 33 * 2^24 < 2^30: exact), then ONE Montgomery reduction per output
  element (REDC linearity, `device8.redc_columns`) -- a 256x cheaper
  reduction than per-product mont_muls;
- output transform order is digit-transposed (k1-slow, k2-fast); the
  inverse consumes exactly that order (any fixed permutation cancels in
  NTT -> pointwise -> INTT, `poly/ntt.py` doc).

The inverse matrices fold 1/256 each, so a round trip through
`chunk_ntt8(..., inverse=True)` is exactly the identity -- the caller's
global 1/N scaling shrinks to the chunk-count level.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.bn254 import FR_ROOT_OF_UNITY, FR_TWO_ADICITY, R
from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ..fields import device as fd12  # noqa: E402
from ..fields import device8 as f8  # noqa: E402
from ..fields import pallas8 as p8  # noqa: E402

L = f8.L
N = 256          # DFT radix per stage
LOG2_CHUNK = 16
CHUNK = 1 << LOG2_CHUNK
BN = 128         # lane block per grid step (Pallas lane-tiling minimum)

_R_MONT = (1 << f8.R_BITS) % R


def _root_of_unity(log2_n: int) -> int:
    assert log2_n <= FR_TWO_ADICITY
    return pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - log2_n), R)


def _limbs8_mat(vals: list[int]) -> np.ndarray:
    """Field ints -> (33, len) f32 canonical limbs via a bytes round-trip."""
    raw = b"".join(int(v).to_bytes(L, "little") for v in vals)
    a = np.frombuffer(raw, dtype=np.uint8).reshape(len(vals), L)
    return a.astype(np.float32).T


@functools.lru_cache(maxsize=None)
def _w_matrix(inverse: bool) -> np.ndarray:
    """(33*256, 256) f32: stage matrix in Montgomery form, rows (limb, k),
    cols j.  Forward: w256^(k*j); inverse: w256^(-k*j) / 256 (scale folded,
    so fwd o inv == identity with no external scaling)."""
    w = pow(_root_of_unity(LOG2_CHUNK), 256, R)   # order-256 root
    if inverse:
        w = pow(w, R - 2, R)
    inv_n = pow(N, R - 2, R) if inverse else 1
    vals = []
    for k in range(N):
        wk = pow(w, k, R)
        cur = inv_n % R
        row = []
        for _j in range(N):
            row.append(cur * _R_MONT % R)
            cur = cur * wk % R
        vals.append(row)
    flat = [vals[k][j] for k in range(N) for j in range(N)]
    m = _limbs8_mat(flat).reshape(L, N, N)          # (33, k, j)
    return np.ascontiguousarray(m.reshape(L * N, N))


@functools.lru_cache(maxsize=None)
def _twiddle_table(inverse: bool) -> np.ndarray:
    """(33, 256, 256) f32 Montgomery: T[k2, j1] = w^(±k2*j1), w of order
    2^16."""
    w = _root_of_unity(LOG2_CHUNK)
    if inverse:
        w = pow(w, R - 2, R)
    vals = []
    for k2 in range(N):
        wk = pow(w, k2, R)
        cur = 1
        for _j1 in range(N):
            vals.append(cur * _R_MONT % R)
            cur = cur * wk % R
    return _limbs8_mat(vals).reshape(L, N, N)


def _int32_carries(o: jnp.ndarray, rounds: int) -> jnp.ndarray:
    """Exact value-preserving int32 carry rounds along axis 0 (arithmetic
    shifts = floor division, so negative columns carry correctly; the top
    row absorbs its carry un-split, mirroring `carry_round(mod_r=False)`)."""
    x = o
    for _ in range(rounds):
        c = x >> 8
        rem = x - (c << 8)
        shifted = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
        y = rem + shifted
        x = jnp.concatenate([y[:-1], x[-1:] + shifted[-1:]], axis=0)
    return x


def _ntt_body(variant: str, c_ref, w_ref, x_ref, t_ref, o_ref):
    """One lane block: [pre-twiddle,] 33 MXU matmuls accumulating diagonal
    int32 columns, one REDC, [post-twiddle,] normal form, [transpose]."""
    spec = p8.unpack_spec(R, c_ref[:])
    x = x_ref[:]                                     # (33, 256, BN)
    if "pre" in variant:
        x = f8.normal_form(f8.mont_mul(x, t_ref[:], spec))
    bn = x.shape[-1]
    cols: list = [None] * (2 * L)
    w = w_ref[:]                                     # (33*256, 256) bf16
    for jp in range(L):
        prod = jnp.dot(w, x[jp].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)   # (8448, BN)
        p3 = prod.reshape(L, N, bn).astype(jnp.int32)
        for i in range(L):
            c = jp + i
            cols[c] = p3[i] if cols[c] is None else cols[c] + p3[i]
    zero = jnp.zeros((N, bn), jnp.int32)
    acc = jnp.stack([zero if c is None else c for c in cols], axis=0)
    t = _int32_carries(acc, 3).astype(jnp.float32)   # cols in [-?, ~2^9]
    out = f8.redc_columns(t, spec, carries=2)        # (33, 256, BN) lazy
    if "post" in variant:
        out = f8.mont_mul(out, t_ref[:], spec)
    out = f8.normal_form(out)
    if "T" in variant:
        out = jnp.swapaxes(out, 1, 2)                # (33, BN, 256)
    o_ref[:] = out


@functools.lru_cache(maxsize=None)
def _ntt_call(variant: str, inverse: bool):
    """variant: subset of {"pre", "post", "T"} encoded in a string.
    Returns jit(run)(x, [t]) over a full (33, 256, 256) chunk block."""
    pack = p8.consts_pack(R)
    w_op = jnp.asarray(_w_matrix(inverse), jnp.bfloat16)
    has_t = ("pre" in variant) or ("post" in variant)
    grid = (N // BN,)
    cspec = pl.BlockSpec((p8._PACK_ROWS, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((L * N, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((L, N, BN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((L, N, BN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    if "T" in variant:
        ospec = pl.BlockSpec((L, BN, N), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    else:
        ospec = pl.BlockSpec((L, N, BN), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    in_specs = [cspec, wspec, xspec] + ([tspec] if has_t else [])

    def run(x, t=None):
        args = (pack, w_op, x) + ((t,) if has_t else ())
        body = functools.partial(
            _ntt_body, variant) if has_t else (
            lambda c, w, xx, o: _ntt_body(variant, c, w, xx, None, o))
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((L, N, N), jnp.float32),
            grid=grid,
            in_specs=in_specs,
            out_specs=ospec,
            interpret=p8._interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)

    from ..utils.aotcache import aot_wrap

    return aot_wrap(f"ntt8.{variant}.{int(inverse)}", run, deps=('poly', 'fields', 'utils/jaxcfg.py'))


@functools.lru_cache(maxsize=None)
def _t_op(inverse: bool):
    return jnp.asarray(_twiddle_table(inverse), jnp.float32)


def _chunk_ntt8_8(x8: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """(33, 256, 256) normal-form Montgomery limbs -> transformed chunk.
    Forward output order: element X^[k2 + 256*k1] at [k1, k2]."""
    if not inverse:
        b = _ntt_call("postT", False)(x8, _t_op(False))
        return _ntt_call("", False)(b)
    a = _ntt_call("T", True)(x8)
    return _ntt_call("pre", True)(a, _t_op(True))


@jax.jit
def _k_12to8c(c12: jnp.ndarray) -> jnp.ndarray:
    x = f8.from12(fd12.lazy_to_canonical(c12, fd12.FR))
    return x.reshape(L, N, N)


@jax.jit
def _k_8to12c(c8: jnp.ndarray) -> jnp.ndarray:
    x = f8.lazy_to_canonical(c8.reshape(L, CHUNK), f8.FR8)
    return f8.to12(x)


def chunk_ntt8(c12: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """In-chunk transform on a (22, 65536) 12-bit lazy Montgomery chunk;
    returns the same representation.  Drop-in for the in-chunk kernels of
    `poly/ntt.py` up to output permutation (internally consistent) and
    scaling: the inverse already folds 1/2^16, so the caller's global
    scaling reduces to the cross-chunk level."""
    x8 = _k_12to8c(c12)
    y8 = _chunk_ntt8_8(x8, inverse)
    return _k_8to12c(y8)
