"""TPU execution engine: chunked, fixed-shape XLA programs over limb arrays.

Design (TPU-first, see SURVEY §7):

- A device vector (`DVec`) is a list of fixed-shape (22, CHUNK) int32 chunks
  in canonical Montgomery limb form plus a logical length.  Every kernel is
  compiled for exactly one shape, so each op compiles once per process (and is
  reused across processes via the persistent compilation cache); host loops
  stream chunks through the compiled programs.
- Vectors smaller than one chunk are handled by the exact big-int
  `HostEngine` -- the protocol tail (last sumcheck rounds, tiny openings) is
  O(CHUNK) work where dispatch overhead would dominate.  Results are
  bit-identical either way, so the handoff point is purely a tuning knob.
- Reductions (sums, inner products) are computed as *lazy limb sums* on
  device (int32 column sums of canonical limbs: 2^16 * 2^12 < 2^28, no
  overflow) and finalized exactly on the host -- the device does the O(N),
  the host does the O(#chunks).
- Expressions (`piops.virtual_poly`) are compiled once per structure with
  challenge constants passed as runtime arguments, so new proofs never
  recompile.

Engine ops not yet device-accelerated fall back to the host engine
(documented per-op); they are replaced as the MSM / NTT kernels land.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

from ..fields.bn254 import R
from ..fields.scalar import inv
from ..utils.jaxcfg import configure_jax
from . import host as host_mod

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device as fd  # noqa: E402
from ..fields.limbs import ints_to_limbs, limbs_to_ints  # noqa: E402
from . import sumcheck8 as sc8  # noqa: E402
from .sumcheck8 import SlotView  # noqa: E402

LOG2_CHUNK = 16
CHUNK = 1 << LOG2_CHUNK

SPEC = fd.FR
R_INV = pow(1 << fd.R_BITS, -1, R)
_LIMB_WEIGHTS = [1 << (fd.B * i) for i in range(fd.L)]


@dataclass
class DVec:
    """Device vector: canonical Montgomery limb chunks of shape (22, CHUNK)."""

    chunks: list
    length: int


def _mont_const_np(x: int) -> np.ndarray:
    """Canonical int -> (22, 1) Montgomery-form limb constant."""
    xm = int(x) % R * ((1 << fd.R_BITS) % R) % R
    return ints_to_limbs([xm])  # (22, 1)


def _lazy_to_int(lazy: np.ndarray) -> int:
    """(22,) int64 lazy limb sums -> canonical int (the represented value is
    in Montgomery form; multiply by R^-1)."""
    total = 0
    for i in range(fd.L):
        total += int(lazy[i]) * _LIMB_WEIGHTS[i]
    return total % R * R_INV % R


# ---------------------------------------------------------------------------
# fixed-shape kernels (compiled lazily, cached per engine process)
# ---------------------------------------------------------------------------


@jax.jit
def _k_to_mont(x):
    return fd.to_mont(x, SPEC)


@jax.jit
def _k_from_mont(x):
    return fd.from_mont(x, SPEC)


@jax.jit
def _k_add(a, b):
    return fd.add(a, b, SPEC)


@jax.jit
def _k_sub(a, b):
    return fd.sub(a, b, SPEC)


@jax.jit
def _k_mul(a, b):
    return fd.mont_mul(a, b, SPEC)


@jax.jit
def _k_add_scalar(a, c):
    return fd.add(a, jnp.broadcast_to(c, a.shape), SPEC)


@jax.jit
def _k_mul_scalar(a, c):
    return fd.mont_mul(a, jnp.broadcast_to(c, a.shape), SPEC)


@jax.jit
def _k_lazy_sum(x):
    return jnp.sum(x, axis=1)  # (22,) int32; 2^16 * 4095 < 2^28


@jax.jit
def _k_inner_partial(a, b):
    return jnp.sum(fd.mont_mul(a, b, SPEC), axis=1)


@jax.jit
def _k_fold(c0, c1, r):
    """Two input chunks -> one output chunk, binding the LSB variable."""
    def half(c):
        lo = c[:, 0::2]
        hi = c[:, 1::2]
        return fd.add(lo, fd.mont_mul(jnp.broadcast_to(r, lo.shape),
                                      fd.sub(hi, lo, SPEC), SPEC), SPEC)
    return jnp.concatenate([half(c0), half(c1)], axis=1)


@jax.jit
def _k_fold_single(c0, r):
    lo = c0[:, 0::2]
    hi = c0[:, 1::2]
    return fd.add(lo, fd.mont_mul(jnp.broadcast_to(r, lo.shape),
                                  fd.sub(hi, lo, SPEC), SPEC), SPEC)


def _two_level_prefix_scan(x, combine, identity_col):
    """Inclusive prefix scan of (22, C) along the element axis as a
    log-depth Hillis-Steele ladder: log2(C) FULL-WIDTH combine steps.

    Replaces the blocked two-level lax.scan (256 sequential narrow steps,
    measured latency-bound at ~0.5 s per 2^16 chunk -- ~20 s of the 2^16-row
    prove was these scans).  Full-width steps run at the vector-kernel rate;
    the combine bodies are trace-once jitted (fd.mont_mul/add), so the
    unrolled ladder stays ~log2(C) call eqns, not inlined bodies."""
    C = x.shape[1]
    idx = jax.lax.iota(jnp.int32, C)
    ident = jnp.broadcast_to(identity_col, (fd.L, C)).astype(x.dtype)
    v = x
    sh = 1
    while sh < C:
        shifted = jnp.concatenate([ident[:, :sh], v[:, :-sh]], axis=1)
        comb = combine(v, shifted)
        v = jnp.where((idx >= sh)[None, :], comb, v)
        sh *= 2
    return v


@jax.jit
def _k_prefix_mul_scan(x):
    one = jnp.asarray(SPEC.one_mont, jnp.int32)[:, None]
    return _two_level_prefix_scan(
        x, lambda a, b: fd.mont_mul(a, b, SPEC), one)


@jax.jit
def _k_prefix_add_scan(x):
    zero = jnp.zeros((fd.L, 1), jnp.int32)
    return _two_level_prefix_scan(x, lambda a, b: fd.add(a, b, SPEC), zero)


@jax.jit
def _k_binv_combine(p_incl, s_incl, chunk_scalar, one_col):
    """out = exclusive_prefix * exclusive_suffix * chunk_scalar."""
    pe = jnp.concatenate([jnp.broadcast_to(one_col, (fd.L, 1)),
                          p_incl[:, :-1]], axis=1)
    se = jnp.concatenate([s_incl[:, 1:],
                          jnp.broadcast_to(one_col, (fd.L, 1))], axis=1)
    return fd.mont_mul(fd.mont_mul(pe, se, SPEC),
                       jnp.broadcast_to(chunk_scalar, pe.shape), SPEC)


@jax.jit
def _k_suffix_mul_scan(x):
    one = jnp.asarray(SPEC.one_mont, jnp.int32)[:, None]
    s = _two_level_prefix_scan(
        x[:, ::-1], lambda a, b: fd.mont_mul(a, b, SPEC), one)
    return s[:, ::-1]


def _powtable_kernel(log2_size: int):
    @jax.jit
    def kern(pow_stack):
        # pow_stack: (log2_size, 22, 1) with pow_stack[k] = x^(2^k) (mont)
        size = 1 << log2_size
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
        acc = jnp.broadcast_to(jnp.asarray(SPEC.one_mont, jnp.int32)[:, None],
                               (fd.L, size)).astype(jnp.int32)
        for k in range(log2_size):
            bit = (idx >> k) & 1
            mult = fd.mont_mul(acc, jnp.broadcast_to(pow_stack[k], acc.shape),
                               SPEC)
            acc = jnp.where(bit.astype(bool), mult, acc)
        return acc
    return kern


_POWTABLE_KERNELS: dict = {}


def _powtable_chunk(x: int, log2_size: int = LOG2_CHUNK) -> jnp.ndarray:
    """Device table of x^j (Montgomery) for j in [0, 2^log2_size)."""
    if log2_size not in _POWTABLE_KERNELS:
        _POWTABLE_KERNELS[log2_size] = _powtable_kernel(log2_size)
    pows = []
    cur = x % R
    for _ in range(log2_size):
        pows.append(_mont_const_np(cur))
        cur = cur * cur % R
    stack = jnp.asarray(np.stack(pows, axis=0))
    return _POWTABLE_KERNELS[log2_size](stack)


# -- expression kernel codegen ----------------------------------------------

_EXPR_KERNELS: dict = {}


def _emit(expr, tables: dict, consts, counter: list):
    from ..piops import virtual_poly as vp

    if isinstance(expr, vp.Input):
        return tables[expr.index]
    if isinstance(expr, vp.Const):
        k = counter[0]
        counter[0] += 1
        some = next(iter(tables.values()))
        return jnp.broadcast_to(consts[k], some.shape)
    if isinstance(expr, vp.Add):
        return fd.add(_emit(expr.left, tables, consts, counter),
                      _emit(expr.right, tables, consts, counter), SPEC)
    if isinstance(expr, vp.Mul):
        return fd.mont_mul(_emit(expr.left, tables, consts, counter),
                           _emit(expr.right, tables, consts, counter), SPEC)
    raise TypeError(f"unknown expr node {expr!r}")


def _get_eval_kernel(expr, used: tuple):
    structure, _ = expr.key()
    key = ("eval", structure, used)
    if key not in _EXPR_KERNELS:
        def kern(consts, *table_chunks):
            tables = {idx: tc for idx, tc in zip(used, table_chunks)}
            return _emit(expr, tables, consts, [0])
        _EXPR_KERNELS[key] = jax.jit(kern)
    return _EXPR_KERNELS[key]


def _get_fused_round_kernel(expr, used: tuple, degree: int):
    """Fused kernel: fold two input chunks at the previous challenge r, then
    evaluate the round messages on the folded chunk.  Returns
    (folded_chunks..., (degree+1, 22) lazy sums).  One dispatch per
    chunk-pair per round instead of fold+messages passes."""
    structure, _ = expr.key()
    key = ("fused", structure, used, degree)
    if key not in _EXPR_KERNELS:
        t_np = np.stack([_mont_const_np(t) for t in range(degree + 1)],
                        axis=1)  # (22, T, 1)

        def kern(consts, r, *chunk_pairs):
            # chunk_pairs: for each used table, (c0, c1)
            t_col = jnp.asarray(t_np)
            folded = []
            vals = {}
            for idx, (c0, c1) in zip(used, zip(chunk_pairs[0::2],
                                               chunk_pairs[1::2])):
                f = _k_fold_body(c0, c1, r)
                folded.append(f)
                lo = f[:, None, 0::2]
                hi = f[:, None, 1::2]
                diff = fd.sub(hi, lo, SPEC)
                shape = (fd.L, degree + 1, lo.shape[2])
                vals[idx] = fd.add(
                    jnp.broadcast_to(lo, shape),
                    fd.mont_mul(jnp.broadcast_to(t_col, shape),
                                jnp.broadcast_to(diff, shape), SPEC), SPEC)
            h = _emit_nd(expr, vals, consts, [0])
            sums = jnp.sum(h, axis=2).transpose(1, 0)
            return (*folded, sums)
        _EXPR_KERNELS[key] = jax.jit(kern)
    return _EXPR_KERNELS[key]


def _k_fold_body(c0, c1, r):
    def half(c):
        lo = c[:, 0::2]
        hi = c[:, 1::2]
        return fd.add(lo, fd.mont_mul(jnp.broadcast_to(r, lo.shape),
                                      fd.sub(hi, lo, SPEC), SPEC), SPEC)
    return jnp.concatenate([half(c0), half(c1)], axis=1)


def _get_msgs_kernel(expr, used: tuple, degree: int):
    structure, _ = expr.key()
    key = ("msgs", structure, used, degree)
    if key not in _EXPR_KERNELS:
        # interpolation nodes t = 0..degree stacked along a new axis so the
        # expression is traced once, not degree+1 times (compile-time control)
        t_np = np.stack([_mont_const_np(t) for t in range(degree + 1)],
                        axis=1)  # (22, T, 1)

        def kern(consts, *table_chunks):
            t_col = jnp.asarray(t_np)
            vals = {}
            for i, tc in zip(used, table_chunks):
                lo = tc[:, None, 0::2]           # (22, 1, C/2)
                hi = tc[:, None, 1::2]
                diff = fd.sub(hi, lo, SPEC)
                shape = (fd.L, degree + 1, lo.shape[2])
                vals[i] = fd.add(
                    jnp.broadcast_to(lo, shape),
                    fd.mont_mul(jnp.broadcast_to(t_col, shape),
                                jnp.broadcast_to(diff, shape), SPEC), SPEC)
            h = _emit_nd(expr, vals, consts, [0])
            return jnp.sum(h, axis=2).transpose(1, 0)  # (T, 22)
        _EXPR_KERNELS[key] = jax.jit(kern)
    return _EXPR_KERNELS[key]


def _emit_nd(expr, tables: dict, consts, counter: list):
    from ..piops import virtual_poly as vp

    if isinstance(expr, vp.Input):
        return tables[expr.index]
    if isinstance(expr, vp.Const):
        k = counter[0]
        counter[0] += 1
        some = next(iter(tables.values()))
        return jnp.broadcast_to(consts[k][:, None, :], some.shape)
    if isinstance(expr, vp.Add):
        return fd.add(_emit_nd(expr.left, tables, consts, counter),
                      _emit_nd(expr.right, tables, consts, counter), SPEC)
    if isinstance(expr, vp.Mul):
        return fd.mont_mul(_emit_nd(expr.left, tables, consts, counter),
                           _emit_nd(expr.right, tables, consts, counter), SPEC)
    raise TypeError(f"unknown expr node {expr!r}")


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------


class TpuEngine:
    """Hybrid device/host engine.  Device path for vectors of >= one chunk
    (2^16 elements), exact host big-int path below."""

    name = "tpu"

    def __init__(self):
        self.host = host_mod.HostEngine()
        self._one_col = jnp.asarray(SPEC.one_mont, jnp.int32)[:, None]

    # -- representation -----------------------------------------------------

    def is_vec(self, v) -> bool:
        return (isinstance(v, (DVec, SlotView)) or self.host.is_vec(v))

    def _is_dev(self, v) -> bool:
        return isinstance(v, DVec)

    @staticmethod
    def _impl8() -> bool:
        import os

        return os.environ.get("QUILL_SUMCHECK_IMPL", "8") == "8"

    @staticmethod
    def _sc8_max() -> int:
        """Largest table length the stacked 8-bit sumcheck state may hold.
        The Stacked8 buffer is n_slots * 132 B/elem and the fused round
        double-buffers it, so huge tables (the 2^24-cell permutation phase
        of a 2^22-row trace) run their first rounds through the chunked
        12-bit path (streams chunk pairs, no monolithic buffer) until they
        shrink under this bound."""
        import os

        return 1 << int(os.environ.get("QUILL_SC8_MAX_LOG2", "22"))

    # -- host spill (HBM relief for huge traces) ----------------------------

    def spill_vec(self, v) -> None:
        """Move a DVec's chunks to host numpy IN PLACE (device buffers are
        freed when the last reference drops).  Aliases of the DVec (proving
        key, witness lists) all observe the spill; `unspill_vec` restores
        device residency before the next device use.  No-op for host
        vectors."""
        if isinstance(v, DVec) and v.chunks and not isinstance(
                v.chunks[0], np.ndarray):
            v.chunks = [np.asarray(c) for c in v.chunks]

    def unspill_vec(self, v) -> None:
        if isinstance(v, DVec) and v.chunks and isinstance(
                v.chunks[0], np.ndarray):
            v.chunks = [jnp.asarray(c) for c in v.chunks]

    def vec_from_ints(self, xs):
        n = len(xs)
        if n < CHUNK:
            return self.host.vec_from_ints(xs)
        return self._dvec_from_ints([int(x) % R for x in xs])

    @staticmethod
    def _dvec_from_ints(vals: list[int]) -> "DVec":
        """Build a DVec from exact ints, zero-padding the last chunk.
        Physical padding beyond the logical length is always zero."""
        n = len(vals)
        padded = vals + [0] * (-n % CHUNK)
        limbs = ints_to_limbs(padded)
        chunks = []
        for j in range(len(padded) // CHUNK):
            c = jnp.asarray(limbs[:, j * CHUNK:(j + 1) * CHUNK])
            chunks.append(_k_to_mont(c))
        return DVec(chunks=chunks, length=n)

    def vec_to_ints(self, v):
        if isinstance(v, SlotView):
            return self.host.vec_from_ints(sc8.to_host_ints(v))
        if not self._is_dev(v):
            return self.host.vec_to_ints(v)
        outs = []
        for c in v.chunks:
            outs.extend(limbs_to_ints(np.asarray(_k_from_mont(c))))
        return self.host.vec_from_ints(outs[:v.length])

    def to_host_vec(self, v):
        return self.vec_to_ints(v)

    def vec_len(self, v) -> int:
        if isinstance(v, (DVec, SlotView)):
            return v.length
        return self.host.vec_len(v)

    # -- elementwise --------------------------------------------------------

    def _map2(self, kern, a, b):
        return DVec(chunks=[kern(x, y) for x, y in zip(a.chunks, b.chunks)],
                    length=a.length)

    def add(self, a, b):
        if not self._is_dev(a) and not self._is_dev(b):
            return self.host.add(a, b)
        a, b = self._align(a, b)
        return self._map2(_k_add, a, b)

    def sub(self, a, b):
        if not self._is_dev(a) and not self._is_dev(b):
            return self.host.sub(a, b)
        a, b = self._align(a, b)
        return self._map2(_k_sub, a, b)

    def mul(self, a, b):
        if not self._is_dev(a) and not self._is_dev(b):
            return self.host.mul(a, b)
        a, b = self._align(a, b)
        return self._map2(_k_mul, a, b)

    def _align(self, a, b):
        if self._is_dev(a) and self._is_dev(b):
            assert a.length == b.length
            return a, b
        # promote the host vector (rare)
        if not self._is_dev(a):
            a = self.vec_from_ints([int(x) for x in a])
        if not self._is_dev(b):
            b = self.vec_from_ints([int(x) for x in b])
        return a, b

    def add_scalar(self, v, c: int):
        if not self._is_dev(v):
            return self.host.add_scalar(v, c)
        cc = jnp.asarray(_mont_const_np(c))
        return DVec(chunks=[_k_add_scalar(x, cc) for x in v.chunks],
                    length=v.length)

    def mul_scalar(self, v, c: int):
        if not self._is_dev(v):
            return self.host.mul_scalar(v, c)
        cc = jnp.asarray(_mont_const_np(c))
        return DVec(chunks=[_k_mul_scalar(x, cc) for x in v.chunks],
                    length=v.length)

    # -- reductions ---------------------------------------------------------

    def vsum(self, v) -> int:
        if not self._is_dev(v):
            return self.host.vsum(v)
        total = np.zeros(fd.L, dtype=np.int64)
        for c in v.chunks:
            total += np.asarray(_k_lazy_sum(c), dtype=np.int64)
        return _lazy_to_int(total)

    def inner(self, a, b) -> int:
        if not self._is_dev(a) and not self._is_dev(b):
            return self.host.inner(a, b)
        # align lengths: inner is over the min length (arkworks zip)
        if self._is_dev(a) and self._is_dev(b):
            n = min(a.length, b.length)
            total = np.zeros(fd.L, dtype=np.int64)
            full = n // CHUNK
            for j in range(full):
                total += np.asarray(
                    _k_inner_partial(a.chunks[j], b.chunks[j]), dtype=np.int64)
            rem = 0
            if n % CHUNK:
                ha = self.vec_to_ints(DVec(chunks=[a.chunks[full]], length=CHUNK))
                hb = self.vec_to_ints(DVec(chunks=[b.chunks[full]], length=CHUNK))
                rem = self.host.inner(ha[:n % CHUNK], hb[:n % CHUNK])
            return (_lazy_to_int(total) + rem) % R
        # mixed: shorter host vector against device -- do on host
        ha = a if not self._is_dev(a) else self.vec_to_ints(a)
        hb = b if not self._is_dev(b) else self.vec_to_ints(b)
        return self.host.inner(ha, hb)

    # -- batch inversion ----------------------------------------------------

    def batch_inverse(self, v):
        if not self._is_dev(v):
            return self.host.batch_inverse(v)
        assert v.length % CHUNK == 0
        p_scans = [_k_prefix_mul_scan(c) for c in v.chunks]
        s_scans = [_k_suffix_mul_scan(c) for c in v.chunks]
        # chunk totals (exact host ints, from Montgomery rep)
        totals = [fd.host_col_to_int(np.asarray(ps[:, -1:]), R)
                  for ps in p_scans]
        total_all = 1
        for t in totals:
            if t == 0:
                raise ZeroDivisionError("inverse of zero field element in batch")
            total_all = total_all * t % R
        inv_all = inv(total_all, R)
        # per-chunk scalar: prod(before) * prod(after) * inv(total)
        nch = len(v.chunks)
        before = [1] * nch
        for j in range(1, nch):
            before[j] = before[j - 1] * totals[j - 1] % R
        after = [1] * nch
        for j in range(nch - 2, -1, -1):
            after[j] = after[j + 1] * totals[j + 1] % R
        out = []
        for j in range(nch):
            scalar = before[j] * after[j] % R * inv_all % R
            cc = jnp.asarray(_mont_const_np(scalar))
            out.append(_k_binv_combine(p_scans[j], s_scans[j], cc,
                                       self._one_col))
        return DVec(chunks=out, length=v.length)

    # -- multilinear --------------------------------------------------------

    def eq_table(self, point: list[int]):
        n = len(point)
        if (1 << n) < CHUNK:
            return self.host.eq_table(point)
        lo_host = self.host.eq_table(point[:LOG2_CHUNK])
        lo_chunk = self.vec_from_ints([int(x) for x in lo_host]).chunks[0]
        hi_host = [int(x) for x in self.host.eq_table(point[LOG2_CHUNK:])]
        chunks = []
        for h in hi_host:
            cc = jnp.asarray(_mont_const_np(h))
            chunks.append(_k_mul_scalar(lo_chunk, cc))
        return DVec(chunks=chunks, length=1 << n)

    def _promote_used(self, tables, used):
        """Ensure every used table is device-resident (promotes stray host
        vectors of matching length)."""
        out = list(tables)
        for i in used:
            if not self._is_dev(out[i]):
                out[i] = self.vec_from_ints([int(x) for x in out[i]])
        return out

    def eval_expr(self, tables, expr, size: int):
        used = tuple(sorted(expr.used_inputs()))
        devs = [tables[i] for i in used if self._is_dev(tables[i])]
        if not devs:
            return self.host.eval_expr(tables, expr, size)
        tables = self._promote_used(tables, used)
        _, const_vals = expr.key()
        consts = jnp.asarray(
            np.stack([_mont_const_np(c) for c in const_vals], axis=0)
            if const_vals else np.zeros((0, fd.L, 1), dtype=np.int32))
        kern = _get_eval_kernel(expr, used)
        nch = len(devs[0].chunks)
        out = []
        for j in range(nch):
            chunk_args = [tables[i].chunks[j] for i in used]
            out.append(kern(consts, *chunk_args))
        return DVec(chunks=out, length=size)

    def fold(self, v, r: int):
        if isinstance(v, SlotView):
            return self.host.vec_from_ints(sc8.fold8(v, r))
        if not self._is_dev(v):
            return self.host.fold(v, r)
        rc = jnp.asarray(_mont_const_np(r))
        nch = len(v.chunks)
        if nch == 1:
            half = _k_fold_single(v.chunks[0], rc)
            # below one chunk: hand off to the host engine
            ints = limbs_to_ints(np.asarray(_k_from_mont_half(half)))
            return self.host.vec_from_ints(ints)
        out = [_k_fold(v.chunks[2 * j], v.chunks[2 * j + 1], rc)
               for j in range(nch // 2)]
        return DVec(chunks=out, length=v.length // 2)

    def sumcheck_round_fused(self, tables, expr, degree: int, r_prev: int):
        """Fold every used table at `r_prev`, then compute the next round's
        message sums in one fused device dispatch.  Returns
        (new_tables, msgs).  Default path: the 8-bit Pallas round kernel
        (`engine/sumcheck8.py`, QUILL_SUMCHECK_IMPL=12 for the 12-bit XLA
        path).  Falls back to fold+messages when any table is off-device or
        the folded table drops below the device threshold."""
        used = tuple(sorted(expr.used_inputs()))
        if self._impl8():
            entries = [tables[i] for i in used]
            length = entries[0].length if entries and hasattr(
                entries[0], "length") else 0
            if (entries and all(isinstance(t, SlotView) for t in entries)
                    and length // 2 >= sc8.MIN_TABLE):
                tabs8 = {i: tables[i] for i in used}
                new8, msgs = sc8.round_fused8(tabs8, expr, degree, r_prev)
                new_tables = list(tables)
                for i in used:
                    new_tables[i] = new8[i]
                return new_tables, msgs
            if (entries and all(isinstance(t, DVec) for t in entries)
                    and sc8.MIN_TABLE <= length // 2
                    and length <= self._sc8_max()):
                # DVec entry (sumcheck_begin skipped, or the table was too
                # big for the stacked state and has folded down through the
                # chunked 12-bit path): build the stacked state now
                st = sc8.build_stacked([tables[i] for i in used])
                tabs8 = {i: SlotView(st=st, slot=s)
                         for s, i in enumerate(used)}
                new8, msgs = sc8.round_fused8(tabs8, expr, degree, r_prev)
                new_tables = list(tables)
                for i in used:
                    new_tables[i] = new8[i]
                return new_tables, msgs
            if entries and all(isinstance(t, (DVec, SlotView))
                               for t in entries):
                new_tables = list(tables)
                for i in used:
                    new_tables[i] = self.fold(tables[i], r_prev)
                return new_tables, self.sumcheck_messages(new_tables, expr,
                                                          degree)
        devs = [tables[i] for i in used if self._is_dev(tables[i])]
        if not devs or len(devs) != len(used) or len(devs[0].chunks) < 2:
            new_tables = list(tables)
            for i in used:
                new_tables[i] = self.fold(tables[i], r_prev)
            return new_tables, self.sumcheck_messages(new_tables, expr, degree)
        _, const_vals = expr.key()
        consts = jnp.asarray(
            np.stack([_mont_const_np(c) for c in const_vals], axis=0)
            if const_vals else np.zeros((0, fd.L, 1), dtype=np.int32))
        rc = jnp.asarray(_mont_const_np(r_prev))
        kern = _get_fused_round_kernel(expr, used, degree)
        nch = len(devs[0].chunks)
        totals = np.zeros((degree + 1, fd.L), dtype=np.int64)
        new_chunks = {i: [] for i in used}
        for j in range(nch // 2):
            pairs = []
            for i in used:
                pairs.append(tables[i].chunks[2 * j])
                pairs.append(tables[i].chunks[2 * j + 1])
            out = kern(consts, rc, *pairs)
            for k, i in enumerate(used):
                new_chunks[i].append(out[k])
            totals += np.asarray(out[-1], dtype=np.int64)
        new_tables = list(tables)
        for i in used:
            new_tables[i] = DVec(chunks=new_chunks[i],
                                 length=tables[i].length // 2)
        msgs = [_lazy_to_int(totals[t]) for t in range(degree + 1)]
        return new_tables, msgs

    def sumcheck_begin(self, tables, expr, degree: int):
        """Round-0 entry: may convert device tables to the 8-bit stacked
        sumcheck state.  Returns (tables, round-0 messages); subsequent
        rounds go through `sumcheck_round_fused` with the returned
        tables."""
        used = tuple(sorted(expr.used_inputs()))
        if self._impl8() and used:
            entries = [tables[i] for i in used]
            if (all(isinstance(t, DVec) for t in entries)
                    and sc8.MIN_TABLE <= entries[0].length
                    <= self._sc8_max()):
                views, msgs = sc8.begin8({i: tables[i] for i in used},
                                         expr, degree)
                new_tables = list(tables)
                for i in used:
                    new_tables[i] = views[i]
                return new_tables, msgs
        return tables, self.sumcheck_messages(tables, expr, degree)

    def sumcheck_messages(self, tables, expr, degree: int) -> list[int]:
        used = tuple(sorted(expr.used_inputs()))
        if self._impl8() and used:
            entries = [tables[i] for i in used]
            if (all(isinstance(t, SlotView) for t in entries)
                    and entries[0].length >= sc8.MIN_TABLE):
                return sc8.messages8({i: tables[i] for i in used}, expr,
                                     degree)
            if (all(isinstance(t, DVec) for t in entries)
                    and sc8.MIN_TABLE <= entries[0].length
                    <= self._sc8_max()):
                st = sc8.build_stacked([tables[i] for i in used])
                tabs8 = {i: SlotView(st=st, slot=s)
                         for s, i in enumerate(used)}
                return sc8.messages8(tabs8, expr, degree)
        if any(isinstance(tables[i], SlotView) for i in used):
            # stray small views (handoff boundary): exact host path
            tables = list(tables)
            for i in used:
                if isinstance(tables[i], SlotView):
                    tables[i] = self.vec_to_ints(tables[i])
        devs = [tables[i] for i in used if self._is_dev(tables[i])]
        if not devs:
            return self.host.sumcheck_messages(tables, expr, degree)
        tables = self._promote_used(tables, used)
        _, const_vals = expr.key()
        consts = jnp.asarray(
            np.stack([_mont_const_np(c) for c in const_vals], axis=0)
            if const_vals else np.zeros((0, fd.L, 1), dtype=np.int32))
        kern = _get_msgs_kernel(expr, used, degree)
        nch = len(devs[0].chunks)
        totals = np.zeros((degree + 1, fd.L), dtype=np.int64)
        for j in range(nch):
            chunk_args = [tables[i].chunks[j] for i in used]
            totals += np.asarray(kern(consts, *chunk_args), dtype=np.int64)
        return [_lazy_to_int(totals[t]) for t in range(degree + 1)]

    # -- univariate ---------------------------------------------------------

    def pad(self, v, n: int):
        if not self._is_dev(v):
            if n < CHUNK:
                return self.host.pad(v, n)
            return self.vec_from_ints(
                [int(x) for x in v] + [0] * (n - self.host.vec_len(v)))
        if n <= v.length:
            return v
        assert n % CHUNK == 0
        extra = (n - v.length + CHUNK - 1) // CHUNK
        zero_chunk = jnp.zeros((fd.L, CHUNK), dtype=jnp.int32)
        return DVec(chunks=v.chunks + [zero_chunk] * extra, length=n)

    def reverse(self, v):
        if not self._is_dev(v):
            return self.host.reverse(v)
        out = [_k_reverse(c) for c in reversed(v.chunks)]
        # physical reversal parks the (zero) tail padding at the front;
        # shift it out so out[j] = v[length-1-j]
        k = len(out) * CHUNK - v.length
        if k:
            out = self._shift_left_chunks(out, k)
        return DVec(chunks=out, length=v.length)

    def _shift_left_chunks(self, chunks, k: int):
        """Drop the first k columns of a physical chunk list (zeros shift
        into the freed tail).  k is static; one concat kernel per chunk."""
        drop, k = divmod(k, CHUNK)
        chunks = list(chunks[drop:])
        if k == 0:
            return chunks
        zero = jnp.zeros((fd.L, CHUNK), dtype=jnp.int32)
        out = []
        for j, c in enumerate(chunks):
            nxt = chunks[j + 1] if j + 1 < len(chunks) else zero
            out.append(_k_shiftk(c, nxt, k))
        return out

    def slice(self, v, start: int, stop: int):
        if not self._is_dev(v):
            return self.host.slice(v, start, stop)
        n = stop - start
        if start % CHUNK == 0 and n >= CHUNK:
            # aligned fast path (S-polynomial extraction is aligned: h is
            # sliced at max_len, a power of two >= CHUNK)
            first = start // CHUNK
            last = (stop + CHUNK - 1) // CHUNK
            return DVec(chunks=v.chunks[first:last], length=n)
        h = self.vec_to_ints(v)
        ints = [int(x) for x in h[start:stop]]
        if len(ints) >= CHUNK:
            return self._dvec_from_ints(ints)
        return self.host.vec_from_ints(ints)

    def poly_eval(self, coeffs, x: int) -> int:
        if not self._is_dev(coeffs):
            return self.host.poly_eval(coeffs, x)
        powx = self._powtable(x, coeffs.length)
        return self.inner(coeffs, powx)

    def _powtable(self, x: int, n: int) -> "DVec":
        # physical coverage rounds up to whole chunks (callers with
        # zero-padded coefficient vectors get exact results: the padding
        # contributes zero terms)
        nch = (n + CHUNK - 1) // CHUNK
        base = _powtable_chunk(x, LOG2_CHUNK)
        chunks = []
        for j in range(nch):
            offset = pow(x, j * CHUNK, R)
            cc = jnp.asarray(_mont_const_np(offset))
            chunks.append(_k_mul_scalar(base, cc))
        return DVec(chunks=chunks, length=nch * CHUNK)

    def quotient_by_linear(self, coeffs, x: int):
        """(y, q) with q = (p - y)/(X - x) via prefix-scan Horner:
        q_j = (p(x) - P_j) * x^{-(j+1)} where P_j = sum_{t<=j} c_t x^t."""
        if not self._is_dev(coeffs):
            return self.host.quotient_by_linear(coeffs, x)
        x = x % R
        if x == 0:
            return self.host.quotient_by_linear(self.vec_to_ints(coeffs), x)
        xinv = inv(x, R)
        powx = self._powtable(x, coeffs.length)
        powx.length = coeffs.length
        w = self.mul(coeffs, powx)
        # inclusive prefix sums with cross-chunk offsets
        p_scans = [_k_prefix_add_scan(c) for c in w.chunks]
        chunk_tot = [fd.host_col_to_int(np.asarray(ps[:, -1:]), R)
                     for ps in p_scans]
        offsets = [0] * len(p_scans)
        for j in range(1, len(p_scans)):
            offsets[j] = (offsets[j - 1] + chunk_tot[j - 1]) % R
        y = (offsets[-1] + chunk_tot[-1]) % R
        powxi = self._powtable(xinv, coeffs.length)
        powxi.length = coeffs.length
        q_chunks = []
        y_col = jnp.asarray(_mont_const_np(y))
        xinv_col = jnp.asarray(_mont_const_np(xinv))
        for j, ps in enumerate(p_scans):
            off_col = jnp.asarray(_mont_const_np(offsets[j]))
            q_chunks.append(_k_quotient_combine(ps, off_col, y_col,
                                                powxi.chunks[j], xinv_col))
        # q_{N-1} = (y - P_{N-1}) * xinv^N = 0 exactly, so keeping logical
        # length N (not N-1) is the same polynomial and keeps chunks aligned.
        q = DVec(chunks=q_chunks, length=coeffs.length)
        return y, q

    def s_polynomial(self, p1, p2):
        """IPA S polynomial (top half of f*rev(g) + rev(f)*g,
        `/root/reference/pcs/src/ipa.rs:122-157`) with ONE NTT product:
        rev_{2n-1}(f * rev_n(g)) = rev_n(f) * g, so with h = f * rev(g),
        S[k] = h[n+k] + h[n-2-k] for k in [0, n-1)."""
        from ..pcs.ipa import s_polynomial_generic

        la, lb = self.vec_len(p1), self.vec_len(p2)
        n = max(la, lb)
        if (not (self._is_dev(p1) or self._is_dev(p2)) or n < CHUNK
                or n % CHUNK):
            return s_polynomial_generic(self, p1, p2)
        p1 = self.pad(p1, n)
        p2 = self.pad(p2, n)
        h = self.poly_mul(p1, self.reverse(p2))  # length 2n-1, phys 2n
        # top half h[n+k]: chunk-aligned; the last physical slot is the
        # (zero) coefficient of x^{2n-1}, so the DVec zero-tail invariant
        # holds with logical length n-1
        a = DVec(chunks=h.chunks[n // CHUNK:(2 * n) // CHUNK], length=n - 1)
        b_full = self.reverse(self.slice(h, 0, n))  # b_full[j] = h[n-1-j]
        b = self._drop_first(b_full)             # b[k] = h[n-2-k]
        return self.add(a, b)

    def _drop_first(self, v: "DVec") -> "DVec":
        """v[1:] as a DVec of length len-1 (zero in the freed tail slot)."""
        return DVec(chunks=self._shift_left_chunks(v.chunks, 1),
                    length=v.length - 1)

    def poly_mul(self, a, b):
        if self._is_dev(a) and self._is_dev(b):
            from ..poly import ntt

            out_chunks = ntt.poly_mul_ntt(a.chunks, a.length, b.chunks,
                                          b.length)
            return DVec(chunks=out_chunks, length=a.length + b.length - 1)
        ha = a if not self._is_dev(a) else self.vec_to_ints(a)
        hb = b if not self._is_dev(b) else self.vec_to_ints(b)
        la, lb = len(ha), len(hb)
        out_len = la + lb - 1
        # sub-chunk products above the Kronecker range: zero-pad to one
        # chunk and ride the device NTT (the host Python NTT at 2^14-2^15
        # coefficients costs seconds; this path made IPA 2^14 host-bound)
        if 4096 < out_len < CHUNK and la > 0 and lb > 0:
            da = self._dvec_from_ints([int(x) for x in ha])
            db = self._dvec_from_ints([int(x) for x in hb])
            dv = self.poly_mul(da, db)
            ints = self.host.vec_to_ints(self.to_host_vec(dv))
            return self.host.vec_from_ints([int(x) for x in ints[:out_len]])
        out = self.host.poly_mul(ha, hb)
        if len(out) >= CHUNK:
            return self._dvec_from_ints([int(x) for x in out])
        return out

    # -- curve --------------------------------------------------------------

    def load_points(self, affines: list):
        from ..ec import msm as msm_mod

        return msm_mod.load_basis(affines)

    def basis_slice(self, basis, n: int):
        from ..ec import msm as msm_mod

        return msm_mod.slice_basis(basis, n)

    @staticmethod
    def _msm_impl(basis) -> str:
        """MSM impl selection.  The shifted-basis pipelines (3/4/5) store
        W x the CRS on device (519 MB f32 / 173 MB bf16 per 2^16 chunk);
        above QUILL_MSM_SHIFT_MAX points (default 2^21) that no longer fits
        HBM, so huge bases route to the shift-free per-window pipeline
        (msm8) regardless of the configured impl."""
        import os

        impl = os.environ.get("QUILL_MSM_IMPL", "7")
        # v6/v7 hold basis + leaves + all tree levels resident (~15 GB at
        # 2^21 points); their shift cap defaults one notch lower
        default_limit = 1 << 20 if impl in ("6", "7") else 1 << 21
        limit = int(os.environ.get("QUILL_MSM_SHIFT_MAX",
                                   str(default_limit)))
        nch = len(getattr(basis, "x_chunks", ()) or ())
        if impl in ("3", "5", "6", "7") and nch * CHUNK > limit:
            return "8"
        # v6/v7's fixed cost (32-65 k bucket queries + reduce) loses to
        # v5's per-chunk pipeline below ~3 chunks (round-4 bench: KZG/IPA
        # small-MSM configs regressed under v6-only routing); the v5
        # shifted-basis cache this keeps alive is bounded by the 2-chunk cap
        small = int(os.environ.get("QUILL_MSM_SMALL_CHUNKS", "2"))
        if impl in ("6", "7") and 0 < nch <= small:
            return "5"
        return impl

    def msm(self, basis, scalars):
        from ..ec import curve
        impl = self._msm_impl(basis)
        if impl == "7":
            from ..ec import msm7 as msm_mod
        elif impl == "6":
            from ..ec import msm6 as msm_mod
        elif impl == "5":
            from ..ec import msm5 as msm_mod
        elif impl == "3":
            from ..ec import msm3 as msm_mod
        elif impl == "8":
            from ..ec import msm8 as msm_mod
        else:
            from ..ec import msm as msm_mod

        if not self._is_dev(scalars):
            n = self.host.vec_len(scalars)
            # the chunked device MSM beats host Pippenger well below one
            # chunk (~1.5s/chunk vs minutes of Python EC), so prefer it
            # whenever device CRS chunks exist
            use_device = bool(basis.x_chunks)
            if use_device:
                # zero-pad small scalar vectors to one chunk: the device
                # MSM skips zero digits, so padding is free
                ints = [int(s) for s in scalars] + [0] * (CHUNK - n)
                sc = jnp.asarray(ints_to_limbs(ints))
                return msm_mod.msm_device(basis, [sc], n)
            if not basis.affines:
                raise RuntimeError(
                    "MSM basis has neither device chunks nor host affine "
                    "points for this slice")
            return curve.msm_host(basis.affines,
                                  [int(s) for s in scalars])
        scalar_chunks = [_k_from_mont(c) for c in scalars.chunks]
        return msm_mod.msm_device(basis, scalar_chunks, scalars.length)

    def msm_many(self, jobs: list) -> list:
        """jobs: list of (basis, scalars) sharing one CRS root.  Batches
        them into fused multi-MSM device dispatches (ec/msm3.py shared
        sort + prefix tree), QUILL_MSM_BATCH (default 4) MSMs at a time;
        falls back to sequential `msm` when batching does not apply."""
        import os

        def fallback():
            return [self.msm(b, s) for b, s in jobs]

        if len(jobs) <= 1:
            return fallback()
        # the batched dispatch runs EVERY job over the widest basis, so the
        # impl routing (shifted-basis HBM guard in `_msm_impl`) must be
        # decided from the widest job, not jobs[0] -- a small basis first
        # in line must not let a huge CRS materialize a shifted basis
        if not all(getattr(b, "x_chunks", None) or not self._is_dev(s)
                   for b, s in jobs):
            return fallback()
        widest_b = max((b for b, _ in jobs),
                       key=lambda b: len(getattr(b, "x_chunks", ()) or ()))
        impl = self._msm_impl(widest_b)
        if impl not in ("3", "5", "6", "7"):
            return fallback()
        if impl == "7":
            from ..ec import msm7 as msm_mod
        elif impl == "6":
            from ..ec import msm6 as msm_mod
        elif impl == "5":
            from ..ec import msm5 as msm_mod
        else:
            from ..ec import msm3 as msm_mod

        batch_chunks = []
        bases = []
        for basis, scalars in jobs:
            if not self._is_dev(scalars):
                if not basis.x_chunks:
                    return fallback()
                ints = [int(s) for s in scalars]
                ints += [0] * (-len(ints) % CHUNK)
                chunks = [jnp.asarray(ints_to_limbs(ints[o:o + CHUNK]))
                          for o in range(0, len(ints), CHUNK)]
            else:
                chunks = [_k_from_mont(c) for c in scalars.chunks]
            batch_chunks.append(chunks)
            bases.append(basis)
        if len({id(getattr(b, "_root", b)) for b in bases}) != 1:
            return fallback()
        widest = max(bases, key=lambda b: len(b.x_chunks))
        if max(len(c) for c in batch_chunks) > len(widest.x_chunks):
            return fallback()
        group = int(os.environ.get("QUILL_MSM_BATCH", "4"))
        out = []
        for i in range(0, len(batch_chunks), group):
            part = batch_chunks[i:i + group]
            if len(part) == 1:
                out.extend(msm_mod.msm_device_batch(widest, part))
                continue
            # pad to the full group width with empty (all-zero) MSMs so
            # only ONE batched kernel tower (B=group) is ever compiled;
            # zero digits land in bucket 0, which the telescoped sum skips
            npad = group - len(part)
            res = msm_mod.msm_device_batch(widest, part + [[]] * npad)
            out.extend(res[:len(part)])
        return out


@jax.jit
def _k_reverse(c):
    return c[:, ::-1]


@partial(jax.jit, static_argnums=2)
def _k_shiftk(c, nxt, k):
    return jnp.concatenate([c[:, k:], nxt[:, :k]], axis=1)


@jax.jit
def _k_from_mont_half(x):
    return fd.from_mont(x, SPEC)


@jax.jit
def _k_quotient_combine(p_incl, off_col, y_col, powxi_chunk, xinv_col):
    """q = (y - (off + P_j)) * xinv^j * xinv."""
    shape = p_incl.shape
    pj = fd.add(p_incl, jnp.broadcast_to(off_col, shape), SPEC)
    diff = fd.sub(jnp.broadcast_to(y_col, shape), pj, SPEC)
    q = fd.mont_mul(diff, powxi_chunk, SPEC)
    return fd.mont_mul(q, jnp.broadcast_to(xinv_col, shape), SPEC)
