"""Sumcheck rounds on the 8-bit Pallas field core (v2 of the engine's
sumcheck path; the v1 12-bit XLA kernels live in `engine/device.py`).

Counterpart of the reference's sumcheck inner loop
(`/root/reference/hyperplonk/src/piops/sumcheck.rs:51-101`), which builds
per-point degree-1 `DensePolynomial`s and evaluates the expression tree
symbolically per hypercube point.  Here one Pallas kernel per round folds
every used table at the previous challenge AND evaluates the next round's
message sums at the interpolation nodes t = 0..deg, entirely in VMEM over
the 8-bit limb representation (`fields/device8.py`).

Two hard-won design rules (measured on a v5e via the axon tunnel):

1. NO per-round XLA ops on table-sized data.  Plain XLA data movement
   (strided slices, concatenates) runs ~6 GB/s here while Pallas kernels
   sustain ~40+ GB/s; a single XLA even/odd de-interleave per round costs
   more than the entire round kernel.  Therefore ALL used tables live in
   ONE stacked device array (`Stacked8.data`, rows = 2L per table: the
   even stream E[p] = T[2p] then the odd stream O[p] = T[2p+1]) that each
   round's kernel consumes whole and re-emits whole.
2. NO gathers/strided slices inside the kernel either (Mosaic supports
   neither beyond 2D).  The per-round parity split (evens/odds of E and O,
   needed because binding the LSB variable pairs adjacent elements,
   `sumcheck.rs:54-63`) is computed as an exact bf16 matmul with a
   constant 0/1 permutation matrix on the MXU: streams at rest are kept in
   normal form (integer limbs in [-1, 256] -- every such value is exactly
   representable in bfloat16), the matrix routes lane 2m -> m and
   2m+1 -> 512+m, and f32 accumulation of one-hot rows is exact.

The round math (q0 = evens(E), q1 = odds(E), q2 = evens(O), q3 = odds(O)):

    f_E[m] = q0[m] + r*(q2[m] - q0[m])     # = evens of the folded table
    f_O[m] = q1[m] + r*(q3[m] - q1[m])     # = odds  of the folded table
    msg_t  = sum_m  h( f_E[m] + t*(f_O[m] - f_E[m]) ... )    t = 0..deg

The interpolation values are built incrementally (vals_{t+1} = vals_t +
diff; one lazy add instead of a Montgomery mul per node) and h is the
expression tree compiled once per structure with challenges/constants as
runtime operands (fixed-shape kernel invariant, CLAUDE.md).

Exactness: every op is `fields/device8.py` arithmetic (exact on f32
integers < 2^24, bounds restored per op); per-grid-step message partials
sum <= BLOCK * 520 < 2^20 per limb (exact f32), accumulated on the host in
int64/python ints.  Differentially tested against the host engine
(tests/test_sumcheck8.py; on-hardware via tests/test_device_engine.py).

Scope: tables of length >= 2*BLOCK (2^11).  Below that the caller hands
off to the exact host engine (same results; dispatch overhead dominates).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..fields.bn254 import R
from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ..fields import device as fd12  # noqa: E402
from ..fields import device8 as f8  # noqa: E402

# kernel-lowering dependency set for the AOT cache (host-side engine
# orchestration must not invalidate these exports).  engine/device.py is
# deliberately NOT listed: this module never imports it and no lowered
# kernel here depends on its contents -- keeping it out lets engine
# orchestration edits keep the multi-minute sc8 exports warm.
ENG_KDEPS = ('engine/sumcheck8.py', 'fields', 'utils/jaxcfg.py')
from ..fields import pallas8 as p8  # noqa: E402

L = f8.L
BLOCK = 1024
MIN_TABLE = 2 * BLOCK  # smallest table the fused device path handles

R_INV8 = pow(1 << f8.R_BITS, -1, R)


@dataclass
class Stacked8:
    """All used sumcheck tables in one device array.

    data: (n_slots * 2L, s_buf) f32 normal-form Montgomery limbs; slot s
    holds rows [2sL, 2sL+L) = even stream, [2sL+L, 2(s+1)L) = odd stream.
    Only the prefix [0, s_active) of each stream is live -- the physical
    buffer keeps its entry size across rounds so that EVERY round reuses
    ONE compiled kernel (shape stability; the live prefix halves per round
    and is carried as a scalar operand).  Columns beyond s_active are
    garbage.  length = logical table length (= 2 * s_active)."""

    data: jnp.ndarray
    n_slots: int
    s_active: int

    @property
    def length(self) -> int:
        return 2 * self.s_active

    @property
    def s_buf(self) -> int:
        return self.data.shape[-1]


@dataclass
class SlotView:
    """One table of a Stacked8 state (what the engine hands around)."""

    st: Stacked8
    slot: int

    @property
    def length(self) -> int:
        return self.st.length


# ---------------------------------------------------------------------------
# constants: the parity-split permutation matrix
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pp_matrix(block: int) -> np.ndarray:
    """(block, block) 0/1 matrix: y = x @ PP puts evens of x in columns
    [0, block/2) and odds in [block/2, block).  Passed to the kernels as a
    bf16 operand (Pallas kernels cannot capture array constants)."""
    pp = np.zeros((block, block), dtype=np.float32)
    h = block // 2
    for m in range(h):
        pp[2 * m, m] = 1.0
        pp[2 * m + 1, h + m] = 1.0
    return pp.astype(np.bfloat16) if hasattr(np, "bfloat16") else pp


def _pp_operand() -> jnp.ndarray:
    return jnp.asarray(_pp_matrix(BLOCK)).astype(jnp.bfloat16)


def _pp_spec():
    return pl.BlockSpec((BLOCK, BLOCK), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _split_eo(x2d: jnp.ndarray, pp: jnp.ndarray) -> tuple:
    """(33, B) f32 normal-form limbs -> (evens, odds), each (33, B/2).

    Exact: inputs are integers in [-1, 256] (bf16-exact); the matrix is
    0/1; each f32-accumulated output column sums one nonzero product."""
    b = x2d.shape[-1]
    y = jnp.dot(x2d.astype(jnp.bfloat16), pp,
                preferred_element_type=jnp.float32)
    return y[:, :b // 2], y[:, b // 2:]


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------


@jax.jit
def _k_12to8(c12):
    """(22, N) int32 lazy Montgomery (12-bit domain) -> (33, N) f32
    canonical-limb Montgomery (8-bit domain).  Same Montgomery radix, so
    this is exact bit repacking after canonicalization."""
    return f8.from12(fd12.lazy_to_canonical(c12, fd12.FR))


def _entry_kernel(pp_ref, x_ref, o_ref):
    """Natural-order (33, BLOCK) block -> [E; O] (66, BLOCK/2) block."""
    e, o = _split_eo(x_ref[:], pp_ref[:])
    o_ref[:] = jnp.concatenate([e, o], axis=0)


@functools.lru_cache(maxsize=None)
def _entry_call(n: int):
    def run(x):
        return pl.pallas_call(
            _entry_kernel,
            out_shape=jax.ShapeDtypeStruct((2 * L, n // 2), jnp.float32),
            grid=(n // BLOCK,),
            in_specs=[_pp_spec(),
                      pl.BlockSpec((L, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2 * L, BLOCK // 2), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=p8._interpret(),
        )(_pp_operand(), x)

    from ..utils.aotcache import aot_wrap

    return aot_wrap(f"sc8.entry.{n}", run, deps=ENG_KDEPS)


@functools.lru_cache(maxsize=None)
def _concat_call(n_parts: int):
    def run(*parts):
        return jnp.concatenate(parts, axis=0)
    return jax.jit(run)


def build_stacked(dvec_list: list) -> Stacked8:
    """Engine DVecs (12-bit Montgomery chunks) -> one Stacked8 state.
    One Pallas split per table + one XLA concat (entry-only cost)."""
    n = dvec_list[0].length
    parts = []
    for dv in dvec_list:
        full = (jnp.concatenate([_k_12to8(c) for c in dv.chunks], axis=1)
                if len(dv.chunks) > 1 else _k_12to8(dv.chunks[0]))
        parts.append(_entry_call(n)(full[:, :n]))
    data = parts[0] if len(parts) == 1 else _concat_call(len(parts))(*parts)
    return Stacked8(data=data, n_slots=len(dvec_list), s_active=n // 2)


@jax.jit
def _k_8from_mont(x):
    return f8.from_mont(x, f8.FR8)


def _slot_streams(v: SlotView) -> tuple[jnp.ndarray, jnp.ndarray]:
    a = 2 * v.slot * L
    s = v.st.s_active
    return v.st.data[a:a + L, :s], v.st.data[a + L:a + 2 * L, :s]


def to_host_ints(v: SlotView) -> list[int]:
    """SlotView -> canonical (non-Montgomery) host ints, natural order."""
    e, o = _slot_streams(v)
    ev = f8.limbs8_to_ints(np.asarray(_k_8from_mont(e)))
    od = f8.limbs8_to_ints(np.asarray(_k_8from_mont(o)))
    out = []
    for a, b in zip(ev, od):
        out.append(a)
        out.append(b)
    return out


def _lazy8_to_int(row: np.ndarray) -> int:
    """(33,) int64 lazy limb sums of Montgomery values -> canonical int."""
    total = 0
    for i in range(L):
        total += int(row[i]) << (8 * i)
    return total % R * R_INV8 % R


def _mont8_np(x: int) -> np.ndarray:
    """Canonical int -> (33,) f32 Montgomery-form canonical limbs."""
    xm = int(x) % R * ((1 << f8.R_BITS) % R) % R
    return f8.int_to_limbs8(xm)


def _kbuf(consts: list[int], r: int | None) -> jnp.ndarray:
    """Challenge + expression constants as one (33, 128*(1+nc)) f32 operand
    (column group 0 = r or zeros; group k+1 = const k), Montgomery form."""
    groups = [np.zeros((L, 128), np.float32) if r is None
              else np.tile(_mont8_np(r)[:, None], (1, 128))]
    for c in consts:
        groups.append(np.tile(_mont8_np(c)[:, None], (1, 128)))
    return jnp.asarray(np.concatenate(groups, axis=1))


# ---------------------------------------------------------------------------
# kernel codegen
# ---------------------------------------------------------------------------


def _emit8(expr, vals: dict, kcol, counter: list, spec):
    from ..piops import virtual_poly as vp

    if isinstance(expr, vp.Input):
        return vals[expr.index]
    if isinstance(expr, vp.Const):
        k = counter[0]
        counter[0] += 1
        some = next(iter(vals.values()))
        return jnp.broadcast_to(kcol(k + 1), some.shape)
    if isinstance(expr, vp.Add):
        return f8.add(_emit8(expr.left, vals, kcol, counter, spec),
                      _emit8(expr.right, vals, kcol, counter, spec), spec)
    if isinstance(expr, vp.Mul):
        return f8.mont_mul(_emit8(expr.left, vals, kcol, counter, spec),
                           _emit8(expr.right, vals, kcol, counter, spec),
                           spec)
    raise TypeError(f"unknown expr node {expr!r}")


def _round8_kernel(expr, slot_of, degree, fold, a_ref, c_ref, k_ref,
                   pp_ref, x_ref, *outs):
    """One grid step over the stacked state: [fold every table at r,] then
    accumulate the message partial sums at t = 0..degree.

    The grid spans the PHYSICAL buffer; a_ref (SMEM scalar) holds the
    number of LIVE steps this round.  Steps past it skip all compute
    (their block flushes write stale VMEM into the garbage suffix of the
    outputs, which nothing reads) -- this keeps every round of a sumcheck
    on one compiled executable instead of one per size.

    x_ref: (n_slots*2L, BLOCK) block of the stacked state.  outs:
    [stacked' (n_slots*2L, BLOCK/2) into a full-width buffer] if fold,
    then the (1, 33, T) partials block."""
    @pl.when(pl.program_id(0) < a_ref[0])
    def _():
        _round8_body(expr, slot_of, degree, fold, c_ref, k_ref, pp_ref,
                     x_ref, *outs)


def _round8_body(expr, slot_of, degree, fold, c_ref, k_ref, pp_ref,
                 x_ref, *outs):
    spec = p8.unpack_spec(R, c_ref[:])
    T = degree + 1

    def kcol(k):
        # (33, 1, 128): lanes pre-replicated in the buffer, so downstream
        # broadcasts only cross sublanes (Mosaic can't broadcast both)
        return k_ref[:, 128 * k:128 * (k + 1)].reshape(L, 1, 128)

    def to3d(x):
        return x.reshape(L, x.shape[-1] // 128, 128)

    lo = {}
    hi = {}
    if fold:
        rr = kcol(0)
        f_rows = []
        for idx, s in slot_of.items():
            e2 = x_ref[2 * s * L:(2 * s + 1) * L]
            o2 = x_ref[(2 * s + 1) * L:(2 * s + 2) * L]
            q0, q1 = (to3d(q) for q in _split_eo(e2, pp_ref[:]))
            q2, q3 = (to3d(q) for q in _split_eo(o2, pp_ref[:]))
            f_e = f8.add(q0, f8.mont_mul(f8.sub(q2, q0, spec),
                                         jnp.broadcast_to(rr, q0.shape),
                                         spec), spec)
            f_o = f8.add(q1, f8.mont_mul(f8.sub(q3, q1, spec),
                                         jnp.broadcast_to(rr, q1.shape),
                                         spec), spec)
            # normal form so the next round's bf16 parity split stays exact
            f_rows.append(f8.normal_form(f_e))
            f_rows.append(f8.normal_form(f_o))
            lo[idx] = f_e
            hi[idx] = f_o
        n = f_rows[0].shape[-2] * 128
        outs[0][:] = jnp.concatenate(f_rows, axis=0).reshape(-1, n)
    else:
        for idx, s in slot_of.items():
            lo[idx] = to3d(x_ref[2 * s * L:(2 * s + 1) * L])
            hi[idx] = to3d(x_ref[(2 * s + 1) * L:(2 * s + 2) * L])

    diff = {i: f8.sub(hi[i], lo[i], spec) for i in lo}
    vals = dict(lo)
    cols = []
    for t in range(T):
        if t > 0:
            vals = {i: f8.add(vals[i], diff[i], spec) for i in vals}
        h = _emit8(expr, vals, kcol, [0], spec)
        # rank-2 staged reduction (Mosaic rejects rank-1 intermediates)
        cols.append(jnp.sum(jnp.sum(h, axis=2), axis=1, keepdims=True))
    outs[-1][:] = jnp.concatenate(cols, axis=1)[None]  # (1, 33, T)


_ROUND8_CALLS: dict = {}


def _get_round8_call(expr, slot_items: tuple, degree: int, nc: int,
                     fold: bool, n_slots: int, s_buf: int):
    """Compiled once per (structure, slots, degree, fold, BUFFER size) --
    the live size travels as a scalar operand, so all rounds of a sumcheck
    share one executable."""
    structure, _ = expr.key()
    key = (structure, slot_items, degree, nc, fold, n_slots, s_buf)
    if key in _ROUND8_CALLS:
        return _ROUND8_CALLS[key]

    slot_of = dict(slot_items)
    maxsteps = s_buf // BLOCK
    T = degree + 1
    rows = 2 * n_slots * L
    aspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec((rows, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((p8._PACK_ROWS, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, L, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kw = 128 * (1 + nc)
    kspec = pl.BlockSpec((L, kw), lambda i: (0, 0), memory_space=pltpu.VMEM)

    # folded output keeps the FULL buffer width (shape stability across
    # rounds); only the prefix [0, active*BLOCK/2) is written
    fshape = jax.ShapeDtypeStruct((rows, s_buf), jnp.float32)
    fspec = pl.BlockSpec((rows, BLOCK // 2), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    pshape = jax.ShapeDtypeStruct((maxsteps, L, T), jnp.float32)
    out_shape = [fshape, pshape] if fold else pshape
    out_specs = [fspec, pspec] if fold else pspec

    pack = p8.consts_pack(R)

    def run(active, kbuf, stacked):
        return pl.pallas_call(
            functools.partial(_round8_kernel, expr, slot_of, degree, fold),
            out_shape=out_shape,
            grid=(maxsteps,),
            in_specs=[aspec, cspec, kspec, _pp_spec(), xspec],
            out_specs=out_specs,
            interpret=p8._interpret(),
        )(active, pack, kbuf, _pp_operand(), stacked)

    from ..utils.aotcache import aot_wrap

    run = aot_wrap(f"sc8.round.{key}", run, deps=ENG_KDEPS)
    _ROUND8_CALLS[key] = run
    return run


# ---------------------------------------------------------------------------
# round drivers
# ---------------------------------------------------------------------------


def _partials_to_msgs(partials: np.ndarray, degree: int) -> list[int]:
    tot = partials.astype(np.int64).sum(axis=0)  # (33, T)
    return [_lazy8_to_int(tot[:, t]) for t in range(degree + 1)]


def _state_of(tables: dict[int, SlotView]) -> tuple[Stacked8, tuple]:
    views = list(tables.values())
    st = views[0].st
    assert all(v.st is st for v in views), "tables span distinct states"
    slot_items = tuple(sorted((i, v.slot) for i, v in tables.items()))
    return st, slot_items


def messages8(tables: dict[int, SlotView], expr, degree: int) -> list[int]:
    """Round messages (values at t = 0..degree) without folding."""
    st, slot_items = _state_of(tables)
    _, const_vals = expr.key()
    kbuf = _kbuf(const_vals, None)
    call = _get_round8_call(expr, slot_items, degree, len(const_vals),
                            False, st.n_slots, st.s_buf)
    steps = st.s_active // BLOCK
    partials = call(jnp.asarray([steps], jnp.int32), kbuf, st.data)
    return _partials_to_msgs(np.asarray(partials)[:steps], degree)


def begin8(dvec_tables: dict[int, "DVec"], expr,
           degree: int) -> tuple[dict[int, SlotView], list[int]]:
    """Build the stacked state from engine DVecs and compute the round-0
    messages.  Returns (views, msgs)."""
    items = sorted(dvec_tables.items())
    st = build_stacked([dv for _, dv in items])
    views = {idx: SlotView(st=st, slot=s) for s, (idx, _) in enumerate(items)}
    return views, messages8(views, expr, degree)


def round_fused8(tables: dict[int, SlotView], expr, degree: int,
                 r_prev: int) -> tuple[dict[int, SlotView], list[int]]:
    """Fold every table at r_prev and compute the next round's messages in
    one fused dispatch over the stacked state."""
    st, slot_items = _state_of(tables)
    _, const_vals = expr.key()
    kbuf = _kbuf(const_vals, r_prev)
    call = _get_round8_call(expr, slot_items, degree, len(const_vals),
                            True, st.n_slots, st.s_buf)
    steps = st.s_active // BLOCK
    folded, partials = call(jnp.asarray([steps], jnp.int32), kbuf, st.data)
    new_st = Stacked8(data=folded, n_slots=st.n_slots,
                      s_active=st.s_active // 2)
    new_tables = {i: SlotView(st=new_st, slot=v.slot)
                  for i, v in tables.items()}
    msgs = _partials_to_msgs(np.asarray(partials)[:steps], degree)
    return new_tables, msgs


@jax.jit
def _k_fold_stream(e, o, rbuf):
    rr = rbuf[:, :1]
    return f8.add(e, f8.mont_mul(f8.sub(o, e, f8.FR8),
                                 jnp.broadcast_to(rr, e.shape), f8.FR8),
                  f8.FR8)


def fold8(v: SlotView, r: int) -> list[int]:
    """Plain fold (no messages) of one table, returning host ints in
    Montgomery-free canonical form.  Used only at the handoff boundary
    (small tables), so the XLA row slices here are cheap."""
    e, o = _slot_streams(v)
    rbuf = jnp.asarray(np.tile(_mont8_np(r)[:, None], (1, 128)))
    folded = _k_fold_stream(e, o, rbuf)
    return f8.limbs8_to_ints(np.asarray(_k_8from_mont(folded)))
