"""Sharded (multi-chip) sumcheck and MSM phases.

This is the jax.sharding / GSPMD expression of the engine's device phases:
plain shape-polymorphic jnp programs over (k, 22, N) limb arrays whose element
axis carries a `NamedSharding` over the mesh -- XLA partitions the elementwise
field kernels trivially and turns the message-sum reductions into ICI psums.
The LSB-binding fold keeps every pair local to a shard (high index bits =
device id), so *no* resharding happens until the table collapses to the host
tail (SURVEY §5 "long-context" analogue).

Used by the full prover when a mesh is configured, and by the driver's
`dryrun_multichip` entry.
"""

from __future__ import annotations

import numpy as np

from ..fields.bn254 import R
from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device as fd  # noqa: E402
from ..fields.limbs import ints_to_limbs  # noqa: E402

SPEC = fd.FR
L = fd.L


def _emit_stacked(expr, tables, consts, counter):
    """Evaluate an expression over stacked tables (k, 22, ...)."""
    from ..piops import virtual_poly as vp

    if isinstance(expr, vp.Input):
        return tables[expr.index]
    if isinstance(expr, vp.Const):
        k = counter[0]
        counter[0] += 1
        some = next(iter(tables.values()))
        return jnp.broadcast_to(consts[k][:, None], some.shape)
    if isinstance(expr, vp.Add):
        return fd.add(_emit_stacked(expr.left, tables, consts, counter),
                      _emit_stacked(expr.right, tables, consts, counter), SPEC)
    if isinstance(expr, vp.Mul):
        return fd.mont_mul(_emit_stacked(expr.left, tables, consts, counter),
                           _emit_stacked(expr.right, tables, consts, counter),
                           SPEC)
    raise TypeError(f"unknown expr node {expr!r}")


def build_round_fn(expr, used: tuple, degree: int):
    """Returns fn(tables (n_used, 22, N), consts (nc, 22, 1), r (22, 1)) ->
    (msums (degree+1, 22) int32 lazy sums, folded (n_used, 22, N/2)).

    One fused program per round: message evaluation at t = 0..degree and the
    fold at the *previous* round's challenge are separate calls at the
    protocol level (the challenge depends on the message), so this returns
    two functions instead.
    """

    t_np = np.stack([ints_to_limbs([t * ((1 << fd.R_BITS) % R) % R])
                     for t in range(degree + 1)], axis=1)  # (22, T, 1)
    # (table layout: (22, n_used, N); every fd op treats axis 0 as limbs)

    def messages(tables, consts):
        # tables: (22, n_used, N) -- limb-major (fd ops use limb axis 0).
        # Pairs via reshape (not strided slice: GSPMD reshards reshapes of a
        # sharded axis cleanly, strided gathers it cannot).
        pairs = tables.reshape(L, tables.shape[1], tables.shape[2] // 2, 2)
        lo = pairs[:, :, None, :, 0]               # (22, k, 1, N/2)
        hi = pairs[:, :, None, :, 1]
        diff = fd.sub(hi, lo, SPEC)
        t_col = jnp.asarray(t_np)[:, None, :, :]   # (22, 1, T, 1)
        shape = (L, tables.shape[1], degree + 1, tables.shape[2] // 2)
        vals_all = fd.add(jnp.broadcast_to(lo, shape),
                          fd.mont_mul(jnp.broadcast_to(t_col, shape),
                                      jnp.broadcast_to(diff, shape), SPEC),
                          SPEC)
        tab_map = {idx: vals_all[:, i] for i, idx in enumerate(used)}
        h = _emit_stacked(expr, tab_map, consts, [0])   # (22, T, N/2)
        return jnp.sum(h, axis=2).transpose(1, 0)       # (T, 22)

    def fold(tables, r_col):
        pairs = tables.reshape(L, tables.shape[1], tables.shape[2] // 2, 2)
        lo = pairs[..., 0]
        hi = pairs[..., 1]
        return fd.add(lo, fd.mont_mul(
            jnp.broadcast_to(r_col[:, None], lo.shape),
            fd.sub(hi, lo, SPEC), SPEC), SPEC)

    return messages, fold


class ShardedSumcheck:
    """Runs sumcheck rounds on a mesh until the table fits one host tail.

    Tables enter as one stacked, sharded (n_used, 22, N) array; each round is
    two sharded XLA programs (messages, fold).  The (deg+1, 22) lazy limb
    sums are psum'd by XLA as part of the jnp.sum over the sharded axis.
    """

    def __init__(self, mesh, expr, used, degree, consts_np):
        from .mesh import shard_tables

        self.mesh = mesh
        self.degree = degree
        self.sharding = shard_tables(mesh)
        self.consts = jnp.asarray(consts_np)
        msgs, fold = build_round_fn(expr, used, degree)
        self._msgs = jax.jit(msgs)
        self._fold = jax.jit(fold)

    def messages(self, tables) -> list[int]:
        from ..engine.device import _lazy_to_int

        out = np.asarray(self._msgs(tables, self.consts), dtype=np.int64)
        return [_lazy_to_int(out[t]) for t in range(self.degree + 1)]

    def fold(self, tables, r: int):
        r_col = jnp.asarray(
            ints_to_limbs([r * ((1 << fd.R_BITS) % R) % R]))
        return self._fold(tables, r_col)

    @staticmethod
    def stack_tables(mesh, host_tables: list[list[int]]):
        """Host int tables -> stacked sharded device array (k, 22, N) in
        Montgomery form."""
        from .mesh import shard_tables

        arrs = []
        for t in host_tables:
            arrs.append(ints_to_limbs([int(x) % R for x in t]))
        raw = jnp.asarray(np.stack(arrs, axis=1))  # (22, k, N) limb-major
        sharded = jax.device_put(raw, shard_tables(mesh))
        return jax.jit(_to_mont_stacked,
                       out_shardings=shard_tables(mesh))(sharded)


_FROM_MONT_FR = None


def _jit_from_mont_fr():
    global _FROM_MONT_FR
    if _FROM_MONT_FR is None:
        _FROM_MONT_FR = jax.jit(lambda x: fd.from_mont(x, fd.FR))
    return _FROM_MONT_FR


@jax.jit
def _to_mont_stacked(x):
    # x: (22, k, N) canonical -> Montgomery (limb axis leads; fd ops batch
    # over the remaining axes directly)
    return fd.to_mont(x, SPEC)


# -- sharded MSM partials ----------------------------------------------------


def sharded_msm_partials(mesh, scalars, base_x, base_y):
    """Partitioned MSM: scalars/points split over the mesh axis; each device
    computes its exact partial sum (vectorized double-and-add over the 254
    scalar bits, then a local point reduction), and the per-device partial
    points are gathered for the tiny host combine -- point addition is not
    an XLA reduction, so the cross-device combine is W-points-small by
    design (same structure as the chunked production MSM).

    scalars: (22, N) canonical limbs; base_x/base_y: (22, N) Montgomery
    affine coordinates.  Returns (ndev, 22, 1) coordinate arrays.
    """
    from jax.sharding import PartitionSpec as P

    from ..ec import device as ed

    def per_shard(sc, bx, by):
        n_local = sc.shape[1]
        # build carries from the sharded operands (0*bx) so every loop-carry
        # component is device-varying (shard_map vma typing requirement)
        zero = bx * 0
        one_col = jnp.asarray(fd.FQ.one_mont, jnp.int32)[:, None]
        base = (bx, by, zero + one_col)
        acc = (zero, zero + one_col, zero)

        def bit_body(b, state):
            acc, base = state
            limb = b // 12
            sh = b % 12
            bit = (jax.lax.dynamic_index_in_dim(sc, limb, axis=0,
                                                keepdims=False) >> sh) & 1
            added = ed.pt_add(acc, base)
            acc = ed.pt_select(bit.astype(bool), added, acc)
            return acc, ed.pt_add(base, base)

        acc, _ = jax.lax.fori_loop(0, 254, bit_body, (acc, base))

        # local reduction to a single point
        def red_body(i, total):
            pt_i = tuple(jax.lax.dynamic_slice_in_dim(c, i, 1, axis=1)
                         for c in acc)
            return ed.pt_add(total, pt_i)

        zero1 = zero[:, :1]
        total = jax.lax.fori_loop(0, n_local, red_body,
                                  (zero1, zero1 + one_col, zero1))
        return tuple(c[None] for c in total)   # (1, 22, 1)

    shard_fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, "x"), P(None, "x"), P(None, "x")),
        out_specs=(P("x", None, None),) * 3)
    return jax.jit(shard_fn)(scalars, base_x, base_y)


# -- protocol-level sharded sumcheck prover ----------------------------------


def sharded_sumcheck_prove(mesh, num_vars: int, tables: list, expr,
                           claimed_sum: int, transcript,
                           min_device_size: int = 512):
    """Full sumcheck prover over a device mesh: transcript-identical to
    `piops.sumcheck.prove` (same round messages, challenges and claim), with
    the hypercube tables sharded over the mesh for every large round and an
    exact host tail once the table is small.

    tables: list indexed by expression input index; unused entries may be
    None; entries are host int lists (length 2^num_vars).
    """
    from ..engine.host import HostEngine
    from ..fields.limbs import limbs_to_ints
    from ..pcs import EvaluationClaim
    from ..piops.sumcheck import interpolate_coeffs
    from .mesh import shard_tables

    host = HostEngine()
    used = tuple(sorted(expr.used_inputs()))
    degree = expr.degree()

    transcript.append_usize(num_vars)
    transcript.append_field(claimed_sum % R)

    _, const_vals = expr.key()
    consts_np = (np.stack([ints_to_limbs(
        [c * ((1 << fd.R_BITS) % R) % R]) for c in const_vals], axis=0)
        if const_vals else np.zeros((0, fd.L, 1), dtype=np.int32))
    sc = ShardedSumcheck(mesh, expr, used, degree, consts_np)
    dev_tables = ShardedSumcheck.stack_tables(
        mesh, [[int(x) for x in tables[i]] for i in used])

    def to_host(dev):
        canon = _jit_from_mont_fr()(dev)
        arr = np.asarray(canon)
        out = [None] * (max(used) + 1)
        for k, i in enumerate(used):
            out[i] = host.vec_from_ints(limbs_to_ints(arr[:, k, :]))
        return out

    output_r_polys = []
    evaluation_point = []
    host_tables = None
    r = None

    for rnd in range(num_vars):
        if rnd > 0:
            # fold every used table at the previous challenge
            if host_tables is None:
                dev_tables = sc.fold(dev_tables, r)
                if dev_tables.shape[2] <= min_device_size:
                    host_tables = to_host(dev_tables)
            else:
                for i in used:
                    host_tables[i] = host.fold(host_tables[i], r)
        if host_tables is None:
            msg_evals = sc.messages(dev_tables)
        else:
            msg_evals = host.sumcheck_messages(host_tables, expr, degree)

        coeffs = interpolate_coeffs(msg_evals)
        stripped = list(coeffs)
        while stripped and stripped[-1] == 0:
            stripped.pop()
        transcript.append_dense_poly(stripped)
        output_r_polys.append(stripped)
        r = transcript.draw_field_element()
        evaluation_point.append(r)

    # final fold for the evaluation vector
    if host_tables is None:
        host_tables = to_host(dev_tables)
    for i in used:
        host_tables[i] = host.fold(host_tables[i], r)

    final_evals = [0] * (max(used) + 1)
    for i in used:
        final_evals[i] = int(host.vec_to_ints(host_tables[i])[0])
    evaluation = expr.evaluate(final_evals)

    from ..piops.sumcheck import SumcheckProof

    return (SumcheckProof(num_vars=num_vars, claimed_sum=claimed_sum % R,
                          r_polys=output_r_polys),
            EvaluationClaim(point=evaluation_point, evaluation=evaluation))
