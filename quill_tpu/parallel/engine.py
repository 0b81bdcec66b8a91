"""ShardedEngine: the multi-chip execution engine.

Implements the same engine protocol as `engine.host.HostEngine` /
`engine.device.TpuEngine`, but holds every large vector as ONE
(22, N) Montgomery limb array whose element axis carries a `NamedSharding`
over the device mesh (SURVEY §2.4: hypercube sharding of MLE tables).  The
entire proving stack (Store, sumcheck/zerocheck, multiset/permutation
checks, KZG/IPA/MLPCS, HyperPlonk) is engine-generic, so configuring a mesh
turns the SAME protocol code into a multi-chip prover: tables are born
sharded, sumcheck rounds run as sharded XLA programs whose message sums
reduce over ICI, and MSMs partition points per device with an ndev-small
host combine (`parallel/msm.py`).

Design rules (and why the proofs stay byte-identical):
- the mesh axis maps to HIGH element-index bits, so the sumcheck's
  LSB-variable binding (`/root/reference/hyperplonk/src/piops/sumcheck.rs:54-63`)
  always pairs elements on the same shard; folds never communicate until
  the table is small enough for the exact host tail;
- every transcript-visible value (message sums, evaluations, commitments)
  is an exact field element computed with the same arithmetic mod r, so
  sharding is invisible to the transcript by construction -- asserted by
  the byte-equality test in `tests/test_sharded.py`;
- device partial sums are blockwise int32 (block * max_lazy_limb < 2^31)
  and are combined on the host in exact big-int arithmetic;
- vectors below `min_device_size` live on the exact host engine (the same
  hybrid-tail rule the single-chip TpuEngine uses).

Batch inversion and synthetic division (quotient-by-linear) run as sharded
device scans (Hillis-Steele ladders whose shifted concats become GSPMD halo
exchanges); only the S-polynomial NTT products still round-trip through the
host engine -- exact, and fine for the dryrun scale.  The single-chip
TpuEngine remains the performance path on one real chip.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..engine.host import HostEngine  # noqa: E402
from ..fields import device as fd  # noqa: E402
from ..fields.bn254 import R  # noqa: E402
from ..fields.scalar import inv  # noqa: E402
from ..fields.limbs import ints_to_limbs, limbs_to_ints  # noqa: E402
from . import msm as pmsm  # noqa: E402
from .mesh import shard_elements  # noqa: E402

SPEC = fd.FR
L = fd.L

# blockwise partial-sum width: BLOCK * (2^12.05 max lazy limb) < 2^27 << 2^31
_SUM_BLOCK = 1 << 14

_R_MONT = (1 << fd.R_BITS) % R


def _mont_const(x: int) -> np.ndarray:
    return ints_to_limbs([int(x) % R * _R_MONT % R])  # (22, 1)


@dataclass
class SVec:
    """Sharded vector handle: (22, N) int32 lazy Montgomery limbs."""

    arr: jnp.ndarray
    length: int


@dataclass
class SBasis:
    """Sharded MSM basis: Montgomery affine coords + infinity mask, plus the
    host affine list for the small-MSM host fallback."""

    bx: jnp.ndarray
    by: jnp.ndarray
    inf: jnp.ndarray
    affines: list
    length: int


class ShardedEngine:
    name = "sharded"

    def __init__(self, mesh, min_device_size: int | None = None):
        self.mesh = mesh
        self.ndev = int(mesh.devices.size)
        self.host = HostEngine()
        self.min_device_size = (min_device_size if min_device_size is not None
                                else max(2 * self.ndev, 16))
        self._sh = shard_elements(mesh)

    # ---- vector representation ---------------------------------------------

    def is_vec(self, v) -> bool:
        return isinstance(v, SVec) or self.host.is_vec(v)

    def _is_dev(self, v) -> bool:
        return isinstance(v, SVec)

    def vec_from_ints(self, xs):
        """Physical width is padded with zeros to a multiple of the mesh
        size (the element sharding must divide evenly); `length` stays the
        true count.  Zero padding is inert for every whole-array op that
        runs on padded vectors (elementwise field ops, lazy-limb sums,
        MSM scalars); structural ops (reverse, irregular slices) take the
        exact host path."""
        xs = list(xs)
        if len(xs) < self.min_device_size:
            return self.host.vec_from_ints(xs)
        pad = (-len(xs)) % self.ndev
        limbs = ints_to_limbs([int(x) % R for x in xs] + [0] * pad)
        raw = jax.device_put(jnp.asarray(limbs), self._sh)
        return SVec(arr=self._jit_to_mont()(raw), length=len(xs))

    def _demote(self, v: SVec):
        canon = self._jit_from_mont()(v.arr)
        ints = limbs_to_ints(np.asarray(canon))[:v.length]
        return self.host.vec_from_ints(ints)

    def _promote(self, v):
        if isinstance(v, SVec):
            return v
        return self.vec_from_ints([int(x) for x in v])

    def vec_to_ints(self, v):
        if isinstance(v, SVec):
            return self._demote(v)
        return v

    def to_host_vec(self, v):
        return self.vec_to_ints(v)

    def vec_len(self, v) -> int:
        return v.length if isinstance(v, SVec) else len(v)

    def _align(self, a, b):
        """Promote to a common representation (device wins at size)."""
        if isinstance(a, SVec) or isinstance(b, SVec):
            return self._promote(a), self._promote(b), True
        return a, b, False

    # ---- structural ops ------------------------------------------------------

    def pad(self, v, n: int):
        if not isinstance(v, SVec):
            if n >= self.min_device_size and len(v) >= self.min_device_size:
                v = self._promote(v)
            else:
                return self.host.pad(v, n)
        if v.length >= n:
            return v
        phys = v.arr.shape[-1]
        target = n + ((-n) % self.ndev)
        if target > phys:
            arr = jax.device_put(
                jnp.pad(v.arr, ((0, 0), (0, target - phys))), self._sh)
        else:
            arr = v.arr  # existing physical padding is already zero
        return SVec(arr=arr, length=n)

    def reverse(self, v):
        if not isinstance(v, SVec):
            return self.host.reverse(v)
        # device logical reverse (one replicate + local gather + reshard;
        # the S-polynomial flow's rev() must not round-trip the host --
        # VERDICT round-4 item 5).  Memory: one replicated copy per
        # device, fine at every size the sharded prover shards.
        return SVec(arr=self._jit_reverse(v.length)(v.arr),
                    length=v.length)

    @lru_cache(maxsize=None)
    def _jit_reverse(self, length: int):
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P(None, None))

        def f(x):
            n = x.shape[-1]
            rep = jax.sharding.reshard(x, repl)
            idx = jnp.clip(length - 1 - jax.lax.iota(jnp.int32, n), 0,
                           n - 1)
            out = jnp.where((jax.lax.iota(jnp.int32, n) < length)[None, :],
                            rep[:, idx], 0)
            return jax.sharding.reshard(out, self._sh)
        return jax.jit(f, out_shardings=self._sh)

    @lru_cache(maxsize=None)
    def _jit_shift_slice(self, start: int, count: int, phys: int):
        """w[i] = v[start + i] for i < count, 0 beyond: replicate + static
        slice + pad + reshard (arbitrary-offset windows of sharded vectors
        without the host round-trip)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P(None, None))

        def f(x):
            rep = jax.sharding.reshard(x, repl)
            win = jax.lax.slice_in_dim(rep, start, start + count, axis=1)
            out = jnp.pad(win, ((0, 0), (0, phys - count)))
            return jax.sharding.reshard(out, self._sh)
        return jax.jit(f, out_shardings=self._sh)

    def slice(self, v, start: int, stop: int):
        if not isinstance(v, SVec):
            return self.host.slice(v, start, stop)
        if start == 0 and stop == v.length:
            return v
        if (start == 0 and stop >= self.min_device_size
                and stop % self.ndev == 0 and stop <= v.arr.shape[-1]):
            # mesh-aligned prefix slice (the common case: power-of-two
            # prefixes of power-of-two tables): stays on device -- GSPMD
            # rebalances over ICI instead of riding the host link
            return SVec(arr=self._jit_prefix(stop)(v.arr), length=stop)
        count = stop - start
        if count >= self.min_device_size and stop <= v.arr.shape[-1]:
            # arbitrary window (the S-polynomial's h[max_len:] suffix)
            phys = count + ((-count) % self.ndev)
            return SVec(arr=self._jit_shift_slice(start, count, phys)(
                v.arr), length=count)
        host = self.host.slice(self._demote(v), start, stop)
        if stop - start < self.min_device_size:
            return host
        return self._promote(host)

    @lru_cache(maxsize=None)
    def _jit_prefix(self, stop: int):
        return jax.jit(lambda x: jax.lax.slice_in_dim(x, 0, stop, axis=1),
                       out_shardings=self._sh)

    def concat(self, vs):
        if not any(isinstance(v, SVec) for v in vs):
            return self.host.concat(vs)
        parts = []
        for v in vs:
            parts.extend(int(x) for x in self.vec_to_ints(v))
        return self.vec_from_ints(parts)

    # ---- elementwise field ops ----------------------------------------------

    @lru_cache(maxsize=None)
    def _jit_to_mont(self):
        return jax.jit(lambda x: fd.to_mont(x, SPEC),
                       out_shardings=self._sh)

    @lru_cache(maxsize=None)
    def _jit_from_mont(self):
        return jax.jit(lambda x: fd.from_mont(x, SPEC),
                       out_shardings=self._sh)

    @lru_cache(maxsize=None)
    def _jit_binop(self, op: str):
        if op == "add":
            f = lambda a, b: fd.add(a, b, SPEC)              # noqa: E731
        elif op == "sub":
            f = lambda a, b: fd.sub(a, b, SPEC)              # noqa: E731
        else:
            f = lambda a, b: fd.mont_mul(a, b, SPEC)         # noqa: E731
        return jax.jit(f, out_shardings=self._sh)

    @lru_cache(maxsize=None)
    def _jit_scalar(self, op: str):
        if op == "add":
            f = lambda a, c: fd.add(a, jnp.broadcast_to(c, a.shape), SPEC)  # noqa: E731
        else:
            f = lambda a, c: fd.mont_mul(a, jnp.broadcast_to(c, a.shape),   # noqa: E731
                                         SPEC)
        return jax.jit(f, out_shardings=self._sh)

    def _binop(self, op, a, b):
        a, b, dev = self._align(a, b)
        if not dev:
            return getattr(self.host, op)(a, b)
        return SVec(arr=self._jit_binop(op)(a.arr, b.arr), length=a.length)

    def add(self, a, b):
        return self._binop("add", a, b)

    def sub(self, a, b):
        return self._binop("sub", a, b)

    def mul(self, a, b):
        return self._binop("mul", a, b)

    def add_scalar(self, v, c: int):
        # NOTE: applies to the physical width, so it taints zero padding on
        # non-mesh-multiple lengths.  All protocol tables that reach
        # add_scalar are power-of-two sized (no padding on a power-of-two
        # mesh); odd-length vectors only occur on the host-tail univariate
        # paths (S-polynomials), which never route here.
        if not isinstance(v, SVec):
            return self.host.add_scalar(v, c)
        return SVec(arr=self._jit_scalar("add")(
            v.arr, jnp.asarray(_mont_const(c))), length=v.length)

    def mul_scalar(self, v, c: int):
        if not isinstance(v, SVec):
            return self.host.mul_scalar(v, c)
        return SVec(arr=self._jit_scalar("mul")(
            v.arr, jnp.asarray(_mont_const(c))), length=v.length)

    # ---- reductions (blockwise int32 partials, exact host combine) ----------

    def _bs_for(self, n: int) -> int:
        """Block size for the (L, nb, bs) partial-sum layout: bs must
        divide n and nb = n // bs must be a multiple of ndev so the block
        axis carries the element sharding (each shard's elements stay in
        its own blocks).  Powers of two throughout in practice."""
        bs = min(_SUM_BLOCK, max(1, n // self.ndev))
        while bs > 1 and (n % bs or (n // bs) % self.ndev):
            bs //= 2
        return bs

    def _psb(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P(None, "x", None))

    def _reshape_blocks(self, x, nb: int, bs: int):
        """(L, n)@x -> (L, nb, bs) with the block axis sharded (explicit
        out_sharding: the auto-sharding of a split reshape is ambiguous)."""
        return jax.lax.reshape(x, (L, nb, bs), out_sharding=self._psb())

    @lru_cache(maxsize=None)
    def _jit_block_sums(self, bs: int):
        def f(x):
            n = x.shape[-1]
            return jnp.sum(self._reshape_blocks(x, n // bs, bs), axis=2)
        return jax.jit(f)

    @lru_cache(maxsize=None)
    def _jit_inner_blocks(self, bs: int):
        def f(a, b):
            h = fd.mont_mul(a, b, SPEC)
            n = h.shape[-1]
            return jnp.sum(self._reshape_blocks(h, n // bs, bs), axis=2)
        return jax.jit(f)

    @staticmethod
    def _lazy_blocks_to_int(blocks: np.ndarray) -> int:
        """(22, nb) int32 lazy Montgomery partial sums -> canonical int."""
        from ..engine.device import _lazy_to_int

        return _lazy_to_int(np.asarray(blocks, dtype=np.int64).sum(axis=1))

    def vsum(self, v) -> int:
        if not isinstance(v, SVec):
            return self.host.vsum(v)
        n = v.arr.shape[-1]
        bs = self._bs_for(n)
        if n % bs or (n // bs) % self.ndev:
            return self.host.vsum(self._demote(v))  # irregular length
        blocks = self._jit_block_sums(bs)(v.arr)
        return self._lazy_blocks_to_int(np.asarray(blocks))

    def inner(self, a, b) -> int:
        if not (isinstance(a, SVec) or isinstance(b, SVec)):
            return self.host.inner(a, b)
        la, lb = self.vec_len(a), self.vec_len(b)
        if la != lb:
            # arkworks zip semantics over the min length; irregular -- host
            return self.host.inner(self.vec_to_ints(a), self.vec_to_ints(b))
        a = self._promote(a)
        b = self._promote(b)
        n = a.arr.shape[-1]  # physical width; zero padding contributes 0
        bs = self._bs_for(n)
        if n % bs or (n // bs) % self.ndev:
            return self.host.inner(self._demote(a), self._demote(b))
        blocks = self._jit_inner_blocks(bs)(a.arr, b.arr)
        return self._lazy_blocks_to_int(np.asarray(blocks))

    @lru_cache(maxsize=None)
    def _jit_ladder(self, op: str, suffix: bool, exclusive: bool = False):
        """Sharded scan as a TWO-LEVEL block scan: local Hillis-Steele
        ladders along the per-shard axis (slices on an unsharded dim are
        always legal under explicit sharding), one reshard of the ndev
        block totals to replicated, a tiny cross-block combine, and a
        broadcast combine back onto the sharded blocks -- the textbook
        distributed scan, with ONE collective instead of log(n) halo
        exchanges.

        Compile-cost discipline (the round-4 dryrun regression): the
        ladder rolls as a `fori_loop` whose shift is a dynamic `jnp.roll`
        on the UNSHARDED per-shard axis, and the cross-block offsets roll
        as a `lax.scan` -- TWO combine-body call sites per program instead
        of log2(k) + ndev unrolled copies (XLA compile time scales with
        call sites x the 22-limb mont_mul body; BASELINE.md round-2/3
        findings)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if op == "mul":
            comb = lambda a, b: fd.mont_mul(a, b, SPEC)      # noqa: E731
            ident_np = _mont_const(1)
        else:
            comb = lambda a, b: fd.add(a, b, SPEC)           # noqa: E731
            ident_np = np.zeros((L, 1), np.int32)
        repl = NamedSharding(self.mesh, P(None, None, None))
        ndev = self.ndev

        def f(x):
            n = x.shape[-1]
            k = n // ndev
            v = self._reshape_blocks(x, ndev, k)     # (L, ndev, k)
            ident3 = jnp.asarray(ident_np)[:, :, None]  # (L, 1, 1)
            idx = jax.lax.iota(jnp.int32, k)

            def rolled(v, sh):
                # roll along the per-shard (unsharded) axis; wrapped-in
                # columns are masked by the caller, identity elsewhere
                return jnp.roll(v, -sh if suffix else sh, axis=-1)

            def step(_, carry):
                v, sh = carry
                keep = (idx < k - sh) if suffix else (idx >= sh)
                v = jnp.where(keep[None, None, :], comb(v, rolled(v, sh)), v)
                return v, sh * 2

            nsteps = max(0, (k - 1).bit_length())
            v, _ = jax.lax.fori_loop(0, nsteps, step,
                                     (v, jnp.int32(1)))
            # per-block totals, replicated
            tot = v[..., :1] if suffix else v[..., -1:]
            tot = jax.sharding.reshard(tot, repl)    # (L, ndev, 1)
            # exclusive cross-block offsets: scan over the block axis
            ident2 = jnp.broadcast_to(ident3[:, 0], (L, 1)).astype(v.dtype)

            def scan_step(acc, t):
                nxt = comb(acc, t)
                return nxt, acc
            ts = jnp.moveaxis(tot, 1, 0)             # (ndev, L, 1)
            _, offs = jax.lax.scan(scan_step, ident2, ts, reverse=suffix)
            off3 = jnp.moveaxis(offs, 0, 1)          # (L, ndev, 1) replicated
            off3 = jax.sharding.reshard(off3, self._psb())
            if exclusive:
                keep1 = (idx < k - 1) if suffix else (idx >= 1)
                v = jnp.where(keep1[None, None, :], rolled(v, 1),
                              jnp.broadcast_to(ident3, v.shape).astype(
                                  v.dtype))
            out = comb(v, jnp.broadcast_to(off3, v.shape))
            return jax.lax.reshape(out, (L, n), out_sharding=self._sh)

        return jax.jit(f, out_shardings=self._sh)

    @lru_cache(maxsize=None)
    def _jit_binv_combine(self):
        def f(pe, se, inv_col):
            return fd.mont_mul(fd.mont_mul(pe, se, SPEC),
                               jnp.broadcast_to(inv_col, pe.shape), SPEC)
        return jax.jit(f, out_shardings=self._sh)

    @lru_cache(maxsize=None)
    def _jit_last_col(self):
        """Last element of a sharded (L, n) array as a replicated (L,)
        int64 -- via a masked sum (a width-1 slice on the sharded axis is
        not implementable under explicit sharding)."""
        def f(x):
            n = x.shape[-1]
            idx = jax.lax.iota(jnp.int32, n)
            masked = jnp.where((idx == n - 1)[None, :], x, 0)
            return jnp.sum(masked, axis=1)
        return jax.jit(f)

    @lru_cache(maxsize=None)
    def _jit_mask_tail_one(self):
        def f(x, length, one_col):
            idx = jax.lax.iota(jnp.int32, x.shape[-1])
            return jnp.where((idx < length)[None, :], x,
                             jnp.broadcast_to(one_col, x.shape))
        return jax.jit(f, out_shardings=self._sh)

    def batch_inverse(self, v):
        """Montgomery-trick batch inversion as sharded device scans
        (prefix/suffix product ladders + ONE host inversion), mirroring the
        single-chip TpuEngine pattern; falls back to the exact host path on
        a zero element (same ZeroDivisionError contract would be opaque
        through a device NaN)."""
        if not isinstance(v, SVec):
            return self.host.batch_inverse(v)
        one_col = jnp.asarray(_mont_const(1))
        arr = self._jit_mask_tail_one()(v.arr, jnp.asarray(v.length,
                                                          jnp.int32),
                                        one_col)
        pe = self._jit_ladder("mul", False, True)(arr)   # exclusive prefix
        se = self._jit_ladder("mul", True, True)(arr)    # exclusive suffix
        # total = (product of all but last) * last, combined on the host
        pe_last = fd.host_col_to_int(
            np.asarray(self._jit_last_col()(pe))[:, None], R)
        x_last = fd.host_col_to_int(
            np.asarray(self._jit_last_col()(arr))[:, None], R)
        total = pe_last * x_last % R
        if total == 0:
            out = self.host.batch_inverse(self._demote(v))
            return self._promote(out)
        inv_col = jnp.asarray(_mont_const(inv(total, R)))
        out = self._jit_binv_combine()(pe, se, inv_col)
        return SVec(arr=out, length=v.length)

    # ---- multilinear ops ----------------------------------------------------

    def eq_table(self, point: list[int]):
        n = len(point)
        if (1 << n) < self.min_device_size:
            return self.host.eq_table(point)
        # device doubling construction (eq_eval.rs:6-31 semantics): LSB of
        # the index <-> point[0]; replicated build, then sharded placement
        evals = jnp.asarray(_mont_const(1))
        step = _jit_eq_step()
        for i in range(n - 1, -1, -1):
            r_i = int(point[i]) % R
            evals = step(evals, jnp.asarray(_mont_const(1 - r_i)),
                         jnp.asarray(_mont_const(r_i)))
        return SVec(arr=jax.device_put(evals, self._sh), length=1 << n)

    def eval_expr(self, tables, expr, size: int):
        used = sorted(expr.used_inputs())
        if not used or not any(isinstance(tables[i], SVec) for i in used):
            return self.host.eval_expr(tables, expr, size)
        dev_tables = {i: self._promote(tables[i]).arr for i in used}
        key, const_vals = expr.key()
        consts = self._consts_arr(const_vals)
        fn = self._jit_eval_expr(key, tuple(used))(expr)
        out = fn(consts, *[dev_tables[i] for i in used])
        return SVec(arr=out, length=size)

    def _consts_arr(self, const_vals):
        if not const_vals:
            return jnp.zeros((0, L, 1), jnp.int32)
        return jnp.asarray(np.stack([_mont_const(c) for c in const_vals],
                                    axis=0))

    @lru_cache(maxsize=None)
    def _jit_eval_expr(self, expr_key, used: tuple):
        del expr_key  # cache key component; the expr is rebuilt per call site

        def make(expr):
            def f(consts, *arrs):
                tab = {i: a for i, a in zip(used, arrs)}
                return _emit(expr, tab, consts, [0])
            return jax.jit(f, out_shardings=self._sh)
        return _OnceBuilt(make)

    # ---- sumcheck ------------------------------------------------------------

    def fold(self, v, r: int):
        if not isinstance(v, SVec):
            return self.host.fold(v, r)
        out = self._jit_fold()(v.arr, jnp.asarray(_mont_const(r)))
        sv = SVec(arr=out, length=v.length // 2)
        if sv.length < self.min_device_size:
            return self._demote(sv)
        return sv

    def _pairs(self, arr):
        """(L, n)@x -> (lo, hi) halves of the LSB-pair decomposition, each
        (L, n/2) block-sharded (adjacent pairs never cross shards: the mesh
        axis maps to HIGH index bits)."""
        pairs = jax.lax.reshape(arr, (L, arr.shape[-1] // 2, 2),
                                out_sharding=self._psb())
        return pairs[..., 0], pairs[..., 1]

    @lru_cache(maxsize=None)
    def _jit_fold(self):
        def f(arr, r):
            lo, hi = self._pairs(arr)
            return fd.add(lo, fd.mont_mul(jnp.broadcast_to(r, lo.shape),
                                          fd.sub(hi, lo, SPEC), SPEC), SPEC)
        return jax.jit(f, out_shardings=self._sh)

    def sumcheck_messages(self, tables, expr, degree: int) -> list[int]:
        used = sorted(expr.used_inputs())
        if not any(isinstance(tables[i], SVec) for i in used):
            return self.host.sumcheck_messages(tables, expr, degree)
        arrs = [self._promote(tables[i]).arr for i in used]
        key, const_vals = expr.key()
        fn = self._jit_msgs(key, tuple(used), degree)(expr)
        blocks = fn(self._consts_arr(const_vals), *arrs)   # (T, 22, nb)
        blocks = np.asarray(blocks, dtype=np.int64)
        return [self._lazy_blocks_to_int(blocks[t])
                for t in range(degree + 1)]

    def sumcheck_round_fused(self, tables, expr, degree: int, r_prev: int):
        used = sorted(expr.used_inputs())
        if not any(isinstance(tables[i], SVec) for i in used):
            return self.host.sumcheck_round_fused(tables, expr, degree,
                                                  r_prev)
        new_tables = list(tables)
        half = self.vec_len(tables[used[0]]) // 2
        if half < self.min_device_size:
            for i in used:
                new_tables[i] = self.vec_to_ints(tables[i])
            return self.host.sumcheck_round_fused(new_tables, expr, degree,
                                                  r_prev)
        arrs = [self._promote(tables[i]).arr for i in used]
        key, const_vals = expr.key()
        fn = self._jit_fused(key, tuple(used), degree)(expr)
        out = fn(self._consts_arr(const_vals),
                 jnp.asarray(_mont_const(r_prev)), *arrs)
        blocks = np.asarray(out[0], dtype=np.int64)
        for k, i in enumerate(used):
            new_tables[i] = SVec(arr=out[1 + k], length=half)
        msgs = [self._lazy_blocks_to_int(blocks[t])
                for t in range(degree + 1)]
        return new_tables, msgs

    def _psb4(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P(None, None, "x", None))

    def _restack_pairs(self, stacked):
        """(L, k, n) stacked tables -> (L, k, n/2) lo/hi halves with the
        element axis sharded (adjacent pairs never cross shards)."""
        pairs = jax.lax.reshape(
            stacked, (L, stacked.shape[1], stacked.shape[-1] // 2, 2),
            out_sharding=self._psb4())
        return pairs[..., 0], pairs[..., 1]

    def _stacked_pairs(self, arrs):
        return self._restack_pairs(jnp.stack(arrs, axis=1))

    def _msgs_body(self, expr, used, degree, consts, lo, hi):
        """Message block-sums for one round: evaluate the fused expression
        at ALL t = 0..degree in one batched pass over a T axis.

        The per-t/per-table unrolled form inlined the expression body
        (deg+1) * k times and put the XLA:CPU compile of each round shape
        at ~a minute; batching t as an array axis emits ONE expression body
        (compiled code is equivalent; the message sums are the same exact
        lazy int32 limb sums)."""
        t_np = np.stack([_mont_const(t) for t in range(degree + 1)],
                        axis=1)                            # (22, T, 1)
        diff = fd.sub(hi, lo, SPEC)                        # (22, k, n2)
        lo4 = lo[:, :, None, :]                            # (22, k, 1, n2)
        t_col = jnp.asarray(t_np)[:, None, :, :]           # (22, 1, T, 1)
        shape = (L, lo.shape[1], degree + 1, lo.shape[-1])
        vals = fd.add(jnp.broadcast_to(lo4, shape),
                      fd.mont_mul(jnp.broadcast_to(t_col, shape),
                                  jnp.broadcast_to(diff[:, :, None, :],
                                                   shape), SPEC), SPEC)
        tab = {idx: vals[:, i] for i, idx in enumerate(used)}  # (22, T, n2)
        consts3 = consts[:, :, :, None] if consts.ndim == 3 else consts
        h = _emit(expr, tab, consts3, [0])                 # (22, T, n2)
        n2 = lo.shape[-1]
        bs = self._bs_for(n2)
        h4 = jax.lax.reshape(h, (L, degree + 1, n2 // bs, bs),
                             out_sharding=self._psb4())
        return jnp.transpose(jnp.sum(h4, axis=3), (1, 0, 2))  # (T, 22, nb)

    @lru_cache(maxsize=None)
    def _jit_msgs(self, expr_key, used: tuple, degree: int):
        del expr_key

        def make(expr):
            def f(consts, *arrs):
                lo, hi = self._stacked_pairs(arrs)
                return self._msgs_body(expr, used, degree, consts, lo, hi)
            return jax.jit(f)
        return _OnceBuilt(make)

    @lru_cache(maxsize=None)
    def _jit_fused(self, expr_key, used: tuple, degree: int):
        del expr_key

        def make(expr):
            def f(consts, r, *arrs):
                lo, hi = self._stacked_pairs(arrs)
                folded = fd.add(
                    lo, fd.mont_mul(jnp.broadcast_to(r[:, None], lo.shape),
                                    fd.sub(hi, lo, SPEC), SPEC), SPEC)
                flo, fhi = self._restack_pairs(folded)
                msgs = self._msgs_body(expr, used, degree, consts, flo, fhi)
                return (msgs, *[folded[:, k] for k in range(len(used))])
            return jax.jit(
                f, out_shardings=(None, *([self._sh] * len(used))))
        return _OnceBuilt(make)

    # ---- univariate polynomial ops (host tail; exact) ------------------------

    def poly_eval(self, coeffs, x: int) -> int:
        if isinstance(coeffs, SVec):
            coeffs = self._demote(coeffs)
        return self.host.poly_eval(coeffs, x)

    def poly_mul(self, a, b):
        """NTT product ON THE MESH (the sharded 4-step transform,
        `parallel/ntt.py`) when both operands can shard; exact host
        Kronecker product otherwise.  Results are bit-identical either
        way (exact field arithmetic throughout)."""
        dev = isinstance(a, SVec) or isinstance(b, SVec)
        la = self.vec_len(a)
        lb = self.vec_len(b)
        out_len = la + lb - 1
        n = 1
        while n < out_len:
            n *= 2
        # the 4-step views (n1, n2), both multiples of ndev -> n >= ndev^2
        if dev and n >= max(self.ndev * self.ndev,
                            2 * self.min_device_size):
            pa = self.pad(self._promote(a), n)
            pb = self.pad(self._promote(b), n)
            fa = self._ntt4(pa.arr, n)
            fb = self._ntt4(pb.arr, n)
            prod = self._jit_binop("mul")(fa, fb)
            del fa, fb
            out = self._intt4(prod, n)
            return SVec(arr=out, length=out_len)
        ah = self.vec_to_ints(a) if isinstance(a, SVec) else a
        bh = self.vec_to_ints(b) if isinstance(b, SVec) else b
        out = self.host.poly_mul(ah, bh)
        return self._promote(out) if dev else out

    # ---- sharded 4-step NTT (parallel/ntt.py) -------------------------------

    def _split12(self, n: int):
        """n = n1 * n2, both multiples of ndev, n2 as large as allowed
        (local transforms run on the unsharded n2 axis; n1 stays small so
        the transposed view reshards cleanly)."""
        log2n = n.bit_length() - 1
        log2d = self.ndev.bit_length() - 1
        log2_n1 = max(log2d, log2n - 16)
        if log2n - log2_n1 < log2d:
            log2_n1 = log2n - log2d
        return log2_n1, log2n - log2_n1

    @lru_cache(maxsize=None)
    def _twiddle_dev(self, log2_n1: int, log2_n2: int, inverse: bool):
        from . import ntt as sntt

        t_np = sntt._step_table(log2_n1, log2_n2, inverse)
        if inverse:
            # the inverse applies its step twiddle in the (n1@x, n2)
            # layout ([brev(k1), j2]); the forward in (n2@x, n1)
            t_np = np.ascontiguousarray(np.transpose(t_np, (0, 2, 1)))
        t_step = jax.device_put(jnp.asarray(t_np), self._psb())
        tw1 = jnp.asarray(sntt._flat_twiddles(log2_n1, inverse))
        tw2 = jnp.asarray(sntt._flat_twiddles(log2_n2, inverse))
        return t_step, tw1, tw2

    @lru_cache(maxsize=None)
    def _jit_ntt4(self, log2_n1: int, log2_n2: int):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from . import ntt as sntt

        sh_t = NamedSharding(self.mesh, P(None, "x", None))

        def f(x, t_step, tw1, tw2):
            n1, n2 = 1 << log2_n1, 1 << log2_n2
            v = jax.lax.reshape(x, (L, n1, n2), out_sharding=self._psb())
            v = jax.sharding.reshard(jnp.transpose(v, (0, 2, 1)), sh_t)
            v = sntt._local_dif(v, log2_n1, tw1)       # (L, n2@x, n1)
            v = fd.mont_mul(v, t_step, SPEC)
            v = jax.sharding.reshard(jnp.transpose(v, (0, 2, 1)), sh_t)
            v = sntt._local_dif(v, log2_n2, tw2)       # (L, n1@x, n2)
            return jax.lax.reshape(v, (L, n1 * n2), out_sharding=self._sh)
        return jax.jit(f, out_shardings=self._sh)

    @lru_cache(maxsize=None)
    def _jit_intt4(self, log2_n1: int, log2_n2: int):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from . import ntt as sntt
        from ..fields.bn254 import R as _R

        sh_t = NamedSharding(self.mesh, P(None, "x", None))
        n_inv = pow(1 << (log2_n1 + log2_n2), _R - 2, _R)
        c_inv = _mont_const(n_inv)

        def f(x, t_step, tw1, tw2):
            n1, n2 = 1 << log2_n1, 1 << log2_n2
            v = jax.lax.reshape(x, (L, n1, n2), out_sharding=self._psb())
            v = sntt._local_dit_inv(v, log2_n2, tw2)   # k2 -> j2
            v = fd.mont_mul(v, t_step, SPEC)           # w^{-brev(k1) j2}
            v = jax.sharding.reshard(jnp.transpose(v, (0, 2, 1)), sh_t)
            v = sntt._local_dit_inv(v, log2_n1, tw1)   # k1 -> j1
            v = jax.sharding.reshard(jnp.transpose(v, (0, 2, 1)), sh_t)
            v = fd.mont_mul(v, jnp.broadcast_to(
                jnp.asarray(c_inv)[:, :, None], v.shape), SPEC)
            return jax.lax.reshape(v, (L, n1 * n2), out_sharding=self._sh)
        return jax.jit(f, out_shardings=self._sh)

    def _ntt4(self, arr, n: int):
        log2_n1, log2_n2 = self._split12(n)
        t_step, tw1, tw2 = self._twiddle_dev(log2_n1, log2_n2, False)
        return self._jit_ntt4(log2_n1, log2_n2)(arr, t_step, tw1, tw2)

    def _intt4(self, arr, n: int):
        log2_n1, log2_n2 = self._split12(n)
        t_step, tw1, tw2 = self._twiddle_dev(log2_n1, log2_n2, True)
        return self._jit_intt4(log2_n1, log2_n2)(arr, t_step, tw1, tw2)

    @lru_cache(maxsize=None)
    def _jit_powtable(self, log2n: int):
        """powtable[j] = x^j via binary decomposition of j.  Rolled as a
        fori_loop with ONE mont_mul site (was log2n unrolled sites: the
        22-limb body made each new shape a multi-second XLA:CPU compile,
        part of the round-4 dryrun regression)."""
        def f(pow_stack):
            n = 1 << log2n
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            acc = jnp.broadcast_to(
                jnp.asarray(SPEC.one_mont, jnp.int32)[:, None],
                (L, n)).astype(jnp.int32)

            def step(k, acc):
                p_k = jax.lax.dynamic_index_in_dim(pow_stack, k, axis=0,
                                                   keepdims=False)
                mult = fd.mont_mul(acc, jnp.broadcast_to(p_k, acc.shape),
                                   SPEC)
                return jnp.where(((idx >> k) & 1).astype(bool), mult, acc)

            return jax.lax.fori_loop(0, log2n, step, acc)
        return jax.jit(f, out_shardings=self._sh)

    def _powtable_sharded(self, x: int, n: int):
        log2n = (n - 1).bit_length()
        assert (1 << log2n) == n
        pows, cur = [], x % R
        for _ in range(log2n):
            pows.append(_mont_const(cur))
            cur = cur * cur % R
        stack = jnp.asarray(np.stack(pows, axis=0)) if pows else \
            jnp.zeros((0, L, 1), jnp.int32)
        return self._jit_powtable(log2n)(stack)

    @lru_cache(maxsize=None)
    def _jit_quot_w(self):
        return jax.jit(lambda c, powx: fd.mont_mul(c, powx, SPEC),
                       out_shardings=self._sh)

    @lru_cache(maxsize=None)
    def _jit_quot_combine(self):
        def f(p_incl, y_col, powxi, xinv_col, length):
            shape = p_incl.shape
            diff = fd.sub(jnp.broadcast_to(y_col, shape), p_incl, SPEC)
            q = fd.mont_mul(diff, powxi, SPEC)
            q = fd.mont_mul(q, jnp.broadcast_to(xinv_col, shape), SPEC)
            # keep the zero physical tail invariant (padded SVec slots)
            idx = jax.lax.iota(jnp.int32, shape[-1])
            return jnp.where((idx < length)[None, :], q,
                             jnp.zeros_like(q))
        return jax.jit(f, out_shardings=self._sh)

    def quotient_by_linear(self, coeffs, x: int):
        """(y, q) with q = (p - y)/(X - x) as sharded device scans:
        q_j = (p(x) - P_j) * x^{-(j+1)} with P_j the inclusive prefix of
        c_t x^t (the TpuEngine scan-Horner pattern over one sharded
        array).  Exact; host path for tiny/irregular vectors and x = 0."""
        dev = isinstance(coeffs, SVec)
        n = coeffs.arr.shape[-1] if dev else 0
        if not dev or x % R == 0 or n & (n - 1):
            host_c = self.vec_to_ints(coeffs) if dev else coeffs
            y, q = self.host.quotient_by_linear(host_c, x)
            return y, (self._promote(q) if dev else q)
        x = x % R
        xinv = inv(x, R)
        powx = self._powtable_sharded(x, n)
        w = self._jit_quot_w()(coeffs.arr, powx)
        p_incl = self._jit_ladder("add", False)(w)
        y = fd.host_col_to_int(
            np.asarray(self._jit_last_col()(p_incl))[:, None], R)
        powxi = self._powtable_sharded(xinv, n)
        q = self._jit_quot_combine()(
            p_incl, jnp.asarray(_mont_const(y)), powxi,
            jnp.asarray(_mont_const(xinv)),
            jnp.asarray(coeffs.length, jnp.int32))
        return y, SVec(arr=q, length=coeffs.length)

    # ---- curve ops ------------------------------------------------------------

    def load_points(self, affines: list):
        """Affine CRS -> mesh-sharded basis.  The point count is padded to a
        multiple of the mesh size with identity points (inf mask true) so the
        element sharding divides evenly -- an MSM absorbs identities, so the
        padding is algebraically invisible (`parallel/msm.py` masks by
        `inf`).  `length` stays the true count."""
        from ..ec import curve
        from ..ec.device import host_affine_to_device

        n = len(affines)
        if n < self.min_device_size:
            return self.host.load_points(affines)
        pad = (-n) % self.ndev
        padded = list(affines) + [
            curve.Affine(curve.Fq(0), curve.Fq(0), infinity=True)] * pad
        bx, by, inf = host_affine_to_device(padded)
        to_m = jax.jit(lambda v: fd.to_mont(v, fd.FQ), out_shardings=self._sh)
        return SBasis(bx=to_m(jax.device_put(jnp.asarray(bx), self._sh)),
                      by=to_m(jax.device_put(jnp.asarray(by), self._sh)),
                      inf=jax.device_put(jnp.asarray(inf), self._sh_flat()),
                      affines=list(affines), length=n)

    def _sh_flat(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P("x"))

    def basis_slice(self, basis, n: int):
        """Logical slice: the physical point arrays are never cut (slicing a
        sharded axis to a non-divisible size is ill-defined).  MSMs instead
        zero-pad the scalar vector to the physical width -- a zero scalar
        contributes only to bucket 0, which the telescoped combine cancels
        (`parallel/msm.py`), so trailing basis points are inert."""
        if not isinstance(basis, SBasis):
            return self.host.basis_slice(basis, n)
        if n == basis.length:
            return basis
        return SBasis(bx=basis.bx, by=basis.by, inf=basis.inf,
                      affines=basis.affines[:n], length=n)

    @lru_cache(maxsize=None)
    def _jit_pad_to(self, width: int):
        def f(x):
            return jnp.pad(x, ((0, 0), (0, width - x.shape[-1])))
        return jax.jit(f, out_shardings=self._sh)

    def msm(self, basis, scalars):
        dev_basis = isinstance(basis, SBasis)
        if not dev_basis or self.vec_len(scalars) < self.min_device_size:
            affs = basis.affines if dev_basis else basis
            host_sc = self.vec_to_ints(scalars)
            return self.host.msm(affs[:len(host_sc)],
                                 [int(s) for s in host_sc])
        sv = self._promote(scalars)
        assert sv.length <= basis.length, "MSM scalar vector exceeds basis"
        sc_canon = self._jit_from_mont()(sv.arr)
        width = basis.bx.shape[-1]
        if sc_canon.shape[-1] != width:
            sc_canon = self._jit_pad_to(width)(sc_canon)
        return pmsm.sharded_msm(self.mesh, sc_canon, basis.bx, basis.by,
                                basis.inf)

    def msm_many(self, jobs: list) -> list:
        return [self.msm(b, s) for b, s in jobs]


class _OnceBuilt:
    """lru_cache helper: builds the jitted closure on first call with the
    live expr object (the cache key is the structural expr key)."""

    def __init__(self, make):
        self._make = make
        self._fn = None

    def __call__(self, expr):
        if self._fn is None:
            self._fn = self._make(expr)
        return self._fn


@lru_cache(maxsize=None)
def _jit_eq_step():
    def f(evals, c_lo, c_hi):
        lo = fd.mont_mul(evals, jnp.broadcast_to(c_lo, evals.shape), SPEC)
        hi = fd.mont_mul(evals, jnp.broadcast_to(c_hi, evals.shape), SPEC)
        return jnp.stack([lo, hi], axis=2).reshape(L, -1)
    return jax.jit(f)


def _emit(expr, tables: dict, consts, counter: list):
    """Evaluate an Expr over (22, N) Montgomery limb arrays."""
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
