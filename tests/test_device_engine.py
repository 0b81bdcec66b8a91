"""Differential tests: TPU/device engine vs exact host big-int engine.

Field arithmetic is exact, so equality is ==, not allclose (SURVEY §4).
These run the same XLA programs the TPU executes, on the CPU backend; kernel
compiles are minutes-long the first time (then disk-cached), so the module is
opt-in:  QUILL_DEVICE_TESTS=1 python -m pytest tests/test_device_engine.py
"""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("QUILL_DEVICE_TESTS"),
    reason="device kernel tests are opt-in (QUILL_DEVICE_TESTS=1); "
    "first run compiles for minutes")

from quill_tpu.fields.bn254 import R  # noqa: E402


@pytest.fixture(scope="module")
def engines():
    from quill_tpu.engine.device import TpuEngine
    from quill_tpu.engine.host import HostEngine

    return TpuEngine(), HostEngine()


@pytest.fixture(scope="module")
def data():
    from quill_tpu.engine.device import CHUNK

    rng = random.Random(0)
    n = 2 * CHUNK
    a = [rng.randrange(R) for _ in range(n)] + []
    b = [rng.randrange(R) for _ in range(n)]
    a[:4] = [0, 1, R - 1, R - 2]
    return a, b


def _eq(eng, dv, hv):
    got = [int(x) for x in eng.vec_to_ints(dv)]
    want = [int(x) for x in hv]
    assert got == want


class TestElementwise:
    def test_roundtrip(self, engines, data):
        eng, host = engines
        a, _ = data
        _eq(eng, eng.vec_from_ints(a), host.vec_from_ints(a))

    def test_add_sub_mul(self, engines, data):
        eng, host = engines
        a, b = data
        da, db = eng.vec_from_ints(a), eng.vec_from_ints(b)
        ha, hb = host.vec_from_ints(a), host.vec_from_ints(b)
        _eq(eng, eng.add(da, db), host.add(ha, hb))
        _eq(eng, eng.sub(da, db), host.sub(ha, hb))
        _eq(eng, eng.mul(da, db), host.mul(ha, hb))

    def test_scalar_ops(self, engines, data):
        eng, host = engines
        a, _ = data
        da = eng.vec_from_ints(a)
        ha = host.vec_from_ints(a)
        c = 987654321987654321 % R
        _eq(eng, eng.add_scalar(da, c), host.add_scalar(ha, c))
        _eq(eng, eng.mul_scalar(da, c), host.mul_scalar(ha, c))


class TestReductions:
    def test_vsum_inner(self, engines, data):
        eng, host = engines
        a, b = data
        da, db = eng.vec_from_ints(a), eng.vec_from_ints(b)
        ha, hb = host.vec_from_ints(a), host.vec_from_ints(b)
        assert eng.vsum(da) == host.vsum(ha)
        assert eng.inner(da, db) == host.inner(ha, hb)

    def test_batch_inverse(self, engines, data):
        eng, host = engines
        _, b = data
        db = eng.vec_from_ints(b)
        hb = host.vec_from_ints(b)
        _eq(eng, eng.batch_inverse(db), host.batch_inverse(hb))


class TestMultilinear:
    def test_fold_and_handoff(self, engines, data):
        eng, host = engines
        a, _ = data
        da = eng.vec_from_ints(a)
        ha = host.vec_from_ints(a)
        r = 1234567890123 % R
        fa, fha = eng.fold(da, r), host.fold(ha, r)
        _eq(eng, fa, fha)
        # next fold crosses the chunk boundary -> host representation
        fa2, fha2 = eng.fold(fa, r), host.fold(fha, r)
        assert [int(x) for x in fa2] == [int(x) for x in fha2]

    def test_eq_table(self, engines):
        eng, host = engines
        rng = random.Random(3)
        point = [rng.randrange(R) for _ in range(17)]
        _eq(eng, eng.eq_table(point), host.eq_table(point))

    def test_sumcheck_messages(self, engines, data):
        from quill_tpu.piops.virtual_poly import Const, Input

        eng, host = engines
        a, b = data
        expr = Input(0) * Input(1) + Const(7) * Input(0)
        d_tables = [eng.vec_from_ints(a), eng.vec_from_ints(b)]
        h_tables = [host.vec_from_ints(a), host.vec_from_ints(b)]
        deg = expr.degree()
        assert (eng.sumcheck_messages(d_tables, expr, deg)
                == host.sumcheck_messages(h_tables, expr, deg))


class TestUnivariate:
    def test_poly_eval_quotient(self, engines, data):
        eng, host = engines
        a, _ = data
        da = eng.vec_from_ints(a)
        ha = host.vec_from_ints(a)
        x = 55555555555 % R
        assert eng.poly_eval(da, x) == host.poly_eval(ha, x)
        dy, dq = eng.quotient_by_linear(da, x)
        hy, hq = host.quotient_by_linear(ha, x)
        assert dy == hy
        got = [int(v) for v in eng.vec_to_ints(dq)][:len(a) - 1]
        assert got == [int(v) for v in hq]

    def test_quotient_many_batched(self, engines, data):
        """Stacked open_many quotient pass (`engine/quotient.py`) ==
        per-job quotient_by_linear, across mixed polys/points."""
        from quill_tpu.engine.quotient import quotient_many_device

        eng, host = engines
        a, b = data
        da, db = eng.vec_from_ints(a), eng.vec_from_ints(b)
        xs = [55555555555 % R, 123456789123456789 % R, R - 7]
        jobs = [(da, xs[0]), (da, xs[1]), (db, xs[0]), (db, xs[2])]
        outs = quotient_many_device(eng, jobs)
        for (poly, x), (y, q) in zip(jobs, outs):
            y2, q2 = eng.quotient_by_linear(poly, x)
            assert y == y2
            assert ([int(v) for v in eng.vec_to_ints(q)]
                    == [int(v) for v in eng.vec_to_ints(q2)])

    def test_s_polynomial_one_ntt(self, engines, data):
        """Device s_polynomial (single product, `ipa.rs:122-157` values)
        vs the generic two-product host path; includes a mismatched-length
        (zero-padded) pair."""
        from quill_tpu.pcs import ipa

        eng, host = engines
        a, b = data
        half = len(a) // 2  # == CHUNK: the single-chunk case (n-1 < CHUNK)
        for aa, bb in ((a, b), (a, b[:half + 3]), (a[:half], b[:half])):
            got = ipa.compute_s_polynomial(
                eng, eng.vec_from_ints(aa), eng.vec_from_ints(bb))
            want = ipa.s_polynomial_generic(
                host, host.vec_from_ints(aa), host.vec_from_ints(bb))
            n = host.vec_len(want)
            assert eng.vec_len(got) == n
            got_i = [int(x) for x in eng.vec_to_ints(got)][:n]
            assert got_i == [int(x) for x in want]

    def test_ntt_poly_mul(self, engines):
        from quill_tpu.engine.device import CHUNK

        eng, host = engines
        rng = random.Random(4)
        # 1-chunk inputs (2-chunk transform) and 2-chunk inputs (4-chunk
        # transform: exercises the chunk-level butterflies + step-2
        # twiddles around the in-chunk MXU kernel)
        for nch in (1, 2):
            n = nch * CHUNK
            a = [rng.randrange(R) for _ in range(n)]
            b = [rng.randrange(R) for _ in range(n)]
            da, db = eng.vec_from_ints(a), eng.vec_from_ints(b)
            got = eng.poly_mul(da, db)
            want = host.poly_mul(host.vec_from_ints(a),
                                 host.vec_from_ints(b))
            got_i = [int(x) for x in eng.vec_to_ints(got)][:2 * n - 1]
            assert got_i == [int(x) for x in want]


class TestCurveAndMsm:
    def test_pt_add_matches_host(self, engines):
        import jax
        import jax.numpy as jnp

        from quill_tpu.ec import curve
        from quill_tpu.ec import device as ed
        from quill_tpu.fields import device as fd

        rng = random.Random(5)
        g = curve.g1_generator()
        ks1 = [rng.randrange(1, R) for _ in range(14)] + [5, 5]
        ks2 = [rng.randrange(1, R) for _ in range(14)] + [5, R - 5]
        p1 = curve.batch_to_affine([g.scalar_mul(k) for k in ks1])
        p2 = curve.batch_to_affine([g.scalar_mul(k) for k in ks2])
        tm = jax.jit(lambda x: fd.to_mont(x, fd.FQ))

        def dev(pts):
            x, y, inf = ed.host_affine_to_device(pts)
            return ed.affine_to_projective(tm(jnp.asarray(x)),
                                           tm(jnp.asarray(y)),
                                           jnp.asarray(inf))

        s = jax.jit(ed.pt_add)(dev(p1), dev(p2))
        for i, (k1, k2) in enumerate(zip(ks1, ks2)):
            got = ed.device_point_to_host(tuple(c[:, i:i + 1] for c in s))
            assert got == g.scalar_mul((k1 + k2) % R)

    def test_msm_device(self, engines):
        import jax.numpy as jnp

        from quill_tpu.ec import curve
        from quill_tpu.ec import msm as msm_mod
        from quill_tpu.fields.limbs import ints_to_limbs

        rng = random.Random(6)
        n = msm_mod.CHUNK
        g = curve.g1_generator()
        base = [g.scalar_mul(rng.randrange(1, R)) for _ in range(8)]
        pts, acc = [], base[0]
        for i in range(n):
            pts.append(acc)
            acc = acc.add(base[i % 8])
        affs = curve.batch_to_affine(pts)
        basis = msm_mod.load_basis(affs)
        scalars = [rng.randrange(R) for _ in range(n)]
        scalars[:3] = [0, 1, R - 1]
        got = msm_mod.msm_device(basis,
                                 [jnp.asarray(ints_to_limbs(scalars))], n)
        assert got == curve.msm_host(affs, scalars)


class TestFusedSumcheckRound:
    def test_fused_round_matches_host(self, engines, data):
        from quill_tpu.piops.virtual_poly import Input

        eng, host = engines
        a, b = data
        expr = Input(0) * Input(1)
        deg = expr.degree()
        d_tables = [eng.vec_from_ints(a), eng.vec_from_ints(b)]
        h_tables = [host.vec_from_ints(a), host.vec_from_ints(b)]
        r = 424242424242 % R
        d_new, d_msgs = eng.sumcheck_round_fused(d_tables, expr, deg, r)
        h_new, h_msgs = host.sumcheck_round_fused(h_tables, expr, deg, r)
        assert d_msgs == h_msgs
        for dv, hv in zip(d_new, h_new):
            got = [int(x) for x in eng.vec_to_ints(dv)]
            assert got == [int(x) for x in hv]
