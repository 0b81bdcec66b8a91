"""Field, curve-group and pairing tests (host oracle layer)."""

import random

import pytest

from quill_tpu.ec import curve
from quill_tpu.ec.pairing import pairing, pairing_check
from quill_tpu.ec.tower import Fq2, Fq12
from quill_tpu.fields.bn254 import P, R
from quill_tpu.fields.scalar import batch_inverse, inv


class TestScalarField:
    def test_inverse(self):
        rng = random.Random(0)
        for _ in range(10):
            a = rng.randrange(1, R)
            assert a * inv(a, R) % R == 1

    def test_inverse_zero_raises(self):
        with pytest.raises(ZeroDivisionError):
            inv(0, R)

    def test_batch_inverse(self):
        rng = random.Random(1)
        vals = [rng.randrange(1, R) for _ in range(100)]
        out = batch_inverse(vals, R)
        for v, o in zip(vals, out):
            assert v * o % R == 1

    def test_batch_inverse_zero_raises(self):
        with pytest.raises(ZeroDivisionError):
            batch_inverse([1, 0, 2], R)


class TestTower:
    def test_fq2_inverse(self):
        a = Fq2(3, 7)
        assert a * a.inverse() == Fq2.one()

    def test_frobenius_is_pth_power(self):
        a = Fq2(123456789, 987654321)
        assert a.frobenius() == a.pow(P)


class TestCurve:
    def test_group_laws_g1(self):
        g = curve.g1_generator()
        assert g.add(g) == g.double()
        assert g.scalar_mul(5) == g.double().double().add(g)
        # order
        assert g.scalar_mul(R).is_identity()
        # commutativity / associativity spot check
        a, b = g.scalar_mul(17), g.scalar_mul(23)
        assert a.add(b) == b.add(a)

    def test_mixed_add(self):
        g = curve.g1_generator()
        p = g.scalar_mul(7)
        q = g.scalar_mul(11)
        assert p.add_affine(q.to_affine()) == p.add(q)
        # doubling branch
        assert p.add_affine(p.to_affine()) == p.double()
        # cancellation branch
        assert p.add_affine(p.neg().to_affine()).is_identity()

    def test_group_laws_g2(self):
        g = curve.g2_generator()
        assert curve.g2_is_on_curve(g.to_affine())
        assert curve.g2_is_on_curve(g.scalar_mul(12345).to_affine())
        assert g.scalar_mul(R).is_identity()

    def test_batch_to_affine(self):
        g = curve.g1_generator()
        pts = [g.scalar_mul(k) for k in [1, 5, 0, 9]]
        pts[2] = curve.Jacobian.identity(curve.Fq(1))
        affs = curve.batch_to_affine(pts)
        for jac, aff in zip(pts, affs):
            if jac.is_identity():
                assert aff.infinity
            else:
                ref = jac.to_affine()
                assert aff.x == ref.x and aff.y == ref.y

    def test_msm_matches_naive(self):
        rng = random.Random(2)
        g = curve.g1_generator()
        n = 20
        pts_jac = [g.scalar_mul(rng.randrange(1, 1000)) for _ in range(n)]
        pts = curve.batch_to_affine(pts_jac)
        scalars = [rng.randrange(0, R) for _ in range(n)]
        expected = curve.Jacobian.identity(curve.Fq(1))
        for p, s in zip(pts_jac, scalars):
            expected = expected.add(p.scalar_mul(s))
        assert curve.msm_host(pts, scalars) == expected

    def test_msm_zero_scalars_and_empty(self):
        g = curve.g1_generator()
        pts = curve.batch_to_affine([g, g.double()])
        assert curve.msm_host(pts, [0, 0]).is_identity()
        assert curve.msm_host([], []).is_identity()


class TestPairing:
    def test_nondegenerate_and_order(self):
        e = pairing(curve.g1_generator().to_affine(),
                    curve.g2_generator().to_affine())
        assert e != Fq12.one()
        assert e.pow(R) == Fq12.one()

    def test_bilinearity(self):
        g1 = curve.g1_generator()
        g2 = curve.g2_generator()
        e = pairing(g1.to_affine(), g2.to_affine())
        a, b = 1234, 56789
        assert pairing(g1.scalar_mul(a).to_affine(),
                       g2.scalar_mul(b).to_affine()) == e.pow(a * b % R)

    def test_pairing_check(self):
        g1 = curve.g1_generator()
        g2 = curve.g2_generator()
        a, b = 99, 101
        assert pairing_check([
            (g1.scalar_mul(a).to_affine(), g2.scalar_mul(b).to_affine()),
            (g1.scalar_mul(a * b % R).neg().to_affine(), g2.to_affine()),
        ])
        assert not pairing_check([
            (g1.scalar_mul(a).to_affine(), g2.scalar_mul(b).to_affine()),
            (g1.scalar_mul(a * b + 1).neg().to_affine(), g2.to_affine()),
        ])

    def test_identity_inputs(self):
        g1 = curve.g1_generator()
        g2 = curve.g2_generator()
        inf1 = g1.add(g1.neg()).to_affine()
        assert pairing(inf1, g2.to_affine()) == Fq12.one()
