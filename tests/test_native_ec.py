"""Native C G1 backend (`native/ec_g1.c`) vs the pure-Python oracle.

Exact-equality differential tests in the spirit of the reference's
cross-validation pattern (`/root/reference/pcs/src/mlpcs.rs:283-285`): the
native backend must agree with the Python implementation on canonical
integers, including identity points and edge scalars.
"""

import random

import pytest

from quill_tpu.ec import curve, native_ec
from quill_tpu.fields.bn254 import R

pytestmark = pytest.mark.skipif(
    not native_ec.available(),
    reason="native ec_g1 backend not built (make -C native)")

RNG = random.Random(42)


def _py_msm(points, scalars):
    """Pure-Python Pippenger, bypassing the native routing in msm_host."""
    n = min(len(points), len(scalars))
    acc = curve.Jacobian.identity(curve.Fq(1))
    for i in range(n):
        if points[i].infinity:
            continue
        p = curve.Jacobian(points[i].x, points[i].y, curve.Fq(1))
        acc = acc.add(p.scalar_mul(int(scalars[i]) % R))
    return acc


def _rand_points(n):
    g = curve.g1_generator()
    return curve.batch_to_affine(
        [g.scalar_mul(RNG.randrange(1, R)) for _ in range(n)])


def test_msm_matches_python():
    pts = _rand_points(17)
    scalars = [RNG.randrange(R) for _ in range(17)]
    scalars[3] = 0
    scalars[5] = R - 1
    scalars[7] = 1
    assert native_ec.msm(pts, scalars) == _py_msm(pts, scalars)


def test_msm_wide_window():
    """n in [32, 128] exercises the arkworks-style c=ln(n)+2 window sizing
    and cross-word digit extraction in quill_g1_msm (small-n tests always
    select c=3 and never cross a 64-bit word boundary)."""
    for n in (32, 80, 128):
        pts = _rand_points(n)
        # repeated and inverse bases stress bucket accumulation
        pts[1] = pts[0]
        pts[2] = curve.Affine(pts[0].x, curve.Fq(0) - pts[0].y)
        scalars = [RNG.randrange(R) for _ in range(n)]
        scalars[4] = R - 1
        assert native_ec.msm(pts, scalars) == _py_msm(pts, scalars)


def test_msm_with_infinity_points():
    pts = _rand_points(6)
    pts[2] = curve.Affine(curve.Fq(0), curve.Fq(0), infinity=True)
    scalars = [RNG.randrange(R) for _ in range(6)]
    assert native_ec.msm(pts, scalars) == _py_msm(pts, scalars)


def test_msm_empty_and_all_zero():
    assert native_ec.msm([], []).is_identity()
    pts = _rand_points(4)
    assert native_ec.msm(pts, [0, 0, 0, 0]).is_identity()


def test_batch_normalize_matches_python():
    g = curve.g1_generator()
    pts = [g.scalar_mul(RNG.randrange(1, R)) for _ in range(9)]
    pts[4] = curve.Jacobian.identity(curve.Fq(1))
    native = native_ec.batch_to_affine(pts)
    for p, a in zip(pts, native):
        if p.is_identity():
            assert a.infinity
        else:
            exp = p.to_affine()
            assert not a.infinity
            assert (a.x.v, a.y.v) == (exp.x.v, exp.y.v)


def test_scalar_mul_many_matches_python():
    g_aff = curve.g1_generator().to_affine()
    scalars = [0, 1, 2, R - 1, RNG.randrange(R)]
    got = native_ec.scalar_mul_many(g_aff, scalars)
    base = curve.Jacobian(g_aff.x, g_aff.y, curve.Fq(1))
    for s, p in zip(scalars, got):
        assert p == base.scalar_mul(s)


def test_curve_msm_host_routes_native():
    """msm_host must give the same Jacobian class result either way."""
    pts = _rand_points(8)
    scalars = [RNG.randrange(R) for _ in range(8)]
    assert curve.msm_host(pts, scalars) == _py_msm(pts, scalars)
