"""Differential tests for the 8-bit-limb field core (fields/device8.py)
against exact Python integer arithmetic, and against the 12-bit core's
representation (repacking round-trips).

Runs on CPU (the jnp reference ops are backend-agnostic); the Pallas fused
kernels are tested on hardware in test_device_engine.py.
"""
import random

import numpy as np
import pytest

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax.numpy as jnp  # noqa: E402

from quill_tpu.fields import device8 as f8  # noqa: E402
from quill_tpu.fields import device as f12  # noqa: E402
from quill_tpu.fields.bn254 import P, R  # noqa: E402
from quill_tpu.fields.limbs import ints_to_limbs  # noqa: E402

RNG = random.Random(20260818)
RINV = {m: pow(1 << 264, -1, m) for m in (P, R)}


def rand_elems(n, modulus):
    return [RNG.randrange(modulus) for _ in range(n)]


def to_dev(xs, modulus):
    """ints -> Montgomery-form lazy device limbs (33, N)."""
    mont = [x * ((1 << 264) % modulus) % modulus for x in xs]
    return jnp.asarray(f8.ints_to_limbs8(mont))


def from_dev(a, spec):
    """lazy device limbs -> canonical ints (out of Montgomery form)."""
    can = np.asarray(f8.lazy_to_canonical(a, spec))
    vals = f8.limbs8_to_ints(can)
    return [v * RINV[spec.modulus] % spec.modulus for v in vals]


@pytest.mark.parametrize("spec,modulus", [(f8.FR8, R), (f8.FQ8, P)])
def test_mont_mul_exact(spec, modulus):
    n = 64
    xs, ys = rand_elems(n, modulus), rand_elems(n, modulus)
    a, b = to_dev(xs, modulus), to_dev(ys, modulus)
    out = from_dev(f8.mont_mul(a, b, spec), spec)
    assert out == [x * y % modulus for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec,modulus", [(f8.FR8, R), (f8.FQ8, P)])
def test_add_sub_neg(spec, modulus):
    n = 64
    xs, ys = rand_elems(n, modulus), rand_elems(n, modulus)
    a, b = to_dev(xs, modulus), to_dev(ys, modulus)
    assert from_dev(f8.add(a, b, spec), spec) == [
        (x + y) % modulus for x, y in zip(xs, ys)]
    assert from_dev(f8.sub(a, b, spec), spec) == [
        (x - y) % modulus for x, y in zip(xs, ys)]
    assert from_dev(f8.neg(a, spec), spec) == [(-x) % modulus for x in xs]


def test_edge_values():
    for modulus, spec in ((R, f8.FR8), (P, f8.FQ8)):
        xs = [0, 1, 2, modulus - 1, modulus - 2, (modulus - 1) // 2,
              (1 << 253) % modulus, ((1 << 254) - 1) % modulus]
        a = to_dev(xs, modulus)
        sq = from_dev(f8.mont_mul(a, a, spec), spec)
        assert sq == [x * x % modulus for x in xs]


def test_to_from_mont():
    n = 32
    xs = rand_elems(n, R)
    canon = jnp.asarray(f8.ints_to_limbs8(xs))
    m = f8.to_mont(canon, f8.FR8)
    back = f8.limbs8_to_ints(np.asarray(f8.from_mont(m, f8.FR8)))
    assert back == xs


def test_chained_ops_stress():
    """Random op chains: the lazy bounds must hold through arbitrary
    protocol-shaped sequences (adds/subs/muls interleaved)."""
    modulus, spec = R, f8.FR8
    n = 16
    vals = rand_elems(n, modulus)
    a = to_dev(vals, modulus)
    model = list(vals)
    others = rand_elems(n, modulus)
    b = to_dev(others, modulus)
    for step in range(40):
        op = RNG.choice(["add", "sub", "mul", "addb", "mulb"])
        if op == "add":
            a = f8.add(a, a, spec)
            model = [2 * x % modulus for x in model]
        elif op == "sub":
            a = f8.sub(a, b, spec)
            model = [(x - y) % modulus for x, y in zip(model, others)]
        elif op == "mul":
            a = f8.mont_mul(a, a, spec)
            model = [x * x % modulus for x in model]
        elif op == "addb":
            a = f8.add(a, b, spec)
            model = [(x + y) % modulus for x, y in zip(model, others)]
        else:
            a = f8.mont_mul(a, b, spec)
            model = [x * y % modulus for x, y in zip(model, others)]
        # limb-bound invariant (exactness precondition for the next mul)
        assert float(jnp.max(jnp.abs(a))) <= 640.0
    assert from_dev(a, spec) == model


def test_lazy_add_chain_then_mul():
    """Unreduced lazy adds below the documented bound, then a mul."""
    modulus, spec = R, f8.FR8
    xs = rand_elems(8, modulus)
    a = to_dev(xs, modulus)
    acc = a
    model = list(xs)
    for _ in range(2):
        acc = f8.lazy_add(acc, a)
        model = [(m + x) % modulus for m, x in zip(model, xs)]
    out = from_dev(f8.mont_mul(acc, a, spec), spec)
    assert out == [m * x % modulus for m, x in zip(model, xs)]


def test_repack_12_8_roundtrip():
    xs = rand_elems(64, R) + [0, 1, R - 1]
    a12 = jnp.asarray(ints_to_limbs(xs))
    a8 = f8.from12(a12)
    assert f8.limbs8_to_ints(np.asarray(a8)) == xs
    back = f8.to12(a8)
    assert np.array_equal(np.asarray(back), np.asarray(a12))


def test_mont_mul_const_and_one():
    modulus, spec = R, f8.FR8
    xs = rand_elems(16, modulus)
    a = to_dev(xs, modulus)
    c = RNG.randrange(modulus)
    c_mont = f8.int_to_limbs8(c * ((1 << 264) % modulus) % modulus)
    out = from_dev(f8.mont_mul_const(a, c_mont, spec), spec)
    assert out == [x * c % modulus for x in xs]
    one = from_dev(f8.mont_mul(a, f8.one_mont_like(a, spec), spec), spec)
    assert one == xs
