"""Sharded 4-step NTT polynomial products: exact (==) vs the host engine,
and the S-polynomial flow runs with NO host-engine round-trip (VERDICT
round-4 item 5).  Runs on the 8-virtual-device CPU mesh (conftest)."""

from __future__ import annotations

import random

import pytest

from quill_tpu.engine.host import HostEngine
from quill_tpu.fields.bn254 import R
from quill_tpu.parallel import mesh as mesh_mod
from quill_tpu.parallel.engine import ShardedEngine


@pytest.fixture(scope="module")
def eng():
    return ShardedEngine(mesh_mod.make_mesh(8), min_device_size=16)


HOST = HostEngine()


def _ints(v, e):
    return [int(x) for x in e.vec_to_ints(v)]


@pytest.mark.parametrize("la,lb", [(512, 512), (512, 300), (70, 70)])
def test_sharded_poly_mul_matches_host(eng, la, lb):
    rng = random.Random(la * 1000 + lb)
    a = [rng.randrange(R) for _ in range(la)]
    b = [rng.randrange(R) for _ in range(lb)]
    out = eng.poly_mul(eng.vec_from_ints(a), eng.vec_from_ints(b))
    want = HOST.poly_mul(HOST.vec_from_ints(a), HOST.vec_from_ints(b))
    assert eng.vec_len(out) == la + lb - 1
    assert _ints(out, eng) == [int(x) for x in want]


def test_sharded_reverse_and_window_slice(eng):
    rng = random.Random(9)
    n = 192
    a = [rng.randrange(R) for _ in range(n)]
    sv = eng.vec_from_ints(a)
    rev = eng.reverse(sv)
    assert _ints(rev, eng) == list(reversed(a))
    win = eng.slice(sv, 64, 191)
    assert _ints(win, eng) == a[64:191]


def test_s_polynomial_flow_stays_on_mesh(eng, monkeypatch):
    """The full S-polynomial computation (pad, reverse, two NTT products,
    add, suffix slice) must never fall back to the host engine at sharded
    sizes -- the round-4 verdict's last ShardedEngine host hole."""
    from quill_tpu.pcs import ipa

    rng = random.Random(11)
    n = 512
    f = [rng.randrange(R) for _ in range(n)]
    g = [rng.randrange(R) for _ in range(n)]
    sf = eng.vec_from_ints(f)
    sg = eng.vec_from_ints(g)

    def boom(*a, **k):
        raise AssertionError("host engine hit in the S-poly hot path")

    for name in ("poly_mul", "reverse", "slice", "pad"):
        monkeypatch.setattr(eng.host, name, boom)
    s = ipa.s_polynomial_generic(eng, sf, sg)
    monkeypatch.undo()

    want = ipa.s_polynomial_generic(HOST, HOST.vec_from_ints(f),
                                    HOST.vec_from_ints(g))
    assert _ints(s, eng) == [int(x) for x in want]


def test_sharded_poly_mul_single_device():
    """ndev=1 regression: the 4-step split degenerates to n1=1 (no
    stages in the first local transform) -- crashed with empty twiddle
    stacks before the log2m==0 guards."""
    eng1 = ShardedEngine(mesh_mod.make_mesh(1), min_device_size=16)
    rng = random.Random(21)
    a = [rng.randrange(R) for _ in range(64)]
    b = [rng.randrange(R) for _ in range(64)]
    out = eng1.poly_mul(eng1.vec_from_ints(a), eng1.vec_from_ints(b))
    want = HOST.poly_mul(HOST.vec_from_ints(a), HOST.vec_from_ints(b))
    assert _ints(out, eng1) == [int(x) for x in want]
