"""Differential tests for the 8-bit Pallas sumcheck rounds
(`engine/sumcheck8.py`) against the exact host big-int engine.

Runs on CPU (Pallas interpret mode) at small sizes; the same kernels run on
TPU hardware via test_device_engine.py (the engine dispatches to this path
by default for device-resident tables).
"""

import random

import numpy as np
import pytest

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _fresh_executable_memory():
    """Drop every executable the suite compiled so far before building the
    giant interpret-mode sc8 programs: with the full suite's accumulated
    XLA:CPU executables resident, compiling/running these segfaulted the
    process (reproduced twice at ~86%; standalone runs pass).  Everything
    alphabetically after this module is host-only, so nothing re-pays."""
    import gc

    jax.clear_caches()
    gc.collect()
    yield


from quill_tpu.engine import sumcheck8 as sc8  # noqa: E402
from quill_tpu.engine.host import HostEngine  # noqa: E402
from quill_tpu.fields import device8 as f8  # noqa: E402
from quill_tpu.fields.bn254 import R  # noqa: E402
from quill_tpu.piops.virtual_poly import Const, Input  # noqa: E402

RNG = random.Random(8888)
N = 1 << 12  # table size: streams of 2 blocks each
R_MONT = (1 << f8.R_BITS) % R


def make_state(tabs: dict) -> dict:
    """{input_index: int table} -> {input_index: SlotView} on one state."""
    parts = []
    order = sorted(tabs)
    for i in order:
        mont = [v * R_MONT % R for v in tabs[i]]
        limbs = f8.ints_to_limbs8(mont)
        parts.append(np.concatenate([limbs[:, 0::2], limbs[:, 1::2]],
                                    axis=0))
    data = jnp.asarray(np.concatenate(parts, axis=0))
    st = sc8.Stacked8(data=data, n_slots=len(order),
                      s_active=len(tabs[order[0]]) // 2)
    return {i: sc8.SlotView(st=st, slot=s) for s, i in enumerate(order)}


@pytest.fixture(scope="module")
def tables():
    a = [RNG.randrange(R) for _ in range(N)]
    b = [RNG.randrange(R) for _ in range(N)]
    c = [RNG.randrange(R) for _ in range(N)]
    a[:4] = [0, 1, R - 1, R - 2]
    return a, b, c


EXPRS = [
    Input(0) * Input(1),
    Input(0) * Input(1) + Const(7) * Input(2),
    (Input(0) * Input(1) - Input(2)) * Input(0) + Const(R - 3),
]


@pytest.mark.parametrize("expr", EXPRS, ids=["mul", "affine", "deg3"])
def test_messages8_matches_host(tables, expr):
    host = HostEngine()
    a, b, c = tables
    degree = expr.degree()
    used = sorted(expr.used_inputs())
    vals = {0: a, 1: b, 2: c}
    views = make_state({i: vals[i] for i in used})
    h_tables = [host.vec_from_ints(vals[i]) for i in range(3)]
    assert (sc8.messages8(views, expr, degree)
            == host.sumcheck_messages(h_tables, expr, degree))


@pytest.mark.parametrize("expr", EXPRS, ids=["mul", "affine", "deg3"])
def test_round_fused8_matches_host(tables, expr):
    host = HostEngine()
    a, b, c = tables
    degree = expr.degree()
    used = sorted(expr.used_inputs())
    vals = {0: a, 1: b, 2: c}
    views = make_state({i: vals[i] for i in used})
    h_tables = [host.vec_from_ints(vals[i]) for i in range(3)]
    r = 424242424242424242 % R
    new8, msgs = sc8.round_fused8(views, expr, degree, r)
    h_new, h_msgs = host.sumcheck_round_fused(h_tables, expr, degree, r)
    assert msgs == h_msgs
    for i in used:
        got = sc8.to_host_ints(new8[i])
        assert got == [int(x) for x in h_new[i]]


def test_entry_split_kernel(tables):
    """build_stacked's Pallas parity-split (PP matmul) against numpy."""
    a, _, _ = tables
    mont = [v * R_MONT % R for v in a]
    limbs = f8.ints_to_limbs8(mont)
    out = np.asarray(sc8._entry_call(N)(jnp.asarray(limbs)))
    want_blocks = []
    blk = limbs.reshape(33, N // sc8.BLOCK, sc8.BLOCK)
    for j in range(N // sc8.BLOCK):
        want_blocks.append(np.concatenate(
            [blk[:, j, 0::2], blk[:, j, 1::2]], axis=0))
    want = np.concatenate(want_blocks, axis=1)
    assert np.array_equal(out, want)


def test_fold8_matches_host(tables):
    host = HostEngine()
    a, _, _ = tables
    views = make_state({0: a})
    hv = host.vec_from_ints(a)
    r = 987654321987654321 % R
    out = sc8.fold8(views[0], r)
    hv2 = host.fold(hv, r)
    assert out == [int(x) for x in hv2]


def test_multi_round_cascade(tables):
    """Fused rounds in sequence: messages and folded tables stay exact
    through the lazy-domain chaining and re-split of normal-form output."""
    host = HostEngine()
    a, b, _ = tables
    expr = Input(0) * Input(1)
    degree = expr.degree()
    views = make_state({0: a, 1: b})
    h_tables = [host.vec_from_ints(a), host.vec_from_ints(b)]
    msgs0 = sc8.messages8(views, expr, degree)
    h_msgs0 = host.sumcheck_messages(h_tables, expr, degree)
    assert msgs0 == h_msgs0
    for rnd, r in enumerate([111111111111 % R, R - 5]):
        views, msgs = sc8.round_fused8(views, expr, degree, r)
        h_tables, h_msgs = host.sumcheck_round_fused(h_tables, expr,
                                                     degree, r)
        assert msgs == h_msgs, f"round {rnd}"
    for i in (0, 1):
        assert sc8.to_host_ints(views[i]) == [
            int(x) for x in h_tables[i]]
