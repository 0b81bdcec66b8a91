"""Wiring tests for the MSM prefix-tree schedules (`ec/msm3._tree`,
`ec/msm5._tree5`).

The round-3 treetop fusion consumed the 16-row level inside
`_k_treetop_down` but the down loop still iterated over it, feeding every
`_down_call` a u-array one level too coarse (Pallas clamps the OOB block
reads silently) -- wrong results with no crash.  These tests pin the level
bookkeeping itself: every tree/treetop/ladder callee is replaced by an
integer-sum mock with the same interleave/negate semantics, so
`_tree(leaves)` must equal plain inclusive prefix sums.  Runs in
milliseconds, no Pallas, no field arithmetic.
"""

from __future__ import annotations

import numpy as np
import pytest

from quill_tpu.ec import msm3, msm5


# ---------------------------------------------------------------------------
# integer mocks mirroring the point-algebra kernels (coords axis of size 1;
# point add -> +, point neg -> -)
# ---------------------------------------------------------------------------


def _mock_up_call(k_out, m_len):
    def run(x):
        assert x.shape[0] == 2 * k_out, (x.shape, k_out)
        return x[0::2] + x[1::2]

    return run


def _mock_down_call(k_in, m_len):
    def run(i_arr, u):
        # the wiring invariant the round-3 bug broke: each down level's
        # u-array is exactly twice the height of the incoming prefixes
        assert i_arr.shape[0] == k_in
        assert u.shape[0] == 2 * k_in, (i_arr.shape, u.shape)
        even = i_arr - u[1::2]
        out = np.empty((2 * k_in,) + i_arr.shape[1:], dtype=i_arr.dtype)
        out[0::2] = even
        out[1::2] = i_arr
        return out

    return run


def _mock_treetop_up(x16):
    assert x16.shape[0] == 16
    r = np.transpose(x16, (1, 0, 2))
    levels = []
    while r.shape[1] > 1:
        r = r[:, 0::2] + r[:, 1::2]
        levels.append(r)
    packed = np.concatenate(levels, axis=1)            # (C, 15, m)
    return np.transpose(packed, (1, 0, 2))


def _mock_prefix_cols(v):
    return np.cumsum(v, axis=-1)


def _mock_treetop_down(lane_incl, x16, packed):
    def down_t(i_arr, u):
        even = i_arr - u[:, 1::2]
        k = i_arr.shape[1]
        return np.stack([even, i_arr], axis=2).reshape(
            (i_arr.shape[0], 2 * k) + i_arr.shape[2:])

    pk = np.transpose(packed, (1, 0, 2))
    l8, l4, l2 = pk[:, :8], pk[:, 8:12], pk[:, 12:14]
    x = np.transpose(x16, (1, 0, 2))
    i_arr = lane_incl[:, None]
    for u in (l2, l4, l8, x):
        i_arr = down_t(i_arr, u)
    return np.transpose(i_arr, (1, 0, 2))


@pytest.fixture()
def mocked(monkeypatch):
    # msm5._tree5 calls back into msm3 for every shared level, so patching
    # msm3's names covers both trees
    monkeypatch.setattr(msm3, "_up_call", _mock_up_call)
    monkeypatch.setattr(msm3, "_down_call", _mock_down_call)
    monkeypatch.setattr(msm3, "_k_treetop_up", _mock_treetop_up)
    monkeypatch.setattr(msm3, "_k_treetop_down", _mock_treetop_down)
    monkeypatch.setattr(msm3, "_prefix_cols", _mock_prefix_cols)


def _expected_prefix(leaves):
    """Inclusive prefix sums in element order pos = m*S + s."""
    s, _, m = leaves.shape
    flat = leaves[:, 0, :].T.reshape(-1)               # lane-major
    pref = np.cumsum(flat).reshape(m, s).T             # back to (S, M)
    return pref[:, None, :]


# ---------------------------------------------------------------------------
# msm3._tree
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("s0", [256, 64, 32])
def test_tree_full_is_prefix_sum(mocked, s0):
    rng = np.random.default_rng(s0)
    leaves = rng.integers(0, 1000, size=(s0, 1, 4)).astype(np.int64)
    out = msm3._tree(leaves.copy(), full=True)
    np.testing.assert_array_equal(out, _expected_prefix(leaves))


@pytest.mark.parametrize("s0", [256, 64, 32])
def test_tree_half_is_odd_prefix(mocked, s0):
    rng = np.random.default_rng(100 + s0)
    leaves = rng.integers(0, 1000, size=(s0, 1, 4)).astype(np.int64)
    out = msm3._tree(leaves.copy(), full=False)
    exp = _expected_prefix(leaves)[1::2]               # 2-node level
    np.testing.assert_array_equal(out, exp)


def test_tree_small_branch(mocked):
    rng = np.random.default_rng(7)
    leaves = rng.integers(0, 1000, size=(16, 1, 4)).astype(np.int64)
    out = msm3._tree(leaves.copy(), full=True)
    np.testing.assert_array_equal(out, _expected_prefix(leaves))


# ---------------------------------------------------------------------------
# msm5._tree5 (bf16 leaf level mocked too)
# ---------------------------------------------------------------------------


def test_tree5_matches_half_prefix(mocked, monkeypatch):
    monkeypatch.setattr(msm5, "_up0_call", _mock_up_call)
    rng = np.random.default_rng(11)
    leaves = rng.integers(0, 1000, size=(256, 1, 4)).astype(np.int64)
    out = msm5._tree5(leaves.copy())
    exp = _expected_prefix(leaves)[1::2]
    np.testing.assert_array_equal(out, exp)
