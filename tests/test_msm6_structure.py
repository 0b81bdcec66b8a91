"""Structural test of the msm6 pipeline over the INTEGER mock algebra.

Replaces only the point-arithmetic leaves of `ec/msm6k.py` (`_xadd` -> int32
add, `_ident_cols` -> zeros, the Pallas level kernels -> pairwise adds, the
host finalize -> modular integers); every index computation runs for real:
c=16 digit extraction, the global sort, the bitrev perm re-index, the
block-contiguous level pairing, the coarse ladder reorder, the Fenwick
query decomposition and the telescoped combine.  The result must equal the
directly-computed sum_i digit_i * v_i mod 2^32 -- any off-by-one in any
index path breaks it.  Runs on CPU in seconds.

One production leaf IS bypassed: `_k_sort_gather`'s bf16 cast of the
gathered leaves.  bf16 is exact only for the production uint8 basis
(integers <= 255); the mock's 11-bit values would round.  The mock
re-runs the real sort + `_bitrev_perm` logic and skips only the cast.
"""

from __future__ import annotations

import numpy as np
import pytest

np.seterr(over="ignore")

import jax
import jax.numpy as jnp

from quill_tpu.ec import msm6, msm6k
from quill_tpu.fields.bn254 import R
from quill_tpu.fields.limbs import ints_to_limbs

CHUNK = msm6.CHUNK
W = msm6.W
WBITS = msm6.WBITS
MASK = (1 << 32) - 1


@pytest.fixture()
def int_world(monkeypatch):
    monkeypatch.setattr(msm6k, "_xadd", lambda a, b: a + b)
    monkeypatch.setattr(msm6k, "_ident_cols",
                        lambda n: jnp.zeros((1, n), jnp.int32))
    monkeypatch.setattr(msm6k, "_lvl_call",
                        lambda h, affine: lambda x: x[:, :h] + x[:, h:])
    monkeypatch.setattr(
        msm6k, "_reduce_cols",
        lambda acc: jnp.sum(acc, axis=-1, keepdims=True,
                            dtype=jnp.int32))
    monkeypatch.setattr(
        msm6k, "_k_coarse",
        lambda n: lambda top, brev_idx: jnp.cumsum(
            top[:, brev_idx], axis=-1, dtype=jnp.int32))

    def sort_gather(keys, base_flat, m, fl_real):
        # real sort + bitrev re-index; only the production bf16 leaf cast
        # (exact for uint8 limbs, lossy for the 11-bit mock) is skipped
        iota = jax.lax.iota(jnp.int32, keys.shape[0])
        sorted_k, perm = jax.lax.sort_key_val(keys, iota)
        perm = jnp.minimum(perm, fl_real - 1)
        pphys = msm6._bitrev_perm(perm, m)
        return sorted_k, perm, base_flat[:, pphys]

    monkeypatch.setattr(msm6, "_k_sort_gather", sort_gather)

    def finalize(s_col, t_col):
        s = int(np.asarray(s_col)[0, 0]) & MASK
        t = int(np.asarray(t_col)[0, 0]) & MASK
        return ((msm6.NBUCK - 1) * t - s) & MASK

    monkeypatch.setattr(msm6, "_finalize_host", finalize)
    # _k_qinit/_k_qstep run the REAL jnp logic over the mocked algebra;
    # their lru_caches may hold real-world traces from other tests
    msm6k._k_qinit.cache_clear()
    msm6k._k_qstep.cache_clear()
    msm6k._k_qstep_pair.cache_clear()
    msm6k._k_qstep0.cache_clear()
    yield
    # drop the mock-algebra traces so later real-world tests retrace
    msm6k._k_qinit.cache_clear()
    msm6k._k_qstep.cache_clear()
    msm6k._k_qstep_pair.cache_clear()
    msm6k._k_qstep0.cache_clear()


def _scalar_chunks(vals):
    out = []
    for off in range(0, len(vals), CHUNK):
        out.append(jnp.asarray(ints_to_limbs(vals[off:off + CHUNK])))
    return out


def _expected(vals, base_vals, inf_flags):
    total = 0
    n = len(vals)
    for j in range(n // CHUNK):
        for w in range(W):
            col0 = j * W * CHUNK + w * CHUNK
            for i in range(CHUNK):
                s = vals[j * CHUNK + i]
                if inf_flags[j * CHUNK + i]:
                    continue
                d = (s >> (WBITS * w)) & (msm6.NBUCK - 1)
                if d:
                    total += d * int(base_vals[col0 + i])
    return total & MASK


@pytest.mark.parametrize("nch_real", [1, 2])
def test_msm6_integer_mirror(int_world, nch_real):
    rng = np.random.default_rng(nch_real)
    n = nch_real * CHUNK
    vals = [int(x) for x in rng.integers(0, 1 << 62, n)]
    # exercise full-width digits in a few scalars + edge values
    vals[0] = 0
    vals[1] = 1
    vals[2] = R - 1
    vals[3] = R - 2
    vals[4] = (1 << 253) + 12345
    inf_flags = np.zeros(n, dtype=bool)
    inf_flags[5] = True
    vals_masked = list(vals)

    base_vals = rng.integers(1, 1 << 11, W * n).astype(np.int64)
    base_flat = jnp.asarray(base_vals.astype(np.int32).reshape(1, -1))
    inf_chunks = [jnp.asarray(inf_flags[j * CHUNK:(j + 1) * CHUNK])
                  for j in range(nch_real)]

    got = msm6._msm_one(base_flat, _scalar_chunks(vals_masked), inf_chunks)
    want = _expected(vals, base_vals, inf_flags)
    assert got == want


def test_msm6_pow2_padding(int_world):
    """3 real chunks pad to 4: the padded flat elements must be invisible."""
    import random

    rng = np.random.default_rng(9)
    prng = random.Random(9)
    n = 3 * CHUNK
    vals = [prng.randrange(R) for _ in range(n)]
    inf_flags = np.zeros(n, dtype=bool)
    base_vals = rng.integers(1, 1 << 11, W * n).astype(np.int64)
    base_flat = jnp.asarray(base_vals.astype(np.int32).reshape(1, -1))
    inf_chunks = [jnp.asarray(inf_flags[j * CHUNK:(j + 1) * CHUNK])
                  for j in range(3)]
    got = msm6._msm_one(base_flat, _scalar_chunks(vals), inf_chunks)
    want = _expected(vals, base_vals, inf_flags)
    assert got == want


def test_bitrev_perm_definition():
    rng = np.random.default_rng(0)
    for m in (8, 9, 12, 13):
        v = jnp.asarray(rng.integers(0, 1 << 30, 1 << m).astype(np.int32))
        out = np.asarray(msm6._bitrev_perm(v, m))
        vv = np.asarray(v)
        brev = np.array([int(format(i, f"0{m}b")[::-1], 2)
                         for i in range(1 << m)])
        np.testing.assert_array_equal(out, vv[brev])


def test_digits16_matches_python():
    import random

    rng = random.Random(3)
    vals = [0, 1, R - 1, R - 2, (1 << 254) % R] + [
        rng.randrange(R) for _ in range(59)]
    vals += [0] * (CHUNK - len(vals))
    sc = jnp.asarray(ints_to_limbs(vals))
    inf = jnp.zeros(CHUNK, bool)
    d = np.asarray(msm6._k_digits16(sc, inf))
    for i in (0, 1, 2, 3, 4, 17, 40):
        for w in range(W):
            assert d[w, i] == (vals[i] >> (WBITS * w)) & 0xFFFF, (i, w)
