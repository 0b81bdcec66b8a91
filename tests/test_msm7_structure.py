"""Structural test of the SIGNED-digit msm7 pipeline over the integer
mock algebra (same methodology as `tests/test_msm6_structure.py`: only
the point-arithmetic leaves are replaced; the signed digit recoding, the
key2 sort, sign-plane recovery, bitrev re-index, level pairing, coarse
ladder, half-width Fenwick decomposition and the m'*T - S telescoped
combine all run for real and must reproduce sum_i s_i * v_i mod 2^32)."""

from __future__ import annotations

import numpy as np
import pytest

np.seterr(over="ignore")

import jax
import jax.numpy as jnp

from quill_tpu.ec import msm6, msm6k, msm7, msm7k
from quill_tpu.fields.bn254 import R
from quill_tpu.fields.limbs import ints_to_limbs

CHUNK = msm7.CHUNK
W = msm7.W
WBITS = msm7.WBITS
MASK = (1 << 32) - 1


def _signed_digits(s: int) -> list[int]:
    """The carry-chain recoding mirrored in plain Python."""
    out, carry = [], 0
    for w in range(W):
        t = ((s >> (WBITS * w)) & 0xFFFF) + carry
        if t >= 1 << (WBITS - 1):
            out.append(t - (1 << WBITS))
            carry = 1
        else:
            out.append(t)
            carry = 0
    assert carry == 0
    return out


def test_signed_digit_recoding_matches_python():
    import random

    rng = random.Random(5)
    vals = [0, 1, R - 1, R - 2, (1 << 253) + 12345, (1 << 255) % R] + [
        rng.randrange(R) for _ in range(58)]
    vals += [0] * (CHUNK - len(vals))
    sc = jnp.asarray(ints_to_limbs(vals))
    inf = jnp.zeros(CHUNK, bool)
    k2 = np.asarray(msm7._k_digits16s(sc, inf))
    for i in (0, 1, 2, 3, 4, 5, 23, 41):
        ds = _signed_digits(vals[i])
        # value reconstruction: the recoding must be exact
        assert sum(d << (WBITS * w) for w, d in enumerate(ds)) == vals[i]
        for w in range(W):
            want = (abs(ds[w]) << 1) | (1 if ds[w] < 0 else 0)
            assert k2[w, i] == want, (i, w)


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

    def lvl0s(h):
        def f(x, s):
            v = x * (1 - 2 * s.astype(jnp.int32))
            return v[:, :h] + v[:, h:]
        return f

    monkeypatch.setattr(msm7k, "_lvl0s_call", lvl0s)

    def sort_gather(keys2, base_flat, m, fl_real):
        # real sort + sign recovery + bitrev; only the bf16 casts (exact
        # for the production uint8 basis, lossy for the mock) are skipped
        iota = jax.lax.iota(jnp.int32, keys2.shape[0])
        sorted_k2, perm = jax.lax.sort_key_val(keys2, iota)
        perm = jnp.minimum(perm, fl_real - 1)
        pphys = msm6._bitrev_perm(perm, m)
        sphys = msm6._bitrev_perm(sorted_k2 & 1, m)[None, :]
        return sorted_k2, perm, base_flat[:, pphys], sphys

    monkeypatch.setattr(msm7, "_k_sort_gather", sort_gather)

    def finalize(s_col, t_col):
        s = int(np.asarray(s_col)[0, 0]) & MASK
        t = int(np.asarray(t_col)[0, 0]) & MASK
        return (msm7.NBUCK7 * t - s) & MASK

    monkeypatch.setattr(msm7, "_finalize_host", finalize)
    for k in (msm7k._k_qinit7, msm7k._k_qstep0s, msm6k._k_qstep,
              msm6k._k_qstep_pair):
        k.cache_clear()
    yield
    for k in (msm7k._k_qinit7, msm7k._k_qstep0s, msm6k._k_qstep,
              msm6k._k_qstep_pair):
        k.cache_clear()


def _scalar_chunks(vals):
    out = []
    for off in range(0, len(vals), CHUNK):
        out.append(jnp.asarray(ints_to_limbs(vals[off:off + CHUNK])))
    return out


def _expected(vals, base_vals, inf_flags):
    """Direct signed-digit sum: must equal sum_i s_i * v_i decomposition."""
    total = 0
    n = len(vals)
    for j in range(n // CHUNK):
        for i in range(CHUNK):
            if inf_flags[j * CHUNK + i]:
                continue
            ds = _signed_digits(vals[j * CHUNK + i])
            for w in range(W):
                col0 = j * W * CHUNK + w * CHUNK
                total += ds[w] * int(base_vals[col0 + i])
    return total & MASK


@pytest.mark.parametrize("nch_real", [1, 2])
def test_msm7_integer_mirror(int_world, nch_real):
    rng = np.random.default_rng(nch_real)
    n = nch_real * CHUNK
    vals = [int(x) for x in rng.integers(0, 1 << 62, n)]
    vals[0] = 0
    vals[1] = 1
    vals[2] = R - 1
    vals[3] = R - 2
    vals[4] = (1 << 253) + 12345
    # force digits that recode negative with long carry chains
    vals[6] = 0xFFFF_8000_FFFF_8000
    vals[7] = (1 << 16) - 1
    inf_flags = np.zeros(n, dtype=bool)
    inf_flags[5] = True

    base_vals = rng.integers(1, 1 << 11, W * n).astype(np.int64)
    base_flat = jnp.asarray(base_vals.astype(np.int32).reshape(1, -1))
    inf_chunks = [jnp.asarray(inf_flags[j * CHUNK:(j + 1) * CHUNK])
                  for j in range(nch_real)]

    got = msm7._msm_one(base_flat, _scalar_chunks(vals), inf_chunks)
    want = _expected(vals, base_vals, inf_flags)
    assert got == want


def test_msm7_pow2_padding(int_world):
    """3 real chunks pad to 4: padded flat elements must be invisible."""
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
    got = msm7._msm_one(base_flat, _scalar_chunks(vals), inf_chunks)
    want = _expected(vals, base_vals, inf_flags)
    assert got == want
