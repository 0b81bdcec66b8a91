"""Device NTT over Fr and NTT-based polynomial multiplication.

Replaces the reference's O(d^2) naive polynomial products
(`/root/reference/pcs/src/ipa.rs:147-148`,
`hyperplonk/src/utils/virtual_polynomial.rs:316`) on the large-size path.
BN254 Fr has 2-adicity 28, comfortably covering the 2^23-point transforms a
2^22-row trace needs.

Structure (chunked Bailey/4-step, every kernel fixed-shape):

- the vector is a list of (22, 2^16) chunks; "column" FFT over the chunk
  index is radix-2 decimation-in-frequency with *whole-chunk* butterflies
  (chunk reordering is free host list surgery, twiddles are per-pair host
  constants);
- the "step 2" twiddle for chunk row r is the geometric sequence
  w_N^{k1 * j2}, built on device by the log-doubling power-table kernel;
- the in-chunk length-2^16 row NTT is one jitted kernel: 16 unrolled
  radix-2 stages with per-stage twiddle tables shipped once.

The transform output lives in an (internally consistent) permuted index
order; `poly_mul_ntt` only ever uses NTT -> pointwise multiply -> exact
inverse NTT, for which any fixed permutation cancels.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..fields.bn254 import FR_ROOT_OF_UNITY, FR_TWO_ADICITY, R
from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device as fd  # noqa: E402
from ..fields.limbs import ints_to_limbs  # noqa: E402

L = fd.L
LOG2_CHUNK = 16
CHUNK = 1 << LOG2_CHUNK
SPEC = fd.FR


def _root_of_unity(log2_n: int) -> int:
    assert log2_n <= FR_TWO_ADICITY
    return pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - log2_n), R)


def _mont(x: int) -> np.ndarray:
    return ints_to_limbs([x * ((1 << fd.R_BITS) % R) % R])  # (22, 1)


@lru_cache(maxsize=8)
def _stage_twiddles(log2_n: int, inverse: bool) -> np.ndarray:
    """Per-stage twiddle tables for the in-chunk DIF NTT of size 2^log2_n.

    DIF stage s (s = 0 .. log2_n-1) operates on blocks of size 2^(log2_n - s);
    butterfly (a_j, b_j) -> (a_j + b_j, (a_j - b_j) * w_s^j) with
    w_s = root of unity of order 2^(log2_n - s), j < 2^(log2_n - s - 1).
    We store each stage's twiddles tiled to length 2^(log2_n - 1) so every
    stage's table has identical shape (22, half).
    """
    n = 1 << log2_n
    half = n // 2
    w = _root_of_unity(log2_n)
    if inverse:
        w = pow(w, R - 2, R)
    stages = []
    for s in range(log2_n):
        block = n >> s
        bh = block // 2
        ws = pow(w, 1 << s, R)
        tw = [1] * half
        cur = 1
        for j in range(bh):
            tw[j] = cur
            cur = cur * ws % R
        # tile across the half-length table
        for j in range(bh, half):
            tw[j] = tw[j % bh]
        mont_vals = [t * ((1 << fd.R_BITS) % R) % R for t in tw]
        stages.append(ints_to_limbs(mont_vals))
    return np.stack(stages, axis=0)  # (log2_n, 22, half)


def _chunk_ntt_kernel(log2_n: int):
    """In-chunk DIF NTT (natural order in, bit-reversed order out)."""
    n = 1 << log2_n
    half = n // 2

    def kern(x, twiddles):
        # x: (22, n); twiddles: (log2_n, 22, half)
        for s in range(log2_n):
            block = n >> s
            bh = block // 2
            nblocks = n // block
            xr = x.reshape(L, nblocks, 2, bh)
            a = xr[:, :, 0, :]
            b = xr[:, :, 1, :]
            s_add = fd.add(a, b, SPEC)
            s_sub = fd.sub(a, b, SPEC)
            tw = twiddles[s].reshape(L, nblocks, bh)
            s_sub = fd.mont_mul(s_sub, tw, SPEC)
            x = jnp.concatenate([s_add[:, :, None, :], s_sub[:, :, None, :]],
                                axis=2).reshape(L, n)
        return x
    return jax.jit(kern)


def _chunk_intt_kernel(log2_n: int):
    """Exact inverse of `_chunk_ntt_kernel` (DIT, bit-reversed in, natural
    out), *without* the 1/n scaling (folded in elsewhere)."""
    n = 1 << log2_n
    half = n // 2

    def kern(x, twiddles_inv):
        # run stages in reverse with inverse twiddles:
        # inverse butterfly: given (u, v) = (a+b, (a-b) w), recover
        # a = (u + v w^{-1})/2 ... we instead use the DIT butterfly with
        # inverse twiddles which inverts DIF up to the global 1/n factor:
        # stage s' = log2_n-1 .. 0:  a' = u + w^{-1} v? -- concretely:
        #   u = a + b, t = (a - b) w  =>  a = (u + t w^{-1}) / 2,
        #   b = (u - t w^{-1}) / 2.
        # We drop the /2 per stage (total factor n) -- the caller scales.
        for s in range(log2_n - 1, -1, -1):
            block = n >> s
            bh = block // 2
            nblocks = n // block
            xr = x.reshape(L, nblocks, 2, bh)
            u = xr[:, :, 0, :]
            t = xr[:, :, 1, :]
            tw = twiddles_inv[s].reshape(L, nblocks, bh)
            tv = fd.mont_mul(t, tw, SPEC)
            a = fd.add(u, tv, SPEC)
            b = fd.sub(u, tv, SPEC)
            x = jnp.concatenate([a[:, :, None, :], b[:, :, None, :]],
                                axis=2).reshape(L, n)
        return x
    return jax.jit(kern)


@lru_cache(maxsize=4)
def _get_chunk_kernels(log2_n: int):
    return _chunk_ntt_kernel(log2_n), _chunk_intt_kernel(log2_n)


@jax.jit
def _k_butterfly_dif(a, b, w_col):
    """Chunk-level DIF butterfly: (a, b) -> (a + b, (a - b) * w)."""
    return fd.add(a, b, SPEC), fd.mont_mul(fd.sub(a, b, SPEC),
                                           jnp.broadcast_to(w_col, a.shape),
                                           SPEC)


@jax.jit
def _k_butterfly_dit_inv(u, t, winv_col):
    """Inverse of the DIF butterfly up to a factor 2 (folded into 1/N)."""
    tv = fd.mont_mul(t, jnp.broadcast_to(winv_col, t.shape), SPEC)
    return fd.add(u, tv, SPEC), fd.sub(u, tv, SPEC)


@jax.jit
def _k_mul(a, b):
    return fd.mont_mul(a, b, SPEC)


@jax.jit
def _k_mul_scalar(a, c):
    return fd.mont_mul(a, jnp.broadcast_to(c, a.shape), SPEC)


def _bitrev(x: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


def _powtable_chunk_fr(x: int) -> jnp.ndarray:
    from ..engine.device import _powtable_chunk

    return _powtable_chunk(x, LOG2_CHUNK)


def _impl8() -> bool:
    import os

    return os.environ.get("QUILL_NTT_IMPL", "8") == "8"


def ntt_chunks(chunks: list, inverse: bool = False,
               consume: bool = False) -> list:
    """Transform a chunked vector (list of (22, CHUNK) Montgomery arrays).
    Forward: col-DIF over chunks -> step-2 twiddles -> in-chunk NTT.
    Inverse: exact reverse with inverse twiddles + 1/N scaling.
    Output (forward) is in a fixed internal permutation; inverse consumes
    that same permutation and returns natural coefficient order.

    consume=True takes ownership of `chunks`: entries are rebound in place
    as stages replace them, so each source chunk's HBM frees as soon as its
    transform lands (the caller must not reuse the list).  At 2^24-product
    scale every retained vector is ~1.5 GB -- the round-3 config-5 campaign
    OOMed precisely on these transients (BASELINE.md item 6).

    In-chunk transform: the MXU matmul kernel (`poly/ntt8.py`, default) or
    the 12-bit VPU stage kernel (QUILL_NTT_IMPL=12).  The two differ in
    internal permutation and in where the 1/N scaling lives (ntt8's inverse
    folds the in-chunk 1/2^16), both exact.
    """
    n1 = len(chunks)
    assert n1 & (n1 - 1) == 0, "chunk count must be a power of two"
    log2_n1 = n1.bit_length() - 1
    log2_n = log2_n1 + LOG2_CHUNK
    w_n = _root_of_unity(log2_n)
    use8 = _impl8()
    if use8:
        from . import ntt8 as n8

        ntt_k = lambda c, _tw: n8.chunk_ntt8(c, inverse=False)  # noqa: E731
        intt_k = lambda c, _tw: n8.chunk_ntt8(c, inverse=True)  # noqa: E731
    else:
        ntt_k, intt_k = _get_chunk_kernels(LOG2_CHUNK)

    if not inverse:
        x = chunks if consume else list(chunks)
        # 1) chunk-level DIF FFT over the chunk index (length n1)
        #    stage s: blocks of size n1 >> s; w = root of order (n1 >> s)
        w1 = _root_of_unity(log2_n1) if log2_n1 > 0 else 1
        for s in range(log2_n1):
            block = n1 >> s
            bh = block // 2
            ws = pow(w1, 1 << s, R)
            for base in range(0, n1, block):
                for j in range(bh):
                    wj = jnp.asarray(_mont(pow(ws, j, R)))
                    a, b = x[base + j], x[base + j + bh]
                    x[base + j], x[base + j + bh] = _k_butterfly_dif(a, b, wj)
        # after DIF, chunk r holds column-DFT index k1 = bitrev(r)
        # 2) step-2 twiddles: chunk r *= w_N^(k1 * j2), geometric in j2
        for r in range(n1):
            k1 = _bitrev(r, log2_n1)
            if k1 == 0:
                continue
            tw_vec = _powtable_chunk_fr(pow(w_n, k1, R))
            x[r] = _k_mul(x[r], tw_vec)
        # 3) in-chunk NTT (in place: each source chunk frees as its
        # transform lands)
        tws = (None if use8
               else jnp.asarray(_stage_twiddles(LOG2_CHUNK, False)))
        for r in range(n1):
            x[r] = ntt_k(x[r], tws)
        return x

    # inverse: undo 3), then 2), then 1); scale by 1/N
    tws_inv = (None if use8
               else jnp.asarray(_stage_twiddles(LOG2_CHUNK, True)))
    x = chunks if consume else list(chunks)
    for r in range(n1):
        x[r] = intt_k(x[r], tws_inv)
    if log2_n1 > 0:
        for r in range(n1):
            k1 = _bitrev(r, log2_n1)
            if k1 == 0:
                continue
            tw_vec = _powtable_chunk_fr(pow(pow(w_n, k1, R), R - 2, R))
            x[r] = _k_mul(x[r], tw_vec)
        w1_inv = pow(_root_of_unity(log2_n1), R - 2, R)
        for s in range(log2_n1 - 1, -1, -1):
            block = n1 >> s
            bh = block // 2
            ws_inv = pow(w1_inv, 1 << s, R)
            for base in range(0, n1, block):
                for j in range(bh):
                    wj = jnp.asarray(_mont(pow(ws_inv, j, R)))
                    u, t = x[base + j], x[base + j + bh]
                    x[base + j], x[base + j + bh] = _k_butterfly_dit_inv(
                        u, t, wj)
    # un-applied scaling: ntt8's inverse folds the in-chunk 1/2^16, so only
    # the chunk-level butterflies' factor 2 per stage remains; the 12-bit
    # kernel leaves the full 1/2^log2_n
    remaining = (1 << log2_n1) if use8 else (1 << log2_n)
    if remaining == 1:
        return x
    n_inv = pow(remaining, R - 2, R)
    c = jnp.asarray(_mont(n_inv))
    return [_k_mul_scalar(ch, c) for ch in x]


def poly_mul_ntt(a_chunks: list, la: int, b_chunks: list, lb: int) -> list:
    """Full product of two chunked coefficient vectors (logical lengths la,
    lb; physical padding must be zero).  Returns chunks of length
    >= la + lb - 1 (padded with exact zeros).

    Peak-HBM discipline (the 2^21-row prove's S-polys OOMed on this): the
    transforms run with consume=True over fresh padded lists, the pointwise
    product rebinds fa in place while popping fb entries, and the inverse
    consumes the product -- at most TWO full-size vectors are ever live
    here (the caller's originals are its own business)."""
    out_len = la + lb - 1
    n = CHUNK
    while n < out_len:
        n *= 2
    nch = n // CHUNK

    def pad_to(chs, n_target):
        z = jnp.zeros((L, CHUNK), dtype=jnp.int32)
        return list(chs) + [z] * (n_target // CHUNK - len(chs))

    fa = ntt_chunks(pad_to(a_chunks, n), consume=True)
    fb = ntt_chunks(pad_to(b_chunks, n), consume=True)
    for j in range(nch):
        fa[j] = _k_mul(fa[j], fb[j])
        fb[j] = None
    del fb
    return ntt_chunks(fa, inverse=True, consume=True)
