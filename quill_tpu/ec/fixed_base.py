"""Device fixed-base scalar multiplication: tau-power CRS generation.

The reference generates its CRS with a sequential host loop of scalar
multiplications (`/root/reference/pcs/src/kzg.rs:44-47`); at 2^22 points that
is hours of host EC.  TPU-native approach: the base G is fixed, so the host
precomputes a tiny windowed table T[w][d] = d * 2^(4w) * G (64 windows x 16
digits = 1024 points, ~0.1 s of host EC), and the device computes every
tau^i * G as a 64-step table-gather + complete-addition accumulation, one
fixed-shape kernel per 2^16-element chunk.  Points are then normalized to
affine with one batched field inversion (prefix/suffix product scans + a
single host inverse).
"""

from __future__ import annotations

import numpy as np

from ..fields.bn254 import P, R
from ..utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..fields import device as fd  # noqa: E402
from ..fields.limbs import ints_to_limbs  # noqa: E402
from . import curve  # noqa: E402
from . import device as ed  # noqa: E402

L = fd.L
B = fd.B
LOG2_CHUNK = 16
CHUNK = 1 << LOG2_CHUNK

FB_WINDOW = 4
FB_DIGITS = 1 << FB_WINDOW
FB_WINDOWS = (254 + FB_WINDOW - 1) // FB_WINDOW  # 64


def _build_table(base: curve.Jacobian) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host windowed table: T[w][d] = d * 2^(4w) * base, as Montgomery limb
    arrays of shape (22, FB_WINDOWS, FB_DIGITS) for X, Y, Z (projective;
    d = 0 entries are the identity (0,1,0))."""
    r_mont = (1 << fd.R_BITS) % P

    xs = np.zeros((L, FB_WINDOWS, FB_DIGITS), dtype=np.int32)
    ys = np.zeros((L, FB_WINDOWS, FB_DIGITS), dtype=np.int32)
    zs = np.zeros((L, FB_WINDOWS, FB_DIGITS), dtype=np.int32)

    bw = base
    for w in range(FB_WINDOWS):
        multiples = [None] * FB_DIGITS
        acc = curve.Jacobian.identity(curve.Fq(1))
        for d in range(FB_DIGITS):
            multiples[d] = acc
            acc = acc.add(bw)
        affs = curve.batch_to_affine(multiples)
        col_x, col_y, col_z = [], [], []
        for d in range(FB_DIGITS):
            if d == 0:
                col_x.append(0)
                col_y.append(r_mont)  # mont(1)
                col_z.append(0)
            else:
                col_x.append(affs[d].x.v * r_mont % P)
                col_y.append(affs[d].y.v * r_mont % P)
                col_z.append(r_mont)
        xs[:, w, :] = ints_to_limbs(col_x)
        ys[:, w, :] = ints_to_limbs(col_y)
        zs[:, w, :] = ints_to_limbs(col_z)
        for _ in range(FB_WINDOW):
            bw = bw.double()
    return xs, ys, zs


def _extract_digits_4(scalars):
    """(22, N) canonical limbs -> (FB_WINDOWS, N) 4-bit digits.  4 divides
    12, so every digit lives inside one limb."""
    outs = []
    for w in range(FB_WINDOWS):
        lo_bit = w * FB_WINDOW
        limb = lo_bit // B
        sh = lo_bit % B
        outs.append((scalars[limb] >> sh) & (FB_DIGITS - 1))
    return jnp.stack(outs, axis=0)


@jax.jit
def _k_fixed_base_chunk(scalars, tx, ty, tz):
    digits = _extract_digits_4(scalars)          # (64, N)

    def body(w, acc):
        d = digits[w]                            # (N,)
        ex = jax.lax.dynamic_index_in_dim(tx, w, axis=1, keepdims=False)[:, d]
        ey = jax.lax.dynamic_index_in_dim(ty, w, axis=1, keepdims=False)[:, d]
        ez = jax.lax.dynamic_index_in_dim(tz, w, axis=1, keepdims=False)[:, d]
        return ed.pt_add(acc, (ex, ey, ez))

    n = scalars.shape[1]
    acc = ed.pt_identity((n,))
    return jax.lax.fori_loop(0, FB_WINDOWS, body, acc)


def _two_level_scan_fq(x, reverse=False):
    """Inclusive prefix (or suffix) Montgomery-product scan over (22, C)."""
    one = jnp.asarray(fd.FQ.one_mont, jnp.int32)[:, None]
    if reverse:
        x = x[:, ::-1]
    C = x.shape[1]
    bs = 256
    nb = C // bs
    blocks = x.reshape(L, nb, bs)
    xs = jnp.moveaxis(blocks, 2, 0)

    def body(carry, t):
        cur = fd.mont_mul(carry, t, fd.FQ)
        return cur, cur

    init = jnp.broadcast_to(one, (L, nb)).astype(jnp.int32)
    last, ys = jax.lax.scan(body, init, xs)
    within = jnp.moveaxis(ys, 0, 2)

    def body2(carry, t):
        return fd.mont_mul(carry, t, fd.FQ), carry

    init2 = jnp.broadcast_to(one, (L, 1)).astype(jnp.int32)
    _, offs = jax.lax.scan(body2, init2,
                           jnp.moveaxis(last[:, :, None], 1, 0))
    offs = jnp.moveaxis(offs, 0, 1)
    out = fd.mont_mul(within, jnp.broadcast_to(offs, within.shape),
                      fd.FQ).reshape(L, C)
    if reverse:
        out = out[:, ::-1]
    return out


_k_prefix_fq = jax.jit(lambda x: _two_level_scan_fq(x))
_k_suffix_fq = jax.jit(lambda x: _two_level_scan_fq(x, reverse=True))


@jax.jit
def _k_binv_combine_fq(p_incl, s_incl, chunk_scalar):
    one = jnp.asarray(fd.FQ.one_mont, jnp.int32)[:, None]
    pe = jnp.concatenate([jnp.broadcast_to(one, (L, 1)), p_incl[:, :-1]],
                         axis=1)
    se = jnp.concatenate([s_incl[:, 1:], jnp.broadcast_to(one, (L, 1))],
                         axis=1)
    return fd.mont_mul(fd.mont_mul(pe, se, fd.FQ),
                       jnp.broadcast_to(chunk_scalar, pe.shape), fd.FQ)


@jax.jit
def _k_affine_from_zinv(X, Y, zinv):
    return fd.mont_mul(X, zinv, fd.FQ), fd.mont_mul(Y, zinv, fd.FQ)


def _batch_normalize(points_per_chunk: list):
    """Projective chunk points -> Montgomery affine (x, y) chunk arrays,
    with one host field inversion total."""
    from ..fields.scalar import inv as sinv

    p_scans = [_k_prefix_fq(p[2]) for p in points_per_chunk]
    s_scans = [_k_suffix_fq(p[2]) for p in points_per_chunk]
    totals = [fd.host_col_to_int(np.asarray(ps[:, -1:]), P)
              for ps in p_scans]
    total_all = 1
    for t in totals:
        assert t != 0, "unexpected identity point in CRS"
        total_all = total_all * t % P
    inv_all = sinv(total_all, P)
    nch = len(points_per_chunk)
    before = [1] * nch
    for j in range(1, nch):
        before[j] = before[j - 1] * totals[j - 1] % P
    after = [1] * nch
    for j in range(nch - 2, -1, -1):
        after[j] = after[j + 1] * totals[j + 1] % P
    out = []
    r_mont = (1 << fd.R_BITS) % P
    for j, p in enumerate(points_per_chunk):
        scalar = before[j] * after[j] % P * inv_all % P
        cc = jnp.asarray(ints_to_limbs([scalar * r_mont % P]))
        zinv = _k_binv_combine_fq(p_scans[j], s_scans[j], cc)
        out.append(_k_affine_from_zinv(p[0], p[1], zinv))
    return out


def device_tau_powers(tau: int, count: int):
    """Compute [G, tau G, tau^2 G, ..., tau^(count-1) G] on device.
    Returns (x_chunks, y_chunks) Montgomery affine limb chunk lists covering
    ceil(count / CHUNK) chunks (padding scalars are tau^i beyond count --
    harmless extra points, sliced away by the basis length)."""
    n = count
    padded = ((n + CHUNK - 1) // CHUNK) * CHUNK
    powers = [1] * padded
    for i in range(1, padded):
        powers[i] = powers[i - 1] * tau % R
    tx, ty, tz = _build_table(curve.g1_generator())
    jtx, jty, jtz = jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tz)
    chunks = []
    for j in range(padded // CHUNK):
        sc = jnp.asarray(ints_to_limbs(powers[j * CHUNK:(j + 1) * CHUNK]))
        chunks.append(_k_fixed_base_chunk(sc, jtx, jty, jtz))
    norm = _batch_normalize(chunks)
    return [a for a, _ in norm], [b for _, b in norm]
