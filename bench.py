"""Benchmark driver: headline metrics on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline: MSM throughput at 2^20 BN254 points (the north-star kernel,
BASELINE.json).  `vs_baseline` compares against a documented arkworks-CPU
reference throughput for a single-threaded 2^20 Pippenger MSM (~0.7 M
points/s on a modern server core; the reference repo itself publishes no
numbers -- BASELINE.md).  Extra fields report the sumcheck round time at 2^22
and supporting kernel timings.

Sizes scale down automatically via QUILL_BENCH_LOG2N (default 20) and
QUILL_SUMCHECK_LOG2N (default 22) so the bench also runs on small hosts.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ARKWORKS_CPU_MSM_2E20_POINTS_PER_SEC = 700_000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rand_scalar_limbs(rng, n):
    """(22, n) canonical limb array of uniform-ish scalars < 2^253 < r."""
    import numpy as np

    limbs = rng.integers(0, 4096, size=(22, n), dtype=np.int32)
    limbs[21] &= 1  # keep < 2^253
    return limbs


def bench_msm(log2n: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quill_tpu.ec import msm as msm_mod
    from quill_tpu.ec.fixed_base import device_tau_powers
    from quill_tpu.fields.bn254 import R

    n = 1 << log2n
    rng = np.random.default_rng(0)

    t0 = time.time()
    tau = 123456789123456789 % R
    xs, ys = device_tau_powers(tau, n)
    jax.block_until_ready(xs[-1])
    t_crs = time.time() - t0
    log(f"CRS generation ({n} tau-powers on device): {t_crs:.2f}s")

    inf = [jnp.zeros((msm_mod.CHUNK,), bool) for _ in xs]
    basis = msm_mod.DeviceBasis(affines=None, x_chunks=xs, y_chunks=ys,
                                inf_chunks=inf, length=n)

    sc_chunks = [jnp.asarray(rand_scalar_limbs(rng, msm_mod.CHUNK))
                 for _ in range(n // msm_mod.CHUNK)]

    # warmup (compiles)
    t0 = time.time()
    res = msm_mod.msm_device(basis, sc_chunks, n)
    t_warm = time.time() - t0
    log(f"MSM warmup (incl. compile): {t_warm:.2f}s")

    times = []
    for _ in range(3):
        t0 = time.time()
        res = msm_mod.msm_device(basis, sc_chunks, n)
        times.append(time.time() - t0)
    t_msm = min(times)
    log(f"MSM 2^{log2n}: {t_msm:.3f}s  ({n / t_msm / 1e6:.2f} M points/s)")
    return n / t_msm, t_msm, t_crs, res


def bench_sumcheck_round(log2n: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quill_tpu.engine.device import (CHUNK, DVec, TpuEngine, _k_to_mont)
    from quill_tpu.piops.virtual_poly import Input

    eng = TpuEngine()
    n = 1 << log2n
    rng = np.random.default_rng(1)

    expr = (Input(0) * Input(1) - Input(2)) * Input(3)
    degree = expr.degree()

    tables = []
    for _k in range(4):
        chunks = [_k_to_mont(jnp.asarray(rand_scalar_limbs(rng, CHUNK)))
                  for _ in range(n // CHUNK)]
        tables.append(DVec(chunks=chunks, length=n))
    jax.block_until_ready(tables[-1].chunks[-1])

    # warmup
    t0 = time.time()
    msgs = eng.sumcheck_messages(tables, expr, degree)
    folded = [eng.fold(t, 987654321) for t in tables]
    t_warm = time.time() - t0
    log(f"sumcheck round warmup (incl. compile): {t_warm:.2f}s")

    times = []
    for _ in range(3):
        t0 = time.time()
        msgs = eng.sumcheck_messages(tables, expr, degree)
        folded = [eng.fold(t, 987654321) for t in tables]
        jax.block_until_ready(folded[-1].chunks[-1] if hasattr(
            folded[-1], "chunks") else None)
        times.append(time.time() - t0)
    t_round = min(times)
    log(f"sumcheck round (msgs+fold, 4 tables, deg {degree}) at 2^{log2n}: "
        f"{t_round:.3f}s")
    return t_round


def main():
    os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
    log2n = int(os.environ.get("QUILL_BENCH_LOG2N", "20"))
    sc_log2n = int(os.environ.get("QUILL_SUMCHECK_LOG2N", "22"))

    import jax

    log(f"devices: {jax.devices()}")

    extra = {}
    try:
        t_round = bench_sumcheck_round(sc_log2n)
        extra["sumcheck_round_sec_2^%d" % sc_log2n] = round(t_round, 4)
    except Exception as e:  # keep the headline alive
        log(f"sumcheck bench failed: {e!r}")
        extra["sumcheck_error"] = repr(e)[:200]

    pts_per_sec, t_msm, t_crs, _ = bench_msm(log2n)
    extra["msm_sec_2^%d" % log2n] = round(t_msm, 4)
    extra["crs_gen_sec"] = round(t_crs, 2)

    result = {
        "metric": "msm_points_per_sec_per_chip_2^%d_bn254" % log2n,
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(
            pts_per_sec / ARKWORKS_CPU_MSM_2E20_POINTS_PER_SEC, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
