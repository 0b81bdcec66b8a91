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

    impl = os.environ.get("QUILL_MSM_IMPL", "7")
    if impl == "7":
        from quill_tpu.ec import msm7 as msm_run
    elif impl == "6":
        from quill_tpu.ec import msm6 as msm_run
    elif impl == "5":
        from quill_tpu.ec import msm5 as msm_run
    elif impl == "3":
        from quill_tpu.ec import msm3 as msm_run
    elif impl == "8":
        from quill_tpu.ec import msm8 as msm_run
    else:
        msm_run = msm_mod

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
    basis.tau = tau  # lets msm3 build shifted bases by fixed-base gen

    sc_chunks = [jnp.asarray(rand_scalar_limbs(rng, msm_mod.CHUNK))
                 for _ in range(n // msm_mod.CHUNK)]

    # warmup (compiles + AOT export loads + shifted-basis build)
    t0 = time.time()
    res = msm_run.msm_device(basis, sc_chunks, n)
    t_warmup = time.time() - t0
    log(f"MSM warmup (incl. compile): {t_warmup:.2f}s")

    times = []
    for _ in range(3):
        t0 = time.time()
        res = msm_run.msm_device(basis, sc_chunks, n)
        times.append(time.time() - t0)
    t_msm = min(times)
    log(f"MSM 2^{log2n}: {t_msm:.3f}s  ({n / t_msm / 1e6:.2f} M points/s)")

    # amortized batched-MSM number (the prover issues opens in batches)
    t_batch = None
    if hasattr(msm_run, "msm_device_batch"):
        batch = [sc_chunks] * 4
        msm_run.msm_device_batch(basis, batch)      # warmup
        t0 = time.time()
        msm_run.msm_device_batch(basis, batch)
        t_batch = time.time() - t0
        log(f"MSM batch x4 2^{log2n}: {t_batch:.3f}s "
            f"({4 * n / t_batch / 1e6:.2f} M points/s amortized)")
    return n / t_msm, t_msm, t_crs, t_batch, t_warmup, res


def bench_sumcheck_round(log2n: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quill_tpu.engine.device import (CHUNK, DVec, TpuEngine, _k_to_mont)
    from quill_tpu.piops.virtual_poly import Input

    eng = TpuEngine()
    n = 1 << log2n
    assert n >= CHUNK, "sumcheck bench needs at least one device chunk"
    rng = np.random.default_rng(1)

    expr = (Input(0) * Input(1) - Input(2)) * Input(3)
    degree = expr.degree()

    tables = []
    for _k in range(4):
        chunks = [_k_to_mont(jnp.asarray(rand_scalar_limbs(rng, CHUNK)))
                  for _ in range(n // CHUNK)]
        tables.append(DVec(chunks=chunks, length=n))
    jax.block_until_ready(tables[-1].chunks[-1])

    # warmup + entry conversion (the production path: sumcheck_begin once,
    # then one fused dispatch per round on the stacked 8-bit state)
    t0 = time.time()
    views, msgs = eng.sumcheck_begin(tables, expr, degree)
    t_warm = time.time() - t0
    log(f"sumcheck begin (entry conversion + round-0 msgs, incl. compile): "
        f"{t_warm:.2f}s")

    eng.sumcheck_round_fused(views, expr, degree, 123456789)  # warmup
    times = []
    for _ in range(3):
        t0 = time.time()
        nt, msgs = eng.sumcheck_round_fused(views, expr, degree, 123456789)
        times.append(time.time() - t0)
    log(f"FUSED sumcheck round at 2^{log2n}: {min(times):.3f}s")
    return min(times)


def _cold_warm(extra, key, fn, reps=1):
    """Time fn twice: first run (includes any remaining compiles / cache
    loads at these shapes) as `<key>_cold_sec`, best of `reps` re-runs as
    `<key>_sec` -- the warm number is the machine's real throughput; round-2
    reported only compile-polluted first runs and under-reported the chip."""
    t0 = time.time()
    fn()
    extra[key + "_cold_sec"] = round(time.time() - t0, 3)
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    extra[key + "_sec"] = round(best, 3)
    log(f"{key}: cold {extra[key + '_cold_sec']}s warm {extra[key + '_sec']}s")


def bench_small_configs(extra):
    """BASELINE.json configs 1-3, cold + warm.  Vector math below one chunk
    runs on the exact host engine (hybrid threshold); MSMs route to the
    device with zero-padded scalars."""
    import random

    from quill_tpu.engine.device import TpuEngine
    from quill_tpu.fields.bn254 import R
    from quill_tpu.pcs import ipa
    from quill_tpu.pcs.kzg import KZG
    from quill_tpu.pcs.mlpcs import MultilinearPCS
    from quill_tpu.transcript.transcript import Transcript

    eng = TpuEngine()
    rng = random.Random(0)

    # device-generated CRS (fixed-base tau-power kernel + disk cache):
    # the host trusted setup is minutes of Python EC on a cold cache
    kzg = KZG.device_setup(eng, 1 << 10)
    poly = eng.vec_from_ints([rng.randrange(R) for _ in range(1 << 10)])

    def run_kzg():
        kzg.commit(poly)
        kzg.open(poly, rng.randrange(R))

    _cold_warm(extra, "kzg_commit_open_2^10", run_kzg)

    # 2) IPA over univariate PCS at 2^14 coefficients
    kzg14 = KZG.device_setup(eng, 1 << 14)
    p1 = eng.vec_from_ints([rng.randrange(R) for _ in range(1 << 14)])
    p2 = eng.vec_from_ints([rng.randrange(R) for _ in range(1 << 14)])

    def run_ipa():
        t = Transcript(b"bench_ipa")
        t.append_g1(kzg14.commit(p1))
        t.append_g1(kzg14.commit(p2))
        ipa.prove(eng, p1, p2, kzg14, t)

    _cold_warm(extra, "ipa_prove_2^14", run_ipa)

    # 3) multilinear PCS commit + eval proof, 16-variable hypercube
    pcs = MultilinearPCS(KZG.device_setup(eng, 1 << 16))
    mp = eng.vec_from_ints([rng.randrange(R) for _ in range(1 << 16)])

    def run_mlpcs():
        t = Transcript(b"bench_mlpcs")
        pcs.commit(mp)
        point = [rng.randrange(R) for _ in range(16)]
        pcs.open(mp, point, t)

    _cold_warm(extra, "mlpcs_commit_open_16var", run_mlpcs)


def bench_logup(log2n: int, extra):
    """BASELINE config 4: sumcheck + zero-check + logup multiset-equality at
    2^log2n (the full PIOP combo: the multiset check internally batches the
    denominator zero-checks and the sum check), cold + warm."""
    import random

    from quill_tpu.engine.device import TpuEngine
    from quill_tpu.fields.bn254 import R
    from quill_tpu.pcs.kzg import KZG
    from quill_tpu.pcs.mlpcs import MultilinearPCS
    from quill_tpu.piops import multiset_check
    from quill_tpu.piops.multiset_check import LookupMode
    from quill_tpu.piops.virtual_poly import Store
    from quill_tpu.transcript.transcript import Transcript

    eng = TpuEngine()
    pcs = MultilinearPCS(KZG.device_setup(eng, 1 << log2n))
    rng = random.Random(2)
    n = 1 << log2n
    left = [rng.randrange(R) for _ in range(n)]
    # a rotation is a permutation: multisets match without host shuffling cost
    right = left[1:] + left[:1]

    def run():
        store = Store(eng, log2n)
        l_ref = store.allocate_polynomial(left)
        r_ref = store.allocate_polynomial(right)
        l_virt = store.new_virtual_from_input(l_ref)
        r_virt = store.new_virtual_from_input(r_ref)
        multiset_check.prove(store, l_virt, r_virt,
                             Transcript(b"bench_logup"), pcs,
                             LookupMode.EQUALITY, None)

    _cold_warm(extra, "logup_multiset_prove_2^%d" % log2n, run)


def _fibonacci_pair(log2rows: int):
    """Two DISTINCT transition circuits + traces (the BASELINE config-5
    wording is 'multi-table with copy constraints'): plain Fibonacci and
    the nonlinear f(n) = f(n-1) + f(n-1)*f(n-2) variant with a mul gate,
    both with state-cell continuity through the permutation
    (`test_basic_proof.rs:17-105` workloads at bench scale)."""
    from quill_tpu.fields.bn254 import R
    from quill_tpu.frontend.transition_circuit import TransitionCircuit
    from quill_tpu.piops.virtual_poly import Const
    from quill_tpu.proof.hyperplonk import TraceWitness

    rows = 1 << log2rows
    c1 = TransitionCircuit.new(rows)
    s1 = c1.allocate_state_cell()
    s2 = c1.allocate_state_cell()
    c1.enforce_boundary_constraint(0, s1.current.to_expr())
    c1.enforce_boundary_constraint(0, s2.current.to_expr() - Const(1))
    c1.enforce_constraint(
        s2.next.to_expr() - (s1.current.to_expr() + s2.current.to_expr()))
    c1.enforce_constraint(s1.next.to_expr() - s2.current.to_expr())
    w = [[0] * rows for _ in range(c1.num_cols())]
    a, b = 0, 1
    for row in range(rows):
        w[s1.current.col][row] = a
        w[s2.current.col][row] = b
        w[s1.next.col][row] = b
        w[s2.next.col][row] = (a + b) % R
        a, b = b, (a + b) % R
    t1 = TraceWitness(columns=w)

    c2 = TransitionCircuit.new(rows)
    u1 = c2.allocate_state_cell()
    u2 = c2.allocate_state_cell()
    tmp = c2.allocate_witness_cell()
    c2.enforce_boundary_constraint(0, u1.current.to_expr() - Const(1))
    c2.enforce_boundary_constraint(0, u2.current.to_expr() - Const(1))
    c2.enforce_constraint(
        tmp.to_expr() - u1.current.to_expr() * u2.current.to_expr())
    c2.enforce_constraint(
        u2.next.to_expr() - (u1.current.to_expr() + tmp.to_expr()))
    c2.enforce_constraint(u1.next.to_expr() - u2.current.to_expr())
    w2 = [[0] * rows for _ in range(c2.num_cols())]
    a, b = 1, 1
    for row in range(rows):
        t = a * b % R
        w2[u1.current.col][row] = a
        w2[u2.current.col][row] = b
        w2[tmp.col][row] = t
        w2[u1.next.col][row] = b
        w2[u2.next.col][row] = (a + t) % R
        a, b = b, (a + t) % R
    t2 = TraceWitness(columns=w2)
    return [c1, c2], [t1, t2]


def bench_full_prove(log2rows: int, extra):
    """BASELINE config 5 at bench scale: full HyperPlonk MULTI-TABLE
    prove+verify (two distinct circuits, copy constraints in both), cold +
    warm, with the per-phase wall-clock breakdown in the JSON.  The
    north-star 2^22-row run does not fit the bench window; it runs via
    `scripts/prove_tpu.py` with timings recorded in BASELINE.md."""
    from quill_tpu.engine.device import TpuEngine
    from quill_tpu.pcs.kzg import KZG
    from quill_tpu.pcs.mlpcs import MultilinearPCS
    from quill_tpu.proof import hyperplonk
    from quill_tpu.proof.hyperplonk import HyperPlonk
    from quill_tpu.utils.profiling import metrics

    circuits, traces = _fibonacci_pair(log2rows)
    eng = TpuEngine()
    max_degree = max(c.num_cols() * c.num_rows() for c in circuits)
    pcs = MultilinearPCS(KZG.device_setup(eng, max_degree))
    hp = HyperPlonk.preprocess(circuits, pcs)

    def run():
        proof = hp.prove(traces)
        hyperplonk.verify(proof, hp.to_vk(), pcs, batch_pairings=True)

    key = "hyperplonk_multitable_2^%d_rows" % log2rows
    _cold_warm(extra, key, run)
    # phase attribution of the WARM run (metrics reset between runs)
    metrics.reset()
    run()
    phases = {k: v["total_sec"] for k, v in metrics.report().items()}
    top = dict(sorted(phases.items(), key=lambda kv: -kv[1])[:12])
    extra[key + "_phases"] = top
    log(f"{key} phases: {top}")


_RESULT = {
    "metric": None,  # filled in main() once log2n is known
    "value": 0.0,
    "unit": "points/s",
    "vs_baseline": 0.0,
    "extra": {},
}
_EMITTED = False


def _emit():
    """Print the (possibly partial) result line exactly once.  Registered
    with atexit and the SIGTERM handler so a driver `timeout` still gets
    whatever completed (round-1 lost its scoreboard to exactly this)."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(json.dumps(_RESULT), flush=True)


def main():
    os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
    log2n = int(os.environ.get("QUILL_BENCH_LOG2N", "20"))
    sc_log2n = int(os.environ.get("QUILL_SUMCHECK_LOG2N", "22"))

    _RESULT["metric"] = "msm_points_per_sec_per_chip_2^%d_bn254" % log2n

    import atexit
    import signal

    atexit.register(_emit)

    def _on_term(signum, frame):
        log(f"bench: signal {signum} -- emitting partial result")
        _emit()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    import jax

    log(f"devices: {jax.devices()}")
    extra = _RESULT["extra"]

    # ---- headline FIRST: everything after this is gravy ----
    pts_per_sec, t_msm, t_crs, t_batch, t_warmup, _ = bench_msm(log2n)
    extra["msm_sec_2^%d" % log2n] = round(t_msm, 4)
    extra["crs_gen_sec"] = round(t_crs, 2)
    # cold-cost honesty: was the c=16 shifted basis generated (260-490 s
    # per 2^20 CRS) or served from disk, and what did this process pay in
    # warmup (compiles + AOT loads + basis build) before the warm headline?
    extra["msm_warmup_sec"] = round(t_warmup, 2)
    try:
        from quill_tpu.ec.msm6 import CACHE_STATS

        extra["basis_cache"] = dict(CACHE_STATS)
    except Exception:
        pass
    if t_batch is not None:
        extra["msm_batch4_sec_2^%d" % log2n] = round(t_batch, 4)
        extra["msm_batch4_pts_per_sec"] = round(4 * (1 << log2n) / t_batch, 1)
    _RESULT["value"] = round(pts_per_sec, 1)
    _RESULT["vs_baseline"] = round(
        pts_per_sec / ARKWORKS_CPU_MSM_2E20_POINTS_PER_SEC, 3)

    # measured arkworks-CPU stand-in: our native C single-thread Pippenger
    # at the same size on THIS host (provenance in BASELINE.md).  The ratio
    # keeps the CONSERVATIVE denominator max(measured, 700k documented
    # estimate) so a slow bench host can never inflate vs_baseline.
    if os.environ.get("QUILL_BENCH_CPU_MSM", "1") != "0":
        try:
            from quill_tpu.ec import native_ec

            cpu_pts = native_ec.bench_msm_cpu(log2n)
            if cpu_pts is not None:
                extra["arkworks_cpu_standin_pts_per_sec"] = round(cpu_pts, 1)
                denom = max(cpu_pts, ARKWORKS_CPU_MSM_2E20_POINTS_PER_SEC)
                _RESULT["vs_baseline"] = round(pts_per_sec / denom, 3)
        except Exception as e:
            log(f"cpu msm baseline failed: {e!r}")

    try:
        t_round = bench_sumcheck_round(sc_log2n)
        extra["sumcheck_round_sec_2^%d" % sc_log2n] = round(t_round, 4)
    except Exception as e:  # keep the headline alive
        log(f"sumcheck bench failed: {e!r}")
        extra["sumcheck_error"] = repr(e)[:200]

    if os.environ.get("QUILL_BENCH_SMALL", "1") != "0":
        try:
            bench_small_configs(extra)
        except Exception as e:
            log(f"small-config bench failed: {e!r}")

    if os.environ.get("QUILL_BENCH_PIOP", "1") != "0":
        try:
            bench_logup(int(os.environ.get("QUILL_PIOP_LOG2N", "20")), extra)
        except Exception as e:
            log(f"logup bench failed: {e!r}")

    if os.environ.get("QUILL_BENCH_FULL", "1") != "0":
        try:
            bench_full_prove(
                int(os.environ.get("QUILL_BENCH_ROWS_LOG2", "14")), extra)
        except Exception as e:
            log(f"full-prove bench failed: {e!r}")

    _emit()


if __name__ == "__main__":
    main()
