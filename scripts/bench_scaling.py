"""Scaling-efficiency table: sharded sumcheck round time vs device count.

North-star reporting (BASELINE.json: "scaling efficiency at 1 chip / 1 host /
N hosts").  Only one real TPU chip exists in this environment, so the mesh
axis is exercised on the virtual CPU device mesh
(`xla_force_host_platform_device_count`) -- the same GSPMD programs that
would partition over ICI on a real slice.  NOTE the host has very few
physical cores, so wall-clock speedup saturates at the core count; the table
is evidence that the sharded program *partitions* (per-device array shapes
shrink by 1/ndev and the round stays exact), not a hardware throughput claim.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    import random

    import jax

    from quill_tpu.fields.bn254 import R
    from quill_tpu.parallel import mesh as mesh_mod
    from quill_tpu.parallel.engine import ShardedEngine
    from quill_tpu.piops.virtual_poly import Input

    log2n = int(os.environ.get("QUILL_SCALING_LOG2N", "18"))
    n = 1 << log2n
    rng = random.Random(0)
    tables_ints = [[rng.randrange(R) for _ in range(n)] for _ in range(4)]
    expr = (Input(0) * Input(1) - Input(2)) * Input(3)
    degree = expr.degree()

    ndev_all = len(jax.devices())
    results = []
    expected = None
    for ndev in (1, 2, 4, 8):
        if ndev > ndev_all:
            break
        mesh = mesh_mod.make_mesh(ndev)
        eng = ShardedEngine(mesh)
        tabs = [eng.vec_from_ints(t) for t in tables_ints]
        # warmup (compile) + one timed fused round (fold at r + messages)
        eng.sumcheck_round_fused(tabs, expr, degree, 12345)
        times = []
        for _ in range(3):
            t0 = time.time()
            _, msgs = eng.sumcheck_round_fused(tabs, expr, degree, 12345)
            times.append(time.time() - t0)
        t = min(times)
        if expected is None:
            expected = msgs
        else:
            assert msgs == expected, f"ndev={ndev} messages diverge"
        results.append({"ndev": ndev, "round_sec": round(t, 4)})
        print(f"ndev={ndev}: fused round at 2^{log2n}: {t:.4f}s",
              file=sys.stderr, flush=True)

    base = results[0]["round_sec"]
    for r in results:
        r["speedup"] = round(base / r["round_sec"], 2)
        r["efficiency"] = round(base / r["round_sec"] / r["ndev"], 2)
    print(json.dumps({"log2n": log2n, "host_cores": os.cpu_count(),
                      "rounds": results}))


if __name__ == "__main__":
    main()
