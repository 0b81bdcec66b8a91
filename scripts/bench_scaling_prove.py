"""Per-phase scaling table of the FULL sharded HyperPlonk prove vs device
count (round-4 verdict item 7: not just the sumcheck round).

Runs the whole prove (Fibonacci transition circuit) on the virtual CPU mesh
at 1/2/4/8 devices, asserting byte-identical proofs across counts, and
reports the top phase times per count.  Same caveat as bench_scaling.py:
the host has ~2 physical cores, so wall clock saturates immediately -- the
table evidences correct partitioning (per-device shapes shrink 1/ndev, the
bytes stay identical), not hardware speedup; on a real slice the per-round
psum rides ICI.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling_prove.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    import hashlib

    import jax
    import numpy as np

    from quill_tpu.parallel import mesh as mesh_mod
    from quill_tpu.parallel.engine import ShardedEngine
    from quill_tpu.pcs.kzg import KZG, cached_trusted_setup
    from quill_tpu.pcs.mlpcs import MultilinearPCS
    from quill_tpu.proof import hyperplonk
    from quill_tpu.proof.hyperplonk import HyperPlonk
    from quill_tpu.utils import proof_io
    from quill_tpu.utils.profiling import metrics

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import _fibonacci_pair

    log2rows = int(os.environ.get("QUILL_SCALING_ROWS_LOG2", "8"))
    circuits, traces = _fibonacci_pair(log2rows)
    circuits, traces = circuits[:1], traces[:1]
    max_degree = circuits[0].num_cols() * circuits[0].num_rows()

    results, ref_hash = [], None
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        # drop the previous mesh's executables: accumulating them blows
        # LLVM's "Cannot allocate memory" mid-ndev=2 on the 2-core host
        # (same single-process exhaustion as the test_sumcheck8 segfault)
        jax.clear_caches()
        mesh = mesh_mod.make_mesh(ndev)
        eng = ShardedEngine(mesh)
        pcs = MultilinearPCS(cached_trusted_setup(eng, max_degree))
        hp = HyperPlonk.preprocess(circuits, pcs)
        hp.prove(traces)                      # warmup/compiles
        metrics.reset()
        t0 = time.time()
        proof = hp.prove(traces)
        dt = time.time() - t0
        hyperplonk.verify(proof, hp.to_vk(), pcs)
        h = hashlib.sha256(proof_io.serialize_proof(proof)).hexdigest()
        if ref_hash is None:
            ref_hash = h
        assert h == ref_hash, f"proof bytes diverge at ndev={ndev}"
        phases = sorted(((k, v["total_sec"])
                         for k, v in metrics.report().items()),
                        key=lambda kv: -kv[1])[:8]
        results.append({"ndev": ndev, "prove_sec": round(dt, 2),
                        "phases": dict(phases)})
        print(f"ndev={ndev}: prove {dt:.2f}s  bytes sha256={h[:16]}...",
              flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
