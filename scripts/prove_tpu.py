"""Full HyperPlonk prove + verify with the TPU engine at device scale.

Runs the Fibonacci transition circuit (the reference's workload,
`/root/reference/hyperplonk/tests/test_basic_proof.rs:17-52`) with
rows = 2^QUILL_PROVE_LOG2_ROWS (default 16), so every table crosses the
device threshold: the zerocheck/sumcheck tables, logup denominators,
eq tables, KZG quotients, S-polynomial NTT products and all MSM commits run
on the TPU; the transcript, tiny tails and the verifier run on the host.

Usage:  PYTHONPATH=.:/root/.axon_site python scripts/prove_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def main():
    log2_rows = int(os.environ.get("QUILL_PROVE_LOG2_ROWS", "16"))
    rows = 1 << log2_rows

    import jax

    log("devices:", jax.devices())

    from quill_tpu.engine.device import TpuEngine
    from quill_tpu.fields.bn254 import R
    from quill_tpu.frontend.transition_circuit import TransitionCircuit
    from quill_tpu.pcs.kzg import KZG
    from quill_tpu.pcs.mlpcs import MultilinearPCS
    from quill_tpu.piops.virtual_poly import Const
    from quill_tpu.proof import hyperplonk
    from quill_tpu.proof.hyperplonk import HyperPlonk, TraceWitness

    engine = TpuEngine()

    # Fibonacci circuit (reference workload)
    circuit = TransitionCircuit.new(rows)
    s1 = circuit.allocate_state_cell()
    s2 = circuit.allocate_state_cell()
    circuit.enforce_boundary_constraint(0, s1.current.to_expr())
    circuit.enforce_boundary_constraint(0, s2.current.to_expr() - Const(1))
    circuit.enforce_constraint(
        s2.next.to_expr() - (s1.current.to_expr() + s2.current.to_expr()))
    circuit.enforce_constraint(s1.next.to_expr() - s2.current.to_expr())

    t0 = time.time()
    witness = [[0] * rows for _ in range(circuit.num_cols())]
    a, b = 0, 1
    for row in range(rows):
        witness[s1.current.col][row] = a
        witness[s2.current.col][row] = b
        witness[s1.next.col][row] = b
        witness[s2.next.col][row] = (a + b) % R
        a, b = b, (a + b) % R
    log(f"witness built ({rows} rows): {time.time()-t0:.1f}s")

    max_degree = circuit.num_cols() * rows
    if os.environ.get("QUILL_PROVE_MULTITRACE"):
        max_degree = 8 * rows  # nonlinear variant pads to 8 columns
    t0 = time.time()
    kzg = KZG.device_setup(engine, max_degree)
    pcs = MultilinearPCS(kzg)
    log(f"CRS (device tau-powers, degree {max_degree}): {time.time()-t0:.1f}s")

    circuits = [circuit]
    traces = [TraceWitness(columns=witness)]
    if os.environ.get("QUILL_PROVE_MULTITRACE"):
        # second trace: the reference's nonlinear Fibonacci variant
        # (`test_basic_proof.rs:54-105`) at the same size
        c2 = TransitionCircuit.new(rows)
        a1 = c2.allocate_state_cell()
        a2 = c2.allocate_state_cell()
        tmp = c2.allocate_witness_cell()
        c2.enforce_boundary_constraint(0, a1.current.to_expr() - Const(1))
        c2.enforce_boundary_constraint(0, a2.current.to_expr() - Const(1))
        c2.enforce_constraint(
            tmp.to_expr() - a1.current.to_expr() * a2.current.to_expr())
        c2.enforce_constraint(
            a2.next.to_expr() - (a1.current.to_expr() + tmp.to_expr()))
        c2.enforce_constraint(a1.next.to_expr() - a2.current.to_expr())
        w2 = [[0] * rows for _ in range(c2.num_cols())]
        x, y = 1, 1
        for row in range(rows):
            w2[a1.current.col][row] = x
            w2[a2.current.col][row] = y
            w2[a1.next.col][row] = y
            w2[tmp.col][row] = x * y % R
            w2[a2.next.col][row] = (x + x * y) % R
            x, y = y, (x + x * y) % R
        circuits.append(c2)
        traces.append(TraceWitness(columns=w2))
        log("multitrace mode: 2 traces")

    t0 = time.time()
    hp = HyperPlonk.preprocess(circuits, pcs)
    log(f"preprocess: {time.time()-t0:.1f}s")

    t0 = time.time()
    proof = hp.prove(traces)
    t_prove = time.time() - t0
    log(f"PROVE: {t_prove:.1f}s")

    from quill_tpu.utils.proof_io import serialize_proof

    data = serialize_proof(proof)
    out_path = os.environ.get("QUILL_PROOF_OUT", "/tmp/quill_proof.bin")
    with open(out_path, "wb") as f:
        f.write(data)
    log(f"proof serialized: {len(data)} bytes -> {out_path}")

    t0 = time.time()
    hyperplonk.verify(proof, hp.to_vk(), pcs, batch_pairings=True)
    log(f"VERIFY: {time.time()-t0:.1f}s")
    from quill_tpu.utils.profiling import metrics

    log("phase breakdown:", metrics.report())
    log("OK: full HyperPlonk proof at 2^%d rows proved on TPU and verified"
        % log2_rows)


if __name__ == "__main__":
    main()
