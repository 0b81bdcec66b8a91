"""End-to-end HyperPlonk tests: Fibonacci transition circuits, single- and
multi-trace, plus proof-mutation and witness-corruption negatives.

Mirrors `/root/reference/hyperplonk/tests/test_basic_proof.rs`.
"""

import pytest

from quill_tpu.engine.host import HostEngine
from quill_tpu.fields.bn254 import R
from quill_tpu.frontend.transition_circuit import TransitionCircuit
from quill_tpu.pcs.kzg import cached_trusted_setup
from quill_tpu.pcs.mlpcs import MultilinearPCS
from quill_tpu.piops.virtual_poly import Const
from quill_tpu.proof import hyperplonk
from quill_tpu.proof.hyperplonk import HyperPlonk, TraceWitness

ENGINE = HostEngine()


def get_fibonacci_circuit_and_trace():
    """`test_basic_proof.rs:17-52`."""
    circuit = TransitionCircuit.new(8)
    s1 = circuit.allocate_state_cell()
    s2 = circuit.allocate_state_cell()
    circuit.enforce_boundary_constraint(0, s1.current.to_expr())
    circuit.enforce_boundary_constraint(0, s2.current.to_expr() - Const(1))
    circuit.enforce_constraint(
        s2.next.to_expr() - (s1.current.to_expr() + s2.current.to_expr()))
    circuit.enforce_constraint(s1.next.to_expr() - s2.current.to_expr())

    witness = [[0] * circuit.num_rows() for _ in range(circuit.num_cols())]
    for row in range(circuit.num_rows()):
        if row == 0:
            witness[s1.current.col][row] = 0
            witness[s2.current.col][row] = 1
            witness[s1.next.col][row] = 1
            witness[s2.next.col][row] = 1
        else:
            witness[s1.current.col][row] = witness[s1.next.col][row - 1]
            witness[s2.current.col][row] = witness[s2.next.col][row - 1]
            witness[s1.next.col][row] = witness[s2.current.col][row]
            witness[s2.next.col][row] = (witness[s2.current.col][row]
                                         + witness[s1.current.col][row]) % R
    return circuit, TraceWitness(columns=witness)


def get_modified_fibonacci_circuit_and_trace():
    """`test_basic_proof.rs:54-105`: f(n) = f(n-1) + f(n-1)*f(n-2) with a mul
    gate through a tmp column."""
    circuit = TransitionCircuit.new(8)
    s1 = circuit.allocate_state_cell()
    s2 = circuit.allocate_state_cell()
    tmp = circuit.allocate_witness_cell()
    circuit.enforce_boundary_constraint(0, s1.current.to_expr() - Const(1))
    circuit.enforce_boundary_constraint(0, s2.current.to_expr() - Const(1))
    circuit.enforce_constraint(
        tmp.to_expr() - s1.current.to_expr() * s2.current.to_expr())
    circuit.enforce_constraint(
        s2.next.to_expr() - (s1.current.to_expr() + tmp.to_expr()))
    circuit.enforce_constraint(s1.next.to_expr() - s2.current.to_expr())

    witness = [[0] * circuit.num_rows() for _ in range(circuit.num_cols())]
    for row in range(circuit.num_rows()):
        if row == 0:
            witness[s1.current.col][row] = 1
            witness[s2.current.col][row] = 1
        else:
            witness[s1.current.col][row] = witness[s1.next.col][row - 1]
            witness[s2.current.col][row] = witness[s2.next.col][row - 1]
        witness[s1.next.col][row] = witness[s2.current.col][row]
        witness[tmp.col][row] = (witness[s1.current.col][row]
                                 * witness[s2.current.col][row]) % R
        witness[s2.next.col][row] = (witness[s1.current.col][row]
                                     + witness[tmp.col][row]) % R
    return circuit, TraceWitness(columns=witness)


def make_pcs(circuits):
    max_degree = max(c.num_cols() * c.num_rows() for c in circuits)
    return MultilinearPCS(cached_trusted_setup(ENGINE, max_degree))


class TestHyperPlonk:
    def test_single_trace(self):
        """`test_basic_proof.rs:137-163`."""
        circuit, trace = get_fibonacci_circuit_and_trace()
        pcs = make_pcs([circuit])
        hp = HyperPlonk.preprocess([circuit], pcs)
        proof = hp.prove([trace])
        hyperplonk.verify(proof, hp.to_vk(), pcs)

    def test_single_trace_strict_verify(self):
        """QUILL_STRICT_VERIFY as a first-class flag: honest proofs verify
        with circuit-derived sumcheck degree bounds enforced."""
        circuit, trace = get_fibonacci_circuit_and_trace()
        pcs = make_pcs([circuit])
        hp = HyperPlonk.preprocess([circuit], pcs)
        proof = hp.prove([trace])
        hyperplonk.verify(proof, hp.to_vk(), pcs, strict=True)

    def test_multitrace(self):
        """`test_basic_proof.rs:165-196`."""
        c1, t1 = get_fibonacci_circuit_and_trace()
        c2, t2 = get_modified_fibonacci_circuit_and_trace()
        pcs = make_pcs([c1, c2])
        hp = HyperPlonk.preprocess([c1, c2], pcs)
        proof = hp.prove([t1, t2])
        hyperplonk.verify(proof, hp.to_vk(), pcs)

    def test_invalid_witness_rejected_by_prover(self):
        circuit, trace = get_fibonacci_circuit_and_trace()
        trace.columns[0][3] = (trace.columns[0][3] + 1) % R
        pcs = make_pcs([circuit])
        hp = HyperPlonk.preprocess([circuit], pcs)
        with pytest.raises(ValueError):
            hp.prove([trace])

    def test_broken_state_continuity_rejected(self, monkeypatch):
        """A witness that satisfies every in-row constraint but breaks the
        state continuity next[4] = current[5] must be rejected by the
        PERMUTATION argument alone (mirrors the witness-corruption posture
        of `permutation_check.rs:253` at the e2e level).

        check_constraints would catch it host-side, so it is patched out --
        the prover then produces an HONEST proof of the bad witness and the
        verifier must reject it."""
        circuit, trace = get_fibonacci_circuit_and_trace()
        s1_cur, s1_next, s2_cur, s2_next = 0, 1, 2, 3
        cols = trace.columns
        # break the 4->5 seam of s1, then recompute rows 5..7 so all
        # recurring constraints (and rows>=5 continuity) hold again
        cols[s1_cur][5] = (cols[s1_next][4] + 1) % R
        for row in range(5, 8):
            if row > 5:
                cols[s1_cur][row] = cols[s1_next][row - 1]
                cols[s2_cur][row] = cols[s2_next][row - 1]
            cols[s1_next][row] = cols[s2_cur][row]
            cols[s2_next][row] = (cols[s1_cur][row] + cols[s2_cur][row]) % R
        # in-row constraints all hold; only continuity is broken
        with pytest.raises(ValueError, match="Permutation constraint"):
            circuit.check_constraints(cols)
        monkeypatch.setattr(TransitionCircuit, "check_constraints",
                            lambda self, w: None)
        circuit.check_constraints(cols)      # patched out

        pcs = make_pcs([circuit])
        hp = HyperPlonk.preprocess([circuit], pcs)
        proof = hp.prove([trace])
        with pytest.raises(ValueError):
            hyperplonk.verify(proof, hp.to_vk(), pcs)

    def test_wrong_commitment_rejected(self):
        circuit, trace = get_fibonacci_circuit_and_trace()
        pcs = make_pcs([circuit])
        hp = HyperPlonk.preprocess([circuit], pcs)
        proof = hp.prove([trace])
        # swap the witness commitment for a different point: transcript
        # diverges and the proof must fail
        from quill_tpu.ec.curve import g1_generator
        proof.witness_commitment[0] = g1_generator().scalar_mul(7)
        with pytest.raises(ValueError):
            hyperplonk.verify(proof, hp.to_vk(), pcs)


def get_square_table_pair(bad_row: int | None = None):
    """Source trace (a, a^2) rows looked up in a destination table trace
    (v, v^2).  With `bad_row`, the source uses a consistent (a, a^2) pair
    that is NOT in the table (check_constraints passes; only the lookup
    argument can catch it)."""
    table = TransitionCircuit.new(8)
    tv = table.allocate_witness_cell()
    tv2 = table.allocate_witness_cell()
    table.enforce_constraint(tv2.to_expr() - tv.to_expr() * tv.to_expr())
    tw = [[0] * 8 for _ in range(table.num_cols())]
    for row in range(8):
        tw[tv.col][row] = row
        tw[tv2.col][row] = row * row % R

    src = TransitionCircuit.new(8)
    sa = src.allocate_witness_cell()
    sb = src.allocate_witness_cell()
    src.enforce_constraint(sb.to_expr() - sa.to_expr() * sa.to_expr())
    sw = [[0] * 8 for _ in range(src.num_cols())]
    vals = [3, 1, 4, 1, 5, 2, 6, 5]
    for row in range(8):
        v = vals[row]
        sw[sa.col][row] = v
        sw[sb.col][row] = v * v % R
    if bad_row is not None:
        sw[sa.col][bad_row] = 9          # 9 not in the 0..7 table
        sw[sb.col][bad_row] = 81
    lk = hyperplonk.CrossTableLookup(
        src_trace=0, src_cols=[sa.col, sb.col],
        dst_trace=1, dst_cols=[tv.col, tv2.col])
    return ([src, table],
            [TraceWitness(columns=sw), TraceWitness(columns=tw)], lk)


class TestCrossTableLookup:
    """Cross-table lookups wired into HyperPlonk (growth beyond the
    reference: `lookup.rs` exists but is never reached from `proof.rs`;
    "cross-table lookups" unchecked in `/root/reference/README.md:21`)."""

    def test_lookup_accepts_valid(self):
        circuits, traces, lk = get_square_table_pair()
        pcs = make_pcs(circuits)
        hp = HyperPlonk.preprocess(circuits, pcs, lookups=[lk])
        proof = hp.prove(traces)
        assert len(proof.lookup_proofs) == 1
        hyperplonk.verify(proof, hp.to_vk(), pcs)

    def test_lookup_batched_pairings(self):
        circuits, traces, lk = get_square_table_pair()
        pcs = make_pcs(circuits)
        hp = HyperPlonk.preprocess(circuits, pcs, lookups=[lk])
        proof = hp.prove(traces)
        hyperplonk.verify(proof, hp.to_vk(), pcs, batch_pairings=True)

    def test_lookup_missing_tuple_rejected(self):
        # (9, 81) satisfies the square constraint but is not in the table:
        # the prover runs honestly, the verifier must reject
        circuits, traces, lk = get_square_table_pair(bad_row=4)
        pcs = make_pcs(circuits)
        hp = HyperPlonk.preprocess(circuits, pcs, lookups=[lk])
        proof = hp.prove(traces)
        with pytest.raises(ValueError):
            hyperplonk.verify(proof, hp.to_vk(), pcs)

    def test_lookup_mutated_multiplicities_rejected(self):
        circuits, traces, lk = get_square_table_pair()
        pcs = make_pcs(circuits)
        hp = HyperPlonk.preprocess(circuits, pcs, lookups=[lk])
        proof = hp.prove(traces)
        op = proof.lookup_proofs[0].multiplicities_opening
        op.evaluation = (op.evaluation + 1) % R
        with pytest.raises(ValueError):
            hyperplonk.verify(proof, hp.to_vk(), pcs)

    def test_lookup_proof_roundtrip(self):
        from quill_tpu.utils.proof_io import (deserialize_proof,
                                              serialize_proof)

        circuits, traces, lk = get_square_table_pair()
        pcs = make_pcs(circuits)
        hp = HyperPlonk.preprocess(circuits, pcs, lookups=[lk])
        proof = hp.prove(traces)
        data = serialize_proof(proof)
        back = deserialize_proof(data)
        assert serialize_proof(back) == data
        hyperplonk.verify(back, hp.to_vk(), pcs)


class TestBatchedPairingVerify:
    def test_batched_verify_accepts_valid(self):
        circuit, trace = get_fibonacci_circuit_and_trace()
        pcs = make_pcs([circuit])
        hp = HyperPlonk.preprocess([circuit], pcs)
        proof = hp.prove([trace])
        hyperplonk.verify(proof, hp.to_vk(), pcs, batch_pairings=True)

    def test_batched_verify_rejects_corrupt(self):
        circuit, trace = get_fibonacci_circuit_and_trace()
        pcs = make_pcs([circuit])
        hp = HyperPlonk.preprocess([circuit], pcs)
        proof = hp.prove([trace])
        # corrupt a quotient commitment: only the (deferred) pairing check
        # can catch this
        op = proof.trace_proofs[0].openings_zero_check[0]
        from quill_tpu.ec.curve import g1_generator
        op.poly_opening.proof = g1_generator().scalar_mul(12345)
        with pytest.raises(ValueError):
            hyperplonk.verify(proof, hp.to_vk(), pcs, batch_pairings=True)
