"""Proof wire-format roundtrip: serialize -> deserialize -> verify."""

from quill_tpu.engine.host import HostEngine
from quill_tpu.pcs.kzg import cached_trusted_setup
from quill_tpu.pcs.mlpcs import MultilinearPCS
from quill_tpu.proof import hyperplonk
from quill_tpu.proof.hyperplonk import HyperPlonk
from quill_tpu.utils.proof_io import deserialize_proof, serialize_proof

from .test_hyperplonk import get_fibonacci_circuit_and_trace

ENGINE = HostEngine()


def test_proof_roundtrip_and_verify():
    circuit, trace = get_fibonacci_circuit_and_trace()
    pcs = MultilinearPCS(cached_trusted_setup(
        ENGINE, circuit.num_cols() * circuit.num_rows()))
    hp = HyperPlonk.preprocess([circuit], pcs)
    proof = hp.prove([trace])

    data = serialize_proof(proof)
    assert isinstance(data, bytes) and len(data) > 0
    restored = deserialize_proof(data)
    # deterministic re-serialization
    assert serialize_proof(restored) == data
    # the restored proof verifies
    hyperplonk.verify(restored, hp.to_vk(), pcs)


def test_corrupted_bytes_rejected():
    import pytest

    circuit, trace = get_fibonacci_circuit_and_trace()
    pcs = MultilinearPCS(cached_trusted_setup(
        ENGINE, circuit.num_cols() * circuit.num_rows()))
    hp = HyperPlonk.preprocess([circuit], pcs)
    proof = hp.prove([trace])
    data = bytearray(serialize_proof(proof))
    # flip a byte in the middle (lands in some field element / point)
    data[len(data) // 2] ^= 1
    with pytest.raises((ValueError, AssertionError)):
        restored = deserialize_proof(bytes(data))
        hyperplonk.verify(restored, hp.to_vk(), pcs)
