"""Golden proof-byte tests: any transcript-visible drift fails here.

The serialized proof bytes for the 8-row Fibonacci workloads are pinned by
sha256.  Every transcript event (append order, challenge draw order,
trailing-zero stripping, G1 flag bits, the 6-opening IPA layout) feeds these
bytes, so a hash change means a Fiat-Shamir-visible regression -- the same
role BASELINE.md's cross-round 2^16 hash (`d596d8df...`) plays for the TPU
prove, but cheap enough for every CI run.

These hashes have been byte-stable across the host engine, the 12-bit and
8-bit device engines, and the sharded engine since round 1 (proof bytes are
engine-independent by construction); regenerate ONLY for a deliberate,
documented wire-format change.
"""

import hashlib

from quill_tpu.proof import hyperplonk
from quill_tpu.utils import proof_io

from tests.test_hyperplonk import (
    get_fibonacci_circuit_and_trace,
    get_modified_fibonacci_circuit_and_trace,
    make_pcs,
)
from quill_tpu.proof.hyperplonk import HyperPlonk

GOLDEN = {
    "fib": ("4559f7026c1b53bd6bac0762010b7ee926a27c94a43b7f91cc2e3e34f3be4d22",
            9824),
    "fib2": ("f643db6e970c4eadd0ad4c153a6912227a3735efc1185ed34bebcbac3583b0e6",
             13480),
}


def _prove_bytes(getter):
    circuit, trace = getter()
    pcs = make_pcs([circuit])
    hp = HyperPlonk.preprocess([circuit], pcs)
    proof = hp.prove([trace])
    hyperplonk.verify(proof, hp.to_vk(), pcs)
    return proof_io.serialize_proof(proof)


def test_fibonacci_proof_bytes_golden():
    data = _prove_bytes(get_fibonacci_circuit_and_trace)
    want_hash, want_len = GOLDEN["fib"]
    assert len(data) == want_len
    assert hashlib.sha256(data).hexdigest() == want_hash


def test_modified_fibonacci_proof_bytes_golden():
    data = _prove_bytes(get_modified_fibonacci_circuit_and_trace)
    want_hash, want_len = GOLDEN["fib2"]
    assert len(data) == want_len
    assert hashlib.sha256(data).hexdigest() == want_hash


def test_open_group_size_invisible(monkeypatch):
    """The fused-opening group size (`proof/hyperplonk._open_grouped`) is a
    pure memory knob: proof bytes must be identical at every batch size."""
    monkeypatch.setenv("QUILL_OPEN_BATCH", "1")
    one = hashlib.sha256(
        _prove_bytes(get_fibonacci_circuit_and_trace)).hexdigest()
    monkeypatch.setenv("QUILL_OPEN_BATCH", "3")
    three = hashlib.sha256(
        _prove_bytes(get_fibonacci_circuit_and_trace)).hexdigest()
    assert one == GOLDEN["fib"][0]
    assert three == GOLDEN["fib"][0]


def test_proof_bytes_roundtrip_reverify():
    data = _prove_bytes(get_fibonacci_circuit_and_trace)
    proof = proof_io.deserialize_proof(data)
    circuit, _ = get_fibonacci_circuit_and_trace()
    pcs = make_pcs([circuit])
    hp = HyperPlonk.preprocess([circuit], pcs)
    hyperplonk.verify(proof, hp.to_vk(), pcs)
