"""Byte-exactness fixtures vs arkworks 0.5 (activated when
tests/fixtures/ark_vectors.json exists -- generate it with
`cargo run --release` in tools/gen_ark_fixtures on any machine with Rust;
no cargo exists in this environment, SURVEY §2.3)."""

import json
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "ark_vectors.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURES),
    reason="ark_vectors.json not generated (needs a machine with cargo)")


@pytest.fixture(scope="module")
def vectors():
    with open(FIXTURES) as f:
        return json.load(f)


def test_scalar_encodings(vectors):
    from quill_tpu.fields.bn254 import R
    from quill_tpu.transcript import serialize as ser

    assert ser.ser_usize(3).hex() == vectors["usize_3"]
    assert ser.ser_field(0).hex() == vectors["fr_0"]
    assert ser.ser_field(1).hex() == vectors["fr_1"]
    assert ser.ser_field(R - 1).hex() == vectors["fr_minus_1"]
    big = int.from_bytes(bytes([0xAB] * 48), "little") % R
    assert ser.ser_field(big).hex() == vectors["fr_big"]
    assert ser.ser_field_vec([1, 2]).hex() == vectors["fr_vec"]
    assert ser.ser_dense_poly([5, 0, 7, 0]).hex() == vectors["dense_poly"]


def test_g1_encodings(vectors):
    from quill_tpu.ec.curve import Fq, g1_generator
    from quill_tpu.fields.bn254 import R
    from quill_tpu.transcript import serialize as ser

    g = g1_generator()
    assert ser.ser_g1(g).hex() == vectors["g1_gen"]
    assert ser.ser_g1(g.double()).hex() == vectors["g1_2g"]
    assert ser.ser_g1(g.neg()).hex() == vectors["g1_neg_g"]
    assert ser.ser_g1(g.add(g.neg())).hex() == vectors["g1_identity"]
    assert ser.ser_g1(g.scalar_mul(7)).hex() == vectors["g1_7g"]


def test_transcript_trace(vectors):
    from quill_tpu.transcript.transcript import Transcript

    t = Transcript(b"fixture_domain")
    assert t.state.hex() == vectors["transcript_state0"]
    t.append_field(1)
    assert t.state.hex() == vectors["transcript_state1"]
    c = t.draw_challenge(48)
    assert c.hex() == vectors["transcript_challenge"]
