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


def test_g1_y_flag_boundary(vectors):
    """YIsNegative boundary at y = (p±1)/2, via synthetic affine pairs (the
    encoder is coordinate-wise; membership is irrelevant to the layout)."""
    from quill_tpu.ec.curve import Affine, Fq
    from quill_tpu.fields.bn254 import P
    from quill_tpu.transcript import serialize as ser

    if "g1_y_half_lo" not in vectors:
        pytest.skip("boundary pairs are off-curve: present only in the "
                    "Python-derived fixture file, not Rust-generated ones")
    lo = Affine(Fq(12345), Fq((P - 1) // 2))
    hi = Affine(Fq(12345), Fq((P + 1) // 2))
    assert ser.ser_g1(lo).hex() == vectors["g1_y_half_lo"]
    assert ser.ser_g1(hi).hex() == vectors["g1_y_half_hi"]
    # the flag bit itself: clear below the boundary, set at/above it
    assert bytes.fromhex(vectors["g1_y_half_lo"])[-1] & 0x80 == 0
    assert bytes.fromhex(vectors["g1_y_half_hi"])[-1] & 0x80 == 0x80


def test_g1_vec_with_identity(vectors):
    from quill_tpu.ec.curve import g1_generator
    from quill_tpu.transcript import serialize as ser

    g = g1_generator()
    pts = [g, g.add(g.neg()), g.double()]
    got = ser.ser_usize(len(pts)) + b"".join(ser.ser_g1(p) for p in pts)
    assert got.hex() == vectors["g1_vec_with_identity"]


def test_fr_from_48_byte_draws(vectors):
    from quill_tpu.fields.bn254 import R
    from quill_tpu.transcript import serialize as ser

    for name in ("ff", "counting"):
        raw = bytes.fromhex(vectors[f"fr_from_48_{name}_bytes"])
        got = int.from_bytes(raw, "little") % R
        assert ser.ser_field(got).hex() == vectors[f"fr_from_48_{name}"]


def test_transcript_full_replay(vectors):
    """Every encoder branch interleaved with challenge draws must replay to
    the fixture's final state -- any serialization drift fails loudly here
    before it silently breaks Fiat-Shamir."""
    from quill_tpu.ec.curve import g1_generator
    from quill_tpu.fields.bn254 import R
    from quill_tpu.transcript.transcript import Transcript

    g = g1_generator()
    t = Transcript(b"replay_domain")
    t.append_usize(2)
    t.append_field(5)
    t.append_field_vec([0, 1, R - 1])
    t.append_dense_poly([1, 0, 2, 0])
    r1 = t.draw_field_element()
    t.append_g1(g.scalar_mul(3))
    t.append_g1(g.add(g.neg()))
    r2 = t.draw_field_element()
    assert r1.to_bytes(32, "little").hex() == vectors["replay_r1"]
    assert r2.to_bytes(32, "little").hex() == vectors["replay_r2"]
    assert t.state.hex() == vectors["replay_final_state"]
