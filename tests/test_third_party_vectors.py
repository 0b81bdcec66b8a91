"""Third-party-published BN254 vectors (always-on, no Rust needed).

The small-multiple G1 coordinates below are published, in decimal, in the
EIP-196 discussion/test suites and go-ethereum's crypto/bn256 tests (the
alt_bn128 precompile curve IS BN254).  They pin the host curve arithmetic
and the ark-serialize G1 layout against data that did not originate in this
repository -- narrowing the fixture-provenance gap flagged in the round-3
verdict (the Rust fixture generator has never run in this cargo-less
environment).
"""

from quill_tpu.ec.curve import Affine, Fq, g1_generator
from quill_tpu.fields.bn254 import P, R
from quill_tpu.transcript import serialize as ser

# alt_bn128 / BN254 G1 small multiples (decimal, as published in EIP-196
# test material and go-ethereum crypto/bn256):
G2X = 1368015179489954701390400359078579693043519447331113978918064868415326638035
G2Y = 9918110051302171585080402603319702774565515993150576347155970296011118125764
G3X = 3353031288059533942658390886683067124040920775575537747144343083137631628272
G3Y = 19321533766552368860946552437480515441416830039777911637913418824951667761761


def test_generator_is_1_2():
    g = g1_generator().to_affine()
    assert (g.x.v, g.y.v) == (1, 2)


def test_double_matches_published_2g():
    d = g1_generator().double().to_affine()
    assert (d.x.v, d.y.v) == (G2X, G2Y)


def test_add_matches_published_3g():
    g = g1_generator()
    s = g.double().add(g).to_affine()
    assert (s.x.v, s.y.v) == (G3X, G3Y)
    m = g.scalar_mul(3).to_affine()
    assert (m.x.v, m.y.v) == (G3X, G3Y)


def test_curve_equation_and_order():
    # y^2 = x^3 + 3 over F_p, and the published group order r kills G
    for x, y in [(1, 2), (G2X, G2Y), (G3X, G3Y)]:
        assert (y * y - x * x * x - 3) % P == 0
    assert g1_generator().scalar_mul(R).is_identity()


def test_serialized_2g_layout():
    # ark-serialize uncompressed: x||y 32-byte LE each, flags in the top
    # bits of the final byte (both clear here: finite point, y < (p+1)/2
    # is irrelevant for uncompressed-infinity flag; negative-y flag unused)
    pt = Affine(Fq(G2X), Fq(G2Y))
    out = ser.ser_g1(pt)
    assert len(out) == 64
    assert int.from_bytes(out[:32], "little") == G2X
    assert int.from_bytes(out[32:], "little") & ((1 << 254) - 1) == G2Y
    assert out[-1] & 0x40 == 0  # not infinity


def test_serialized_negative_y_flag_published_minus_2g():
    # -2G = (x(2G), p - y(2G)) is derivable from the published 2G; its y
    # exceeds p/2, so ark-ec SWFlags sets bit 7 of the final byte
    # (SWFlags::from_y_coordinate, ark-ec 0.5).
    neg = Affine(Fq(G2X), Fq(P - G2Y))
    assert (neg.y.v * neg.y.v - neg.x.v ** 3 - 3) % P == 0  # on curve
    out = ser.ser_g1(neg)
    assert len(out) == 64
    assert int.from_bytes(out[:32], "little") == G2X
    assert out[-1] & 0x80 == 0x80   # negative-y flag
    assert out[-1] & 0x40 == 0      # not infinity
    masked = bytearray(out[32:])
    masked[-1] &= 0x3F
    assert int.from_bytes(bytes(masked), "little") == P - G2Y


def test_serialized_infinity_layout():
    # EIP-196 publishes (0, 0) as the encoding of the point at infinity for
    # alt_bn128; ark-serialize 0.5 uncompressed additionally sets SWFlags
    # bit 6 in the final y byte (x = y = 0 otherwise).
    from quill_tpu.ec.curve import Jacobian

    inf_aff = Affine(Fq(0), Fq(0), infinity=True)
    inf_jac = Jacobian.identity(Fq(1))
    for pt in (inf_aff, inf_jac):
        out = ser.ser_g1(pt)
        assert len(out) == 64
        assert out[:63] == bytes(63)
        assert out[63] == 0x40      # infinity flag alone


def test_zero_polynomial_commitment_transcript_position():
    # A commitment to the zero polynomial IS the point at infinity; in
    # transcript position its 64-byte encoding (zeros + 0x40 flag) must be
    # what the challenge chain absorbs (VERDICT round-4 item 7 fixture).
    from quill_tpu.engine.host import HostEngine
    from quill_tpu.pcs.kzg import cached_trusted_setup
    from quill_tpu.transcript.transcript import Transcript

    eng = HostEngine()
    kzg = cached_trusted_setup(eng, 4)
    zero_comm = kzg.commit(eng.vec_from_ints([0, 0, 0]))
    assert zero_comm.is_identity()

    t1 = Transcript(b"inf-fixture")
    t1.append_g1(zero_comm)
    t2 = Transcript(b"inf-fixture")
    t2.append_bytes(bytes(63) + b"\x40")
    assert t1.draw_field_element() == t2.draw_field_element()
