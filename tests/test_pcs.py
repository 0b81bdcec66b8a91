"""PCS tests: KZG, Mercury IPA, multilinear PCS.

Mirrors the reference test matrix: positive verification with independently
constructed transcripts, proof mutation negatives, and independent-oracle
cross-checks (`/root/reference/pcs/src/kzg.rs:119-151`, `ipa.rs:214-298`,
`mlpcs.rs:220-474`).
"""

import dataclasses
import random

from quill_tpu.engine.host import HostEngine
from quill_tpu.fields.bn254 import R
from quill_tpu.pcs import ipa
from quill_tpu.pcs.kzg import cached_trusted_setup
from quill_tpu.pcs.mlpcs import MLEvalProof, MultilinearPCS, eval_pr
from quill_tpu.transcript.transcript import Transcript
from quill_tpu.utils.mle import mle_evaluate

ENGINE = HostEngine()


def setup(degree):
    return cached_trusted_setup(ENGINE, degree)


class TestKZG:
    def test_commit_open_verify(self):
        kzg = setup(4)
        # p(x) = 2 + x + 3x^2  (`kzg.rs:127-128`)
        poly = ENGINE.vec_from_ints([2, 1, 3])
        commitment = kzg.commit(poly)
        proof = kzg.open(poly, 5)
        assert proof.y == (2 + 5 + 3 * 25) % R
        assert kzg.verify_opening(commitment, proof)
        wrong = dataclasses.replace(proof, y=(proof.y + 1) % R)
        assert not kzg.verify_opening(commitment, wrong)

    def test_quotient_exactness(self):
        rng = random.Random(3)
        kzg = setup(16)
        poly = ENGINE.vec_from_ints([rng.randrange(R) for _ in range(9)])
        x = rng.randrange(R)
        proof = kzg.open(poly, x)
        assert proof.y == ENGINE.poly_eval(poly, x)
        assert kzg.verify_opening(kzg.commit(poly), proof)


class TestIPA:
    def test_inner_product_proof(self):
        # `ipa.rs:214-255`
        kzg = setup(4)
        poly1 = ENGINE.vec_from_ints([1, 2, 3])
        poly2 = ENGINE.vec_from_ints([4, 5, 6])
        t = Transcript(b"inner_product_test")
        comm1 = kzg.commit(poly1)
        comm2 = kzg.commit(poly2)
        t.append_g1(comm1)
        t.append_g1(comm2)
        proof = ipa.prove(ENGINE, poly1, poly2, kzg, t)
        assert proof.inner_product == 32  # 1*4 + 2*5 + 3*6

        vt = Transcript(b"inner_product_test")
        vt.append_g1(comm1)
        vt.append_g1(comm2)
        assert ipa.verify(proof, comm1, comm2, kzg, vt)

        wrong = dataclasses.replace(
            proof, inner_product=(proof.inner_product + 1) % R)
        vt = Transcript(b"inner_product_test")
        vt.append_g1(comm1)
        vt.append_g1(comm2)
        assert not ipa.verify(wrong, comm1, comm2, kzg, vt)

    def test_mismatched_degrees(self):
        # `ipa.rs:257-298`
        kzg = setup(16)
        poly1 = ENGINE.vec_from_ints([1, 2, 3])
        poly2 = ENGINE.vec_from_ints([4, 5])
        t = Transcript(b"inner_product_test")
        comm1 = kzg.commit(poly1)
        comm2 = kzg.commit(poly2)
        t.append_g1(comm1)
        t.append_g1(comm2)
        proof = ipa.prove(ENGINE, poly1, poly2, kzg, t)
        assert proof.inner_product == 14  # 1*4 + 2*5

        vt = Transcript(b"inner_product_test")
        vt.append_g1(comm1)
        vt.append_g1(comm2)
        assert ipa.verify(proof, comm1, comm2, kzg, vt)

    def test_s_polynomial_structure(self):
        # h = f*rev(g) + rev(f)*g has palindromic coefficients around the
        # middle 2*<f,g> term (`ipa.rs:114-121`)
        rng = random.Random(4)
        f = ENGINE.vec_from_ints([rng.randrange(R) for _ in range(8)])
        g = ENGINE.vec_from_ints([rng.randrange(R) for _ in range(8)])
        h = ENGINE.add(ENGINE.poly_mul(f, ENGINE.reverse(g)),
                       ENGINE.poly_mul(ENGINE.reverse(f), g))
        d = 7
        ip = ENGINE.inner(f, g)
        assert int(h[d]) == 2 * ip % R
        for k in range(1, d + 1):
            assert int(h[d + k]) == int(h[d - k])
        s = ipa.compute_s_polynomial(ENGINE, f, g)
        assert [int(x) for x in s] == [int(x) for x in h[8:]]


class TestMLPCS:
    def test_pr_computation(self):
        # `mlpcs.rs:220-243`: P_r for r=(0,0,0) is 1; for r=(1,0,1) is x^5
        tbl = ENGINE.eq_table([0, 0, 0])
        assert [int(x) for x in tbl] == [1, 0, 0, 0, 0, 0, 0, 0]
        tbl = ENGINE.eq_table([1, 0, 1])
        assert [int(x) for x in tbl] == [0, 0, 0, 0, 0, 1, 0, 0]

    def test_eq_table_matches_eval_pr(self):
        # coefficient j of P_r equals eq(bin(j), r); cross-check via
        # polynomial evaluation at random x
        rng = random.Random(5)
        r = [rng.randrange(R) for _ in range(4)]
        tbl = ENGINE.eq_table(r)
        x = rng.randrange(R)
        assert ENGINE.poly_eval(tbl, x) == eval_pr(r, x)

    def test_mlpcs_proof(self):
        # `mlpcs.rs:245-319`
        rng = random.Random(6)
        num_vars = 5
        poly_ints = [rng.randrange(R) for _ in range(1 << num_vars)]
        poly = ENGINE.vec_from_ints(poly_ints)
        pcs = MultilinearPCS(setup(1 << num_vars))

        t = Transcript(b"MLPCS Test")
        commitment = pcs.commit(poly)
        t.append_g1(commitment)
        eval_point = [t.draw_field_element() for _ in range(num_vars)]
        proof = pcs.open(poly, eval_point, t)

        # independent oracle (`mlpcs.rs:283-285`)
        assert proof.evaluation == mle_evaluate(poly_ints, eval_point)

        vt = Transcript(b"MLPCS Test")
        vt.append_g1(commitment)
        v_point = [vt.draw_field_element() for _ in range(num_vars)]
        assert v_point == proof.evaluation_point
        assert pcs.verify(commitment, proof, vt)

        wrong = dataclasses.replace(proof, evaluation=(proof.evaluation + 1) % R)
        vt = Transcript(b"MLPCS Test")
        vt.append_g1(commitment)
        [vt.draw_field_element() for _ in range(num_vars)]
        assert not pcs.verify(commitment, wrong, vt)

    def test_zero_and_binary_openings(self):
        # `mlpcs.rs:321-393`
        rng = random.Random(7)
        num_vars = 3
        poly_ints = [rng.randrange(R) for _ in range(1 << num_vars)]
        poly = ENGINE.vec_from_ints(poly_ints)
        pcs = MultilinearPCS(setup(1 << num_vars))
        commitment = pcs.commit(poly)
        for point in ([0, 0, 0], [0, 1, 0]):
            t = Transcript(b"MLPCS Zero Opening Test")
            proof = pcs.open(poly, point, t)
            vt = Transcript(b"MLPCS Zero Opening Test")
            assert pcs.verify(commitment, proof, vt)
            assert proof.evaluation == mle_evaluate(poly_ints, point)

    def test_degree_bound_opening(self):
        # fewer vars than committed evaluates the truncated prefix
        # (`mlpcs.rs:395-474`)
        rng = random.Random(8)
        num_vars, enforced = 5, 3
        poly_ints = [rng.randrange(R) for _ in range(1 << num_vars)]
        poly = ENGINE.vec_from_ints(poly_ints)
        pcs = MultilinearPCS(setup((1 << num_vars) * 4))
        t = Transcript(b"MLPCS Test")
        commitment = pcs.commit(poly)
        t.append_g1(commitment)
        eval_point = [t.draw_field_element() for _ in range(enforced)]
        proof = pcs.open(poly, eval_point, t)
        assert proof.evaluation == mle_evaluate(
            poly_ints[:1 << enforced], eval_point)
        vt = Transcript(b"MLPCS Test")
        vt.append_g1(commitment)
        [vt.draw_field_element() for _ in range(enforced)]
        assert pcs.verify(commitment, proof, vt)

    def test_open_many_byte_identical(self):
        # the fused batch pipeline (shared eq tables, one quotient pass,
        # one multi-MSM) must be transcript- AND proof-byte-identical to
        # sequential `open` calls -- mixed points, repeated polys, and a
        # repeated evaluation point exercising the eq-table cache
        rng = random.Random(9)
        num_vars = 4
        polys = [ENGINE.vec_from_ints(
            [rng.randrange(R) for _ in range(1 << num_vars)])
            for _ in range(3)]
        pcs = MultilinearPCS(setup(1 << num_vars))
        pt_a = [rng.randrange(R) for _ in range(num_vars)]
        pt_b = [rng.randrange(R) for _ in range(num_vars)]
        items = [(polys[0], pt_a), (polys[1], pt_a), (polys[0], pt_b),
                 (polys[2], pt_b)]

        t_seq = Transcript(b"open-many")
        seq = [pcs.open(p, pt, t_seq) for p, pt in items]
        t_bat = Transcript(b"open-many")
        bat = pcs.open_many(items, t_bat)

        assert t_seq.state == t_bat.state
        for a, b in zip(seq, bat):
            assert a == b


class TestStrictVerify:
    """QUILL_STRICT_VERIFY pins opening points to the transcript draw.

    The reference never compares an opening's claimed x against the drawn
    r (`/root/reference/pcs/src/mlpcs.rs:142-149`, `ipa.rs:160-203`): the
    pairing equation uses proof.x, so a VALID opening at any adversarial
    point passes it, and only the y-algebra ties the proof to r.  Default
    mode keeps reference compat; strict mode must reject.  The pairing
    check is stubbed to isolate the differential (a tampered x with a
    consistent pairing is exactly the adversarial shape)."""

    def test_mlpcs_strict_rejects_wrong_x(self, monkeypatch):
        rng = random.Random(11)
        num_vars = 3
        poly = ENGINE.vec_from_ints(
            [rng.randrange(R) for _ in range(1 << num_vars)])
        pcs = MultilinearPCS(setup(1 << num_vars))
        commitment = pcs.commit(poly)
        point = [rng.randrange(R) for _ in range(num_vars)]
        t = Transcript(b"strict")
        proof = pcs.open(poly, point, t)

        # honest proof passes in strict mode
        monkeypatch.setenv("QUILL_STRICT_VERIFY", "1")
        assert pcs.verify(commitment, proof, Transcript(b"strict"))

        tampered = dataclasses.replace(
            proof, poly_opening=dataclasses.replace(
                proof.poly_opening, x=(proof.poly_opening.x + 1) % R))
        # simulate a pairing-consistent opening at the adversarial x
        monkeypatch.setattr(pcs.kzg, "verify_opening",
                            lambda *a, **k: True)
        monkeypatch.delenv("QUILL_STRICT_VERIFY")
        assert pcs.verify(commitment, tampered, Transcript(b"strict"))
        monkeypatch.setenv("QUILL_STRICT_VERIFY", "1")
        assert not pcs.verify(commitment, tampered, Transcript(b"strict"))

    def test_ipa_strict_rejects_wrong_x(self, monkeypatch):
        kzg = setup(8)
        poly1 = ENGINE.vec_from_ints([1, 2, 3, 4])
        poly2 = ENGINE.vec_from_ints([5, 6, 7, 8])
        comm1, comm2 = kzg.commit(poly1), kzg.commit(poly2)
        t = Transcript(b"strict-ipa")
        t.append_g1(comm1)
        t.append_g1(comm2)
        proof = ipa.prove(ENGINE, poly1, poly2, kzg, t)

        def vt():
            out = Transcript(b"strict-ipa")
            out.append_g1(comm1)
            out.append_g1(comm2)
            return out

        monkeypatch.setenv("QUILL_STRICT_VERIFY", "1")
        assert ipa.verify(proof, comm1, comm2, kzg, vt())

        tampered = dataclasses.replace(
            proof, s_opening_inv=dataclasses.replace(
                proof.s_opening_inv, x=(proof.s_opening_inv.x + 1) % R))
        monkeypatch.setattr(kzg, "verify_opening", lambda *a, **k: True)
        monkeypatch.delenv("QUILL_STRICT_VERIFY")
        assert ipa.verify(tampered, comm1, comm2, kzg, vt())
        monkeypatch.setenv("QUILL_STRICT_VERIFY", "1")
        assert not ipa.verify(tampered, comm1, comm2, kzg, vt())
