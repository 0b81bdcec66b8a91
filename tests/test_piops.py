"""PIOP tests: sumcheck, zerocheck, multiset equality, permutation,
set-inclusion, lookup.

Mirrors the reference unit tests (`sumcheck.rs:159-230`,
`zerocheck.rs:85-211`, `multiset_check.rs:310-636`,
`permutation_check.rs:106-332`, `set_inclusion.rs:361-571`,
`lookup.rs:197-395`) with the same witness-corruption negatives, at sizes kept
small enough for the host pairing path.
"""

import random

import pytest

from quill_tpu.engine.host import HostEngine
from quill_tpu.fields.bn254 import R
from quill_tpu.pcs import EvaluationClaim
from quill_tpu.pcs.kzg import cached_trusted_setup
from quill_tpu.pcs.mlpcs import MultilinearPCS
from quill_tpu.piops import (lookup, multiset_check, permutation_check,
                             set_inclusion, sumcheck, zerocheck)
from quill_tpu.piops.multiset_check import LookupMode
from quill_tpu.piops.virtual_poly import Const, Store
from quill_tpu.transcript.transcript import Transcript
from quill_tpu.utils.mle import mle_evaluate

ENGINE = HostEngine()


def pcs_for(num_vars):
    return MultilinearPCS(cached_trusted_setup(ENGINE, 1 << num_vars))


class TestSumcheck:
    def test_sumcheck_proof(self):
        # `sumcheck.rs:159-230`
        num_vars = 3
        g1 = []
        g2 = []
        for i in range(1 << num_vars):
            x1, x2, x3 = i & 1, (i >> 1) & 1, (i >> 2) & 1
            g1.append((x1 + 2 * x2 + 3 * x3) % R)
            g2.append((x1 * 2 * x2 + 3 * x1 * x3) % R)

        store = Store(ENGINE, num_vars)
        g1_ref = store.allocate_polynomial(g1)
        g2_ref = store.allocate_polynomial(g2)
        vp = store.new_virtual_from_input(g1_ref)
        store.mul_in_place(vp, g2_ref)

        claimed = sum(a * b for a, b in zip(g1, g2)) % R

        proof, prover_claim = sumcheck.prove(
            num_vars, store, vp, claimed, Transcript(b"sumcheck_test"))
        claim = sumcheck.verify(proof, Transcript(b"sumcheck_test"))

        assert claim.evaluation == prover_claim.evaluation
        assert claim.point == prover_claim.point

        pt = claim.point
        g1_at_r = (pt[0] + 2 * pt[1] + 3 * pt[2]) % R
        g2_at_r = (pt[0] * 2 * pt[1] + 3 * pt[0] * pt[2]) % R
        assert claim.evaluation == g1_at_r * g2_at_r % R
        # independent MLE oracle
        assert claim.evaluation == (
            mle_evaluate(g1, pt) * mle_evaluate(g2, pt)) % R

    def test_release_inputs_contract(self, monkeypatch):
        """`release_inputs` is opt-in (round-2 advisor): the default prove
        leaves the caller's store slots intact even on a spill-capable
        engine above the size threshold; opting in nulls the used slots and
        produces the identical proof."""
        monkeypatch.setenv("QUILL_SC_RELEASE_MIN_VARS", "2")
        from quill_tpu.engine.device import TpuEngine

        eng = TpuEngine()
        assert hasattr(eng, "spill_vec")
        num_vars = 4
        rng = random.Random(7)
        g = [[rng.randrange(R) for _ in range(1 << num_vars)]
             for _ in range(2)]
        claimed = sum(a * b for a, b in zip(g[0], g[1])) % R

        def run(release):
            store = Store(eng, num_vars)
            r0 = store.allocate_polynomial(g[0])
            r1 = store.allocate_polynomial(g[1])
            vp = store.new_virtual_from_input(r0)
            store.mul_in_place(vp, r1)
            proof, _ = sumcheck.prove(num_vars, store, vp, claimed,
                                      Transcript(b"rel"),
                                      release_inputs=release)
            return proof, store

        proof_def, store_def = run(False)
        assert store_def.polynomials[0] is not None
        assert store_def.polynomials[1] is not None
        # the intact slots are still readable (caller reuse works)
        assert len(list(eng.vec_to_ints(
            store_def.polynomials[0]))) == 1 << num_vars

        proof_rel, store_rel = run(True)
        assert store_rel.polynomials[0] is None
        assert store_rel.polynomials[1] is None
        assert proof_rel.r_polys == proof_def.r_polys

    def test_wrong_sum_rejected(self):
        num_vars = 3
        rng = random.Random(0)
        g = [rng.randrange(R) for _ in range(8)]
        store = Store(ENGINE, num_vars)
        ref = store.allocate_polynomial(g)
        vp = store.new_virtual_from_input(ref)
        bad = (sum(g) + 1) % R
        proof, _ = sumcheck.prove(num_vars, store, vp, bad,
                                  Transcript(b"t"))
        with pytest.raises(ValueError):
            sumcheck.verify(proof, Transcript(b"t"))

    def test_strict_degree_bound(self):
        """Strict mode rejects round polynomials above the structural
        degree bound; lax (reference-compat) mode accepts them -- mirroring
        the flagged gap at `sumcheck.rs:116-150`."""
        num_vars = 1  # single round: no later chain check can mask the bound
        rng = random.Random(2)
        g = [rng.randrange(R) for _ in range(2)]
        store = Store(ENGINE, num_vars)
        ref = store.allocate_polynomial(g)
        vp = store.new_virtual_from_input(ref)
        claimed = sum(g) % R
        proof, _ = sumcheck.prove(num_vars, store, vp, claimed,
                                  Transcript(b"t"))
        # honest proof passes in both modes with the true bound (degree 1)
        sumcheck.verify(proof, Transcript(b"t"), max_degree=1)
        sumcheck.verify(proof, Transcript(b"t"))
        # forge an over-degree round poly: add X^2*(X-1) -- q(0)=q(1)=0
        # keeps the round-sum identity, so ONLY the degree bound catches it
        from quill_tpu.piops.sumcheck import poly_eval_host

        p0 = list(proof.r_polys[0]) + [0] * (4 - len(proof.r_polys[0]))
        q = [0, 0, R - 1, 1]  # X^2*(X-1) = X^3 - X^2
        bad0 = [(a + b) % R for a, b in zip(p0, q)]
        forged = sumcheck.SumcheckProof(num_vars=proof.num_vars,
                                        claimed_sum=proof.claimed_sum,
                                        r_polys=[bad0])
        assert (poly_eval_host(bad0, 0) + poly_eval_host(bad0, 1)) % R \
            == proof.claimed_sum % R
        # lax (reference-compat) mode accepts the forged rounds
        sumcheck.verify(forged, Transcript(b"t"))
        with pytest.raises(ValueError):
            sumcheck.verify(forged, Transcript(b"t"), max_degree=1)

    def test_message_degree_matches_structural_degree(self):
        # cubic expression -> round polys have <= 4 coefficients
        num_vars = 2
        rng = random.Random(1)
        g = [rng.randrange(R) for _ in range(4)]
        store = Store(ENGINE, num_vars)
        ref = store.allocate_polynomial(g)
        vp = store.new_virtual_from_input(ref)
        store.mul_in_place(vp, ref)
        store.mul_in_place(vp, ref)
        claimed = sum(x * x * x for x in g) % R
        proof, _ = sumcheck.prove(num_vars, store, vp, claimed, Transcript(b"t"))
        assert all(len(p) <= 4 for p in proof.r_polys)
        sumcheck.verify(proof, Transcript(b"t"))


class TestZerocheck:
    def _build(self, g2_last):
        num_vars = 3
        g1 = list(range(8))
        g2 = [0, 1, 4, 9, 16, 25, 36, g2_last]
        store = Store(ENGINE, num_vars)
        g1_ref = store.allocate_polynomial(g1)
        g2_ref = store.allocate_polynomial(g2)
        h = store.new_virtual_from_input(g1_ref)
        store.mul_in_place(h, g1_ref)
        store.sub_in_place(h, g2_ref)
        return store, h, g1, g2

    def test_zerocheck_proof(self):
        # `zerocheck.rs:85-159`: h = g1*g1 - g2 vanishes
        store, h, g1, g2 = self._build(49)
        proof, prover_claim = zerocheck.prove(store, h,
                                              Transcript(b"zerocheck_test"))
        claim = zerocheck.verify(proof, Transcript(b"zerocheck_test"))
        assert claim.evaluation == prover_claim.evaluation
        assert claim.point == prover_claim.point
        g1r = mle_evaluate(g1, claim.point)
        g2r = mle_evaluate(g2, claim.point)
        assert claim.evaluation == (g1r * g1r - g2r) % R

    def test_zerocheck_not_zero(self):
        # `zerocheck.rs:161-211`
        store, h, _, _ = self._build(50)
        proof, _ = zerocheck.prove(store, h, Transcript(b"zerocheck_test"))
        with pytest.raises(ValueError):
            zerocheck.verify(proof, Transcript(b"zerocheck_test"))


class TestMultisetEquality:
    NUM_VARS = 5

    def _run(self, left, right, mode=LookupMode.EQUALITY, mults=None):
        pcs = pcs_for(self.NUM_VARS)
        store = Store(ENGINE, self.NUM_VARS)
        l_ref = store.allocate_polynomial(left)
        r_ref = store.allocate_polynomial(right)
        l_virt = store.new_virtual_from_input(l_ref)
        r_virt = store.new_virtual_from_input(r_ref)
        m_virt = None
        m_claim = None
        if mults is not None:
            m_ref = store.allocate_polynomial(mults)
            m_virt = store.new_virtual_from_input(m_ref)
        t = Transcript(b"multiset_equality_test")
        proof, point = multiset_check.prove(
            store, l_virt, r_virt, t, pcs, mode, m_virt)
        vt = Transcript(b"multiset_equality_test")
        left_claim = EvaluationClaim(point=list(point),
                                     evaluation=mle_evaluate(left, point))
        right_claim = EvaluationClaim(point=list(point),
                                      evaluation=mle_evaluate(right, point))
        if mults is not None:
            m_claim = EvaluationClaim(point=list(point),
                                      evaluation=mle_evaluate(mults, point))
        multiset_check.verify(proof, vt, pcs, left_claim, right_claim, mode,
                              m_claim)

    def test_equality(self):
        # `multiset_check.rs:310-382`
        rng = random.Random(2)
        left = [rng.randrange(R) for _ in range(1 << self.NUM_VARS)]
        right = list(left)
        rng.shuffle(right)
        self._run(left, right)

    def test_equality_invalid(self):
        # `multiset_check.rs:384-456`
        rng = random.Random(3)
        left = [rng.randrange(R) for _ in range(1 << self.NUM_VARS)]
        right = list(left)
        rng.shuffle(right)
        right[0] = (right[0] + 1) % R
        with pytest.raises(ValueError):
            self._run(left, right)

    def test_inclusion_with_multiplicities(self):
        # `multiset_check.rs:458-546`
        rng = random.Random(4)
        n = 1 << self.NUM_VARS
        table = [rng.randrange(R) for _ in range(n)]
        subset = [table[rng.randrange(n)] for _ in range(n)]
        mults = [0] * n
        for v in subset:
            mults[table.index(v)] += 1
        self._run(subset, table, LookupMode.SUBSET, mults)

    def test_inclusion_invalid_multiplicities(self):
        # `multiset_check.rs:548-636`
        rng = random.Random(5)
        n = 1 << self.NUM_VARS
        table = [rng.randrange(R) for _ in range(n)]
        subset = [table[rng.randrange(n)] for _ in range(n)]
        mults = [0] * n
        for v in subset:
            mults[table.index(v)] += 1
        mults[0] += 1
        with pytest.raises(ValueError):
            self._run(subset, table, LookupMode.SUBSET, mults)


class TestPermutationCheck:
    NUM_VARS = 5

    def _run(self, corrupt=False):
        # `permutation_check.rs:106-332`
        rng = random.Random(6)
        n = 1 << self.NUM_VARS
        pcs = pcs_for(self.NUM_VARS)
        values = [rng.randrange(R) for _ in range(n)]
        perm_idx = list(range(n))
        rng.shuffle(perm_idx)
        permuted = [values[perm_idx[i]] for i in range(n)]
        if corrupt:
            permuted[0], permuted[1] = permuted[1], permuted[0]

        id_field = [i % R for i in range(n)]
        perm_field = [i % R for i in perm_idx]

        store = Store(ENGINE, self.NUM_VARS)
        l_ref = store.allocate_polynomial(values)
        r_ref = store.allocate_polynomial(permuted)
        l_virt = store.new_virtual_from_input(l_ref)
        r_virt = store.new_virtual_from_input(r_ref)

        t = Transcript(b"permutation_test")
        proof, point = permutation_check.prove(
            store, l_virt, r_virt, id_field, perm_field, t, pcs)

        vt = Transcript(b"permutation_test")
        mk = lambda vals: EvaluationClaim(point=list(point),
                                          evaluation=mle_evaluate(vals, point))
        permutation_check.verify(proof, vt, pcs, mk(values), mk(permuted),
                                 mk(id_field), mk(perm_field))

    def test_permutation(self):
        self._run(corrupt=False)

    def test_permutation_invalid(self):
        with pytest.raises(ValueError):
            self._run(corrupt=True)


class TestSetInclusionAndLookup:
    def test_bytes_lookup_inclusion(self, corrupt=False):
        # `set_inclusion.rs:361-571`, shrunk to 7/5 vars
        rng = random.Random(7)
        nv_src, nv_tbl = 7, 5
        pcs = pcs_for(nv_src)
        table = [i % R for i in range(1 << nv_tbl)]
        raw = [rng.randrange(1 << nv_tbl) for _ in range(1 << nv_src)]
        source = [b % R for b in raw]
        mults = [0] * (1 << nv_tbl)
        for b in raw:
            mults[b] += 1
        if corrupt:
            source[0] = (1 << nv_tbl) % R  # value outside the table

        store1 = Store(ENGINE, nv_src)
        src_ref = store1.allocate_polynomial(source)
        src_virt = store1.new_virtual_from_input(src_ref)
        store2 = Store(ENGINE, nv_tbl)
        dst_ref = store2.allocate_polynomial(table)
        m_ref = store2.allocate_polynomial(mults)
        dst_virt = store2.new_virtual_from_input(dst_ref)
        m_virt = store2.new_virtual_from_input(m_ref)

        t = Transcript(b"lookup_test")
        proof, pts = set_inclusion.prove(store1, src_virt, store2, dst_virt,
                                         m_virt, t, pcs)

        vt = Transcript(b"lookup_test")
        claims = set_inclusion.SetInclusionEvaluationClaims(
            h_left_sumcheck_claim=EvaluationClaim(
                point=list(pts.left), evaluation=mle_evaluate(source, pts.left)),
            h_right_sumcheck_claim=EvaluationClaim(
                point=list(pts.right), evaluation=mle_evaluate(table, pts.right)),
            multiplicities_claim=EvaluationClaim(
                point=list(pts.right), evaluation=mle_evaluate(mults, pts.right)),
        )
        set_inclusion.verify(proof, vt, pcs, claims)

    def test_bytes_lookup_inclusion_invalid(self):
        with pytest.raises(ValueError):
            self.test_bytes_lookup_inclusion(corrupt=True)

    def test_xor_lookup(self, corrupt=False):
        # `lookup.rs:197-395`, shrunk: 6-bit values, xor with 42
        rng = random.Random(8)
        nv_src, nv_tbl = 7, 6
        pcs = pcs_for(nv_src)
        xor_col1 = [i % R for i in range(64)]
        xor_col2 = [(i ^ 42) % R for i in range(64)]
        raw = [rng.randrange(64) for _ in range(1 << nv_src)]
        src1 = [b % R for b in raw]
        src2 = [(b ^ 42) % R for b in raw]
        if corrupt:
            src2[0] = (src2[0] + 1) % R
        mults = [0] * 64
        for b in raw:
            mults[b] += 1

        store1 = Store(ENGINE, nv_src)
        s1 = store1.new_virtual_from_input(store1.allocate_polynomial(src1))
        s2 = store1.new_virtual_from_input(store1.allocate_polynomial(src2))
        store2 = Store(ENGINE, nv_tbl)
        d1 = store2.new_virtual_from_input(store2.allocate_polynomial(xor_col1))
        d2 = store2.new_virtual_from_input(store2.allocate_polynomial(xor_col2))
        m = store2.new_virtual_from_input(store2.allocate_polynomial(mults))

        t = Transcript(b"lookup_test")
        proof, pts = lookup.prove(store1, [s1, s2], store2, [d1, d2], m, t, pcs)

        vt = Transcript(b"lookup_test")
        claims = lookup.LookupEvaluationClaims(
            source_claims=[
                EvaluationClaim(point=list(pts.left),
                                evaluation=mle_evaluate(src1, pts.left)),
                EvaluationClaim(point=list(pts.left),
                                evaluation=mle_evaluate(src2, pts.left)),
            ],
            dests_claims=[
                EvaluationClaim(point=list(pts.right),
                                evaluation=mle_evaluate(xor_col1, pts.right)),
                EvaluationClaim(point=list(pts.right),
                                evaluation=mle_evaluate(xor_col2, pts.right)),
            ],
            multiplicities_claim=EvaluationClaim(
                point=list(pts.right), evaluation=mle_evaluate(mults, pts.right)),
        )
        lookup.verify(proof, vt, pcs, claims)

    def test_xor_lookup_invalid(self):
        with pytest.raises(ValueError):
            self.test_xor_lookup(corrupt=True)
