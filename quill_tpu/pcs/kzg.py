"""Univariate KZG commitments over BN254.

Counterpart of `/root/reference/pcs/src/kzg.rs`.  Differences from the
reference (all transcript-invisible):
- the CRS is stored in affine form once at setup (the reference converts the
  whole projective CRS to affine on *every* commit, `kzg.rs:67-71`);
- quotient polynomials are produced by synthetic division (associative-scan
  friendly) instead of generic polynomial division (`kzg.rs:80-85`);
- verification uses one multi-pairing (2 Miller loops, 1 shared final
  exponentiation) instead of two full pairings (`kzg.rs:104-107`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..ec import curve
from ..ec.pairing import pairing_check
from ..fields.bn254 import R
from ..fields.scalar import inv


@dataclass
class KZGOpeningProof:
    """`KZGOpeningProof { x, y, proof }` (`kzg.rs:25-32`)."""

    x: int
    y: int
    proof: curve.Jacobian


class KZG:
    """CRS + commit/open/verify.  `g1_points` are affine G1 powers of tau;
    `g2_points` = [G2, tau*G2] (`kzg.rs:35-59`)."""

    def __init__(self, engine, max_degree: int, g1_points: list[curve.Affine],
                 g2_points: list[curve.Jacobian], g1: curve.Jacobian,
                 g2: curve.Jacobian):
        self.engine = engine
        self.max_degree = max_degree
        self.g1 = g1
        self.g2 = g2
        self.g1_points = g1_points
        self.g2_points = g2_points
        self._basis = engine.load_points(g1_points)

    # -- setup --------------------------------------------------------------

    @staticmethod
    def trusted_setup(engine, max_degree: int, tau: int | None = None,
                      seed: int = 0) -> "KZG":
        """Deterministic τ-powers CRS.  The reference samples generators and τ
        from an RNG (`kzg.rs:35-59`); we derive them from a seed (τ is toxic
        waste either way; CRS bytes are not transcript material)."""
        import hashlib

        if tau is None:
            tau = int.from_bytes(
                hashlib.sha256(b"quill-tpu-trusted-setup" + seed.to_bytes(8, "little")).digest(),
                "little") % R
        g1 = curve.g1_generator()
        g2 = curve.g2_generator()
        # successive powers: g1 * tau^i, computed as repeated scalar products of
        # the *scalar* (cheap) and one scalar_mul per point
        powers = [1] * (max_degree + 1)
        for i in range(1, max_degree + 1):
            powers[i] = powers[i - 1] * tau % R
        g1_jac = [g1.scalar_mul(p) for p in powers]
        g1_points = curve.batch_to_affine(g1_jac)
        g2_points = [g2, g2.scalar_mul(tau)]
        return KZG(engine, max_degree, g1_points, g2_points, g1, g2)

    # -- core ops ------------------------------------------------------------

    def commit(self, poly) -> curve.Jacobian:
        """MSM of coefficients against the CRS (`kzg.rs:61-73`)."""
        n = self.engine.vec_len(poly)
        assert n <= self.max_degree + 1, "Polynomial degree exceeds max degree"
        return self.engine.msm(self.engine.basis_slice(self._basis, n), poly)

    def open(self, poly, x: int) -> KZGOpeningProof:
        """Open p at x: y = p(x), commit to q = (p - y)/(X - x)
        (`kzg.rs:75-96`)."""
        y, q = self.engine.quotient_by_linear(poly, x)
        q_commitment = self.engine.msm(
            self.engine.basis_slice(self._basis, self.engine.vec_len(q)), q)
        return KZGOpeningProof(x=x % R, y=y, proof=q_commitment)

    def verify_opening(self, commitment: curve.Jacobian, proof: KZGOpeningProof) -> bool:
        """Pairing equation e(C - y G1, G2) = e(pi, tau G2 - x G2)
        (`kzg.rs:98-108`), checked as one multi-pairing product == 1."""
        c_minus_y = commitment.add(self.g1.scalar_mul(proof.y).neg())
        tau_minus_x = self.g2_points[1].add(self.g2_points[0].scalar_mul(proof.x).neg())
        return pairing_check([
            (c_minus_y.to_affine(), self.g2.to_affine()),
            (proof.proof.neg().to_affine(), tau_minus_x.to_affine()),
        ])


# module-level CRS cache so tests and benches reuse setups
_SETUP_CACHE: dict = {}


def cached_trusted_setup(engine, max_degree: int, seed: int = 0) -> KZG:
    key = (max_degree, seed)
    crs = _SETUP_CACHE.get(key)
    if crs is None or crs.engine is not engine:
        base = _SETUP_CACHE.get((max_degree, seed, "raw"))
        if base is None:
            base = KZG.trusted_setup(engine, max_degree, seed=seed)
            _SETUP_CACHE[(max_degree, seed, "raw")] = base
        crs = KZG(engine, base.max_degree, base.g1_points, base.g2_points,
                  base.g1, base.g2)
        _SETUP_CACHE[key] = crs
    return crs
