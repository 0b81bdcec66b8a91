"""Multi-chip differential tests (opt-in with QUILL_DEVICE_TESTS=1).

Runs the protocol-level sharded sumcheck prover on an 8-device mesh and
requires byte-identical proofs vs the exact host prover (SURVEY §4: sharded
== single-chip with `==`, not allclose).
"""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("QUILL_DEVICE_TESTS"),
    reason="mesh tests are opt-in (QUILL_DEVICE_TESTS=1)")

from quill_tpu.fields.bn254 import R  # noqa: E402


def test_sharded_sumcheck_prover_byte_identical():
    import jax

    from quill_tpu.engine.host import HostEngine
    from quill_tpu.parallel import mesh as mesh_mod
    from quill_tpu.parallel.sharded import sharded_sumcheck_prove
    from quill_tpu.piops import sumcheck
    from quill_tpu.piops.virtual_poly import Const, Input, Store
    from quill_tpu.transcript.transcript import Transcript

    n_dev = min(8, len(jax.devices()))
    rng = random.Random(0)
    n_vars = 10
    g = [[rng.randrange(R) for _ in range(1 << n_vars)] for _ in range(3)]
    expr = (Input(0) * Input(1) - Input(2)) + Const(7) * Input(0)
    claimed = sum(expr.evaluate([g[0][i], g[1][i], g[2][i]])
                  for i in range(1 << n_vars)) % R

    host = HostEngine()
    store = Store(host, n_vars)
    for t in g:
        store.allocate_polynomial(t)
    vp = store.new_virtual_from_expr(expr)
    ref_proof, ref_claim = sumcheck.prove(n_vars, store, vp, claimed,
                                          Transcript(b"sh"))

    mesh = mesh_mod.make_mesh(n_dev)
    sh_proof, sh_claim = sharded_sumcheck_prove(mesh, n_vars, g, expr,
                                                claimed, Transcript(b"sh"))
    assert sh_proof.r_polys == ref_proof.r_polys
    assert sh_claim.point == ref_claim.point
    assert sh_claim.evaluation == ref_claim.evaluation
    sumcheck.verify(sh_proof, Transcript(b"sh"))
