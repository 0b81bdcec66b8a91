"""Multi-chip differential tests.

Runs the protocol-level sharded provers on the virtual 8-device CPU mesh
(conftest forces JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8)
and requires byte-identical proofs vs the exact host prover (SURVEY §4:
sharded == single-chip with `==`, not allclose).  These tests need the CPU
mesh, NOT the TPU -- they run in the default host suite."""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("QUILL_DEVICE_TESTS") is not None,
    reason="mesh tests need the 8-device CPU mesh, not the axon chip")

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


def test_sharded_msm_matches_host():
    """Partitioned windowed Pippenger (`parallel/msm.py`) == host oracle,
    across window sizes and with zero / edge scalars and identity points."""
    import jax
    import jax.numpy as jnp

    from quill_tpu.ec import curve
    from quill_tpu.ec.device import host_affine_to_device
    from quill_tpu.fields import device as fd
    from quill_tpu.fields.limbs import ints_to_limbs
    from quill_tpu.parallel import mesh as mesh_mod
    from quill_tpu.parallel.msm import sharded_msm

    rng = random.Random(3)
    n = 128
    g = curve.g1_generator()
    pts = [g.scalar_mul(rng.randrange(1, R)) for _ in range(n)]
    affs = curve.batch_to_affine(pts)
    affs[5] = curve.Affine(curve.Fq(0), curve.Fq(0), infinity=True)
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = R - 1
    scalars[2] = 1

    mesh = mesh_mod.make_mesh(min(8, len(jax.devices())))
    sh = mesh_mod.shard_elements(mesh)
    bx, by, inf = host_affine_to_device(affs)
    to_m = jax.jit(lambda v: fd.to_mont(v, fd.FQ))
    bx = jax.device_put(to_m(jnp.asarray(bx)), sh)
    by = jax.device_put(to_m(jnp.asarray(by)), sh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    inf = jax.device_put(jnp.asarray(inf), NamedSharding(mesh, P("x")))
    sc = jax.device_put(jnp.asarray(ints_to_limbs(scalars)), sh)

    expected = curve.msm_host(affs, scalars)
    # c = 5 is what pick_window_bits selects at dryrun scale; c = 13 covers
    # the three-limb cross-word digit extraction.  (Each window size is a
    # separate XLA program; two sizes keep the suite's compile budget sane.)
    for c in (5, 13):
        got = sharded_msm(mesh, sc, bx, by, inf, window_bits=c)
        assert got == expected, f"sharded MSM mismatch at window_bits={c}"


def _fib_circuit(rows: int):
    """Fibonacci transition circuit at a parametric row count
    (`/root/reference/hyperplonk/tests/test_basic_proof.rs:17-52`)."""
    from quill_tpu.frontend.transition_circuit import TransitionCircuit
    from quill_tpu.piops.virtual_poly import Const
    from quill_tpu.proof.hyperplonk import TraceWitness

    circuit = TransitionCircuit.new(rows)
    s1 = circuit.allocate_state_cell()
    s2 = circuit.allocate_state_cell()
    circuit.enforce_boundary_constraint(0, s1.current.to_expr())
    circuit.enforce_boundary_constraint(0, s2.current.to_expr() - Const(1))
    circuit.enforce_constraint(
        s2.next.to_expr() - (s1.current.to_expr() + s2.current.to_expr()))
    circuit.enforce_constraint(s1.next.to_expr() - s2.current.to_expr())

    w = [[0] * rows for _ in range(circuit.num_cols())]
    for row in range(rows):
        if row == 0:
            w[s1.current.col][row] = 0
            w[s2.current.col][row] = 1
        else:
            w[s1.current.col][row] = w[s1.next.col][row - 1]
            w[s2.current.col][row] = w[s2.next.col][row - 1]
        w[s1.next.col][row] = w[s2.current.col][row]
        w[s2.next.col][row] = (w[s2.current.col][row]
                               + w[s1.current.col][row]) % R
    return circuit, TraceWitness(columns=w)


def test_sharded_engine_full_prove_byte_identical():
    """The north-star multi-chip milestone: a FULL HyperPlonk prove through
    the ShardedEngine on the 8-device mesh produces byte-identical proof
    wire bytes to the host prover, and verifies."""
    from quill_tpu.engine.host import HostEngine
    from quill_tpu.parallel import mesh as mesh_mod
    from quill_tpu.parallel.engine import ShardedEngine
    from quill_tpu.pcs.kzg import KZG
    from quill_tpu.pcs.mlpcs import MultilinearPCS
    from quill_tpu.proof import hyperplonk
    from quill_tpu.proof.hyperplonk import HyperPlonk
    from quill_tpu.utils.proof_io import serialize_proof

    rows = 64
    circuit, trace = _fib_circuit(rows)
    max_degree = circuit.num_cols() * circuit.num_rows()

    def prove_with(engine):
        pcs = MultilinearPCS(KZG.trusted_setup(engine, max_degree, seed=1))
        hp = HyperPlonk.preprocess([circuit], pcs)
        proof = hp.prove([trace])
        hyperplonk.verify(proof, hp.to_vk(), pcs)
        return serialize_proof(proof)

    host_bytes = prove_with(HostEngine())
    mesh = mesh_mod.make_mesh(8)
    sharded_bytes = prove_with(ShardedEngine(mesh, min_device_size=16))
    assert sharded_bytes == host_bytes, \
        "sharded HyperPlonk proof bytes differ from host prover"


def test_sharded_batch_inverse_and_quotient_device_paths():
    """The round-4 device scans (batch inversion + quotient-by-linear) must
    equal the exact host engine, including the padded-tail paths -- and must
    actually run on the SVec (not silently demote)."""
    import jax
    import numpy as np

    from quill_tpu.parallel import mesh as mesh_mod
    from quill_tpu.parallel.engine import ShardedEngine, SVec

    mesh = mesh_mod.make_mesh(8)
    eng = ShardedEngine(mesh)
    rng = random.Random(0)

    for n in (1 << 10, 1000):     # aligned and padded physical widths
        xs = [rng.randrange(1, R) for _ in range(n)]
        v = eng.vec_from_ints(xs)
        assert isinstance(v, SVec)
        out = eng.batch_inverse(v)
        assert isinstance(out, SVec)
        got = [int(g) for g in eng.vec_to_ints(out)]
        assert got == [pow(x, R - 2, R) for x in xs]

    coeffs = [rng.randrange(R) for _ in range(1 << 10)]
    x = rng.randrange(1, R)
    cv = eng.vec_from_ints(coeffs)
    y, q = eng.quotient_by_linear(cv, x)
    yh, qh = eng.host.quotient_by_linear(eng.host.vec_from_ints(coeffs), x)
    assert y == yh
    assert isinstance(q, SVec)
    qi = [int(g) for g in eng.vec_to_ints(q)]
    qhi = [int(g) for g in qh]
    assert qi[:len(qhi)] == qhi
    # q(x)*(X - x) + y must reproduce p -- independent polynomial identity
    check = rng.randrange(R)
    qx = eng.host.poly_eval(eng.host.vec_from_ints(qi), check)
    px = eng.host.poly_eval(eng.host.vec_from_ints(coeffs), check)
    assert (qx * (check - x) + y) % R == px % R
