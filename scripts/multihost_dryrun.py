"""Multi-host program shape: 2-process jax.distributed sumcheck round.

SURVEY §2.4 / north-star "N >= 2 hosts": demonstrates the EXACT program the
multi-host prover runs -- the fused sumcheck round (message evaluation at
t = 0..deg) over a {host x device} mesh, with the element axis of every MLE
table sharded over BOTH axes.  The jnp.sum over the sharded element axis
lowers to a two-stage psum: intra-host over the "x" axis (ICI on a real
slice) and cross-host over the "host" axis (DCN).  Byte-level exactness is
asserted against the single-process host oracle.

No multi-host hardware exists in this environment, so the two "hosts" are
two OS processes coordinated by jax.distributed over localhost, each with 4
virtual CPU devices (the same GSPMD partitioning that spans real hosts --
process boundaries are exactly what jax.distributed abstracts).

Usage:
    python scripts/multihost_dryrun.py            # spawns both processes
    python scripts/multihost_dryrun.py --rank k   # internal child entry
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROC = 2
LOCAL_DEVICES = 4
PORT = int(os.environ.get("QUILL_MULTIHOST_PORT", "12355"))

N_VARS = 12          # 4096-element tables
DEGREE = 3


def _expr():
    from quill_tpu.piops.virtual_poly import Const, Input

    return (Input(0) * Input(1) - Input(2)) * Input(3) + Const(5) * Input(0)


def _tables(n: int):
    import random

    from quill_tpu.fields.bn254 import R

    rng = random.Random(42)
    return [[rng.randrange(R) for _ in range(n)] for _ in range(4)]


def child(rank: int) -> None:
    import jax

    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=NPROC, process_id=rank)
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES, \
        f"expected {NPROC * LOCAL_DEVICES} global devices, got {len(jax.devices())}"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from quill_tpu.engine.host import HostEngine
    from quill_tpu.fields import device as fd
    from quill_tpu.fields.bn254 import R
    from quill_tpu.fields.limbs import ints_to_limbs
    from quill_tpu.parallel.sharded import build_round_fn

    expr = _expr()
    used = tuple(sorted(expr.used_inputs()))
    tables = _tables(1 << N_VARS)

    # {host x device} mesh: axis "host" spans processes (DCN on real
    # hardware), axis "x" spans each host's local chips (ICI)
    devs = np.array(jax.devices()).reshape(NPROC, LOCAL_DEVICES)
    mesh = Mesh(devs, ("host", "x"))
    sh = NamedSharding(mesh, P(None, None, ("host", "x")))

    # stacked (22, k, N) Montgomery tables, element axis split host-major
    # (high index bits -> host, next bits -> device: LSB folds stay local)
    mont = (1 << fd.R_BITS) % R
    full = np.stack([ints_to_limbs([x * mont % R for x in t])
                     for t in tables], axis=1)  # (22, k, N)
    garr = jax.make_array_from_callback(
        full.shape, sh, lambda idx: jnp.asarray(full[idx]))

    _, const_vals = expr.key()
    consts = (np.stack([ints_to_limbs([c * mont % R]) for c in const_vals],
                       axis=0) if const_vals
              else np.zeros((0, fd.L, 1), np.int32))
    messages, _fold = build_round_fn(expr, used, DEGREE)
    msums = jax.jit(messages)(garr, jnp.asarray(consts))   # (T, 22) lazy

    from quill_tpu.engine.device import _lazy_to_int

    got = [_lazy_to_int(np.asarray(jax.device_get(msums), np.int64)[t])
           for t in range(DEGREE + 1)]

    host = HostEngine()
    hvecs = [None] * 4
    for i in used:
        hvecs[i] = host.vec_from_ints(tables[i])
    want = host.sumcheck_messages(hvecs, expr, DEGREE)
    assert got == want, f"rank {rank}: sharded messages != host oracle"
    print(f"rank {rank}: {NPROC}x{LOCAL_DEVICES} {{host x device}} mesh, "
          f"round messages exact == host oracle", flush=True)


def parent() -> None:
    here = os.path.abspath(__file__)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(here))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and ".axon_site" not in p])
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    env["XLA_FLAGS"] = " ".join(flags)
    procs = [subprocess.Popen([sys.executable, here, "--rank", str(k)],
                              env=env)
             for k in range(NPROC)]
    rcs = [p.wait() for p in procs]
    assert all(rc == 0 for rc in rcs), f"child exit codes {rcs}"
    print("multihost_dryrun: OK (2 processes, 8 global devices, exact)")


if __name__ == "__main__":
    if "--rank" in sys.argv:
        child(int(sys.argv[sys.argv.index("--rank") + 1]))
    else:
        parent()
