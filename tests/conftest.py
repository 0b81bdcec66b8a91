"""Test configuration.

Device-path tests run JAX on a virtual 8-device CPU mesh (the TPU engine is
portable XLA; bit-exactness is checked against the host big-int engine, so CPU
execution validates the same programs that run on TPU).  Environment variables
must be set before jax is imported anywhere.
"""

import os
import sys

if not os.environ.get("QUILL_DEVICE_TESTS"):
    # FORCE the CPU platform: the interactive shell presets
    # JAX_PLATFORMS=axon and PYTHONPATH=/root/.axon_site, so a setdefault
    # would silently run the "host" suite against the one real TPU chip --
    # and the 8-device-mesh sharding tests would degrade to a 1-device mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
# Never WRITE the persistent compilation cache from the suite: serializing
# the giant interpret-mode Pallas executables (sc8.round) segfaults the
# process on this host (jax compilation_cache.put_executable_and_time,
# reproduced twice at tests/test_sumcheck8.py).  Reads still hit warm
# entries; within-process compile cost is unchanged.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                      "1000000")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def host_engine():
    from quill_tpu.engine.host import HostEngine

    return HostEngine()
