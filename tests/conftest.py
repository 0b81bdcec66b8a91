"""Test configuration.

Device-path tests run JAX on a virtual 8-device CPU mesh (the TPU engine is
portable XLA; bit-exactness is checked against the host big-int engine, so CPU
execution validates the same programs that run on TPU).  Environment variables
must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def host_engine():
    from quill_tpu.engine.host import HostEngine

    return HostEngine()
