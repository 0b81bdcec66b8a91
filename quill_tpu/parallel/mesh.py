"""Device-mesh helpers for multi-chip execution.

The hypercube-sharding story (SURVEY §2.4): MLE tables are sharded over the
*element* axis with the mesh axis mapped to the HIGH index bits, so the
sumcheck's LSB-variable binding (`sumcheck.rs:54-63`) pairs adjacent elements
that always live on the same shard; per-round message sums reduce over the
mesh with one psum of (deg+1) x 22 lazy limb counters; MSM partitions point
batches across devices with per-device partial window sums.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (axis,), devices=devs)


def shard_elements(mesh: Mesh, axis: str = "x") -> NamedSharding:
    """Sharding for (22, N) limb arrays: limbs replicated, elements split."""
    return NamedSharding(mesh, P(None, axis))


def shard_tables(mesh: Mesh, axis: str = "x") -> NamedSharding:
    """Sharding for (k, 22, N) stacked tables."""
    return NamedSharding(mesh, P(None, None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
