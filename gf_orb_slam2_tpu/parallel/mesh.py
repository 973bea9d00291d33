"""Device mesh helpers for multi-chip scaling.

The reference has NO distribution (single process, SURVEY.md §2.3 P9/—);
this layer is the new TPU-native scaling design: keyframes/map-point blocks
sharded over a `jax.sharding.Mesh`, Schur-complement reductions as `psum`
over ICI, pose solve replicated (BASELINE.md north star: ≥70% weak-scaling
efficiency of distributed BA).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

DP_AXIS = "dp"  # map points / observations sharded over this axis


def make_mesh(n_devices: int | None = None, axis: str = DP_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_points(mesh: Mesh, arr, axis: str = DP_AXIS):
    """Place a point-major array with its leading dim sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
