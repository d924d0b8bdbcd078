"""Device-mesh helpers.

The reference has no distribution at all (SURVEY.md section 2.3); scaling here
is greenfield TPU design: audio chunks shard data-parallel across chips
("data" axis), models replicate (PyanNet ~1.5M + ECAPA ~20M params), and the
tiny (N, 192) embedding matrix is allgathered for global clustering.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS
) -> jax.sharding.Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return jax.sharding.Mesh(np.array(devices), (axis,))


def batch_spec(mesh: jax.sharding.Mesh, ndim: int, axis: str = DATA_AXIS):
    """NamedSharding that splits the leading (batch) axis over the mesh."""
    spec = jax.sharding.PartitionSpec(axis, *([None] * (ndim - 1)))
    return jax.sharding.NamedSharding(mesh, spec)


def replicated(mesh: jax.sharding.Mesh):
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
