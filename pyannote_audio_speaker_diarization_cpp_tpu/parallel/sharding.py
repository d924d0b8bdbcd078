"""Data-parallel sharding of pipeline device steps.

Chunk batches shard over the mesh's "data" axis; parameters replicate. XLA
inserts the (ICI-riding) collectives — there is nothing NCCL-like to port
from the reference because the reference is single-process (SURVEY.md
section 2.3); this module IS the distribution design.
"""

from __future__ import annotations

from typing import Callable

import jax

from .mesh import batch_spec, replicated


def shard_batch_step(fn: Callable, mesh: jax.sharding.Mesh) -> Callable:
    """Wrap ``fn(params, *batch_arrays)`` so the batch axis is sharded over
    ``mesh`` and params are replicated. Output shardings are left to XLA
    (batch-sharded results flow back into host concatenation)."""

    def wrapped(params, *arrays):
        params = jax.lax.with_sharding_constraint(
            params, replicated(mesh)
        )
        arrays = tuple(
            jax.lax.with_sharding_constraint(a, batch_spec(mesh, a.ndim))
            for a in arrays
        )
        return fn(params, *arrays)

    return wrapped


def all_gather_embeddings(embeddings, mesh: jax.sharding.Mesh):
    """Gather per-host embedding shards to every device for global
    clustering: one jitted identity with replicated output sharding — XLA
    emits the all-gather over ICI/DCN."""

    gather = jax.jit(lambda x: x, out_shardings=replicated(mesh))
    return gather(embeddings)
