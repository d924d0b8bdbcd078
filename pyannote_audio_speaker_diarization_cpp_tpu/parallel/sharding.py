"""Data-parallel collectives for the embedding gather.

Chunk batches shard over the mesh's "data" axis via the in-jit constraints
inside the pipeline stages (pipelines/diarization.py `_build_steps`); XLA
inserts the ICI-riding collectives — there is nothing NCCL-like to port from
the reference because the reference is single-process (SURVEY.md section
2.3). This module holds the one standalone collective the design needs:
gathering the tiny (N, 192) embedding matrix to every device before global
clustering.
"""

from __future__ import annotations

import jax

from .mesh import replicated


def all_gather_embeddings(embeddings, mesh: jax.sharding.Mesh):
    """Gather per-device embedding shards to every device for global
    clustering: one jitted identity with replicated output sharding — XLA
    emits the all-gather over ICI/DCN. The in-pipeline equivalent is the
    replicate constraint on stage-2 outputs (pipelines/diarization.py)."""

    gather = jax.jit(lambda x: x, out_shardings=replicated(mesh))
    return gather(embeddings)
