"""Measure the on-device clustering stage-3 scaling on the real chip
(VERDICT r4 item 1: device stage-3 time at the raised row cap must beat
the host path's two tunnel round trips, ~45 ms).

Times the jitted device_cluster (train-capped maintained-matrix merge
loop + assignment, clustering/device.py) standalone at several row
counts, amortized over back-to-back dispatches.

Usage: python scripts/profile_device_clustering.py [N_REPEAT]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyannote_audio_speaker_diarization_cpp_tpu.clustering.device import (
    device_cluster,
)
from pyannote_audio_speaker_diarization_cpp_tpu.config import ClusteringConfig


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    thr = ClusteringConfig().threshold
    print(f"backend: {jax.default_backend()}")
    jit_cluster = jax.jit(device_cluster, static_argnums=(3, 4, 5))

    for rows in (384, 768, 1536, 3072, 6144):
        r = np.random.default_rng(rows)
        K = 5
        centers = r.normal(size=(K, 192)) * 4
        owner = r.integers(0, K, size=rows)
        emb = centers[owner] + 0.05 * r.normal(size=(rows, 192))
        emb = emb.astype(np.float16).astype(np.float32)
        valid = r.random(rows) < 0.9
        emb_d = jax.device_put(jnp.asarray(emb))
        valid_d = jax.device_put(jnp.asarray(valid))
        inact_d = jax.device_put(jnp.asarray(~valid))

        res = jit_cluster(emb_d, valid_d, inact_d, thr, 15, 8)
        np.asarray(res.hard)  # real sync: block_until_ready is unreliable
        t0 = time.perf_counter()
        for _ in range(n_rep):
            res = jit_cluster(emb_d, valid_d, inact_d, thr, 15, 8)
        np.asarray(res.hard)
        t = (time.perf_counter() - t0) / n_rep
        print(
            f"rows {rows:5d} (train <=1000): device_cluster amortized "
            f"{t*1e3:7.2f} ms incl fetch/n, num_large={int(res.num_large)}"
        )


if __name__ == "__main__":
    main()
