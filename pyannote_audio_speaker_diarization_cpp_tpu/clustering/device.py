"""On-device agglomerative clustering (SURVEY.md §7 step 5).

The host AHC (clustering/ahc.py, clustering/base.py) is exact and general,
but running it on host costs the single-request pipeline a structural sync:
embeddings travel device->host, clustering runs, and the membership matrix
travels back before the device post-aggregation can start — two tunnel round
trips (~45 ms measured, docs/PERF.md) that dominate the wall clock on a
remote-tunnel TPU. This module runs the ENTIRE stage-3 numeric path on
device, fused after stage 2, so one fetch returns final activations.

Semantics reproduced (pyannote AgglomerativeClustering, reference
clustering/Clustering.py:241-428; C++ port pipeline/src/clustering/
clustering.cpp:417-468 and speakerDiarizer.cpp:2044-2425):

  - L2-normalize embeddings so Euclidean ~ cosine (Clustering.py:319-324).
  - centroid linkage, global-minimum merge order (scipy fast_linkage
    produces the same dendrogram; the in-tree numpy oracle is
    clustering/ahc.py linkage()).
  - fcluster(criterion="distance") at the recipe threshold. Because the
    cut criterion is the per-subtree MAX linkage distance (scipy
    get_max_dist_for_each_cluster; reference clustering.cpp:121-172), the
    criterion is monotone along the tree even under centroid inversions, so
    each leaf's flat cluster is its TOPMOST accepted merge — maintained
    here as a running label during the merge loop, no tree walk needed.
  - min_cluster_size = min(15, max(1, round(0.1 N))) large/small split,
    small clusters reassigned to the nearest large cluster by centroid
    cosine distance (Clustering.py:310-318, 401-426).
  - final centroid assignment of EVERY embedding: soft = 2 - cosine
    distance to the cluster means of the train embeddings, hard = argmax
    (Clustering.py:97-164; speakerDiarizer.cpp:2120-2211).

Early exit: once the global minimum inter-cluster distance exceeds the
threshold, no further merge can ever be accepted — a merge above t gives the
new cluster max-dist > t (unacceptable forever), and distances between
untouched clusters do not change — so the loop stops there instead of
running all R-1 merges.

Known deviations from the host path (documented in docs/PARITY.md):
  - float32 arithmetic (host: float64). Both paths consume the SAME
    f16-rounded embeddings (config.transfer_dtype), so inputs are
    identical; merge decisions can differ only when two inter-cluster
    distances agree to ~1e-6 — the reference itself accepts far larger
    embedding deviations (abs 0.02, README.md:99-101).
  - cluster NUMBERING is partition-equivalent, not identical (host numbers
    by dendrogram-DFS appearance; here by merge-bin index). Every consumer
    is numbering-invariant (DER is Hungarian-matched; turns are sorted by
    time).

The host path remains the oracle and the fallback for: explicit speaker
bounds (the known-num_clusters dendrogram search), row counts above the
static cap, num_large == 0 (the search would trigger), and num_large >
k_max.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DeviceClusterResult(NamedTuple):
    hard: jnp.ndarray  # (R,) int32: cluster id, or -2 for inactive rows
    num_large: jnp.ndarray  # () int32: number of clusters (0 => fall back)


def _pairwise_sq_dists(x: jnp.ndarray) -> jnp.ndarray:
    """(R, d) -> (R, R) squared Euclidean distances, f32 MXU matmul at
    HIGHEST precision (bf16 default would perturb merge order)."""
    sq = jnp.sum(x * x, axis=1)
    gram = jax.lax.dot_general(
        x,
        x,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)


def device_cluster(
    emb: jnp.ndarray,
    valid: jnp.ndarray,
    inactive: jnp.ndarray,
    threshold: float,
    min_cluster_size: int,
    k_max: int,
) -> DeviceClusterResult:
    """Cluster (R, d) f32 embeddings on device; see module docstring.

    valid: (R,) bool — rows that hold a real embedding (not too-short, not
    batch padding). inactive: (R,) bool — rows whose local speaker has zero
    binarized activity (hard := -2, speakerDiarizer.cpp:3166-3191).
    Invalid-but-active rows get cluster 0, matching the host path where
    np.argmax over an all-NaN soft row returns 0.
    """
    R, d = emb.shape
    f32 = jnp.float32
    emb = emb.astype(f32)
    validf = valid.astype(f32)

    # L2 normalize (valid rows; invalid rows zeroed so they never matter)
    norms = jnp.sqrt(jnp.sum(emb * emb, axis=1, keepdims=True))
    embn = jnp.where(valid[:, None], emb / jnp.maximum(norms, 1e-30), 0.0)

    inf = jnp.asarray(jnp.inf, f32)
    D = jnp.sqrt(_pairwise_sq_dists(embn))
    alive0 = valid
    live_pair = alive0[:, None] & alive0[None, :]
    D = jnp.where(live_pair, D, inf)
    D = jnp.where(jnp.eye(R, dtype=bool), inf, D)

    state = dict(
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        D=D,
        centroids=embn,
        size=validf,
        alive=alive0,
        # slot currently holding each leaf's cluster
        leaf_slot=jnp.arange(R, dtype=jnp.int32),
        # max linkage distance inside each slot's subtree (fcluster crit)
        maxd=jnp.zeros(R, f32),
        # topmost ACCEPTED merge containing each leaf (bin id in [0, 2R))
        rep=jnp.arange(R, dtype=jnp.int32),
    )

    thr = jnp.asarray(threshold, f32)

    def cond(s):
        return (~s["done"]) & (s["it"] < R - 1)

    def body(s):
        D = s["D"]
        flat = jnp.argmin(D)
        i, j = flat // R, flat % R
        i, j = jnp.minimum(i, j), jnp.maximum(i, j)
        dmin = D[i, j]
        # stop when nothing below the threshold remains: later merges can
        # never be accepted (see module docstring), so rep is final
        ok = dmin <= thr
        i = i.astype(jnp.int32)
        j = j.astype(jnp.int32)

        ni, nj = s["size"][i], s["size"][j]
        newc = (ni * s["centroids"][i] + nj * s["centroids"][j]) / jnp.maximum(
            ni + nj, 1.0
        )
        newmax = jnp.maximum(dmin, jnp.maximum(s["maxd"][i], s["maxd"][j]))
        accepted = ok & (newmax <= thr)

        leaf_slot = jnp.where(ok & (s["leaf_slot"] == j), i, s["leaf_slot"])
        merged = leaf_slot == i
        rep = jnp.where(accepted & merged, R + s["it"], s["rep"])

        centroids = s["centroids"].at[i].set(jnp.where(ok, newc, s["centroids"][i]))
        size = s["size"].at[i].set(jnp.where(ok, ni + nj, ni))
        size = size.at[j].set(jnp.where(ok, 0.0, nj))
        alive = s["alive"].at[j].set(s["alive"][j] & ~ok)
        maxd = s["maxd"].at[i].set(jnp.where(ok, newmax, s["maxd"][i]))

        # recompute slot i's centroid distances (Lance-Williams centroid
        # update is exactly "distance to the new weighted-mean centroid")
        diff = centroids - centroids[i]
        row = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        row = jnp.where(alive, row, inf).at[i].set(inf)
        row = jnp.where(ok, row, D[i, :])
        dead_row = jnp.where(ok, jnp.full(R, inf, f32), D[j, :])
        D = D.at[i, :].set(row).at[:, i].set(row)
        D = D.at[j, :].set(dead_row).at[:, j].set(dead_row)

        return dict(
            it=s["it"] + 1,
            done=~ok,
            D=D,
            centroids=centroids,
            size=size,
            alive=alive,
            leaf_slot=leaf_slot,
            maxd=maxd,
            rep=rep,
        )

    s = jax.lax.while_loop(cond, body, state)
    rep = s["rep"]

    # ---- large/small split over the 2R label bins ----
    nbins = 2 * R
    counts = jnp.zeros(nbins, f32).at[rep].add(validf)
    n_valid = jnp.sum(validf)
    mcs = jnp.minimum(
        jnp.asarray(float(min_cluster_size), f32),
        jnp.maximum(1.0, jnp.rint(0.1 * n_valid)),
    )
    is_large = (counts >= mcs) & (counts > 0.0)
    num_large = jnp.sum(is_large.astype(jnp.int32))

    # per-bin centroids of the NORMALIZED embeddings (the host reassignment
    # uses the normalized matrix, clustering/base.py cluster())
    csum = jnp.zeros((nbins, d), f32).at[rep].add(embn * validf[:, None])
    bin_cent = csum / jnp.maximum(counts, 1.0)[:, None]
    bn = jnp.sqrt(jnp.sum(bin_cent * bin_cent, axis=1))
    sim = jax.lax.dot_general(
        bin_cent,
        bin_cent,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ) / jnp.maximum(bn[:, None] * bn[None, :], 1e-30)
    cosd = 1.0 - sim
    nearest_large = jnp.argmin(
        jnp.where(is_large[None, :], cosd, inf), axis=1
    ).astype(jnp.int32)
    is_small = (counts > 0.0) & ~is_large
    final_bin = jnp.where(
        is_small, nearest_large, jnp.arange(nbins, dtype=jnp.int32)
    )
    label_bin = final_bin[rep]  # (R,) bin of each leaf, all bins large

    # consecutive ids in bin-index order (partition-equivalent numbering)
    bin_rank = (jnp.cumsum(is_large.astype(jnp.int32)) - 1).astype(jnp.int32)
    label = jnp.clip(bin_rank[label_bin], 0, k_max - 1)

    # ---- pyannote centroid assignment over the RAW embeddings ----
    # (Clustering.py:97-164: centroids are means of the unnormalized train
    # embeddings; every row re-assigned by cosine, even AHC-labelled ones)
    asum = jnp.zeros((k_max, d), f32).at[label].add(emb * validf[:, None])
    acnt = jnp.zeros(k_max, f32).at[label].add(validf)
    acent = asum / jnp.maximum(acnt, 1.0)[:, None]
    an = jnp.sqrt(jnp.sum(acent * acent, axis=1))
    rsim = jax.lax.dot_general(
        emb,
        acent,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ) / jnp.maximum(
        jnp.sqrt(jnp.sum(emb * emb, axis=1))[:, None] * an[None, :], 1e-30
    )
    k_idx = jnp.arange(k_max, dtype=jnp.int32)
    rsim = jnp.where((k_idx[None, :] < num_large) & (acnt[None, :] > 0), rsim, -inf)
    hard_assign = jnp.argmax(rsim, axis=1).astype(jnp.int32)

    hard = jnp.where(valid, hard_assign, 0)
    hard = jnp.where(inactive, -2, hard)
    return DeviceClusterResult(hard=hard, num_large=num_large)
