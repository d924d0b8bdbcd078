"""On-device agglomerative clustering (SURVEY.md §7 step 5).

The host AHC (clustering/ahc.py, clustering/base.py) is exact and general,
but running it on host costs the single-request pipeline a structural sync:
embeddings travel device->host, clustering runs, and the membership matrix
travels back before the device post-aggregation can start — two tunnel round
trips (~45 ms measured, docs/PERF.md) that dominate the wall clock on a
remote-tunnel TPU. This module runs the ENTIRE stage-3 numeric path on
device, fused after stage 2, so one fetch returns final activations.

Semantics reproduced (pyannote AgglomerativeClustering, reference
clustering/Clustering.py:8-428; C++ port pipeline/src/clustering/
clustering.cpp:417-468 and speakerDiarizer.cpp:2044-2425):

  - the pyannote TRAIN-SET CAP (Clustering.py:12-18, 69-76): when more than
    ``train_cap`` (default 1000) valid embeddings exist, AHC runs on an
    evenly-strided subsample and every embedding is then assigned to the
    learned centroids. The host path applies the SAME deterministic strided
    selection (clustering/base.py filter_embeddings), so both paths cluster
    the identical train set (pyannote itself selects with the unseeded
    global ``random`` module — any deterministic choice is within its own
    semantic variance).
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
  - min_cluster_size = min(15, max(1, round(0.1 N_train))) large/small
    split, small clusters reassigned to the nearest large cluster by
    centroid cosine distance (Clustering.py:310-318, 401-426).
  - final centroid assignment of EVERY embedding: soft = 2 - cosine
    distance to the cluster means of the train embeddings, hard = argmax
    (Clustering.py:97-164; speakerDiarizer.cpp:2120-2211).

The merge loop keeps a maintained (T, T) inter-cluster distance matrix
and performs one verified global-minimum merge per iteration, where T is
bounded by the train cap — the cap, not loop asymptotics, is what makes
stage 3 affordable at any audio length. Two lazy nearest-neighbor
variants (Müllner-style exactness flags, the invariant scipy's
fast_linkage and our runtime/native/sdtpu_native.cc exploit; and a
bounds-only design with pending merges) were built and MEASURED SLOWER on
the chip at every cap-permitted size, because per-iteration cost on this
TPU is per-op sequencer overhead, not bytes (~0.8 us per fused op in a
while body; docs/PERF.md round-5 experiment table).

Early exit: once the verified global minimum inter-cluster distance
exceeds the threshold, no further merge can ever be accepted — a merge
above t gives the new cluster max-dist > t (unacceptable forever), and
distances between untouched clusters do not change — so the loop stops
there instead of running all T-1 merges.

Known deviations from the host path (documented in docs/PARITY.md):
  - float32 arithmetic (host: float64). Both paths consume the SAME
    f16-rounded embeddings (config.transfer_dtype), so inputs are
    identical; merge decisions can differ only when two inter-cluster
    distances agree to ~1e-6 — the reference itself accepts far larger
    embedding deviations (abs 0.02, README.md:99-101). The measured
    divergence rate near the threshold is in docs/PARITY.md deviation 4.
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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class DeviceClusterResult(NamedTuple):
    hard: jnp.ndarray  # (R,) int32: cluster id, or -2 for inactive rows
    num_large: jnp.ndarray  # () int32: number of clusters (0 => fall back)


def _pairwise_sq_dists(x: jnp.ndarray) -> jnp.ndarray:
    """(T, d) -> (T, T) squared Euclidean distances, f32 MXU matmul at
    HIGHEST precision (bf16 default would perturb merge order)."""
    sq = jnp.sum(x * x, axis=1)
    gram = jax.lax.dot_general(
        x,
        x,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)


def _dist_row(centroids: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Exact Euclidean distances from one centroid to every slot — the ONLY
    distance formula the merge loop uses (recompute and merge paths must
    agree bit-for-bit for the exact-flag bookkeeping to be sound)."""
    diff = centroids - c[None, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def select_train_rows(valid: jnp.ndarray, train_size: int, train_cap: int):
    """Evenly-strided selection of up to ``train_cap`` valid rows.

    Mirrors the host selection exactly (clustering/base.py
    filter_embeddings: keep[k] = floor(k * N / K) over valid rows in
    order): rank valid rows 0..N-1, pick ranks floor(k*N/K) for
    k < K = min(N, train_cap). When N <= train_cap this reduces to "all
    valid rows, packed to the front" — identical to the uncapped host
    train set. Returns (sel (train_size,) int32 row indices,
    tvalid (train_size,) bool, K () int32).
    """
    R = valid.shape[0]
    vi = valid.astype(jnp.int32)
    rank = jnp.cumsum(vi) - vi  # 0-based rank among valid rows
    n_valid = jnp.sum(vi)
    K = jnp.minimum(n_valid, jnp.asarray(train_cap, jnp.int32))
    # row index holding each rank (scatter; invalid rows dropped)
    idx_of_rank = (
        jnp.zeros(R, jnp.int32)
        .at[jnp.where(valid, rank, R)]
        .set(jnp.arange(R, dtype=jnp.int32), mode="drop")
    )
    k = jnp.arange(train_size, dtype=jnp.int32)
    t = (k * n_valid) // jnp.maximum(K, 1)
    sel = idx_of_rank[jnp.clip(t, 0, R - 1)]
    tvalid = k < K
    return sel, tvalid, K


def _linkage_labels(
    embt: jnp.ndarray,
    tvalid: jnp.ndarray,
    threshold: float,
):
    """Centroid-linkage merge loop over (T, d) L2-normalized train rows.

    Returns rep (T,) int32 — each row's topmost accepted merge bin in
    [0, 2T), giving the fcluster(distance) partition.

    Design: a maintained (T, T) inter-cluster distance matrix with a
    global-minimum merge per iteration. Three designs were MEASURED on the
    chip (docs/PERF.md round-5 experiment table): per-iteration cost on
    this TPU is dominated by per-op sequencer overhead (~0.8 us/fused op
    in a while body), not bytes, so the two "asymptotically better" lazy
    nearest-neighbor variants (Mullner-style exactness flags; bounds-only
    with pending merges) lost to this ~13-op body at every size the
    1000-row pyannote train cap allows. The one change vs the round-4
    body: the global argmin is a single-pass row-min reduction + two tiny
    argmins instead of a flat (T*T) argmin (one matrix read, not two).

    Early exit: once the global minimum exceeds the threshold the loop
    stops (see module docstring).
    """
    T, d = embt.shape
    f32 = jnp.float32
    inf = jnp.asarray(jnp.inf, f32)
    thr = jnp.asarray(threshold, f32)
    validf = tvalid.astype(f32)

    iota = jnp.arange(T, dtype=jnp.int32)
    D0 = jnp.sqrt(_pairwise_sq_dists(embt))
    live_pair = tvalid[:, None] & tvalid[None, :]
    D0 = jnp.where(live_pair, D0, inf)
    D0 = jnp.where(jnp.eye(T, dtype=bool), inf, D0)

    state = dict(
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        D=D0,
        # per-row minima of D, maintained across iterations so the global
        # argmin costs two (T,)-sized reductions, not a matrix scan
        rowmins=jnp.min(D0, axis=1),
        centroids=embt,
        size=validf,
        alive=tvalid,
        # slot currently holding each leaf's cluster
        leaf_slot=iota,
        # max linkage distance inside each slot's subtree (fcluster crit)
        maxd=jnp.zeros(T, f32),
        # topmost ACCEPTED merge containing each leaf (bin id in [0, 2T))
        rep=iota,
    )

    def cond(s):
        return (~s["done"]) & (s["it"] < T - 1)

    def body(s):
        D = s["D"]
        i0 = jnp.argmin(s["rowmins"]).astype(jnp.int32)
        j0 = jnp.argmin(D[i0]).astype(jnp.int32)
        i, j = jnp.minimum(i0, j0), jnp.maximum(i0, j0)
        dmin = s["rowmins"][i0]
        # stop when nothing below the threshold remains: later merges can
        # never be accepted (see module docstring), so rep is final
        ok = dmin <= thr

        ni, nj = s["size"][i], s["size"][j]
        newc = (ni * s["centroids"][i] + nj * s["centroids"][j]) / jnp.maximum(
            ni + nj, 1.0
        )
        newmax = jnp.maximum(dmin, jnp.maximum(s["maxd"][i], s["maxd"][j]))
        accepted = ok & (newmax <= thr)

        leaf_slot = jnp.where(ok & (s["leaf_slot"] == j), i, s["leaf_slot"])
        merged = leaf_slot == i
        rep = jnp.where(accepted & merged, T + s["it"], s["rep"])

        centroids = s["centroids"].at[i].set(jnp.where(ok, newc, s["centroids"][i]))
        size = s["size"].at[i].set(jnp.where(ok, ni + nj, ni))
        size = size.at[j].set(jnp.where(ok, 0.0, nj))
        alive = s["alive"].at[j].set(s["alive"][j] & ~ok)
        maxd = s["maxd"].at[i].set(jnp.where(ok, newmax, s["maxd"][i]))

        # recompute slot i's centroid distances (Lance-Williams centroid
        # update is exactly "distance to the new weighted-mean centroid")
        row = _dist_row(centroids, centroids[i])
        row = jnp.where(alive, row, inf).at[i].set(inf)
        row = jnp.where(ok, row, D[i, :])

        # ONE fused masked-select pass rewrites rows/columns i and j and
        # re-derives the row minima in the same matrix traversal — the
        # round-4 four-scatter formulation made XLA copy the matrix twice
        # per iteration (measured 32 -> 21 ms at the 1024-row cap)
        mi = iota == i
        mjv = (iota == j) & ok
        Dn = jnp.where(mi[:, None], row[None, :], D)
        Dn = jnp.where(mi[None, :], row[:, None], Dn)
        Dn = jnp.where(mjv[:, None], inf, Dn)
        Dn = jnp.where(mjv[None, :], inf, Dn)
        rowmins = jnp.min(Dn, axis=1)

        return dict(
            it=s["it"] + 1,
            done=~ok,
            D=Dn,
            rowmins=rowmins,
            centroids=centroids,
            size=size,
            alive=alive,
            leaf_slot=leaf_slot,
            maxd=maxd,
            rep=rep,
        )

    s = jax.lax.while_loop(cond, body, state)
    return s["rep"]


def device_cluster(
    emb: jnp.ndarray,
    valid: jnp.ndarray,
    inactive: jnp.ndarray,
    threshold: float,
    min_cluster_size: int,
    k_max: int,
    train_cap: Optional[int] = 1000,
    train_size: Optional[int] = None,
) -> DeviceClusterResult:
    """Cluster (R, d) f32 embeddings on device; see module docstring.

    valid: (R,) bool — rows that hold a real embedding (not too-short, not
    batch padding). inactive: (R,) bool — rows whose local speaker has zero
    binarized activity (hard := -2, speakerDiarizer.cpp:3166-3191).
    Invalid-but-active rows get cluster 0, matching the host path where
    np.argmax over an all-NaN soft row returns 0.

    train_cap: the pyannote AHC train-set cap (Clustering.py:12-18);
    None clusters every valid row (requires R small enough to afford the
    merge loop — the pipeline gates that). train_size: static size of the
    train buffer; defaults to min(R, next multiple of 128 >= train_cap).
    """
    R, d = emb.shape
    f32 = jnp.float32
    emb = emb.astype(f32)
    validf = valid.astype(f32)

    if train_cap is None:
        train_cap = R
    if train_size is None:
        train_size = min(R, -(-train_cap // 128) * 128)
    T = train_size

    # L2 normalize (valid rows; invalid rows zeroed so they never matter)
    norms = jnp.sqrt(jnp.sum(emb * emb, axis=1, keepdims=True))
    embn = jnp.where(valid[:, None], emb / jnp.maximum(norms, 1e-30), 0.0)

    # ---- train-set selection (host-identical strided subsample) ----
    sel, tvalid, K = select_train_rows(valid, T, train_cap)
    embt = jnp.where(tvalid[:, None], embn[sel], 0.0)
    tvalidf = tvalid.astype(f32)

    # ---- centroid-linkage merge loop + threshold cut ----
    rep = _linkage_labels(embt, tvalid, threshold)

    inf = jnp.asarray(jnp.inf, f32)

    # ---- large/small split over the 2T label bins ----
    # (counts and the min-size shrink use the TRAIN set, Clustering.py:
    # 306-318 — num_embeddings there is the post-cap count)
    nbins = 2 * T
    counts = jnp.zeros(nbins, f32).at[rep].add(tvalidf)
    mcs = jnp.minimum(
        jnp.asarray(float(min_cluster_size), f32),
        jnp.maximum(1.0, jnp.rint(0.1 * K.astype(f32))),
    )
    is_large = (counts >= mcs) & (counts > 0.0)
    num_large = jnp.sum(is_large.astype(jnp.int32))

    # per-bin centroids of the NORMALIZED train embeddings (the host
    # reassignment uses the normalized matrix, clustering/base.py cluster())
    csum = jnp.zeros((nbins, d), f32).at[rep].add(embt * tvalidf[:, None])
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
    label_bin = final_bin[rep]  # (T,) bin of each train row, all bins large

    # consecutive ids in bin-index order (partition-equivalent numbering)
    bin_rank = (jnp.cumsum(is_large.astype(jnp.int32)) - 1).astype(jnp.int32)
    label = jnp.clip(bin_rank[label_bin], 0, k_max - 1)

    # ---- pyannote centroid assignment over the RAW embeddings ----
    # (Clustering.py:97-164: centroids are means of the unnormalized TRAIN
    # embeddings; every row re-assigned by cosine, even AHC-labelled ones)
    embr = jnp.where(tvalid[:, None], emb[sel], 0.0)
    asum = jnp.zeros((k_max, d), f32).at[label].add(embr * tvalidf[:, None])
    acnt = jnp.zeros(k_max, f32).at[label].add(tvalidf)
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
