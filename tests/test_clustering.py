"""AHC vs scipy, and clustering orchestration semantics."""

import numpy as np
import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.clustering import ahc
from pyannote_audio_speaker_diarization_cpp_tpu.clustering import base as cb
from pyannote_audio_speaker_diarization_cpp_tpu.config import ClusteringConfig

scipy_h = pytest.importorskip("scipy.cluster.hierarchy")
from scipy.spatial.distance import cdist  # noqa: E402


def same_partition(a, b):
    """Label-permutation-invariant partition equality."""
    a, b = np.asarray(a), np.asarray(b)
    if a.shape != b.shape:
        return False
    pairs = {}
    for x, y in zip(a, b):
        if x in pairs and pairs[x] != y:
            return False
        pairs[x] = y
    return len(set(pairs.values())) == len(pairs)


@pytest.mark.parametrize("method", ["centroid", "single", "complete", "average", "ward"])
@pytest.mark.parametrize("seed", [0, 1])
def test_linkage_matches_scipy(method, seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(40, 8))
    ours = ahc.linkage(X, method=method)
    theirs = scipy_h.linkage(X, method=method, metric="euclidean")
    # merge distances and sizes must coincide (merge order may permute only
    # among exactly-equal distances, absent here)
    np.testing.assert_allclose(ours[:, 2], theirs[:, 2], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(ours[:, 3], theirs[:, 3])
    np.testing.assert_array_equal(ours[:, :2], theirs[:, :2])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fcluster_distance_matches_scipy_centroid(seed):
    rng = np.random.default_rng(seed)
    # clustered data resembling L2-normalized speaker embeddings
    centers = rng.normal(size=(4, 16))
    X = np.vstack([c + 0.3 * rng.normal(size=(25, 16)) for c in centers])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Z_s = scipy_h.linkage(X, method="centroid", metric="euclidean")
    Z_o = ahc.linkage(X, method="centroid")
    for t in [0.3, 0.5, 0.7153814381597874, 1.0, 1.5]:
        theirs = scipy_h.fcluster(Z_s, t, criterion="distance") - 1
        ours = ahc.fcluster_distance(Z_o, t)
        assert same_partition(ours, theirs), (seed, t)


def test_fcluster_handles_singletons():
    X = np.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0]])
    Z = ahc.linkage(X, method="centroid")
    labels = ahc.fcluster_distance(Z, 0.5)
    assert same_partition(labels, [0, 0, 1])


def test_reference_cluster_demo():
    """The reference's standalone AHC test: 12 fixed 2-D points, cutoff 1.1
    (reference pipeline/src/clustering/cluster.cpp:6-24) — three groups."""
    pts = np.array(
        [
            [1.0, 1.0], [1.2, 1.1], [0.9, 0.95], [1.1, 1.05],
            [5.0, 5.0], [5.2, 5.1], [4.9, 4.95], [5.1, 5.05],
            [9.0, 1.0], [9.2, 1.1], [8.9, 0.95], [9.1, 1.05],
        ]
    )
    labels = ahc.cluster(pts, threshold=1.1)
    expected = scipy_h.fcluster(
        scipy_h.linkage(pts, method="centroid"), 1.1, criterion="distance"
    ) - 1
    assert same_partition(labels, expected)
    assert len(np.unique(labels)) == 3


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def _fake_embeddings(rng, num_chunks=30, num_speakers=3, dim=32, n_clusters=4):
    centers = rng.normal(size=(n_clusters, dim)) * 3
    emb = np.full((num_chunks, num_speakers, dim), np.nan)
    truth = np.full((num_chunks, num_speakers), -1)
    for c in range(num_chunks):
        for s in range(num_speakers):
            if rng.uniform() < 0.7:
                k = rng.integers(n_clusters)
                emb[c, s] = centers[k] + 0.1 * rng.normal(size=dim)
                truth[c, s] = k
    return emb, truth


def test_filter_embeddings_drops_nan():
    rng = np.random.default_rng(0)
    emb, truth = _fake_embeddings(rng)
    filtered, ci, si = cb.filter_embeddings(emb)
    assert len(filtered) == (truth >= 0).sum()
    assert not np.isnan(filtered).any()


def test_set_num_clusters_bounds():
    assert cb.set_num_clusters(10) == (None, 1, 10)
    assert cb.set_num_clusters(10, num_clusters=3) == (3, 3, 3)
    assert cb.set_num_clusters(10, min_clusters=2, max_clusters=5) == (None, 2, 5)
    assert cb.set_num_clusters(2, min_clusters=5, max_clusters=8) == (2, 2, 2)
    with pytest.raises(ValueError):
        cb.set_num_clusters(10, min_clusters=6, max_clusters=3)


def test_full_clustering_recovers_partition():
    rng = np.random.default_rng(1)
    emb, truth = _fake_embeddings(rng)
    clustering = cb.AgglomerativeClustering(
        ClusteringConfig(threshold=0.7153814381597874, min_cluster_size=3)
    )
    hard, soft = clustering(emb)
    assert hard.shape == truth.shape
    assert soft.shape[:2] == truth.shape
    valid = truth >= 0
    assert same_partition(hard[valid], truth[valid])
    # soft scores are 2 - cosine distance in [0, 2]
    assert np.nanmax(soft) <= 2.0 + 1e-9
    # hard = argmax(soft)
    np.testing.assert_array_equal(hard, np.argmax(soft, axis=2))


def test_clustering_single_cluster_shortcut():
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(5, 3, 16))
    clustering = cb.AgglomerativeClustering()
    hard, soft = clustering(emb, num_clusters=1)
    assert (hard == 0).all()
    assert soft.shape == (5, 3, 1)


def test_clustering_known_num_clusters():
    rng = np.random.default_rng(3)
    emb, truth = _fake_embeddings(rng, n_clusters=4)
    clustering = cb.AgglomerativeClustering(
        ClusteringConfig(threshold=0.7153814381597874, min_cluster_size=2)
    )
    hard, _ = clustering(emb, num_clusters=4)
    valid = truth >= 0
    assert len(np.unique(hard[valid])) == 4


def test_small_cluster_reassignment():
    rng = np.random.default_rng(4)
    dim = 16
    a = rng.normal(size=dim)
    b = rng.normal(size=dim) * -1
    # 58 + 2 points: min_cluster_size heuristic keeps min(5, round(0.1*60)=6)=5,
    # so the 2-member far cluster is "small" and must be absorbed
    X = np.vstack(
        [a + 0.05 * rng.normal(size=(58, dim)), b + 0.05 * rng.normal(size=(2, dim))]
    )
    clustering = cb.AgglomerativeClustering(
        ClusteringConfig(threshold=0.7153814381597874, min_cluster_size=5)
    )
    labels = clustering.cluster(X, min_clusters=1, max_clusters=60)
    # the 2-member cluster is below min_cluster_size -> absorbed into the big one
    assert len(np.unique(labels)) == 1


def test_max_embeddings_cap_default_matches_pyannote():
    """pyannote BaseClustering defaults max_num_embeddings=1000
    (reference clustering/Clustering.py:12-18); the config default and the
    clusterer must follow."""
    assert ClusteringConfig().max_num_embeddings == 1000
    assert cb.AgglomerativeClustering().max_num_embeddings == 1000
    assert (
        cb.AgglomerativeClustering(max_num_embeddings=None).max_num_embeddings
        is None
    )


def test_max_embeddings_cap_subsample_then_assign_all():
    """>1000 embeddings: AHC trains on a 1000-row subsample and every
    embedding is still assigned to a centroid (Clustering.py:69-76 +
    assign_embeddings) — the hour-scale pyannote semantics."""
    from pyannote_audio_speaker_diarization_cpp_tpu.utils.debug_dump import (
        DumpSession,
    )

    rng = np.random.default_rng(0)
    dim, n_chunks = 16, 500
    centers = np.zeros((3, dim))
    centers[0, 0] = centers[1, 5] = centers[2, 10] = 5.0
    labels_true = rng.integers(0, 3, size=n_chunks * 3)
    X = centers[labels_true] + 0.05 * rng.normal(size=(n_chunks * 3, dim))
    emb = X.reshape(n_chunks, 3, dim)

    clusterer = cb.AgglomerativeClustering()
    dump = DumpSession(write_text=False)
    hard, soft = clusterer(emb, dump=dump)
    # the AHC train set was capped, but every embedding got a cluster
    assert dump.tensors["filtered_embeddings"].shape[0] == 1000
    assert hard.shape == (n_chunks, 3)
    assert soft.shape[2] == hard.max() + 1

    # partition equals ground truth up to label permutation
    pred = hard.reshape(-1)
    assert hard.max() + 1 == 3
    mapping = {}
    for k in range(3):
        true_k = labels_true[pred == k]
        mapping[k] = np.bincount(true_k).argmax()
    assert len(set(mapping.values())) == 3
    acc = np.mean([mapping[p] == t for p, t in zip(pred, labels_true)])
    assert acc == 1.0

    # deterministic subsampling: a second run gives the identical result
    hard2, soft2 = clusterer(emb)
    np.testing.assert_array_equal(hard, hard2)
    np.testing.assert_allclose(soft, soft2)
