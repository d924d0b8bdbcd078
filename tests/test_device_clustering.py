"""On-device clustering (clustering/device.py + the fused pipeline stage 3).

The host AHC stack (clustering/ahc.py + clustering/base.py, itself
scipy-parity-tested in test_clustering.py) is the oracle throughout: the
device path must produce PARTITION-EQUAL assignments (cluster numbering is
documented as partition-equivalent, not identical) and the fused pipeline
path must produce the same turns as the host path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _cfg import make_tiny1s_pipeline

from pyannote_audio_speaker_diarization_cpp_tpu.clustering.base import (
    AgglomerativeClustering,
    filter_embeddings,
)
from pyannote_audio_speaker_diarization_cpp_tpu.clustering.device import (
    device_cluster,
    select_train_rows,
)
from pyannote_audio_speaker_diarization_cpp_tpu.config import ClusteringConfig

THRESHOLD = ClusteringConfig().threshold
jit_cluster = jax.jit(device_cluster, static_argnums=(3, 4, 5))


def _host_hard(emb3, nanmask):
    clu = AgglomerativeClustering(ClusteringConfig())
    hard, _ = clu(emb3)
    hard = np.asarray(hard)
    hard[nanmask] = -2
    return hard.reshape(-1)


def _device_hard(emb3, nanmask, k_max=8):
    C, S, d = emb3.shape
    flat = np.nan_to_num(emb3.reshape(-1, d)).astype(np.float32)
    valid = ~nanmask.reshape(-1)
    res = jit_cluster(
        jnp.asarray(flat),
        jnp.asarray(valid),
        jnp.asarray(~valid),
        THRESHOLD,
        15,
        k_max,
    )
    return np.asarray(res.hard), int(res.num_large)


def _partitions_equal(a, b):
    """Same partition up to a label bijection (on rows where both >= 0;
    the -2 rows must match exactly)."""
    if not np.array_equal(a < 0, b < 0):
        return False
    sel = a >= 0
    fwd = {}
    for x, y in zip(a[sel], b[sel]):
        if fwd.setdefault(x, y) != y:
            return False
    return len(set(fwd.values())) == len(fwd)


def _blob_embeddings(rng, num_chunks, K, dim=32, noise=0.05, nan_frac=0.1):
    centers = rng.normal(size=(K, dim)) * 4
    owner = rng.integers(0, K, size=(num_chunks, 3))
    emb = centers[owner] + noise * rng.normal(size=(num_chunks, 3, dim))
    nanmask = rng.random((num_chunks, 3)) < nan_frac
    # device + host consume the same f16-rounded values (transfer_dtype)
    emb = emb.astype(np.float16).astype(np.float64)
    emb[nanmask] = np.nan
    return emb, nanmask


@pytest.mark.parametrize("trial", range(5))
def test_partition_matches_host_separated_blobs(rng, trial):
    r = np.random.default_rng(100 + trial)
    K = int(r.integers(2, 6))
    emb, nanmask = _blob_embeddings(r, int(r.integers(12, 50)), K)
    host = _host_hard(emb, nanmask)
    dev, num_large = _device_hard(emb, nanmask)
    assert num_large == host.max() + 1
    assert _partitions_equal(dev, host)


def test_single_cluster_and_single_valid():
    r = np.random.default_rng(3)
    # everything merges into one cluster (random-weights-like)
    emb = r.normal(size=(1, 48)) + 0.02 * r.normal(size=(18, 3, 48))
    nm = np.zeros((18, 3), bool)
    dev, num_large = _device_hard(emb, nm)
    assert num_large == 1 and set(dev) == {0}
    # exactly one valid embedding
    emb = r.normal(size=(1, 3, 16))
    nm = np.array([[False, True, True]])
    emb[0, 1:] = np.nan
    dev, num_large = _device_hard(emb, nm)
    assert num_large == 1
    assert dev[0] == 0 and (dev[1:] == -2).all()


def test_small_cluster_reassigned_to_nearest_large(rng):
    r = np.random.default_rng(11)
    emb, nm = _blob_embeddings(r, 40, 2, noise=0.05, nan_frac=0.0)
    # 4 outlier rows form a small (< min_cluster_size) far-away cluster
    outlier = r.normal(size=32) * 5
    for idx in [(0, 0), (1, 1), (2, 2), (3, 0)]:
        emb[idx] = outlier + 0.05 * r.normal(size=32)
    host = _host_hard(emb, nm)
    dev, num_large = _device_hard(emb, nm)
    assert num_large == host.max() + 1 == 2
    assert _partitions_equal(dev, host)


def test_num_large_zero_signals_fallback():
    """Diffuse data where the threshold cut leaves only sub-min-size
    clusters: the host runs the dendrogram search; the device path must
    report num_large == 0 so the caller falls back."""
    r = np.random.default_rng(5)
    emb = r.normal(size=(30, 3, 48))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)  # ~orthogonal: no merges
    nm = np.zeros((30, 3), bool)
    _, num_large = _device_hard(emb, nm)
    assert num_large == 0


def test_invalid_but_active_rows_get_cluster_zero():
    """Host semantics: a NaN-embedding row that is NOT inactive gets
    np.argmax over an all-NaN soft row == 0 (clustering/base.py
    assign_embeddings); the device path reproduces it via the valid mask."""
    r = np.random.default_rng(21)
    emb, _ = _blob_embeddings(r, 20, 2, nan_frac=0.0)
    flat = emb.reshape(-1, 32).astype(np.float32)
    valid = np.ones(60, bool)
    valid[5] = False  # too-short but active
    inactive = np.zeros(60, bool)
    res = jit_cluster(
        jnp.asarray(np.nan_to_num(flat)),
        jnp.asarray(valid),
        jnp.asarray(inactive),
        THRESHOLD,
        15,
        8,
    )
    hard = np.asarray(res.hard)
    assert hard[5] == 0


def test_train_selection_matches_host():
    """The device strided train-set selection (select_train_rows) must pick
    EXACTLY the rows the host cap picks (clustering/base.py
    filter_embeddings), for N below, at, and above the cap."""
    r = np.random.default_rng(7)
    for R, cap in [(60, 1000), (1000, 1000), (2500, 1000), (700, 128)]:
        valid = r.random(R) < 0.85
        emb3 = r.normal(size=(R, 1, 8))
        emb3[~valid] = np.nan
        _, ci, _ = filter_embeddings(emb3, max_num_embeddings=cap)
        host_rows = ci  # speaker axis is singleton: chunk idx == row idx
        T = min(R, -(-cap // 128) * 128)
        sel, tvalid, K = jax.jit(select_train_rows, static_argnums=(1, 2))(
            jnp.asarray(valid), T, cap
        )
        sel, tvalid = np.asarray(sel), np.asarray(tvalid)
        assert int(K) == len(host_rows)
        np.testing.assert_array_equal(sel[tvalid], host_rows)


@pytest.mark.parametrize("num_chunks", [400, 768, 1536])
def test_partition_matches_host_capped_sizes(num_chunks):
    """Above the pyannote 1000-row cap both paths cluster the SAME strided
    train subsample, so partitions must stay equal across the raised
    device_cluster_rows range (VERDICT r4 item 1: 1200-4608 rows)."""
    r = np.random.default_rng(num_chunks)
    emb, nanmask = _blob_embeddings(r, num_chunks, 5, dim=192, nan_frac=0.1)
    host = _host_hard(emb, nanmask)
    dev, num_large = _device_hard(emb, nanmask)
    assert num_large == host.max() + 1
    assert _partitions_equal(dev, host)


def _near_threshold_trial(run_pair, kind, seed, param):
    """One device-vs-host trial with inter-cluster distances straddling the
    AHC threshold — the regime the reference itself calls chaos-sensitive
    (reference README.md:99-101). Returns None when the device path would
    fall back (num_large 0 or > k_max), else the Hungarian-matched row
    disagreement fraction."""
    dim = 64
    r = np.random.default_rng(seed)
    g = r.normal(size=dim)
    g /= np.linalg.norm(g)
    if kind == "diffuse":
        # points on a sphere cap sized so pairwise distances sit AT the
        # threshold: cos ~ 1/(1+t^2) with t^2 = thr^2/(2-thr^2) ~ 0.344
        emb = g + (param / np.sqrt(dim)) * r.normal(size=(40, 3, dim))
    else:  # blobs with centers near the critical similarity
        K = 4
        E = r.normal(size=(K, dim))
        E -= np.outer(E @ g, g)
        q, _ = np.linalg.qr(E.T)
        E = q.T[:K]
        centers = np.sqrt(0.744) * g + np.sqrt(1 - 0.744) * E
        owner = r.integers(0, K, size=(40, 3))
        emb = centers[owner] + param * r.normal(size=(40, 3, dim))
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    emb = emb.astype(np.float16).astype(np.float64)
    nan = r.random((40, 3)) < 0.05
    emb3 = emb.copy()
    emb3[nan] = np.nan
    return run_pair(emb3, nan, dim)


def test_device_host_divergence_near_threshold():
    """VERDICT r4 item 5: quantify the f32-vs-f64 partition divergence in
    the chaos-sensitive regime. The full 480-trial sweep measured 0
    divergent partitions out of 336 device-eligible trials (docs/PARITY.md
    deviation 4); this keeps a 60-trial slice under the same bound."""
    from scipy.optimize import linear_sum_assignment

    def run_pair(emb3, nan, dim):
        host = _host_hard(emb3, nan)
        flat = np.nan_to_num(emb3.reshape(-1, dim)).astype(np.float32)
        valid = ~nan.reshape(-1)
        res = jit_cluster(
            jnp.asarray(flat),
            jnp.asarray(valid),
            jnp.asarray(~valid),
            THRESHOLD,
            15,
            8,
        )
        if not 1 <= int(res.num_large) <= 8:
            return None  # pipeline would fall back to host: no deviation
        dev = np.asarray(res.hard)
        sel = host >= 0
        ha, da = host[sel], dev[sel]
        K = max(ha.max() + 1, da.max() + 1, 1)
        C = np.zeros((K, K))
        np.add.at(C, (ha, da), 1)
        ri, ci = linear_sum_assignment(-C)
        return 1.0 - C[ri, ci].sum() / max(len(ha), 1)

    results = []
    for t in (0.50, 0.56, 0.60, 0.64):
        for seed in range(10):
            results.append(
                _near_threshold_trial(run_pair, "diffuse", seed * 13 + int(t * 100), t)
            )
    for noise in (0.08, 0.10):
        for seed in range(10):
            results.append(
                _near_threshold_trial(
                    run_pair, "blob", seed * 977 + int(noise * 1000), noise
                )
            )
    eligible = [d for d in results if d is not None]
    divergent = [d for d in eligible if d > 0]
    assert len(eligible) >= 30
    # measured rate is 0; the bound leaves headroom for platform numerics
    assert len(divergent) / len(eligible) <= 0.05
    assert max(eligible) <= 0.02  # worst-case row disagreement


# ---------------------------------------------------------------------------
# fused pipeline stage 3
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pipelines():
    return (
        make_tiny1s_pipeline(device_clustering="auto"),
        make_tiny1s_pipeline(device_clustering=False),
    )


def _turns(ann):
    return [(round(t.start, 4), round(t.end, 4), t.label) for t in ann.turns()]


def test_pipeline_device_equals_host(pipelines):
    p_dev, p_host = pipelines
    for seconds, seed in [(3, 1), (5, 2), (6, 7)]:
        wav = (
            0.1 * np.random.default_rng(seed).normal(size=seconds * 16000)
        ).astype(np.float32)
        td, th = _turns(p_dev(wav)), _turns(p_host(wav))
        assert [(s, e) for s, e, _ in td] == [(s, e) for s, e, _ in th]
        assert _partitions_equal(
            np.array([l for _, _, l in td]), np.array([l for _, _, l in th])
        )


def test_pipeline_bounds_take_host_path(pipelines):
    """Explicit speaker bounds must dispatch WITHOUT the device stage 3
    (the known-num_clusters dendrogram search is host-only) and still
    produce the host answer."""
    p_dev, p_host = pipelines
    wav = (0.1 * np.random.default_rng(9).normal(size=4 * 16000)).astype(np.float32)
    pending = p_dev._dispatch(wav, num_speakers=2)
    assert pending["device_clu"] is None
    ann = p_dev._collect(pending, num_speakers=2)
    assert _turns(ann) == _turns(p_host(wav, num_speakers=2))


def test_pipeline_rows_cap_takes_host_path():
    p = make_tiny1s_pipeline(device_clustering="auto", device_cluster_rows=8)
    wav = (0.1 * np.random.default_rng(2).normal(size=5 * 16000)).astype(np.float32)
    pending = p._dispatch(wav)
    assert pending["device_clu"] is None  # rows > cap
    assert p._collect(pending) is not None


def test_incompatible_clusterer_raises():
    with pytest.raises(ValueError):
        make_tiny1s_pipeline(
            device_clustering=True, clusterer="spectral"
        )


def test_stage3_activations_match_post_cluster(pipelines):
    """The fused stage-3 aggregation must equal the host-path flow
    (_post_cluster driven by the device-computed hard labels)."""
    import pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization as D

    p_dev, _ = pipelines
    wav = (0.1 * np.random.default_rng(13).normal(size=5 * 16000)).astype(
        np.float32
    )
    pending = p_dev._dispatch(wav)
    dc = pending["device_clu"]
    assert dc is not None
    hard = np.asarray(dc["hard"]).reshape(pending["num_padded"], -1)
    num_large = int(dc["num_large"])
    assert num_large >= 1
    k_pad = p_dev.k_max
    membership = np.zeros((pending["num_padded"], hard.shape[1], k_pad), bool)
    ci, si = np.nonzero(hard >= 0)
    membership[ci, si, hard[ci, si]] = True
    plan = p_dev._diarization_plan(pending["num_padded"])
    ref = D._post_cluster(
        pending["segmentations"],
        jnp.asarray(membership),
        jnp.asarray(plan.start_frames),
        plan.num_frames,
    )
    got = np.asarray(dc["activations"], np.float32)
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-3)


def test_collect_falls_back_when_num_large_zero(pipelines):
    """When the device stage-3 reports num_large == 0 (the host dendrogram
    search must run), _collect must fall through to the host path and still
    produce the host answer — embeddings are still resident."""
    import jax.numpy as jnp

    p_dev, p_host = pipelines
    wav = (0.1 * np.random.default_rng(44).normal(size=4 * 16000)).astype(
        np.float32
    )
    pending = p_dev._dispatch(wav)
    assert pending["device_clu"] is not None
    # force the fallback signal
    pending["device_clu"]["num_large"] = jnp.asarray(0, jnp.int32)
    ann = p_dev._collect(pending)
    td = _turns(ann)
    th = _turns(p_host(wav))
    assert [(s, e) for s, e, _ in td] == [(s, e) for s, e, _ in th]


def test_large_finite_cap_takes_host_path():
    """A clusterer with a large finite max_num_embeddings would size the
    device merge loop at the cap — affordability is bounded by the
    merge-loop size, not just the cap-is-None case (review r5)."""
    from pyannote_audio_speaker_diarization_cpp_tpu.config import ClusteringConfig

    p = make_tiny1s_pipeline(
        clusterer=AgglomerativeClustering(
            ClusteringConfig(), max_num_embeddings=5000
        ),
    )
    assert not p._device_clu_eligible(4000, None, None, None)
    assert p._device_clu_eligible(900, None, None, None)
    p2 = make_tiny1s_pipeline(
        clusterer=AgglomerativeClustering(
            ClusteringConfig(), max_num_embeddings=None
        ),
    )
    assert not p2._device_clu_eligible(4000, None, None, None)
    assert p2._device_clu_eligible(1200, None, None, None)
