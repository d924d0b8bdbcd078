"""DER metric, spectral clustering, segmentation-only/embedding-only
pipelines."""

import numpy as np
import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.core.annotation import Annotation
from pyannote_audio_speaker_diarization_cpp_tpu.metrics.der import (
    der,
    diarization_error_rate,
)
from pyannote_audio_speaker_diarization_cpp_tpu.clustering.spectral import (
    SpectralClustering,
    _eigengap_num_clusters,
)


# ---------------------------------------------------------------------------
# DER
# ---------------------------------------------------------------------------


def _ann(turns):
    a = Annotation()
    for s, e, l in turns:
        a.add(s, e, l)
    return a


def test_der_perfect_match():
    ref = _ann([(0, 5, 0), (5, 10, 1)])
    assert der(ref, ref) == 0.0
    # label permutation is free
    hyp = _ann([(0, 5, 7), (5, 10, 3)])
    assert der(ref, hyp) == 0.0


def test_der_missed_speech():
    ref = _ann([(0, 10, 0)])
    hyp = _ann([(0, 5, 0)])
    comp = diarization_error_rate(ref, hyp)
    assert comp.missed == pytest.approx(5.0)
    assert comp.false_alarm == 0.0
    assert comp.confusion == 0.0
    assert comp.der == pytest.approx(0.5)


def test_der_false_alarm():
    ref = _ann([(0, 10, 0)])
    hyp = _ann([(0, 12, 0)])
    comp = diarization_error_rate(ref, hyp)
    assert comp.false_alarm == pytest.approx(2.0)
    assert comp.der == pytest.approx(0.2)


def test_der_confusion():
    ref = _ann([(0, 5, 0), (5, 10, 1)])
    # hypothesis swaps the second half to the same speaker
    hyp = _ann([(0, 10, 0)])
    comp = diarization_error_rate(ref, hyp)
    # optimal mapping: hyp 0 -> ref 0; seconds 5..10 are confusion
    assert comp.confusion == pytest.approx(5.0)
    assert comp.der == pytest.approx(0.5)


def test_der_collar_forgives_boundaries():
    ref = _ann([(0, 10, 0)])
    hyp = _ann([(0.2, 9.8, 0)])
    assert der(ref, hyp) > 0
    assert der(ref, hyp, collar=0.25) == 0.0


def test_der_overlap_counting():
    # two overlapping reference speakers, hypothesis catches only one
    ref = _ann([(0, 10, 0), (0, 10, 1)])
    hyp = _ann([(0, 10, 0)])
    comp = diarization_error_rate(ref, hyp)
    assert comp.total == pytest.approx(20.0)
    assert comp.missed == pytest.approx(10.0)
    assert comp.der == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# spectral clustering
# ---------------------------------------------------------------------------


def test_eigengap():
    eigvals = np.array([0.0, 0.01, 0.02, 0.8, 0.9, 1.0])
    assert _eigengap_num_clusters(eigvals, 1, 5) == 3


def test_spectral_recovers_clusters():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(3, 32)) * 3
    emb = np.full((40, 3, 32), np.nan)
    truth = np.full((40, 3), -1)
    for c in range(40):
        for s in range(3):
            if rng.uniform() < 0.7:
                k = rng.integers(3)
                emb[c, s] = centers[k] + 0.05 * rng.normal(size=32)
                truth[c, s] = k
    hard, soft = SpectralClustering()(emb)
    valid = truth >= 0
    # partition equality up to permutation
    pairs = {}
    ok = True
    for t, h in zip(truth[valid], hard[valid]):
        if t in pairs and pairs[t] != h:
            ok = False
        pairs[t] = h
    assert ok and len(set(pairs.values())) == len(pairs)


def test_spectral_known_num_clusters():
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(4, 16)) * 3
    X = np.stack([centers[i % 4] + 0.05 * rng.normal(size=16) for i in range(40)])
    labels = SpectralClustering().cluster(X, 1, 40, num_clusters=4)
    assert len(np.unique(labels)) == 4


# ---------------------------------------------------------------------------
# segmentation-only / embedding-only pipelines
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_cfg():
    from _cfg import TINY1S_CFG

    return TINY1S_CFG


def test_segmentation_pipeline(small_cfg):
    from _cfg import SMALL_PYANNET

    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.segmentation import (
        SegmentationPipeline,
    )

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.normal(size=3 * 16000)).astype(np.float32)
    pipe = SegmentationPipeline(small_cfg, seg_batch=4, pyannet_cfg=SMALL_PYANNET)
    swf = pipe.slide(audio)
    assert swf.data.shape[0] == 5  # 3 s -> chunks at 0, .5, 1, 1.5, 2(+orphan)
    assert swf.data.shape[2] == 3
    ann = pipe(audio)
    for t in ann.turns():
        assert t.end > t.start


def test_embedding_pipeline(small_cfg):
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.embedding import (
        EmbeddingPipeline,
    )
    from pyannote_audio_speaker_diarization_cpp_tpu.models.ecapa import EcapaConfig

    from _cfg import SMALL_ECAPA

    pipe = EmbeddingPipeline(small_cfg, batch_size=4, ecapa_cfg=SMALL_ECAPA)
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.normal(size=(5, 16000))).astype(np.float32)
    emb = pipe(wav)
    assert emb.shape == (5, SMALL_ECAPA.emb_dim)
    assert np.isfinite(emb).all()
    # masked: one row fully silent -> NaN
    masks = np.ones((5, 100), dtype=np.float32)
    masks[2] = 0.0
    emb = pipe(wav, masks)
    assert np.isnan(emb[2]).all()
    assert np.isfinite(np.delete(emb, 2, axis=0)).all()
    sim = pipe.cosine_similarity(emb[:1], emb[3:])
    assert sim.shape == (1, 2)


def test_diarization_pipeline_spectral_clusterer(small_cfg):
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
        SpeakerDiarizationPipeline,
    )

    from _cfg import make_tiny1s_pipeline

    rng = np.random.default_rng(2)
    audio = (0.1 * rng.normal(size=2 * 16000)).astype(np.float32)
    # identical static config to the shared tiny1s pipeline -> the compiled
    # stages are reused; only the host-side clusterer differs
    pipe = make_tiny1s_pipeline(seed=2, clusterer="spectral")
    ann = pipe(audio)
    assert ann is not None


def test_analytic_flops_sane():
    """utils/flops.py: analytic counts scale with work and are the right
    order of magnitude for the published model sizes."""
    from pyannote_audio_speaker_diarization_cpp_tpu.utils import flops as fl

    f1 = fl.pyannet_flops(80000)
    assert 0.5e9 < f1 < 5e9  # ~1.3 GFLOP per 5 s chunk
    assert fl.pyannet_flops(40000) < f1

    f2 = fl.ecapa_flops(501)
    assert 5e9 < f2 < 50e9  # ~18 GFLOP per masked 5 s row
    assert abs(fl.ecapa_flops(1002) / f2 - 2.0) < 0.1  # ~linear in frames
