"""Data-parallel sharding: multi-device results must equal single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_audio_speaker_diarization_cpp_tpu.config import (
    DiarizationConfig,
    SegmentationConfig,
)
from pyannote_audio_speaker_diarization_cpp_tpu.models.pyannet import pyannet_num_frames
from pyannote_audio_speaker_diarization_cpp_tpu.parallel.mesh import (
    batch_spec,
    make_mesh,
    replicated,
)
from pyannote_audio_speaker_diarization_cpp_tpu.parallel.sharding import (
    all_gather_embeddings,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


def test_all_gather_embeddings(mesh):
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(64, 192)).astype(np.float32))
    sharded = jax.device_put(emb, batch_spec(mesh, 2))
    gathered = all_gather_embeddings(sharded, mesh)
    assert gathered.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(emb), rtol=1e-6)


def test_pipeline_mesh_equals_single_device(mesh):
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
        SpeakerDiarizationPipeline,
    )

    from _cfg import SMALL_ECAPA, SMALL_PYANNET, TINY1S_CFG

    rng = np.random.default_rng(3)
    audio = (0.1 * rng.normal(size=4 * 16000)).astype(np.float32)

    single = SpeakerDiarizationPipeline(
        TINY1S_CFG, seed=0, seg_batch=8, emb_batch=8,
        pyannet_cfg=SMALL_PYANNET, ecapa_cfg=SMALL_ECAPA,
    )
    multi = SpeakerDiarizationPipeline(
        TINY1S_CFG, seed=0, params=single.params, seg_batch=8, emb_batch=8,
        mesh=mesh, pyannet_cfg=SMALL_PYANNET, ecapa_cfg=SMALL_ECAPA,
    )
    a1 = single(audio)
    a2 = multi(audio)
    assert str(a1) == str(a2)


def test_long_form_chunk_sharding_roundtrip(mesh):
    """Simulated multi-host long-form: chunks sharded over the mesh, the
    embedding matrix allgathered for global clustering (BASELINE config 5)."""
    from pyannote_audio_speaker_diarization_cpp_tpu.clustering.base import (
        AgglomerativeClustering,
    )

    rng = np.random.default_rng(4)
    centers = rng.normal(size=(2, 64)) * 3
    emb_local = np.stack(
        [centers[i % 2] + 0.05 * rng.normal(size=64) for i in range(48)]
    ).astype(np.float32)
    sharded = jax.device_put(jnp.asarray(emb_local), batch_spec(mesh, 2))
    gathered = np.asarray(all_gather_embeddings(sharded, mesh), dtype=np.float64)
    hard, _ = AgglomerativeClustering()(gathered.reshape(16, 3, 64))
    assert hard.shape == (16, 3)
    assert len(np.unique(hard)) == 2
