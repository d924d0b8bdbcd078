"""Differential dump harness and training loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pyannote_audio_speaker_diarization_cpp_tpu.utils import debug_dump as dd


def test_format_parse_roundtrip():
    arr = np.array([[1.5, np.nan, -2.0], [0.0, 3.25, 1e-8]])
    out = dd.parse_tensor(dd.format_tensor(arr))
    np.testing.assert_allclose(out, arr, equal_nan=True)


def test_compare_dumps_tolerances(tmp_path):
    a = np.random.default_rng(0).normal(size=(5, 3))
    s1 = dd.DumpSession(str(tmp_path), prefix="jax")
    s2 = dd.DumpSession(str(tmp_path), prefix="py")
    s1.dump("scores", a)
    s2.dump("scores", a * (1 + 5e-4))  # inside rtol 1e-3
    s1.dump("count", np.array([1, 2, 3]))
    s2.dump("count", np.array([1, 2, 3]))
    s1.dump("clusters", np.array([0, 1, 1]))
    s2.dump("clusters", np.array([0, 1, 2]))  # exact-compare name -> mismatch
    results = {r.name: r.status for r in dd.compare_dumps(str(tmp_path))}
    assert results["scores"] == "match"
    assert results["count"] == "match"
    assert results["clusters"] == "mismatch"


def test_pipeline_dump_session(tmp_path, tiny1s_pipeline):
    audio = (0.1 * np.random.default_rng(0).normal(size=2 * 16000)).astype(np.float32)
    session = dd.DumpSession(str(tmp_path), prefix="jax")
    tiny1s_pipeline(audio, dump=session)
    expected = {
        "segmentations",
        "binarized_segmentations",
        "count",
        "embeddings",
        "hard_clusters",
        "soft_clusters",
        "discrete_diarization",
    }
    assert expected <= set(session.tensors)
    # self-comparison must fully match
    s2 = dd.DumpSession(str(tmp_path), prefix="py")
    for name, value in session.tensors.items():
        s2.dump(name, value)
    results = dd.compare_dumps(str(tmp_path))
    assert all(r.status == "match" for r in results), results


def test_segmentation_trainer_loss_decreases():
    from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as P
    from pyannote_audio_speaker_diarization_cpp_tpu.models.trainer import (
        segmentation_trainer,
    )

    cfg = P.PyanNetConfig(
        num_filters=8, conv_channels=6, lstm_hidden=8, lstm_layers=1, linear_hidden=8
    )
    params = P.init_pyannet(jax.random.PRNGKey(0), cfg)
    trainer = segmentation_trainer(params, cfg, optimizer=optax.adam(3e-3))

    rng = np.random.default_rng(0)
    num_samples = 4000
    frames = P.pyannet_num_frames(num_samples, cfg)
    wav = rng.normal(size=(8, num_samples)).astype(np.float32)
    labels = (rng.uniform(size=(8, frames, 3)) > 0.7).astype(np.float32)

    losses = trainer.fit(iter([(wav, labels)] * 30), log_every=0)
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert int(trainer.state.step) == 30


def test_embedding_train_step_runs():
    from pyannote_audio_speaker_diarization_cpp_tpu.models import ecapa as E
    from pyannote_audio_speaker_diarization_cpp_tpu.models import training as T

    cfg = E.EcapaConfig(
        in_channels=8,
        channels=(16, 16, 16, 16, 48),
        attention_channels=8,
        res2net_scale=4,
        se_channels=4,
        emb_dim=12,
    )
    key = jax.random.PRNGKey(0)
    both = {
        "params": E.init_ecapa(key, cfg),
        "head": T.init_aam_head(key, 12, num_classes=5),
    }
    opt = optax.adam(1e-3)
    state = T.TrainState(both, opt.init(both), jnp.zeros((), jnp.int32))
    step = jax.jit(T.make_embedding_train_step(opt, cfg))

    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(4, 20, 8)).astype(np.float32))
    lens = jnp.ones((4,))
    labels = jnp.asarray([0, 1, 2, 3])
    state, loss = step(state, feats, lens, labels)
    assert np.isfinite(float(loss))
    state, loss2 = step(state, feats, lens, labels)
    assert np.isfinite(float(loss2))
