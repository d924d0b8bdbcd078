"""Checkpoint/resume: a restored run must continue bit-identically.

The reference persists nothing but immutable ONNX blobs (SURVEY.md section
5.4); these tests pin down the training-state resume semantics our framework
adds on top.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as pyannet_mod
from pyannote_audio_speaker_diarization_cpp_tpu.models.trainer import (
    segmentation_trainer,
)
from pyannote_audio_speaker_diarization_cpp_tpu.utils.checkpoint import (
    CheckpointManager,
    restore_pytree,
    save_pytree,
)

TINY = pyannet_mod.PyanNetConfig(
    num_filters=16, conv_channels=12, lstm_hidden=16, lstm_layers=1,
    linear_hidden=16,
)


def _batch(rng, cfg, batch=4, num_samples=2000):
    frames = pyannet_mod.pyannet_num_frames(num_samples, cfg)
    waveforms = rng.normal(size=(batch, num_samples)).astype(np.float32)
    labels = (rng.uniform(size=(batch, frames, cfg.num_classes)) > 0.5).astype(
        np.float32
    )
    return waveforms, labels


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": [jnp.ones((4,), jnp.bfloat16), {"c": jnp.int32(7)}],
        "t": (jnp.zeros((1, 1)), jnp.float64(2.5)),
    }
    path = str(tmp_path / "tree.npz")
    save_pytree(path, tree)
    out = restore_pytree(path, tree)
    for want, got in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(out)
    ):
        assert np.asarray(want).dtype == np.asarray(got).dtype
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_restore_rejects_shape_mismatch(tmp_path):
    path = str(tmp_path / "tree.npz")
    save_pytree(path, {"w": jnp.zeros((2, 3))})
    with pytest.raises(ValueError, match="shape"):
        restore_pytree(path, {"w": jnp.zeros((3, 2))})


def test_restore_rejects_structure_mismatch(tmp_path):
    path = str(tmp_path / "tree.npz")
    save_pytree(path, {"w": jnp.zeros((2,)), "b": jnp.zeros((2,))})
    with pytest.raises(ValueError, match="leaves"):
        restore_pytree(path, {"w": jnp.zeros((2,))})


def test_manager_latest_and_keep(tmp_path):
    manager = CheckpointManager(str(tmp_path / "ckpts"), keep=2)
    for step in (1, 2, 3):
        manager.save(step, {"x": jnp.full((2,), float(step))})
    assert manager.latest_step() == 3
    restored, step = manager.restore({"x": jnp.zeros((2,))})
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored["x"]), [3.0, 3.0])
    # keep=2 pruned step 1
    with pytest.raises(FileNotFoundError):
        manager.restore({"x": jnp.zeros((2,))}, step=1)


def test_trainer_resume_is_bit_identical(tmp_path):
    rng = np.random.default_rng(0)
    batches = [_batch(rng, TINY) for _ in range(4)]
    params = pyannet_mod.init_pyannet(jax.random.PRNGKey(0), TINY)

    # uninterrupted 4-step run
    ref = segmentation_trainer(params, cfg=TINY)
    ref_losses = [ref.step(*b) for b in batches]

    # run 2 steps, checkpoint, resume into a FRESH trainer, run 2 more
    first = segmentation_trainer(params, cfg=TINY)
    first_losses = [first.step(*b) for b in batches[:2]]
    ckpt_dir = str(tmp_path / "run")
    first.save_checkpoint(ckpt_dir)

    fresh = segmentation_trainer(
        pyannet_mod.init_pyannet(jax.random.PRNGKey(99), TINY), cfg=TINY
    )
    assert fresh.restore_checkpoint(ckpt_dir) == 2
    assert int(fresh.state.step) == 2
    resumed_losses = [fresh.step(*b) for b in batches[2:]]

    np.testing.assert_array_equal(first_losses + resumed_losses, ref_losses)
    for want, got in zip(
        jax.tree_util.tree_leaves(ref.state), jax.tree_util.tree_leaves(fresh.state)
    ):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fit_writes_checkpoints(tmp_path):
    rng = np.random.default_rng(1)
    params = pyannet_mod.init_pyannet(jax.random.PRNGKey(0), TINY)
    trainer = segmentation_trainer(params, cfg=TINY)
    ckpt_dir = str(tmp_path / "fit")
    trainer.fit(
        [_batch(rng, TINY) for _ in range(3)],
        log_every=0,
        checkpoint_dir=ckpt_dir,
        checkpoint_every=2,
    )
    manager = CheckpointManager(ckpt_dir)
    assert manager.latest_step() == 3  # final save at end of fit
    _, step = manager.restore(trainer.state)
    assert step == 3
