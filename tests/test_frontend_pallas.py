"""Fused Pallas front-end kernel vs the jnp reference chain.

Runs in Pallas interpreter mode on the CPU test platform; the TPU-compiled
path is exercised by bench/verify runs on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_audio_speaker_diarization_cpp_tpu.config import FrontendConfig
from pyannote_audio_speaker_diarization_cpp_tpu.ops import frontend as fe
from pyannote_audio_speaker_diarization_cpp_tpu.ops import frontend_pallas as fp


def test_log_mel_kernel_matches_jnp():
    cfg = FrontendConfig()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16000)).astype(np.float32))
    ours = np.asarray(fp.log_mel_spectrogram(x, cfg, interpret=True))
    power = fe.stft_power(x, cfg)
    _, mel = fe._cached_constants(cfg)
    fb = np.asarray(power) @ mel
    expected = 10.0 * np.log10(np.maximum(fb, cfg.amin))
    assert ours.shape == expected.shape == (2, 101, 80)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-3)


def test_compute_features_pallas_matches_reference():
    cfg = FrontendConfig()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 32000)).astype(np.float32))
    lens = jnp.asarray([1.0, 0.6, 0.25], jnp.float32)
    ours = np.asarray(fp.compute_features_pallas(x, lens, cfg, interpret=True))
    ref = np.asarray(fe.compute_features(x, lens, cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)
