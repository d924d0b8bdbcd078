"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding tests exercise multi-chip code paths without TPU hardware; numeric
tests are platform-independent. bench.py (repo root) runs on the real chip and
does not import this.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and pins
# jax_platforms to it; the config update below out-ranks the env var and
# forces the virtual 8-device CPU platform for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_wav_path():
    path = os.path.join(REFERENCE_DIR, "pipeline/data/multi-speaker_1min.wav")
    if not os.path.exists(path):
        pytest.skip("reference test wav not available")
    return path


@pytest.fixture(scope="session")
def small5s_pipeline():
    """One shared pipeline with the REAL recipe constants (5 s / 0.5 s
    windows, 293 frames, real thresholds) and small model architectures —
    compiled once per test session. Used by the golden-dump and DER
    regression tests; keep its construction stable, the committed goldens
    depend on it."""
    import dataclasses as dc

    from _cfg import SMALL_ECAPA, SMALL_PYANNET

    from pyannote_audio_speaker_diarization_cpp_tpu.config import DEFAULT_CONFIG
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
        SpeakerDiarizationPipeline,
    )

    cfg = dc.replace(DEFAULT_CONFIG, chunk_bucket=4)
    return SpeakerDiarizationPipeline(
        cfg,
        seed=0,
        seg_batch=4,
        emb_batch=4,
        pyannet_cfg=SMALL_PYANNET,
        ecapa_cfg=SMALL_ECAPA,
    )


@pytest.fixture(scope="session")
def tiny1s_pipeline():
    """THE shared e2e pipeline: 1 s / 0.5 s windows, small models, seed 0.
    Pipelines built with the same static configuration elsewhere in the
    suite share its compiled stages via the in-process step cache."""
    from _cfg import make_tiny1s_pipeline

    return make_tiny1s_pipeline()
