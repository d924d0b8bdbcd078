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
