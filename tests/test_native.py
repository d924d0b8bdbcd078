"""Native C++ runtime (libsdtpu_native.so) vs pure-Python implementations."""

import numpy as np
import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.runtime import native_bindings as nb

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native library unavailable (no toolchain)"
)


def test_native_linkage_matches_numpy():
    from pyannote_audio_speaker_diarization_cpp_tpu.clustering import ahc

    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 32))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Zn = nb.linkage_centroid(X)
    Zp = ahc.linkage(X, use_native=False)
    np.testing.assert_array_equal(Zn[:, :2], Zp[:, :2])
    np.testing.assert_allclose(Zn[:, 2], Zp[:, 2], rtol=1e-10)
    np.testing.assert_array_equal(Zn[:, 3], Zp[:, 3])


def test_native_linkage_matches_scipy():
    scipy_h = pytest.importorskip("scipy.cluster.hierarchy")
    rng = np.random.default_rng(1)
    X = rng.normal(size=(150, 16))
    Zn = nb.linkage_centroid(X)
    Zs = scipy_h.linkage(X, method="centroid", metric="euclidean")
    np.testing.assert_allclose(Zn[:, 2], Zs[:, 2], rtol=1e-8)
    np.testing.assert_array_equal(Zn[:, :2], Zs[:, :2])


def test_native_wav_reader_matches_python(tmp_path):
    from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio

    rng = np.random.default_rng(2)
    samples = rng.integers(-20000, 20000, size=(2, 5000)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    wavio.write_wav(path, samples, 16000, 16)
    out = nb.read_wav(path)
    assert out is not None
    native_samples, rate, bits = out
    assert (rate, bits) == (16000, 16)
    np.testing.assert_array_equal(native_samples, samples)


def test_ahc_dispatches_to_native():
    from pyannote_audio_speaker_diarization_cpp_tpu.clustering import ahc

    rng = np.random.default_rng(3)
    X = rng.normal(size=(100, 8))
    Z1 = ahc.linkage(X, use_native=True)
    Z2 = ahc.linkage(X, use_native=False)
    np.testing.assert_allclose(Z1, Z2, rtol=1e-10)
