"""Streaming diarization: incremental feeds must converge to the offline
pipeline's output exactly at flush."""

import numpy as np
import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.streaming import (
    StreamingDiarizer,
)


@pytest.fixture(scope="module")
def tiny_pipeline(tiny1s_pipeline):
    return tiny1s_pipeline


def _audio(seconds_samples, seed):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.normal(size=seconds_samples)).astype(np.float32)


def test_streaming_flush_equals_offline(tiny_pipeline):
    audio = _audio(9 * 16000 + 5000, seed=10)  # includes a short orphan tail
    offline = tiny_pipeline(audio)

    stream = StreamingDiarizer(tiny_pipeline, emit_every=4)
    emitted = 0
    for start in range(0, len(audio), 7777):  # odd block size
        if stream.feed(audio[start : start + 7777]) is not None:
            emitted += 1
    final = stream.flush()
    assert emitted >= 1  # intermediate results were produced
    assert str(final) == str(offline)


def test_streaming_one_big_feed(tiny_pipeline):
    audio = _audio(6 * 16000, seed=11)
    offline = tiny_pipeline(audio)
    stream = StreamingDiarizer(tiny_pipeline, emit_every=2)
    stream.feed(audio)
    assert str(stream.flush()) == str(offline)


def test_streaming_bounded_buffer(tiny_pipeline):
    stream = StreamingDiarizer(tiny_pipeline, emit_every=2)
    audio = _audio(8 * 16000, seed=12)
    for start in range(0, len(audio), 16000):
        stream.feed(audio[start : start + 16000])
    # after processing, the buffer holds at most window + emit_every*step
    # plus one undelivered block
    seg = tiny_pipeline.config.segmentation
    assert stream._buffer.shape[0] <= seg.window_size + (
        stream.emit_every + 2
    ) * seg.step_size + 16000


def test_streaming_flush_twice_raises(tiny_pipeline):
    stream = StreamingDiarizer(tiny_pipeline)
    stream.feed(_audio(2 * 16000, seed=13))
    stream.flush()
    with pytest.raises(RuntimeError):
        stream.flush()
    stream.reset()
    assert stream.feed(_audio(16000, seed=14)) is None  # usable again


def test_streaming_empty_flush(tiny_pipeline):
    stream = StreamingDiarizer(tiny_pipeline)
    assert len(stream.flush().turns()) == 0


def test_streaming_incremental_clustering(tiny_pipeline):
    """recluster_every > 1: interim emissions assign new embeddings to the
    stored centroids (O(N*K) instead of per-emit AHC); flush still runs a
    FULL recluster and stays offline-exact. Latencies are recorded."""
    rng = np.random.default_rng(11)
    audio = (0.1 * rng.normal(size=int(9.7 * 16000))).astype(np.float32)

    stream = StreamingDiarizer(tiny_pipeline, emit_every=2, recluster_every=3)
    emitted = 0
    for i in range(0, len(audio), 4000):
        if stream.feed(audio[i : i + 4000]) is not None:
            emitted += 1
    final = stream.flush()
    assert emitted >= 3  # several emissions -> the incremental path ran
    assert len(stream.feed_latencies) == emitted
    assert all(t > 0 for t in stream.feed_latencies)
    assert str(final) == str(tiny_pipeline(audio))
