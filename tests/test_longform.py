"""Long-form chunk-sharded diarization: shard plans, partial WAV reads, and
equality of the sharded path with the single-shot pipeline."""

import os
import tempfile

import numpy as np
import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio
from pyannote_audio_speaker_diarization_cpp_tpu.parallel.longform import (
    LongFormDiarizer,
    plan_shards,
)

WINDOW, STEP = 80000, 8000


# ---------------------------------------------------------------------------
# shard planning
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_chunks,num_shards", [(10, 3), (7, 7), (5, 8), (111, 4)])
def test_plan_shards_partitions_chunks(num_chunks, num_shards):
    shards = plan_shards(num_chunks, num_shards, WINDOW, STEP)
    assert len(shards) == num_shards
    assert shards[0].chunk_lo == 0
    assert shards[-1].chunk_hi == num_chunks
    for a, b in zip(shards, shards[1:]):
        assert a.chunk_hi == b.chunk_lo
    sizes = [s.num_chunks for s in shards]
    assert max(sizes) - min(s for s in sizes if s > 0 or num_chunks == 0) <= 1 or (
        0 in sizes and num_shards > num_chunks
    )
    for s in shards:
        if s.num_chunks:
            # sample window covers exactly chunks [lo, hi)
            assert s.sample_lo == s.chunk_lo * STEP
            assert s.sample_hi == (s.chunk_hi - 1) * STEP + WINDOW


def test_plan_shards_halo_is_bounded():
    shards = plan_shards(100, 4, WINDOW, STEP)
    for s in shards[:-1]:
        nominal_end = s.chunk_hi * STEP
        assert s.sample_hi - nominal_end <= WINDOW - STEP  # <= 4.5 s halo


# ---------------------------------------------------------------------------
# partial WAV reads
# ---------------------------------------------------------------------------


def test_partial_wav_read_equals_slice():
    rng = np.random.default_rng(0)
    samples = rng.integers(-30000, 30000, size=(1, 50000)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.wav")
        wavio.write_wav(path, samples, 16000, 16)
        full = wavio.read_wav(path)
        part = wavio.read_wav(path, start_frame=12345, max_frames=6789)
        np.testing.assert_array_equal(
            part.samples, full.samples[:, 12345 : 12345 + 6789]
        )
        tail = wavio.read_wav(path, start_frame=49000, max_frames=5000)
        assert tail.num_samples == 1000  # clamped at EOF
        np.testing.assert_array_equal(tail.samples, full.samples[:, 49000:])


def test_partial_wav_read_stereo():
    rng = np.random.default_rng(1)
    samples = rng.integers(-1000, 1000, size=(2, 9000)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.wav")
        wavio.write_wav(path, samples, 16000, 16)
        part = wavio.read_wav(path, start_frame=4000, max_frames=2000)
        np.testing.assert_array_equal(part.samples, samples[:, 4000:6000])


def test_wav_info_matches_read():
    rng = np.random.default_rng(2)
    samples = rng.integers(-1000, 1000, size=(2, 7777)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.wav")
        wavio.write_wav(path, samples, 22050, 16)
        info = wavio.wav_info(path)
        assert (info.num_channels, info.sample_rate, info.num_frames) == (2, 22050, 7777)
        assert not info.is_float


# ---------------------------------------------------------------------------
# sharded pipeline == single-shot pipeline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_pipeline(tiny1s_pipeline):
    return tiny1s_pipeline


def test_longform_equals_single_shot(tiny_pipeline):
    rng = np.random.default_rng(5)
    audio = (0.1 * rng.normal(size=10 * 16000 + 3777)).astype(np.float32)
    single = tiny_pipeline(audio)
    sharded = LongFormDiarizer(tiny_pipeline, num_shards=3)(audio)
    assert str(single) == str(sharded)


def test_longform_single_shard_equals_single_shot(tiny_pipeline):
    rng = np.random.default_rng(6)
    audio = (0.1 * rng.normal(size=6 * 16000)).astype(np.float32)
    assert str(tiny_pipeline(audio)) == str(
        LongFormDiarizer(tiny_pipeline, num_shards=1)(audio)
    )


def test_longform_from_wav_file_partial_reads(tiny_pipeline):
    rng = np.random.default_rng(7)
    audio = (0.1 * rng.normal(size=8 * 16000 + 123)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "long.wav")
        wavio.write_wav(path, (audio * 32768).round(), 16000, 16)
        quantized = wavio.read_wav(path).normalized_mono()
        single = tiny_pipeline(quantized)
        sharded = LongFormDiarizer(tiny_pipeline, num_shards=4)(path)
        assert str(single) == str(sharded)


# ---------------------------------------------------------------------------
# the ACTUAL multi-host branch, executed with simulated hosts
# ---------------------------------------------------------------------------


class _Rendezvous:
    """A real collective rendezvous for simulated hosts: every rank deposits
    its padded array, a barrier synchronizes, all ranks read the stack —
    the same contract as multihost_utils.process_allgather over DCN."""

    def __init__(self, world: int):
        import threading

        self.world = world
        self.barrier = threading.Barrier(world)
        self.bufs = [None] * world

    def allgather(self, rank: int, x: np.ndarray) -> np.ndarray:
        self.bufs[rank] = np.asarray(x)
        self.barrier.wait()
        out = np.stack(self.bufs)
        self.barrier.wait()  # everyone read before the next round overwrites
        return out


class FakeComm:
    def __init__(self, rendezvous: _Rendezvous, rank: int):
        self._rdv = rendezvous
        self._rank = rank

    def process_count(self) -> int:
        return self._rdv.world

    def process_index(self) -> int:
        return self._rank

    def allgather(self, x: np.ndarray) -> np.ndarray:
        return self._rdv.allgather(self._rank, x)


def _run_simulated_hosts(pipeline, audio, world: int):
    """Run LongFormDiarizer's multi-host branch on `world` simulated hosts
    (one thread per host, collective via _Rendezvous). Returns the per-host
    annotations; raises if any host fails or the collective deadlocks."""
    import threading

    rdv = _Rendezvous(world)
    results = [None] * world
    errors = []

    def worker(rank):
        try:
            lf = LongFormDiarizer(pipeline, comm=FakeComm(rdv, rank))
            assert lf._multihost
            results[rank] = lf(audio)
        except Exception as e:  # noqa: BLE001 - surface to the main thread
            errors.append((rank, e))
            rdv.barrier.abort()

    threads = [threading.Thread(target=worker, args=(r,)) for r in range(world)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "simulated multi-host run deadlocked"
    assert not errors, f"host failures: {errors}"
    return results


def test_multihost_branch_uneven_shards_with_orphan(tiny_pipeline):
    """2 simulated hosts, odd chunk count (uneven 5+4 shards), short orphan
    tail in the last shard — exercises the pad -> process_allgather ->
    per-host trim path (parallel/longform.py _gather + _multihost branch)
    end-to-end and requires equality with the single-shot pipeline."""
    rng = np.random.default_rng(11)
    audio = (0.1 * rng.normal(size=int(4.8 * 16000))).astype(np.float32)
    single = tiny_pipeline(audio)
    results = _run_simulated_hosts(tiny_pipeline, audio, world=2)
    for rank, ann in enumerate(results):
        assert str(ann) == str(single), f"host {rank} diverged from single-shot"


def test_multihost_branch_more_hosts_than_chunks(tiny_pipeline):
    """3 simulated hosts, 1 chunk: two hosts own empty shards and must still
    join the collective (the round-1 advisor deadlock scenario)."""
    rng = np.random.default_rng(12)
    audio = (0.1 * rng.normal(size=int(0.9 * 16000))).astype(np.float32)
    single = tiny_pipeline(audio)
    results = _run_simulated_hosts(tiny_pipeline, audio, world=3)
    for rank, ann in enumerate(results):
        assert str(ann) == str(single), f"host {rank} diverged from single-shot"


# ---------------------------------------------------------------------------
# fused device stage 3 in long-form mode (round 5)
# ---------------------------------------------------------------------------


def test_longform_fused_stage3_engages_and_matches_host(tiny_pipeline):
    """Eligible single-process long-form runs must take the fused device
    stage 3 (embeddings never fetched) and match the host-clustering
    long-form result."""
    from _cfg import make_tiny1s_pipeline

    rng = np.random.default_rng(21)
    audio = (0.1 * rng.normal(size=9 * 16000 + 555)).astype(np.float32)
    lf_dev = LongFormDiarizer(tiny_pipeline, num_shards=3)
    assert lf_dev._device_clu_eligible(100, None, None, None)
    p_host = make_tiny1s_pipeline(device_clustering=False)
    lf_host = LongFormDiarizer(p_host, num_shards=3)
    assert not lf_host._device_clu_eligible(100, None, None, None)
    # prove the fused path actually ran: host clustering must not be called
    real_clusterer = tiny_pipeline.clusterer
    calls = []

    class _Spy:
        config = real_clusterer.config
        max_num_embeddings = real_clusterer.max_num_embeddings
        constrained_assignment = real_clusterer.constrained_assignment

        def __call__(self, *a, **k):
            calls.append(1)
            return real_clusterer(*a, **k)

    tiny_pipeline.clusterer = _Spy()
    try:
        dev_str = str(lf_dev(audio))
    finally:
        tiny_pipeline.clusterer = real_clusterer
    assert not calls, "fused long-form stage 3 fell back to host clustering"
    assert dev_str == str(lf_host(audio))


def test_longform_bounds_take_host_path(tiny_pipeline):
    """Explicit speaker bounds must route long-form to host clustering
    (the dendrogram search is host-only) and still produce the host
    answer."""
    from _cfg import make_tiny1s_pipeline

    rng = np.random.default_rng(22)
    audio = (0.1 * rng.normal(size=6 * 16000)).astype(np.float32)
    lf = LongFormDiarizer(tiny_pipeline, num_shards=2)
    assert not lf._device_clu_eligible(100, 2, None, None)
    p_host = make_tiny1s_pipeline(device_clustering=False)
    got = lf(audio, num_speakers=2)
    want = LongFormDiarizer(p_host, num_shards=2)(audio, num_speakers=2)
    assert str(got) == str(want)


def test_longform_inflight_window_one_equals_full_pipeline(tiny_pipeline):
    """max_inflight_shards=1 (strict per-shard sync) must be result-equal
    to the default window — the window is a memory/overlap knob only."""
    rng = np.random.default_rng(23)
    audio = (0.1 * rng.normal(size=8 * 16000 + 100)).astype(np.float32)
    a = LongFormDiarizer(tiny_pipeline, num_shards=4, max_inflight_shards=1)(audio)
    b = LongFormDiarizer(tiny_pipeline, num_shards=4)(audio)
    assert str(a) == str(b)
