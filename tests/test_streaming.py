"""Streaming diarization: incremental feeds must converge to the offline
pipeline's output exactly at flush.

The exactness contract is against the offline HOST-clustering decode
(device_clustering=False) — streaming's global steps run on host. Against
the default offline path (fused on-device clustering) flush is
partition-equivalent (same boundaries, labels renamed); a dedicated test
pins that too."""

import numpy as np
import pytest

from _cfg import make_tiny1s_pipeline
from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.streaming import (
    StreamingDiarizer,
)


@pytest.fixture(scope="module")
def tiny_pipeline():
    # the flush == offline STRING contract holds vs the host-clustering
    # pipeline (streaming's global steps are host-side)
    return make_tiny1s_pipeline(device_clustering=False)


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


def test_running_count_grids_bitwise_equal_oneshot(tiny_pipeline):
    """The running numerator/denominator grids must equal the one-shot
    speaker_count aggregation BITWISE at every emission (np.add.at applies
    additions in index order; batches arrive in chunk order)."""
    from pyannote_audio_speaker_diarization_cpp_tpu.core.sliding_window import (
        SlidingWindow,
    )
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines import (
        reconstruct as rec,
    )

    stream = StreamingDiarizer(tiny_pipeline, emit_every=2)
    audio = _audio(9 * 16000, seed=31)
    seg = tiny_pipeline.config.segmentation
    checks = 0
    for block in np.array_split(audio, 7):
        if stream.feed(block) is None:
            continue
        binz = stream._binarized.view()
        covered = (stream._done_chunks - 1) * seg.step_size + seg.window_size
        ns = min(stream.total_samples, covered)
        chunk_frames = SlidingWindow(0.0, seg.step, seg.duration, num_samples=ns)
        frame_grid = SlidingWindow(
            seg.frame_start, seg.frame_step, seg.frame_duration
        )
        count, _ = rec.speaker_count(
            binz, chunk_frames, frame_grid, ns, warm_up=seg.warm_up
        )
        eps = float(np.finfo(np.float64).eps)
        num = stream._count_num.view()[:, 0]
        den = stream._count_den.view()[:, 0]
        mine = np.rint(
            np.where(den == 0.0, 0.0, num / np.maximum(den, eps))
        ).astype(np.int64)
        assert len(mine) == len(count)
        np.testing.assert_array_equal(mine, count)
        checks += 1
    assert checks >= 2


def test_recluster_emissions_match_always_recluster_stream(tiny_pipeline):
    """Emissions where the full recluster runs must equal the corresponding
    emission of a recluster-every-time stream (same chunk state, fresh grid
    rebuild) — pins the incremental grid rebuild against the always-full
    path."""
    audio = _audio(12 * 16000, seed=33)
    blocks = np.array_split(audio, 10)

    def run(recluster_every):
        stream = StreamingDiarizer(
            tiny_pipeline, emit_every=2, recluster_every=recluster_every
        )
        out = []
        for b in blocks:
            ann = stream.feed(b)
            out.append(None if ann is None else str(ann))
        out.append(str(stream.flush()))
        return out

    always = run(1)
    mixed = run(2)
    assert len(always) == len(mixed)
    emit_idx = -1
    for a, m in zip(always[:-1], mixed[:-1]):
        assert (a is None) == (m is None)
        if a is None:
            continue
        emit_idx += 1
        if emit_idx % 2 == 0:  # recluster emissions of the mixed stream
            assert m == a
    assert mixed[-1] == always[-1]  # flush always reclusters


def test_incremental_emission_cost_does_not_scale_with_history(tiny_pipeline):
    """The O(N^2) concatenate-everything emission of round 3 is gone: an
    incremental emission must fold only the NEW batches."""
    stream = StreamingDiarizer(tiny_pipeline, emit_every=2, recluster_every=10**9)
    folded_per_emit = []
    orig = stream._fold_batch
    calls = [0]

    def counting_fold(idx, hard):
        calls[0] += 1
        return orig(idx, hard)

    stream._fold_batch = counting_fold
    audio = _audio(14 * 16000, seed=35)
    for b in np.array_split(audio, 12):
        before = calls[0]
        if stream.feed(b) is not None:
            folded_per_emit.append(calls[0] - before)
    assert len(folded_per_emit) >= 4
    # first emission reclusters (folds everything so far == 1 batch); later
    # incremental emissions each fold exactly the one new batch
    assert all(n == 1 for n in folded_per_emit)


def test_flush_partition_equivalent_to_device_clustering_offline(
    tiny_pipeline, tiny1s_pipeline
):
    """Against the DEFAULT offline path (fused device clustering) the flush
    must have identical turn boundaries with bijectively-renamed labels
    (the documented device-clustering numbering deviation)."""
    audio = _audio(7 * 16000, seed=51)
    stream = StreamingDiarizer(tiny_pipeline, emit_every=3)
    for block in np.array_split(audio, 5):
        stream.feed(block)
    flush_turns = [
        (round(t.start, 6), round(t.end, 6), t.label)
        for t in stream.flush().turns()
    ]
    offline = tiny1s_pipeline(audio)  # device_clustering="auto"
    off_turns = [
        (round(t.start, 6), round(t.end, 6), t.label) for t in offline.turns()
    ]
    assert [(s, e) for s, e, _ in flush_turns] == [(s, e) for s, e, _ in off_turns]
    # label bijection as a PARTITION check (order-robust: turns() tiebreaks
    # identical boundaries by label, which a renaming permutes): each
    # label's set of spans must appear on both sides
    def grouping(turns):
        g = {}
        for s_, e_, l in turns:
            g.setdefault(l, set()).add((s_, e_))
        return sorted(map(frozenset, g.values()), key=sorted)

    assert grouping(flush_turns) == grouping(off_turns)


# ---------------------------------------------------------------------------
# frozen-prefix incremental decode (round 5)
# ---------------------------------------------------------------------------


def test_frozen_prefix_decode_engages_and_is_exact(reference_wav_path):
    """With a trained checkpoint (real silences -> count==0 spans) the
    frozen-prefix decode must (a) actually engage and (b) leave every
    emission and the flush STRING-IDENTICAL to a stream with freezing
    disabled (full decode every emission)."""
    import dataclasses as dc
    import os

    from pyannote_audio_speaker_diarization_cpp_tpu.config import DEFAULT_CONFIG
    from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio
    from pyannote_audio_speaker_diarization_cpp_tpu.models import convert
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
        SpeakerDiarizationPipeline,
    )
    from _cfg import SMALL_ECAPA, SMALL_PYANNET

    ckpt = os.path.join(os.path.dirname(__file__), "goldens", "gate_ckpt")
    if not os.path.isdir(ckpt):
        pytest.skip("gate checkpoint not committed")
    params = convert.load_checkpoint(ckpt)
    data = wavio.read_wav(reference_wav_path)
    wav = (data.samples.mean(axis=0) / 32768.0).astype(np.float32)

    cfg = dc.replace(DEFAULT_CONFIG, chunk_bucket=4)
    pipe = SpeakerDiarizationPipeline(
        cfg,
        params=params,
        pyannet_cfg=SMALL_PYANNET,
        ecapa_cfg=SMALL_ECAPA,
        seg_batch=4,
        emb_batch=4,
        device_clustering=False,
    )
    blocks = np.array_split(wav, 14)

    def run(disable_freeze):
        stream = StreamingDiarizer(pipe, emit_every=8, recluster_every=4)
        if disable_freeze:
            stream._advance_seam = lambda *a, **k: None
        outs = []
        for b in blocks:
            ann = stream.feed(b)
            outs.append(None if ann is None else str(ann))
        outs.append(str(stream.flush()))
        return outs, stream

    frozen_outs, frozen_stream = run(disable_freeze=False)
    plain_outs, _ = run(disable_freeze=True)
    assert frozen_outs == plain_outs
    # the freeze must have engaged (seam advanced, turns frozen)
    assert frozen_stream._seam_cidx > 0
    assert len(frozen_stream._frozen_turns) > 0
    # and flush equals offline exactly
    assert frozen_outs[-1] == str(pipe(wav))


def test_doubling_recluster_schedule(tiny_pipeline):
    """recluster_schedule='doubling': full reclusters run at exponentially
    growing emission intervals (capped), flush still reclusters fully and
    stays offline-exact."""
    audio = _audio(14 * 16000, seed=41)
    stream = StreamingDiarizer(
        tiny_pipeline,
        emit_every=1,
        recluster_schedule="doubling",
        recluster_max_interval=4,
    )
    for b in np.array_split(audio, 20):
        stream.feed(b)
    final = stream.flush()
    rc = stream.recluster_emissions
    assert rc[:4] == [0, 2, 6, 10]  # gaps 2, 4, 4 (doubling capped at 4)
    # the final entry is flush's forced recluster (may be adjacent)
    assert all(b - a >= 2 for a, b in zip(rc[:-1], rc[1:-1]))
    assert str(final) == str(tiny_pipeline(audio))
    with pytest.raises(ValueError):
        StreamingDiarizer(tiny_pipeline, recluster_schedule="bogus")
