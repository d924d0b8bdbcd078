"""End-to-end pipeline, reconstruction, and IO tests (CPU, random weights)."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_audio_speaker_diarization_cpp_tpu.config import (
    DiarizationConfig,
    SegmentationConfig,
)
from pyannote_audio_speaker_diarization_cpp_tpu.core.segment import Segment
from pyannote_audio_speaker_diarization_cpp_tpu.core.sliding_window import SlidingWindow
from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio
from pyannote_audio_speaker_diarization_cpp_tpu.io import resample as rs
from pyannote_audio_speaker_diarization_cpp_tpu.pipelines import reconstruct as rec
from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
    SpeakerDiarizationPipeline,
)


# ---------------------------------------------------------------------------
# io
# ---------------------------------------------------------------------------


def test_wav_roundtrip_16bit():
    rng = np.random.default_rng(0)
    samples = rng.integers(-30000, 30000, size=(1, 4000)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.wav")
        wavio.write_wav(path, samples, 16000, 16)
        data = wavio.read_wav(path)
        assert data.sample_rate == 16000
        assert data.bits_per_sample == 16
        np.testing.assert_array_equal(data.samples, samples)


def test_wav_stream_writer_matches_batch():
    rng = np.random.default_rng(1)
    samples = rng.integers(-1000, 1000, size=3000).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p1, p2 = os.path.join(d, "a.wav"), os.path.join(d, "b.wav")
        wavio.write_wav(p1, samples, 8000, 16)
        with wavio.StreamWavWriter(p2, 1, 8000, 16) as w:
            for i in range(0, 3000, 700):
                w.write(samples[i : i + 700])
        assert open(p1, "rb").read() == open(p2, "rb").read()


def test_wav_reader_reference_file(reference_wav_path):
    data = wavio.read_wav(reference_wav_path)
    assert data.sample_rate == 16000
    assert data.num_channels == 1
    assert data.bits_per_sample == 16
    assert 50 < data.duration < 70  # ~1 minute


def test_resample_preserves_tone():
    sr1, sr2 = 8000, 16000
    t1 = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440 * t1).astype(np.float32)
    y = rs.resample(x, sr1, sr2)
    assert abs(len(y) - sr2) <= 2
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(y[: sr2]))
    assert abs(np.argmax(spec) - 440) <= 2


# ---------------------------------------------------------------------------
# reconstruction
# ---------------------------------------------------------------------------


def test_trim():
    binarized = np.random.default_rng(0).uniform(size=(4, 293, 3))
    frames = SlidingWindow(0.0, 0.5, 5.0)
    trimmed, tf = rec.trim(binarized, frames)
    assert trimmed.shape == (4, 293 - 58, 3)
    assert tf.start == pytest.approx(0.5)
    assert tf.duration == pytest.approx(4.0)
    np.testing.assert_array_equal(trimmed, binarized[:, 29:264, :])


def test_speaker_count_simple():
    # two chunks, constant activity: 2 speakers in chunk 0, 1 in chunk 1
    binarized = np.zeros((2, 293, 3))
    binarized[0, :, 0] = 1
    binarized[0, :, 1] = 1
    binarized[1, :, 0] = 1
    chunk_frames = SlidingWindow(0.0, 0.5, 5.0)
    frame_grid = SlidingWindow(0.0, 0.016875, 0.016875)
    count, count_frames = rec.speaker_count(binarized, chunk_frames, frame_grid, 88000)
    assert count_frames.start == pytest.approx(0.5)
    # non-overlap region of chunk 0 -> 2; chunk-1-only region -> 1; trailing
    # grid frames past the last trimmed chunk get missing=0 (reference
    # aggregate missing=0.0, speakerDiarizer.cpp:1720)
    # chunk0 trimmed covers [0.5,4.5], chunk1 [1.0,5.0]; overlap averages
    # (2+1)/2=1.5 -> banker's 2; chunk-1-only region [4.5,5.0) -> 1
    assert count[0] == 2
    assert count[100] == 2
    assert count[250] == 1
    assert set(np.unique(count)) <= {0, 1, 2}


def test_reconstruct_and_annotation():
    """One chunk, one active cluster -> one turn of the right span."""
    num_frames = 293
    seg = np.zeros((1, num_frames, 3), dtype=np.float32)
    seg[0, 50:200, 0] = 0.9
    hard = np.array([[0, -2, -2]])
    # count grid starts at 0.5 s; active seg frames 50..200 span
    # [0.84, 3.38] s -> count indices ~20..170. Elsewhere count=0 (the
    # binary decode gives every frame its top-`count` speakers, so count
    # must be 0 on silence).
    count = np.zeros(280, dtype=np.int64)
    count[20:170] = 1
    chunk_frames = SlidingWindow(0.0, 0.5, 5.0)
    count_frames = SlidingWindow(0.5, 0.016875, 0.016875)
    discrete, frames = rec.reconstruct(seg, chunk_frames, hard, count, count_frames)
    assert discrete.shape[1] == 1
    ann = rec.to_annotation(discrete, frames, 0.5, 0.5, 0.0, 0.58)
    turns = ann.turns()
    assert len(turns) == 1
    # active frames 50..200 at 0.016875 s/frame ~ [0.84, 3.38]
    assert turns[0].start == pytest.approx(50 * 0.016875, abs=0.1)
    assert turns[0].end == pytest.approx(200 * 0.016875, abs=0.1)


def test_to_annotation_gap_filling():
    frames = SlidingWindow(0.0, 0.1, 0.1)
    scores = np.zeros((40, 1))
    scores[5:10, 0] = 1.0
    scores[12:20, 0] = 1.0  # 0.2 s gap -> filled with min_duration_off=0.5
    scores[30:35, 0] = 1.0  # 1.0 s gap -> kept separate
    ann = rec.to_annotation(scores, frames, 0.5, 0.5, 0.0, 0.5)
    assert len(ann.turns()) == 2


# ---------------------------------------------------------------------------
# end-to-end (small config, CPU)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_pipeline(tiny1s_pipeline):
    return tiny1s_pipeline


def test_pipeline_runs_on_synthetic_audio(small_pipeline):
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.normal(size=5 * 16000)).astype(np.float32)
    ann = small_pipeline(audio)
    # random weights: just require structural sanity
    for t in ann.turns():
        assert t.end > t.start >= 0.0
    timings = small_pipeline.timings
    assert timings.segmentation > 0 and timings.fetch > 0
    # profile mode measures true per-stage completion waits
    small_pipeline.profile = True
    try:
        small_pipeline(audio)
        timings = small_pipeline.timings
        assert timings.segmentation > 0 and timings.embedding > 0
    finally:
        small_pipeline.profile = False


def test_pipeline_deterministic(small_pipeline):
    rng = np.random.default_rng(1)
    audio = (0.1 * rng.normal(size=3 * 16000)).astype(np.float32)
    a1 = small_pipeline(audio)
    a2 = small_pipeline(audio)
    assert str(a1) == str(a2)


def test_pipeline_accepts_stereo_and_resamples(small_pipeline):
    rng = np.random.default_rng(2)
    audio = (0.1 * rng.normal(size=(2, 2 * 8000))).astype(np.float32)
    ann = small_pipeline(audio, sample_rate=8000)
    assert ann is not None


def test_device_post_cluster_matches_host_twin(small_pipeline):
    """The production path reduces the resident segmentation scores on
    device after host clustering (_post_cluster: per-cluster max +
    skip-average overlap-add) so the full (chunks, frames, speakers) tensor
    never travels; the dump path runs the host twin
    (reconstruct.reconstruct). Both must produce identical turns — and the
    device activations must match the host aggregation bit-for-bit-ish."""
    from pyannote_audio_speaker_diarization_cpp_tpu.utils.debug_dump import (
        DumpSession,
    )

    rng = np.random.default_rng(7)
    # structured multi-band audio so random weights produce several clusters
    t = np.arange(int(7.3 * 16000)) / 16000.0
    audio = (
        0.2 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 0.3 * t) > 0)
        + 0.2 * np.sin(2 * np.pi * 880 * t) * (np.sin(2 * np.pi * 0.21 * t + 1) > 0)
        + 0.02 * rng.normal(size=t.shape)
    ).astype(np.float32)

    ann_device = small_pipeline(audio)
    dump = DumpSession(write_text=False)
    ann_host = small_pipeline(audio, dump=dump)
    assert str(ann_device) == str(ann_host)

    # the host twin's aggregated activations == the device _post_cluster
    # output (dumped as to_diarization_activations by the host path)
    host_act = dump.tensors.get("to_diarization_activations")
    assert host_act is not None and np.isfinite(host_act).all()


def test_pipeline_orphan_chunk_handling(small_pipeline):
    rng = np.random.default_rng(3)
    # 2.3 s -> orphan chunk of 0.3 s
    audio = (0.1 * rng.normal(size=int(2.3 * 16000))).astype(np.float32)
    ann = small_pipeline(audio)
    assert ann is not None


def test_pipeline_bfloat16_compute_dtype_close_to_f32():
    """compute_dtype="bfloat16" runs the ECAPA trunk in bf16; embeddings
    must stay within a fraction of the reference's own numerics envelope
    (abs 0.02, reference README.md:99-101)."""
    import dataclasses as dc

    from _cfg import SMALL_ECAPA, SMALL_PYANNET, TINY1S_CFG

    from pyannote_audio_speaker_diarization_cpp_tpu.utils.debug_dump import (
        DumpSession,
    )

    cfg32 = dc.replace(TINY1S_CFG, compute_dtype="float32")
    cfg16 = dc.replace(cfg32, compute_dtype="bfloat16")
    rng = np.random.default_rng(21)
    audio = (0.1 * rng.normal(size=5 * 16000)).astype(np.float32)

    p32 = SpeakerDiarizationPipeline(
        cfg32, seed=0, seg_batch=8, emb_batch=8,
        pyannet_cfg=SMALL_PYANNET, ecapa_cfg=SMALL_ECAPA,
    )
    p16 = SpeakerDiarizationPipeline(
        cfg16, seed=0, params=p32.params, seg_batch=8, emb_batch=8,
        pyannet_cfg=SMALL_PYANNET, ecapa_cfg=SMALL_ECAPA,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        s32, s16 = DumpSession(d1, "a"), DumpSession(d2, "b")
        p32(audio, dump=s32)
        p16(audio, dump=s16)
        e32 = s32.tensors["embeddings"]
        e16 = s16.tensors["embeddings"]
    valid = ~np.isnan(e32).any(axis=-1)
    assert np.array_equal(valid, ~np.isnan(e16).any(axis=-1))
    diff = np.abs(e32[valid] - e16[valid])
    assert diff.max() < 0.005  # << the reference's 0.02 envelope


def test_pipeline_map_equals_sequential(small_pipeline):
    """Pipelined batch mode (map): all stages dispatched before any
    collection — results must equal one-at-a-time calls exactly."""
    rng = np.random.default_rng(21)
    audios = [
        (0.1 * rng.normal(size=int(s * 16000))).astype(np.float32)
        for s in (3.0, 4.7, 2.2)
    ]
    batched = small_pipeline.map(audios)
    singles = [small_pipeline(a) for a in audios]
    assert [str(a) for a in batched] == [str(a) for a in singles]


def test_to_annotation_fast_path_equals_loop():
    """The vectorized equal-threshold decode must match the hysteresis loop
    exactly on binary inputs of every edge shape (empty, all-on, edges at
    both ends, singleton runs)."""
    frames = SlidingWindow(0.3, 0.016875, 0.016875)
    rng = np.random.default_rng(5)
    cases = [
        np.zeros((50, 3)),
        np.ones((50, 2)),
        (rng.uniform(size=(400, 4)) > 0.7).astype(float),
        np.array([[1.0], [0.0], [1.0], [0.0], [1.0]]),
    ]
    for scores in cases:
        fast = rec.to_annotation(scores, frames, 0.5, 0.5, 0.0, 0.0)
        # force the loop path via distinct thresholds that behave
        # identically on 0/1 data (on: >0.5; off: <0.5 vs <0.500001 — both
        # only triggered by 0.0)
        loop = rec.to_annotation(scores + 0.0, frames, 0.5, 0.500001, 0.0, 0.0)
        assert str(fast) == str(loop), scores[:10, 0]


def test_pipeline_ecapa_layout_variants_match(tiny1s_pipeline):
    """The nhc (channels-last) and gemm (shifted-dot) ECAPA trunk layouts
    (docs/PERF.md round-5 stage-2 experiments) must produce the same turns
    as the default trunk through the full pipeline."""
    from _cfg import make_tiny1s_pipeline

    rng = np.random.default_rng(61)
    audio = (0.1 * rng.normal(size=4 * 16000 + 900)).astype(np.float32)
    want = str(tiny1s_pipeline(audio))
    for layout in ("nhc", "gemm"):
        p = make_tiny1s_pipeline(ecapa_layout=layout)
        assert str(p(audio)) == want, layout
    with pytest.raises(ValueError):
        make_tiny1s_pipeline(ecapa_layout="bogus")
