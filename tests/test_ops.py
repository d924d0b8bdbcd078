"""Vectorized stage ops vs. straightforward loop oracles.

The oracles re-state the published pyannote/speechbrain semantics (see
reference segment/segment.py and pipeline/src/speakerDiarizer.cpp citations in
each op's docstring) as plain Python loops; the framework ops must match them
exactly (discrete ops) or to float tolerance.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.config import FrontendConfig
from pyannote_audio_speaker_diarization_cpp_tpu.core.sliding_window import SlidingWindow
from pyannote_audio_speaker_diarization_cpp_tpu.ops import aggregate as agg
from pyannote_audio_speaker_diarization_cpp_tpu.ops import binarize as bz
from pyannote_audio_speaker_diarization_cpp_tpu.ops import frontend as fe
from pyannote_audio_speaker_diarization_cpp_tpu.ops import masks as mk
from pyannote_audio_speaker_diarization_cpp_tpu.ops import windows as win


# ---------------------------------------------------------------------------
# binarize
# ---------------------------------------------------------------------------


def binarize_oracle(scores, onset, offset, initial_state=None):
    """Direct transcription of pyannote binarize_ndarray semantics
    (segment/segment.py:419-482)."""
    scores = np.nan_to_num(scores)
    batch, frames = scores.shape
    if initial_state is None:
        init = scores[:, 0] >= 0.5 * (onset + offset)
    else:
        init = np.full(batch, bool(initial_state))
    on = scores > onset
    off_or_on = (scores < offset) | on
    out = np.zeros_like(on)
    for b in range(batch):
        state = init[b]
        for f in range(frames):
            if off_or_on[b, f]:
                state = on[b, f]
            out[b, f] = state
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_binarize_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0, 1, size=(16, 50))
    # force some NaNs and some exact-threshold values
    scores[rng.uniform(size=scores.shape) < 0.05] = np.nan
    onset = offset = 0.4442333667381752
    ours = np.asarray(bz.binarize_scores(jnp.asarray(scores), onset, offset))
    expected = binarize_oracle(scores, onset, offset)
    np.testing.assert_array_equal(ours, expected)


def test_binarize_hysteresis_band():
    # onset 0.7, offset 0.3: values in (0.3, 0.7) carry previous state
    scores = np.array([[0.8, 0.5, 0.5, 0.2, 0.5, 0.9, 0.4, 0.1]])
    ours = np.asarray(bz.binarize_scores(jnp.asarray(scores), 0.7, 0.3))
    expected = binarize_oracle(scores, 0.7, 0.3)
    np.testing.assert_array_equal(ours, expected)
    assert ours.tolist() == [[True, True, True, False, False, True, True, False]]


def test_binarize_initial_state_false():
    scores = np.array([[0.5, 0.5, 0.8, 0.5]])
    ours = np.asarray(
        bz.binarize_scores(jnp.asarray(scores), 0.7, 0.3, initial_state=False)
    )
    assert ours.tolist() == [[False, False, True, True]]


def test_binarize_swf_layout():
    rng = np.random.default_rng(3)
    scores = rng.uniform(0, 1, size=(4, 20, 3))
    out = np.asarray(bz.binarize_swf(jnp.asarray(scores), 0.5))
    assert out.shape == scores.shape
    for k in range(3):
        expected = binarize_oracle(scores[:, :, k], 0.5, 0.5)
        np.testing.assert_array_equal(out[:, :, k].astype(bool), expected)


# ---------------------------------------------------------------------------
# aggregate
# ---------------------------------------------------------------------------


def aggregate_oracle(scores, start_frames, num_frames, missing, skip_average):
    """Loop transcription of PipelineHelper::aggregate
    (speakerDiarizer.cpp:1161-1313)."""
    num_chunks, chunk_frames, k = scores.shape
    out = np.zeros((num_frames, k))
    cnt = np.zeros((num_frames, k))
    seen = np.zeros((num_frames, k))
    for i in range(num_chunks):
        for j in range(chunk_frames):
            fj = start_frames[i] + j
            for c in range(k):
                v = scores[i, j, c]
                m = 0.0 if np.isnan(v) else 1.0
                out[fj, c] += (0.0 if np.isnan(v) else v) * m
                cnt[fj, c] += m
                seen[fj, c] = max(seen[fj, c], m)
    if not skip_average:
        out = out / np.maximum(cnt, np.finfo(np.float64).eps)
    out[seen == 0.0] = missing
    return out


@pytest.mark.parametrize("skip_average", [False, True])
def test_aggregate_matches_oracle(skip_average):
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(5, 10, 3))
    scores[rng.uniform(size=scores.shape) < 0.2] = np.nan
    start_frames = np.array([0, 4, 8, 12, 16], dtype=np.int32)
    num_frames = 16 + 10
    ours = np.asarray(
        agg.aggregate(
            jnp.asarray(scores),
            jnp.asarray(start_frames),
            num_frames,
            missing=0.0,
            skip_average=skip_average,
        )
    )
    expected = aggregate_oracle(scores, start_frames, num_frames, 0.0, skip_average)
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("skip_average", [False, True])
def test_aggregate_numpy_matches_oracle(skip_average):
    rng = np.random.default_rng(1)
    scores = rng.normal(size=(5, 10, 3))
    scores[rng.uniform(size=scores.shape) < 0.2] = np.nan
    start_frames = np.array([0, 4, 8, 12, 16], dtype=np.int32)
    num_frames = 16 + 10
    ours = agg.aggregate_numpy(
        scores, start_frames, num_frames, missing=0.0, skip_average=skip_average
    )
    expected = aggregate_oracle(scores, start_frames, num_frames, 0.0, skip_average)
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)
    # aggregate_compiled routes numpy inputs here
    routed = agg.aggregate_compiled(
        scores, start_frames, num_frames, missing=0.0, skip_average=skip_average
    )
    assert isinstance(routed, np.ndarray)
    np.testing.assert_allclose(routed, ours, rtol=1e-7)


def test_plan_aggregation_reference_grid():
    """The segmentation recipe: chunks every 0.5 s, 5 s window, frame grid
    0.016875 s. Reference prints start_frame per chunk
    (speakerDiarizer.cpp:1251-1252)."""
    chunk_grid = SlidingWindow(start=0.0, step=0.5, duration=5.0)
    frame_grid = SlidingWindow(start=0.0, step=0.016875, duration=0.016875)
    plan = agg.plan_aggregation(3, chunk_grid, frame_grid)
    # frame_target = 0 + 5 + 2*0.5 = 6.0 -> rint((6-0.0084375)/0.016875)+1
    expected_frames = int(np.rint((6.0 - 0.5 * 0.016875) / 0.016875)) + 1
    assert plan.num_frames == expected_frames
    np.testing.assert_array_equal(
        plan.start_frames,
        [int(np.rint(max(0.0, (t - 0.5 * 0.016875) / 0.016875))) for t in [0.0, 0.5, 1.0]],
    )


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------


def test_chunk_waveform_values():
    x = np.arange(100, dtype=np.float32)
    n = win.chunk_count(100, 40, 20)
    assert n == 4  # starts at 0,20,40,60(padded)
    chunks = np.asarray(win.chunk_waveform(jnp.asarray(x), n, 40, 20))
    assert chunks.shape == (4, 40)
    np.testing.assert_array_equal(chunks[0], x[0:40])
    np.testing.assert_array_equal(chunks[1], x[20:60])
    np.testing.assert_array_equal(chunks[3, :30], x[60:90].astype(np.float32) * 0 + x[60:90])


def test_chunk_count_matches_reference_formula():
    for n_samples in [80000, 88000, 88001, 944019, 79999, 160000]:
        n = win.chunk_count(n_samples, 80000, 8000)
        if n_samples < 80000:
            assert n == 1
        else:
            complete = (n_samples - 80000) // 8000 + 1
            orphan = 1 if (n_samples - 80000) % 8000 > 0 else 0
            assert n == complete + orphan


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------


def test_clean_segmentations():
    binarized = np.zeros((1, 4, 3))
    binarized[0, 0] = [1, 0, 0]  # single speaker: kept
    binarized[0, 1] = [1, 1, 0]  # overlap: zeroed
    binarized[0, 2] = [0, 0, 0]
    binarized[0, 3] = [1, 1, 1]
    out = np.asarray(mk.clean_segmentations(jnp.asarray(binarized)))
    np.testing.assert_array_equal(
        out, [[[1, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]]]
    )


def test_interpolate_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    masks = rng.uniform(0, 1, size=(4, 293)).astype(np.float32)
    ours = np.asarray(mk.interpolate_nearest(jnp.asarray(masks), 80000))
    theirs = (
        F.interpolate(torch.from_numpy(masks)[:, None, :], size=80000, mode="nearest")
        .squeeze(1)
        .numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


def test_left_pack_matches_pad_sequence_semantics():
    rng = np.random.default_rng(2)
    wav = rng.normal(size=(3, 20)).astype(np.float32)
    imask = rng.uniform(size=(3, 20)) > 0.5
    ours = np.asarray(mk.left_pack(jnp.asarray(wav), jnp.asarray(imask, jnp.float32)))
    for b in range(3):
        kept = wav[b][imask[b]]
        np.testing.assert_allclose(ours[b, : len(kept)], kept, rtol=1e-6)
        np.testing.assert_array_equal(ours[b, len(kept):], 0.0)


def test_choose_masks():
    binarized = np.zeros((2, 10, 3))
    binarized[0, :, 0] = 1  # speaker 0 active everywhere in chunk 0
    binarized[0, :5, 1] = 1  # overlap on first 5 frames
    cleaned = np.asarray(mk.clean_segmentations(jnp.asarray(binarized)))
    chosen = np.asarray(
        mk.choose_masks(jnp.asarray(binarized), jnp.asarray(cleaned), min_num_frames=3.0)
    )
    assert chosen.shape == (2, 3, 10)
    # speaker 0 chunk 0: clean mask keeps frames 5..9 (5 frames > 3) -> clean
    np.testing.assert_array_equal(chosen[0, 0], cleaned[0, :, 0])
    # speaker 1 chunk 0: clean mask empty (0 frames <= 3) -> raw mask
    np.testing.assert_array_equal(chosen[0, 1], binarized[0, :, 1])


def test_pack_frame_runs_matches_sample_level_pack():
    """Frame-run packing must exactly equal upsample+threshold+scatter."""
    rng = np.random.default_rng(7)
    for trial in range(3):
        wav = rng.normal(size=(4, 8000)).astype(np.float32)
        masks = (rng.uniform(size=(4, 29)) > 0.4).astype(np.float32)
        if trial == 2:
            masks = rng.uniform(size=(4, 29)).astype(np.float32)  # non-binary
        imasks = mk.interpolate_nearest(jnp.asarray(masks), 8000) > 0.5
        expected = np.asarray(
            mk.left_pack(jnp.asarray(wav), imasks.astype(jnp.float32))
        )
        packed, lens = mk.pack_frame_runs(
            jnp.asarray(wav), jnp.asarray(masks) > 0.5, 8000
        )
        np.testing.assert_array_equal(np.asarray(packed), expected)
        np.testing.assert_array_equal(
            np.asarray(lens), np.asarray(imasks).sum(axis=1)
        )


def test_pack_and_lengths():
    rng = np.random.default_rng(3)
    wav = rng.normal(size=(2, 1000)).astype(np.float32)
    masks = np.zeros((2, 10), dtype=np.float32)
    masks[0, :8] = 1.0  # 800 samples kept
    masks[1, 0] = 1.0  # 100 samples kept -> too short vs 640
    signals, wav_lens, too_short = mk.pack_and_lengths(
        jnp.asarray(wav), jnp.asarray(masks), 0.5, 640
    )
    assert np.asarray(too_short).tolist() == [False, True]
    assert np.asarray(wav_lens)[0] == pytest.approx(800 / 1000)
    assert np.asarray(wav_lens)[1] == 1.0
    np.testing.assert_allclose(np.asarray(signals)[0, :800], wav[0, :800], rtol=1e-6)


# ---------------------------------------------------------------------------
# frontend
# ---------------------------------------------------------------------------


def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = FrontendConfig()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 16000)).astype(np.float32)
    ours = np.asarray(fe.stft_power(jnp.asarray(x), cfg))
    ref = torch.stft(
        torch.from_numpy(x).double(),
        cfg.n_fft,
        cfg.hop_length,
        cfg.win_length,
        torch.hamming_window(cfg.win_length, dtype=torch.float64),
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    ref_power = (ref.real**2 + ref.imag**2).transpose(2, 1).numpy()
    assert ours.shape == ref_power.shape == (2, 101, 201)
    np.testing.assert_allclose(ours, ref_power, rtol=2e-3, atol=2e-3)


def test_log_mel_against_manual_numpy():
    cfg = FrontendConfig()
    rng = np.random.default_rng(5)
    power = rng.uniform(0, 10, size=(2, 50, cfg.num_freqs)).astype(np.float32)
    ours = np.asarray(fe.log_mel(jnp.asarray(power), cfg))
    mel = fe.mel_filterbank(cfg)
    fb = power.astype(np.float64) @ mel
    xdb = 10.0 * np.log10(np.maximum(fb, cfg.amin))
    xmax = xdb.max(axis=(-2, -1), keepdims=True)
    expected = np.maximum(xdb, xmax - cfg.top_db)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_shape_and_partition():
    cfg = FrontendConfig()
    mel = fe.mel_filterbank(cfg)
    assert mel.shape == (201, 80)
    assert (mel >= 0).all()
    # each filter has positive mass
    assert (mel.sum(axis=0) > 0).all()


def test_sentence_mean_norm():
    cfg = FrontendConfig()
    rng = np.random.default_rng(6)
    feats = rng.normal(size=(2, 10, 4)).astype(np.float32)
    wav_lens = np.array([1.0, 0.55], dtype=np.float32)
    out = np.asarray(fe.sentence_mean_norm(jnp.asarray(feats), jnp.asarray(wav_lens)))
    # row 0: mean over all 10 frames
    np.testing.assert_allclose(
        out[0], feats[0] - feats[0].mean(axis=0), rtol=1e-5, atol=1e-6
    )
    # row 1: actual = rint(0.55*10) = 6 (banker's), mean over first 6 frames
    actual = int(np.rint(0.55 * 10))
    np.testing.assert_allclose(
        out[1], feats[1] - feats[1][:actual].mean(axis=0), rtol=1e-5, atol=1e-6
    )


def test_compute_features_end_to_end_shape():
    cfg = FrontendConfig()
    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 80000)).astype(np.float32)
    lens = np.array([1.0, 0.5, 0.25], dtype=np.float32)
    feats = np.asarray(fe.compute_features(jnp.asarray(x), jnp.asarray(lens), cfg))
    assert feats.shape == (3, 501, 80)
    assert np.isfinite(feats).all()
