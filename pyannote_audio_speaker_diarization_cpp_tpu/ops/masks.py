"""Mask preparation for the masked-embedding stage, fully vectorized.

Re-design of the reference's host loops (pipeline/src/speakerDiarizer.cpp):
  - cleanSegmentations  :710-743  (zero out frames with overlapping speech)
  - interpolate         :745-768  (nearest-neighbor mask upsampling 293->80000)
  - padSequence         :769-799  (left-pack speech samples, zero pad)
  - wav_lens handling in getEmbedding :2436-2510
Python originals: segment/segment.py:179-215, :283-303.

Everything is static-shape jnp: the left-pack is a stable argsort on the
boolean mask (kept samples keep their time order and move to the front),
which XLA lowers to an on-device sort — no ragged tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def clean_segmentations(binarized: jnp.ndarray) -> jnp.ndarray:
    """(num_chunks, num_frames, num_speakers) -> same, overlap frames zeroed.

    Keep a frame iff fewer than 2 speakers are active in it
    (segment/segment.py:179-181).
    """
    clean = (jnp.sum(binarized, axis=2, keepdims=True) < 2).astype(binarized.dtype)
    return binarized * clean


def choose_masks(
    binarized: jnp.ndarray,
    cleaned: jnp.ndarray,
    min_num_frames: float,
) -> jnp.ndarray:
    """Per (chunk, speaker): use the clean mask when it retains enough frames,
    else fall back to the raw binarized mask (speakerDiarizer.cpp:3056-3078).

    Inputs are (num_chunks, num_frames, num_speakers); output is
    (num_chunks, num_speakers, num_frames) — one mask row per embedding.
    """
    clean_sum = jnp.sum(cleaned, axis=1)  # (chunks, speakers)
    use_clean = (clean_sum > min_num_frames)[:, None, :]
    chosen = jnp.where(use_clean, cleaned, binarized)
    chosen = jnp.nan_to_num(chosen)
    return jnp.transpose(chosen, (0, 2, 1))


def interpolate_nearest(masks: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """(batch, num_frames) -> (batch, num_samples) nearest-neighbor upsample.

    Matches torch F.interpolate(mode="nearest") as used at
    segment/segment.py:283-287: out[i] = in[floor(i * in_size / out_size)].
    """
    num_frames = masks.shape[-1]
    src = (jnp.arange(num_samples) * num_frames) // num_samples
    return masks[..., src]


def left_pack(waveforms: jnp.ndarray, imasks: jnp.ndarray) -> jnp.ndarray:
    """Gather samples where imask is set, left-packed, zero-padded.

    Equivalent to ``pad_sequence([w[m] for w, m in zip(wavs, masks)])`` padded
    to the full window (segment/segment.py:289-292). Kept samples scatter to
    position cumsum(mask)-1 (their packed index); dropped samples scatter to
    a discard slot past the end. One O(n) cumsum + one scatter — cheaper on
    TPU than the stable-sort formulation (no 80k-wide sort).
    """
    keep = imasks > 0.5
    n = waveforms.shape[-1]
    pos = jnp.where(keep, jnp.cumsum(keep, axis=-1) - 1, n)
    batch_idx = jnp.arange(waveforms.shape[0])[:, None]
    out = jnp.zeros((waveforms.shape[0], n + 1), waveforms.dtype)
    out = out.at[batch_idx, pos].set(jnp.where(keep, waveforms, 0.0), mode="drop")
    return out[:, :n]


def pack_frame_runs(
    waveforms: jnp.ndarray,
    keep_frames: jnp.ndarray,
    num_samples: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Left-pack whole sample-runs of kept frames; returns (packed, lens).

    Exact equivalent of nearest-upsampling a {0,1} frame mask to sample level
    and left-packing the kept samples (the binarized masks the pipeline
    passes are always 0/1, so kept samples are exactly the sample-runs of
    kept frames). Works on (num_frames,)-sized tables plus one ordered
    gather — avoiding the 80k-wide scatter, which costs ~13ms/batch on TPU.
    """
    num_frames = keep_frames.shape[-1]
    # static per (num_frames, num_samples): samples per frame under
    # out[i] = in[floor(i * F / n)]
    src = (np.arange(num_samples) * num_frames) // num_samples
    run_len = np.bincount(src, minlength=num_frames).astype(np.int32)
    orig_start = np.concatenate([[0], np.cumsum(run_len)[:-1]]).astype(np.int32)

    keep = keep_frames > 0.5
    packed_len = jnp.where(keep, jnp.asarray(run_len), 0)
    packed_cum = jnp.cumsum(packed_len, axis=-1)  # inclusive
    lens = packed_cum[..., -1]

    # source[j] = j + offset(j) where offset is a step function that jumps to
    # (orig_start[f] - packed_start[f]) at each kept frame's packed_start.
    # Kept frames have strictly increasing packed_start, offsets are
    # non-decreasing -> a (num_frames,)-sized scatter-max + cummax recovers
    # the step function with no search.
    packed_start = packed_cum - packed_len
    offset_f = jnp.asarray(orig_start) - packed_start
    batch = waveforms.shape[0]
    scatter_idx = jnp.where(keep, packed_start, num_samples)
    A = jnp.full((batch, num_samples + 1), jnp.iinfo(jnp.int32).min, jnp.int32)
    A = A.at[jnp.arange(batch)[:, None], scatter_idx].max(
        jnp.where(keep, offset_f, jnp.iinfo(jnp.int32).min).astype(jnp.int32),
        mode="drop",
    )
    offset = jax.lax.cummax(A[:, :num_samples], axis=1)
    j = jnp.arange(num_samples)
    source = jnp.clip(j[None, :] + offset, 0, num_samples - 1)
    packed = jnp.take_along_axis(waveforms, source, axis=-1)
    return jnp.where(j[None, :] < lens[:, None], packed, 0.0), lens


def pack_and_lengths(
    waveforms: jnp.ndarray,
    masks: jnp.ndarray,
    mask_threshold: float,
    min_num_samples: int,
    backend: str = "auto",
):
    """Full embedding-preprocessing step for a batch of (chunk, speaker) rows.

    Parameters
    ----------
    waveforms : (batch, num_samples) cropped 5 s windows
    masks : (batch, num_frames) chosen per-speaker frame masks

    Returns
    -------
    signals : (batch, num_samples) left-packed speech samples
    wav_lens : (batch,) relative lengths for the embedding model, normalized
        by the padded window size (num_samples). The reference normalizes by
        the batch max length (speakerDiarizer.cpp:2467-2510) because torch
        pad_sequence pads to the batch max; our fixed-shape batch is padded to
        the full window, so window-relative lengths put the feature-frame mask
        at the same absolute boundary (round(rel*T) covers exactly the packed
        speech region — see ops/frontend.py).
    too_short : (batch,) bool — rows with fewer than min_num_samples kept
        samples; their embeddings must be replaced by NaN downstream
        (segment/segment.py:298-303).

    ``backend``: "pallas" (the ops/pack_pallas.py kernel — ~25x faster than
    any XLA formulation on TPU, bit-exact), "jnp" (pack_frame_runs — the
    frame-run gather, partitionable by XLA under a mesh), "scatter" (the
    sample-level left_pack scatter, kept as the direct transcription of the
    reference semantics), or "auto" (pallas on TPU, jnp elsewhere). Nearest
    interpolation is value-preserving, so thresholding at frame level before
    upsampling is identical to thresholding after — the pallas and jnp paths
    never materialize the sample-level mask.
    """
    num_samples = waveforms.shape[-1]
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas":
        from .pack_pallas import pack_frames_pallas

        keep_frames = (masks > mask_threshold).astype(waveforms.dtype)
        signals, lens = pack_frames_pallas(waveforms, keep_frames, num_samples)
    elif backend == "jnp":
        keep_frames = masks > mask_threshold
        signals, lens = pack_frame_runs(waveforms, keep_frames, num_samples)
    else:
        imasks = interpolate_nearest(masks, num_samples) > mask_threshold
        signals = left_pack(waveforms, imasks.astype(waveforms.dtype))
        lens = jnp.sum(imasks, axis=-1)
    too_short = lens < min_num_samples
    wav_lens = jnp.where(too_short, 1.0, lens / num_samples)
    return signals, wav_lens, too_short
