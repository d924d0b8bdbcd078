"""Overlap-add aggregation of chunked scores onto the global frame grid.

Re-design of pyannote ``Inference.aggregate`` (reference C++ port at
pipeline/src/speakerDiarizer.cpp:1161-1313). The reference accumulates with a
triple scalar loop; frame offsets are data-independent, so on TPU this is one
scatter-add over a precomputed index grid.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sliding_window import SlidingWindow


@dataclasses.dataclass(frozen=True)
class AggregationPlan:
    """Host-side static plan: where each chunk lands on the output grid."""

    start_frames: np.ndarray  # (num_chunks,) int32
    num_frames: int
    frames: SlidingWindow  # output frame grid


def plan_aggregation(
    num_chunks: int,
    scores_frames: SlidingWindow,
    frame_grid: SlidingWindow,
    num_samples: int = 0,
) -> AggregationPlan:
    """Compute the output grid and per-chunk start frames.

    Mirrors speakerDiarizer.cpp:1230-1253: the output grid starts where the
    chunk grid starts and uses the model frame step/duration; the number of
    output frames reaches the end of the last chunk.
    """
    frames = SlidingWindow(
        start=scores_frames.start,
        step=frame_grid.step,
        duration=frame_grid.duration,
        num_samples=num_samples,
    )
    frame_target = (
        scores_frames.start
        + scores_frames.duration
        + (num_chunks - 1) * scores_frames.step
    )
    num_frames = frames.closest_frame(frame_target) + 1
    chunk_starts = scores_frames.start + np.arange(num_chunks) * scores_frames.step
    start_frames = np.array(
        [frames.closest_frame(t) for t in chunk_starts], dtype=np.int32
    )
    return AggregationPlan(start_frames=start_frames, num_frames=num_frames, frames=frames)


def aggregate(
    scores: jnp.ndarray,
    start_frames: jnp.ndarray,
    num_frames: int,
    missing: float = np.nan,
    skip_average: bool = False,
    epsilon: float = float(np.finfo(np.float64).eps),
) -> jnp.ndarray:
    """(num_chunks, chunk_frames, K) -> (num_frames, K) overlap-add.

    NaN scores contribute nothing (mask=0); output frames that received no
    valid contribution are set to ``missing``. With ``skip_average`` the raw
    sum is returned (used by to_diarization, speakerDiarizer.cpp:2647-2651).
    """
    num_chunks, chunk_frames, num_classes = scores.shape
    masks = (~jnp.isnan(scores)).astype(scores.dtype)
    clean = jnp.nan_to_num(scores)

    idx = start_frames[:, None] + jnp.arange(chunk_frames)[None, :]
    agg = jnp.zeros((num_frames, num_classes), scores.dtype).at[idx].add(clean * masks)
    count = jnp.zeros((num_frames, num_classes), scores.dtype).at[idx].add(masks)
    seen = jnp.zeros((num_frames, num_classes), scores.dtype).at[idx].max(masks)

    if not skip_average:
        agg = agg / jnp.maximum(count, epsilon)
    return jnp.where(seen == 0.0, jnp.asarray(missing, scores.dtype), agg)


def aggregate_numpy(
    scores: np.ndarray,
    start_frames: np.ndarray,
    num_frames: int,
    missing: float = np.nan,
    skip_average: bool = False,
    epsilon: float = float(np.finfo(np.float64).eps),
) -> np.ndarray:
    """Numpy mirror of ``aggregate`` for host-resident callers — the
    reconstruction-stage aggregations are a few MB, and one device dispatch
    plus fetch costs more than the whole computation on host."""
    scores = np.asarray(scores)
    num_chunks, chunk_frames, num_classes = scores.shape
    masks = (~np.isnan(scores)).astype(scores.dtype)
    clean = np.nan_to_num(scores)
    idx = (np.asarray(start_frames)[:, None] + np.arange(chunk_frames)[None, :]).reshape(-1)
    # match jax's .at[].add out-of-bounds semantics: drop OOB contributions
    # (np.add.at would raise on idx >= num_frames and wrap negatives)
    oob = (idx < 0) | (idx >= num_frames)
    if oob.any():
        masks = masks.reshape(-1, num_classes).copy()
        masks[oob] = 0
        masks = masks.reshape(num_chunks, chunk_frames, num_classes)
        idx = np.where(oob, 0, idx)

    agg = np.zeros((num_frames, num_classes), scores.dtype)
    count = np.zeros((num_frames, num_classes), scores.dtype)
    seen = np.zeros((num_frames, num_classes), scores.dtype)
    np.add.at(agg, idx, (clean * masks).reshape(-1, num_classes))
    np.add.at(count, idx, masks.reshape(-1, num_classes))
    np.maximum.at(seen, idx, masks.reshape(-1, num_classes))

    if not skip_average:
        agg = agg / np.maximum(count, epsilon)
    return np.where(seen == 0.0, scores.dtype.type(missing), agg)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _aggregate_jit(scores, start_frames, num_frames, missing, skip_average):
    return aggregate(
        scores, start_frames, num_frames, missing=missing, skip_average=skip_average
    )


def aggregate_compiled(
    scores,
    start_frames,
    num_frames: int,
    missing: float = np.nan,
    skip_average: bool = False,
):
    """Aggregate for host-driven callers. Host (numpy) inputs run the numpy
    mirror — a device dispatch + fetch round trip dwarfs these small
    aggregations, especially over remote-tunnel TPU backends. Device-array
    inputs keep the single jitted dispatch."""
    if isinstance(scores, np.ndarray):
        return aggregate_numpy(
            scores,
            np.asarray(start_frames),
            int(num_frames),
            missing=missing,
            skip_average=skip_average,
        )
    return _aggregate_jit(
        jnp.asarray(scores),
        jnp.asarray(start_frames),
        int(num_frames),
        float(missing),
        bool(skip_average),
    )
