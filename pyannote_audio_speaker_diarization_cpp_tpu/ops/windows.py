"""Sliding-window chunking of waveforms, as one gather (no Python loop).

The reference copies each 5 s window into a fresh buffer inside a scalar loop
(reference pipeline/src/speakerDiarizer.cpp:1419-1480, segment/segment.py:79-93,
via tensor.unfold). On TPU we materialize all chunks with a single static
gather so the whole (num_chunks, window) batch feeds the model in one jitted
call.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def chunk_count(num_samples: int, window_size: int, step_size: int) -> int:
    """Total number of sliding chunks including the orphan last chunk.

    Matches Segmentation.slide (segment/segment.py:79-93): complete windows
    plus one ragged window when the audio does not end on a window boundary.
    """
    if num_samples < window_size:
        return 1
    num_complete = (num_samples - window_size) // step_size + 1
    if (num_samples - window_size) % step_size > 0:
        return num_complete + 1
    return num_complete


def chunk_waveform(
    waveform: jnp.ndarray,
    num_chunks: int,
    window_size: int,
    step_size: int,
) -> jnp.ndarray:
    """(num_samples,) -> (num_chunks, window_size) sliding windows.

    The waveform must already be zero-padded to at least
    ``(num_chunks - 1) * step_size + window_size`` samples; the orphan last
    chunk therefore arrives zero-padded on the *input* side. The reference
    instead runs the short chunk and zero-pads the model *output*
    (segment/segment.py:103-108); because PyanNet instance-normalizes over
    time, the padded-input scores deviate slightly (~0.008 sigmoid) on the
    orphan's valid frames — the pipeline masks the padded tail and offers
    exact_orphan=True for reference-exact behavior.
    """
    needed = (num_chunks - 1) * step_size + window_size
    pad = needed - waveform.shape[0]
    if pad > 0:
        waveform = jnp.pad(waveform, (0, pad))
    starts = jnp.arange(num_chunks) * step_size
    idx = starts[:, None] + jnp.arange(window_size)[None, :]
    return waveform[idx]


def chunk_starts_seconds(num_chunks: int, step: float) -> np.ndarray:
    """Start time of each chunk in seconds (host-side)."""
    return np.arange(num_chunks) * step
