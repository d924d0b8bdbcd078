"""Vectorized hysteresis binarization.

Re-design of pyannote's `binarize_ndarray` (reference
segment/segment.py:419-482; C++ port at pipeline/src/speakerDiarizer.cpp:
1506-1663 with helpers wellDefinedIndex/cumulativeSum/numpy_where at
:623-709).

The reference builds, per row, the list of "well-defined" frame indices
(frames where score > onset or score < offset) and then gathers the on/off
state of the most recent well-defined frame. That is a running maximum in
disguise: ``state[t] = on[last_well_defined_index <= t]``. We compute it with
one cummax + one gather — O(F) parallel work, no ragged index lists, fully
jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binarize_scores(
    scores: jnp.ndarray,
    onset: float,
    offset: float | None = None,
    initial_state: bool | None = None,
) -> jnp.ndarray:
    """(batch, num_frames) scores -> boolean hysteresis states.

    Semantics identical to binarize_ndarray (segment/segment.py:419-482):
      - frames with score > onset switch on,
      - frames with score < offset switch off,
      - in-between frames carry the previous well-defined state forward,
      - frames before the first well-defined frame take ``initial_state``
        (default: score[0] >= (onset+offset)/2).
    NaNs are treated as 0 (np.nan_to_num in the original).
    """
    if offset is None:
        offset = onset
    scores = jnp.nan_to_num(scores)

    on = scores > onset
    off_or_on = (scores < offset) | on

    if initial_state is None:
        init = scores[:, 0] >= 0.5 * (onset + offset)
    else:
        init = jnp.full((scores.shape[0],), bool(initial_state))

    num_frames = scores.shape[1]
    frame_idx = jnp.arange(num_frames)[None, :]
    # index of the most recent well-defined frame at or before t; -1 if none
    marked = jnp.where(off_or_on, frame_idx, -1)
    last_defined = jax.lax.cummax(marked, axis=1)
    state = jnp.take_along_axis(on, jnp.maximum(last_defined, 0), axis=1)
    return jnp.where(last_defined >= 0, state, init[:, None])


def binarize_swf(
    scores: jnp.ndarray,
    onset: float,
    offset: float | None = None,
    initial_state: bool | None = None,
) -> jnp.ndarray:
    """(num_chunks, num_frames, num_classes) -> float binarized scores.

    Matches binarize_swf (segment/segment.py:357-417): rearrange
    ``c f k -> (c k) f``, binarize rows, rearrange back, cast to float.
    """
    c, f, k = scores.shape
    rows = jnp.transpose(scores, (0, 2, 1)).reshape(c * k, f)
    binarized = binarize_scores(rows, onset, offset, initial_state)
    return jnp.transpose(binarized.reshape(c, k, f), (0, 2, 1)).astype(jnp.float32)
