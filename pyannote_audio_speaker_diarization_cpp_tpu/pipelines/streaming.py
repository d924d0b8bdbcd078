"""Streaming (online) speaker diarization.

The reference is strictly offline — the whole WAV is read up front and the
sliding-window loop runs to completion (reference
pipeline/src/speakerDiarizer.cpp:2937-3234; its only streaming primitive is
a WAV *writer*, frontend/wav.h:193). This module adds the online mode a
serving deployment needs: feed audio as it arrives, get an evolving
diarization, and a final flush that is **string-identical to the offline
pipeline's HOST-clustering decode** (``device_clustering=False``; tested).
Against the default offline path (fused on-device clustering) the flush is
partition-equivalent — same turn boundaries, cluster labels renamed — per
the documented device-clustering numbering deviation (docs/PARITY.md).

Design: audio accumulates in a bounded buffer; whenever ``emit_every``
new 5 s / 0.5 s chunks are fully covered by buffered samples, stages 1+2 run
on exactly those chunks (``SpeakerDiarizationPipeline.run_chunks`` — the
same jitted dispatches as offline, so shapes stay static and compiled), and
their per-chunk outputs append to the running state.

Emissions are INCREMENTAL (O(new chunks) per emission, not O(all chunks)):

  - The speaker-count overlap-add is maintained as running numerator /
    denominator grids, extended per batch. ``np.add.at`` applies additions
    sequentially in index order and batches arrive in chunk order, so the
    running grids are BITWISE identical to the one-shot aggregation
    (pipelines/reconstruct.py speaker_count) at every emission; the grids
    keep each chunk's full reach so frames a shorter one-shot grid would
    have dropped appear exactly when the grid grows past them.
  - Between reclusters, NEW chunks are assigned to the stored centroids
    (pyannote's own assign path, clustering/base.py assign_embeddings) and
    their per-cluster max activations are folded into a running
    skip-average diarization grid — already-folded chunks are never
    touched. A full AHC recluster (every ``recluster_every``-th emission,
    and always at flush) re-labels everything and rebuilds the grid, so
    label drift cannot accumulate.
  - The emission decode (top-count binarization + hysteresis) reads the
    running grids directly — the concatenate-everything recompute of the
    round-3 implementation (O(stream length) per emission, O(N^2) per
    stream) is gone.

Label policy note: between reclusters, a chunk KEEPS the label it got when
first folded (fold-once). The round-3 implementation re-assigned every old
chunk to the stored centroids on every emission — same labels in practice
(assignment to fixed centroids is deterministic), but O(N) per emission.

Memory: O(processed chunks) for the tiny per-chunk outputs (293x3 scores +
3x192 embeddings) plus at most ``window + emit_every*step`` buffered
samples — an hour-long stream never holds the waveform.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from ..core.annotation import Annotation
from ..core.sliding_window import SlidingWindow
from ..models import pyannet as pyannet_mod
from . import reconstruct as rec
from .diarization import SpeakerDiarizationPipeline


def _assign_to_centroids(embeddings: np.ndarray, centroids: np.ndarray):
    """pyannote's centroid assignment (soft = 2 - cosine distance, hard =
    argmax; clustering/base.py assign_embeddings / reference
    Clustering.py:97-164) against FIXED centroids."""
    from ..clustering.base import cosine_cdist

    c, s, d = embeddings.shape
    with np.errstate(invalid="ignore", divide="ignore"):
        e2k = cosine_cdist(embeddings.reshape(-1, d), centroids).reshape(c, s, -1)
    soft = 2.0 - e2k
    hard = np.argmax(np.nan_to_num(soft, nan=-np.inf), axis=2)
    return hard, soft


class _GrowGrid:
    """Append-only overlap-add grid, bitwise-equal to the one-shot
    ``aggregate_numpy``: np.add.at applies additions sequentially in the
    given index order, and batches arrive in global chunk order, so the
    partial sums associate exactly like a single pass. Contributions beyond
    the current one-shot length are RETAINED (capacity has headroom); the
    ``view()`` crop reproduces the one-shot's out-of-bounds drop, and a
    later, longer grid legitimately exposes them."""

    def __init__(self, num_classes: int, dtype=np.float32):
        self.length = 0  # current one-shot num_frames
        self._num = np.zeros((0, num_classes), dtype)

    def _ensure(self, n: int) -> None:
        if n > self._num.shape[0]:
            grow = max(n - self._num.shape[0], self._num.shape[0], 1024)
            self._num = np.vstack(
                [self._num, np.zeros((grow, self._num.shape[1]), self._num.dtype)]
            )

    def add(self, scores: np.ndarray, start_frames: np.ndarray, num_frames: int):
        """scores: (batch_chunks, F, K), NaN = no contribution."""
        nb, F, K = scores.shape
        self._ensure(num_frames + F)
        masks = ~np.isnan(scores)
        clean = np.nan_to_num(scores).astype(self._num.dtype)
        idx = (np.asarray(start_frames)[:, None] + np.arange(F)[None, :]).reshape(-1)
        np.add.at(self._num, idx, (clean * masks).reshape(-1, K))
        self.length = max(self.length, num_frames)

    def view(self) -> np.ndarray:
        return self._num[: self.length]


def _plan_rows(scores_frames: SlidingWindow, frame_grid: SlidingWindow, lo: int, hi: int):
    """Per-chunk start frames for chunks [lo, hi) plus the one-shot grid
    length for hi chunks — the exact formulas of ops/aggregate.py
    plan_aggregation, computed only for the new range."""
    frames = SlidingWindow(
        start=scores_frames.start,
        step=frame_grid.step,
        duration=frame_grid.duration,
    )
    frame_target = (
        scores_frames.start + scores_frames.duration + (hi - 1) * scores_frames.step
    )
    num_frames = frames.closest_frame(frame_target) + 1
    chunk_starts = scores_frames.start + np.arange(lo, hi) * scores_frames.step
    start_frames = np.array(
        [frames.closest_frame(t) for t in chunk_starts], dtype=np.int32
    )
    return start_frames, num_frames, frames


class StreamingDiarizer:
    """Incremental wrapper around a SpeakerDiarizationPipeline.

    Usage::

        stream = StreamingDiarizer(pipeline, emit_every=8)
        for block in audio_blocks:          # arbitrary block sizes, 16 kHz
            ann = stream.feed(block)        # None until enough new chunks
            if ann is not None: ...         # diarization of audio so far
        final = stream.flush()              # == offline pipeline(audio)
    """

    def __init__(
        self,
        pipeline: SpeakerDiarizationPipeline,
        emit_every: int = 8,
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
        recluster_every: int = 4,
    ):
        self.pipeline = pipeline
        self.emit_every = max(1, emit_every)
        # Full AHC runs on every `recluster_every`-th emission (and always at
        # flush, keeping flush == offline exact); in between, new embeddings
        # are assigned to the stored centroids and folded into the running
        # grids — per-emit cost is O(new chunks + timeline decode).
        self.recluster_every = max(1, recluster_every)
        self._speaker_bounds = (num_speakers, min_speakers, max_speakers)
        seg = pipeline.config.segmentation
        self._window = seg.window_size
        self._step = seg.step_size
        # static frame grids (emission-independent)
        self._chunk_grid = SlidingWindow(0.0, seg.step, seg.duration)
        self._frame_grid = SlidingWindow(
            seg.frame_start, seg.frame_step, seg.frame_duration
        )
        wl, wr = seg.warm_up
        self._trimmed_grid = SlidingWindow(
            start=wl * seg.duration,
            step=seg.step,
            duration=(1 - wl - wr) * seg.duration,
        )
        self.reset()

    def reset(self) -> None:
        self._buffer = np.zeros(0, dtype=np.float32)
        self._offset = 0  # absolute sample index of buffer[0]
        self._done_chunks = 0
        self._segs: list = []
        self._binarized: list = []
        self._embeddings: list = []
        self._batch_bounds: list = []  # [(lo, hi)] chunk range per batch
        self._flushed = False
        self._emit_count = 0
        self._centroids: Optional[np.ndarray] = None
        # running speaker-count grids (numerator / overlap denominator)
        self._count_num = _GrowGrid(1)
        self._count_den = _GrowGrid(1)
        # running diarization grid (skip-average sums per cluster) + fold
        # state: number of batches folded, max cluster id seen
        self._dia: Optional[_GrowGrid] = None
        self._dia_folded_batches = 0
        self._k_used = 1
        # labels each folded chunk was folded under ((chunks, S) int array);
        # lets a recluster whose labels match the folded prefix skip the
        # grid rebuild entirely (the grid was built in the same addition
        # order a rebuild would use, so keeping it is bitwise-identical)
        self._folded_hard: Optional[np.ndarray] = None
        #: wall-clock seconds of each feed() that produced an emission
        self.feed_latencies: List[float] = []

    # ------------------------------------------------------------------

    @property
    def total_samples(self) -> int:
        return self._offset + self._buffer.shape[0]

    def _complete_chunks(self) -> int:
        """Chunks fully covered by the samples received so far."""
        if self.total_samples < self._window:
            return 0
        return (self.total_samples - self._window) // self._step + 1

    def _process_range(
        self, lo: int, hi: int, orphan_frames=None, orphan_samples=None
    ) -> None:
        start = lo * self._step
        end = (hi - 1) * self._step + self._window
        piece = self._buffer[start - self._offset : end - self._offset]
        if piece.shape[0] < end - start:  # flush tail: zero-pad
            piece = np.pad(piece, (0, end - start - piece.shape[0]))
        segs, binz, emb = self.pipeline.run_chunks(
            piece, hi - lo, orphan_frames, orphan_samples
        )
        self._segs.append(segs)
        self._binarized.append(binz)
        self._embeddings.append(emb)
        self._batch_bounds.append((lo, hi))
        self._done_chunks = hi
        # running speaker count: trim + per-frame speaker sum for the NEW
        # chunks only (label-independent, never rebuilt)
        trimmed, _ = rec.trim(
            binz, self._chunk_grid, *self.pipeline.config.segmentation.warm_up
        )
        summed = trimmed.sum(axis=-1, keepdims=True).astype(np.float32)
        rows, nf, _ = _plan_rows(self._trimmed_grid, self._frame_grid, lo, hi)
        self._count_num.add(summed, rows, nf)
        self._count_den.add(np.ones_like(summed), rows, nf)
        # drop samples no future chunk needs
        keep_from = hi * self._step
        if keep_from > self._offset:
            self._buffer = self._buffer[keep_from - self._offset :]
            self._offset = keep_from

    # ------------------------------------------------------------------
    # emission machinery
    # ------------------------------------------------------------------

    def _clustered_batch(self, segs: np.ndarray, hard: np.ndarray, K: int):
        """Per-cluster max over member local speakers, NaN where the chunk
        has no member — the reconstruct formula
        (pipelines/reconstruct.py reconstruct / speakerDiarizer.cpp:
        2766-2787), f32 like to_diarization's aggregation input."""
        nb, F, S = segs.shape
        clustered = np.full((nb, F, K), np.nan, np.float32)
        for k in range(K):
            member = hard == k
            has = member.any(axis=1)
            if has.any():
                masked = np.where(member[:, None, :], segs, -np.inf)
                clustered[has, :, k] = masked.max(axis=2)[has]
        return clustered

    def _fold_batch(self, idx: int, hard: np.ndarray) -> None:
        """Fold batch ``idx``'s clustered activations into the running
        diarization grid under labels ``hard`` ((nb, S), -2 for inactive)."""
        lo, hi = self._batch_bounds[idx]
        K = self._dia._num.shape[1]
        clustered = self._clustered_batch(self._segs[idx], hard, K)
        rows, nf, _ = _plan_rows(self._chunk_grid, self._frame_grid, lo, hi)
        self._dia.add(clustered, rows, nf)

    def _recluster(self) -> None:
        """Full AHC over every embedding so far; store centroids; rebuild
        the diarization grid under the fresh labels."""
        p = self.pipeline
        ns, mins, maxs = self._speaker_bounds
        embs = np.concatenate(self._embeddings, axis=0)
        hard, _soft = p.clusterer(
            embs,
            num_clusters=ns or p.config.num_speakers,
            min_clusters=mins or p.config.min_speakers,
            max_clusters=maxs or p.config.max_speakers,
        )
        hard = np.asarray(hard)
        binz = np.concatenate(self._binarized, axis=0)
        hard[binz.sum(axis=1) == 0] = -2  # speakerDiarizer.cpp:3166-3191
        k_count = max(int(hard.max()) + 1, 1)
        # centroids for the incremental emissions that follow
        flat = embs.reshape(-1, embs.shape[-1])
        hf = hard.reshape(-1)
        valid = ~np.isnan(flat).any(axis=1)
        cents = np.zeros((k_count, flat.shape[-1]), np.float64)
        for k in range(k_count):
            members = valid & (hf == k)
            if members.any():
                cents[k] = flat[members].mean(axis=0)
        self._centroids = cents
        self._k_used = k_count

        folded_chunks = (
            self._batch_bounds[self._dia_folded_batches - 1][1]
            if self._dia_folded_batches
            else 0
        )
        prefix_ok = (
            self._dia is not None
            and self._dia._num.shape[1] == k_count
            and self._folded_hard is not None
            and self._folded_hard.shape[0] == folded_chunks
            and np.array_equal(self._folded_hard, hard[:folded_chunks])
        )
        if prefix_ok:
            # the recluster did not change any folded chunk's labels (the
            # common steady-state case): keep the grid, fold only the new
            # batches under their fresh labels
            pos = folded_chunks
            for idx in range(self._dia_folded_batches, len(self._batch_bounds)):
                lo, hi = self._batch_bounds[idx]
                self._fold_batch(idx, hard[pos : pos + hi - lo])
                pos += hi - lo
        else:
            # consolidate stored batches into one block FIRST: the rebuild
            # and every later recluster then run one vectorized fold instead
            # of a python loop over every batch the stream ever produced
            # (chunk order is preserved, so the np.add.at bitwise
            # equivalence holds)
            if len(self._batch_bounds) > 1:
                self._segs = [np.concatenate(self._segs, axis=0)]
                self._binarized = [binz]
                self._embeddings = [embs]
                self._batch_bounds = [
                    (self._batch_bounds[0][0], self._batch_bounds[-1][1])
                ]
            self._dia = _GrowGrid(k_count)
            pos = 0
            for idx, (lo, hi) in enumerate(self._batch_bounds):
                nb = hi - lo
                self._fold_batch(idx, hard[pos : pos + nb])
                pos += nb
        self._dia_folded_batches = len(self._batch_bounds)
        self._folded_hard = hard

    def _fold_new_batches(self) -> None:
        """Assign each not-yet-folded batch to the stored centroids and fold
        it (fold-once; O(new chunks))."""
        for idx in range(self._dia_folded_batches, len(self._batch_bounds)):
            hard, _ = _assign_to_centroids(self._embeddings[idx], self._centroids)
            hard = np.asarray(hard)
            hard[self._binarized[idx].sum(axis=1) == 0] = -2
            if hard.max() >= 0:
                self._k_used = max(self._k_used, int(hard.max()) + 1)
            self._fold_batch(idx, hard)
            self._folded_hard = (
                hard
                if self._folded_hard is None
                else np.concatenate([self._folded_hard, hard], axis=0)
            )
        self._dia_folded_batches = len(self._batch_bounds)

    def _decode(self, num_samples: int) -> Annotation:
        """Timeline decode straight from the running grids — identical
        formulas to reconstruct.speaker_count + to_diarization tails."""
        p = self.pipeline
        seg_cfg = p.config.segmentation
        eps = float(np.finfo(np.float64).eps)
        num = self._count_num.view()[:, 0]
        den = self._count_den.view()[:, 0]
        avg = num / np.maximum(den, eps)
        count = np.rint(np.where(den == 0.0, 0.0, avg)).astype(np.int64)
        count_frames = SlidingWindow(
            self._trimmed_grid.start,
            self._frame_grid.step,
            self._frame_grid.duration,
            num_samples=num_samples,
        )
        activations = self._dia.view()[:, : self._k_used]
        dia_frames = SlidingWindow(
            self._chunk_grid.start, self._frame_grid.step, self._frame_grid.duration
        )
        binary, binary_frames = rec.binarize_by_count(
            activations, dia_frames, count, count_frames
        )
        return rec.to_annotation(
            binary,
            binary_frames,
            onset=p.config.clustering.binarize_onset,
            offset=p.config.clustering.binarize_offset,
            min_duration_on=seg_cfg.min_duration_on,
            min_duration_off=seg_cfg.min_duration_off,
        )

    def _emit(self, num_samples: int, force_full: bool = False) -> Annotation:
        if not self._segs:
            return Annotation()
        full = (
            force_full
            or self._centroids is None
            or self._emit_count % self.recluster_every == 0
        )
        self._emit_count += 1
        if full:
            self._recluster()
        else:
            self._fold_new_batches()
        return self._decode(num_samples)

    # ------------------------------------------------------------------

    def feed(self, samples: np.ndarray) -> Optional[Annotation]:
        """Append a block of 16 kHz mono samples; returns the diarization of
        the audio processed so far when >= emit_every new chunks completed,
        else None."""
        if self._flushed:
            raise RuntimeError("stream already flushed; call reset()")
        t0 = time.perf_counter()
        samples = np.asarray(samples, dtype=np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, samples])
        complete = self._complete_chunks()
        if complete - self._done_chunks < self.emit_every:
            return None
        self._process_range(self._done_chunks, complete)
        covered = (self._done_chunks - 1) * self._step + self._window
        annotation = self._emit(min(self.total_samples, covered))
        self.feed_latencies.append(time.perf_counter() - t0)
        return annotation

    def flush(self) -> Annotation:
        """Process the tail (including the short orphan chunk, zero-padded
        exactly like the offline pipeline) and return the final annotation."""
        if self._flushed:
            raise RuntimeError("stream already flushed; call reset()")
        self._flushed = True
        p = self.pipeline
        num_samples = self.total_samples
        if num_samples == 0:
            return Annotation()
        from ..ops import windows as win

        num_chunks = win.chunk_count(num_samples, self._window, self._step)
        if num_chunks > self._done_chunks:
            orphan_samples = num_samples - (num_chunks - 1) * self._step
            orphan_frames = None
            if orphan_samples < self._window:
                orphan_frames = max(
                    pyannet_mod.pyannet_num_frames(orphan_samples, p.pyannet_cfg), 0
                )
            self._process_range(
                self._done_chunks, num_chunks, orphan_frames, orphan_samples
            )
        # always a FULL recluster: flush == offline pipeline, exactly
        return self._emit(num_samples, force_full=True)
