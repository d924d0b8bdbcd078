"""Streaming (online) speaker diarization.

The reference is strictly offline — the whole WAV is read up front and the
sliding-window loop runs to completion (reference
pipeline/src/speakerDiarizer.cpp:2937-3234; its only streaming primitive is
a WAV *writer*, frontend/wav.h:193). This module adds the online mode a
serving deployment needs: feed audio as it arrives, get an evolving
diarization, and a final flush that is **string-identical to the offline
pipeline** on the same audio (tested).

Design: audio accumulates in a bounded buffer; whenever ``emit_every``
new 5 s / 0.5 s chunks are fully covered by buffered samples, stages 1+2 run
on exactly those chunks (``SpeakerDiarizationPipeline.run_chunks`` — the
same jitted dispatches as offline, so shapes stay static and compiled), and
their per-chunk outputs append to the running state. Emission re-runs the
cheap host-side global steps (speaker count aggregation, clustering over all
embeddings so far, timeline reconstruction) — chunk outputs never change
retroactively, so the final flush decomposes exactly like the long-form
sharded path (parallel/longform.py), which is proven equal to single-shot.

Memory: O(processed chunks) for the tiny per-chunk outputs (293x3 scores +
3x192 embeddings) plus at most ``window + emit_every*step`` buffered
samples — an hour-long stream never holds the waveform.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import numpy as np

from ..core.annotation import Annotation
from ..core.sliding_window import SlidingWindow
from ..models import pyannet as pyannet_mod
from . import reconstruct as rec
from .diarization import SpeakerDiarizationPipeline


class _PrecomputedClusters:
    """Clusterer stand-in carrying an already-computed assignment (the
    incremental streaming path assigns new embeddings to stored centroids
    instead of re-running AHC on every emission)."""

    def __init__(self, hard: np.ndarray, soft: np.ndarray):
        self._hard, self._soft = hard, soft

    def __call__(self, embeddings, **kwargs):
        return self._hard, self._soft


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
        # are assigned to the stored centroids — pyannote's own assign path
        # (clustering/base.py assign_embeddings) — so per-emit cost is
        # O(N*K) instead of O(N^2) AHC. recluster_every=1 reclusters always.
        self.recluster_every = max(1, recluster_every)
        self._speaker_bounds = (num_speakers, min_speakers, max_speakers)
        seg = pipeline.config.segmentation
        self._window = seg.window_size
        self._step = seg.step_size
        self.reset()

    def reset(self) -> None:
        self._buffer = np.zeros(0, dtype=np.float32)
        self._offset = 0  # absolute sample index of buffer[0]
        self._done_chunks = 0
        self._segs: list = []
        self._binarized: list = []
        self._embeddings: list = []
        self._flushed = False
        self._emit_count = 0
        self._centroids: Optional[np.ndarray] = None
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
        self._done_chunks = hi
        # drop samples no future chunk needs
        keep_from = hi * self._step
        if keep_from > self._offset:
            self._buffer = self._buffer[keep_from - self._offset :]
            self._offset = keep_from

    def _emit(self, num_samples: int, force_full: bool = False) -> Annotation:
        if not self._segs:
            return Annotation()
        p = self.pipeline
        seg_cfg = p.config.segmentation
        segs = np.concatenate(self._segs, axis=0)
        binz = np.concatenate(self._binarized, axis=0)
        embs = np.concatenate(self._embeddings, axis=0)
        chunk_frames = SlidingWindow(
            0.0, seg_cfg.step, seg_cfg.duration, num_samples=num_samples
        )
        frame_grid = SlidingWindow(
            seg_cfg.frame_start, seg_cfg.frame_step, seg_cfg.frame_duration
        )
        count, count_frames = rec.speaker_count(
            binz, chunk_frames, frame_grid, num_samples, warm_up=seg_cfg.warm_up
        )
        count_frames = dataclasses.replace(count_frames, num_samples=num_samples)
        ns, mins, maxs = self._speaker_bounds

        full = (
            force_full
            or self._centroids is None
            or self._emit_count % self.recluster_every == 0
        )
        self._emit_count += 1
        if full:
            hard, soft = p.clusterer(
                embs,
                num_clusters=ns or p.config.num_speakers,
                min_clusters=mins or p.config.min_speakers,
                max_clusters=maxs or p.config.max_speakers,
            )
            hard = np.asarray(hard)
            # store centroids for the incremental emissions that follow
            flat = embs.reshape(-1, embs.shape[-1])
            hf = hard.reshape(-1)
            valid = ~np.isnan(flat).any(axis=1)
            k_count = max(int(hard.max()) + 1, 1)
            cents = np.zeros((k_count, flat.shape[-1]), np.float64)
            for k in range(k_count):
                members = valid & (hf == k)
                if members.any():
                    cents[k] = flat[members].mean(axis=0)
            self._centroids = cents
        else:
            hard, soft = _assign_to_centroids(embs, self._centroids)
        return p.finalize(
            segs, binz, embs, count, count_frames, chunk_frames,
            num_speakers=ns, min_speakers=mins, max_speakers=maxs,
            clusterer=_PrecomputedClusters(hard, soft),
        )

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
        seg_cfg = p.config.segmentation
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
            # the local orphan sample offset inside the processed range is
            # relative to the range start; run_chunks re-derives it from the
            # local chunk index, so pass the true global tail length
            self._process_range(
                self._done_chunks, num_chunks, orphan_frames, orphan_samples
            )
        # always a FULL recluster: flush == offline pipeline, exactly
        return self._emit(num_samples, force_full=True)
