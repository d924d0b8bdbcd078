"""Segmentation-only pipeline: VAD + per-speaker activity timeline.

The reference exposes this implicitly (stage 1 of speakerDiarization,
reference pipeline/src/speakerDiarizer.cpp:2953-3028; Python original
segment/segment.py:148-167); here it is a first-class pipeline — sliding
PyanNet inference, overlap-add aggregation onto the global frame grid, and
hysteresis decoding into speech turns per local-speaker class or merged VAD.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, DiarizationConfig
from ..core.annotation import Annotation
from ..core.sliding_window import SlidingWindow, SlidingWindowFeature
from ..io import resample as rs
from ..io import wav as wavio
from ..models import layers as L
from ..models import pyannet as pyannet_mod
from ..ops import aggregate as agg
from ..ops import windows as win
from . import reconstruct as rec


class SegmentationPipeline:
    """wav -> (aggregated activations, VAD annotation)."""

    def __init__(
        self,
        config: DiarizationConfig = DEFAULT_CONFIG,
        params: Optional[Dict] = None,
        seed: int = 0,
        seg_batch: Optional[int] = None,
        precision=L.DEFAULT_PRECISION,
        pyannet_cfg: Optional[pyannet_mod.PyanNetConfig] = None,
    ):
        self.config = config
        self.pyannet_cfg = pyannet_cfg or pyannet_mod.PyanNetConfig(
            sample_rate=config.segmentation.sample_rate,
            num_classes=config.segmentation.num_speakers,
        )
        if params is None:
            params = {
                "segmentation": pyannet_mod.init_pyannet(
                    jax.random.PRNGKey(seed), self.pyannet_cfg
                )
            }
        self.params = params
        self.seg_batch = seg_batch or config.segmentation.batch_size
        self._seg_step = jax.jit(
            lambda p, c: pyannet_mod.pyannet_forward(
                p, c, self.pyannet_cfg, precision=precision
            )
        )

    def slide(self, waveform: np.ndarray) -> SlidingWindowFeature:
        """Sliding-window inference -> (num_chunks, frames, speakers)."""
        seg_cfg = self.config.segmentation
        num_samples = waveform.shape[0]
        num_chunks = win.chunk_count(
            num_samples, seg_cfg.window_size, seg_cfg.step_size
        )
        chunks = win.chunk_waveform(
            jnp.asarray(waveform), num_chunks, seg_cfg.window_size, seg_cfg.step_size
        )
        outs = []
        for start in range(0, num_chunks, self.seg_batch):
            stop = min(start + self.seg_batch, num_chunks)
            piece = chunks[start:stop]
            if stop - start < self.seg_batch:
                piece = jnp.pad(
                    piece, ((0, self.seg_batch - (stop - start)), (0, 0))
                )
            outs.append(
                self._seg_step(self.params["segmentation"], piece)[: stop - start]
            )
        scores = jnp.concatenate(outs, axis=0)
        orphan = num_samples - (num_chunks - 1) * seg_cfg.step_size
        if orphan < seg_cfg.window_size:
            valid = max(pyannet_mod.pyannet_num_frames(orphan, self.pyannet_cfg), 0)
            fidx = jnp.arange(scores.shape[1])
            scores = jnp.concatenate(
                [scores[:-1], jnp.where((fidx < valid)[None, :, None], scores[-1:], 0.0)],
                axis=0,
            )
        frames = SlidingWindow(
            0.0, seg_cfg.step, seg_cfg.duration, num_samples=num_samples
        )
        return SlidingWindowFeature(np.asarray(scores), frames)

    def __call__(
        self,
        audio: Union[str, np.ndarray],
        sample_rate: Optional[int] = None,
        merge_speakers: bool = True,
    ) -> Annotation:
        """VAD / speaker-activity decode of the aggregated activations.

        merge_speakers=True collapses classes to one voice-activity class.
        """
        cfg = self.config
        seg_cfg = cfg.segmentation
        if isinstance(audio, str):
            data = wavio.read_wav(audio)
            waveform = data.normalized_mono()
            if data.sample_rate != seg_cfg.sample_rate:
                waveform = rs.resample(
                    waveform, data.sample_rate, seg_cfg.sample_rate
                ).astype(np.float32)
        else:
            waveform = np.asarray(audio, dtype=np.float32)
            if waveform.ndim == 2:
                waveform = rs.downmix(waveform)
            if sample_rate is not None and sample_rate != seg_cfg.sample_rate:
                waveform = rs.resample(waveform, sample_rate, seg_cfg.sample_rate)

        swf = self.slide(waveform)
        frame_grid = SlidingWindow(
            seg_cfg.frame_start, seg_cfg.frame_step, seg_cfg.frame_duration
        )
        plan = agg.plan_aggregation(
            len(swf), swf.sliding_window, frame_grid, waveform.shape[0]
        )
        activations = np.asarray(
            agg.aggregate_compiled(
                swf.data.astype(np.float32), plan.start_frames, plan.num_frames,
                missing=0.0,
            )
        )
        if merge_speakers:
            activations = activations.max(axis=1, keepdims=True)
        return rec.to_annotation(
            activations,
            plan.frames,
            onset=seg_cfg.onset,
            offset=seg_cfg.offset,
            min_duration_on=seg_cfg.min_duration_on,
            min_duration_off=seg_cfg.min_duration_off,
        )
