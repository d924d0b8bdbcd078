"""Embedding-only pipeline: batch speaker-embedding extraction + scoring.

First-class version of the reference's stage 2 (getEmbedding,
pipeline/src/speakerDiarizer.cpp:2436-2561; speechbrain encode_batch path in
embeddings/threeModel.py): masked or unmasked 5 s windows -> 192-d
embeddings, plus cosine-similarity scoring for verification workflows.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, DiarizationConfig
from ..models import ecapa as ecapa_mod
from ..models import layers as L
from ..ops import frontend as fe
from ..ops import masks as mk


class EmbeddingPipeline:
    """(batch, num_samples) waveforms [+ frame masks] -> (batch, 192)."""

    def __init__(
        self,
        config: DiarizationConfig = DEFAULT_CONFIG,
        params: Optional[Dict] = None,
        seed: int = 0,
        batch_size: Optional[int] = None,
        precision=L.DEFAULT_PRECISION,
        ecapa_cfg: Optional["ecapa_mod.EcapaConfig"] = None,
    ):
        self.config = config
        self.ecapa_cfg = ecapa_cfg or ecapa_mod.EcapaConfig(
            in_channels=config.frontend.n_mels
        )
        if params is None:
            params = {
                "embedding": ecapa_mod.init_ecapa(
                    jax.random.PRNGKey(seed), self.ecapa_cfg
                )
            }
        self.params = params
        self.batch_size = batch_size or config.embedding.batch_size
        cfg = config

        def step(p, chunks, masks):
            signals, wav_lens, too_short = mk.pack_and_lengths(
                chunks, masks, cfg.embedding.mask_threshold, cfg.embedding.min_num_samples
            )
            feats = fe.compute_features(signals, wav_lens, cfg.frontend)
            emb = ecapa_mod.ecapa_forward(
                p, feats, wav_lens, self.ecapa_cfg, precision=precision
            )
            return emb, too_short

        def step_unmasked(p, chunks):
            lens = jnp.ones((chunks.shape[0],), chunks.dtype)
            feats = fe.compute_features(chunks, lens, cfg.frontend)
            return ecapa_mod.ecapa_forward(
                p, feats, lens, self.ecapa_cfg, precision=precision
            )

        self._step = jax.jit(step)
        self._step_unmasked = jax.jit(step_unmasked)

    def __call__(
        self,
        waveforms: np.ndarray,
        masks: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Extract embeddings; rows whose mask keeps < min_num_samples come
        back NaN (reference semantics, segment/segment.py:298-303)."""
        waveforms = jnp.asarray(waveforms, jnp.float32)
        n = waveforms.shape[0]
        outs = []
        for start in range(0, n, self.batch_size):
            stop = min(start + self.batch_size, n)
            wpiece = waveforms[start:stop]
            pad = self.batch_size - (stop - start)
            if pad:
                wpiece = jnp.pad(wpiece, ((0, pad), (0, 0)))
            if masks is None:
                emb = self._step_unmasked(self.params["embedding"], wpiece)
                outs.append(np.asarray(emb[: stop - start], dtype=np.float64))
            else:
                mpiece = jnp.asarray(masks[start:stop], jnp.float32)
                if pad:
                    mpiece = jnp.pad(mpiece, ((0, pad), (0, 0)))
                emb, too_short = self._step(self.params["embedding"], wpiece, mpiece)
                emb = np.asarray(emb[: stop - start], dtype=np.float64)
                emb[np.asarray(too_short[: stop - start])] = np.nan
                outs.append(emb)
        return np.concatenate(outs, axis=0)

    @staticmethod
    def cosine_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Pairwise cosine similarity between two embedding sets."""
        an = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        bn = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
        return an @ bn.T
