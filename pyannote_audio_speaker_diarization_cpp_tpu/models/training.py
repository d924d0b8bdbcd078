"""Training steps for the segmentation and embedding models.

The reference ships no training at all (SURVEY.md section 2.3) — models are
frozen ONNX exports. A complete framework needs the training loop that
produces those checkpoints, so this module provides:

  - permutation-invariant BCE training for PyanNet (the pyannote
    segmentation objective: the loss is minimized over local-speaker
    permutations per sample), and
  - AAM-softmax (additive angular margin) classification training for
    ECAPA-TDNN (the speechbrain speaker-id objective).

Both steps are pure functions over (params, opt_state, batch) and jit/pjit
cleanly over a data-parallel mesh: batch axis sharded, parameters replicated,
gradients psum'd by XLA from the sharding alone.
"""

from __future__ import annotations

import itertools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from . import ecapa as ecapa_mod
from . import layers as L
from . import pyannet as pyannet_mod


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# segmentation: permutation-invariant BCE
# ---------------------------------------------------------------------------


def _bce(probs, labels, eps=1e-7):
    p = jnp.clip(probs, eps, 1 - eps)
    return -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))


def pit_bce_loss(
    params: Dict,
    waveforms: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: pyannet_mod.PyanNetConfig,
) -> jnp.ndarray:
    """Permutation-invariant BCE: min over local-speaker permutations,
    averaged over the batch. labels: (B, frames, num_classes) in {0,1}."""
    probs = pyannet_mod.pyannet_forward(params, waveforms, cfg)
    losses = []
    for perm in itertools.permutations(range(cfg.num_classes)):
        permuted = probs[..., list(perm)]
        losses.append(jnp.mean(_bce(permuted, labels), axis=(1, 2)))
    per_sample = jnp.min(jnp.stack(losses, axis=0), axis=0)
    return jnp.mean(per_sample)


def make_segmentation_train_step(
    optimizer: optax.GradientTransformation,
    cfg: pyannet_mod.PyanNetConfig = pyannet_mod.PyanNetConfig(),
):
    def train_step(state: TrainState, waveforms, labels) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(pit_bce_loss)(
            state.params, waveforms, labels, cfg
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


# ---------------------------------------------------------------------------
# embedding: AAM-softmax speaker classification
# ---------------------------------------------------------------------------


def init_aam_head(key, emb_dim: int, num_classes: int) -> Dict:
    w = jax.random.normal(key, (num_classes, emb_dim)) * 0.01
    return {"weight": w}


def aam_softmax_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    head: Dict,
    margin: float = 0.2,
    scale: float = 30.0,
) -> jnp.ndarray:
    """Additive angular margin softmax (ArcFace), speechbrain's speaker-id
    objective. labels: (B,) int."""
    emb = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True)
    w = head["weight"] / jnp.linalg.norm(head["weight"], axis=-1, keepdims=True)
    cos = emb @ w.T
    theta = jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7))
    target_cos = jnp.cos(theta + margin)
    onehot = jax.nn.one_hot(labels, w.shape[0])
    logits = scale * (onehot * target_cos + (1 - onehot) * cos)
    return jnp.mean(optax.softmax_cross_entropy(logits, onehot))


def ecapa_classification_loss(
    params: Dict,
    head: Dict,
    feats: jnp.ndarray,
    lengths: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: ecapa_mod.EcapaConfig,
) -> jnp.ndarray:
    emb = ecapa_mod.ecapa_forward(params, feats, lengths, cfg)
    return aam_softmax_loss(emb, labels, head)


def make_embedding_train_step(
    optimizer: optax.GradientTransformation,
    cfg: ecapa_mod.EcapaConfig = ecapa_mod.EcapaConfig(),
):
    def loss_fn(both, feats, lengths, labels):
        return ecapa_classification_loss(
            both["params"], both["head"], feats, lengths, labels, cfg
        )

    def train_step(state: TrainState, feats, lengths, labels):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, feats, lengths, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step
