"""Closed-loop accuracy: train in-repo models, diarize, score against TRUTH.

The BASELINE accuracy target (DER parity with pyannote on the reference wav)
needs the published checkpoints, which cannot be fetched in this
environment (ingestion for them is built and tested in test_ingest.py).
This test closes the accuracy loop with what IS available: the in-repo
trainers produce a working segmentation + embedding model on synthetic
two-speaker audio, and the FULL production pipeline must then recover the
ground-truth diarization — a real DER gate against truth, not a self-pin
(cf. reference README.md:42-52, where accuracy is judged by comparing turn
structure against the expected output).

Deterministic under the test environment (fixed seeds + fixed XLA
config; the training trajectory is numerically sensitive, so the test
trains to a loss TARGET and asserts embedding separability before asking
the pipeline to cluster).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _cfg import SMALL_ECAPA, SMALL_PYANNET, TINY1S_CFG, make_tiny1s_pipeline

from pyannote_audio_speaker_diarization_cpp_tpu.core.annotation import Annotation
from pyannote_audio_speaker_diarization_cpp_tpu.metrics.der import der
from pyannote_audio_speaker_diarization_cpp_tpu.models import ecapa as E
from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as P
from pyannote_audio_speaker_diarization_cpp_tpu.models import training as T
from pyannote_audio_speaker_diarization_cpp_tpu.ops import frontend as FE

SR = 16000


def _tone(rng, speaker: int, n: int) -> np.ndarray:
    """Two synthetic 'speakers' with distinct harmonic stacks."""
    t = np.arange(n) / SR
    f0 = 300.0 if speaker == 0 else 1200.0
    x = sum(
        0.3 / k * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 2 * np.pi))
        for k in (1, 2, 3)
    )
    return x.astype(np.float32)


@pytest.mark.slow
def test_train_then_diarize_recovers_ground_truth():
    import optax

    rng = np.random.default_rng(0)
    F = P.pyannet_num_frames(SR, SMALL_PYANNET)

    def make_window():
        """1 s training window with random A/B/silence structure + labels."""
        wav = np.zeros(SR, np.float32)
        lab = np.zeros((F, 3), np.float32)
        tpos = 0
        slot_of = {}
        while tpos < SR:
            seg = int(rng.uniform(0.2, 1.5) * SR)  # long segments: the eval
            # signal holds multi-second turns, so fully-covered windows
            # must appear in training
            kind = rng.integers(0, 3)  # A / B / silence
            if kind < 2:
                slot_of.setdefault(kind, len(slot_of))
                s = slot_of[kind]
                wav[tpos : tpos + seg] += _tone(rng, kind, min(seg, SR - tpos))
                f0, f1 = int(tpos / SR * F), int(min(tpos + seg, SR) / SR * F)
                lab[f0:f1, s] = 1.0
            tpos += seg
        wav += 0.01 * rng.normal(size=SR).astype(np.float32)
        return wav, lab

    # ---- train PyanNet with the in-repo PIT-BCE step ----
    opt = optax.adam(1e-3)
    params = P.init_pyannet(jax.random.PRNGKey(0), SMALL_PYANNET)
    state = T.TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(T.make_segmentation_train_step(opt, SMALL_PYANNET))
    B = 16
    seg_loss = None
    for it in range(1000):
        ws, ls = zip(*[make_window() for _ in range(B)])
        state, seg_loss = step(
            state, jnp.asarray(np.stack(ws)), jnp.asarray(np.stack(ls))
        )
        # train to a TARGET, not a step count: the trajectory is numerically
        # sensitive to XLA config, the endpoint must not be
        if it >= 300 and float(seg_loss) < 0.06:
            break
    assert float(seg_loss) < 0.12, f"segmentation did not converge: {seg_loss}"
    seg_params = state.params

    # ---- train ECAPA with the in-repo AAM-softmax step ----
    fcfg = TINY1S_CFG.frontend
    tree = {
        "params": E.init_ecapa(jax.random.PRNGKey(2), SMALL_ECAPA),
        "head": T.init_aam_head(jax.random.PRNGKey(1), SMALL_ECAPA.emb_dim, 2),
    }
    opt2 = optax.adam(1e-3)
    estate = T.TrainState(tree, opt2.init(tree), jnp.zeros((), jnp.int32))
    estep = jax.jit(T.make_embedding_train_step(opt2, SMALL_ECAPA))
    for _ in range(150):
        labs = rng.integers(0, 2, size=B)
        wavs = np.stack([_tone(rng, l, SR) for l in labs])
        lens = jnp.ones((B,), jnp.float32)
        feats = FE.compute_features(jnp.asarray(wavs), lens, fcfg)
        estate, _ = estep(estate, feats, lens, jnp.asarray(labs))
    emb_params = estate.params["params"]

    # the two speakers must be separable in embedding space before the
    # pipeline is asked to cluster them
    evalw = np.stack([_tone(rng, l, SR) for l in (0, 1, 0, 1, 0, 1)])
    lens6 = jnp.ones((6,), jnp.float32)
    embs = np.array(
        E.ecapa_forward(
            emb_params, FE.compute_features(jnp.asarray(evalw), lens6, fcfg), lens6,
            SMALL_ECAPA,
        )
    )
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    within = (embs[0] @ embs[2] + embs[1] @ embs[3]) / 2
    across = embs[0] @ embs[1]
    assert within > across + 0.05, (within, across)

    # ---- full production pipeline on a composed conversation ----
    segments = [(0, 0.0, 3.0), (1, 3.5, 6.5), (0, 7.0, 9.0), (1, 9.5, 12.0)]
    n = int(12.0 * SR)
    wav = 0.01 * rng.normal(size=n).astype(np.float32)
    for spk, s, e in segments:
        wav[int(s * SR) : int(e * SR)] += _tone(rng, spk, int(e * SR) - int(s * SR))

    pipe = make_tiny1s_pipeline(
        params={"segmentation": seg_params, "embedding": emb_params}
    )
    hyp = pipe(wav, num_speakers=2)

    truth = Annotation()
    for spk, s, e in segments:
        truth.add(s, e, spk)
    d = der(truth, hyp)
    assert d < 0.25, f"DER vs ground truth too high: {d:.4f}"
    # structure: alternating turns from exactly 2 speakers
    turns = hyp.turns()
    assert len({t.label for t in turns}) == 2
