"""END-TO-END DIFFERENTIAL TWIN (VERDICT r3 item 1).

The production framework vs a full reference-side pipeline assembled from
code it does not share (tests/twin_oracle.py: the reference's own live
Python stage logic + torch models loaded straight from published-layout
state dicts + fresh transcriptions), driven with the SAME weights.

Comparison discipline mirrors the reference's own
(pipeline/script/verifyEveryStepResult.py + the commented "load python
tensor instead" isolation blocks, speakerDiarizer.cpp:3113-3147):

  1. END-TO-END: both sides run fully independently; the tensor checklist
     is compared at the reference tolerance policy (exact for discrete,
     rtol 1e-3 / atol 1e-4 for floats), permutation-aware for
     cluster-numbered tensors, and margin-aware for bits downstream of a
     float threshold (a score within float-noise of the 0.4442... onset may
     legitimately binarize differently on the two sides — the same
     tolerance the reference needed for its C++-vs-Python runs,
     README.md:99-101).
  2. STAGE-ISOLATED: each twin stage is also driven from the PRODUCTION
     side's previous-stage output, where discrete results must then match
     EXACTLY — a logic bug in any stage fails its specific test.

Production runs in its bit-conservative mode (float32 compute + transfer,
HIGHEST matmul precision) so the documented bf16/f16 deviations do not
cloud the comparison; the one remaining documented deviation
(window-normalized wav_lens, docs/PARITY.md item 2) is adopted by the twin
and pinned separately by test_wav_lens_window_vs_reference_envelope.
"""

import dataclasses
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

import twin_oracle as TW  # noqa: E402
from _cfg import SMALL_ECAPA, SMALL_PYANNET  # noqa: E402
from test_convert_real_scale import (  # noqa: E402
    make_pyannote_pyannet_state_dict,
    make_speechbrain_ecapa_state_dict,
)

from pyannote_audio_speaker_diarization_cpp_tpu.config import (  # noqa: E402
    DEFAULT_CONFIG,
)
from pyannote_audio_speaker_diarization_cpp_tpu.models import convert  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (  # noqa: E402
    SpeakerDiarizationPipeline,
)
from pyannote_audio_speaker_diarization_cpp_tpu.utils.instrumented import (  # noqa: E402
    run_with_dumps,
)

RTOL, ATOL = 1e-3, 1e-4  # verifyEveryStepResult.py:119-124
ONSET = DEFAULT_CONFIG.segmentation.onset


def synth_wav(seconds: float = 6.3, sr: int = 16000) -> np.ndarray:
    """Multi-tone + noise signal (same family as the golden-dump wav)."""
    rng = np.random.default_rng(977)
    t = np.arange(int(seconds * sr)) / sr
    x = (
        0.30 * np.sin(2 * np.pi * 220.0 * t)
        + 0.20 * np.sin(2 * np.pi * 1100.0 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t)))
        + 0.05 * rng.standard_normal(t.shape)
    )
    q = np.clip(np.round(x * 20000.0), -32768, 32767).astype(np.int16)
    return q.astype(np.float32) / 32768.0


class DictDump(dict):
    def dump(self, name, arr):
        self[name] = np.asarray(arr)


@pytest.fixture(scope="module")
def shared_weights():
    rng = np.random.default_rng(0)
    sd_seg = make_pyannote_pyannet_state_dict(rng, SMALL_PYANNET)
    sd_emb = make_speechbrain_ecapa_state_dict(rng, SMALL_ECAPA)
    return sd_seg, sd_emb


@pytest.fixture(scope="module")
def production(shared_weights):
    """Production pipeline in bit-conservative mode + its full dump set."""
    sd_seg, sd_emb = shared_weights
    params = {
        "segmentation": convert.pyannet_from_pyannote(sd_seg, SMALL_PYANNET),
        "embedding": convert.ecapa_from_speechbrain(sd_emb, SMALL_ECAPA),
    }
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        chunk_bucket=4,
        compute_dtype="float32",
        transfer_dtype="float32",
    )
    pipe = SpeakerDiarizationPipeline(
        cfg,
        params=params,
        seg_batch=4,
        emb_batch=4,
        precision=jax.lax.Precision.HIGHEST,
        pyannet_cfg=SMALL_PYANNET,
        ecapa_cfg=SMALL_ECAPA,
    )
    dump = DictDump()
    annotation = run_with_dumps(pipe, synth_wav(), dump)
    return pipe, dump, annotation


@pytest.fixture(scope="module")
def twin(shared_weights):
    """Fully independent twin run on the same audio + weights."""
    sd_seg, sd_emb = shared_weights
    dump = DictDump()
    turns = TW.twin_diarize(
        synth_wav(),
        sd_seg,
        sd_emb,
        SMALL_PYANNET,
        SMALL_ECAPA,
        DEFAULT_CONFIG.frontend,
        dump=dump,
    )
    return dump, turns


def _label_bijection(a, b):
    """Cluster-label bijection between two hard assignments (or None)."""
    fwd = {}
    for x, y in zip(np.ravel(a), np.ravel(b)):
        if x < 0 or y < 0:
            if (x < 0) != (y < 0):
                return None
            continue
        if fwd.setdefault(int(x), int(y)) != int(y):
            return None
    if len(set(fwd.values())) != len(fwd):
        return None
    return fwd


# ---------------------------------------------------------------------------
# 1. end-to-end, fully independent
# ---------------------------------------------------------------------------


def test_e2e_segmentations_close(production, twin):
    np.testing.assert_allclose(
        production[1]["segmentations"], twin[0]["segmentations"], rtol=RTOL, atol=ATOL
    )


def test_e2e_binarized_margin_aware(production, twin):
    """Binarized bits must agree everywhere the scores are not within
    cross-implementation float noise of the onset threshold."""
    seg_p = production[1]["segmentations"]
    seg_t = twin[0]["segmentations"]
    margin = max(2.0 * np.abs(seg_p - seg_t).max(), 1e-6)
    decided = np.abs(seg_p - ONSET) > margin
    bin_p = production[1]["binarized_segmentations"]
    bin_t = twin[0]["binarized_segmentations"]
    # hysteresis can carry a near-threshold flip forward along the frame
    # axis; require agreement on decided frames and a tiny global flip rate
    agree = bin_p == bin_t
    assert agree[decided].mean() > 0.999
    assert agree.mean() > 0.995


def test_e2e_float_checklist(production, twin):
    """Every float tensor both sides produce, at reference tolerances.
    (Discrete/threshold-downstream and cluster-numbered tensors are covered
    by the dedicated margin/permutation-aware and stage-isolated tests.)"""
    prod, twn = production[1], twin[0]
    names = [
        "segmentations",
        "masks",
        "batch_masks",
        "imasks",
        "signals",
        "wav_lens",
        "final_wav_lens",
        "embeddings",
        "filtered_embeddings",
        "norm_embeddings",
        "dist",
    ]
    compared = 0
    for name in names:
        if name not in prod or name not in twn:
            continue
        a, b = prod[name], twn[name]
        if a.shape != np.asarray(b).shape:
            raise AssertionError(f"{name}: shape {a.shape} vs {np.asarray(b).shape}")
        np.testing.assert_allclose(
            np.asarray(a, np.float64),
            np.asarray(b, np.float64),
            rtol=RTOL,
            atol=ATOL,
            err_msg=name,
        )
        compared += 1
    assert compared >= 10, f"only {compared} names compared"


def test_e2e_turns_match(production, twin):
    """Turn-for-turn equality of the two fully independent decodes, up to
    cluster renaming (start/end to the millisecond)."""
    _, _, annotation = production
    twin_turns = twin[1]
    prod_turns = [(t.start, t.end, t.label) for t in annotation.turns()]
    assert len(prod_turns) == len(twin_turns)
    for (ps, pe, pl), (ts, te, tl) in zip(sorted(prod_turns), sorted(twin_turns)):
        assert ps == pytest.approx(ts, abs=1e-3)
        assert pe == pytest.approx(te, abs=1e-3)
    assert _label_bijection(
        np.asarray([l for _, _, l in sorted(prod_turns)]),
        np.asarray([l for _, _, l in sorted(twin_turns)]),
    ) is not None


# ---------------------------------------------------------------------------
# 2. stage-isolated: twin stage N on PRODUCTION stage N-1 output
#    (the reference's own "load python tensor instead" discipline)
# ---------------------------------------------------------------------------


def test_isolated_count_exact(production):
    """Twin speaker_count on the production binarized tensor must equal the
    production count EXACTLY."""
    prod = production[1]
    utils = TW.ref_utils()
    chunk_window = utils.SlidingWindow(start=0.0, step=0.5, duration=5.0)
    count, _, _ = TW.twin_speaker_count(
        prod["binarized_segmentations"].astype(np.float64),
        chunk_window,
        0.016875,
        (0.1, 0.1),
    )
    np.testing.assert_array_equal(count, prod["count"])


def test_isolated_masks_signals_exact(production):
    """Twin mask choice + interpolate + left-pack on production binarized
    must reproduce the production masks/imasks/signals/wav_lens EXACTLY."""
    pipe, prod, _ = production
    utils = TW.ref_utils()
    binary = prod["binarized_segmentations"].astype(np.float64)
    clean = binary * (binary.sum(axis=2, keepdims=True) < 2)
    chunk_window = utils.SlidingWindow(start=0.0, step=0.5, duration=5.0)
    seg_model = TW.make_segmentation(model=None)
    wav_t = torch.from_numpy(synth_wav())[None, :]
    F_frames = binary.shape[1]
    min_num_frames = math.ceil(F_frames * 640 / 80000)
    masks, waves = TW.twin_mask_choice(
        seg_model, wav_t, binary, clean, chunk_window, min_num_frames
    )
    np.testing.assert_array_equal(np.stack(masks), prod["masks"])

    dump = DictDump()
    TW.twin_embeddings(
        seg_model, None, masks, waves, SMALL_ECAPA, DEFAULT_CONFIG.frontend,
        dump=dump, forward=False,
    )
    np.testing.assert_array_equal(dump["imasks"], prod["imasks"])
    np.testing.assert_array_equal(
        dump["signals"].astype(np.float32), prod["signals"].astype(np.float32)
    )
    np.testing.assert_array_equal(dump["wav_lens"], prod["wav_lens"])
    np.testing.assert_allclose(
        dump["final_wav_lens"], prod["final_wav_lens"], rtol=1e-6, atol=0
    )


def test_isolated_clustering_partition(production):
    """LIVE reference clustering on the PRODUCTION embeddings must give the
    production hard assignment up to label renaming."""
    prod = production[1]
    hard_t, _ = TW.twin_cluster(prod["embeddings"].astype(np.float64))
    hard_p = prod["hard_clusters"]
    # production applies the inactive -2 marking afterwards; apply to twin
    inactive = prod["binarized_segmentations"].sum(axis=1) == 0
    hard_t[inactive] = -2
    assert _label_bijection(hard_t, hard_p) is not None, (hard_t, hard_p)


def test_isolated_decode_turns_exact(production):
    """Twin reconstruct + to_diarization + to_annotation on the PRODUCTION
    segs/hard/count must reproduce the production turns exactly."""
    pipe, prod, annotation = production
    utils = TW.ref_utils()
    chunk_window = utils.SlidingWindow(start=0.0, step=0.5, duration=5.0)
    seg_cfg = pipe.config.segmentation
    # the count grid the production pipeline used
    trimmed_window = utils.SlidingWindow(
        start=0.1 * 5.0, step=0.5, duration=0.8 * 5.0
    )
    frames_window = utils.SlidingWindow(
        start=0.0, step=seg_cfg.frame_step, duration=seg_cfg.frame_duration
    )
    grid = utils.SlidingWindow(
        start=trimmed_window.start,
        step=frames_window.step,
        duration=frames_window.duration,
    )
    turns = TW.twin_reconstruct_decode(
        prod["segmentations"].astype(np.float64),
        chunk_window,
        prod["hard_clusters"],
        prod["count"],
        grid,
        len(prod["count"]),
        seg_cfg.frame_step,
        onset=0.5,
        offset=0.5,
        min_duration_on=seg_cfg.min_duration_on,
        min_duration_off=seg_cfg.min_duration_off,
    )
    prod_turns = sorted((t.start, t.end, t.label) for t in annotation.turns())
    assert len(turns) == len(prod_turns)
    for (ts, te, tk), (ps, pe, pk) in zip(sorted(turns), prod_turns):
        assert ts == pytest.approx(ps, abs=1e-9)
        assert te == pytest.approx(pe, abs=1e-9)
        assert tk == pk


# ---------------------------------------------------------------------------
# the documented wav_lens deviation, pinned
# ---------------------------------------------------------------------------


def test_wav_lens_window_vs_reference_envelope(production, shared_weights):
    """docs/PARITY.md deviation 2: production normalizes wav_lens by the
    fixed window; the reference C++ normalizes by the batch max
    (speakerDiarizer.cpp:2499-2510) while STILL padding signals to the full
    window — an inconsistent pair the C++ inherited. Running the twin
    embedding chain BOTH ways on the production masks pins the measured
    effect inside the reference's own accepted embedding envelope
    (abs 0.02, reference README.md:99-101)."""
    _, prod, _ = production
    _, sd_emb = shared_weights
    ecapa = TW.build_twin_ecapa(sd_emb, SMALL_ECAPA)
    signals = torch.from_numpy(prod["signals"].astype(np.float32))
    lens = torch.from_numpy(prod["wav_lens"].astype(np.float64))
    window = signals.shape[1]
    valid = (lens >= 640).numpy()
    if not valid.any():
        pytest.skip("no valid rows")
    rel_window = torch.clamp(lens / window, max=1.0)
    max_len = float(lens[valid].max()) if valid.any() else window
    rel_reference = torch.clamp(lens / max_len, max=1.0)
    e_window = TW.twin_embedding_forward(
        ecapa, signals, rel_window, DEFAULT_CONFIG.frontend
    )
    e_reference = TW.twin_embedding_forward(
        ecapa, signals, rel_reference, DEFAULT_CONFIG.frontend
    )
    diff = np.abs(e_window[valid] - e_reference[valid]).max()
    assert diff < 0.02, f"wav_lens deviation exceeds the reference envelope: {diff}"


# ---------------------------------------------------------------------------
# inverse converters (pytree -> published layouts) round-trip
# ---------------------------------------------------------------------------


def test_inverse_converters_roundtrip(shared_weights):
    sd_seg, sd_emb = shared_weights
    seg_params = convert.pyannet_from_pyannote(sd_seg, SMALL_PYANNET)
    emb_params = convert.ecapa_from_speechbrain(sd_emb, SMALL_ECAPA)
    sd_seg2 = convert.pyannet_to_pyannote(seg_params)
    sd_emb2 = convert.ecapa_to_speechbrain(emb_params)
    for k, v in sd_seg2.items():
        np.testing.assert_array_equal(v, sd_seg[k], err_msg=k)
    for k, v in sd_emb2.items():
        np.testing.assert_array_equal(v, sd_emb[k], err_msg=k)
    # every original tensor key round-trips (num_batches_tracked excluded)
    missing = {
        k for k in sd_seg if k not in sd_seg2
    } | {
        k
        for k in sd_emb
        if k not in sd_emb2 and not k.endswith("num_batches_tracked")
    }
    assert not missing, missing


# ---------------------------------------------------------------------------
# the reference wav with the TRAINED gate checkpoint (multi-turn,
# multi-speaker structure; VERDICT r3 item 1 "on the reference wav")
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_twin_reference_wav_gate_checkpoint(reference_wav_path):
    import os

    from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio
    from pyannote_audio_speaker_diarization_cpp_tpu.metrics.der import der
    from pyannote_audio_speaker_diarization_cpp_tpu.core.annotation import (
        Annotation,
    )

    ckpt = os.path.join(os.path.dirname(__file__), "goldens", "gate_ckpt")
    if not os.path.isdir(ckpt):
        pytest.skip("gate checkpoint not committed")
    params = convert.load_checkpoint(ckpt)
    sd_seg = convert.pyannet_to_pyannote(params["segmentation"])
    sd_emb = convert.ecapa_to_speechbrain(params["embedding"])

    data = wavio.read_wav(reference_wav_path)
    wav = (data.samples.mean(axis=0) / 32768.0).astype(np.float32)

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        compute_dtype="float32",
        transfer_dtype="float32",
    )
    pipe = SpeakerDiarizationPipeline(
        cfg,
        params=params,
        seg_batch=32,
        emb_batch=32,
        precision=jax.lax.Precision.HIGHEST,
        pyannet_cfg=SMALL_PYANNET,
        ecapa_cfg=SMALL_ECAPA,
    )
    prod = DictDump()
    annotation = run_with_dumps(pipe, wav, prod, num_speakers=4)

    twn = DictDump()
    twin_turns = TW.twin_diarize(
        wav,
        sd_seg,
        sd_emb,
        SMALL_PYANNET,
        SMALL_ECAPA,
        DEFAULT_CONFIG.frontend,
        dump=twn,
        num_speakers=4,
    )

    # tensor checklist at reference tolerances
    np.testing.assert_allclose(
        prod["segmentations"], twn["segmentations"], rtol=RTOL, atol=ATOL
    )
    seg_margin = max(
        2.0 * np.abs(prod["segmentations"] - twn["segmentations"]).max(), 1e-6
    )
    agree = prod["binarized_segmentations"] == twn["binarized_segmentations"]
    assert agree.mean() > 0.995, agree.mean()
    np.testing.assert_allclose(
        np.nan_to_num(prod["embeddings"], nan=0.0),
        np.nan_to_num(twn["embeddings"], nan=0.0),
        rtol=5e-3,
        atol=5e-3,  # binarized bit flips within seg_margin feed the masks
    )

    # turn-for-turn: the production decode has 38 turns over 4 speakers
    # (the committed gate golden); the twin must reproduce the structure
    prod_turns = sorted((t.start, t.end, t.label) for t in annotation.turns())
    assert len(prod_turns) >= 10
    twin_ann = Annotation()
    for s, e, k in twin_turns:
        twin_ann.add(s, e, k)
    prod_ann = Annotation()
    for s, e, k in prod_turns:
        prod_ann.add(s, e, k)
    d = der(prod_ann, twin_ann)
    assert d < 0.05, f"twin vs production DER on the reference wav: {d:.4f}"


@pytest.mark.slow
def test_twin_full_published_scale():
    """VERDICT r4 item 6: the twin-vs-production comparison at the REAL
    published architecture sizes (pyannote/segmentation@2022.07 PyanNet —
    SincNet 80/k251, 4x128 BiLSTM, 128-d linears; speechbrain
    spkrec-ecapa-voxceleb ECAPA — 1024 channels, scale 8, MFA 3072,
    fc->192) with random-but-shared full-scale weights on a >=30 s wav:
    the float checklist at reference tolerances (rtol 1e-3 / atol 1e-4,
    verifyEveryStepResult.py:119-124) and turn-for-turn equality, catching
    numerics issues that only appear at real widths (the reference's own
    export-parity discipline, segment/export2.py:96-101)."""
    from pyannote_audio_speaker_diarization_cpp_tpu.models.ecapa import EcapaConfig
    from pyannote_audio_speaker_diarization_cpp_tpu.models.pyannet import (
        PyanNetConfig,
    )

    real_p, real_e = PyanNetConfig(), EcapaConfig()
    rng = np.random.default_rng(7)
    sd_seg = make_pyannote_pyannet_state_dict(rng, real_p)
    sd_emb = make_speechbrain_ecapa_state_dict(rng, real_e)
    wav = synth_wav(31.7)

    params = {
        "segmentation": convert.pyannet_from_pyannote(sd_seg, real_p),
        "embedding": convert.ecapa_from_speechbrain(sd_emb, real_e),
    }
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        chunk_bucket=4,
        compute_dtype="float32",
        transfer_dtype="float32",
    )
    pipe = SpeakerDiarizationPipeline(
        cfg,
        params=params,
        seg_batch=4,
        emb_batch=4,
        precision=jax.lax.Precision.HIGHEST,
        pyannet_cfg=real_p,
        ecapa_cfg=real_e,
    )
    dump_p = DictDump()
    annotation = run_with_dumps(pipe, wav, dump_p)
    dump_t = DictDump()
    twin_turns = TW.twin_diarize(
        wav, sd_seg, sd_emb, real_p, real_e, DEFAULT_CONFIG.frontend, dump=dump_t
    )

    # float checklist at reference tolerances
    compared = 0
    for name in (
        "segmentations",
        "masks",
        "imasks",
        "signals",
        "wav_lens",
        "embeddings",
        "filtered_embeddings",
        "norm_embeddings",
        "dist",
    ):
        if name not in dump_p or name not in dump_t:
            continue
        a = np.asarray(dump_p[name], np.float64)
        b = np.asarray(dump_t[name], np.float64)
        assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
        np.testing.assert_allclose(a, b, rtol=RTOL, atol=ATOL, err_msg=name)
        compared += 1
    assert compared >= 7, f"only {compared} names compared"

    # turn-for-turn equality up to cluster renaming
    prod_turns = [(t.start, t.end, t.label) for t in annotation.turns()]
    assert len(prod_turns) == len(twin_turns)
    for (ps, pe, _), (ts, te, _) in zip(sorted(prod_turns), sorted(twin_turns)):
        assert ps == pytest.approx(ts, abs=1e-3)
        assert pe == pytest.approx(te, abs=1e-3)
    assert (
        _label_bijection(
            np.asarray([l for _, _, l in sorted(prod_turns)]),
            np.asarray([l for _, _, l in sorted(twin_turns)]),
        )
        is not None
    )
