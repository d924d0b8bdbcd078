"""Parity against oracles the builder did NOT write.

Round-1 verification relied on torch mirrors written alongside the JAX code
(tests/test_models.py) — self-consistent, but a shared misreading would pass.
This module loads executable code shipped INSIDE /root/reference and pits the
framework against it directly:

  - ``/root/reference/segment/utils.py`` — the vendored pyannote.core
    Segment/SlidingWindow (numpy-only, importable) as the LIVE oracle for
    core/segment.py and core/sliding_window.py.
  - ``/root/reference/embeddings/ECAPA-TDNN.py`` — a standalone, torch-only
    ECAPA implementation (no speechbrain import). Its building blocks share
    the conv->relu->bn ordering with speechbrain's TDNNBlock, so block-level
    weight-converted parity validates our layer math against code we did not
    author; the full standalone model is additionally transcribed to JAX in
    this test (using the framework's primitives) and checked end-to-end.
  - speechbrain's Filterbank/spectral_magnitude formulas (the math behind
    reference embeddings/threeModel.py:69-76), transcribed here in TORCH,
    independently of ops/frontend.py's numpy/jnp implementation — replacing
    the round-1 circular mel test.

Architecture reconciliation notes (VERDICT round 1, item 1a): the standalone
ECAPA-TDNN.py deviates from the speechbrain model the reference actually
exported to emd4.onnx (embeddings/export3.py:560-627 verifies against
``EncoderClassifier.encode_batch``). Documented deltas, each encoded as an
assertion below where testable:

  1. Conv/ReLU/BN order: standalone ``Conv1dReluBn.forward`` is
     ``bn(relu(conv))`` (ECAPA-TDNN.py:53-54) — SAME as speechbrain
     TDNNBlock and as models/ecapa.py ``_tdnn_block``. This settles the
     round-1 open question in favor of conv->relu->bn.
  2. Res2Net chunk roles: standalone convolves chunks 0..scale-2 and passes
     the LAST chunk through (ECAPA-TDNN.py:26-41); speechbrain passes the
     FIRST chunk through and convolves 1..scale-1. Same chain, permuted —
     proven below by the permutation identity test.
  3. Padding: standalone uses zero padding; speechbrain Conv1d defaults to
     reflect. models/ecapa.py follows speechbrain (reflect).
  4. SE block: standalone SE_Connect (Linear, plain temporal mean,
     bottleneck=channels/2) computes the same math as speechbrain SEBlock
     (k=1 convs, masked mean, se_channels) when lengths are full — proven
     below with converted weights.
  5. ASP: standalone has no global context, no length mask, and no BN inside
     the attention MLP; speechbrain has all three. models/ecapa.py follows
     speechbrain; the standalone ASP math (tanh/softmax/weighted stats) is
     covered by the full-model transcription test.
  6. Residual topology: standalone applies residuals in the top-level
     forward with cumulative sums (out1+out2 feeding layer3,
     ECAPA-TDNN.py:131-136); speechbrain's SERes2NetBlock has an internal
     residual and a plain sequential chain. models/ecapa.py follows
     speechbrain.
"""

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyannote_audio_speaker_diarization_cpp_tpu.config import FrontendConfig  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.core.segment import Segment  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.core.sliding_window import (  # noqa: E402
    SlidingWindow,
)
from pyannote_audio_speaker_diarization_cpp_tpu.models import ecapa as E  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.models import layers as L  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.ops import frontend as fe  # noqa: E402

REFERENCE_DIR = "/root/reference"


def _load_reference_module(relpath: str, name: str):
    path = os.path.join(REFERENCE_DIR, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference file {relpath} not available")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_utils():
    """The reference's vendored pyannote.core (segment/utils.py) — live."""
    mod = _load_reference_module("segment/utils.py", "ref_pyannote_utils")
    # the vendored file leaves SEGMENT_PRECISION unset until set_precision
    # is called; None selects pyannote's 1 us backward-compatible default
    mod.Segment.set_precision(None)
    return mod


@pytest.fixture(scope="module")
def ref_ecapa():
    """The reference's standalone torch ECAPA (embeddings/ECAPA-TDNN.py)."""
    return _load_reference_module("embeddings/ECAPA-TDNN.py", "ref_ecapa_tdnn")


def j2t(x):
    return torch.from_numpy(np.asarray(x))


def t2j(t):
    return jnp.asarray(t.detach().numpy())


# ---------------------------------------------------------------------------
# vendored pyannote.core as live oracle (segment/utils.py:11-327, 329-723)
# ---------------------------------------------------------------------------


def test_closest_frame_matches_vendored_pyannote(ref_utils):
    rng = np.random.default_rng(42)
    for _ in range(500):
        start = float(rng.uniform(0.0, 2.0))
        step = float(rng.uniform(0.01, 1.0))
        duration = float(rng.uniform(0.01, 5.0))
        theirs_sw = ref_utils.SlidingWindow(duration=duration, step=step, start=start)
        ours_sw = SlidingWindow(start=start, step=step, duration=duration)
        # every reference call site uses t >= start (SURVEY sliding-window
        # notes); ours clamps negatives like the C++ port, the vendored
        # python original does not — restrict to the shared domain
        t = float(rng.uniform(start, start + 100.0))
        expected = theirs_sw.closest_frame(t)
        if expected < 0:
            continue
        assert ours_sw.closest_frame(t) == expected, (start, step, duration, t)


def test_closest_frame_clamp_documented_divergence(ref_utils):
    """Ours clamps to 0 for t before the window start (the C++ port's
    behavior, speakerDiarizer.cpp:1110-1116); the vendored python original
    returns negative indices. Pin the difference so it stays conscious."""
    theirs = ref_utils.SlidingWindow(duration=1.0, step=0.5, start=10.0)
    ours = SlidingWindow(start=10.0, step=0.5, duration=1.0)
    assert theirs.closest_frame(0.0) < 0
    assert ours.closest_frame(0.0) == 0


def test_window_segments_match_vendored_pyannote(ref_utils):
    rng = np.random.default_rng(7)
    for _ in range(100):
        start = float(rng.uniform(0.0, 3.0))
        step = float(rng.uniform(0.05, 1.0))
        duration = float(rng.uniform(0.1, 5.0))
        theirs_sw = ref_utils.SlidingWindow(duration=duration, step=step, start=start)
        ours_sw = SlidingWindow(start=start, step=step, duration=duration)
        for i in [0, 1, 2, 17, 123]:
            theirs = theirs_sw[i]
            ours = ours_sw[i]
            assert ours.start == pytest.approx(theirs.start, abs=1e-12)
            assert ours.end == pytest.approx(theirs.end, abs=1e-12)


def test_segment_ops_match_vendored_pyannote(ref_utils):
    rng = np.random.default_rng(3)
    for _ in range(300):
        a0, b0 = sorted(rng.uniform(0.0, 10.0, size=2).tolist())
        a1, b1 = sorted(rng.uniform(0.0, 10.0, size=2).tolist())
        theirs_a = ref_utils.Segment(a0, b0)
        theirs_b = ref_utils.Segment(a1, b1)
        ours_a = Segment(a0, b0)
        ours_b = Segment(a1, b1)

        assert ours_a.duration == pytest.approx(theirs_a.duration)
        assert ours_a.middle == pytest.approx(theirs_a.middle)
        assert bool(ours_a) == bool(theirs_a)
        assert ours_a.intersects(ours_b) == theirs_a.intersects(theirs_b)

        their_and = theirs_a & theirs_b
        our_and = ours_a & ours_b
        # intersections are compared only when non-empty (pyannote's & of
        # disjoint segments yields an inverted segment that is falsy)
        if their_and:
            assert our_and.start == pytest.approx(their_and.start)
            assert our_and.end == pytest.approx(their_and.end)
        else:
            assert not our_and

        # ordering operators (dataclass order=True on (start, end))
        assert (ours_a < ours_b) == (theirs_a < theirs_b)
        assert (ours_a == ours_b) == (theirs_a == theirs_b)


# ---------------------------------------------------------------------------
# standalone reference ECAPA (embeddings/ECAPA-TDNN.py) as torch oracle
# ---------------------------------------------------------------------------


def _randomize_bn_stats(module: torch.nn.Module, rng):
    """Give every BatchNorm non-trivial running stats and affine params so
    mean/var mix-ups cannot cancel out."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.from_numpy(
                        rng.normal(size=m.running_mean.shape).astype(np.float32)
                    )
                )
                m.running_var.copy_(
                    torch.from_numpy(
                        rng.uniform(0.5, 2.0, size=m.running_var.shape).astype(
                            np.float32
                        )
                    )
                )
                m.weight.copy_(
                    torch.from_numpy(rng.uniform(0.5, 1.5, size=m.weight.shape).astype(np.float32))
                )
                m.bias.copy_(
                    torch.from_numpy(rng.normal(size=m.bias.shape).astype(np.float32) * 0.1)
                )


def _bn_params(bn: torch.nn.BatchNorm1d):
    return {
        "weight": t2j(bn.weight),
        "bias": t2j(bn.bias),
        "running_mean": t2j(bn.running_mean),
        "running_var": t2j(bn.running_var),
    }


def _conv_params(conv: torch.nn.Conv1d):
    p = {"weight": t2j(conv.weight)}
    if conv.bias is not None:
        p["bias"] = t2j(conv.bias)
    return p


def test_conv1drelubn_order_confirms_speechbrain_reading(ref_ecapa):
    """The standalone file's Conv1dReluBn computes bn(relu(conv)) — the same
    order models/ecapa.py uses (resolving round-1's conv/BN/ReLU question).
    Weight-converted parity on a k=1 block (padding-free, so the zero-vs-
    reflect padding delta does not apply)."""
    rng = np.random.default_rng(0)
    tm = ref_ecapa.Conv1dReluBn(16, 24, kernel_size=1).eval()
    _randomize_bn_stats(tm, rng)
    x = rng.normal(size=(2, 16, 30)).astype(np.float32)

    p = {"conv": _conv_params(tm.conv), "bn": _bn_params(tm.bn)}
    ours = np.asarray(E._tdnn_block(jnp.asarray(x), p))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_res2net_matches_standalone_via_chunk_permutation(ref_ecapa):
    """speechbrain res2net (ours) == the standalone's res2net under a chunk
    rotation: the standalone convolves chunks 0..s-2 and passes the LAST
    through (ECAPA-TDNN.py:26-41); speechbrain passes the FIRST through and
    convolves 1..s-1 with the identical accumulation chain. Feeding ours the
    rotated input and rotating the output back must therefore reproduce the
    standalone bit-for-bit (k=1: no padding in play)."""
    scale, channels, width = 4, 32, 8
    rng = np.random.default_rng(1)
    tm = ref_ecapa.Res2Conv1dReluBn(channels, kernel_size=1, scale=scale).eval()
    _randomize_bn_stats(tm, rng)
    x = rng.normal(size=(2, channels, 25)).astype(np.float32)

    blocks = [
        {"conv": _conv_params(tm.convs[i]), "bn": _bn_params(tm.bns[i])}
        for i in range(scale - 1)
    ]
    # rotate chunks so the standalone's pass-through (last) chunk sits where
    # speechbrain expects it (first)
    xr = np.concatenate([x[:, -width:], x[:, :-width]], axis=1)
    ours_r = np.asarray(
        E._res2net_block(
            jnp.asarray(xr), {"blocks": blocks}, 1, 1, scale, L.DEFAULT_PRECISION
        )
    )
    ours = np.concatenate([ours_r[:, width:], ours_r[:, :width]], axis=1)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_se_block_matches_standalone_se_connect(ref_ecapa):
    """Standalone SE_Connect (Linear + plain mean) == our masked SEBlock with
    full lengths, with Linear weights reshaped into k=1 convs."""
    channels = 32
    rng = np.random.default_rng(2)
    tm = ref_ecapa.SE_Connect(channels, s=2).eval()
    x = rng.normal(size=(3, channels, 20)).astype(np.float32)

    p = {
        "conv1": {
            "weight": t2j(tm.linear1.weight)[..., None],
            "bias": t2j(tm.linear1.bias),
        },
        "conv2": {
            "weight": t2j(tm.linear2.weight)[..., None],
            "bias": t2j(tm.linear2.bias),
        },
    }
    ours = np.asarray(E._se_block(jnp.asarray(x), p, None, L.DEFAULT_PRECISION))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def _standalone_ecapa_jax(state, x, channels, scale):
    """JAX transcription of the standalone ECAPA_TDNN.forward
    (ECAPA-TDNN.py:131-142) built from the framework's primitives and the
    torch module's converted state dict. Validates conv (zero 'same' pad,
    dilation), BatchNorm (2D and 3D), res2net split/accumulate/concat, the
    tanh/softmax attentive-stats pooling and the final linear+BN against an
    independent torch implementation."""

    def conv(x, prefix, padding=0, dilation=1):
        p = {"weight": state[prefix + ".weight"]}
        if prefix + ".bias" in state:
            p["bias"] = state[prefix + ".bias"]
        return L.conv1d(x, p, dilation=dilation, padding=padding)

    def bn(x, prefix):
        return L.batchnorm1d(
            x,
            {
                "weight": state[prefix + ".weight"],
                "bias": state[prefix + ".bias"],
                "running_mean": state[prefix + ".running_mean"],
                "running_var": state[prefix + ".running_var"],
            },
        )

    def conv_relu_bn(x, prefix, padding=0, dilation=1):
        return bn(jax.nn.relu(conv(x, prefix + ".conv", padding, dilation)), prefix + ".bn")

    def res2(x, prefix, padding, dilation):
        width = x.shape[1] // scale
        parts = jnp.split(x, scale, axis=1)
        outs = []
        sp = None
        for i in range(scale - 1):
            sp = parts[i] if i == 0 else sp + parts[i]
            sp = conv(sp, f"{prefix}.convs.{i}", padding, dilation)
            sp = bn(jax.nn.relu(sp), f"{prefix}.bns.{i}")
            outs.append(sp)
        outs.append(parts[scale - 1])
        return jnp.concatenate(outs, axis=1)

    def se(x, prefix):
        s = jnp.mean(x, axis=2)
        s = jax.nn.relu(L.linear(s, {"weight": state[prefix + ".linear1.weight"], "bias": state[prefix + ".linear1.bias"]}))
        s = jax.nn.sigmoid(L.linear(s, {"weight": state[prefix + ".linear2.weight"], "bias": state[prefix + ".linear2.bias"]}))
        return x * s[..., None]

    def se_res2block(x, prefix, padding, dilation):
        out = conv_relu_bn(x, prefix + ".0")
        out = res2(out, prefix + ".1", padding, dilation)
        out = conv_relu_bn(out, prefix + ".2")
        return se(out, prefix + ".3")

    x = jnp.swapaxes(x, 1, 2)
    out1 = conv_relu_bn(x, "layer1", padding=2)
    out2 = se_res2block(out1, "layer2", padding=2, dilation=2) + out1
    out3 = se_res2block(out1 + out2, "layer3", padding=3, dilation=3) + out1 + out2
    out4 = (
        se_res2block(out1 + out2 + out3, "layer4", padding=4, dilation=4)
        + out1
        + out2
        + out3
    )
    out = jnp.concatenate([out2, out3, out4], axis=1)
    out = jax.nn.relu(conv(out, "conv"))

    # AttentiveStatsPool (ECAPA-TDNN.py:98-105)
    alpha = jnp.tanh(conv(out, "pooling.linear1"))
    alpha = jax.nn.softmax(conv(alpha, "pooling.linear2"), axis=2)
    mean = jnp.sum(alpha * out, axis=2)
    residuals = jnp.sum(alpha * out**2, axis=2) - mean**2
    std = jnp.sqrt(jnp.maximum(residuals, 1e-9))
    pooled = jnp.concatenate([mean, std], axis=1)

    pooled = bn(pooled, "bn1")
    emb = L.linear(pooled, {"weight": state["linear.weight"], "bias": state["linear.bias"]})
    return bn(emb, "bn2")


def test_full_standalone_ecapa_matches_torch(ref_ecapa):
    """End-to-end: the reference's standalone torch ECAPA vs its JAX
    transcription built on the framework's primitives, same weights."""
    channels, scale = 64, 8
    rng = np.random.default_rng(5)
    tm = ref_ecapa.ECAPA_TDNN(in_channels=20, channels=channels, embd_dim=48).eval()
    _randomize_bn_stats(tm, rng)
    state = {k: t2j(v) for k, v in tm.state_dict().items()}
    x = rng.normal(size=(2, 40, 20)).astype(np.float32)

    ours = np.asarray(_standalone_ecapa_jax(state, jnp.asarray(x), channels, scale))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    assert ours.shape == theirs.shape == (2, 48)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# mel filterbank / log-mel: independent torch transcription of speechbrain's
# published Filterbank formula (the math behind threeModel.py:69-76)
# ---------------------------------------------------------------------------


def _speechbrain_fbank_torch(n_mels, f_min, f_max, n_fft, sample_rate):
    """speechbrain.processing.features.Filterbank filter construction,
    transcribed in torch straight from its published source: mel-linspace
    band edges, triangular filters as max(0, min(left, right)) of slopes
    around each center, over linspace(0, sr//2, n_fft//2+1) bins."""

    def to_mel(hz):
        return 2595.0 * math.log10(1.0 + hz / 700.0)

    mel = torch.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2, dtype=torch.float64)
    hz = 700.0 * (torch.pow(10.0, mel / 2595.0) - 1.0)
    band = hz[1:] - hz[:-1]
    f_central = hz[1:-1]
    band = band[:-1]
    all_freqs = torch.linspace(0, sample_rate // 2, n_fft // 2 + 1, dtype=torch.float64)

    slope = (all_freqs.unsqueeze(1) - f_central.unsqueeze(0)) / band.unsqueeze(0)
    left = slope + 1.0
    right = -slope + 1.0
    return torch.clamp(torch.min(left, right), min=0.0)


def _speechbrain_log_mel_torch(power, fbank, amin=1e-10, ref_value=1.0, top_db=80.0):
    """Filterbank.forward + _amplitude_to_DB, transcribed in torch:
    matmul -> 10*log10(clamp(x, amin)) - 10*log10(max(amin, ref)) ->
    per-item floor at (max over time&mel) - top_db."""
    fbanks = torch.matmul(power, fbank.to(power.dtype))
    x_db = 10.0 * torch.log10(torch.clamp(fbanks, min=amin))
    x_db -= 10.0 * math.log10(max(amin, ref_value))
    floor = x_db.amax(dim=(-2, -1)) - top_db
    return torch.max(x_db, floor.unsqueeze(-1).unsqueeze(-1))


def test_mel_filterbank_matches_independent_transcription():
    cfg = FrontendConfig()
    theirs = _speechbrain_fbank_torch(
        cfg.n_mels, cfg.f_min, cfg.f_max, cfg.n_fft, cfg.sample_rate
    ).numpy()
    ours = fe.mel_filterbank(cfg)
    assert ours.shape == theirs.shape == (cfg.n_fft // 2 + 1, cfg.n_mels)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)
    # sanity: every filter has support, triangles peak at 1 except possibly
    # clipped edge filters
    assert (theirs.sum(axis=0) > 0).all()


def test_log_mel_matches_independent_transcription():
    cfg = FrontendConfig()
    rng = np.random.default_rng(9)
    power = rng.uniform(0.0, 50.0, size=(3, 41, cfg.n_fft // 2 + 1)).astype(np.float32)
    # sprinkle hard zeros to exercise the amin clamp
    power[0, :5, :10] = 0.0

    fbank = _speechbrain_fbank_torch(
        cfg.n_mels, cfg.f_min, cfg.f_max, cfg.n_fft, cfg.sample_rate
    )
    theirs = _speechbrain_log_mel_torch(
        torch.from_numpy(power), fbank, cfg.amin, cfg.ref_value, cfg.top_db
    ).numpy()
    ours = np.asarray(fe.log_mel(jnp.asarray(power), cfg))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_full_frontend_matches_independent_torch_chain():
    """waveform -> features end-to-end vs a torch chain assembled from
    torch.stft (the reference's own STFT backend, speakerDiarizer.cpp:2008)
    + the independent Filterbank transcription + MyNormalization semantics
    (threeModel.py:292-396: mean over round(rel_len*T) frames, std=1)."""
    cfg = FrontendConfig()
    rng = np.random.default_rng(10)
    wav = rng.normal(size=(3, 16000)).astype(np.float32) * 0.1
    wav_lens = np.array([1.0, 0.71, 0.43], dtype=np.float32)

    win = torch.hamming_window(cfg.win_length, periodic=True, dtype=torch.float64)
    stft = torch.stft(
        torch.from_numpy(wav).double(),
        cfg.n_fft,
        cfg.hop_length,
        cfg.win_length,
        win,
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    )  # (B, freq, T)
    power = (stft.real**2 + stft.imag**2).transpose(1, 2)  # (B, T, freq)
    fbank = _speechbrain_fbank_torch(
        cfg.n_mels, cfg.f_min, cfg.f_max, cfg.n_fft, cfg.sample_rate
    )
    feats = _speechbrain_log_mel_torch(power, fbank, cfg.amin, cfg.ref_value, cfg.top_db)
    T = feats.shape[1]
    actual = torch.round(torch.from_numpy(wav_lens).double() * T)
    idx = torch.arange(T)[None, :, None]
    valid = (idx < actual[:, None, None]).double()
    mean = (feats * valid).sum(1, keepdim=True) / valid.sum(1, keepdim=True)
    theirs = (feats - mean).numpy()

    ours = np.asarray(
        fe.compute_features(jnp.asarray(wav), jnp.asarray(wav_lens), cfg)
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)
