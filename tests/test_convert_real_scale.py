"""Converters exercised at REAL checkpoint scale and layout.

Round-1 converter tests used toy configs; these build synthetic state dicts
with the EXACT module paths and tensor shapes of the published checkpoints
the reference exports from:

  - ``speechbrain/spkrec-ecapa-voxceleb`` embedding_model (the model behind
    emd4.onnx, reference embeddings/export3.py:560-627): 1024-channel ECAPA,
    res2net scale 8 (width 128), SE 128, attention 128 w/ global context,
    MFA 3072, ASP-BN 6144, fc -> 192.
  - ``pyannote/segmentation@2022.07`` PyanNet (the model behind
    segment2.onnx, reference segment/export2.py:16-53): SincNet 80 filters
    k=251 stride 10, conv 60, 4-layer bidirectional LSTM hidden 128, two
    128-d linear layers, 3-class head.

Each converted pytree is verified against a torch mirror forward at full
width, and (slow-marked) through the full diarization pipeline.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pyannote_audio_speaker_diarization_cpp_tpu.models import convert  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.models import ecapa as E  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as P  # noqa: E402

# torch mirrors + weight-copy helpers from the model parity suite
from test_models import (  # noqa: E402
    TorchEcapa,
    TorchSincNet,
    _copy_seres2net,
    _copy_tdnn,
    j2t,
)

ECAPA_REAL = E.EcapaConfig()  # defaults ARE the voxceleb recipe
PYANNET_REAL = P.PyanNetConfig()  # defaults ARE the 2022.07 recipe


# ---------------------------------------------------------------------------
# synthetic state dicts at the real layouts
# ---------------------------------------------------------------------------


def make_speechbrain_ecapa_state_dict(rng, cfg: E.EcapaConfig = ECAPA_REAL):
    """Exact key layout + shapes of the spkrec-ecapa-voxceleb
    embedding_model state dict (incl. num_batches_tracked keys, which the
    converter must ignore)."""
    sd = {}

    def conv(prefix, in_c, out_c, k):
        sd[f"{prefix}.weight"] = rng.normal(size=(out_c, in_c, k)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(out_c,)).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = (0.1 * rng.normal(size=(c,))).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 2, size=(c,)).astype(np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(1000, dtype=np.int64)

    def tdnn(prefix, in_c, out_c, k):
        conv(f"{prefix}.conv.conv", in_c, out_c, k)
        bn(f"{prefix}.norm.norm", out_c)

    ch = cfg.channels
    width = ch[1] // cfg.res2net_scale
    tdnn("blocks.0", cfg.in_channels, ch[0], cfg.kernel_sizes[0])
    for i in (1, 2, 3):
        tdnn(f"blocks.{i}.tdnn1", ch[i - 1], ch[i], 1)
        for j in range(cfg.res2net_scale - 1):
            tdnn(f"blocks.{i}.res2net_block.blocks.{j}", width, width, cfg.kernel_sizes[i])
        tdnn(f"blocks.{i}.tdnn2", ch[i], ch[i], 1)
        conv(f"blocks.{i}.se_block.conv1.conv", ch[i], cfg.se_channels, 1)
        conv(f"blocks.{i}.se_block.conv2.conv", cfg.se_channels, ch[i], 1)
    cat = sum(ch[1:4])
    tdnn("mfa", cat, ch[-1], cfg.kernel_sizes[-1])
    asp_in = ch[-1] * 3 if cfg.global_context else ch[-1]
    tdnn("asp.tdnn", asp_in, cfg.attention_channels, 1)
    conv("asp.conv.conv", cfg.attention_channels, ch[-1], 1)
    bn("asp_bn.norm", ch[-1] * 2)
    conv("fc.conv", ch[-1] * 2, cfg.emb_dim, 1)
    return sd


def make_pyannote_pyannet_state_dict(rng, cfg: P.PyanNetConfig = PYANNET_REAL):
    """Exact key layout + shapes of the pyannote/segmentation@2022.07
    state dict (sincnet.conv1d.0 is the asteroid ParamSincFB with
    low_hz_/band_hz_ parameters)."""
    sd = {}

    def inorm(prefix, c):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = (0.1 * rng.normal(size=(c,))).astype(np.float32)

    def lin(prefix, i, o):
        sd[f"{prefix}.weight"] = (0.1 * rng.normal(size=(o, i))).astype(np.float32)
        sd[f"{prefix}.bias"] = (0.1 * rng.normal(size=(o,))).astype(np.float32)

    inorm("sincnet.wav_norm1d", 1)
    sd["sincnet.conv1d.0.low_hz_"] = rng.uniform(
        30, 7000, size=(cfg.num_filters, 1)
    ).astype(np.float32)
    sd["sincnet.conv1d.0.band_hz_"] = rng.uniform(
        10, 500, size=(cfg.num_filters, 1)
    ).astype(np.float32)
    inorm("sincnet.norm1d.0", cfg.num_filters)
    sd["sincnet.conv1d.1.weight"] = (
        0.1 * rng.normal(size=(cfg.conv_channels, cfg.num_filters, 5))
    ).astype(np.float32)
    sd["sincnet.conv1d.1.bias"] = (0.1 * rng.normal(size=(cfg.conv_channels,))).astype(
        np.float32
    )
    inorm("sincnet.norm1d.1", cfg.conv_channels)
    sd["sincnet.conv1d.2.weight"] = (
        0.1 * rng.normal(size=(cfg.conv_channels, cfg.conv_channels, 5))
    ).astype(np.float32)
    sd["sincnet.conv1d.2.bias"] = (0.1 * rng.normal(size=(cfg.conv_channels,))).astype(
        np.float32
    )
    inorm("sincnet.norm1d.2", cfg.conv_channels)
    in_size = cfg.conv_channels
    for i in range(cfg.lstm_layers):
        for suffix in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{i}{suffix}"] = (
                0.1 * rng.normal(size=(4 * cfg.lstm_hidden, in_size))
            ).astype(np.float32)
            sd[f"lstm.weight_hh_l{i}{suffix}"] = (
                0.1 * rng.normal(size=(4 * cfg.lstm_hidden, cfg.lstm_hidden))
            ).astype(np.float32)
            sd[f"lstm.bias_ih_l{i}{suffix}"] = (
                0.1 * rng.normal(size=(4 * cfg.lstm_hidden,))
            ).astype(np.float32)
            sd[f"lstm.bias_hh_l{i}{suffix}"] = (
                0.1 * rng.normal(size=(4 * cfg.lstm_hidden,))
            ).astype(np.float32)
        in_size = 2 * cfg.lstm_hidden
    lin("linear.0", 2 * cfg.lstm_hidden, cfg.linear_hidden)
    lin("linear.1", cfg.linear_hidden, cfg.linear_hidden)
    lin("classifier", cfg.linear_hidden, cfg.num_classes)
    return sd


def _count_params(tree):
    import jax

    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))


# ---------------------------------------------------------------------------
# converter -> forward parity at full width
# ---------------------------------------------------------------------------


def test_ecapa_converter_real_scale_matches_torch_mirror():
    cfg = ECAPA_REAL
    rng = np.random.default_rng(100)
    sd = make_speechbrain_ecapa_state_dict(rng, cfg)
    params = convert.ecapa_from_speechbrain(sd, cfg)

    # ~20.8M parameters: the published spkrec-ecapa-voxceleb size
    n = _count_params(params)
    assert 19e6 < n < 23e6, n

    tm = TorchEcapa(cfg).eval()
    _copy_tdnn(tm.block0, params["block0"])
    _copy_seres2net(tm.b1, params["block1"])
    _copy_seres2net(tm.b2, params["block2"])
    _copy_seres2net(tm.b3, params["block3"])
    _copy_tdnn(tm.mfa, params["mfa"])
    _copy_tdnn(tm.asp_tdnn, params["asp"]["tdnn"])
    with torch.no_grad():
        tm.asp_conv.weight.copy_(j2t(params["asp"]["conv"]["weight"]))
        tm.asp_conv.bias.copy_(j2t(params["asp"]["conv"]["bias"]))
        tm.asp_bn.weight.copy_(j2t(params["asp_bn"]["weight"]))
        tm.asp_bn.bias.copy_(j2t(params["asp_bn"]["bias"]))
        tm.asp_bn.running_mean.copy_(j2t(params["asp_bn"]["running_mean"]))
        tm.asp_bn.running_var.copy_(j2t(params["asp_bn"]["running_var"]))
        tm.fc.weight.copy_(j2t(params["fc"]["weight"]))
        tm.fc.bias.copy_(j2t(params["fc"]["bias"]))

    feats = (0.5 * rng.normal(size=(2, 50, cfg.in_channels))).astype(np.float32)
    lens = np.array([1.0, 0.62], dtype=np.float32)
    ours = np.asarray(E.ecapa_forward(params, jnp.asarray(feats), jnp.asarray(lens), cfg))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(feats), torch.from_numpy(lens)).numpy()
    assert ours.shape == theirs.shape == (2, cfg.emb_dim)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_pyannet_converter_real_scale_matches_torch_mirror():
    cfg = PYANNET_REAL
    rng = np.random.default_rng(101)
    sd = make_pyannote_pyannet_state_dict(rng, cfg)
    params = convert.pyannet_from_pyannote(sd, cfg)

    # ~1.5M parameters: the published pyannote/segmentation size
    n = _count_params(params)
    assert 1.2e6 < n < 1.8e6, n

    num_samples = 8000  # 23 output frames — fast, full-width layers
    x = (0.1 * rng.normal(size=(2, num_samples))).astype(np.float32)

    sinc_t = TorchSincNet(cfg, params).eval()
    lstm_t = torch.nn.LSTM(
        cfg.conv_channels,
        cfg.lstm_hidden,
        num_layers=cfg.lstm_layers,
        bidirectional=True,
        batch_first=True,
    )
    with torch.no_grad():
        for i, layer in enumerate(params["lstm"]):
            for tag, half in (("", "fwd"), ("_reverse", "bwd")):
                getattr(lstm_t, f"weight_ih_l{i}{tag}").copy_(j2t(layer[half]["weight_ih"]))
                getattr(lstm_t, f"weight_hh_l{i}{tag}").copy_(j2t(layer[half]["weight_hh"]))
                getattr(lstm_t, f"bias_ih_l{i}{tag}").copy_(j2t(layer[half]["bias_ih"]))
                getattr(lstm_t, f"bias_hh_l{i}{tag}").copy_(j2t(layer[half]["bias_hh"]))
        feat_t = sinc_t(torch.from_numpy(x))
        out_t, _ = lstm_t(feat_t.transpose(1, 2))
        for lin in params["linear"]:
            out_t = torch.nn.functional.leaky_relu(
                torch.nn.functional.linear(out_t, j2t(lin["weight"]), j2t(lin["bias"])),
                0.01,
            )
        theirs = torch.sigmoid(
            torch.nn.functional.linear(
                out_t,
                j2t(params["classifier"]["weight"]),
                j2t(params["classifier"]["bias"]),
            )
        ).numpy()

    ours = np.asarray(P.pyannet_forward(params, jnp.asarray(x), cfg))
    assert ours.shape == theirs.shape == (2, P.pyannet_num_frames(num_samples, cfg), 3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_checkpoint_roundtrip_real_scale(tmp_path):
    """Converted real-scale pytrees survive the .npz checkpoint format."""
    rng = np.random.default_rng(102)
    params = {
        "segmentation": convert.pyannet_from_pyannote(
            make_pyannote_pyannet_state_dict(rng), PYANNET_REAL
        ),
        "embedding": convert.ecapa_from_speechbrain(
            make_speechbrain_ecapa_state_dict(rng), ECAPA_REAL
        ),
    }
    convert.save_checkpoint(str(tmp_path), params)
    loaded = convert.load_checkpoint(str(tmp_path))
    import jax

    for name in ("segmentation", "embedding"):
        for a, b in zip(jax.tree.leaves(params[name]), jax.tree.leaves(loaded[name])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_full_pipeline_with_converted_real_scale_weights():
    """End-to-end: real-scale converted weights drive the full pipeline
    (the path a user takes the day real checkpoints are converted)."""
    import dataclasses as dc

    from pyannote_audio_speaker_diarization_cpp_tpu.config import DEFAULT_CONFIG
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
        SpeakerDiarizationPipeline,
    )

    rng = np.random.default_rng(103)
    params = {
        "segmentation": convert.pyannet_from_pyannote(
            make_pyannote_pyannet_state_dict(rng), PYANNET_REAL
        ),
        "embedding": convert.ecapa_from_speechbrain(
            make_speechbrain_ecapa_state_dict(rng), ECAPA_REAL
        ),
    }
    cfg = dc.replace(DEFAULT_CONFIG, chunk_bucket=4)
    pipeline = SpeakerDiarizationPipeline(cfg, params=params, seg_batch=4, emb_batch=4)
    audio = (0.1 * rng.normal(size=int(6.2 * 16000))).astype(np.float32)
    ann = pipeline(audio)
    for t in ann.turns():
        assert t.end > t.start >= 0.0
