"""Model parity vs torch oracles.

Each test builds a torch module mirroring the published architecture
semantics (speechbrain ECAPA-TDNN / pyannote PyanNet — see citations in the
model docstrings), copies one set of random weights into both frameworks, and
requires the forward passes to agree. torch's conv/LSTM/norm kernels are an
independent implementation, so agreement validates our layer math.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyannote_audio_speaker_diarization_cpp_tpu.models import layers as L  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.models import ecapa as E  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as P  # noqa: E402


def j2t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# layer primitives
# ---------------------------------------------------------------------------


def test_conv1d_matches_torch():
    key = jax.random.PRNGKey(0)
    p = L.init_conv1d(key, 8, 16, 5)
    x = np.random.default_rng(0).normal(size=(2, 8, 50)).astype(np.float32)
    ours = np.asarray(L.conv1d(jnp.asarray(x), p, dilation=2, padding="same", pad_mode="reflect"))
    xt = torch.from_numpy(x)
    pad = (5 - 1) * 2 // 2
    xt = F.pad(xt, (pad, pad), mode="reflect")
    theirs = F.conv1d(xt, j2t(p["weight"]), j2t(p["bias"]), dilation=2).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_maxpool_instancenorm_match_torch():
    x = np.random.default_rng(1).normal(size=(2, 4, 31)).astype(np.float32)
    ours = np.asarray(L.max_pool1d(jnp.asarray(x), 3, 3))
    theirs = F.max_pool1d(torch.from_numpy(x), 3, 3).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    p = {"weight": jnp.asarray(np.random.default_rng(2).normal(size=(4,)).astype(np.float32)),
         "bias": jnp.asarray(np.random.default_rng(3).normal(size=(4,)).astype(np.float32))}
    ours = np.asarray(L.instancenorm1d(jnp.asarray(x), p))
    inorm = nn.InstanceNorm1d(4, affine=True)
    with torch.no_grad():
        inorm.weight.copy_(j2t(p["weight"]))
        inorm.bias.copy_(j2t(p["bias"]))
    with torch.no_grad():
        theirs = inorm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_lstm_matches_torch():
    key = jax.random.PRNGKey(1)
    layers = []
    in_size, hidden = 12, 16
    lstm_t = nn.LSTM(in_size, hidden, num_layers=2, bidirectional=True, batch_first=True)
    sz = in_size
    for i in range(2):
        fwd = L.init_lstm(jax.random.fold_in(key, 2 * i), sz, hidden)
        bwd = L.init_lstm(jax.random.fold_in(key, 2 * i + 1), sz, hidden)
        layers.append({"fwd": fwd, "bwd": bwd})
        with torch.no_grad():
            getattr(lstm_t, f"weight_ih_l{i}").copy_(j2t(fwd["weight_ih"]))
            getattr(lstm_t, f"weight_hh_l{i}").copy_(j2t(fwd["weight_hh"]))
            getattr(lstm_t, f"bias_ih_l{i}").copy_(j2t(fwd["bias_ih"]))
            getattr(lstm_t, f"bias_hh_l{i}").copy_(j2t(fwd["bias_hh"]))
            getattr(lstm_t, f"weight_ih_l{i}_reverse").copy_(j2t(bwd["weight_ih"]))
            getattr(lstm_t, f"weight_hh_l{i}_reverse").copy_(j2t(bwd["weight_hh"]))
            getattr(lstm_t, f"bias_ih_l{i}_reverse").copy_(j2t(bwd["bias_ih"]))
            getattr(lstm_t, f"bias_hh_l{i}_reverse").copy_(j2t(bwd["bias_hh"]))
        sz = 2 * hidden
    x = np.random.default_rng(4).normal(size=(3, 20, in_size)).astype(np.float32)
    ours = np.asarray(L.bilstm_stack(jnp.asarray(x), layers))
    with torch.no_grad():
        theirs, _ = lstm_t(torch.from_numpy(x))
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_length_mask_matches_speechbrain_semantics():
    # frame valid iff index < rel_len * T (no rounding)
    m = np.asarray(L.length_mask(jnp.asarray([1.0, 0.5, 0.349]), 10))
    np.testing.assert_array_equal(m[0], np.ones(10))
    np.testing.assert_array_equal(m[1], [1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
    # 0.349 * 10 = 3.49 -> indices 0..3 valid (strict '<' comparison)
    np.testing.assert_array_equal(m[2], [1, 1, 1, 1, 0, 0, 0, 0, 0, 0])


# ---------------------------------------------------------------------------
# ECAPA vs torch mirror
# ---------------------------------------------------------------------------


class TorchTDNN(nn.Module):
    def __init__(self, in_c, out_c, k, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(in_c, out_c, k, dilation=dilation)
        self.k, self.d = k, dilation
        self.bn = nn.BatchNorm1d(out_c).eval()

    def forward(self, x):
        pad = (self.k - 1) * self.d // 2
        if pad:
            x = F.pad(x, (pad, pad), mode="reflect")
        return self.bn(F.relu(self.conv(x)))


class TorchSERes2Net(nn.Module):
    def __init__(self, c, k, dilation, scale, se_c):
        super().__init__()
        self.scale = scale
        w = c // scale
        self.tdnn1 = TorchTDNN(c, c, 1)
        self.blocks = nn.ModuleList([TorchTDNN(w, w, k, dilation) for _ in range(scale - 1)])
        self.tdnn2 = TorchTDNN(c, c, 1)
        self.se1 = nn.Conv1d(c, se_c, 1)
        self.se2 = nn.Conv1d(se_c, c, 1)

    def forward(self, x, mask):
        residual = x
        y = self.tdnn1(x)
        parts = torch.split(y, y.shape[1] // self.scale, dim=1)
        # speechbrain Res2NetBlock: split 0 is identity, block j-1 processes
        # split j with accumulation of the previous block's output
        outs, yp = [parts[0]], None
        for i in range(1, self.scale):
            xi = parts[i] if i == 1 else parts[i] + yp
            yp = self.blocks[i - 1](xi)
            outs.append(yp)
        y = torch.cat(outs, dim=1)
        y = self.tdnn2(y)
        total = mask.sum(dim=2, keepdim=True)
        s = (y * mask).sum(dim=2, keepdim=True) / total
        s = torch.sigmoid(self.se2(F.relu(self.se1(s))))
        return y * s + residual


class TorchEcapa(nn.Module):
    """speechbrain-topology ECAPA mirror (small config for the test)."""

    def __init__(self, cfg: E.EcapaConfig):
        super().__init__()
        self.cfg = cfg
        self.block0 = TorchTDNN(cfg.in_channels, cfg.channels[0], cfg.kernel_sizes[0])
        self.b1 = TorchSERes2Net(cfg.channels[1], cfg.kernel_sizes[1], cfg.dilations[1], cfg.res2net_scale, cfg.se_channels)
        self.b2 = TorchSERes2Net(cfg.channels[2], cfg.kernel_sizes[2], cfg.dilations[2], cfg.res2net_scale, cfg.se_channels)
        self.b3 = TorchSERes2Net(cfg.channels[3], cfg.kernel_sizes[3], cfg.dilations[3], cfg.res2net_scale, cfg.se_channels)
        self.mfa = TorchTDNN(sum(cfg.channels[1:4]), cfg.channels[-1], 1)
        asp_in = cfg.channels[-1] * 3 if cfg.global_context else cfg.channels[-1]
        self.asp_tdnn = TorchTDNN(asp_in, cfg.attention_channels, 1)
        self.asp_conv = nn.Conv1d(cfg.attention_channels, cfg.channels[-1], 1)
        self.asp_bn = nn.BatchNorm1d(cfg.channels[-1] * 2).eval()
        self.fc = nn.Conv1d(cfg.channels[-1] * 2, cfg.emb_dim, 1)

    @staticmethod
    def _stats(x, m, eps):
        mean = (m * x).sum(2)
        std = torch.sqrt(((m * (x - mean.unsqueeze(2)) ** 2).sum(2)).clamp(eps))
        return mean, std

    def forward(self, feats, lengths):
        x = feats.transpose(1, 2)
        T = x.shape[-1]
        mask = (torch.arange(T)[None, :] < (lengths * T)[:, None]).float()[:, None, :]
        x0 = self.block0(x)
        x1 = self.b1(x0, mask)
        x2 = self.b2(x1, mask)
        x3 = self.b3(x2, mask)
        x = torch.cat([x1, x2, x3], dim=1)
        x = self.mfa(x)
        total = mask.sum(dim=2, keepdim=True)
        mean, std = self._stats(x, mask / total, self.cfg.eps)
        attn = torch.cat(
            [x, mean.unsqueeze(2).repeat(1, 1, T), std.unsqueeze(2).repeat(1, 1, T)], dim=1
        )
        attn = self.asp_conv(torch.tanh(self.asp_tdnn(attn)))
        attn = attn.masked_fill(mask == 0, float("-inf"))
        attn = torch.softmax(attn, dim=2)
        mean, std = self._stats(x, attn, self.cfg.eps)
        pooled = torch.cat([mean, std], dim=1).unsqueeze(2)
        pooled = self.asp_bn(pooled)
        return self.fc(pooled).squeeze(2)


def _copy_tdnn(tm: TorchTDNN, p):
    with torch.no_grad():
        tm.conv.weight.copy_(j2t(p["conv"]["weight"]))
        tm.conv.bias.copy_(j2t(p["conv"]["bias"]))
        tm.bn.weight.copy_(j2t(p["bn"]["weight"]))
        tm.bn.bias.copy_(j2t(p["bn"]["bias"]))
        tm.bn.running_mean.copy_(j2t(p["bn"]["running_mean"]))
        tm.bn.running_var.copy_(j2t(p["bn"]["running_var"]))


def _copy_seres2net(tm: TorchSERes2Net, p):
    _copy_tdnn(tm.tdnn1, p["tdnn1"])
    for blk, bp in zip(tm.blocks, p["res2net"]["blocks"]):
        _copy_tdnn(blk, bp)
    _copy_tdnn(tm.tdnn2, p["tdnn2"])
    with torch.no_grad():
        tm.se1.weight.copy_(j2t(p["se"]["conv1"]["weight"]))
        tm.se1.bias.copy_(j2t(p["se"]["conv1"]["bias"]))
        tm.se2.weight.copy_(j2t(p["se"]["conv2"]["weight"]))
        tm.se2.bias.copy_(j2t(p["se"]["conv2"]["bias"]))


SMALL_ECAPA = E.EcapaConfig(
    in_channels=20,
    channels=(32, 32, 32, 32, 96),
    kernel_sizes=(5, 3, 3, 3, 1),
    dilations=(1, 2, 3, 4, 1),
    attention_channels=16,
    res2net_scale=4,
    se_channels=8,
    emb_dim=24,
)


def test_ecapa_matches_torch_mirror():
    cfg = SMALL_ECAPA
    params = E.init_ecapa(jax.random.PRNGKey(7), cfg)
    # randomize BN stats so the test catches mean/var mix-ups
    rng = np.random.default_rng(11)

    def randomize_bn(p):
        p["bn"]["running_mean"] = jnp.asarray(rng.normal(size=p["bn"]["running_mean"].shape).astype(np.float32))
        p["bn"]["running_var"] = jnp.asarray(rng.uniform(0.5, 2.0, size=p["bn"]["running_var"].shape).astype(np.float32))

    for blk in ["block0", "mfa"]:
        randomize_bn(params[blk])
    for blk in ["block1", "block2", "block3"]:
        randomize_bn(params[blk]["tdnn1"])
        randomize_bn(params[blk]["tdnn2"])
        for b in params[blk]["res2net"]["blocks"]:
            randomize_bn(b)
    randomize_bn({"bn": params["asp_bn"]})
    randomize_bn({"bn": params["asp"]["tdnn"]["bn"]})

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

    feats = np.random.default_rng(12).normal(size=(3, 40, cfg.in_channels)).astype(np.float32)
    lens = np.array([1.0, 0.6, 0.31], dtype=np.float32)
    ours = np.asarray(E.ecapa_forward(params, jnp.asarray(feats), jnp.asarray(lens), cfg))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(feats), torch.from_numpy(lens)).numpy()
    assert ours.shape == theirs.shape == (3, cfg.emb_dim)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# PyanNet vs torch mirror
# ---------------------------------------------------------------------------


class TorchSincNet(nn.Module):
    def __init__(self, cfg: P.PyanNetConfig, jparams):
        super().__init__()
        self.cfg = cfg
        self.wav_norm = nn.InstanceNorm1d(1, affine=True)
        self.norm0 = nn.InstanceNorm1d(cfg.num_filters, affine=True)
        self.conv1 = nn.Conv1d(cfg.num_filters, cfg.conv_channels, 5)
        self.norm1 = nn.InstanceNorm1d(cfg.conv_channels, affine=True)
        self.conv2 = nn.Conv1d(cfg.conv_channels, cfg.conv_channels, 5)
        self.norm2 = nn.InstanceNorm1d(cfg.conv_channels, affine=True)
        sp = jparams["sincnet"]
        with torch.no_grad():
            for name, mod in [("wav_norm", self.wav_norm), ("norm0", self.norm0),
                              ("norm1", self.norm1), ("norm2", self.norm2)]:
                mod.weight.copy_(j2t(sp[name]["weight"]))
                mod.bias.copy_(j2t(sp[name]["bias"]))
            self.conv1.weight.copy_(j2t(sp["conv1"]["weight"]))
            self.conv1.bias.copy_(j2t(sp["conv1"]["bias"]))
            self.conv2.weight.copy_(j2t(sp["conv2"]["weight"]))
            self.conv2.bias.copy_(j2t(sp["conv2"]["bias"]))
        self.filters = j2t(P.sinc_filters(sp["sinc"], cfg)).float()

    def forward(self, x):
        out = self.wav_norm(x[:, None, :])
        out = F.conv1d(out, self.filters, stride=self.cfg.stride)
        out = torch.abs(out)
        out = F.leaky_relu(self.norm0(F.max_pool1d(out, 3, 3)), 0.01)
        out = F.leaky_relu(self.norm1(F.max_pool1d(self.conv1(out), 3, 3)), 0.01)
        out = F.leaky_relu(self.norm2(F.max_pool1d(self.conv2(out), 3, 3)), 0.01)
        return out


def test_pyannet_num_frames():
    assert P.pyannet_num_frames(80000) == 293


def test_pyannet_matches_torch_mirror():
    cfg = P.PyanNetConfig(lstm_hidden=16, lstm_layers=2, linear_hidden=16, num_filters=16, conv_channels=12)
    params = P.init_pyannet(jax.random.PRNGKey(3), cfg)
    num_samples = 8000
    x = np.random.default_rng(13).normal(size=(2, num_samples)).astype(np.float32)

    sinc_t = TorchSincNet(cfg, params).eval()
    lstm_t = nn.LSTM(cfg.conv_channels, cfg.lstm_hidden, num_layers=cfg.lstm_layers,
                     bidirectional=True, batch_first=True)
    with torch.no_grad():
        for i, layer in enumerate(params["lstm"]):
            getattr(lstm_t, f"weight_ih_l{i}").copy_(j2t(layer["fwd"]["weight_ih"]))
            getattr(lstm_t, f"weight_hh_l{i}").copy_(j2t(layer["fwd"]["weight_hh"]))
            getattr(lstm_t, f"bias_ih_l{i}").copy_(j2t(layer["fwd"]["bias_ih"]))
            getattr(lstm_t, f"bias_hh_l{i}").copy_(j2t(layer["fwd"]["bias_hh"]))
            getattr(lstm_t, f"weight_ih_l{i}_reverse").copy_(j2t(layer["bwd"]["weight_ih"]))
            getattr(lstm_t, f"weight_hh_l{i}_reverse").copy_(j2t(layer["bwd"]["weight_hh"]))
            getattr(lstm_t, f"bias_ih_l{i}_reverse").copy_(j2t(layer["bwd"]["bias_ih"]))
            getattr(lstm_t, f"bias_hh_l{i}_reverse").copy_(j2t(layer["bwd"]["bias_hh"]))

    with torch.no_grad():
        feat_t = sinc_t(torch.from_numpy(x))
        out_t, _ = lstm_t(feat_t.transpose(1, 2))
        for lin in params["linear"]:
            out_t = F.leaky_relu(F.linear(out_t, j2t(lin["weight"]), j2t(lin["bias"])), 0.01)
        out_t = torch.sigmoid(
            F.linear(out_t, j2t(params["classifier"]["weight"]), j2t(params["classifier"]["bias"]))
        ).numpy()

    ours = np.asarray(P.pyannet_forward(params, jnp.asarray(x), cfg))
    assert ours.shape == out_t.shape == (2, P.pyannet_num_frames(num_samples, cfg), cfg.num_classes)
    np.testing.assert_allclose(ours, out_t, rtol=1e-3, atol=1e-4)


def test_pyannet_masked_valid_equals_true_length():
    """The masked-statistics path (valid_samples) on a zero-padded input
    must reproduce true-length inference on the valid frames — the static-
    shape equivalent of the reference's short-orphan handling
    (segment/segment.py:103-108): masked instance norms + reset-at-end
    backward LSTM."""
    cfg = P.PyanNetConfig(
        num_filters=16, conv_channels=12, lstm_hidden=16, lstm_layers=2,
        linear_hidden=16,
    )
    params = P.init_pyannet(jax.random.PRNGKey(5), cfg)
    window = 8000
    rng = np.random.default_rng(17)
    x = (0.1 * rng.normal(size=(3, window))).astype(np.float32)
    lengths = [window, 5000, 2501]
    padded = x.copy()
    for i, L in enumerate(lengths):
        padded[i, L:] = 0.0

    out_masked = np.asarray(
        P.pyannet_forward(
            params, jnp.asarray(padded), cfg,
            valid_samples=jnp.asarray(lengths, dtype=jnp.int32),
        )
    )
    for i, L in enumerate(lengths):
        true_out = np.asarray(
            P.pyannet_forward(params, jnp.asarray(x[i:i+1, :L]), cfg)
        )
        nf = P.pyannet_num_frames(L, cfg)
        assert true_out.shape[1] == nf
        np.testing.assert_allclose(
            out_masked[i, :nf], true_out[0], rtol=1e-4, atol=1e-5,
            err_msg=f"row {i} length {L}",
        )


def test_pyannet_valid_chain_matches_num_frames():
    cfg = P.PyanNetConfig()
    import jax.numpy as jnp2

    for L in [80000, 79999, 40000, 8000, 2500, 251, 250, 17, 0]:
        chain = P.pyannet_valid_chain(jnp2.asarray([L]), cfg)
        expect = max(P.pyannet_num_frames(L, cfg), 0) if L >= cfg.kernel_size else 0
        assert int(chain[5][0]) == expect, (L, int(chain[5][0]), expect)


def test_bilstm_fused_equals_two_scan_reference():
    """The single-scan fused BiLSTM layer (both directions stacked on a
    leading axis) must agree with the two-scan reference formulation,
    including the valid-length masked path the exact-orphan pipeline uses."""
    key = jax.random.PRNGKey(7)
    layers = []
    in_size, hidden = 10, 12
    sz = in_size
    for i in range(3):
        layers.append(
            {
                "fwd": L.init_lstm(jax.random.fold_in(key, 2 * i), sz, hidden),
                "bwd": L.init_lstm(jax.random.fold_in(key, 2 * i + 1), sz, hidden),
            }
        )
        sz = 2 * hidden
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(4, 17, in_size)).astype(np.float32)
    )
    for valid in (None, jnp.asarray([17, 9, 1, 0], np.int32)):
        fused = np.asarray(L.bilstm_stack(x, layers, valid=valid, fused=True))
        ref = np.asarray(L.bilstm_stack(x, layers, valid=valid, fused=False))
        np.testing.assert_allclose(fused, ref, rtol=1e-6, atol=1e-6)


def test_ecapa_layouts_equivalent():
    """The channels-last (nhc) and shifted-GEMM (gemm) trunk formulations
    (docs/PERF.md round-5 stage-2 layout experiment) must match the NCH
    path on the same parameters: nhc bit-identical, gemm within f32
    reassociation."""
    import jax
    import jax.numpy as jnp

    from pyannote_audio_speaker_diarization_cpp_tpu.models import ecapa as E

    cfg = E.EcapaConfig(
        in_channels=16,
        channels=(64, 64, 64, 64, 192),
        attention_channels=32,
        se_channels=32,
        res2net_scale=4,
        emb_dim=24,
    )
    params = E.init_ecapa(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 57, 16)).astype(np.float32)
    )
    lens = jnp.asarray([1.0, 0.8, 0.5, 0.93], jnp.float32)
    ref = E.ecapa_forward(params, feats, lens, cfg)
    nhc = E.ecapa_forward(params, feats, lens, cfg, layout="nhc")
    gemm = E.ecapa_forward(params, feats, lens, cfg, layout="gemm")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(nhc))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(gemm), atol=1e-6)
