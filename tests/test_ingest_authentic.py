"""AUTHENTIC ONNX ingest fixtures (VERDICT r3 item 5).

The round-3 ingest tests encoded ModelProto by hand; real exporters emit
wire details a hand-rolled encoder can drift from. Here the fixtures are
produced by the REAL ``torch.onnx.export`` (the exact tool the reference
used, segment/export2.py:40-52 / embeddings/export3.py:151-190) on torch
modules whose module paths replicate the published models' state-dict
layouts, so the exported initializer names match the real segment2.onnx /
emd4.onnx blobs.

Environment note: this torch build serializes the proto in C++
(``graph._export_onnx``); the only step needing the absent ``onnx`` python
package is ``_add_onnxscript_fn`` (a no-op unless custom onnxscript ops are
present), which is patched to identity.

What the authentic exports pin that hand-built fixtures could not:
  - the real wire format (packed repeated fields, raw_data vs typed data);
  - torch's initializer NAMING on export: nn.Linear folds into
    MatMul/Gemm with renamed ``onnx::MatMul_N`` initializers — the real
    segment2.onnx therefore does NOT carry ``linear.0.weight``-style names,
    and ingest must recover the linear stack from the graph structure;
  - the constant-folded vs parametric sinc filterbank layouts
    (do_constant_folding True/False).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _cfg import SMALL_ECAPA, SMALL_PYANNET  # noqa: E402
from test_convert_real_scale import (  # noqa: E402
    make_pyannote_pyannet_state_dict,
    make_speechbrain_ecapa_state_dict,
)

from pyannote_audio_speaker_diarization_cpp_tpu.models import (  # noqa: E402
    convert,
    ingest,
)
from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as P  # noqa: E402


def _patch_export():
    """Bypass the one onnx-package-dependent no-op in the export path."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = lambda proto, custom_opsets: proto


_patch_export()


# ---------------------------------------------------------------------------
# torch modules with the PUBLISHED module paths (export-name fidelity)
# ---------------------------------------------------------------------------


class _SincConv(nn.Module):
    """asteroid ParamSincFB-shaped module: parameters low_hz_/band_hz_,
    filters computed in forward (constant-folded away when the exporter
    folds constants — the real segment2.onnx case)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.low_hz_ = nn.Parameter(torch.empty(cfg.num_filters, 1))
        self.band_hz_ = nn.Parameter(torch.empty(cfg.num_filters, 1))

    def filters(self):
        cfg = self.cfg
        low = cfg.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(
            low + cfg.min_band_hz + torch.abs(self.band_hz_),
            cfg.min_low_hz,
            cfg.sample_rate / 2,
        )
        band = (high - low)[:, 0]
        half = (cfg.kernel_size - 1) // 2
        n_ = (
            2 * math.pi * torch.arange(-half, 0.0)[None, :] / cfg.sample_rate
        )
        n_lin = torch.linspace(0.0, cfg.kernel_size / 2 - 1, half)
        window = 0.54 - 0.46 * torch.cos(2 * math.pi * n_lin / cfg.kernel_size)
        left = ((torch.sin(high * n_) - torch.sin(low * n_)) / (n_ / 2)) * window
        bp = torch.cat([left, 2 * band[:, None], torch.flip(left, dims=[1])], dim=1)
        return (bp / (2 * band[:, None]))[:, None, :]

    def forward(self, x):
        return TF.conv1d(x, self.filters(), stride=self.cfg.stride)


class RefLayoutPyanNet(nn.Module):
    """PyanNet with pyannote's EXACT module paths (sincnet.wav_norm1d,
    sincnet.conv1d.{0,1,2}, sincnet.norm1d.{0,1,2}, lstm, linear.{0,1},
    classifier) so torch.onnx.export emits the same initializer names the
    real segment2.onnx carries."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        sincnet = nn.Module()
        sincnet.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
        sincnet.conv1d = nn.ModuleList(
            [
                _SincConv(cfg),
                nn.Conv1d(cfg.num_filters, cfg.conv_channels, 5),
                nn.Conv1d(cfg.conv_channels, cfg.conv_channels, 5),
            ]
        )
        sincnet.norm1d = nn.ModuleList(
            [
                nn.InstanceNorm1d(cfg.num_filters, affine=True),
                nn.InstanceNorm1d(cfg.conv_channels, affine=True),
                nn.InstanceNorm1d(cfg.conv_channels, affine=True),
            ]
        )
        self.sincnet = sincnet
        self.lstm = nn.LSTM(
            cfg.conv_channels,
            cfg.lstm_hidden,
            num_layers=cfg.lstm_layers,
            bidirectional=True,
            batch_first=True,
        )
        self.linear = nn.ModuleList(
            [
                nn.Linear(
                    2 * cfg.lstm_hidden if i == 0 else cfg.linear_hidden,
                    cfg.linear_hidden,
                )
                for i in range(cfg.linear_layers)
            ]
        )
        self.classifier = nn.Linear(cfg.linear_hidden, cfg.num_classes)

    def forward(self, x):  # (B, 1, N) like segment2.onnx
        out = self.sincnet.wav_norm1d(x)
        out = self.sincnet.conv1d[0](out)
        out = torch.abs(out)
        out = TF.leaky_relu(self.sincnet.norm1d[0](TF.max_pool1d(out, 3, 3)), 0.01)
        out = TF.leaky_relu(
            self.sincnet.norm1d[1](TF.max_pool1d(self.sincnet.conv1d[1](out), 3, 3)),
            0.01,
        )
        out = TF.leaky_relu(
            self.sincnet.norm1d[2](TF.max_pool1d(self.sincnet.conv1d[2](out), 3, 3)),
            0.01,
        )
        out, _ = self.lstm(out.transpose(1, 2))
        for lin in self.linear:
            out = TF.leaky_relu(lin(out), 0.01)
        return torch.sigmoid(self.classifier(out))


class _SBConvWrap(nn.Module):
    def __init__(self, in_c, out_c, k):
        super().__init__()
        self.conv = nn.Conv1d(in_c, out_c, k)

    def forward(self, x):
        return self.conv(x)


class _SBNormWrap(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.BatchNorm1d(c)

    def forward(self, x):
        return self.norm(x)


class _SBTDNN(nn.Module):
    def __init__(self, in_c, out_c, k):
        super().__init__()
        self.conv = _SBConvWrap(in_c, out_c, k)
        self.norm = _SBNormWrap(out_c)
        self._pad = (k - 1) // 2

    def forward(self, x):
        if self._pad:
            x = TF.pad(x, (self._pad, self._pad), mode="reflect")
        return self.norm(TF.relu(self.conv(x)))


class _SBRes2Net(nn.Module):
    def __init__(self, c, k, scale):
        super().__init__()
        w = c // scale
        self.blocks = nn.ModuleList([_SBTDNN(w, w, k) for _ in range(scale - 1)])
        self.scale = scale

    def forward(self, x):
        parts = torch.split(x, x.shape[1] // self.scale, dim=1)
        outs, yp = [parts[0]], None
        for i in range(1, self.scale):
            xi = parts[i] if i == 1 else parts[i] + yp
            yp = self.blocks[i - 1](xi)
            outs.append(yp)
        return torch.cat(outs, dim=1)


class _SBSE(nn.Module):
    def __init__(self, c, se_c):
        super().__init__()
        self.conv1 = _SBConvWrap(c, se_c, 1)
        self.conv2 = _SBConvWrap(se_c, c, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.sigmoid(self.conv2(TF.relu(self.conv1(s))))
        return x * s


class _SBSERes2Net(nn.Module):
    def __init__(self, in_c, c, k, scale, se_c):
        super().__init__()
        self.tdnn1 = _SBTDNN(in_c, c, 1)
        self.res2net_block = _SBRes2Net(c, k, scale)
        self.tdnn2 = _SBTDNN(c, c, 1)
        self.se_block = _SBSE(c, se_c)

    def forward(self, x):
        return self.se_block(self.tdnn2(self.res2net_block(self.tdnn1(x)))) + x


class RefLayoutEcapaWrapper(nn.Module):
    """emd4.onnx-shaped export module: an ``embedding_model`` submodule with
    speechbrain's EXACT module paths (blocks.N..., mfa, asp, asp_bn, fc) —
    every ECAPA initializer then exports under the ``embedding_model.``
    prefix like the reference's MyEmbedding0 export
    (embeddings/export3.py:151-190)."""

    def __init__(self, cfg):
        super().__init__()
        em = nn.Module()
        ch = cfg.channels
        em.blocks = nn.ModuleList(
            [_SBTDNN(cfg.in_channels, ch[0], cfg.kernel_sizes[0])]
            + [
                _SBSERes2Net(
                    ch[i - 1], ch[i], cfg.kernel_sizes[i], cfg.res2net_scale,
                    cfg.se_channels,
                )
                for i in (1, 2, 3)
            ]
        )
        em.mfa = _SBTDNN(sum(ch[1:4]), ch[-1], 1)
        asp = nn.Module()
        asp_in = ch[-1] * 3 if cfg.global_context else ch[-1]
        asp.tdnn = _SBTDNN(asp_in, cfg.attention_channels, 1)
        asp.conv = _SBConvWrap(cfg.attention_channels, ch[-1], 1)
        em.asp = asp
        em.asp_bn = _SBNormWrap(ch[-1] * 2)
        em.fc = _SBConvWrap(ch[-1] * 2, cfg.emb_dim, 1)
        self.embedding_model = em
        self.cfg = cfg

    def forward(self, feats):  # (B, T, mel) — trace driver: the ingest
        # reader consumes INITIALIZERS (names+values), all of which this
        # forward exercises; attention statistics simplified to unmasked
        # mean/std for export tractability
        em = self.embedding_model
        x = feats.transpose(1, 2)
        x0 = em.blocks[0](x)
        x1 = em.blocks[1](x0)
        x2 = em.blocks[2](x1)
        x3 = em.blocks[3](x2)
        x = em.mfa(torch.cat([x1, x2, x3], dim=1))
        T = x.shape[-1]
        mean = x.mean(dim=2, keepdim=True)
        std = x.std(dim=2, keepdim=True)
        attn = torch.cat(
            [x, mean.repeat(1, 1, T), std.repeat(1, 1, T)], dim=1
        )
        attn = torch.softmax(em.asp.conv(torch.tanh(em.asp.tdnn(attn))), dim=2)
        mean = (attn * x).sum(2)
        std = torch.sqrt(((attn * (x - mean.unsqueeze(2)) ** 2).sum(2)).clamp(1e-12))
        pooled = torch.cat([mean, std], dim=1).unsqueeze(2)
        return em.fc(em.asp_bn(pooled)).squeeze(2)


def _load_ref_sd(module, sd):
    """Load a published-layout state dict into a RefLayout module (names
    match by construction, modulo torch's extra buffers)."""
    own = module.state_dict()
    filtered = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in sd.items()
        if k in own and not k.endswith("num_batches_tracked")
    }
    missing = [
        k
        for k in own
        if k not in filtered
        and not k.endswith("num_batches_tracked")
        and "cfg" not in k
    ]
    assert not missing, f"layout drift: {missing[:5]}"
    module.load_state_dict(filtered, strict=False)
    return module


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def seg_sd():
    return make_pyannote_pyannet_state_dict(np.random.default_rng(3), SMALL_PYANNET)


@pytest.fixture(scope="module")
def emb_sd():
    return make_speechbrain_ecapa_state_dict(np.random.default_rng(4), SMALL_ECAPA)


def _export(module, args, path, fold, **kw):
    module.eval()
    with torch.no_grad():
        torch.onnx.export(
            module,
            args,
            path,
            opset_version=17,  # segment/export2.py:47
            do_constant_folding=fold,
            dynamo=False,
            **kw,
        )
    return path


def test_authentic_segment_export_folded_roundtrip(tmp_path, seg_sd):
    """segment2.onnx layout, as actually exported (constant folding ON per
    export2.py:46): sinc params fold into the conv weight; LSTM weights live
    in LSTM nodes with the [i,o,f,c] gate order; nn.Linear weights are
    RENAMED MatMul initializers. pyannet_from_onnx must reconstruct a
    pytree whose forward matches the original weights' forward."""
    model = _load_ref_sd(RefLayoutPyanNet(SMALL_PYANNET), seg_sd)
    path = str(tmp_path / "segment2.onnx")
    dummy = torch.zeros(2, 1, 16000)
    _export(
        model,
        dummy,
        path,
        fold=True,
        input_names=["input"],
        output_names=["output"],
        dynamic_axes={"input": {0: "B", 2: "T"}},  # export2.py:49-51
    )

    params = ingest.pyannet_from_onnx(path, SMALL_PYANNET)
    ref_params = convert.pyannet_from_pyannote(seg_sd, SMALL_PYANNET)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 16000)).astype(np.float32) * 0.1
    )
    out_ingested = np.asarray(P.pyannet_forward(params, x, SMALL_PYANNET))
    out_reference = np.asarray(P.pyannet_forward(ref_params, x, SMALL_PYANNET))
    np.testing.assert_allclose(out_ingested, out_reference, rtol=1e-4, atol=1e-5)


def test_authentic_segment_export_parametric_roundtrip(tmp_path, seg_sd):
    """Folding OFF keeps low_hz_/band_hz_ as named initializers — the other
    layout pyannet_from_onnx supports; weights must round-trip exactly."""
    model = _load_ref_sd(RefLayoutPyanNet(SMALL_PYANNET), seg_sd)
    path = str(tmp_path / "segment2_nofold.onnx")
    _export(
        model,
        torch.zeros(2, 1, 16000),
        path,
        fold=False,
        input_names=["input"],
        output_names=["output"],
        dynamic_axes={"input": {0: "B", 2: "T"}},
    )
    params = ingest.pyannet_from_onnx(path, SMALL_PYANNET)
    np.testing.assert_array_equal(
        np.asarray(params["sincnet"]["sinc"]["low_hz"]),
        seg_sd["sincnet.conv1d.0.low_hz_"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["sincnet"]["sinc"]["band_hz"]),
        seg_sd["sincnet.conv1d.0.band_hz_"],
    )
    ref_params = convert.pyannet_from_pyannote(seg_sd, SMALL_PYANNET)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_authentic_emd4_export_roundtrip(tmp_path, emb_sd):
    """emd4.onnx layout: every ECAPA initializer under the
    ``embedding_model.`` prefix. ecapa_from_onnx must produce a pytree
    weight-equal to the direct speechbrain conversion."""
    model = _load_ref_sd(
        RefLayoutEcapaWrapper(SMALL_ECAPA),
        {f"embedding_model.{k}": v for k, v in emb_sd.items()},
    )
    path = str(tmp_path / "emd4.onnx")
    _export(
        model,
        torch.zeros(2, 50, SMALL_ECAPA.in_channels),
        path,
        fold=True,
        input_names=["feats"],
        output_names=["embedding"],
        dynamic_axes={"feats": {0: "B"}},
    )
    inits, _ = ingest.read_onnx_model(path)
    assert any(k.startswith("embedding_model.") for k in inits), list(inits)[:5]
    params = ingest.ecapa_from_onnx(path, SMALL_ECAPA)
    ref_params = convert.ecapa_from_speechbrain(emb_sd, SMALL_ECAPA)
    la, lb = jax.tree.leaves(params), jax.tree.leaves(ref_params)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_authentic_wire_format_details(tmp_path, seg_sd):
    """The authentic blob exercises the wire features the hand-built
    fixtures approximated: packed repeated dims, raw_data initializers, and
    graph-node recovery (LSTM present; no lstm.* named initializers)."""
    model = _load_ref_sd(RefLayoutPyanNet(SMALL_PYANNET), seg_sd)
    path = str(tmp_path / "wire.onnx")
    _export(model, torch.zeros(1, 1, 16000), path, fold=True)
    inits, nodes = ingest.read_onnx_model(path)
    ops = {n["op_type"] for n in nodes}
    assert "LSTM" in ops and "Conv" in ops
    assert not any(k.startswith("lstm.weight") for k in inits)
    # every initializer parsed to a well-formed array
    for k, v in inits.items():
        assert isinstance(v, np.ndarray), k
