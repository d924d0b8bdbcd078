"""Checkpoint serialization and torch state-dict converters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_audio_speaker_diarization_cpp_tpu.models import convert
from pyannote_audio_speaker_diarization_cpp_tpu.models import ecapa as E
from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as P


def _trees_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip(tmp_path):
    params = convert.random_params(seed=1)
    convert.save_checkpoint(str(tmp_path), params)
    loaded = convert.load_checkpoint(str(tmp_path))
    assert set(loaded) == {"segmentation", "embedding"}
    _trees_equal(params["segmentation"], loaded["segmentation"])
    _trees_equal(params["embedding"], loaded["embedding"])
    # structures must be interchangeable with the live models
    out = P.pyannet_forward(
        loaded["segmentation"], jnp.zeros((1, 8000)), P.PyanNetConfig()
    )
    assert out.shape[0] == 1


def test_ecapa_converter_key_layout():
    """Build a synthetic state dict with speechbrain's documented key naming
    and check every parameter lands in the right pytree slot."""
    cfg = E.EcapaConfig(
        in_channels=8,
        channels=(16, 16, 16, 16, 48),
        kernel_sizes=(5, 3, 3, 3, 1),
        dilations=(1, 2, 3, 4, 1),
        attention_channels=8,
        res2net_scale=4,
        se_channels=4,
        emb_dim=12,
    )
    rng = np.random.default_rng(0)
    sd = {}

    def add_conv(prefix, in_c, out_c, k):
        sd[f"{prefix}.weight"] = rng.normal(size=(out_c, in_c, k)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(out_c,)).astype(np.float32)

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 2, size=(c,)).astype(np.float32)

    def add_tdnn(prefix, in_c, out_c, k):
        add_conv(f"{prefix}.conv.conv", in_c, out_c, k)
        add_bn(f"{prefix}.norm.norm", out_c)

    add_tdnn("blocks.0", 8, 16, 5)
    for i in range(1, 4):
        add_tdnn(f"blocks.{i}.tdnn1", 16, 16, 1)
        for j in range(cfg.res2net_scale - 1):
            add_tdnn(f"blocks.{i}.res2net_block.blocks.{j}", 4, 4, 3)
        add_tdnn(f"blocks.{i}.tdnn2", 16, 16, 1)
        add_conv(f"blocks.{i}.se_block.conv1.conv", 16, 4, 1)
        add_conv(f"blocks.{i}.se_block.conv2.conv", 4, 16, 1)
    add_tdnn("mfa", 48, 48, 1)
    add_tdnn("asp.tdnn", 144, 8, 1)
    add_conv("asp.conv.conv", 8, 48, 1)
    add_bn("asp_bn.norm", 96)
    add_conv("fc.conv", 96, 12, 1)

    params = convert.ecapa_from_speechbrain(sd, cfg)
    # forward must run and every converted leaf must be used
    feats = jnp.asarray(rng.normal(size=(2, 30, 8)).astype(np.float32))
    out = E.ecapa_forward(params, feats, jnp.ones((2,)), cfg)
    assert out.shape == (2, 12)
    np.testing.assert_array_equal(
        np.asarray(params["fc"]["weight"]), sd["fc.conv.weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(params["block1"]["se"]["conv1"]["weight"]),
        sd["blocks.1.se_block.conv1.conv.weight"],
    )


def test_pyannet_converter_key_layout():
    cfg = P.PyanNetConfig(
        num_filters=8, conv_channels=6, lstm_hidden=4, lstm_layers=2, linear_hidden=4
    )
    rng = np.random.default_rng(1)
    sd = {}

    def lin(prefix, i, o):
        sd[f"{prefix}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(o,)).astype(np.float32)

    def inorm(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(c,)).astype(np.float32)

    inorm("sincnet.wav_norm1d", 1)
    sd["sincnet.conv1d.0.low_hz_"] = rng.uniform(30, 4000, size=(8, 1)).astype(np.float32)
    sd["sincnet.conv1d.0.band_hz_"] = rng.uniform(10, 400, size=(8, 1)).astype(np.float32)
    inorm("sincnet.norm1d.0", 8)
    sd["sincnet.conv1d.1.weight"] = rng.normal(size=(6, 8, 5)).astype(np.float32)
    sd["sincnet.conv1d.1.bias"] = rng.normal(size=(6,)).astype(np.float32)
    inorm("sincnet.norm1d.1", 6)
    sd["sincnet.conv1d.2.weight"] = rng.normal(size=(6, 6, 5)).astype(np.float32)
    sd["sincnet.conv1d.2.bias"] = rng.normal(size=(6,)).astype(np.float32)
    inorm("sincnet.norm1d.2", 6)
    for i in range(2):
        in_size = 6 if i == 0 else 8
        for suffix in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{i}{suffix}"] = rng.normal(size=(16, in_size)).astype(np.float32)
            sd[f"lstm.weight_hh_l{i}{suffix}"] = rng.normal(size=(16, 4)).astype(np.float32)
            sd[f"lstm.bias_ih_l{i}{suffix}"] = rng.normal(size=(16,)).astype(np.float32)
            sd[f"lstm.bias_hh_l{i}{suffix}"] = rng.normal(size=(16,)).astype(np.float32)
    lin("linear.0", 8, 4)
    lin("linear.1", 4, 4)
    lin("classifier", 4, 3)

    params = convert.pyannet_from_pyannote(sd, cfg)
    out = P.pyannet_forward(params, jnp.zeros((1, 4000)), cfg)
    assert out.shape == (1, P.pyannet_num_frames(4000, cfg), 3)
    np.testing.assert_array_equal(
        np.asarray(params["sincnet"]["sinc"]["low_hz"]),
        sd["sincnet.conv1d.0.low_hz_"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["lstm"][1]["bwd"]["weight_ih"]),
        sd["lstm.weight_ih_l1_reverse"],
    )
