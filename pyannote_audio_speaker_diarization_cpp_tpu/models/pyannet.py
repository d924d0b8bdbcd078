"""PyanNet segmentation model (pyannote/segmentation@2022.07 topology).

TPU-native functional re-design of the model behind the reference's
``segment2.onnx`` (exported by reference segment/export2.py:16-53 from
pyannote/segmentation@2022.07): SincNet front-end (learnable band-pass sinc
filters, stride 10) + 4-layer bidirectional LSTM (hidden 128) + two 128-d
linear layers + 3-class sigmoid head. A 5 s / 80000-sample window maps to
293 output frames of 270 samples (0.016875 s), the frame grid hard-coded at
reference pipeline/src/speakerDiarizer.cpp:2430-2432.

The sinc filters are built from (low_hz, band_hz) parameters inside the
forward — a trivial (80, 251) computation — so the model stays trainable;
at inference XLA constant-folds it into a plain convolution.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L


@dataclasses.dataclass(frozen=True)
class PyanNetConfig:
    sample_rate: int = 16000
    num_filters: int = 80
    kernel_size: int = 251
    stride: int = 10
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    conv_channels: int = 60
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_hidden: int = 128
    linear_layers: int = 2
    num_classes: int = 3
    leaky_slope: float = 0.01


def pyannet_num_frames(num_samples: int, cfg: PyanNetConfig = PyanNetConfig()) -> int:
    """Output frame count for an input of ``num_samples`` samples.

    Mirrors the conv/pool arithmetic chain (sinc k251 s10 -> pool3 ->
    conv5 -> pool3 -> conv5 -> pool3): 80000 -> 293.
    """
    n = (num_samples - cfg.kernel_size) // cfg.stride + 1
    n = (n - 3) // 3 + 1
    n = n - 4
    n = (n - 3) // 3 + 1
    n = n - 4
    n = (n - 3) // 3 + 1
    return n


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_sinc(key, cfg: PyanNetConfig) -> Dict:
    """Mel-spaced initial band edges, classic SincNet parameterization
    (Ravanelli & Bengio, "Speaker Recognition from Raw Waveform with
    SincNet"; the filterbank behind pyannote's SincNet block)."""
    low_hz, high_hz = 30.0, cfg.sample_rate / 2 - (cfg.min_low_hz + cfg.min_band_hz)

    def to_mel(hz):
        return 2595 * np.log10(1 + hz / 700)

    def to_hz(mel):
        return 700 * (10 ** (mel / 2595) - 1)

    mel = np.linspace(to_mel(low_hz), to_mel(high_hz), cfg.num_filters + 1)
    hz = to_hz(mel)
    return {
        "low_hz": jnp.asarray(hz[:-1, None], jnp.float32),
        "band_hz": jnp.asarray(np.diff(hz)[:, None], jnp.float32),
    }


def init_pyannet(key, cfg: PyanNetConfig = PyanNetConfig()) -> Dict:
    keys = jax.random.split(key, 16)
    lstm_layers = []
    in_size = cfg.conv_channels
    for i in range(cfg.lstm_layers):
        lstm_layers.append(
            {
                "fwd": L.init_lstm(keys[2 * i], in_size, cfg.lstm_hidden),
                "bwd": L.init_lstm(keys[2 * i + 1], in_size, cfg.lstm_hidden),
            }
        )
        in_size = 2 * cfg.lstm_hidden
    linears = []
    lin_in = 2 * cfg.lstm_hidden
    for i in range(cfg.linear_layers):
        linears.append(L.init_linear(keys[8 + i], lin_in, cfg.linear_hidden))
        lin_in = cfg.linear_hidden
    return {
        "sincnet": {
            "wav_norm": L.init_instancenorm(1),
            "sinc": _init_sinc(keys[10], cfg),
            "norm0": L.init_instancenorm(cfg.num_filters),
            "conv1": L.init_conv1d(keys[11], cfg.num_filters, cfg.conv_channels, 5),
            "norm1": L.init_instancenorm(cfg.conv_channels),
            "conv2": L.init_conv1d(keys[12], cfg.conv_channels, cfg.conv_channels, 5),
            "norm2": L.init_instancenorm(cfg.conv_channels),
        },
        "lstm": lstm_layers,
        "linear": linears,
        "classifier": L.init_linear(keys[14], cfg.linear_hidden, cfg.num_classes),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def sinc_filters(p: Dict, cfg: PyanNetConfig) -> jnp.ndarray:
    """(num_filters, 1, kernel_size) band-pass filters from (low, band) params.

    Classic SincNet construction: bandpass = (sin(2pi f_hi n) - sin(2pi f_lo n))
    / (n/2), hamming-windowed, center sample = 2*band, normalized by 2*band.

    A params dict carrying precomputed ``filters`` (e.g. ingested from a
    constant-folded ONNX export, models/ingest.py pyannet_from_onnx) is
    returned as-is.
    """
    if "filters" in p:
        return p["filters"]
    low = cfg.min_low_hz + jnp.abs(p["low_hz"])
    high = jnp.clip(
        low + cfg.min_band_hz + jnp.abs(p["band_hz"]),
        cfg.min_low_hz,
        cfg.sample_rate / 2,
    )
    band = (high - low)[:, 0]

    half = (cfg.kernel_size - 1) // 2
    n_ = 2 * jnp.pi * jnp.arange(-half, 0.0)[None, :] / cfg.sample_rate
    # hamming window over the left half; SincNet uses
    # linspace(0, kernel_size/2 - 1, half) — non-integer spacing — not
    # arange(half), and converted checkpoints depend on the exact taps
    n_lin = jnp.linspace(0.0, cfg.kernel_size / 2 - 1, half)
    window = 0.54 - 0.46 * jnp.cos(2 * jnp.pi * n_lin / cfg.kernel_size)

    f_low = low * n_
    f_high = high * n_
    bp_left = ((jnp.sin(f_high) - jnp.sin(f_low)) / (n_ / 2)) * window[None, :]
    bp_center = 2 * band[:, None]
    bp = jnp.concatenate([bp_left, bp_center, jnp.flip(bp_left, axis=1)], axis=1)
    bp = bp / (2 * band[:, None])
    return bp[:, None, :]


def pyannet_valid_chain(valid_samples, cfg: PyanNetConfig = PyanNetConfig()):
    """Per-stage valid element counts for a (possibly padded) input of
    ``valid_samples`` real samples — the jnp twin of pyannet_num_frames.
    Every convolution/pool in SincNet is VALID-mode with floor counts, so an
    output element whose index is below the stage's valid count depends only
    on real input samples; padding can only contaminate the global
    instance-norm statistics and the backward LSTM, both of which take these
    counts as masks."""
    v = valid_samples
    v1 = jnp.maximum((v - cfg.kernel_size) // cfg.stride + 1, 0)
    v2 = jnp.maximum((v1 - 3) // 3 + 1, 0)
    v3 = jnp.maximum(v2 - 4, 0)
    v4 = jnp.maximum((v3 - 3) // 3 + 1, 0)
    v5 = jnp.maximum(v4 - 4, 0)
    v6 = jnp.maximum((v5 - 3) // 3 + 1, 0)
    return v1, v2, v3, v4, v5, v6


def sincnet_forward(
    x: jnp.ndarray,
    p: Dict,
    cfg: PyanNetConfig,
    precision=L.DEFAULT_PRECISION,
    valid_samples: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, num_samples) waveforms -> (B, conv_channels, frames).

    InstanceNorm -> sinc conv (stride 10) -> |.| -> pool3 -> IN -> leaky ->
    conv5 -> pool3 -> IN -> leaky -> conv5 -> pool3 -> IN -> leaky, following
    pyannote.audio SincNet (wav_norm1d + 3 conv/pool/norm blocks).

    ``valid_samples``: optional (B,) true lengths — instance-norm statistics
    run over the valid prefix only, reproducing true-length inference for
    every frame below the stage's valid count (zero extra compiles for
    short/orphan chunks; SURVEY.md section 7 "ragged final batch").
    """
    v_wav = v_norm0 = v_norm1 = v_norm2 = None
    if valid_samples is not None:
        _, v2, _, v4, _, v6 = pyannet_valid_chain(valid_samples, cfg)
        v_wav, v_norm0, v_norm1, v_norm2 = valid_samples, v2, v4, v6
    out = x[:, None, :]
    out = L.instancenorm1d(out, p["wav_norm"], valid=v_wav)
    filters = sinc_filters(p["sinc"], cfg)
    if x.shape[1] % cfg.stride == 0:
        # polyphase formulation: fold the stride into input channels
        # (x_r[t] = x[stride*t + r]) so the k-251/stride-10 conv becomes a
        # dense 10-channel k-26 conv XLA tiles far better onto the MXU —
        # identical math up to f32 reassociation (~2e-7 rel, tested), ~1.2x
        # measured on TPU v5e and much friendlier at full-set batches
        # (docs/PERF.md stage-1 experiments)
        B, N = x.shape
        O = filters.shape[0]
        q = -(-cfg.kernel_size // cfg.stride)  # taps per phase
        wpad = jnp.pad(
            filters[:, 0, :], ((0, 0), (0, q * cfg.stride - cfg.kernel_size))
        )
        w2 = wpad.reshape(O, q, cfg.stride).transpose(0, 2, 1)  # (O, stride, q)
        xr = out[:, 0, :].reshape(B, N // cfg.stride, cfg.stride)
        xr = jnp.swapaxes(xr, 1, 2)  # (B, stride, N/stride)
        out = jax.lax.conv_general_dilated(
            xr,
            w2,
            window_strides=(1,),
            padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=precision,
        )
        frames = (N - cfg.kernel_size) // cfg.stride + 1
        out = out[:, :, :frames]
    else:
        out = jax.lax.conv_general_dilated(
            out,
            filters,
            window_strides=(cfg.stride,),
            padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=precision,
        )
    out = jnp.abs(out)
    out = L.max_pool1d(out, 3, 3)
    out = jax.nn.leaky_relu(
        L.instancenorm1d(out, p["norm0"], valid=v_norm0), cfg.leaky_slope
    )
    out = L.conv1d(out, p["conv1"], precision=precision)
    out = L.max_pool1d(out, 3, 3)
    out = jax.nn.leaky_relu(
        L.instancenorm1d(out, p["norm1"], valid=v_norm1), cfg.leaky_slope
    )
    out = L.conv1d(out, p["conv2"], precision=precision)
    out = L.max_pool1d(out, 3, 3)
    out = jax.nn.leaky_relu(
        L.instancenorm1d(out, p["norm2"], valid=v_norm2), cfg.leaky_slope
    )
    return out


def pyannet_forward(
    params: Dict,
    waveforms: jnp.ndarray,
    cfg: PyanNetConfig = PyanNetConfig(),
    precision=L.DEFAULT_PRECISION,
    valid_samples: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, num_samples) -> (B, frames, num_classes) sigmoid activations.

    ``valid_samples``: optional (B,) true lengths. With it, a zero-padded
    short chunk scores EXACTLY like the reference's true-length inference
    (segment/segment.py:103-108) on its valid frames — masked instance-norm
    statistics + reset-at-end backward LSTM — while every shape stays
    static (one compile covers all lengths).
    """
    feat = sincnet_forward(
        waveforms, params["sincnet"], cfg, precision, valid_samples=valid_samples
    )
    valid_frames = None
    if valid_samples is not None:
        valid_frames = pyannet_valid_chain(valid_samples, cfg)[5]
    return pyannet_head_forward(params, feat, cfg, precision, valid_frames)


def pyannet_head_forward(
    params: Dict,
    feat: jnp.ndarray,
    cfg: PyanNetConfig = PyanNetConfig(),
    precision=L.DEFAULT_PRECISION,
    valid_frames: jnp.ndarray | None = None,
    unroll: int = 1,
) -> jnp.ndarray:
    """SincNet features (B, channels, frames) -> (B, frames, classes).

    Split out of pyannet_forward so the pipeline can run the conv frontend
    in working-memory-bounded batches (lax.map) but the LSTM head ONCE over
    every chunk: the head activations are tiny ((chunks, 293, 60)), and the
    sequential scan length — the stage-1 latency driver — then stays at
    layers x 293 steps instead of multiplying by the number of batches
    (pipelines/diarization.py stage1; measured stage-1 device-time figures
    in docs/PERF.md).
    """
    out = jnp.swapaxes(feat, 1, 2)  # (B, frames, channels)
    out = L.bilstm_stack(
        out, params["lstm"], precision, valid=valid_frames, unroll=unroll
    )
    for lin in params["linear"]:
        out = jax.nn.leaky_relu(L.linear(out, lin, precision), cfg.leaky_slope)
    out = L.linear(out, params["classifier"], precision)
    return jax.nn.sigmoid(out)
