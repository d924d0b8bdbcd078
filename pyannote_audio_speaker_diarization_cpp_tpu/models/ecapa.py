"""ECAPA-TDNN speaker-embedding model (speechbrain topology), functional JAX.

This is the TPU-native re-design of the model behind the reference's
``emd4.onnx`` (exported from speechbrain/spkrec-ecapa-voxceleb by reference
embeddings/export3.py:560-627; standalone architecture description at
embeddings/ECAPA-TDNN.py:7-142). Defaults mirror the speechbrain VoxCeleb
recipe: channels 1024, res2net scale 8, SE 128, attentive-stats pooling with
global context, 192-d embedding. The ``lengths`` argument reproduces
speechbrain's masking everywhere it is used (SE mean, ASP statistics and
attention softmax) so masked variable-length pooling works with fully static
shapes — no ragged tensors, no host round-trips.

All convolutions are stride-1 "same" with reflect padding (speechbrain
Conv1d default); BatchNorm runs in inference mode off running statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from . import layers as L


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    in_channels: int = 80
    channels: Sequence[int] = (1024, 1024, 1024, 1024, 3072)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    emb_dim: int = 192
    eps: float = 1e-12  # ASP statistics clamp


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_tdnn_block(key, in_c, out_c, k):
    k1, _ = jax.random.split(key)
    return {"conv": L.init_conv1d(k1, in_c, out_c, k), "bn": L.init_batchnorm(out_c)}


def _init_res2net(key, channels, kernel, scale):
    width = channels // scale
    blocks = []
    keys = jax.random.split(key, scale - 1)
    for i in range(scale - 1):
        blocks.append(_init_tdnn_block(keys[i], width, width, kernel))
    return {"blocks": blocks}


def _init_se(key, channels, se_channels):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": L.init_conv1d(k1, channels, se_channels, 1),
        "conv2": L.init_conv1d(k2, se_channels, channels, 1),
    }


def _init_se_res2net(key, cfg: EcapaConfig, idx: int):
    c = cfg.channels[idx]
    keys = jax.random.split(key, 4)
    return {
        "tdnn1": _init_tdnn_block(keys[0], cfg.channels[idx - 1], c, 1),
        "res2net": _init_res2net(keys[1], c, cfg.kernel_sizes[idx], cfg.res2net_scale),
        "tdnn2": _init_tdnn_block(keys[2], c, c, 1),
        "se": _init_se(keys[3], c, cfg.se_channels),
    }


def init_ecapa(key, cfg: EcapaConfig = EcapaConfig()) -> Dict:
    keys = jax.random.split(key, 8)
    cat_channels = sum(cfg.channels[1:4])
    params = {
        "block0": _init_tdnn_block(keys[0], cfg.in_channels, cfg.channels[0], cfg.kernel_sizes[0]),
        "block1": _init_se_res2net(keys[1], cfg, 1),
        "block2": _init_se_res2net(keys[2], cfg, 2),
        "block3": _init_se_res2net(keys[3], cfg, 3),
        "mfa": _init_tdnn_block(keys[4], cat_channels, cfg.channels[-1], cfg.kernel_sizes[-1]),
        "asp": {
            "tdnn": _init_tdnn_block(
                keys[5],
                cfg.channels[-1] * 3 if cfg.global_context else cfg.channels[-1],
                cfg.attention_channels,
                1,
            ),
            "conv": L.init_conv1d(keys[6], cfg.attention_channels, cfg.channels[-1], 1),
        },
        "asp_bn": L.init_batchnorm(cfg.channels[-1] * 2),
        "fc": L.init_conv1d(keys[7], cfg.channels[-1] * 2, cfg.emb_dim, 1),
    }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _tdnn_block(x, p, dilation=1, precision=L.DEFAULT_PRECISION):
    """Conv -> ReLU -> BatchNorm (speechbrain TDNNBlock order)."""
    out = L.conv1d(x, p["conv"], dilation=dilation, padding="same", pad_mode="reflect",
                   precision=precision)
    return L.batchnorm1d(jax.nn.relu(out), p["bn"])


def _res2net_block(x, p, kernel, dilation, scale, precision):
    """speechbrain Res2NetBlock ordering: split 0 passes through unchanged,
    block j-1 processes split j (accumulating the previous block's OUTPUT
    from split 2 on): y0 = x0; y1 = b0(x1); yi = b_{i-1}(x_i + y_{i-1})."""
    parts = jnp.split(x, scale, axis=1)
    outs = [parts[0]]
    y = None
    for i in range(1, scale):
        xi = parts[i] if i == 1 else parts[i] + y
        y = _tdnn_block(xi, p["blocks"][i - 1], dilation=dilation, precision=precision)
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


def _se_block(x, p, lengths, precision):
    """Squeeze-excitation with masked temporal mean (speechbrain SEBlock)."""
    T = x.shape[-1]
    if lengths is None:
        s = jnp.mean(x, axis=-1, keepdims=True)
    else:
        mask = L.length_mask(lengths, T, x.dtype)[:, None, :]
        total = jnp.sum(mask, axis=-1, keepdims=True)
        s = jnp.sum(x * mask, axis=-1, keepdims=True) / total
    s = jax.nn.relu(L.conv1d(s, p["conv1"], precision=precision))
    s = jax.nn.sigmoid(L.conv1d(s, p["conv2"], precision=precision))
    return x * s


def _se_res2net_block(x, p, cfg, idx, lengths, precision):
    residual = x
    out = _tdnn_block(x, p["tdnn1"], precision=precision)
    out = _res2net_block(out, p["res2net"], cfg.kernel_sizes[idx], cfg.dilations[idx],
                         cfg.res2net_scale, precision)
    out = _tdnn_block(out, p["tdnn2"], precision=precision)
    out = _se_block(out, p["se"], lengths, precision)
    return out + residual


def _masked_stats(x, m, eps):
    """Weighted mean/std over time: m already sums to 1 along time.

    Single-pass formulation (E[x^2] - E[x]^2, clamped) — one read of the
    (B, C, T) activations instead of two. The naive two-pass
    sum(m*(x-mean)^2) costs a second full HBM sweep of x per pooling site;
    on TPU these stats are bandwidth-bound, not flop-bound."""
    mean = jnp.sum(m * x, axis=2)
    sq = jnp.sum(m * jnp.square(x), axis=2)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    std = jnp.sqrt(jnp.maximum(var, eps))
    return mean, std


def _attentive_stats_pool(x, p, cfg, lengths, precision, asp_backend="auto"):
    """(B, C, T) -> (B, 2C) attentive statistics pooling with global context
    and length masking (speechbrain AttentiveStatisticsPooling).

    The speechbrain formulation concatenates [x, mean, std] along channels
    and runs a 1x1 conv — materializing a (B, 3C, T) tensor (98 MB at the
    VoxCeleb widths). Because the conv is 1x1 and mean/std are
    time-constant, the identical result is W_x @ x plus a per-sequence bias
    (W_m @ mean + W_s @ std): the concat never exists, 2/3 of the HBM
    traffic of the attention branch disappears. Measured on the profiler
    trace as the stage-2 hot spot (multiply_reduce/broadcast fusions)."""
    B, C, T = x.shape
    if lengths is None:
        lengths = jnp.ones((B,), x.dtype)
    mask = L.length_mask(lengths, T, x.dtype)[:, None, :]
    if cfg.global_context:
        total = jnp.sum(mask, axis=2, keepdims=True)
        mean, std = _masked_stats(x, mask / total, cfg.eps)
        w = p["tdnn"]["conv"]["weight"]  # (A, 3C, 1)
        wx = {"weight": w[:, :C], "bias": p["tdnn"]["conv"]["bias"]}
        pre = L.conv1d(x, wx, precision=precision)
        const = jnp.dot(mean, w[:, C : 2 * C, 0].T, precision=precision)
        const = const + jnp.dot(std, w[:, 2 * C :, 0].T, precision=precision)
        attn = L.batchnorm1d(
            jax.nn.relu(pre + const[..., None]), p["tdnn"]["bn"]
        )
    else:
        attn = _tdnn_block(x, p["tdnn"], precision=precision)
    # ops/asp_pallas.py fuses the expand-to-C conv + softmax + weighted
    # stats in VMEM — MEASURED IN CONTEXT it loses: XLA must materialize the
    # conv-chain activations in the kernel's layout, and stage-2 device time
    # went 54.6 -> 98.7 ms (docs/PERF.md stage-2 experiment table). "auto"
    # therefore stays on the jnp formulation; "pallas" remains an explicit
    # opt-in (bit-verified, f32-softmax numerics).
    use_pallas = asp_backend == "pallas"
    if use_pallas and x.shape[1] % 128 != 0:
        raise ValueError(
            f"asp_backend='pallas' needs the pooled channel count to be a "
            f"multiple of 128, got {x.shape[1]}"
        )
    if use_pallas:
        from ..ops.asp_pallas import asp_pool_pallas

        mean, std = asp_pool_pallas(
            x,
            jnp.tanh(attn),
            p["conv"]["weight"][:, :, 0],
            p["conv"]["bias"],
            mask[:, 0, :],
            eps=cfg.eps,
        )
        return jnp.concatenate([mean, std], axis=1)
    attn = L.conv1d(jnp.tanh(attn), p["conv"], precision=precision)
    attn = jnp.where(mask == 0, -jnp.inf, attn)
    attn = jax.nn.softmax(attn, axis=2)
    mean, std = _masked_stats(x, attn, cfg.eps)
    return jnp.concatenate([mean, std], axis=1)


# ---------------------------------------------------------------------------
# channels-LAST (NHC / time-major) trunk — VERDICT r4 item 2 experiment.
# Identical math to the NCH path on the SAME torch-layout params; the
# activations carry (B, T, C) end-to-end (features arrive time-major, so
# there is no entry transpose either) and every time reduction (SE mean,
# ASP stats/softmax) runs over the second-major axis.
# ---------------------------------------------------------------------------


def _tdnn_block_nhc(x, p, dilation=1, precision=L.DEFAULT_PRECISION,
                    conv=L.conv1d_nhc):
    out = conv(x, p["conv"], dilation=dilation, padding="same",
               pad_mode="reflect", precision=precision)
    return L.batchnorm1d_nlc(jax.nn.relu(out), p["bn"])


def _res2net_block_nhc(x, p, dilation, scale, precision, conv=L.conv1d_nhc):
    parts = jnp.split(x, scale, axis=2)
    outs = [parts[0]]
    y = None
    for i in range(1, scale):
        xi = parts[i] if i == 1 else parts[i] + y
        y = _tdnn_block_nhc(xi, p["blocks"][i - 1], dilation=dilation,
                            precision=precision, conv=conv)
        outs.append(y)
    return jnp.concatenate(outs, axis=2)


def _se_block_nhc(x, p, lengths, precision, conv=L.conv1d_nhc):
    T = x.shape[1]
    if lengths is None:
        s = jnp.mean(x, axis=1, keepdims=True)
    else:
        mask = L.length_mask(lengths, T, x.dtype)[:, :, None]
        total = jnp.sum(mask, axis=1, keepdims=True)
        s = jnp.sum(x * mask, axis=1, keepdims=True) / total
    s = jax.nn.relu(conv(s, p["conv1"], precision=precision))
    s = jax.nn.sigmoid(conv(s, p["conv2"], precision=precision))
    return x * s


def _se_res2net_block_nhc(x, p, cfg, idx, lengths, precision,
                          conv=L.conv1d_nhc):
    residual = x
    out = _tdnn_block_nhc(x, p["tdnn1"], precision=precision, conv=conv)
    out = _res2net_block_nhc(out, p["res2net"], cfg.dilations[idx],
                             cfg.res2net_scale, precision, conv=conv)
    out = _tdnn_block_nhc(out, p["tdnn2"], precision=precision, conv=conv)
    out = _se_block_nhc(out, p["se"], lengths, precision, conv=conv)
    return out + residual


def _masked_stats_nhc(x, m, eps):
    """x (B, T, C), weights m (B, T, 1|C) summing to 1 over time."""
    mean = jnp.sum(m * x, axis=1)
    sq = jnp.sum(m * jnp.square(x), axis=1)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    std = jnp.sqrt(jnp.maximum(var, eps))
    return mean, std


def _attentive_stats_pool_nhc(x, p, cfg, lengths, precision,
                              conv=L.conv1d_nhc):
    """(B, T, C) -> (B, 2C); same concat-free global-context formulation as
    the NCH path, with the time reduce over the major axis."""
    B, T, C = x.shape
    if lengths is None:
        lengths = jnp.ones((B,), x.dtype)
    mask = L.length_mask(lengths, T, x.dtype)[:, :, None]
    if cfg.global_context:
        total = jnp.sum(mask, axis=1, keepdims=True)
        mean, std = _masked_stats_nhc(x, mask / total, cfg.eps)
        w = p["tdnn"]["conv"]["weight"]  # (A, 3C, 1)
        wx = {"weight": w[:, :C], "bias": p["tdnn"]["conv"]["bias"]}
        pre = conv(x, wx, precision=precision)
        const = jnp.dot(mean, w[:, C : 2 * C, 0].T, precision=precision)
        const = const + jnp.dot(std, w[:, 2 * C :, 0].T, precision=precision)
        attn = L.batchnorm1d_nlc(
            jax.nn.relu(pre + const[:, None, :]), p["tdnn"]["bn"]
        )
    else:
        attn = _tdnn_block_nhc(x, p["tdnn"], precision=precision, conv=conv)
    attn = conv(jnp.tanh(attn), p["conv"], precision=precision)
    attn = jnp.where(mask == 0, -jnp.inf, attn)
    attn = jax.nn.softmax(attn, axis=1)
    mean, std = _masked_stats_nhc(x, attn, cfg.eps)
    return jnp.concatenate([mean, std], axis=1)


def ecapa_forward(
    params: Dict,
    feats: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    cfg: EcapaConfig = EcapaConfig(),
    precision=L.DEFAULT_PRECISION,
    asp_backend: str = "auto",
    layout: str = "nch",
) -> jnp.ndarray:
    """(B, T, n_mels) features, (B,) relative lengths -> (B, emb_dim).

    Mirrors speechbrain ECAPA_TDNN.forward as exported to emd4.onnx
    (reference embeddings/export3.py:560-627): transpose to channels-first,
    block chain with skip-cat of blocks 1-3, MFA, ASP, BN, fc.

    layout="nhc" runs the whole trunk channels-last/time-major on the same
    parameters (no entry transpose, time reductions over the major axis) —
    bit-compatible up to f32 reassociation, tested. Measured device time
    for both layouts is in docs/PERF.md's stage-2 experiment table.
    """
    if layout in ("nhc", "gemm"):
        conv = L.conv1d_gemm if layout == "gemm" else L.conv1d_nhc
        x0 = _tdnn_block_nhc(feats, params["block0"], dilation=cfg.dilations[0],
                             precision=precision, conv=conv)
        x1 = _se_res2net_block_nhc(x0, params["block1"], cfg, 1, lengths,
                                   precision, conv=conv)
        x2 = _se_res2net_block_nhc(x1, params["block2"], cfg, 2, lengths,
                                   precision, conv=conv)
        x3 = _se_res2net_block_nhc(x2, params["block3"], cfg, 3, lengths,
                                   precision, conv=conv)
        x = jnp.concatenate([x1, x2, x3], axis=2)
        x = _tdnn_block_nhc(x, params["mfa"], dilation=cfg.dilations[-1],
                            precision=precision, conv=conv)
        pooled = _attentive_stats_pool_nhc(
            x, params["asp"], cfg, lengths, precision, conv=conv
        )
        pooled = L.batchnorm1d_nlc(pooled, params["asp_bn"])
        emb = conv(pooled[:, None, :], params["fc"], precision=precision)
        return emb[:, 0, :]
    x = jnp.swapaxes(feats, 1, 2)  # (B, n_mels, T)
    x0 = _tdnn_block(x, params["block0"], dilation=cfg.dilations[0], precision=precision)
    x1 = _se_res2net_block(x0, params["block1"], cfg, 1, lengths, precision)
    x2 = _se_res2net_block(x1, params["block2"], cfg, 2, lengths, precision)
    x3 = _se_res2net_block(x2, params["block3"], cfg, 3, lengths, precision)
    x = jnp.concatenate([x1, x2, x3], axis=1)
    x = _tdnn_block(x, params["mfa"], dilation=cfg.dilations[-1], precision=precision)
    pooled = _attentive_stats_pool(
        x, params["asp"], cfg, lengths, precision, asp_backend=asp_backend
    )
    pooled = L.batchnorm1d(pooled, params["asp_bn"])
    emb = L.conv1d(pooled[..., None], params["fc"], precision=precision)
    return emb[..., 0]
