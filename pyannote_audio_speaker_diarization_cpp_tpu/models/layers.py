"""Functional NN layer primitives shared by PyanNet and ECAPA-TDNN.

Plain-pytree design: parameters are nested dicts of jnp arrays, layers are
pure functions — everything jit/vmap/pjit-composable with no framework state.
Conventions follow torch so converted checkpoints drop straight in:
conv weights are (out, in, k), linear weights are (out, in), LSTM gates are
ordered i,f,g,o.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

# f32 MXU precision: model numerics feed a chaos-sensitive clustering
# threshold (reference README.md:99-101), so default to full precision and
# let benchmarks opt into bf16 explicitly.
DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# initializers (match torch defaults so random-weight parity tests line up)
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_conv1d(key, in_channels: int, out_channels: int, kernel_size: int, bias: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_channels * kernel_size)
    p = {"weight": _uniform(k1, (out_channels, in_channels, kernel_size), bound)}
    if bias:
        p["bias"] = _uniform(k2, (out_channels,), bound)
    return p


def init_linear(key, in_features: int, out_features: int, bias: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_features)
    p = {"weight": _uniform(k1, (out_features, in_features), bound)}
    if bias:
        p["bias"] = _uniform(k2, (out_features,), bound)
    return p


def init_batchnorm(channels: int) -> Params:
    return {
        "weight": jnp.ones((channels,)),
        "bias": jnp.zeros((channels,)),
        "running_mean": jnp.zeros((channels,)),
        "running_var": jnp.ones((channels,)),
    }


def init_instancenorm(channels: int) -> Params:
    return {"weight": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}


def init_lstm(key, input_size: int, hidden_size: int) -> Params:
    keys = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_size)
    return {
        "weight_ih": _uniform(keys[0], (4 * hidden_size, input_size), bound),
        "weight_hh": _uniform(keys[1], (4 * hidden_size, hidden_size), bound),
        "bias_ih": _uniform(keys[2], (4 * hidden_size,), bound),
        "bias_hh": _uniform(keys[3], (4 * hidden_size,), bound),
    }


# ---------------------------------------------------------------------------
# forward primitives
# ---------------------------------------------------------------------------


def conv1d(
    x: jnp.ndarray,
    p: Params,
    stride: int = 1,
    dilation: int = 1,
    padding: str | int = 0,
    pad_mode: str = "zeros",
    precision=DEFAULT_PRECISION,
) -> jnp.ndarray:
    """(B, C_in, T) -> (B, C_out, T') torch-convention Conv1d.

    ``padding="same"`` with ``pad_mode="reflect"`` reproduces speechbrain's
    Conv1d default (its _manage_padding reflect-pads (k-1)*d/2 per side),
    which the ECAPA blocks rely on.
    """
    w = p["weight"]
    k = w.shape[-1]
    if padding == "same":
        pad = (k - 1) * dilation // 2
        if pad_mode == "reflect":
            x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
            pads = [(0, 0)]
        else:
            pads = [(pad, pad)]
    else:
        pads = [(int(padding), int(padding))]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pads,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None]
    return out


def linear(x: jnp.ndarray, p: Params, precision=DEFAULT_PRECISION) -> jnp.ndarray:
    out = jnp.einsum("...i,oi->...o", x, p["weight"], precision=precision)
    if "bias" in p:
        out = out + p["bias"]
    return out


def conv1d_nhc(
    x: jnp.ndarray,
    p: Params,
    stride: int = 1,
    dilation: int = 1,
    padding: str | int = 0,
    pad_mode: str = "zeros",
    precision=DEFAULT_PRECISION,
) -> jnp.ndarray:
    """(B, T, C_in) -> (B, T', C_out): conv1d in channels-LAST layout.

    Same math and torch-OIH parameter layout as conv1d — the weight is
    transposed to HIO in-graph (a few MB once per dispatch; XLA hoists it
    out of any scan). Exists for the whole-trunk time-major ECAPA variant
    (models/ecapa.py layout="nhc"), where the activations carry T on the
    second axis end-to-end so the ASP time reduction never fights a
    channel-minor physical layout.
    """
    w = jnp.transpose(p["weight"], (2, 1, 0))  # (k, C_in, C_out)
    k = w.shape[0]
    if padding == "same":
        pad = (k - 1) * dilation // 2
        if pad_mode == "reflect":
            x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
            pads = [(0, 0)]
        else:
            pads = [(pad, pad)]
    else:
        pads = [(int(padding), int(padding))]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pads,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
    )
    if "bias" in p:
        out = out + p["bias"]
    return out


def batchnorm1d_nlc(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm1d over channels-LAST (B, C) or (B, T, C)."""
    return (x - p["running_mean"]) * jax.lax.rsqrt(
        p["running_var"] + eps
    ) * p["weight"] + p["bias"]


def conv1d_gemm(
    x: jnp.ndarray,
    p: Params,
    dilation: int = 1,
    padding: str | int = 0,
    pad_mode: str = "zeros",
    precision=DEFAULT_PRECISION,
) -> jnp.ndarray:
    """(B, T, C_in) -> (B, T, C_out) "same" conv1d as k shifted GEMMs.

    Identical math to conv1d_nhc expressed without a convolution HLO —
    each kernel tap is a (B, T, C_in) @ (C_in, C_out) dot on a shifted
    time slice, so XLA sees plain dots it can lay out/fuse like the rest
    of the trunk (stage-2 layout experiment, docs/PERF.md). Stride 1,
    "same" geometry only (what every ECAPA conv uses).
    """
    w = p["weight"]  # (O, I, k)
    k = w.shape[-1]
    if k > 1 and (padding != "same" or k % 2 == 0):
        raise ValueError(
            "conv1d_gemm supports only odd-k 'same' geometry "
            f"(got k={k}, padding={padding!r})"
        )
    pad = (k - 1) * dilation // 2
    if k > 1:
        mode = "reflect" if pad_mode == "reflect" else "constant"
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode=mode)
    else:
        xp = x
    T = x.shape[1]
    out = None
    for tap in range(k):
        piece = jax.lax.dynamic_slice_in_dim(xp, tap * dilation, T, axis=1)
        term = jnp.einsum(
            "btc,co->bto", piece, w[:, :, tap].T, precision=precision
        )
        out = term if out is None else out + term
    if "bias" in p:
        out = out + p["bias"]
    return out


def batchnorm1d(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm1d over (B, C) or (B, C, T)."""
    shape = (1, -1) if x.ndim == 2 else (1, -1, 1)
    mean = p["running_mean"].reshape(shape)
    var = p["running_var"].reshape(shape)
    w = p["weight"].reshape(shape)
    b = p["bias"].reshape(shape)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def instancenorm1d(
    x: jnp.ndarray,
    p: Params | None,
    eps: float = 1e-5,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, C, T) instance norm over T, optionally affine (torch affine=True).

    ``valid``: optional (B,) count of real timesteps per row — statistics are
    computed over the valid prefix only, matching what torch InstanceNorm1d
    would produce on the unpadded input. Values past ``valid`` are normalized
    with the same stats (callers mask them out downstream).
    """
    if valid is None:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
    else:
        t = jnp.arange(x.shape[-1])
        mask = (t[None, :] < valid[:, None]).astype(x.dtype)[:, None, :]
        n = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
        mean = jnp.sum(x * mask, axis=-1, keepdims=True) / n
        var = jnp.sum(jnp.square(x - mean) * mask, axis=-1, keepdims=True) / n
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        out = out * p["weight"][None, :, None] + p["bias"][None, :, None]
    return out


def max_pool1d(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """(B, C, T) -> (B, C, T') torch MaxPool1d (floor mode, no padding)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, kernel),
        window_strides=(1, 1, stride),
        padding="VALID",
    )


def lstm_cell_scan(
    x: jnp.ndarray,
    p: Params,
    reverse: bool = False,
    precision=DEFAULT_PRECISION,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, T, I) -> (B, T, H) single-direction LSTM, torch gate order i,f,g,o.

    The time axis serializes through lax.scan; batch (the chunk axis) is the
    parallel dimension — exactly the trade the 293-frame PyanNet windows want
    (SURVEY.md section 7 "LSTM in PyanNet").

    ``valid``: optional (B,) count of real timesteps per row. A reverse scan
    holds its carry at zero while t >= valid, so it enters the real sequence
    at t = valid-1 with a fresh state — identical to running the row at its
    true length (the forward direction needs no masking: padding never
    precedes real frames). Static shapes throughout.
    """
    hidden = p["weight_hh"].shape[1]
    # precompute input contributions for all timesteps in one GEMM
    xw = jnp.einsum("bti,gi->btg", x, p["weight_ih"], precision=precision)
    xw = xw + p["bias_ih"] + p["bias_hh"]
    mask_t = None
    if valid is not None and reverse:
        t = jnp.arange(x.shape[1])
        mask_t = jnp.swapaxes(
            (t[None, :] < valid[:, None]).astype(x.dtype), 0, 1
        )  # (T, B)

    def step(carry, xs_t):
        if mask_t is None:
            xt = xs_t
        else:
            xt, m = xs_t
        h, c = carry
        gates = xt + jnp.einsum("bh,gh->bg", h, p["weight_hh"], precision=precision)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        if mask_t is not None:
            h = h * m[:, None]
            c = c * m[:, None]
        return (h, c), h

    batch = x.shape[0]
    init = (
        jnp.zeros((batch, hidden), x.dtype),
        jnp.zeros((batch, hidden), x.dtype),
    )
    xs = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H)
    if mask_t is not None:
        _, hs = jax.lax.scan(step, init, (xs, mask_t), reverse=reverse)
    else:
        _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def bilstm_layer_fused(
    x: jnp.ndarray,
    p_fwd: Params,
    p_bwd: Params,
    precision=DEFAULT_PRECISION,
    valid: jnp.ndarray | None = None,
    unroll: int = 1,
) -> jnp.ndarray:
    """(B, T, I) -> (B, T, 2H): both directions of one BiLSTM layer in a
    SINGLE lax.scan — the backward direction runs as a forward scan over the
    time-flipped sequence, stacked with the forward direction on a leading
    axis so each step issues one batched recurrent GEMM instead of two
    scans' worth of sequential steps. Same math as two lstm_cell_scan calls
    (the recurrent einsum is batched, not fused across directions), half the
    sequential step count — the scan latency, not the GEMM FLOPs, dominates
    the 293-frame PyanNet windows.

    ``valid`` masking matches lstm_cell_scan(reverse=True): the flipped
    backward sequence carries its padding FIRST, so the carry is held at
    zero until t >= T - valid and the scan enters the real frames with a
    fresh state — identical to true-length inference. The forward direction
    needs no masking (padding never precedes real frames).
    """
    B, T, _ = x.shape
    hidden = p_fwd["weight_hh"].shape[1]
    xw_f = jnp.einsum("bti,gi->btg", x, p_fwd["weight_ih"], precision=precision)
    xw_f = xw_f + p_fwd["bias_ih"] + p_fwd["bias_hh"]
    x_rev = jnp.flip(x, axis=1)
    xw_b = jnp.einsum("bti,gi->btg", x_rev, p_bwd["weight_ih"], precision=precision)
    xw_b = xw_b + p_bwd["bias_ih"] + p_bwd["bias_hh"]
    xs = jnp.stack([xw_f, xw_b], axis=0)  # (2, B, T, 4H)
    xs = jnp.moveaxis(xs, 2, 0)  # (T, 2, B, 4H)
    w_hh = jnp.stack([p_fwd["weight_hh"], p_bwd["weight_hh"]], axis=0)  # (2, 4H, H)

    mask_t = None
    if valid is not None:
        t = jnp.arange(T)
        m_bwd = jnp.swapaxes(
            (t[None, :] >= (T - valid)[:, None]).astype(x.dtype), 0, 1
        )  # (T, B): flipped-time validity for the backward direction
        mask_t = m_bwd

    def step(carry, xs_t):
        if mask_t is None:
            xt = xs_t
        else:
            xt, m = xs_t
        h, c = carry
        gates = xt + jnp.einsum("dbh,dgh->dbg", h, w_hh, precision=precision)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        if mask_t is not None:
            # only the backward slice (index 1) needs masking: its flipped
            # sequence carries padding first; the forward direction never
            # sees padding before real frames (ADVICE r2: the all-ones
            # forward mask was dead work on the sequential critical path)
            h = h.at[1].multiply(m[..., None])
            c = c.at[1].multiply(m[..., None])
        return (h, c), h

    init = (
        jnp.zeros((2, B, hidden), x.dtype),
        jnp.zeros((2, B, hidden), x.dtype),
    )
    # ``unroll``: lax.scan body replication — measured 15% off the
    # sequential step cost at batch 32 (bit-exact; docs/PERF.md stage-1
    # experiments), while larger factors and batch-128 regress
    if mask_t is not None:
        _, hs = jax.lax.scan(step, init, (xs, mask_t), unroll=unroll)
    else:
        _, hs = jax.lax.scan(step, init, xs, unroll=unroll)
    fwd = jnp.swapaxes(hs[:, 0], 0, 1)  # (B, T, H)
    bwd = jnp.flip(jnp.swapaxes(hs[:, 1], 0, 1), axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1)


def bilstm_stack(
    x: jnp.ndarray,
    layers: list,
    precision=DEFAULT_PRECISION,
    valid: jnp.ndarray | None = None,
    fused: bool = True,
    unroll: int = 1,
) -> jnp.ndarray:
    """Multi-layer bidirectional LSTM; layers = [{"fwd": P, "bwd": P}, ...].

    With ``valid`` lengths, reverse scans reset at each row's true end
    (see lstm_cell_scan) and padded-region outputs are zeroed so deeper
    layers see exactly what true-length inference would feed them.

    ``fused=True`` (default) runs both directions of each layer in one
    lax.scan (bilstm_layer_fused) — same math, half the sequential steps;
    ``fused=False`` keeps the two-scan reference formulation (the tests
    assert both paths agree).
    """
    out = x
    frame_mask = None
    if valid is not None:
        t = jnp.arange(x.shape[1])
        frame_mask = (t[None, :] < valid[:, None]).astype(x.dtype)[..., None]
    for layer in layers:
        if fused:
            out = bilstm_layer_fused(
                out,
                layer["fwd"],
                layer["bwd"],
                precision=precision,
                valid=valid,
                unroll=unroll,
            )
        else:
            fwd = lstm_cell_scan(
                out, layer["fwd"], reverse=False, precision=precision, valid=valid
            )
            bwd = lstm_cell_scan(
                out, layer["bwd"], reverse=True, precision=precision, valid=valid
            )
            out = jnp.concatenate([fwd, bwd], axis=-1)
        if frame_mask is not None:
            out = out * frame_mask
    return out


def length_mask(lengths_rel: jnp.ndarray, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) relative lengths -> (B, max_len) mask, speechbrain length_to_mask
    semantics: frame t is valid iff t < rel_len * max_len (no rounding)."""
    bounds = lengths_rel * max_len
    idx = jnp.arange(max_len)[None, :]
    return (idx < bounds[:, None]).astype(dtype)
