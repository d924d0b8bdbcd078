"""Fused Pallas TPU kernel: blocked STFT -> power -> mel -> log, one pass.

The jnp frontend (ops/frontend.py) already runs the GEMM-native STFT, but it
materializes the (B, frames, 402) spectrum and the (B, frames, 201) power
matrix in HBM between ops. This kernel keeps the whole chain for one batch
row resident in VMEM: three shifted block GEMMs against the windowed DFT
basis, squaring, the mel projection, and the log — writing only the final
(frames, n_mels) log-mel tile back to HBM. ~6x less HBM traffic for the
front-end that was the reference's published bottleneck (libtorch f64 STFT,
reference README.md:104-110).

Layout notes (TPU tiling):
  - basis slices are packed (hop, 512): real bins in lanes 0:201, imag bins
    in lanes 256:457, zeros elsewhere — so re/im split happens at the
    128-aligned lane 256, and junk lanes square to zero.
  - the mel matrix is (256, n_mels) with rows 201:256 zero.
  - frames are padded to a multiple of 8 sublanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FrontendConfig
from . import frontend as fe

_LANE_HALF = 256  # imag bins start here (first 128-multiple >= 201)


@functools.lru_cache(maxsize=4)
def _packed_constants(cfg: FrontendConfig):
    basis = fe.dft_basis(cfg.n_fft, cfg.win_length)  # (w, 2*nf)
    mel = fe.mel_filterbank(cfg)  # (nf, n_mels)
    hop, w, nf = cfg.hop_length, cfg.win_length, cfg.num_freqs
    k = -(-w // hop)
    packed = []
    for i in range(k):
        lo, hi = i * hop, min((i + 1) * hop, w)
        b = np.zeros((hop, 2 * _LANE_HALF), np.float32)
        b[: hi - lo, :nf] = basis[lo:hi, :nf]
        b[: hi - lo, _LANE_HALF : _LANE_HALF + nf] = basis[lo:hi, nf:]
        packed.append(b)
    melp = np.zeros((_LANE_HALF, cfg.n_mels), np.float32)
    melp[:nf] = mel
    return packed, melp, k


def _kernel(x_ref, b1_ref, b2_ref, b3_ref, mel_ref, out_ref, *, frames, amin, mult, db_off):
    xb = x_ref[0]  # (blocks_padded, hop)
    hi = jax.lax.Precision.HIGHEST  # full f32 on the MXU (not bf16 passes)
    spec = jnp.dot(xb[0:frames], b1_ref[:], preferred_element_type=jnp.float32, precision=hi)
    spec += jnp.dot(xb[1 : frames + 1], b2_ref[:], preferred_element_type=jnp.float32, precision=hi)
    spec += jnp.dot(xb[2 : frames + 2], b3_ref[:], preferred_element_type=jnp.float32, precision=hi)
    re = spec[:, :_LANE_HALF]
    im = spec[:, _LANE_HALF:]
    power = re * re + im * im
    fb = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[0] = mult * jnp.log10(jnp.maximum(fb, amin)) - db_off


def log_mel_spectrogram(
    x: jnp.ndarray, cfg: FrontendConfig, interpret: bool = False
) -> jnp.ndarray:
    """(batch, num_samples) -> (batch, frames, n_mels) log-mel in dB
    (before the per-batch top_db clamp; see compute_features_pallas)."""
    assert cfg.win_length == cfg.n_fft, "centered same-size window expected"
    packed, melp, k = _packed_constants(cfg)
    assert k == 3, "kernel is specialized for ceil(win/hop) == 3"
    hop = cfg.hop_length
    batch = x.shape[0]
    frames = fe.num_stft_frames(x.shape[-1], hop)
    pad_l = cfg.n_fft // 2
    # pad frame count to 8 sublanes; blocks = frames_padded + k - 1
    frames_p = ((frames + 7) // 8) * 8
    blocks = frames_p + k - 1
    total = blocks * hop
    xp = jnp.pad(x, ((0, 0), (pad_l, total - pad_l - x.shape[-1])))
    xb = xp.reshape(batch, blocks, hop)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            frames=frames_p,
            amin=float(cfg.amin),
            mult=10.0 if cfg.power_spectrogram == 2 else 20.0,
            # '- multiplier * db_multiplier' epilogue term, matching
            # ops.frontend.log_mel for any ref_value
            db_off=float(
                (10.0 if cfg.power_spectrogram == 2 else 20.0)
                * np.log10(max(cfg.amin, cfg.ref_value))
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, frames_p, cfg.n_mels), jnp.float32),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, blocks, hop), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, 2 * _LANE_HALF), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, 2 * _LANE_HALF), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, 2 * _LANE_HALF), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANE_HALF, cfg.n_mels), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frames_p, cfg.n_mels), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xb, *[jnp.asarray(p) for p in packed], jnp.asarray(melp))
    return out[:, :frames, :]


def compute_features_pallas(
    x: jnp.ndarray,
    wav_lens: jnp.ndarray,
    cfg: FrontendConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.frontend.compute_features using the fused
    kernel; the top_db clamp and sentence mean-norm stay as (XLA-fused)
    elementwise epilogue because they need per-row global statistics."""
    x_db = log_mel_spectrogram(x, cfg, interpret=interpret)
    x_max = jnp.max(x_db, axis=(-2, -1), keepdims=True)
    feats = jnp.maximum(x_db, x_max - cfg.top_db)
    return fe.sentence_mean_norm(feats, wav_lens)
