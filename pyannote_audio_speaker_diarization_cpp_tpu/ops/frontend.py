"""STFT -> power spectrum -> mel filterbank -> log-dB -> per-sentence mean
normalization, as a single fused chain of MXU matmuls.

This replaces the reference's embedding front-end — its published bottleneck:
libtorch ``torch::stft`` in float64 plus four host<->device tensor copies per
batch (reference pipeline/src/speakerDiarizer.cpp:1977-2040, README.md:104-110).
The exact math being reproduced is speechbrain's feature extraction as pinned
down by the reference exporters (embeddings/threeModel.py:7-76 MySTFT/FBank,
:292-396 MyNormalization; embeddings/export3.py:658-712 cross-check).

TPU design: a length-400 real DFT is a (400, 402) matrix; windowing folds into
the basis, so STFT = frame-gather + one GEMM. The mel projection is another
GEMM. Everything stays on device in float32 (the reference's float64 STFT is
gratuitous — its own verification tolerances are rtol 1e-3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrontendConfig


def hamming_window(win_length: int) -> np.ndarray:
    """Periodic hamming window, matching torch.hamming_window(N) defaults
    (periodic=True, alpha=0.54, beta=0.46)."""
    n = np.arange(win_length)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)


def dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """(win_length, 2*(n_fft//2+1)) windowed real-DFT basis.

    Column k is cos(2 pi k n / n_fft) * w[n]; columns n_fft//2+1.. are the
    matching -sin rows, i.e. an unnormalized onesided STFT with
    return_complex=False packed as [real | imag].
    """
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(win_length)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft
    w = hamming_window(win_length)[:, None]
    real = np.cos(angle) * w
    imag = -np.sin(angle) * w
    return np.concatenate([real, imag], axis=1)


def mel_filterbank(cfg: FrontendConfig) -> np.ndarray:
    """(num_freqs, n_mels) triangular mel filters, speechbrain-style.

    Triangles are symmetric in Hz with half-width equal to the spacing to the
    previous mel point (speechbrain Filterbank as invoked at
    embeddings/threeModel.py:73-75 with n_mels=80 and defaults).
    """

    def to_mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    mel_pts = np.linspace(to_mel(cfg.f_min), to_mel(cfg.f_max), cfg.n_mels + 2)
    hz = to_hz(mel_pts)
    band = (hz[1:] - hz[:-1])[:-1]  # (n_mels,)
    f_central = hz[1:-1]  # (n_mels,)
    all_freqs = np.linspace(0, cfg.sample_rate // 2, cfg.num_freqs)

    slope = (all_freqs[:, None] - f_central[None, :]) / band[None, :]
    left = slope + 1.0
    right = -slope + 1.0
    return np.maximum(0.0, np.minimum(left, right))


@functools.lru_cache(maxsize=4)
def _cached_constants(cfg: FrontendConfig):
    basis = dft_basis(cfg.n_fft, cfg.win_length).astype(np.float32)
    mel = mel_filterbank(cfg).astype(np.float32)
    return basis, mel


def num_stft_frames(num_samples: int, hop_length: int) -> int:
    """Frame count of a centered STFT: 1 + floor(L / hop)."""
    return 1 + num_samples // hop_length


def stft_power(x: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(batch, num_samples) waveforms -> (batch, frames, num_freqs) power.

    Centered, constant(zero)-padded, unnormalized, onesided — the torch.stft
    configuration at speakerDiarizer.cpp:1980-2008 — followed by
    speechbrain.spectral_magnitude(power=1) == |X|^2.

    TPU formulation: with hop h and window w = ceil(w/h)*h' the frame matrix
    never needs materializing. Reshape the signal into (frames+k-1, hop)
    blocks; frame f is the concatenation of blocks f..f+k-1, so the STFT is
    k shifted GEMMs against basis slices — no im2col gather, ~w/h x less
    HBM traffic. (The GEMM-native-NDFT idea; see PAPERS.md "MelT".)
    """
    basis, _ = _cached_constants(cfg)
    basis = jnp.asarray(basis, x.dtype)
    hop, w = cfg.hop_length, cfg.win_length
    k = -(-w // hop)  # blocks per frame
    frames = num_stft_frames(x.shape[-1], cfg.hop_length)
    pad_l = cfg.n_fft // 2
    total = (frames + k - 1) * hop
    xp = jnp.pad(x, ((0, 0), (pad_l, total - pad_l - x.shape[-1])))
    blocks = xp.reshape(x.shape[0], frames + k - 1, hop)
    # Full f32 precision on the MXU: the embedding stage is numerically
    # chaos-sensitive downstream (clustering threshold, reference
    # README.md:99-101), so the front-end must not run at bf16 default.
    spec = None
    for i in range(k):
        lo = i * hop
        hi = min(lo + hop, w)
        part = jnp.einsum(
            "bfh,hk->bfk",
            blocks[:, i : i + frames, : hi - lo],
            basis[lo:hi],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        spec = part if spec is None else spec + part
    nf = cfg.num_freqs
    re, im = spec[..., :nf], spec[..., nf:]
    return re * re + im * im


def log_mel(power: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(batch, frames, num_freqs) power -> (batch, frames, n_mels) log-mel dB.

    speechbrain Filterbank: mel projection, 10*log10, then clamp each batch
    item to its max minus top_db.
    """
    _, mel = _cached_constants(cfg)
    mel = jnp.asarray(mel, power.dtype)
    fbanks = jnp.einsum(
        "bfk,km->bfm",
        power,
        mel,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    multiplier = 10.0 if cfg.power_spectrogram == 2 else 20.0
    db_multiplier = float(np.log10(max(cfg.amin, cfg.ref_value)))
    x_db = multiplier * jnp.log10(jnp.maximum(fbanks, cfg.amin))
    x_db = x_db - multiplier * db_multiplier
    x_max = jnp.max(x_db, axis=(-2, -1), keepdims=True)
    return jnp.maximum(x_db, x_max - cfg.top_db)


def sentence_mean_norm(feats: jnp.ndarray, wav_lens: jnp.ndarray) -> jnp.ndarray:
    """Per-sentence mean subtraction over the first round(rel_len*T) frames.

    Matches MyNormalization (embeddings/threeModel.py:292-396): the mean is
    computed over the non-padded frames only (torch.round is half-to-even,
    like jnp.rint) but subtracted from every frame; std is left at 1.
    """
    seq_len = feats.shape[1]
    actual = jnp.rint(wav_lens * seq_len)
    frame_idx = jnp.arange(seq_len)[None, :, None]
    valid = (frame_idx < actual[:, None, None]).astype(feats.dtype)
    denom = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(feats * valid, axis=1, keepdims=True) / denom
    return feats - mean


def compute_features(
    x: jnp.ndarray, wav_lens: jnp.ndarray, cfg: FrontendConfig
) -> jnp.ndarray:
    """Full front-end: waveforms -> normalized log-mel features.

    (batch, num_samples), (batch,) -> (batch, frames, n_mels)
    """
    power = stft_power(x, cfg)
    feats = log_mel(power, cfg)
    return sentence_mean_norm(feats, wav_lens)
