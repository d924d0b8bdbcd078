"""Pallas TPU kernel for the masked left-pack (speech-sample packing).

The embedding stage left-packs each (chunk, speaker) row's speech samples
(reference ``padSequence``, pipeline/src/speakerDiarizer.cpp:769-799, after
nearest-neighbor mask upsampling :745-768). The XLA formulations all pay
~13 ms/batch on TPU because they do 80000-wide per-element index math
(cumsum + scatter or gather); measured on v5e, a standalone 80k cumsum alone
costs hundreds of ms.

The masks are FRAME-level (293 frames over 80000 samples), so the pack is
piecewise-contiguous: kept frame ``f`` moves one contiguous run of 273/274
samples. This kernel exploits that: all index math happens on 293-wide
tables (trivial), and the data movement is 293 dynamic-start block copies
per row inside VMEM — no 80k-wide cumsum, no scatter.

Exactness: bit-identical to ``masks.left_pack`` after
``masks.interpolate_nearest`` for 0/1 frame masks (tested), which is what
the pipeline always passes (binarized masks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _frame_tables(num_frames: int, num_samples: int):
    """Static nearest-neighbor run tables: sample j maps to frame
    floor(j * num_frames / num_samples) (masks.interpolate_nearest)."""
    src = (np.arange(num_samples) * num_frames) // num_samples
    run_len = np.bincount(src, minlength=num_frames).astype(np.int32)
    orig_start = np.concatenate([[0], np.cumsum(run_len)[:-1]]).astype(np.int32)
    return run_len, orig_start


def _pack_kernel(
    plen_ref,  # (1, 1, F) int32 SMEM: kept-run lengths (0 for dropped frames)
    pstart_ref,  # (1, 1, F) int32 SMEM: packed start of each frame's run
    ostart_ref,  # (1, 1, F) int32 SMEM: original start of each frame's run
    wav_ref,  # (1, 1, n_pad) f32 VMEM
    out_ref,  # (1, 1, n_pad) f32 VMEM
    *,
    num_frames: int,
    win: int,
):
    """Unaligned block copies via the aligned-window + dynamic-rotate trick:
    Mosaic only allows lane-dimension dynamic slices at 128-aligned offsets,
    so each run is moved by loading the 128-aligned ``win``-wide window
    containing it, rotating lanes by (dst%128 - src%128), and masked
    read-modify-writing the aligned destination window."""
    out_ref[...] = jnp.zeros_like(out_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)

    def body(f, _):
        length = plen_ref[0, 0, f]

        @pl.when(length > 0)
        def _():
            src = ostart_ref[0, 0, f]
            dst = pstart_ref[0, 0, f]
            a_src = pl.multiple_of((src // 128) * 128, 128)
            a_dst = pl.multiple_of((dst // 128) * 128, 128)
            off_s = src - a_src
            off_d = dst - a_dst
            data = wav_ref[0, 0:1, pl.ds(a_src, win)]
            rolled = pltpu.roll(data, (off_d - off_s) % win, axis=1)
            mask = (col >= off_d) & (col < off_d + length)
            cur = out_ref[0, 0:1, pl.ds(a_dst, win)]
            out_ref[0, 0:1, pl.ds(a_dst, win)] = jnp.where(mask, rolled, cur)

        return 0

    jax.lax.fori_loop(0, num_frames, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def pack_frames_pallas(
    waveforms: jnp.ndarray,
    keep_frames: jnp.ndarray,
    num_samples: int,
    interpret: bool = False,
):
    """(B, num_samples) waveforms + (B, F) 0/1 frame masks ->
    (packed (B, num_samples), lens (B,) int32).

    Same contract as ``masks.pack_frame_runs``; the copy loop runs as a
    Pallas kernel (one grid program per row). ``interpret=True`` runs the
    kernel in interpreter mode (for CPU tests).
    """
    batch, n = waveforms.shape
    num_frames = keep_frames.shape[-1]
    assert n == num_samples
    run_len_np, orig_start_np = _frame_tables(num_frames, num_samples)
    max_run = int(run_len_np.max())
    # window must cover any run at any intra-tile offset: 128-multiple
    # >= max_run + 127; aligned window loads reach up to win past a run's
    # start, so pad the (lane-multiple) sample axis accordingly
    win = -(-(max_run + 127) // 128) * 128
    n_pad = -(-(num_samples + win) // 128) * 128

    keep = keep_frames > 0.5
    plen = jnp.where(keep, jnp.asarray(run_len_np), 0).astype(jnp.int32)
    pcum = jnp.cumsum(plen, axis=-1)
    pstart = (pcum - plen).astype(jnp.int32)
    lens = pcum[..., -1].astype(jnp.int32)
    ostart = jnp.broadcast_to(
        jnp.asarray(orig_start_np)[None, :], (batch, num_frames)
    ).astype(jnp.int32)

    wav_padded = jnp.pad(waveforms, ((0, 0), (0, n_pad - num_samples)))
    kernel = functools.partial(_pack_kernel, num_frames=num_frames, win=win)
    # 3D (B, 1, n) layout: per-row blocks (1, 1, n) keep the last two block
    # dims equal to the array dims, satisfying the Mosaic tiling rule
    table = lambda x: x.reshape(batch, 1, num_frames)
    packed = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, 1, num_frames), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, num_frames), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, num_frames), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 1, n_pad), waveforms.dtype),
        interpret=interpret,
    )(table(plen), table(pstart), table(ostart), wav_padded.reshape(batch, 1, n_pad))
    return packed[:, 0, :num_samples], lens
