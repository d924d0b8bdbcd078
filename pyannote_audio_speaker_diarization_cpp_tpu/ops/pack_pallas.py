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
    nseg_ref,  # (1, 1, 1) int32 SMEM: number of kept segments in this row
    src_ref,  # (1, 1, max_seg) int32 SMEM: original start sample per segment
    dst_ref,  # (1, 1, max_seg) int32 SMEM: packed start sample per segment
    end_ref,  # (1, 1, max_seg) int32 SMEM: packed END sample per segment
    wav_ref,  # (1, 1, n_pad) f32 VMEM
    out_ref,  # (1, 1, n_pad) f32 VMEM
    *,
    blk: int,
    win: int,
):
    """Unaligned block copies via the aligned-window + dynamic-rotate trick:
    Mosaic only allows lane-dimension dynamic slices at 128-aligned offsets,
    so data moves by loading the 128-aligned ``win``-wide window containing
    a block, rotating lanes by (dst%128 - src%128), and masked
    read-modify-writing the aligned destination window.

    The loop runs over maximal SEGMENTS of consecutive kept frames (typical
    speech masks have a handful), each copied in ``blk``-sample blocks — a
    full-keep 80000-sample row is ~20 sequential steps instead of the 293
    per-frame steps of the round-2 kernel (the kernel was issue-bound, not
    bandwidth-bound: 9.4 ms/batch measured vs a ~0.8 ms roofline)."""
    out_ref[...] = jnp.zeros_like(out_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)

    def seg_body(s, _):
        src = src_ref[0, 0, s]
        dst = dst_ref[0, 0, s]
        length = end_ref[0, 0, s] - dst

        def blk_body(j, _):
            sj = src + j * blk
            dj = dst + j * blk
            cur_len = jnp.minimum(length - j * blk, blk)
            a_src = pl.multiple_of((sj // 128) * 128, 128)
            a_dst = pl.multiple_of((dj // 128) * 128, 128)
            off_s = sj - a_src
            off_d = dj - a_dst
            data = wav_ref[0, 0:1, pl.ds(a_src, win)]
            rolled = pltpu.roll(data, (off_d - off_s) % win, axis=1)
            mask = (col >= off_d) & (col < off_d + cur_len)
            cur = out_ref[0, 0:1, pl.ds(a_dst, win)]
            out_ref[0, 0:1, pl.ds(a_dst, win)] = jnp.where(mask, rolled, cur)
            return 0

        jax.lax.fori_loop(0, (length + blk - 1) // blk, blk_body, 0)
        return 0

    jax.lax.fori_loop(0, nseg_ref[0, 0, 0], seg_body, 0)


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
    blk = 4096
    # window must cover a blk-wide block at any intra-tile offset; aligned
    # window loads reach up to win past a block's start, so pad the
    # (lane-multiple) sample axis accordingly
    win = blk + 128
    n_pad = -(-(num_samples + win) // 128) * 128

    keep = keep_frames > 0.5
    plen = jnp.where(keep, jnp.asarray(run_len_np), 0).astype(jnp.int32)
    pcum = jnp.cumsum(plen, axis=-1).astype(jnp.int32)
    pstart = pcum - plen
    lens = pcum[..., -1]

    # maximal segments of consecutive kept frames: each moves as ONE
    # contiguous run (adjacent kept frames are adjacent in both the source
    # and the packed output), so the kernel loops over segments, not frames
    max_seg = (num_frames + 1) // 2 + 1
    first = jnp.ones((batch, 1), bool)
    is_start = keep & jnp.concatenate([first, ~keep[:, :-1]], axis=1)
    is_end = keep & jnp.concatenate([~keep[:, 1:], first], axis=1)
    seg_idx = jnp.cumsum(is_start, axis=1) - 1
    nseg = jnp.sum(is_start, axis=1).astype(jnp.int32)
    bidx = jnp.arange(batch)[:, None]
    ostart = jnp.broadcast_to(
        jnp.asarray(orig_start_np)[None, :], (batch, num_frames)
    ).astype(jnp.int32)
    drop = max_seg  # scatter target for non-boundary frames
    zeros = jnp.zeros((batch, max_seg + 1), jnp.int32)
    seg_src = zeros.at[bidx, jnp.where(is_start, seg_idx, drop)].set(
        ostart, mode="drop"
    )[:, :max_seg]
    seg_dst = zeros.at[bidx, jnp.where(is_start, seg_idx, drop)].set(
        pstart, mode="drop"
    )[:, :max_seg]
    seg_end = zeros.at[bidx, jnp.where(is_end, seg_idx, drop)].set(
        pcum, mode="drop"
    )[:, :max_seg]

    wav_padded = jnp.pad(waveforms, ((0, 0), (0, n_pad - num_samples)))
    kernel = functools.partial(_pack_kernel, blk=blk, win=win)
    # 3D (B, 1, n) layout: per-row blocks (1, 1, n) keep the last two block
    # dims equal to the array dims, satisfying the Mosaic tiling rule
    table = lambda x: x.reshape(batch, 1, -1)
    smem = lambda width: pl.BlockSpec(
        (1, 1, width), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
    )
    packed = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            smem(1),
            smem(max_seg),
            smem(max_seg),
            smem(max_seg),
            pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 1, n_pad), waveforms.dtype),
        interpret=interpret,
    )(
        table(nseg),
        table(seg_src),
        table(seg_dst),
        table(seg_end),
        wav_padded.reshape(batch, 1, n_pad),
    )
    return packed[:, 0, :num_samples], lens
