"""The three-stage speaker-diarization pipeline, TPU-first.

Re-design of the reference orchestrator ``speakerDiarization``
(reference pipeline/src/speakerDiarizer.cpp:2937-3234; Python original
segment/segment.py:148-245). Differences are architectural, not behavioral:

  - All chunks are materialized by one gather and run through jitted
    fixed-shape batches (no scalar window-copy loops, no per-batch
    host<->device round trips — the reference crosses the device boundary
    four times per embedding batch, :2018-2036).
  - The embedding front-end (STFT/fbank/norm) runs fused on device inside
    the same jit as ECAPA (ops/frontend.py) instead of float64 libtorch.
  - Mask preparation, binarization and aggregation are device-side
    vectorized ops; only clustering and the final decode run on host
    (tiny: N x 192 embeddings, a few thousand frames).
  - Optional data-parallel sharding of the chunk axis over a device mesh
    (parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, DiarizationConfig
from ..core.annotation import Annotation
from ..core.sliding_window import SlidingWindow
from ..clustering.base import AgglomerativeClustering
from ..io import resample as rs
from ..io import wav as wavio
from ..models import ecapa as ecapa_mod
from ..models import layers as L
from ..models import pyannet as pyannet_mod
from ..ops import binarize as bz
from ..ops import frontend as fe
from ..ops import masks as mk
from ..ops import windows as win
from ..ops.aggregate import aggregate as agg_aggregate
from . import reconstruct as rec


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# NOTE on async d2h: copy_to_host_async was measured to gain nothing on the
# remote-tunnel backend (the combined device_get already pipelines) and to
# WEDGE multi-second dispatches outright at long-form shard sizes, so the
# pipeline deliberately uses one synchronous combined device_get per sync
# point instead of async prefetch.


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _count_parts(binarized, valid_frames, start_frames, num_frames, left, right):
    """Numerator/denominator of the speaker-count overlap-add for a chunk
    range: sum of trimmed per-frame speaker counts and the overlap counts,
    on the given (globally consistent) frame grid. Both are LINEAR in the
    chunks, so a sharded long-form run stitches per-shard parts by addition
    and divides once on host — bit-compatible with the single-shot
    aggregate (reference speaker_count, speakerDiarizer.cpp:1665-1738).
    Padding/invalid chunks (valid_frames == 0) contribute nothing."""
    F = binarized.shape[1]
    trimmed = binarized[:, left : F - right, :]
    summed = jnp.sum(trimmed, axis=-1, keepdims=True)
    ok = (valid_frames > 0)[:, None, None]
    vals = jnp.where(ok, summed, jnp.nan)
    num = agg_aggregate(vals, start_frames, num_frames, missing=0.0, skip_average=True)
    ones = jnp.where(ok, jnp.ones_like(summed), jnp.nan)
    den = agg_aggregate(ones, start_frames, num_frames, missing=0.0, skip_average=True)
    return num[:, 0], den[:, 0]


@functools.partial(jax.jit, static_argnums=(4, 5))
def _post_cluster_from_hard(segs, hard_all, ofs, start_frames, num_frames, k_max):
    """_post_cluster driven by a DEVICE-RESIDENT hard-label vector (the
    long-form fused stage 3, parallel/longform.py): slice this shard's
    padded block out of the global hard labels at traced offset ``ofs``,
    derive the one-hot membership on device, and aggregate — neither the
    embeddings nor the membership ever cross the host boundary."""
    n, F, S = segs.shape
    hard = jax.lax.dynamic_slice(hard_all, (ofs,), (n * S,)).reshape(n, S)
    membership = (hard[:, :, None] == jnp.arange(k_max)[None, None, :]) & (
        hard >= 0
    )[:, :, None]
    masked = jnp.where(membership[:, None, :, :], segs[..., None], -jnp.inf)
    clustered = jnp.max(masked, axis=2)
    has = jnp.any(membership, axis=1)[:, None, :]
    clustered = jnp.where(has, clustered, jnp.nan)
    return agg_aggregate(
        clustered, start_frames, num_frames, missing=0.0, skip_average=True
    )


@functools.partial(jax.jit, static_argnums=(3,))
def _post_cluster(segs, membership, start_frames, num_frames):
    """Device-side post-clustering: per-cluster max over member local
    speakers (the reference's max_segmentation_cluster,
    speakerDiarizer.cpp:2766-2787) + skip-average overlap-add
    (to_diarization's aggregate, :2647-2651) — computed from the RESIDENT
    stage-1 scores so the full (chunks, frames, speakers) tensor never
    travels to the host; only the tiny (frames, K) activations do.

    segs: (num_padded, F, S) f32; membership: (num_padded, S, K) bool
    one-hot of host hard clusters (False rows for padding chunks and
    inactive/-2 speakers); start_frames/num_frames: the aggregation plan.
    """
    masked = jnp.where(membership[:, None, :, :], segs[..., None], -jnp.inf)
    clustered = jnp.max(masked, axis=2)  # (n, F, K)
    has = jnp.any(membership, axis=1)[:, None, :]  # (n, 1, K)
    clustered = jnp.where(has, clustered, jnp.nan)
    return agg_aggregate(
        clustered, start_frames, num_frames, missing=0.0, skip_average=True
    )


def finalize_embeddings(
    emb_h: np.ndarray, too_short_h: np.ndarray, num_chunks: int, num_speakers: int
) -> np.ndarray:
    """Fetched embedding rows -> (num_chunks, S, D) float64 with NaN rows
    for too-short masks — the one host-side finalize step shared by
    run_chunks_device and the pipelined long-form collect
    (parallel/longform.py)."""
    rows = num_chunks * num_speakers
    embeddings = np.asarray(emb_h[:rows], dtype=np.float64)
    embeddings[np.asarray(too_short_h[:rows])] = np.nan
    return embeddings.reshape(num_chunks, num_speakers, -1)


def load_waveform(
    audio: Union[str, np.ndarray],
    sample_rate: Optional[int],
    target_rate: int,
) -> np.ndarray:
    """Path or array -> float32 mono waveform at ``target_rate``."""
    if isinstance(audio, str):
        data = wavio.read_wav(audio)
        waveform = data.normalized_mono()
        if data.sample_rate != target_rate:
            waveform = rs.resample(waveform, data.sample_rate, target_rate).astype(
                np.float32
            )
        return waveform
    waveform = np.asarray(audio, dtype=np.float32)
    if waveform.ndim == 2:
        waveform = rs.downmix(waveform)
    if sample_rate is not None and sample_rate != target_rate:
        waveform = rs.resample(waveform, sample_rate, target_rate)
    return waveform


# Compiled stage functions shared across pipeline instances with identical
# static configuration (model params are ARGUMENTS of the jitted steps, so
# two pipelines that differ only in weights — or in host-side concerns like
# the clusterer — reuse one compilation). Keyed by every input _build_steps
# closes over; a serving process spinning up pipelines pays compile once.
_STEP_CACHE: Dict = {}


@dataclasses.dataclass
class StageTimings:
    """Wall-clock attribution, named for what each window actually measures
    (the stage dispatches are async, so device work overlaps freely).

    Default (pipeline.profile=False — no extra device syncs):
    - segmentation: host prep + both async stage dispatches.
    - embedding: 0 (not separately measured).
    - fetch: wait for device compute AND the d2h transfer of clustering
      inputs (one combined sync).
    - clustering: host clustering + the jitted post-clustering aggregation
      dispatch (incl. its small fetch) + timeline decode.

    With pipeline.profile=True, segmentation/embedding become the true
    per-stage device completion waits (costs ~2 extra sync round trips over
    a remote-tunnel TPU) and fetch is the pure d2h pickup.
    """

    segmentation: float = 0.0
    embedding: float = 0.0
    fetch: float = 0.0
    clustering: float = 0.0

    @property
    def total(self) -> float:
        return self.segmentation + self.embedding + self.fetch + self.clustering


class SpeakerDiarizationPipeline:
    """wav -> speech turns, pyannote speaker-diarization v2.x recipe."""

    def __init__(
        self,
        config: DiarizationConfig = DEFAULT_CONFIG,
        params: Optional[Dict] = None,
        seed: int = 0,
        seg_batch: Optional[int] = None,
        emb_batch: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        # Model matmuls default to bf16-input MXU (DEFAULT): measured max
        # abs embedding deviation vs full-f32 is 0.0024 — 10x tighter than
        # the reference's own C++-vs-Python envelope (abs 0.02, reference
        # README.md:99-101) — at 3.4x the ECAPA throughput. Pass
        # jax.lax.Precision.HIGHEST for bit-conservative runs. The STFT/mel
        # front-end always runs at full f32 (ops/frontend.py).
        precision=jax.lax.Precision.DEFAULT,
        clusterer: Union[str, object] = "ahc",
        frontend_backend: str = "auto",
        exact_orphan: bool = True,
        pyannet_cfg: Optional[pyannet_mod.PyanNetConfig] = None,
        ecapa_cfg: Optional[ecapa_mod.EcapaConfig] = None,
        profile: bool = False,
        # On-device clustering (clustering/device.py): stage 3 runs FUSED on
        # the chip after stage 2, so a request needs ONE device->host fetch
        # (final activations + count) instead of two structural sync round
        # trips (embeddings out, membership back). "auto" (default) uses it
        # whenever the request is eligible — default AHC recipe (centroid/
        # cosine, unconstrained), no explicit speaker bounds, and at most
        # ``device_cluster_rows`` embedding rows (~17 min of audio at the
        # default; longer audio and every ineligible/failed case takes the
        # host path, which remains the oracle). The AHC merge loop runs on
        # the pyannote 1000-row train subsample (host-identical strided
        # selection), so its cost is bounded by the cap regardless of
        # audio length (measured 15.3 ms flat above 1024 rows, 4.4 ms at
        # 384 — docs/PERF.md); device_cluster_rows bounds only the O(rows)
        # selection/assignment buffers. A clusterer with
        # max_num_embeddings=None (cluster on everything) is limited to
        # 1536 rows on device (the uncapped merge-loop affordability
        # bound). False disables; True requires a compatible clusterer.
        device_clustering: Union[str, bool] = "auto",
        device_cluster_rows: int = 6144,
        k_max: int = 8,
        # ECAPA trunk activation layout: "nch" (channels-second, the
        # round-1..4 formulation) or "nhc" (whole-trunk channels-last /
        # time-major — VERDICT r4 item 2 experiment; same math on the same
        # params, tested bit-compatible). Measured stage-2 device time for
        # both is in docs/PERF.md's experiment table; the default is the
        # measured winner.
        ecapa_layout: str = "nch",
    ):
        self.config = config
        # model-architecture overrides (converted checkpoints with non-recipe
        # sizes, or deliberately small models for fast tests)
        self.pyannet_cfg = pyannet_cfg or pyannet_mod.PyanNetConfig(
            sample_rate=config.segmentation.sample_rate,
            num_classes=config.segmentation.num_speakers,
        )
        self.ecapa_cfg = ecapa_cfg or ecapa_mod.EcapaConfig(
            in_channels=config.frontend.n_mels
        )
        if params is None:
            key = jax.random.PRNGKey(seed)
            k1, k2 = jax.random.split(key)
            params = {
                "segmentation": pyannet_mod.init_pyannet(k1, self.pyannet_cfg),
                "embedding": ecapa_mod.init_ecapa(k2, self.ecapa_cfg),
            }
        self.params = params
        self.seg_batch = seg_batch or config.segmentation.batch_size
        self.emb_batch = emb_batch or config.embedding.batch_size
        self.mesh = mesh
        self.precision = precision
        if isinstance(clusterer, str):
            if clusterer == "ahc":
                clusterer = AgglomerativeClustering(config.clustering)
            elif clusterer == "spectral":
                from ..clustering.spectral import SpectralClustering

                clusterer = SpectralClustering()
            else:
                raise ValueError(f"unknown clusterer: {clusterer!r}")
        self.clusterer = clusterer
        # "jnp" (XLA-fused GEMM chain), "pallas" (the explicit fused kernel
        # in ops/frontend_pallas.py), or "auto". Round-2 micro-benchmarks
        # preferred pallas at B<=64, but the round-4 IN-CONTEXT profiler
        # comparison (the only trustworthy measurement on this async
        # tunnel) has jnp 1 ms/request faster inside the full stage-2
        # dispatch (53.5 vs 54.6 ms device; docs/PERF.md) — auto now stays
        # on jnp; pallas remains an explicit opt-in.
        if frontend_backend == "auto":
            frontend_backend = "jnp"
        self.frontend_backend = frontend_backend
        # exact_orphan=True (default): every chunk is scored with its TRUE
        # sample count via the masked-statistics PyanNet path (masked
        # instance norms + reset-at-end backward LSTM), so the short orphan
        # chunk matches the reference's true-length inference
        # (segment/segment.py:103-108) with zero per-length recompiles and
        # static shapes. False restores the round-1 behavior (zero-padding
        # visible to the norms; up to ~0.008 sigmoid deviation on the
        # orphan's frames).
        self.exact_orphan = exact_orphan
        if ecapa_layout not in ("nch", "nhc", "gemm"):
            raise ValueError(
                f"ecapa_layout must be 'nch', 'nhc' or 'gemm', got {ecapa_layout!r}"
            )
        self.ecapa_layout = ecapa_layout
        self.profile = profile
        self.timings = StageTimings()
        self.k_max = k_max
        self.device_cluster_rows = device_cluster_rows
        compatible = (
            isinstance(self.clusterer, AgglomerativeClustering)
            and self.clusterer.config.method == "centroid"
            and self.clusterer.config.metric == "cosine"
            and not self.clusterer.constrained_assignment
        )
        if device_clustering is True and not compatible:
            raise ValueError(
                "device_clustering=True requires the default agglomerative "
                "clusterer (centroid linkage, cosine metric, unconstrained)"
            )
        self._device_clu_enabled = bool(device_clustering) and compatible
        self._build_steps()

    # ------------------------------------------------------------------
    # jitted device steps
    # ------------------------------------------------------------------

    def _build_steps(self):
        cache_key = None
        try:
            cache_key = (
                self.config,
                self.pyannet_cfg,
                self.ecapa_cfg,
                self.seg_batch,
                self.emb_batch,
                self.precision,
                self.frontend_backend,
                self.exact_orphan,
                self.ecapa_layout,
                id(self.mesh) if self.mesh is not None else None,
                self._device_clu_key(),
            )
            cached = _STEP_CACHE.get(cache_key)
        except TypeError:  # unhashable config (e.g. list-valued channels)
            cached = None
        if cached is not None:
            (
                self._stage1,
                self._stage2,
                self._stage2_debug,
                self._post,
                self._stage3,
            ) = cached
            return
        cfg = self.config
        seg_cfg = cfg.segmentation
        precision = self.precision
        mesh = self.mesh
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            n_dev = mesh.size
            if self.seg_batch % n_dev or self.emb_batch % n_dev:
                raise ValueError(
                    f"seg_batch={self.seg_batch} and emb_batch={self.emb_batch} "
                    f"must be divisible by the mesh size ({n_dev})"
                )
            P = jax.sharding.PartitionSpec

            def shard_rows(x, ndim):
                """Constrain a (nb, batch, ...) stack so the batch axis is
                split over the data axis — each lax.map step then runs one
                global batch data-parallel across all chips."""
                spec = P(None, DATA_AXIS, *([None] * (ndim - 2)))
                return jax.lax.with_sharding_constraint(
                    x, jax.sharding.NamedSharding(mesh, spec)
                )

            def replicate(x):
                """Allgather to every device (ICI/DCN collective) — used on
                stage outputs that feed replicated post-processing/clustering."""
                return jax.lax.with_sharding_constraint(
                    x, jax.sharding.NamedSharding(mesh, P())
                )

            def shard_chunks(x):
                """Constrain a (chunks, ...) tensor so the leading chunk
                axis splits over the data axis (the full-set LSTM head)."""
                spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    x, jax.sharding.NamedSharding(mesh, spec)
                )
        else:

            def shard_rows(x, ndim):
                return x

            def replicate(x):
                return x

            def shard_chunks(x):
                return x
        min_num_frames = float(
            math.ceil(
                seg_cfg.num_frames * cfg.embedding.min_num_samples / seg_cfg.window_size
            )
        )

        def device_chunks(wav_padded, num_chunks):
            """In-graph sliding-window chunking: reshape to hop blocks, then
            k shifted slices — no 8.9M-element gather. 16-bit audio arrives
            as raw int16 (halving the host->device transfer) and is scaled
            on device — exact: int16/32768 is representable in f32."""
            if wav_padded.dtype == jnp.int16:
                wav_padded = wav_padded.astype(jnp.float32) * (1.0 / 32768.0)
            step, window = seg_cfg.step_size, seg_cfg.window_size
            k = window // step
            blocks = wav_padded.reshape(-1, step)
            parts = [blocks[i : i + num_chunks] for i in range(k)]
            return jnp.concatenate(parts, axis=1)

        # the pallas pack/ASP kernels are single-device code; under a
        # multi-chip mesh the jnp formulations let XLA partition the batch
        # axis freely
        pack_backend = "jnp" if (mesh is not None and mesh.size > 1) else "auto"
        asp_backend = pack_backend
        # config.compute_dtype="bfloat16" runs the ECAPA trunk with bf16
        # activations AND parameters (halving its HBM traffic); the STFT/mel
        # front-end and the returned embeddings stay f32. Measured deviation
        # vs full-f32: max abs 7e-4, max cosine distance 5e-6 — 28x inside
        # the reference's own C++-vs-Python envelope (README.md:99-101).
        emb_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        )

        def emb_step(params, chunks, masks, with_internals=False):
            signals, wav_lens, too_short = mk.pack_and_lengths(
                chunks,
                masks,
                cfg.embedding.mask_threshold,
                cfg.embedding.min_num_samples,
                backend=pack_backend,
            )
            if self.frontend_backend == "pallas":
                from ..ops.frontend_pallas import compute_features_pallas

                feats = compute_features_pallas(signals, wav_lens, cfg.frontend)
            else:
                feats = fe.compute_features(signals, wav_lens, cfg.frontend)
            if emb_dtype is not None:
                feats = feats.astype(emb_dtype)
            emb = ecapa_mod.ecapa_forward(
                params,
                feats,
                wav_lens,
                self.ecapa_cfg,
                precision=precision,
                asp_backend=asp_backend,
                layout=self.ecapa_layout,
            )
            if with_internals:
                return emb.astype(jnp.float32), too_short, signals, wav_lens
            return emb.astype(jnp.float32), too_short

        def post_process(segs, valid_frames):
            """Binarize -> mask choice -> speaker-count aggregation from the
            (padding-masked) scores. Shared by stage1 and the exact-orphan
            re-run (one jitted dispatch either way)."""
            binarized = bz.binarize_swf(segs, seg_cfg.onset, seg_cfg.offset)
            cleaned = mk.clean_segmentations(binarized)
            chosen = mk.choose_masks(binarized, cleaned, min_num_frames)

            # speaker count: trim warm-up, sum speakers, overlap-add average.
            # bucket-padding chunks go to NaN so the aggregation ignores them
            # (the real orphan chunk keeps its zeros, like the reference).
            left = math.floor(seg_cfg.num_frames * seg_cfg.warm_up[0])
            right = math.floor(seg_cfg.num_frames * seg_cfg.warm_up[1])
            trimmed = binarized[:, left : seg_cfg.num_frames - right, :]
            summed = jnp.sum(trimmed, axis=-1, keepdims=True)
            summed = jnp.where((valid_frames > 0)[:, None, None], summed, jnp.nan)
            plan = self._count_plan(valid_frames.shape[0])
            count_raw = agg_aggregate(
                summed,
                jnp.asarray(plan.start_frames),
                plan.num_frames,
                missing=0.0,
                skip_average=False,
            )[:, 0]
            # tiny (chunks, speakers) bool: lets __call__ skip fetching the
            # full binarized tensor (450 KB saved per minute of audio — the
            # tunnel d2h transfers dominate the wall clock)
            inactive = jnp.sum(binarized, axis=1) == 0
            return binarized, chosen, count_raw, inactive

        def stage1(params, wav_padded, valid_frames, valid_samples):
            """ONE dispatch: chunk -> PyanNet (scanned batches) -> orphan/pad
            masking -> binarize -> mask choice -> speaker-count aggregation.

            valid_frames[i] = number of model output frames backed by real
            audio in chunk i (0 for bucket-padding chunks); the reference
            zero-pads the orphan chunk's model output the same way
            (segment/segment.py:103-108). valid_samples[i] = true sample
            count of chunk i — with exact_orphan (default) the model's
            masked-statistics path scores the short orphan chunk EXACTLY
            like true-length inference, at static shapes (no per-length
            recompiles; models/pyannet.py pyannet_forward).
            """
            num_chunks = valid_frames.shape[0]
            chunks = device_chunks(wav_padded, num_chunks)
            nb = num_chunks // self.seg_batch
            # conv frontend in GROUPED batches (up to 4 x seg_batch): most
            # of the round-3 lax.map cost was per-iteration loop overhead
            # (~0.85 ms), not conv compute — fewer, larger iterations keep
            # working memory bounded for long-form shards while the common
            # <=128-chunk request runs the convs in ONE call. The LSTM head
            # then runs per seg_batch with a 2x-unrolled scan (measured
            # winner over both a full-set head and unroll=1; stage-1
            # experiment table in docs/PERF.md).
            def sinc_map(chunk_rows, vs_rows, group, count):
                """lax.map of sincnet over ``count`` groups of ``group``
                chunks; returns (count*group, C, F)."""
                gb = shard_rows(
                    chunk_rows.reshape(count, group, seg_cfg.window_size), 3
                )
                if vs_rows is not None:
                    vg = shard_rows(vs_rows.reshape(count, group), 2)
                    out = jax.lax.map(
                        lambda bv: pyannet_mod.sincnet_forward(
                            bv[0],
                            params["sincnet"],
                            self.pyannet_cfg,
                            precision,
                            valid_samples=bv[1],
                        ),
                        (gb, vg),
                    )
                else:
                    out = jax.lax.map(
                        lambda b: pyannet_mod.sincnet_forward(
                            b, params["sincnet"], self.pyannet_cfg, precision
                        ),
                        gb,
                    )
                return out.reshape(count * group, out.shape[-2], out.shape[-1])

            # main part in groups of 4 x seg_batch + a remainder part in
            # single batches, so batch counts that are not multiples of 4
            # (e.g. prime shard sizes in long-form) still get the grouping
            # win instead of falling back to per-batch iterations
            g_nb = (nb // 4) * 4
            vs_all = valid_samples if self.exact_orphan else None
            parts = []
            if g_nb:
                parts.append(
                    sinc_map(
                        chunks[: g_nb * self.seg_batch],
                        None if vs_all is None else vs_all[: g_nb * self.seg_batch],
                        4 * self.seg_batch,
                        g_nb // 4,
                    )
                )
            if nb - g_nb:
                parts.append(
                    sinc_map(
                        chunks[g_nb * self.seg_batch :],
                        None if vs_all is None else vs_all[g_nb * self.seg_batch :],
                        self.seg_batch,
                        nb - g_nb,
                    )
                )
            feats = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            if self.exact_orphan:
                valid_head = pyannet_mod.pyannet_valid_chain(
                    valid_samples, self.pyannet_cfg
                )[5].reshape(nb, self.seg_batch)
            else:
                valid_head = None
            feats = shard_rows(
                feats.reshape(
                    nb, self.seg_batch, feats.shape[-2], feats.shape[-1]
                ),
                4,
            )

            def head(args):
                f, v = args
                return pyannet_mod.pyannet_head_forward(
                    params, f, self.pyannet_cfg, precision, v, unroll=2
                )

            if valid_head is not None:
                segs = jax.lax.map(head, (feats, valid_head))
            else:
                segs = jax.lax.map(
                    lambda f: pyannet_mod.pyannet_head_forward(
                        params, f, self.pyannet_cfg, precision, None, unroll=2
                    ),
                    feats,
                )
            segs = segs.reshape(num_chunks, seg_cfg.num_frames, seg_cfg.num_speakers)
            segs = replicate(segs)
            frame_idx = jnp.arange(seg_cfg.num_frames)
            segs = jnp.where(
                (frame_idx[None, :] < valid_frames[:, None])[..., None], segs, 0.0
            )
            return (segs,) + post_process(segs, valid_frames)

        def stage2(params, wav_padded, chosen):
            """ONE dispatch: rebuild chunks, then scan embedding batches of
            (gather chunk windows + left-pack + fused frontend + ECAPA)."""
            if emb_dtype is not None:
                # cast params once per dispatch, outside the batch scan
                params = jax.tree.map(lambda a: a.astype(emb_dtype), params)
            num_chunks = chosen.shape[0]
            chunks = device_chunks(wav_padded, num_chunks)
            rows = chosen.reshape(num_chunks * seg_cfg.num_speakers, -1)
            nb = rows.shape[0] // self.emb_batch
            row_idx = shard_rows(
                jnp.arange(rows.shape[0]).reshape(nb, self.emb_batch), 2
            )

            def body(idx):
                return emb_step(params, chunks[idx // seg_cfg.num_speakers], rows[idx])

            emb, too_short = jax.lax.map(body, row_idx)
            # allgather the tiny (N, 192) embedding matrix to every device —
            # the only cross-device dependency of the whole recipe (global
            # clustering; SURVEY.md section 2.3). Embeddings travel to the
            # host as f16 (transfer_dtype): the d2h tunnel runs ~10 MB/s, and
            # f16's 4.9e-4 relative rounding sits 40x inside the reference's
            # own accepted embedding envelope (abs 0.02, README.md:99-101).
            emb = emb.reshape(-1, emb.shape[-1]).astype(
                jnp.dtype(cfg.transfer_dtype)
            )
            return replicate(emb), replicate(too_short.reshape(-1))

        def stage2_debug(params, wav_padded, chosen):
            """stage2 plus its internals (packed signals, normalized
            wav_lens) from the SAME ops/backends the production dispatch
            runs — the provenance source for the differential dumps
            (reference dumps what production computed,
            speakerDiarizer.cpp:2443; compiled only when used)."""
            if emb_dtype is not None:
                params = jax.tree.map(lambda a: a.astype(emb_dtype), params)
            num_chunks = chosen.shape[0]
            chunks = device_chunks(wav_padded, num_chunks)
            rows = chosen.reshape(num_chunks * seg_cfg.num_speakers, -1)
            nb = rows.shape[0] // self.emb_batch
            row_idx = jnp.arange(rows.shape[0]).reshape(nb, self.emb_batch)

            def body(idx):
                return emb_step(
                    params,
                    chunks[idx // seg_cfg.num_speakers],
                    rows[idx],
                    with_internals=True,
                )

            emb, too_short, signals, wav_lens = jax.lax.map(body, row_idx)
            return (
                emb.reshape(-1, emb.shape[-1]),
                too_short.reshape(-1),
                signals.reshape(-1, signals.shape[-1]),
                wav_lens.reshape(-1),
            )

        # one jitted dispatch per stage — on a mesh the shard_rows/replicate
        # constraints inside make XLA split each batch across chips and
        # allgather the stage outputs (device-major DP, no host loop)
        # stage 3 fused on device (clustering/device.py): embeddings ->
        # AHC -> centroid assignment -> per-cluster max + overlap-add, all
        # in one dispatch chained after stage 2; the host then fetches ONLY
        # the (frames, k_max) activations + scalars. Threshold/min-size come
        # from the clusterer's own config (== the recipe defaults unless the
        # caller customized them).
        clu_threshold, clu_mcs, k_max, clu_cap = self._device_clu_key() or (
            0.0,
            0,
            self.k_max,
            None,
        )

        def stage3(segs, emb, too_short, inactive, start_frames, num_frames):
            from ..clustering import device as devclu

            n, F, S = segs.shape
            res = devclu.device_cluster(
                emb.astype(jnp.float32),
                ~too_short,
                inactive.reshape(-1),
                clu_threshold,
                clu_mcs,
                k_max,
                train_cap=clu_cap,
            )
            hard = res.hard.reshape(n, S)
            membership = (hard[:, :, None] == jnp.arange(k_max)[None, None, :]) & (
                hard >= 0
            )[:, :, None]
            masked = jnp.where(membership[:, None, :, :], segs[..., None], -jnp.inf)
            clustered = jnp.max(masked, axis=2)  # (n, F, K)
            has = jnp.any(membership, axis=1)[:, None, :]
            clustered = jnp.where(has, clustered, jnp.nan)
            activations = agg_aggregate(
                clustered, start_frames, num_frames, missing=0.0, skip_average=True
            )
            return activations.astype(jnp.float16), res.hard, res.num_large

        self._stage1 = jax.jit(stage1)
        self._stage2 = jax.jit(stage2)
        self._stage2_debug = jax.jit(stage2_debug)
        self._post = jax.jit(post_process)
        self._stage3 = jax.jit(stage3, static_argnums=(5,))
        if cache_key is not None:
            _STEP_CACHE[cache_key] = (
                self._stage1,
                self._stage2,
                self._stage2_debug,
                self._post,
                self._stage3,
            )

    # largest merge-loop size the fused device stage 3 accepts: the loop is
    # O(T) iterations over a (T, T) matrix (docs/PERF.md: 15.3 ms at
    # T=1024, 65+ ms by T=1536 in the round-4 measurements), so T beyond
    # this loses to the host path's two tunnel round trips. T is the
    # 128-padded train cap (or the row count when the cap is disabled).
    _UNCAPPED_DEVICE_ROWS = 1536

    def _device_train_size(self, rows: int, cap) -> int:
        """The static merge-loop size device_cluster would use."""
        if cap is None:
            return rows
        return min(rows, -(-cap // 128) * 128)

    def _no_speaker_bounds(self, num_speakers, min_speakers, max_speakers) -> bool:
        """True when neither the call nor the config pins speaker counts
        (explicit bounds require the host dendrogram search). Shared with
        the long-form eligibility check (parallel/longform.py)."""
        cfg = self.config
        return not any(
            b is not None
            for b in (
                num_speakers,
                min_speakers,
                max_speakers,
                cfg.num_speakers,
                cfg.min_speakers,
                cfg.max_speakers,
            )
        )

    def _device_clu_key(self):
        """(threshold, min_cluster_size, k_max, train_cap) when on-device
        clustering is enabled and the clusterer is compatible, else None.
        Part of the step-cache key (stage 3 compiles ALL of these in —
        review r4: a missing k_max here let a second pipeline with a
        different k_max reuse the wrong compiled stage 3)."""
        if not getattr(self, "_device_clu_enabled", False):
            return None
        c = self.clusterer.config
        cap = self.clusterer.max_num_embeddings
        # normalize "no cap" spellings (None, inf) to None
        cap = None if cap is None or cap == float("inf") else int(cap)
        return (c.threshold, c.min_cluster_size, self.k_max, cap)

    def _device_clu_eligible(
        self, rows: int, num_speakers, min_speakers, max_speakers
    ) -> bool:
        """Static per-request eligibility for the fused device stage 3.

        Explicit speaker bounds take the host path (the known-num_clusters
        dendrogram search, clustering/base.py cluster()); row counts above
        ``device_cluster_rows`` take the host path. The device path applies
        the clusterer's own pyannote train-set cap with the host-identical
        strided selection (clustering/device.py), so within the row budget
        the two paths cluster the same train set."""
        if not self._device_clu_enabled or rows > self.device_cluster_rows:
            return False
        key = self._device_clu_key()
        cap = key[3] if key is not None else None
        if self._device_train_size(rows, cap) > self._UNCAPPED_DEVICE_ROWS:
            # merge loop too large to beat the host path (uncapped
            # clusterers must cluster every row; large finite caps size
            # the loop at the cap — review r5)
            return False
        return self._no_speaker_bounds(num_speakers, min_speakers, max_speakers)

    def chunk_lattice(self, num_chunks: int) -> int:
        """Padded chunk count: the batch lattice keeps jit shapes static,
        config.chunk_bucket coarsens it to bound the number of distinct
        compiled shapes across audio lengths."""
        bucket = math.lcm(
            self.seg_batch, self.emb_batch, max(self.config.chunk_bucket, 1)
        )
        return _ceil_to(num_chunks, bucket)

    def _diarization_plan(self, num_chunks):
        """Aggregation plan for the post-clustering overlap-add: untrimmed
        chunk grid onto the model frame grid — identical numbers to the plan
        the host twin builds inside reconstruct.to_diarization."""
        seg_cfg = self.config.segmentation
        chunk_grid = SlidingWindow(0.0, seg_cfg.step, seg_cfg.duration)
        frame_grid = SlidingWindow(
            seg_cfg.frame_start, seg_cfg.frame_step, seg_cfg.frame_duration
        )
        from ..ops.aggregate import plan_aggregation

        return plan_aggregation(num_chunks, chunk_grid, frame_grid)

    def _count_plan(self, num_chunks):
        """Aggregation plan for the speaker-count grid (trace-time host
        math; exact f64 frame arithmetic)."""
        seg_cfg = self.config.segmentation
        trimmed_frames = SlidingWindow(
            start=seg_cfg.warm_up[0] * seg_cfg.duration,
            step=seg_cfg.step,
            duration=(1 - seg_cfg.warm_up[0] - seg_cfg.warm_up[1]) * seg_cfg.duration,
        )
        frame_grid = SlidingWindow(
            seg_cfg.frame_start, seg_cfg.frame_step, seg_cfg.frame_duration
        )
        from ..ops.aggregate import plan_aggregation

        return plan_aggregation(num_chunks, trimmed_frames, frame_grid)

    # ------------------------------------------------------------------
    # the pipeline
    # ------------------------------------------------------------------

    def __call__(
        self,
        audio: Union[str, np.ndarray],
        sample_rate: Optional[int] = None,
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
        dump=None,
    ) -> Annotation:
        """``dump``: optional utils.debug_dump.DumpSession recording the
        canonical pipeline intermediates under the reference's names
        (SURVEY.md section 4.3 checklist) for differential verification."""
        pending = self._dispatch(
            audio,
            sample_rate,
            num_speakers=num_speakers,
            min_speakers=min_speakers,
            max_speakers=max_speakers,
        )
        return self._collect(
            pending,
            num_speakers=num_speakers,
            min_speakers=min_speakers,
            max_speakers=max_speakers,
            dump=dump,
        )

    def map(
        self,
        audios,
        sample_rate: Optional[int] = None,
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
    ):
        """Pipelined batch diarization: dispatch BOTH device stages for
        every request up front, then collect in submission order — request
        i's d2h transfers and host clustering overlap request j>i's device
        compute, so aggregate throughput approaches the pure-compute
        ceiling instead of paying the fetch round trips per request
        (docs/PERF.md "remote-tunnel transfer model"; the reference
        processes files strictly one at a time). Device memory per
        in-flight request is a few MB of stage outputs — the 80000-sample
        window tensors are jit-internal and freed at dispatch end."""
        pendings = [
            self._dispatch(
                a,
                sample_rate,
                num_speakers=num_speakers,
                min_speakers=min_speakers,
                max_speakers=max_speakers,
            )
            for a in audios
        ]
        return [
            self._collect(
                p,
                num_speakers=num_speakers,
                min_speakers=min_speakers,
                max_speakers=max_speakers,
            )
            for p in pendings
        ]

    def warmup(self, max_audio_seconds: float = 60.0, num_clusters: int = 4):
        """Pre-compile every jitted step for every chunk bucket up to
        ``max_audio_seconds`` (plus the post-clustering step at the common
        K lattice), so no request pays a first-shape compile. Compiles
        persist in the XLA compilation cache when one is configured, making
        this a near-no-op on later process starts. Returns the list of
        padded chunk counts warmed."""
        seg_cfg = self.config.segmentation
        max_samples = int(max_audio_seconds * seg_cfg.sample_rate)
        max_chunks = max(
            win.chunk_count(max_samples, seg_cfg.window_size, seg_cfg.step_size), 1
        )
        buckets = sorted(
            {self.chunk_lattice(n) for n in range(1, max_chunks + 1)}
        )
        warmed = []
        for npad in buckets:
            audio_len = (npad - 1) * seg_cfg.step_size + seg_cfg.window_size
            pending = self._dispatch(np.zeros(audio_len, np.float32))
            # drive the post step too (compiles per (npad, k_pad) pair)
            k_pad = _ceil_to(num_clusters, 4)
            membership = np.zeros((npad, seg_cfg.num_speakers, k_pad), bool)
            plan = self._diarization_plan(npad)
            jax.block_until_ready(
                _post_cluster(
                    pending["segmentations"],
                    jnp.asarray(membership),
                    jnp.asarray(plan.start_frames),
                    plan.num_frames,
                )
            )
            jax.block_until_ready((pending["emb"], pending["count_raw"]))
            if pending.get("device_clu") is not None:
                jax.block_until_ready(tuple(pending["device_clu"].values()))
            warmed.append(npad)
        return warmed

    def _dispatch(
        self,
        audio,
        sample_rate=None,
        timings: Optional[StageTimings] = None,
        num_speakers=None,
        min_speakers=None,
        max_speakers=None,
    ):
        """Host prep + BOTH async device-stage dispatches for one request;
        returns the pending state _collect needs. No device sync happens
        here. ``timings`` overrides the shared ``self.timings`` sink so
        concurrent callers (runtime/server.py) get per-request attribution
        instead of racing on one mutable object."""
        timings = timings if timings is not None else self.timings
        cfg = self.config
        seg_cfg = cfg.segmentation
        sr = seg_cfg.sample_rate

        # ---------- load ----------
        waveform = load_waveform(audio, sample_rate, sr)
        num_samples = waveform.shape[0]

        # ---------- stage 1: segmentation ----------
        t0 = time.perf_counter()
        num_chunks = win.chunk_count(num_samples, seg_cfg.window_size, seg_cfg.step_size)
        # pad the chunk axis to the batch lattice so jit sees one shape per
        # bucket; padded chunks are masked out (valid_frames = 0).
        num_padded = self.chunk_lattice(num_chunks)
        needed = (num_padded - 1) * seg_cfg.step_size + seg_cfg.window_size
        wav_padded = np.zeros(needed, dtype=np.float32)
        wav_padded[:num_samples] = waveform
        # 16-bit-quantized audio (the normal case: int16 WAV, no resample)
        # ships to the device as raw int16 — half the transfer bytes; the
        # device rescales exactly (device_chunks). Lossless by construction:
        # only taken when waveform*32768 is integral and in int16 range.
        scaled = wav_padded * 32768.0
        if float(np.max(np.abs(scaled), initial=0.0)) <= 32767.0:
            quant = scaled.astype(np.int16)
            if np.array_equal(quant.astype(np.float32), scaled):
                wav_padded = quant
        valid_frames = np.zeros(num_padded, dtype=np.int32)
        valid_frames[:num_chunks] = seg_cfg.num_frames
        valid_samples = np.zeros(num_padded, dtype=np.int32)
        valid_samples[:num_chunks] = seg_cfg.window_size
        orphan_samples = num_samples - (num_chunks - 1) * seg_cfg.step_size
        if orphan_samples < seg_cfg.window_size:
            valid_frames[num_chunks - 1] = max(
                pyannet_mod.pyannet_num_frames(orphan_samples, self.pyannet_cfg), 0
            )
            valid_samples[num_chunks - 1] = orphan_samples
        wav_dev = jnp.asarray(wav_padded)
        vf_dev = jnp.asarray(valid_frames)
        vs_dev = jnp.asarray(valid_samples)

        chunk_frames = SlidingWindow(
            0.0, seg_cfg.step, seg_cfg.duration, num_samples=num_samples
        )
        segmentations, binarized, chosen, count_raw, inactive = self._stage1(
            self.params["segmentation"], wav_dev, vf_dev, vs_dev
        )
        # ---------- stage 2: embeddings (dispatched before the stage-1
        # fetches so its device compute overlaps the host transfers) ----------
        emb, too_short = self._stage2(self.params["embedding"], wav_dev, chosen)

        # ---------- stage 3 on device (eligible requests): clustering +
        # post-aggregation chained after stage 2 — the request then needs
        # only ONE combined fetch in _collect ----------
        device_clu = None
        rows = num_padded * seg_cfg.num_speakers
        if self._device_clu_eligible(rows, num_speakers, min_speakers, max_speakers):
            dia_plan = self._diarization_plan(num_padded)
            act_dev, hard_dev, num_large_dev = self._stage3(
                segmentations,
                emb,
                too_short,
                inactive,
                jnp.asarray(dia_plan.start_frames),
                dia_plan.num_frames,
            )
            device_clu = {
                "activations": act_dev,
                "hard": hard_dev,
                "num_large": num_large_dev,
            }

        # the count grid for the real chunk count is a prefix of the padded
        # grid (same start/step; NaN-masked padding contributes nothing)
        real_plan = self._count_plan(num_chunks)
        count_frames = dataclasses.replace(real_plan.frames, num_samples=num_samples)
        if self.profile:
            # per-stage attribution costs ~2 extra sync round trips over a
            # remote-tunnel TPU (~25 ms each) — opt-in only
            jax.block_until_ready(count_raw)  # stage-1 device work complete
            timings.segmentation = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(emb)  # stage-2 device work complete
            timings.embedding = time.perf_counter() - t0
        else:
            timings.segmentation = time.perf_counter() - t0
            timings.embedding = 0.0
        return {
            "num_samples": num_samples,
            "num_chunks": num_chunks,
            "num_padded": num_padded,
            "segmentations": segmentations,
            "binarized": binarized,
            "count_raw": count_raw,
            "inactive": inactive,
            "emb": emb,
            "too_short": too_short,
            "chunk_frames": chunk_frames,
            "real_plan": real_plan,
            "count_frames": count_frames,
            "device_clu": device_clu,
        }

    def _collect(
        self,
        pending,
        num_speakers=None,
        min_speakers=None,
        max_speakers=None,
        dump=None,
        timings: Optional[StageTimings] = None,
    ) -> Annotation:
        """Fetch one pending request's clustering inputs, cluster on host,
        run the device post-step, decode the timeline. ``timings``: see
        _dispatch."""
        timings = timings if timings is not None else self.timings
        seg_cfg = self.config.segmentation
        num_samples = pending["num_samples"]
        num_chunks = pending["num_chunks"]
        num_padded = pending["num_padded"]
        segmentations = pending["segmentations"]
        binarized = pending["binarized"]
        count_raw = pending["count_raw"]
        inactive = pending["inactive"]
        emb = pending["emb"]
        too_short = pending["too_short"]
        chunk_frames = pending["chunk_frames"]
        real_plan = pending["real_plan"]
        count_frames = pending["count_frames"]

        # ---------- fused device path: ONE fetch of the final activations
        # + count; no embeddings travel, no membership upload ----------
        bounds_given = any(
            b is not None for b in (num_speakers, min_speakers, max_speakers)
        )
        if (
            pending.get("device_clu") is not None
            and dump is None
            and not bounds_given
        ):
            dc = pending["device_clu"]
            t0 = time.perf_counter()
            act_h, nl_h, count_h = jax.device_get(
                (dc["activations"], dc["num_large"], count_raw)
            )
            timings.fetch = time.perf_counter() - t0
            num_clusters = int(nl_h)
            if 1 <= num_clusters <= self.k_max:
                t0 = time.perf_counter()
                real_dia_plan = self._diarization_plan(num_chunks)
                activations = np.asarray(act_h, dtype=np.float32)[
                    : real_dia_plan.num_frames, :num_clusters
                ]
                count = np.rint(count_h[: real_plan.num_frames]).astype(np.int64)
                binary, binary_frames = rec.binarize_by_count(
                    activations, real_dia_plan.frames, count, count_frames
                )
                annotation = rec.to_annotation(
                    binary,
                    binary_frames,
                    onset=self.config.clustering.binarize_onset,
                    offset=self.config.clustering.binarize_offset,
                    min_duration_on=seg_cfg.min_duration_on,
                    min_duration_off=seg_cfg.min_duration_off,
                )
                timings.clustering = time.perf_counter() - t0
                return annotation
            # num_large == 0 (the host dendrogram search must run) or
            # > k_max: fall through to the host path below — embeddings are
            # still resident on device, this just pays an extra round trip

        # fetch ONLY what host clustering needs (embeddings are the bulk:
        # N x 192 f16). The full segmentations tensor (390 KB for the 59 s
        # wav — half the old wall clock on the remote-tunnel d2h) stays
        # resident; _post_cluster reduces it on device after clustering.
        # In dump mode everything travels and the host twin (finalize) runs
        # instead, preserving differential-dump provenance.
        t0 = time.perf_counter()
        rows = num_chunks * seg_cfg.num_speakers
        # fetch the FULL (padded) arrays in ONE combined device_get (one
        # tunnel round trip) and slice on host — a device-side slice would
        # be a fresh dispatch+fetch
        to_fetch = [emb, too_short, inactive]
        if dump is not None:
            to_fetch += [
                count_raw,
                segmentations[:num_chunks],
                binarized[:num_chunks],
            ]
        fetched = jax.device_get(tuple(to_fetch))
        emb_h = fetched[0][:rows]
        too_short_h = fetched[1][:rows]
        inactive_h = fetched[2][:num_chunks]
        embeddings = np.asarray(emb_h, dtype=np.float64)
        embeddings[too_short_h] = np.nan
        embeddings = embeddings.reshape(num_chunks, seg_cfg.num_speakers, -1)
        timings.fetch = time.perf_counter() - t0

        if dump is not None:
            count = np.rint(fetched[3][: real_plan.num_frames]).astype(np.int64)
            dump.dump("embeddings", embeddings)
            dump.dump("segmentations", fetched[4])
            dump.dump("binarized_segmentations", fetched[5])
            dump.dump("count", count)
            t0 = time.perf_counter()
            annotation = self.finalize(
                fetched[4],
                fetched[5],
                embeddings,
                count,
                count_frames,
                chunk_frames,
                num_speakers=num_speakers,
                min_speakers=min_speakers,
                max_speakers=max_speakers,
                dump=dump,
                inactive=inactive_h,
            )
            timings.clustering = time.perf_counter() - t0
            return annotation

        # ---------- stage 3: clustering (host) + device post-step ----------
        t0 = time.perf_counter()
        cfg_c = self.config
        hard, _soft = self.clusterer(
            embeddings,
            num_clusters=num_speakers or cfg_c.num_speakers,
            min_clusters=min_speakers or cfg_c.min_speakers,
            max_clusters=max_speakers or cfg_c.max_speakers,
        )
        hard = np.asarray(hard)
        hard[inactive_h] = -2  # speakerDiarizer.cpp:3166-3191
        num_clusters = max(int(hard.max()) + 1, 1)
        # pad K to a small lattice so jit sees few distinct shapes
        k_pad = _ceil_to(num_clusters, 4)
        membership = np.zeros(
            (num_padded, seg_cfg.num_speakers, k_pad), dtype=bool
        )
        ci, si = np.nonzero(hard >= 0)
        membership[ci, si, hard[ci, si]] = True

        dia_plan = self._diarization_plan(num_padded)
        activations_dev = _post_cluster(
            segmentations,
            jnp.asarray(membership),
            jnp.asarray(dia_plan.start_frames),
            dia_plan.num_frames,
        )
        real_dia_plan = self._diarization_plan(num_chunks)
        activations, count_h = jax.device_get((activations_dev, count_raw))
        activations = activations[: real_dia_plan.num_frames, :num_clusters]
        count = np.rint(count_h[: real_plan.num_frames]).astype(np.int64)
        binary, binary_frames = rec.binarize_by_count(
            activations, real_dia_plan.frames, count, count_frames
        )
        annotation = rec.to_annotation(
            binary,
            binary_frames,
            onset=cfg_c.clustering.binarize_onset,
            offset=cfg_c.clustering.binarize_offset,
            min_duration_on=seg_cfg.min_duration_on,
            min_duration_off=seg_cfg.min_duration_off,
        )
        timings.clustering = time.perf_counter() - t0
        return annotation

    def run_chunks(
        self,
        waveform_slice: np.ndarray,
        num_chunks: int,
        orphan_frames: Optional[int] = None,
        orphan_samples: Optional[int] = None,
    ):
        """Run stages 1+2 on an arbitrary contiguous chunk range.

        ``waveform_slice`` holds the samples backing chunks [0, num_chunks)
        of the range (chunk i = samples [i*step, i*step+window) of the
        slice); ``orphan_frames`` gives the last chunk's valid model frames
        when it is the global short tail, and ``orphan_samples`` its true
        sample count (needed only for the exact_orphan parity re-run).
        Returns host tensors (segs (n, F, S), binarized, embeddings
        (n, S, D) with NaN rows for too-short masks). Building block for
        the long-form sharded path (parallel/longform.py) and the streaming
        pipeline (pipelines/streaming.py).
        """
        seg_cfg = self.config.segmentation
        if num_chunks == 0:
            # empty shard (more hosts than chunks): return correctly-shaped
            # empties so the multi-host caller still joins the allgather
            F, S = seg_cfg.num_frames, seg_cfg.num_speakers
            D = self.ecapa_cfg.emb_dim
            return (
                np.zeros((0, F, S), np.float32),
                np.zeros((0, F, S), np.float32),
                np.zeros((0, S, D), np.float64),
            )
        num_padded = self.chunk_lattice(num_chunks)
        needed = (num_padded - 1) * seg_cfg.step_size + seg_cfg.window_size
        wav_padded = np.zeros(needed, dtype=np.float32)
        wav_padded[: waveform_slice.shape[0]] = waveform_slice
        valid_frames = np.zeros(num_padded, dtype=np.int32)
        valid_frames[:num_chunks] = seg_cfg.num_frames
        valid_samples = np.zeros(num_padded, dtype=np.int32)
        valid_samples[:num_chunks] = seg_cfg.window_size
        if orphan_frames is not None:
            valid_frames[num_chunks - 1] = orphan_frames
        if orphan_samples is not None and orphan_samples < seg_cfg.window_size:
            valid_samples[num_chunks - 1] = orphan_samples
        wav_dev = jnp.asarray(wav_padded)
        vf_dev = jnp.asarray(valid_frames)

        segs, binarized, chosen, _, _ = self._stage1(
            self.params["segmentation"], wav_dev, vf_dev, jnp.asarray(valid_samples)
        )
        emb, too_short = self._stage2(self.params["embedding"], wav_dev, chosen)

        rows = num_chunks * seg_cfg.num_speakers
        segs, binarized, emb, too_short = jax.device_get(
            (segs[:num_chunks], binarized[:num_chunks], emb[:rows], too_short[:rows])
        )
        embeddings = np.asarray(emb, dtype=np.float64)
        embeddings[np.asarray(too_short)] = np.nan
        return segs, binarized, embeddings.reshape(num_chunks, seg_cfg.num_speakers, -1)

    def run_chunks_device(
        self,
        waveform_slice: np.ndarray,
        num_chunks: int,
        orphan_frames: Optional[int] = None,
        orphan_samples: Optional[int] = None,
        fetch: bool = True,
    ):
        """Like run_chunks, but the bulky per-chunk score tensors STAY ON
        DEVICE; only embeddings (f16) + flags travel to the host. Returns
        (segs_dev (padded, F, S), binarized_dev (padded, F, S),
        valid_frames (padded,) np, embeddings (n, S, D) f64 host with NaN
        rows, inactive (n, S) bool host). Built for the bounded-memory
        long-form path (parallel/longform.py): d2h per shard is ~1 MB
        instead of ~7 MB, which matters at 10 MB/s tunnel bandwidth."""
        seg_cfg = self.config.segmentation
        num_padded = self.chunk_lattice(num_chunks)
        needed = (num_padded - 1) * seg_cfg.step_size + seg_cfg.window_size
        wav_padded = np.zeros(needed, dtype=np.float32)
        wav_padded[: waveform_slice.shape[0]] = waveform_slice
        valid_frames = np.zeros(num_padded, dtype=np.int32)
        valid_frames[:num_chunks] = seg_cfg.num_frames
        valid_samples = np.zeros(num_padded, dtype=np.int32)
        valid_samples[:num_chunks] = seg_cfg.window_size
        if orphan_frames is not None:
            valid_frames[num_chunks - 1] = orphan_frames
        if orphan_samples is not None and orphan_samples < seg_cfg.window_size:
            valid_samples[num_chunks - 1] = orphan_samples
        wav_dev = jnp.asarray(wav_padded)

        segs, binarized, chosen, _, inactive = self._stage1(
            self.params["segmentation"],
            wav_dev,
            jnp.asarray(valid_frames),
            jnp.asarray(valid_samples),
        )
        emb, too_short = self._stage2(self.params["embedding"], wav_dev, chosen)
        if not fetch:
            # ASYNC mode: hand back the device handles so the caller can
            # dispatch MORE shards before any sync — the long-form path
            # (parallel/longform.py) overlaps each shard's d2h fetch with
            # the later shards' device compute
            return segs, binarized, valid_frames, emb, too_short, inactive
        emb_h, too_short_h, inactive_h = jax.device_get((emb, too_short, inactive))
        embeddings = finalize_embeddings(
            emb_h, too_short_h, num_chunks, seg_cfg.num_speakers
        )
        return segs, binarized, valid_frames, embeddings, inactive_h[:num_chunks]

    def stage2_internals(
        self,
        waveform: np.ndarray,
        num_chunks: int,
        orphan_frames: Optional[int] = None,
        orphan_samples: Optional[int] = None,
    ):
        """Run the jitted DEBUG variant of stage 2 and fetch its internals:
        (signals, wav_lens) for the real rows — the packed speech samples
        and normalized lengths exactly as the production ops computed them
        (same pack backend, same fused frontend feed, same orphan handling
        as run_chunks). Used by the differential-dump harness to pin
        production stage-2 provenance (reference: the C++ dumps what
        production computed, speakerDiarizer.cpp:2443)."""
        seg_cfg = self.config.segmentation
        num_padded = self.chunk_lattice(num_chunks)
        needed = (num_padded - 1) * seg_cfg.step_size + seg_cfg.window_size
        wav_padded = np.zeros(needed, dtype=np.float32)
        wav_padded[: waveform.shape[0]] = waveform
        valid_frames = np.zeros(num_padded, dtype=np.int32)
        valid_frames[:num_chunks] = seg_cfg.num_frames
        valid_samples = np.zeros(num_padded, dtype=np.int32)
        valid_samples[:num_chunks] = seg_cfg.window_size
        if orphan_frames is not None:
            valid_frames[num_chunks - 1] = orphan_frames
        if orphan_samples is not None and orphan_samples < seg_cfg.window_size:
            valid_samples[num_chunks - 1] = orphan_samples
        wav_dev = jnp.asarray(wav_padded)
        _, _, chosen, _, _ = self._stage1(
            self.params["segmentation"],
            wav_dev,
            jnp.asarray(valid_frames),
            jnp.asarray(valid_samples),
        )
        _, _, signals, wav_lens = self._stage2_debug(
            self.params["embedding"], wav_dev, chosen
        )
        rows = num_chunks * seg_cfg.num_speakers
        signals, wav_lens = jax.device_get((signals[:rows], wav_lens[:rows]))
        return signals, wav_lens

    def finalize(
        self,
        segmentations: np.ndarray,
        binarized: np.ndarray,
        embeddings: np.ndarray,
        count: np.ndarray,
        count_frames: SlidingWindow,
        chunk_frames: SlidingWindow,
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
        dump=None,
        inactive: Optional[np.ndarray] = None,
        clusterer=None,
    ) -> Annotation:
        """Stage 3 on host tensors: cluster embeddings, reconstruct the
        global timeline, decode turns. Shared by the standard path and the
        long-form multi-host path (parallel/longform.py), which feeds
        allgathered per-host outputs here. ``inactive`` (chunks, speakers)
        bool marks locally-silent speakers; derived from ``binarized`` when
        not supplied (callers fetching from device pass it precomputed so
        the full binarized tensor never travels). ``clusterer`` overrides
        self.clusterer for one call (the streaming pipeline's incremental
        centroid-assignment emissions, pipelines/streaming.py)."""
        cfg = self.config
        seg_cfg = cfg.segmentation
        if clusterer is None:
            clusterer = self.clusterer
        cluster_kwargs = {}
        if dump is not None and isinstance(clusterer, AgglomerativeClustering):
            cluster_kwargs["dump"] = dump
        hard, soft = clusterer(
            embeddings,
            num_clusters=num_speakers or cfg.num_speakers,
            min_clusters=min_speakers or cfg.min_speakers,
            max_clusters=max_speakers or cfg.max_speakers,
            **cluster_kwargs,
        )

        # inactive local speakers -> -2 (speakerDiarizer.cpp:3166-3191)
        if inactive is None:
            inactive = binarized.sum(axis=1) == 0
        hard = np.asarray(hard)
        hard[inactive] = -2

        if dump is not None:
            dump.dump("hard_clusters", hard)
            dump.dump("soft_clusters", soft)
        discrete, discrete_frames = rec.reconstruct(
            segmentations, chunk_frames, hard, count, count_frames, dump=dump
        )
        if dump is not None:
            dump.dump("discrete_diarization", discrete)
        return rec.to_annotation(
            discrete,
            discrete_frames,
            onset=cfg.clustering.binarize_onset,
            offset=cfg.clustering.binarize_offset,
            min_duration_on=seg_cfg.min_duration_on,
            min_duration_off=seg_cfg.min_duration_off,
        )
