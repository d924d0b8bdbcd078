"""Long-form / multi-host diarization: shard the chunk axis across hosts.

The reference's only scaling mechanism is a sequential sliding-window loop
in one process (reference pipeline/src/speakerDiarizer.cpp:1419-1480;
SURVEY.md section 2.3/5.7) — an hour of audio means 2808 chunks processed
one 32-batch at a time with the whole waveform in RAM. This module is the
greenfield TPU design for the same workload:

  - The 5 s / 0.5 s chunk axis IS the sequence axis. It is split into
    contiguous per-host shards; chunk ``i`` covers samples
    ``[i*step, i*step + window)``, so a host owning chunks ``[lo, hi)``
    reads only samples ``[lo*step, (hi-1)*step + window)`` from disk
    (io/wav.py partial reads) — the halo past its nominal span is at most
    ``window - step`` = 4.5 s.
  - Each shard runs the pipeline's jitted stage-1/stage-2 dispatches
    locally; within a host, the chunk axis additionally data-parallelizes
    over the chip mesh via the pipeline's sharding constraints.
  - Per-chunk score tensors stay RESIDENT on each host's device; what
    crosses hosts (DCN allgather in a real multi-host run,
    jax.experimental.multihost_utils) is only the f16 embeddings plus small
    speaker-count and activation grids, both linear in the chunks and
    stitched by addition (_run_device_resident).
  - Clustering and the timeline decode are replicated host work on the
    gathered tensors — equal to the single-shot pipeline (tested).

The same sharding doubles as the BOUNDED-MEMORY path on a single chip:
``LongFormDiarizer(pipeline, num_shards=8)`` processes an hour-long file
in eight slices, with at most ``max_inflight_shards`` (default 3) shards'
waveform/window working sets on device at once — dispatch runs ahead of
the per-shard collect by that window, so fetches overlap later shards'
compute while device high-water memory stays O(window), not O(audio
length). When the request is eligible for on-device clustering
(single-process, default AHC recipe, no speaker bounds), stage 3 runs
FUSED on the device over the concatenated resident shard embeddings
(_global_cluster_jit; train-capped exactly like the host, docs/PARITY.md
deviation 6) and only tiny count/activation grids plus one scalar ever
cross the tunnel. Measured hour-scale numbers live in docs/PERF.md
("Hour-scale long-form"); per-shard d2h is ~KBs because both the score
tensors and the embeddings stay resident (_run_device_resident).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional, Union

import numpy as np


@functools.lru_cache(maxsize=None)
def _global_cluster_jit():
    """Jitted global stage 3 over the per-shard device-resident stage-2
    outputs: concatenate embeddings/validity/inactivity across shards and
    run the fused device clustering (clustering/device.py) — the long-form
    variant of the pipeline's stage3. Compiled per shard-shape tuple
    (near-even shard plans produce at most two distinct shapes)."""
    import jax
    import jax.numpy as jnp

    from ..clustering.device import device_cluster

    @functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
    def fn(embs, toos, inacts, threshold, mcs, k_max, train_cap):
        emb = jnp.concatenate([e.astype(jnp.float32) for e in embs], axis=0)
        valid = jnp.concatenate([~t for t in toos], axis=0)
        inact = jnp.concatenate([i.reshape(-1) for i in inacts], axis=0)
        res = device_cluster(
            emb, valid, inact, threshold, mcs, k_max, train_cap=train_cap
        )
        return res.hard, res.num_large

    return fn

from ..core.annotation import Annotation
from ..io import resample as rs
from ..io import wav as wavio
from ..models import pyannet as pyannet_mod
from ..ops import windows as win
from ..pipelines import reconstruct as rec
from ..pipelines.diarization import SpeakerDiarizationPipeline


class JaxHostComm:
    """The real multi-host collective surface: jax process topology + a
    process_allgather over DCN (jax.experimental.multihost_utils). Kept
    behind this tiny interface so tests can execute the multi-host branch
    with simulated hosts (tests/test_longform.py)."""

    def process_count(self) -> int:
        import jax

        return jax.process_count()

    def process_index(self) -> int:
        import jax

        return jax.process_index()

    def allgather(self, x: np.ndarray) -> np.ndarray:
        """(local ...) -> (hosts, ...) stacked over the process axis."""
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x))


@dataclasses.dataclass(frozen=True)
class ChunkShard:
    """A contiguous range of global chunk indices and the sample window
    (including the trailing halo) needed to compute them."""

    chunk_lo: int
    chunk_hi: int  # exclusive
    sample_lo: int
    sample_hi: int  # exclusive; may exceed the file (zero-padded)

    @property
    def num_chunks(self) -> int:
        return self.chunk_hi - self.chunk_lo


def plan_shards(
    num_chunks: int, num_shards: int, window_size: int, step_size: int
) -> List[ChunkShard]:
    """Split ``num_chunks`` into ``num_shards`` contiguous, near-even ranges
    (first ``num_chunks % num_shards`` shards get one extra chunk; trailing
    shards may be empty when there are more shards than chunks)."""
    base, extra = divmod(num_chunks, num_shards)
    shards = []
    lo = 0
    for s in range(num_shards):
        hi = lo + base + (1 if s < extra else 0)
        shards.append(
            ChunkShard(
                chunk_lo=lo,
                chunk_hi=hi,
                sample_lo=lo * step_size,
                sample_hi=((hi - 1) * step_size + window_size) if hi > lo else lo * step_size,
            )
        )
        lo = hi
    return shards


class LongFormDiarizer:
    """Chunk-sharded wrapper around a SpeakerDiarizationPipeline.

    ``num_shards`` defaults to ``jax.process_count()`` (multi-host: one
    shard per host, gathered over DCN) and otherwise to a single shard. In
    a single process, shards execute sequentially — the bounded-memory
    long-form mode.
    """

    def __init__(
        self,
        pipeline: SpeakerDiarizationPipeline,
        num_shards: Optional[int] = None,
        comm: Optional[JaxHostComm] = None,
        # Dispatch-ahead window: how many shards may be queued on device
        # before the oldest one's (tiny) count-grid fetch forces its
        # compute to drain. Keeps the fetch/compute overlap of the
        # pipelined collect while bounding device high-water memory at
        # O(max_inflight_shards) waveform+window working sets instead of
        # O(total audio length) (round-4 advisor finding).
        max_inflight_shards: int = 3,
    ):
        self.pipeline = pipeline
        self.comm = comm if comm is not None else JaxHostComm()
        self._multihost = self.comm.process_count() > 1
        if num_shards is None:
            num_shards = self.comm.process_count()
        if self._multihost and num_shards != self.comm.process_count():
            raise ValueError(
                "multi-host runs need exactly one shard per host "
                f"(num_shards={num_shards}, hosts={self.comm.process_count()})"
            )
        self.num_shards = num_shards
        self.max_inflight_shards = max(1, max_inflight_shards)

    # total padded embedding rows the fused device stage 3 accepts in
    # long-form mode (~4.7 h of audio; the merge loop is train-cap-bounded,
    # this only sizes the O(rows) selection/assignment buffers)
    _DEVICE_CLU_MAX_ROWS = 65536

    def _device_clu_eligible(
        self, total_rows: int, num_speakers, min_speakers, max_speakers
    ) -> bool:
        """Fused device stage 3 for the WHOLE long-form request: global
        AHC over the concatenated device-resident shard embeddings
        (single-process only — a multi-host run must gather embeddings
        over DCN anyway, so it keeps host clustering)."""
        p = self.pipeline
        if self._multihost:
            return False
        key = p._device_clu_key()
        if key is None:
            return False
        cap = key[3]
        if p._device_train_size(total_rows, cap) > p._UNCAPPED_DEVICE_ROWS:
            # merge loop would exceed the affordable size (uncapped
            # clusterers and large finite caps both route to host)
            return False
        if total_rows > self._DEVICE_CLU_MAX_ROWS:
            return False
        return p._no_speaker_bounds(num_speakers, min_speakers, max_speakers)

    # ------------------------------------------------------------------

    def _load_shard(self, audio, sr: int, shard: ChunkShard) -> np.ndarray:
        """Waveform slice [sample_lo, sample_hi) zero-padded to full length."""
        out = np.zeros(shard.sample_hi - shard.sample_lo, dtype=np.float32)
        if isinstance(audio, str):
            data = wavio.read_wav(
                audio,
                start_frame=shard.sample_lo,
                max_frames=shard.sample_hi - shard.sample_lo,
            )
            piece = data.normalized_mono()
        else:
            piece = audio[shard.sample_lo : shard.sample_hi]
        out[: piece.shape[0]] = piece
        return out

    def _gather(self, local, pad_to: int, real: int, total: int):
        """Allgather per-shard arrays of uneven length: pad the leading axis
        to ``pad_to``, gather over hosts, then drop padding rows."""
        padded = np.zeros((pad_to,) + local.shape[1:], dtype=local.dtype)
        padded[:real] = local
        gathered = self.comm.allgather(padded)
        # (hosts, pad_to, ...) -> concat real rows per host
        counts = self._shard_counts(total)
        parts = [gathered[h, : counts[h]] for h in range(len(counts))]
        return np.concatenate(parts, axis=0)

    def _shard_counts(self, num_chunks: int) -> List[int]:
        base, extra = divmod(num_chunks, self.num_shards)
        return [base + (1 if s < extra else 0) for s in range(self.num_shards)]

    # ------------------------------------------------------------------

    def __call__(
        self,
        audio: Union[str, np.ndarray],
        sample_rate: Optional[int] = None,
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
    ) -> Annotation:
        p = self.pipeline
        seg_cfg = p.config.segmentation
        sr = seg_cfg.sample_rate

        # ---------- probe / load ----------
        if isinstance(audio, str):
            info = wavio.wav_info(audio)
            if info.sample_rate != sr:
                # resampling is stateful across slice boundaries — fall back
                # to whole-file load for non-native rates
                data = wavio.read_wav(audio)
                audio = rs.resample(
                    data.normalized_mono(), data.sample_rate, sr
                ).astype(np.float32)
                num_samples = audio.shape[0]
            else:
                num_samples = info.num_frames
        else:
            audio = np.asarray(audio, dtype=np.float32)
            if audio.ndim == 2:
                audio = rs.downmix(audio)
            if sample_rate is not None and sample_rate != sr:
                audio = rs.resample(audio, sample_rate, sr)
            num_samples = audio.shape[0]

        num_chunks = win.chunk_count(
            num_samples, seg_cfg.window_size, seg_cfg.step_size
        )
        shards = plan_shards(
            num_chunks, self.num_shards, seg_cfg.window_size, seg_cfg.step_size
        )

        # the global orphan chunk (short tail) lives in the last non-empty shard
        orphan_samples = num_samples - (num_chunks - 1) * seg_cfg.step_size
        orphan_frames = None
        if orphan_samples < seg_cfg.window_size:
            orphan_frames = max(
                pyannet_mod.pyannet_num_frames(orphan_samples, p.pyannet_cfg), 0
            )

        # ---------- per-shard stage 1+2 (single-process AND multi-host) ----
        # one device-resident implementation: per-host score tensors never
        # leave their device; only embeddings (f16) and small count /
        # activation grids cross DCN (multi-host) or the d2h tunnel
        return self._run_device_resident(
            audio,
            sr,
            shards,
            num_chunks,
            num_samples,
            orphan_frames,
            orphan_samples,
            num_speakers,
            min_speakers,
            max_speakers,
        )

    # ------------------------------------------------------------------

    def _run_device_resident(
        self,
        audio,
        sr: int,
        shards: List[ChunkShard],
        num_chunks: int,
        num_samples: int,
        orphan_frames,
        orphan_samples,
        num_speakers,
        min_speakers,
        max_speakers,
    ) -> Annotation:
        """Device-resident long-form, single-process AND multi-host: each
        host's bulky per-chunk score tensors stay RESIDENT on its device;
        the host side receives only embeddings (f16) and tiny per-shard
        count/activation grids (~1 MB/shard instead of ~7 MB — decisive at
        ~10 MB/s tunnel d2h, and the only payloads crossing DCN in a
        multi-host run).

        Both the speaker-count overlap-add (numerator/denominator) and the
        post-clustering skip-average aggregation are LINEAR in the chunks,
        so per-shard partial grids computed on device with globally
        consistent start frames stitch by ADDITION — a sum over hosts is an
        allgather+sum collective; same math as the single-shot pipeline
        (equality tested in tests/test_longform.py, incl. simulated hosts
        with uneven and empty shards).
        """
        import jax
        import jax.numpy as jnp

        from ..pipelines.diarization import (
            _ceil_to,
            _count_parts,
            _post_cluster,
            finalize_embeddings,
        )

        p = self.pipeline
        cfg = p.config
        seg_cfg = cfg.segmentation
        F = seg_cfg.num_frames
        left = math.floor(F * seg_cfg.warm_up[0])
        right = math.floor(F * seg_cfg.warm_up[1])
        tspan = F - left - right

        if self._multihost:
            local_shards = [shards[self.comm.process_index()]]
        else:
            local_shards = [s for s in shards if s.num_chunks]

        count_plan = p._count_plan(num_chunks)
        dia_plan = p._diarization_plan(num_chunks)
        num_acc = np.zeros(count_plan.num_frames, np.float64)
        den_acc = np.zeros(count_plan.num_frames, np.float64)
        S = seg_cfg.num_speakers

        total_rows = sum(
            p.chunk_lattice(s.num_chunks) * S for s in local_shards if s.num_chunks
        )
        use_devclu = self._device_clu_eligible(
            total_rows, num_speakers, min_speakers, max_speakers
        )

        embs, inacts, resident = [], [], []
        # device handles retained for the fused stage 3 (and as the
        # fallback source if it reports an out-of-range cluster count)
        emb_handles = []

        def collect_one(item):
            """One combined device_get per shard, submission order — the
            fetch overlaps the in-flight later shards' device compute."""
            (shard, segs_dev, valid, emb_dev, ts_dev, inact_dev, n_dev,
             d_dev, gofs, local_n) = item
            if use_devclu:
                # embeddings stay on device; only the two tiny count grids
                # travel per shard
                n_h, d_h = jax.device_get((n_dev, d_dev))
            else:
                emb_h, ts_h, inact_h, n_h, d_h = jax.device_get(
                    (emb_dev, ts_dev, inact_dev, n_dev, d_dev)
                )
                embs.append(
                    finalize_embeddings(emb_h, ts_h, shard.num_chunks, S)
                )
                inacts.append(inact_h[: shard.num_chunks])
            take = min(local_n, count_plan.num_frames - gofs)
            num_acc[gofs : gofs + take] += n_h[:take]
            den_acc[gofs : gofs + take] += d_h[:take]
            resident.append((shard, segs_dev, valid))
            if use_devclu:
                # only the fused stage 3 (and its fallback) needs the
                # device handles; the host path already fetched everything
                emb_handles.append((shard, emb_dev, ts_dev, inact_dev))

        # PIPELINED dispatch with a BOUNDED in-flight window: queue up to
        # ``max_inflight_shards`` shards' stage-1/2 + count-part dispatches
        # before collecting the oldest one, so each shard's d2h fetch
        # overlaps later shards' device compute while device high-water
        # memory stays O(window), not O(total audio) (round-4 advisor
        # finding; the round-3 loop synced per shard and idled the chip,
        # the round-4 loop queued everything)
        pending = []
        for shard in local_shards:
            if shard.num_chunks == 0:
                continue  # empty shard (more hosts than chunks): it still
                # joins every collective below with zero contributions
            is_last = shard.chunk_hi == num_chunks
            segs_dev, binz_dev, valid, emb_dev, ts_dev, inact_dev = (
                p.run_chunks_device(
                    self._load_shard(audio, sr, shard),
                    shard.num_chunks,
                    orphan_frames if is_last else None,
                    orphan_samples if is_last else None,
                    fetch=False,
                )
            )
            lo, hi = shard.chunk_lo, shard.chunk_hi
            gofs = int(count_plan.start_frames[lo])
            cstart = count_plan.start_frames[lo:hi] - gofs
            local_n = _ceil_to(int(cstart[-1]) + tspan, 512)
            cstart_pad = np.zeros(valid.shape[0], np.int32)
            cstart_pad[: hi - lo] = cstart
            n_dev, d_dev = _count_parts(
                binz_dev,
                jnp.asarray(valid),
                jnp.asarray(cstart_pad),
                local_n,
                left,
                right,
            )
            pending.append(
                (shard, segs_dev, valid, emb_dev, ts_dev, inact_dev, n_dev,
                 d_dev, gofs, local_n)
            )
            if len(pending) >= self.max_inflight_shards:
                collect_one(pending.pop(0))
        for item in pending:
            collect_one(item)

        hard = None
        num_clusters = None
        if use_devclu:
            # ---- fused global stage 3: AHC over the concatenated
            # device-resident shard embeddings; embeddings and membership
            # never cross the tunnel, only num_large (a scalar) does ----
            thr_, mcs_, k_max_, cap_ = p._device_clu_key()
            hard_dev, num_large_dev = _global_cluster_jit()(
                tuple(e for _, e, _, _ in emb_handles),
                tuple(t for _, _, t, _ in emb_handles),
                tuple(i for _, _, _, i in emb_handles),
                thr_,
                mcs_,
                k_max_,
                cap_,
            )
            num_clusters = int(jax.device_get(num_large_dev))
            if 1 <= num_clusters <= p.k_max:
                activations = self._post_from_hard(
                    p, resident, hard_dev, dia_plan, F, num_chunks, p.k_max
                )
                return self._decode(
                    p,
                    activations,
                    num_clusters,
                    num_acc,
                    den_acc,
                    count_plan,
                    dia_plan,
                    num_samples,
                )
            # out-of-range cluster count: fall through to the host path —
            # embeddings are still resident, this pays one extra fetch
            for shard, emb_dev, ts_dev, inact_dev in emb_handles:
                emb_h, ts_h, inact_h = jax.device_get(
                    (emb_dev, ts_dev, inact_dev)
                )
                embs.append(
                    finalize_embeddings(emb_h, ts_h, shard.num_chunks, S)
                )
                inacts.append(inact_h[: shard.num_chunks])

        D = p.ecapa_cfg.emb_dim
        if embs:
            local_emb = np.concatenate(embs, axis=0)
            local_inact = np.concatenate(inacts, axis=0)
        else:
            local_emb = np.zeros((0, S, D), np.float64)
            local_inact = np.zeros((0, S), bool)

        if self._multihost:
            # the only cross-host payloads: f16-sized embeddings + the two
            # small count grids (allgather over DCN), summed/stitched here
            n_local = local_shards[0].num_chunks
            pad_to = max(self._shard_counts(num_chunks))
            embeddings = self._gather(local_emb, pad_to, n_local, num_chunks)
            inactive = self._gather(local_inact, pad_to, n_local, num_chunks)
            num_acc = self.comm.allgather(num_acc).sum(axis=0)
            den_acc = self.comm.allgather(den_acc).sum(axis=0)
        else:
            embeddings = local_emb
            inactive = local_inact

        # global clustering, replicated on every host (deterministic on the
        # gathered embeddings; embeddings are the only bulk transfer)
        hard, _soft = p.clusterer(
            embeddings,
            num_clusters=num_speakers or cfg.num_speakers,
            min_clusters=min_speakers or cfg.min_speakers,
            max_clusters=max_speakers or cfg.max_speakers,
        )
        hard = np.asarray(hard)
        hard[inactive] = -2  # speakerDiarizer.cpp:3166-3191
        num_clusters = max(int(hard.max()) + 1, 1)
        k_pad = _ceil_to(num_clusters, 4)

        # per-shard post-clustering on the resident scores
        activations = np.zeros((dia_plan.num_frames, k_pad), np.float64)
        for shard, segs_dev, valid in resident:
            lo, hi = shard.chunk_lo, shard.chunk_hi
            gofs = int(dia_plan.start_frames[lo])
            dstart = dia_plan.start_frames[lo:hi] - gofs
            local_n = _ceil_to(int(dstart[-1]) + F, 512)
            membership = np.zeros((valid.shape[0], seg_cfg.num_speakers, k_pad), bool)
            h = hard[lo:hi]
            ci, si = np.nonzero(h >= 0)
            membership[ci, si, h[ci, si]] = True
            dstart_pad = np.zeros(valid.shape[0], np.int32)
            dstart_pad[: hi - lo] = dstart
            act = jax.device_get(
                _post_cluster(
                    segs_dev, jnp.asarray(membership), jnp.asarray(dstart_pad), local_n
                )
            )
            take = min(local_n, dia_plan.num_frames - gofs)
            activations[gofs : gofs + take] += act[:take]

        if self._multihost:
            activations = self.comm.allgather(activations).sum(axis=0)

        return self._decode(
            p,
            activations,
            num_clusters,
            num_acc,
            den_acc,
            count_plan,
            dia_plan,
            num_samples,
        )

    # ------------------------------------------------------------------

    @staticmethod
    def _post_from_hard(p, resident, hard_dev, dia_plan, F, num_chunks, k_max):
        """Per-shard post-clustering aggregation driven by the
        DEVICE-RESIDENT global hard labels: dispatch every shard's
        _post_cluster_from_hard (membership derived on device), then
        collect and stitch by addition."""
        import jax
        import jax.numpy as jnp

        from ..pipelines.diarization import _ceil_to, _post_cluster_from_hard

        seg_cfg = p.config.segmentation
        acts_dev = []
        ofs = 0
        for shard, segs_dev, valid in resident:
            lo, hi = shard.chunk_lo, shard.chunk_hi
            gofs = int(dia_plan.start_frames[lo])
            dstart = dia_plan.start_frames[lo:hi] - gofs
            local_n = _ceil_to(int(dstart[-1]) + F, 512)
            dstart_pad = np.zeros(valid.shape[0], np.int32)
            dstart_pad[: hi - lo] = dstart
            acts_dev.append(
                (
                    _post_cluster_from_hard(
                        segs_dev,
                        hard_dev,
                        jnp.asarray(ofs, jnp.int32),
                        jnp.asarray(dstart_pad),
                        local_n,
                        k_max,
                    ),
                    gofs,
                    local_n,
                )
            )
            ofs += valid.shape[0] * seg_cfg.num_speakers
        activations = np.zeros((dia_plan.num_frames, k_max), np.float64)
        for act_dev, gofs, local_n in acts_dev:
            act = jax.device_get(act_dev)
            take = min(local_n, dia_plan.num_frames - gofs)
            activations[gofs : gofs + take] += act[:take]
        return activations

    @staticmethod
    def _decode(
        p, activations, num_clusters, num_acc, den_acc, count_plan, dia_plan,
        num_samples,
    ) -> Annotation:
        """Shared final decode: stitched count grids -> per-frame count,
        top-count binarization, hysteresis/support timeline."""
        cfg = p.config
        seg_cfg = cfg.segmentation
        eps = float(np.finfo(np.float64).eps)
        count_data = np.where(den_acc == 0.0, 0.0, num_acc / np.maximum(den_acc, eps))
        count = np.rint(count_data).astype(np.int64)
        count_frames = dataclasses.replace(count_plan.frames, num_samples=num_samples)
        binary, binary_frames = rec.binarize_by_count(
            activations[:, :num_clusters].astype(np.float32),
            dia_plan.frames,
            count,
            count_frames,
        )
        return rec.to_annotation(
            binary,
            binary_frames,
            onset=cfg.clustering.binarize_onset,
            offset=cfg.clustering.binarize_offset,
            min_duration_on=seg_cfg.min_duration_on,
            min_duration_off=seg_cfg.min_duration_off,
        )
