"""Hour-scale long-form bench (VERDICT r2 item 6).

Measures, on the real chip:
  1. LongFormDiarizer bounded-memory mode on >= 1 h of 16 kHz audio
     (the reference wav tiled): wall time, audio-s/s, shard count, and the
     device-memory bound (one shard's windows at a time vs the whole hour).
  2. The native (OpenMP C++) AHC at N in {2k, 10k, 20k} embeddings vs the
     numpy and scipy backends.

Usage: python scripts/bench_longform.py [hours] [num_shards]
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio
from pyannote_audio_speaker_diarization_cpp_tpu.parallel.longform import (
    LongFormDiarizer,
    plan_shards,
)
from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
    SpeakerDiarizationPipeline,
)

REFERENCE_WAV = "/root/reference/pipeline/data/multi-speaker_1min.wav"


def bench_longform(hours: float, num_shards: int):
    data = wavio.read_wav(REFERENCE_WAV)
    base = (data.samples.mean(axis=0) / 32768.0).astype(np.float32)
    reps = int(np.ceil(hours * 3600 * 16000 / len(base)))
    waveform = np.tile(base, reps)
    audio_s = len(waveform) / 16000
    seg_cfg_window = 80000

    pipeline = SpeakerDiarizationPipeline(seg_batch=32, emb_batch=32)
    diarizer = LongFormDiarizer(pipeline, num_shards=num_shards)

    from pyannote_audio_speaker_diarization_cpp_tpu.ops import windows as win

    num_chunks = win.chunk_count(len(waveform), seg_cfg_window, 8000)
    shards = plan_shards(num_chunks, num_shards, 80000, 8000)
    max_shard_chunks = max(s.num_chunks for s in shards)
    windows_gb_full = (len(waveform) // 8000) * seg_cfg_window * 4 / 1e9
    windows_gb_shard = max_shard_chunks * seg_cfg_window * 4 / 1e9

    # warm: compile at the REAL shard shapes (run_chunks pads each shard to
    # the chunk lattice, so one shard-sized run covers them; the persistent
    # .jax_cache makes this a no-op on later invocations)
    warm_shard = shards[0]
    t0 = time.perf_counter()
    pipeline.run_chunks_device(
        waveform[warm_shard.sample_lo : warm_shard.sample_hi], warm_shard.num_chunks
    )
    print(f"warm (shard-shape compile or cache hit): {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    ann = diarizer(waveform)
    wall = time.perf_counter() - t0
    print(
        f"long-form: {audio_s/3600:.2f} h in {wall:.1f} s = "
        f"{audio_s/wall:.1f} audio-s/s sustained | shards={num_shards} "
        f"(largest {max_shard_chunks} chunks) | window memory: "
        f"{windows_gb_shard:.2f} GB/shard vs {windows_gb_full:.2f} GB unsharded "
        f"| turns={len(ann.turns())}",
        flush=True,
    )
    return audio_s / wall


def bench_native_ahc(full: bool = False):
    """Measured on the bench host, round-3 rewrite (192-d unit vectors;
    runtime/native/sdtpu_native.cc header):
        N=2000:  native 0.26 s | scipy 0.92 s   (3.5x)
        N=10000: native 7.0 s  | scipy 10.8 s   (1.5x)
        N=20000: native 42 s   | scipy 40 s     (par)
    The rewritten native backend runs scipy's own fast_linkage recurrence
    with OpenMP-parallel pdist/update loops and exact scipy merge parity;
    clustering.ahc's "auto" therefore prefers native for centroid linkage
    at N >= 256 (below that, ctypes/setup overhead dominates and scipy
    wins). The default run keeps to N=2000; pass --full-ahc to re-measure
    everything."""
    from pyannote_audio_speaker_diarization_cpp_tpu.clustering import ahc

    rng = np.random.default_rng(0)
    print("\nAHC backends (centroid linkage, L2-normalized 192-d):")
    for n in (2000, 10000, 20000) if full else (2000,):
        x = rng.normal(size=(n, 192))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        rows = []
        for backend in ("native", "scipy", "numpy"):
            if backend == "numpy" and n > 2000:
                rows.append((backend, None))  # numpy is O(N^3)-ish: skip big N
                continue
            try:
                t0 = time.perf_counter()
                ahc.linkage(x, method="centroid", backend=backend)
                rows.append((backend, time.perf_counter() - t0))
            except Exception as e:
                rows.append((backend, f"fail: {e}"))
        msg = " | ".join(
            f"{b}: {t:.2f}s" if isinstance(t, float) else f"{b}: {t or 'skipped'}"
            for b, t in rows
        )
        print(f"  N={n:6d}: {msg}", flush=True)


def bench_streaming(minutes: float = 20.0, block_s: float = 1.0, schedule: str = "fixed"):
    """Simulated live stream: feed `block_s`-second blocks, report per-feed
    emission latency and the realtime factor.

    Uses the trained gate checkpoint when committed (real silences -> the
    round-5 frozen-prefix decode engages, like production audio would;
    random weights produce wall-to-wall activity, the decode's worst case),
    and reports latency percentiles split by emission type — incremental
    emissions (frozen-prefix suffix decode) vs full-recluster emissions."""
    from pyannote_audio_speaker_diarization_cpp_tpu.models import convert
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.streaming import (
        StreamingDiarizer,
    )

    data = wavio.read_wav(REFERENCE_WAV)
    base = (data.samples.mean(axis=0) / 32768.0).astype(np.float32)
    n = int(minutes * 60 * 16000)
    waveform = np.tile(base, int(np.ceil(n / len(base))))[:n]

    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "goldens",
        "gate_ckpt",
    )
    kwargs = {}
    if os.path.isdir(ckpt):
        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
            ),
        )
        from _cfg import SMALL_ECAPA, SMALL_PYANNET

        kwargs = dict(
            params=convert.load_checkpoint(ckpt),
            pyannet_cfg=SMALL_PYANNET,
            ecapa_cfg=SMALL_ECAPA,
        )
    pipeline = SpeakerDiarizationPipeline(seg_batch=32, emb_batch=32, **kwargs)
    stream = StreamingDiarizer(
        pipeline, emit_every=8, recluster_every=4, recluster_schedule=schedule
    )
    block = int(block_s * 16000)
    t0 = time.perf_counter()
    emissions = 0
    for i in range(0, len(waveform), block):
        if stream.feed(waveform[i : i + block]) is not None:
            emissions += 1
    stream.flush()
    wall = time.perf_counter() - t0
    lats = np.asarray(stream.feed_latencies)
    kinds = np.zeros(len(lats), bool)
    kinds[[e for e in stream.recluster_emissions if e < len(lats)]] = True
    inc, rec_ = lats[~kinds], lats[kinds]
    frozen = getattr(stream, "_seam_cidx", 0)
    print(
        f"\nstreaming ({'gate ckpt' if kwargs else 'random weights'}, "
        f"{schedule} reclusters x{len(rec_)}): "
        f"{minutes:.0f} min in {wall:.1f} s "
        f"({minutes*60/wall:.1f}x realtime) | {emissions} emissions | "
        f"all: mean {lats.mean()*1e3:.0f} / p95 "
        f"{np.percentile(lats, 95)*1e3:.0f} / max {lats.max()*1e3:.0f} ms | "
        f"incremental: mean {inc.mean()*1e3:.0f} / p95 "
        f"{np.percentile(inc, 95)*1e3:.0f} ms | recluster: mean "
        f"{rec_.mean()*1e3:.0f} / p95 {np.percentile(rec_, 95)*1e3:.0f} ms | "
        f"frozen frames {frozen}",
        flush=True,
    )
    # flat-p95 evidence: first vs last quarter of the stream's incremental
    # emissions
    q = max(len(inc) // 4, 1)
    print(
        f"  incremental p95 first-quarter {np.percentile(inc[:q], 95)*1e3:.0f} ms"
        f" vs last-quarter {np.percentile(inc[-q:], 95)*1e3:.0f} ms | "
        f"recluster first {np.percentile(rec_[:max(len(rec_)//4,1)], 95)*1e3:.0f}"
        f" vs last {np.percentile(rec_[-max(len(rec_)//4,1):], 95)*1e3:.0f} ms",
        flush=True,
    )


if __name__ == "__main__":
    if "--streaming" in sys.argv:
        i = sys.argv.index("--streaming")
        minutes = 20.0
        if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("--"):
            minutes = float(sys.argv[i + 1])
        sched = "doubling" if "--doubling" in sys.argv else "fixed"
        bench_streaming(minutes, schedule=sched)
        raise SystemExit(0)
    args = [a for a in sys.argv[1:] if a != "--full-ahc"]
    hours = float(args[0]) if args else 1.0
    shards = int(args[1]) if len(args) > 1 else 8
    bench_longform(hours, shards)
    bench_streaming()
    bench_native_ahc(full="--full-ahc" in sys.argv)
