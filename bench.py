"""Benchmark: full-pipeline diarization throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio-seconds/s", "vs_baseline": N}

Baseline: the reference C++ pipeline diarizes its bundled test wav
(59 s of 16 kHz mono audio) in 356 s on a 2070S GPU + 16-thread CPU
(reference README.md:104-110) — 0.166 audio-seconds/s. vs_baseline is the
speedup over that.
"""

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: the heavy PyanNet/ECAPA compiles happen
# once per machine, not once per process
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_WAV = "/root/reference/pipeline/data/multi-speaker_1min.wav"
BASELINE_WALL_S = 356.0


def load_audio():
    from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio

    if os.path.exists(REFERENCE_WAV):
        data = wavio.read_wav(REFERENCE_WAV)
        waveform = (data.samples.mean(axis=0) / 32768.0).astype(np.float32)
        return waveform, data.sample_rate
    # fallback: synthesize an equivalent-length waveform
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(59 * sr) / sr
    x = 0.1 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.normal(size=t.shape)
    return x.astype(np.float32), sr


def main():
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
        SpeakerDiarizationPipeline,
    )

    waveform, sr = load_audio()
    audio_seconds = len(waveform) / sr

    pipeline = SpeakerDiarizationPipeline(seg_batch=32, emb_batch=32)

    # warm-up: compile every jitted step at the shapes this wav produces
    t0 = time.perf_counter()
    pipeline(waveform)
    warm = time.perf_counter() - t0

    # timed run
    t0 = time.perf_counter()
    annotation = pipeline(waveform)
    elapsed = time.perf_counter() - t0

    value = audio_seconds / elapsed
    baseline = audio_seconds / BASELINE_WALL_S
    t = pipeline.timings
    print(
        f"# audio={audio_seconds:.1f}s warm={warm:.1f}s run={elapsed:.3f}s "
        f"(seg={t.segmentation:.3f}s emb={t.embedding:.3f}s "
        f"clu={t.clustering:.3f}s) turns={len(annotation.turns())}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "full-pipeline diarization throughput (1 chip)",
                "value": round(value, 2),
                "unit": "audio-seconds/s",
                "vs_baseline": round(value / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
