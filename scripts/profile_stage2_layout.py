"""Stage-2 ECAPA trunk layout experiment (VERDICT r4 item 2): measure the
full jit_stage2 dispatch device time with the trunk in NCH
(channels-second, the round-1..4 formulation) vs NHC (whole-trunk
channels-last / time-major, no entry transpose, time reductions over the
major axis) on the reference wav.

Usage: python scripts/profile_stage2_layout.py
"""

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio
from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
    SpeakerDiarizationPipeline,
)

REFERENCE_WAV = "/root/reference/pipeline/data/multi-speaker_1min.wav"


def stage2_device_ms(pipeline, waveform, n=3):
    """Trace n back-to-back full-pipeline runs; return per-run stage-2
    device ms (TPU-side total of the jit_stage2 program)."""
    tmp = tempfile.mkdtemp(prefix="s2trace")
    try:
        pipeline(waveform)  # warm / compile
        jax.profiler.start_trace(tmp)
        for _ in range(n):
            pipeline(waveform)
        jax.profiler.stop_trace()
        traces = sorted(glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz"))
        with gzip.open(traces[-1]) as f:
            tr = json.load(f)
        ev = tr["traceEvents"]
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        tot = 0.0
        for e in ev:
            if e.get("ph") != "X":
                continue
            if not pids.get(e["pid"], "").startswith("/device:TPU"):
                continue
            if e["name"].startswith("jit_stage2"):
                tot += e["dur"]
        return tot / 1e3 / n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    data = wavio.read_wav(REFERENCE_WAV)
    waveform = (data.samples.mean(axis=0) / 32768.0).astype(np.float32)
    print(f"backend: {jax.default_backend()}")
    for layout in ("nch", "nhc", "gemm"):
        p = SpeakerDiarizationPipeline(
            seg_batch=32, emb_batch=32, ecapa_layout=layout
        )
        ms = stage2_device_ms(p, waveform)
        print(f"stage-2 device time, layout={layout}: {ms:.1f} ms")


if __name__ == "__main__":
    main()
