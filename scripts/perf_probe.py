"""Perf probe: stage times vs (seg_batch, emb_batch) on the real chip.

Not part of the bench; a development tool for picking the default batch
lattice (reference fixes both at 32 — speakerDiarizer.cpp:1337,:1790 — but
nothing on TPU wants that number).
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

from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
    SpeakerDiarizationPipeline,
)
from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio

REFERENCE_WAV = "/root/reference/pipeline/data/multi-speaker_1min.wav"


def main():
    data = wavio.read_wav(REFERENCE_WAV)
    waveform = (data.samples.mean(axis=0) / 32768.0).astype(np.float32)
    audio_s = len(waveform) / data.sample_rate

    configs = [(32, 32), (128, 32), (128, 96), (64, 64), (128, 128)]
    if len(sys.argv) > 1:
        configs = []
        for pair in sys.argv[1:]:
            parts = pair.split("x")
            if len(parts) != 2 or not all(p.isdigit() and int(p) > 0 for p in parts):
                print(
                    f"bad config {pair!r}: expected SEGxEMB with positive ints, "
                    "e.g. 128x96",
                    file=sys.stderr,
                )
                return 1
            configs.append((int(parts[0]), int(parts[1])))

    for seg_b, emb_b in configs:
        p = SpeakerDiarizationPipeline(seg_batch=seg_b, emb_batch=emb_b)
        t0 = time.perf_counter()
        p(waveform)
        warm = time.perf_counter() - t0
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            ann = p(waveform)
            el = time.perf_counter() - t0
            if best is None or el < best:
                best, t = el, p.timings
                split = (t.segmentation, t.embedding, t.fetch, t.clustering)
        print(
            f"seg_batch={seg_b:4d} emb_batch={emb_b:4d} warm={warm:6.1f}s "
            f"run={best*1e3:7.1f}ms seg={split[0]*1e3:6.1f} emb={split[1]*1e3:6.1f} "
            f"fetch={split[2]*1e3:5.1f} clu={split[3]*1e3:5.1f} "
            f"-> {audio_s/best:7.1f} audio-s/s turns={len(ann.turns())}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
