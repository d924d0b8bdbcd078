"""Device-time / transfer / MFU profile of the pipeline stages on the real
chip (VERDICT r2 item 2; the TPU equivalent of the reference's per-stage
timers, reference README.md:104-110, SURVEY.md §5.1).

Separates, per stage:
  - dispatch overhead (async call returns before compute)
  - amortized device compute (N back-to-back dispatches / N)
  - XLA flop count (compiled cost_analysis) -> MFU vs the chip's bf16 peak
and probes d2h transfer latency/bandwidth at several sizes (the remote
tunnel pays a round trip per fetch).

Usage: python scripts/profile_device.py [N_REPEAT]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyannote_audio_speaker_diarization_cpp_tpu.io import wav as wavio
from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
    SpeakerDiarizationPipeline,
)

REFERENCE_WAV = "/root/reference/pipeline/data/multi-speaker_1min.wav"

# TPU v5e: 197 TFLOP/s bf16, 98.5 TFLOP/s f32 (public spec)
PEAK_BF16 = 197e12


def flops_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    data = wavio.read_wav(REFERENCE_WAV)
    waveform = (data.samples.mean(axis=0) / 32768.0).astype(np.float32)
    audio_s = len(waveform) / data.sample_rate
    print(f"audio: {audio_s:.1f}s, backend: {jax.default_backend()}")

    p = SpeakerDiarizationPipeline(seg_batch=32, emb_batch=32)
    seg_cfg = p.config.segmentation

    # rebuild the exact __call__ inputs
    from pyannote_audio_speaker_diarization_cpp_tpu.ops import windows as win
    from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as pm

    num_samples = waveform.shape[0]
    num_chunks = win.chunk_count(num_samples, seg_cfg.window_size, seg_cfg.step_size)
    num_padded = p.chunk_lattice(num_chunks)
    needed = (num_padded - 1) * seg_cfg.step_size + seg_cfg.window_size
    wav_padded = np.zeros(needed, dtype=np.float32)
    wav_padded[:num_samples] = waveform
    wav_i16 = (wav_padded * 32768.0).astype(np.int16)
    valid_frames = np.zeros(num_padded, np.int32)
    valid_frames[:num_chunks] = seg_cfg.num_frames
    valid_samples = np.zeros(num_padded, np.int32)
    valid_samples[:num_chunks] = seg_cfg.window_size
    orphan = num_samples - (num_chunks - 1) * seg_cfg.step_size
    if orphan < seg_cfg.window_size:
        valid_frames[num_chunks - 1] = pm.pyannet_num_frames(orphan, p.pyannet_cfg)
        valid_samples[num_chunks - 1] = orphan
    wav_dev = jax.device_put(jnp.asarray(wav_i16))
    vf_dev = jax.device_put(jnp.asarray(valid_frames))
    vs_dev = jax.device_put(jnp.asarray(valid_samples))
    seg_params = p.params["segmentation"]
    emb_params = p.params["embedding"]

    # ---- h2d ----
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(wav_i16))
    h2d = time.perf_counter() - t0
    print(
        f"h2d wav int16: {wav_i16.nbytes/1024:.0f} KB in {h2d*1e3:.1f} ms "
        f"({wav_i16.nbytes/h2d/1e6:.1f} MB/s)"
    )

    # ---- stage 1 ----
    out1 = p._stage1(seg_params, wav_dev, vf_dev, vs_dev)
    jax.block_until_ready(out1)
    t0 = time.perf_counter()
    out1 = p._stage1(seg_params, wav_dev, vf_dev, vs_dev)
    t_disp = time.perf_counter() - t0
    jax.block_until_ready(out1)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out1 = p._stage1(seg_params, wav_dev, vf_dev, vs_dev)
    jax.block_until_ready(out1)
    t_many = (time.perf_counter() - t0) / n_rep
    c1 = p._stage1.lower(seg_params, wav_dev, vf_dev, vs_dev).compile()
    f1 = flops_of(c1)
    print(
        f"stage1 (PyanNet {num_padded}x80000): dispatch {t_disp*1e3:.1f} ms, "
        f"single {t_one*1e3:.1f} ms, amortized {t_many*1e3:.1f} ms, "
        f"flops {f1/1e9:.1f} G -> {f1/t_many/1e12:.2f} TFLOP/s "
        f"= {f1/t_many/PEAK_BF16*100:.1f}% MFU(bf16 peak)"
    )

    # ---- stage 2 ----
    chosen = out1[2]
    out2 = p._stage2(emb_params, wav_dev, chosen)
    jax.block_until_ready(out2)
    t0 = time.perf_counter()
    out2 = p._stage2(emb_params, wav_dev, chosen)
    t_disp2 = time.perf_counter() - t0
    jax.block_until_ready(out2)
    t_one2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out2 = p._stage2(emb_params, wav_dev, chosen)
    jax.block_until_ready(out2)
    t_many2 = (time.perf_counter() - t0) / n_rep
    c2 = p._stage2.lower(emb_params, wav_dev, chosen).compile()
    f2 = flops_of(c2)
    rows = num_padded * seg_cfg.num_speakers
    print(
        f"stage2 (pack+frontend+ECAPA {rows}x80000): dispatch {t_disp2*1e3:.1f} ms, "
        f"single {t_one2*1e3:.1f} ms, amortized {t_many2*1e3:.1f} ms, "
        f"flops {f2/1e9:.1f} G -> {f2/t_many2/1e12:.2f} TFLOP/s "
        f"= {f2/t_many2/PEAK_BF16*100:.1f}% MFU(bf16 peak)"
    )

    # ---- d2h probe ----
    for kb in (4, 64, 256, 1024, 4096):
        arr = jax.device_put(jnp.zeros(kb * 256, jnp.float32))  # kb KB
        jax.block_until_ready(arr)
        best = min(
            _timed(lambda: jax.device_get(arr)) for _ in range(5)
        )
        print(
            f"d2h {kb:5d} KB: {best*1e3:7.2f} ms ({kb/1024/best:7.1f} MB/s)"
        )

    # ---- serial pipeline budget ----
    print(
        f"serial budget: s1 {t_many*1e3:.1f} + s2 {t_many2*1e3:.1f} = "
        f"{(t_many+t_many2)*1e3:.1f} ms device compute for {audio_s:.1f}s audio "
        f"-> compute-only ceiling {audio_s/(t_many+t_many2):.0f} audio-s/s"
    )


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
