"""Command-line entry point.

Reference: ``./speakerDiarizer <segment.onnx> <embedding.onnx> <wav>``
(pipeline/src/speakerDiarizer.cpp:3415-3442) printing
``[start -- end] --> Speaker_k`` lines plus per-stage timings. Here model
weights live in a single checkpoint directory (or default to random weights
for smoke runs), and audio of any rate/channels is accepted.

    python -m pyannote_audio_speaker_diarization_cpp_tpu.cli audio.wav \
        [--checkpoint DIR] [--num-speakers N] [--rttm out.rttm]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native speaker diarization")
    parser.add_argument(
        "wav", nargs="+", help="input audio (RIFF wav); several files run PIPELINED"
    )
    parser.add_argument(
        "--checkpoint",
        default=None,
        help="weights artifact: converted .npz directory, pyannote Lightning "
        ".ckpt/.bin, speechbrain savedir (embedding_model.ckpt), ONNX blob "
        "(segment2.onnx/emd4.onnx layout), or a directory holding any mix",
    )
    parser.add_argument(
        "--seg-model",
        default=None,
        help="segmentation weights only (.ckpt/.bin/.onnx), overrides --checkpoint",
    )
    parser.add_argument(
        "--emb-model",
        default=None,
        help="embedding weights only (.ckpt/.onnx/savedir), overrides --checkpoint",
    )
    parser.add_argument("--num-speakers", type=int, default=None)
    parser.add_argument("--min-speakers", type=int, default=None)
    parser.add_argument("--max-speakers", type=int, default=None)
    parser.add_argument("--rttm", default=None, help="write RTTM to this path")
    parser.add_argument("--seg-batch", type=int, default=None)
    parser.add_argument("--emb-batch", type=int, default=None)
    args = parser.parse_args(argv)

    import os

    import jax

    # persistent XLA compilation cache next to the package
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from .pipelines.diarization import SpeakerDiarizationPipeline

    params = None
    if args.checkpoint:
        from .models.ingest import load_params_auto

        params = load_params_auto(args.checkpoint)
    if args.seg_model or args.emb_model:
        from .models.ingest import load_params_auto

        params = dict(params or {})
        if args.seg_model:
            params["segmentation"] = load_params_auto(args.seg_model)["segmentation"]
        if args.emb_model:
            params["embedding"] = load_params_auto(args.emb_model)["embedding"]
    if params is not None and (
        "segmentation" not in params or "embedding" not in params
    ):
        # partial artifact: fill the other model with seed-0 weights, and
        # say so — a silently random model makes the output meaningless
        missing = [k for k in ("segmentation", "embedding") if k not in params]
        print(
            f"warning: no {' or '.join(missing)} weights in the given "
            "artifact(s); filling with RANDOM (seed-0) weights — the "
            "diarization will not be meaningful",
            file=sys.stderr,
        )
        from .models.convert import random_params

        params = {**random_params(0), **params}

    t0 = time.perf_counter()
    pipeline = SpeakerDiarizationPipeline(
        params=params, seg_batch=args.seg_batch, emb_batch=args.emb_batch
    )
    bounds = dict(
        num_speakers=args.num_speakers,
        min_speakers=args.min_speakers,
        max_speakers=args.max_speakers,
    )
    if len(args.wav) == 1:
        annotations = [pipeline(args.wav[0], **bounds)]
    else:
        # several files: dispatch all before collecting (pipeline.map) —
        # one file's transfers overlap the others' device compute
        annotations = pipeline.map(args.wav, **bounds)
    total = time.perf_counter() - t0

    for path, annotation in zip(args.wav, annotations):
        if len(args.wav) > 1:
            print(f"== {path}")
        for turn in annotation.turns():
            print(f"[{turn.start:.3f} -- {turn.end:.3f}] --> Speaker_{turn.label}")
    t = pipeline.timings
    print("-----------", file=sys.stderr)
    print(f"Segmentation time: {t.segmentation*1000:.0f}ms", file=sys.stderr)
    print(f"Embedding time: {t.embedding*1000:.0f}ms", file=sys.stderr)
    print(f"Fetch time: {t.fetch*1000:.0f}ms", file=sys.stderr)
    print(f"Clustering time: {t.clustering*1000:.0f}ms", file=sys.stderr)
    print(f"Total time: {total*1000:.0f}ms", file=sys.stderr)

    if args.rttm:
        with open(args.rttm, "w") as f:
            for path, annotation in zip(args.wav, annotations):
                f.write(annotation.to_rttm(path) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
