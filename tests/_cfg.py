"""Shared test configurations.

One tiny 1-second-window pipeline configuration (with SMALL model
architectures) is reused across every e2e test module. Pipelines built with
IDENTICAL static configuration share compiled stages within the process
(pipelines/diarization.py _STEP_CACHE), so the whole suite pays the stage
compiles once.
"""

from pyannote_audio_speaker_diarization_cpp_tpu.config import (
    DiarizationConfig,
    SegmentationConfig,
)
from pyannote_audio_speaker_diarization_cpp_tpu.models.ecapa import EcapaConfig
from pyannote_audio_speaker_diarization_cpp_tpu.models.pyannet import (
    PyanNetConfig,
    pyannet_num_frames,
)

# small model architectures: the pipeline-logic tests pin pipeline numerics,
# not model scale (model-scale parity lives in test_models.py /
# test_convert_real_scale.py)
SMALL_PYANNET = PyanNetConfig(
    num_filters=32, conv_channels=16, lstm_hidden=16, lstm_layers=2, linear_hidden=16
)
SMALL_ECAPA = EcapaConfig(
    in_channels=80,
    channels=(64, 64, 64, 64, 128),
    attention_channels=16,
    se_channels=16,
    emb_dim=32,
)

# 1 s / 0.5 s windows: every sliding-window/orphan/bucket edge case at 1/5th
# the samples of the real recipe
TINY1S_CFG = DiarizationConfig(
    segmentation=SegmentationConfig(
        duration=1.0, step=0.5, batch_size=8, num_frames=pyannet_num_frames(16000)
    ),
    chunk_bucket=8,
)


def make_tiny1s_pipeline(seed: int = 0, **kwargs):
    from pyannote_audio_speaker_diarization_cpp_tpu.pipelines.diarization import (
        SpeakerDiarizationPipeline,
    )

    kwargs.setdefault("seg_batch", 8)
    kwargs.setdefault("emb_batch", 8)
    return SpeakerDiarizationPipeline(
        TINY1S_CFG,
        seed=seed,
        pyannet_cfg=SMALL_PYANNET,
        ecapa_cfg=SMALL_ECAPA,
        **kwargs,
    )
