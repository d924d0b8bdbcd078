"""TPU-native speaker-diarization framework.

A from-scratch JAX/XLA/Pallas re-design of the pyannote speaker-diarization
v2.x recipe, with the capabilities of the reference C++ pipeline
(leohuang2013/pyannote-audio_speaker-diarization_cpp) but an idiomatic TPU
architecture: batched jitted model forwards over 5 s sliding windows, a
GEMM-native STFT/fbank front-end, vectorized stage logic, and data-parallel
scaling over device meshes.
"""

__version__ = "0.1.0"

from .config import (
    ClusteringConfig,
    DiarizationConfig,
    EmbeddingConfig,
    FrontendConfig,
    SegmentationConfig,
    DEFAULT_CONFIG,
)
from .core.annotation import Annotation, Turn
from .core.segment import Segment
from .core.sliding_window import SlidingWindow, SlidingWindowFeature

__all__ = [
    "Annotation",
    "ClusteringConfig",
    "DEFAULT_CONFIG",
    "DiarizationConfig",
    "EmbeddingConfig",
    "FrontendConfig",
    "Segment",
    "SegmentationConfig",
    "SlidingWindow",
    "SlidingWindowFeature",
    "Turn",
]


def __getattr__(name):
    # Lazy imports for heavy submodules so `import
    # pyannote_audio_speaker_diarization_cpp_tpu` stays light.
    if name == "SpeakerDiarizationPipeline":
        from .pipelines.diarization import SpeakerDiarizationPipeline

        return SpeakerDiarizationPipeline
    raise AttributeError(name)
