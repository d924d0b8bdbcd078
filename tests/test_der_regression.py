"""Measured-DER regression against a committed golden RTTM.

BASELINE.md's accuracy target is DER parity with pyannote-audio. Until real
converted weights are available, this pins the END-TO-END accuracy path the
same way the reference pins its tensors: the seed-0 small5s pipeline (shared
session fixture, tests/conftest.py) diarizes the reference wav, and the
resulting turns must score DER == 0 against the committed golden RTTM
(tests/goldens/reference_wav_seed0_small.rttm). Any regression anywhere in
the pipeline that moves a turn boundary shows up as a nonzero DER here.

Regenerate after an intentional change with GOLDEN_REGEN=1.

The one-command path for real-weights accuracy measurement:

    python -m pyannote_audio_speaker_diarization_cpp_tpu.cli audio.wav \
        --checkpoint weights/ --rttm hyp.rttm
    python -m pyannote_audio_speaker_diarization_cpp_tpu.metrics.der \
        pyannote_reference.rttm hyp.rttm --collar 0.25
"""

import os

import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.core.annotation import Annotation
from pyannote_audio_speaker_diarization_cpp_tpu.metrics.der import (
    der,
    diarization_error_rate,
)

GOLDEN_RTTM = os.path.join(
    os.path.dirname(__file__), "goldens", "reference_wav_seed0_small.rttm"
)


@pytest.fixture(scope="module")
def hypothesis(small5s_pipeline, reference_wav_path):
    return small5s_pipeline(reference_wav_path)


def test_der_zero_against_golden_rttm(hypothesis):
    if os.environ.get("GOLDEN_REGEN") or not os.path.exists(GOLDEN_RTTM):
        os.makedirs(os.path.dirname(GOLDEN_RTTM), exist_ok=True)
        with open(GOLDEN_RTTM, "w") as f:
            f.write(hypothesis.to_rttm("multi-speaker_1min"))
        pytest.skip(f"golden RTTM (re)generated at {GOLDEN_RTTM}")
    golden = Annotation.from_rttm(open(GOLDEN_RTTM).read())
    # compare through the same serialization the golden went through, so the
    # only possible deviation is a real pipeline change (not float printing)
    roundtripped = Annotation.from_rttm(hypothesis.to_rttm("multi-speaker_1min"))
    comps = diarization_error_rate(golden, roundtripped)
    assert comps.der == 0.0, (
        f"DER={comps.der:.4f} vs golden (missed={comps.missed:.3f}s "
        f"fa={comps.false_alarm:.3f}s conf={comps.confusion:.3f}s)"
    )


def test_rttm_roundtrip_preserves_der(hypothesis):
    """to_rttm -> from_rttm is DER-lossless to microsecond serialization."""
    text = hypothesis.to_rttm("x")
    parsed = Annotation.from_rttm(text)
    assert der(hypothesis, parsed) < 1e-6


def test_der_cli_entry(tmp_path, hypothesis, capsys):
    from pyannote_audio_speaker_diarization_cpp_tpu.metrics import der as der_mod

    ref = tmp_path / "ref.rttm"
    hyp = tmp_path / "hyp.rttm"
    ref.write_text(hypothesis.to_rttm("a"))
    hyp.write_text(hypothesis.to_rttm("a"))
    assert der_mod.main([str(ref), str(hyp)]) == 0
    out = capsys.readouterr().out
    assert out.startswith("DER=0.0000")
