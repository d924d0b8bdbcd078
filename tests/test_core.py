"""Core types: Segment, SlidingWindow, Annotation."""

import os

import numpy as np
import pytest

from pyannote_audio_speaker_diarization_cpp_tpu.core.annotation import Annotation
from pyannote_audio_speaker_diarization_cpp_tpu.core.segment import Segment
from pyannote_audio_speaker_diarization_cpp_tpu.core.sliding_window import (
    SlidingWindow,
    num_chunks_for_samples,
)


def test_segment_basic():
    s = Segment(1.0, 2.5)
    assert s.duration == 1.5
    assert s.middle == 1.75
    assert bool(s)
    assert not bool(Segment(2.0, 2.0))


def test_segment_gap_and_merge():
    a, b = Segment(0.0, 1.0), Segment(1.5, 2.0)
    assert a.gap(b) == pytest.approx(0.5)
    assert b.gap(a) == pytest.approx(0.5)
    # overlapping -> negative gap
    c = Segment(0.5, 1.2)
    assert a.gap(c) < 0
    assert a.merge(b) == Segment(0.0, 2.0)


def test_segment_intersection():
    assert (Segment(0, 2) & Segment(1, 3)) == Segment(1, 2)


def test_closest_frame_matches_reference_golden_file():
    """10 000 (frame, time) pairs produced by the pyannote original
    (reference pipeline/src/test/closest_frame.txt, used by test() at
    speakerDiarizer.cpp:3236-3277)."""
    path = "/root/reference/pipeline/src/test/closest_frame.txt"
    if not os.path.exists(path):
        pytest.skip("golden file unavailable")
    # The C++ test uses the segmentation model frame grid and steps time by
    # 0.5 s. Recover (start, step, duration) convention from the C++ harness:
    # SlidingWindow(0.0, 0.016875, 0.016875) with t = i * 0.5.
    sw = SlidingWindow(start=0.0, step=0.016875, duration=0.016875)
    with open(path) as f:
        lines = [line.strip() for line in f if line.strip()]
    checked = 0
    for i, line in enumerate(lines):
        frame_s, time_s = line.split(",")[:2]
        expected, t = int(frame_s), float(time_s)
        assert sw.closest_frame(t) == expected, (i, t)
        checked += 1
    assert checked == len(lines) and checked > 0


def test_closest_frame_bankers_rounding():
    sw = SlidingWindow(start=0.0, step=1.0, duration=1.0)
    # (t - 0.5) lands exactly on .5 -> round half to even
    assert sw.closest_frame(1.0) == 0  # 0.5 -> 0
    assert sw.closest_frame(2.0) == 2  # 1.5 -> 2
    assert sw.closest_frame(0.0) == 0  # clamped negative


def test_num_chunks():
    # exact multiple: no orphan
    n, has_last = num_chunks_for_samples(96000, 80000, 8000)
    assert (n, has_last) == (3, False)
    # remainder: orphan
    n, has_last = num_chunks_for_samples(100000, 80000, 8000)
    assert (n, has_last) == (3, True)
    # shorter than window
    n, has_last = num_chunks_for_samples(1000, 80000, 8000)
    assert (n, has_last) == (0, True)


def test_chunk_segments_counts():
    for num_samples in [96000, 100000, 944019, 80000]:
        sw = SlidingWindow(0.0, 0.5, 5.0, num_samples=num_samples)
        n, has_last = num_chunks_for_samples(num_samples, 80000, 8000)
        total = n + (1 if has_last else 0)
        assert len(sw.chunk_segments()) == total


def test_annotation_support_merges_gaps():
    ann = Annotation()
    ann.add(0.0, 1.0, 0)
    ann.add(1.2, 2.0, 0)
    ann.add(5.0, 6.0, 0)
    out = ann.support(0.5)
    segs = out.segments(0)
    assert segs == [Segment(0.0, 2.0), Segment(5.0, 6.0)]


def test_annotation_support_merges_overlap():
    ann = Annotation()
    ann.add(0.0, 1.0, 1)
    ann.add(0.5, 1.5, 1)
    out = ann.support(0.0)
    assert out.segments(1) == [Segment(0.0, 1.5)]


def test_annotation_remove_short():
    ann = Annotation()
    ann.add(0.0, 0.1, 0)
    ann.add(1.0, 3.0, 0)
    out = ann.remove_short(0.5)
    assert out.segments(0) == [Segment(1.0, 3.0)]


def test_annotation_turns_sorted_and_rttm_roundtrip():
    ann = Annotation()
    ann.add(2.0, 3.0, 1)
    ann.add(0.0, 1.0, 0)
    turns = ann.turns()
    assert [t.label for t in turns] == [0, 1]
    rt = ann.to_rttm("test")
    back = Annotation.from_rttm(rt)
    assert [(t.start, t.end, t.label) for t in back.turns()] == [
        (t.start, t.end, t.label) for t in turns
    ]


def test_crop_range_extent():
    sw = SlidingWindow(0.0, 0.016875, 0.016875)
    i, j = sw.crop_range(Segment(0.0, 1.0))
    assert i == 0
    assert j == int(np.floor(1.0 / 0.016875)) + 1
