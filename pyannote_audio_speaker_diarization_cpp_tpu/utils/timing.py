"""Stage timers and profiler hooks.

The reference's only observability is wall-clock couts around each stage
(reference pipeline/src/speakerDiarizer.cpp:48-60, :3028/:3110/:3231;
SURVEY.md section 5.1). Here: reusable timers that block on device work, and
a context manager around the JAX profiler for real xprof traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulating named wall-clock timers that fence device work."""

    def __init__(self) -> None:
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        """Times a block; yields a one-slot list — append device values to
        fence them before the timer stops:

            with timer.time("seg") as fence:
                out = model(x)
                fence.append(out)
        """
        fence: list = []
        t0 = time.perf_counter()
        try:
            yield fence
        finally:
            if fence:
                jax.block_until_ready(fence)
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v*1000:.1f}ms" for k, v in self.times.items()]
        lines.append(f"total: {total*1000:.1f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def xprof_trace(log_dir: Optional[str] = None):
    """Capture a JAX profiler trace (view with xprof/tensorboard)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def realtime_factor(audio_seconds: float, wall_seconds: float) -> float:
    """audio-seconds processed per wall-clock second."""
    return audio_seconds / wall_seconds if wall_seconds > 0 else float("inf")
