"""Profiling & tracing helpers.

The reference's observability is wall-clock timers around Arnoldi iterations
and time steps (core/krylov_decomposition.f:77-99, core/usr_extra.f:317-351).
TPU-native: jax.profiler traces (viewable in Perfetto/TensorBoard) around any
pipeline stage, plus a lightweight named-timer registry for host-side stage
accounting (matvec/s, orthogonalization share, dense-eig share...).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace around a code block:

        with device_trace("/tmp/nekstab_trace"):
            ks = krylov_schur(space, v0, acfg)

    Open the dump with TensorBoard (profile plugin) or Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the device trace timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimers:
    """Host-side named accumulating timers.

        timers = StageTimers()
        with timers("matvec"):
            ...
        print(timers.report())
    """

    def __init__(self):
        self.acc = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] += time.perf_counter() - t0
            self.count[name] += 1

    def report(self) -> str:
        total = sum(self.acc.values()) or 1.0
        lines = [f"{'stage':<24}{'calls':>8}{'total_s':>12}{'mean_ms':>12}"
                 f"{'share':>8}"]
        for k in sorted(self.acc, key=lambda k: -self.acc[k]):
            t, c = self.acc[k], self.count[k]
            lines.append(f"{k:<24}{c:>8}{t:>12.3f}{1e3 * t / c:>12.2f}"
                         f"{100 * t / total:>7.1f}%")
        return "\n".join(lines)
