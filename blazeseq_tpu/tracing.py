"""Lightweight tracing/profiling (aux subsystem; the reference has only
ad-hoc perf_counter timing, SURVEY.md §5 — this adds a first-class facility).

* `Tracer` — named wall-clock sections + counters with a report() summary;
  sections nest.
* `device_trace(dir)` — context manager around jax.profiler for TPU traces
  (open the output with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class Tracer:
    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)
        self.counters: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.times[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def count(self, name: str, n: int = 1) -> None:
        self.counters[name] += n

    def rate(self, name: str, bytes_processed: int) -> float:
        t = self.times.get(name, 0.0)
        return bytes_processed / t / 1e9 if t else 0.0

    def report(self) -> str:
        lines = ["== trace report =="]
        total = sum(self.times.values())
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            lines.append("%-28s %8.3fs %5.1f%% (%d calls)"
                         % (name, t, 100 * t / total if total else 0,
                            self.calls[name]))
        for name, v in sorted(self.counters.items()):
            lines.append("%-28s %d" % (name, v))
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(trace_dir: str = "/tmp/blazeseq_trace"):
    """Capture a jax.profiler device trace around the enclosed block."""
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()


_GLOBAL = Tracer()


def global_tracer() -> Tracer:
    return _GLOBAL
