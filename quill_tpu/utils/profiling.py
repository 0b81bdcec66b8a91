"""Phase timing / metrics collection (SURVEY §5: the reference has no
tracing or metrics; this is the TPU build's observability layer).

Usage:
    from quill_tpu.utils.profiling import metrics, phase
    with phase("commit/witness"):
        ...
    print(metrics.report())

`jax.profiler` traces can be captured around any phase by setting
QUILL_TRACE_DIR (the trace covers device execution; phases are host spans).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict

logger = logging.getLogger("quill_tpu")


class Metrics:
    def __init__(self):
        self.times: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    def add(self, name: str, seconds: float) -> None:
        self.times[name] += seconds
        self.counts[name] += 1

    def incr(self, name: str, n: int = 1) -> None:
        self.counts[name] += n

    def reset(self) -> None:
        self.times.clear()
        self.counts.clear()

    def report(self) -> dict:
        return {
            name: {"total_sec": round(t, 4), "count": self.counts[name]}
            for name, t in sorted(self.times.items())
        }


metrics = Metrics()


@contextlib.contextmanager
def phase(name: str):
    trace_dir = os.environ.get("QUILL_TRACE_DIR")
    tracing = False
    if trace_dir:
        try:
            import jax

            jax.profiler.start_trace(os.path.join(trace_dir, name.replace("/", "_")))
            tracing = True
        except Exception:
            pass
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        metrics.add(name, dt)
        logger.debug("phase %s: %.4fs", name, dt)
        if tracing:
            try:
                import jax

                jax.profiler.stop_trace()
            except Exception:
                pass
