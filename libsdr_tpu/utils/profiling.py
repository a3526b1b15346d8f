"""Tracing / profiling helpers (SURVEY.md §5: the reference has only debug
logs and an unused CpuTime clock; here the JAX/XLA profiler plus per-block
throughput counters are first-class).

- :func:`trace` wraps ``jax.profiler.trace`` — produces a TensorBoard
  xplane/trace.json profile of every XLA program launched inside.
- :class:`StageTimer` is the quick host-side alternative: wall-time per
  named region with forced device sync at the region ends.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile everything inside the block into ``log_dir`` (TensorBoard
    format: xplane.pb + trace.json.gz)."""
    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Accumulating wall-clock timer with device synchronization.

    The region yields a ``sync`` callable; register the values produced
    inside so the timer blocks on them before recording (JAX dispatch is
    asynchronous — without the sync only dispatch latency would be timed):

    >>> t = StageTimer()
    >>> with t.region("fir") as sync:
    ...     y = step(c, x)
    ...     sync(y)
    >>> t.report()
    {'fir': {'calls': 1, 'total_s': ...}}
    """

    def __init__(self) -> None:
        self._acc: Dict[str, tuple] = {}

    @contextlib.contextmanager
    def region(self, name: str):
        pending: list = []
        t0 = time.perf_counter()
        try:
            yield pending.append
        finally:
            for v in pending:
                jax.block_until_ready(v)
            dt = time.perf_counter() - t0
            calls, total = self._acc.get(name, (0, 0.0))
            self._acc[name] = (calls + 1, total + dt)

    def report(self) -> Dict[str, dict]:
        return {k: {"calls": c, "total_s": round(s, 6)}
                for k, (c, s) in self._acc.items()}
