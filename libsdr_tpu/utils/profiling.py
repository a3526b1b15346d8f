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

    >>> t = StageTimer()
    >>> with t.region("fir"):
    ...     y = step(c, x)
    >>> t.report()
    {'fir': {'calls': 1, 'total_s': ...}}
    """

    def __init__(self) -> None:
        self._acc: Dict[str, list] = {}

    @contextlib.contextmanager
    def region(self, name: str, sync_on: Optional[object] = None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - t0
        calls, total = self._acc.get(name, (0, 0.0))
        self._acc[name] = (calls + 1, total + dt)

    def report(self) -> Dict[str, dict]:
        return {k: {"calls": c, "total_s": round(s, 6)}
                for k, (c, s) in self._acc.items()}
