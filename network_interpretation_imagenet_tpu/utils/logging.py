"""Structured logging + phase timers + profiler hooks.

The reference's observability is bare ``print`` plus un-logged wall-clock
deltas (``bayesian_active_learning_imagenet.py:382,488-490``). Here every
phase emits one JSON line (machine-parseable) and phases nest; an optional
``jax.profiler`` trace wraps any phase for XLA-level analysis (SURVEY.md §5
tracing plan).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Any, Dict, Optional


class PhaseLogger:
    """JSON-line logger with nested phase timing.

    >>> log = PhaseLogger()
    >>> with log.phase("segment", image=3):
    ...     pass
    emits {"phase": "segment", "image": 3, "seconds": ...}
    """

    def __init__(self, stream=None, enabled: bool = True):
        self.stream = stream or sys.stderr
        self.enabled = enabled
        self._stack = []

    def emit(self, record: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        self.stream.write(json.dumps(record, default=str) + "\n")
        self.stream.flush()

    @contextlib.contextmanager
    def phase(self, name: str, **fields):
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            self.emit(
                {
                    "phase": ".".join(self._stack + [name]) if self._stack else name,
                    "seconds": round(dt, 6),
                    **fields,
                }
            )

    def metric(self, name: str, value: float, **fields) -> None:
        self.emit({"metric": name, "value": value, **fields})


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Wrap a block in a jax.profiler trace when ``log_dir`` is given."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
