"""Profiling hooks (SURVEY.md §5.1).

The reference only keeps wall-clock A/U timers; here each phase can
additionally emit a jax.profiler trace (TensorBoard-viewable) and
named annotations around the hot steps.
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a device trace for the enclosed block. No-op when
    log_dir is None and MIVOS_TRACE_DIR is unset."""
    log_dir = log_dir or os.environ.get("MIVOS_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named TraceAnnotation context for phase attribution inside a
    trace (safe no-op if the profiler is inactive)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
