"""Structured logging, metrics, and profiling.

The reference's observability is unconditional stderr chatter compiled in
via -DDEBUG (reference makefile:18; e.g. starch3api.hpp:188,336,359,383).
The rebuild provides: leveled structured logging (quiet by default), named
profiling scopes that forward to ``jax.profiler``/``jax.named_scope`` on
the device path, and per-stage throughput counters that feed bench.py.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from collections import defaultdict

logger = logging.getLogger("starch3_tpu")
if os.environ.get("STARCH3_TPU_DEBUG"):
    logging.basicConfig(level=logging.DEBUG)


class StageTimer:
    """Accumulates wall-time and bytes per pipeline stage."""

    def __init__(self) -> None:
        self.seconds: dict[str, float] = defaultdict(float)
        self.bytes: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        t0 = time.perf_counter()
        try:
            with _named_scope(name):
                yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            self.bytes[name] += nbytes

    def report(self) -> dict:
        out = {}
        for k, s in sorted(self.seconds.items()):
            out[k] = {
                "seconds": round(s, 4),
                "bytes": self.bytes[k],
                "mb_per_s": round(self.bytes[k] / s / 1e6, 2) if s else None,
            }
        return out

    def log(self) -> None:
        logger.info("stage report: %s", json.dumps(self.report()))


@contextlib.contextmanager
def _named_scope(name: str):
    # the guarded part is acquiring the scope, never the caller's body —
    # wrapping the yield in try/except would swallow exceptions thrown
    # into the generator and yield twice
    import sys

    try:
        import jax

        scope = jax.named_scope(name)
        scope.__enter__()  # guard enter, never the body
    except Exception:
        yield
        return
    try:
        yield
    except BaseException:
        if not scope.__exit__(*sys.exc_info()):
            raise
    else:
        scope.__exit__(None, None, None)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace wrapper (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
