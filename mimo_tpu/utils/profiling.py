"""Observability: stage timers + JAX profiler traces + structured logging.

The reference has no tracing/profiling at all — progress is tqdm bars and
wall-clock prints (SURVEY.md §5: pipeline...roiclip.py:463,
video_decomp/run.py:938,1014,1025,1036). This module is the first-class
replacement: hierarchical stage timers with one-line JSON reporting, and
XLA/xplane trace capture via jax.profiler for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax

logger = logging.getLogger("mimo_tpu")


@dataclass
class StageTimer:
    """Hierarchical wall-clock stage timing.

    with timer.stage("denoise"):
        ...
    print(timer.report())
    """

    records: List[Dict[str, Any]] = field(default_factory=list)
    _stack: List[str] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        """Time a stage; pass a jax array (or pytree) as `sync` to include
        device execution (block_until_ready) in the measurement."""
        path = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self._stack.pop()
            self.records.append({"stage": path, "seconds": round(dt, 4)})
            logger.info("stage %s: %.3fs", path, dt)

    def report(self) -> str:
        return json.dumps(self.records)

    def total(self, prefix: str = "") -> float:
        return sum(r["seconds"] for r in self.records
                   if r["stage"].startswith(prefix))


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA/xplane profile (open with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def log_compile_options() -> Dict[str, Any]:
    """Environment snapshot useful when filing performance reports."""
    return {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "jax_version": jax.__version__,
    }
