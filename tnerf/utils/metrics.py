"""Metrics / logging / observability.

The reference's entire observability story is a printed per-batch loss
(main.cu:760-761), an OptiX log callback (common/common.cpp:40-44) and a
family of device printf kernels (main.cu:71-116,191-306).  Here: a JSONL
MetricsWriter (loss, PSNR, rays/sec, samples/sec, grid occupancy, step
time), Python logging, and optional jax.profiler traces.
"""

from __future__ import annotations

import json
import logging
import os
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional


def get_logger(name: str = "tnerf", level: str = "INFO") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S")
        )
        logger.addHandler(h)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    return logger


class MetricsWriter:
    """Append-only JSONL metrics stream (one object per event)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def write(self, step: int, **metrics: Any) -> None:
        if self._fh is None:
            return
        rec: Dict[str, Any] = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


@contextmanager
def step_timer():
    """Wall-clock timing context; `.seconds` valid after exit."""

    class _T:
        seconds = 0.0

    t = _T()
    start = time.perf_counter()
    try:
        yield t
    finally:
        t.seconds = time.perf_counter() - start


@contextmanager
def maybe_profile(enabled: bool, out_dir: str):
    """jax.profiler trace context (TensorBoard/Perfetto) — the tracing
    subsystem (SURVEY §5 row 1)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        yield
