"""Colored stage logger + metrics file appender (reference log.py equivalent)
plus per-stage wall-clock profiling with optional jax.profiler traces — the
observability the reference lacks (SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

_COLORS = {"info": "\033[36m", "ok": "\033[32m", "warn": "\033[33m",
           "err": "\033[31m", "end": "\033[0m"}


class Log:
    def __init__(self, metrics_path: Optional[str] = None):
        self.metrics_path = metrics_path
        self._t0 = time.monotonic()

    def _emit(self, level: str, msg: str):
        c = _COLORS.get(level, "")
        print(f"{c}[{time.monotonic() - self._t0:8.1f}s] {msg}{_COLORS['end']}")

    def info(self, msg: str):
        self._emit("info", msg)

    def ok(self, msg: str):
        self._emit("ok", msg)

    def warn(self, msg: str):
        self._emit("warn", msg)

    def metric(self, name: str, value, **extra):
        """Append a metric line (replaces Log.loss_train, log.py:55-64)."""
        self._emit("info", f"{name} = {value}")
        if self.metrics_path:
            os.makedirs(os.path.dirname(self.metrics_path), exist_ok=True)
            with open(self.metrics_path, "a") as f:
                f.write(json.dumps({"t": time.time(), "name": name,
                                    "value": value, **extra}) + "\n")

    @contextlib.contextmanager
    def stage(self, name: str, trace_dir: Optional[str] = None):
        """Time a pipeline stage; optionally capture a jax.profiler trace."""
        self.info(f"stage {name} ...")
        t0 = time.monotonic()
        ctx = contextlib.nullcontext()
        if trace_dir:
            import jax
            ctx = jax.profiler.trace(os.path.join(trace_dir, name))
        with ctx:
            yield
        dt = time.monotonic() - t0
        self.metric(f"stage/{name}/seconds", round(dt, 2))
        self.ok(f"stage {name} done in {dt:.1f}s")


log = Log()
