"""Tracing / metrics observability (SURVEY.md §5 aux subsystems).

The reference has print-banner observability only; here:

  trace(dir)        — jax.profiler context producing a Perfetto/
                      TensorBoard trace of device execution
  StageTimer        — wall-clock stage timing with device sync
  MetricsLogger     — append-only JSONL scalar metrics (loss, PSNR,
                      gaussian count, throughput), the artifact-dump
                      discipline applied to scalars
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing; sync() blocks on outstanding device work
    so a stage's time includes its async-dispatched computation."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / self.counts[k] for k in self.totals}

    def report(self) -> str:
        return "\n".join(
            f"{k:24s} {self.totals[k]/self.counts[k]*1000:9.2f} ms/call"
            f"  x{self.counts[k]}" for k in sorted(self.totals))


class MetricsLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.rows = []

    def log(self, step: int, **scalars):
        row = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            row[k] = float(v)
        self.rows.append(row)
        if self.path:
            with open(self.path, "a") as fh:
                fh.write(json.dumps(row) + "\n")
        return row
