"""Phase timing + jax.profiler tracing.

The reference publishes a per-phase wall-clock/memory table
(docs/EditingGuidance.md:68-76) but has no programmatic tracing. Here every
pipeline phase can be timed with `phase(name)` and a whole run wrapped in a
`jax.profiler` trace (viewable in TensorBoard / Perfetto via xprof).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; device-synced at boundaries."""

    def __init__(self):
        self.phases: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True):
        if sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"seconds": round(t, 3), "calls": self.counts[name]}
            for name, t in self.phases.items()
        }

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)

    def __str__(self) -> str:
        rows = [f"  {n:<28s} {v['seconds']:>9.2f}s x{v['calls']}" for n, v in self.report().items()]
        return "phase timings:\n" + "\n".join(rows)


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace wrapper; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
