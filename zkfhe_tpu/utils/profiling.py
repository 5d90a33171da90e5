"""Stage timing + profiling helpers (SURVEY.md §5 "Tracing/profiling":
the reference only has env_logger wall-clock logs; here we provide
structured per-stage timers and optional jax.profiler traces)."""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time


class StageTimer:
    """Collects named stage durations; prints a summary + optional JSON."""

    def __init__(self, label: str = "zkfhe", stream=sys.stderr):
        self.label = label
        self.stream = stream  # None silences per-stage prints
        self.stages = []
        self._last = time.time()

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.time()
        yield
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        dt = time.time() - t0
        self._record(name, dt)

    def mark(self, name: str):
        """Record the time since construction / the previous mark — the
        linear-pipeline counterpart of stage() (used by prover.prove)."""
        now = time.time()
        self._record(name, now - self._last)
        self._last = now

    def _record(self, name, dt):
        self.stages.append((name, dt))
        # keep the two APIs composable: a stage() must not be double-
        # counted into the next mark() interval (ADVICE.md round-2 low)
        self._last = time.time()
        if self.stream is not None:
            print(f"[{self.label}] {name}: {dt:.3f}s", file=self.stream,
                  flush=True)

    def summary(self) -> dict:
        return {name: round(dt, 4) for name, dt in self.stages}

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)


@contextlib.contextmanager
def maybe_trace(out_dir: str | None = None):
    """jax.profiler trace when ZKFHE_TRACE_DIR (or out_dir) is set."""
    out = out_dir or os.environ.get("ZKFHE_TRACE_DIR")
    if not out:
        yield
        return
    import jax
    with jax.profiler.trace(out):
        yield
