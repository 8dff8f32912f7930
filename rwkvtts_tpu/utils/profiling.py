"""Profiling & tracing: jax.profiler traces + per-phase throughput counters.

The reference only has ad-hoc prints (prefill/decode TPS at
model/llm/llm.py:262-270, RTF logs at cli/cosyvoice.py:74,101, the rwkvfla
print_stats harness). Here profiling is first-class (SURVEY.md §5):

  * `trace(dir)` context manager -> TensorBoard/XProf trace
  * `PhaseTimer` -> per-phase wall/tokens/RTF counters with one summary
  * `measure(fn, *args)` -> compile time vs steady-state time, with an
    explicit host sync (block_until_ready does not reliably fence on the
    tunneled axon platform — PERF.md note)
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> None:
    """Force device completion via host transfer (axon-safe fence)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)


@dataclasses.dataclass
class PhaseStats:
    calls: int = 0
    seconds: float = 0.0
    tokens: int = 0
    audio_seconds: float = 0.0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.seconds if self.seconds else 0.0

    @property
    def rtf(self) -> float:
        return self.seconds / self.audio_seconds if self.audio_seconds else 0.0


class PhaseTimer:
    """Accumulates per-phase timings: prefill / decode / flow / vocoder...

    with timer.phase("decode", tokens=256): ...
    """

    def __init__(self):
        self.stats: Dict[str, PhaseStats] = defaultdict(PhaseStats)

    @contextlib.contextmanager
    def phase(self, name: str, tokens: int = 0, audio_seconds: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stats[name]
            s.calls += 1
            s.seconds += dt
            s.tokens += tokens
            s.audio_seconds += audio_seconds

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "calls": v.calls,
                "seconds": round(v.seconds, 4),
                "tokens_per_s": round(v.tokens_per_s, 1),
                "rtf": round(v.rtf, 4),
            }
            for k, v in self.stats.items()
        }

    def report(self) -> str:
        lines = [f"{'phase':<12} {'calls':>6} {'sec':>9} {'tok/s':>10} {'rtf':>8}"]
        for k, v in self.stats.items():
            lines.append(
                f"{k:<12} {v.calls:>6} {v.seconds:>9.3f} "
                f"{v.tokens_per_s:>10.1f} {v.rtf:>8.4f}"
            )
        return "\n".join(lines)


def measure(fn: Callable, *args, iters: int = 3, **kw) -> Dict[str, float]:
    """(compile_s, steady_s) for a jitted callable, axon-safe synced."""
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    steady = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "steady_s": steady}
