"""Wall-clock timing helpers (reference ``bpvo/timer.{h,cc}``: Timer/TimeCode ms
timing) extended with a device-aware variant that blocks on JAX async dispatch
so kernel time is actually measured."""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, Dict, List


class Timer:
    def __init__(self):
        self.start()

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        """Elapsed milliseconds since start."""
        return (time.perf_counter() - self._t0) * 1000.0

    def elapsed_ms(self) -> float:
        return self.stop()


def time_code(n_rep: int, fn: Callable, *args, block=True, **kw) -> float:
    """Average milliseconds over n_rep calls (reference timer.h:62-81
    ``TimeCode``), calling ``block_until_ready`` on JAX outputs."""
    import jax
    t = Timer()
    out = None
    for _ in range(n_rep):
        out = fn(*args, **kw)
    if block and out is not None:
        jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
    return t.stop() / n_rep


class StageTimer:
    """Accumulates per-stage timings across frames (the role of the per-frame
    ms prints in reference apps/vo_app.cc:316-336 and test_timing.cc)."""

    def __init__(self):
        self._acc: Dict[str, List[float]] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self._acc.setdefault(name, []).append(
            (time.perf_counter() - t0) * 1000.0)

    def add(self, name: str, ms: float):
        self._acc.setdefault(name, []).append(ms)

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self._acc.items() if v}

    def report(self) -> str:
        return "\n".join(f"{k:>24s}: {v:8.3f} ms"
                         for k, v in sorted(self.summary().items()))
