"""Tracing / profiling utilities.

The reference's only timing instrumentation is paired `time.time()` calls
around epochs (/root/reference/src/models/train_model.py:947-948,
966-968). Here: a device-accurate step timer (host-fetch barrier — on
remote-attached runtimes `block_until_ready` can return before execution
completes), a `jax.profiler` trace context for TensorBoard dumps, and a
NaN-debug switch (the TPU analog of the reference's
`chainer.set_debug(True)` under --debug, train_model.py:791-794).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


def force_fetch(x) -> float:
    """True execution barrier: fetch one scalar to the host."""
    arr = np.asarray(x)
    return float(arr.reshape(-1)[-1])


class StepTimer:
    """Wall-clock timer with percentile summary for train-step loops."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, barrier_value=None):
        if barrier_value is not None:
            force_fetch(barrier_value)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        arr = np.asarray(self.times)
        if arr.size == 0:
            return {}
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "min_s": float(arr.min()),
            "steps": int(arr.size),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def enable_nan_debugging() -> None:
    """Check every computation for NaNs (expensive; debug only)."""
    import jax

    jax.config.update("jax_debug_nans", True)


# NOTE: there is deliberately no cost_analysis() helper here — XLA's
# compiled.cost_analysis()["flops"] under-reports convolutions by ~300x
# on plugin backends (measured; see BENCHMARKS.md). Use the analytic
# count in pivp_tpu.utils.flops instead.
