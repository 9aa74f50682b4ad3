"""Metrics, logging, and profiling hooks.

The reference has none of this (SURVEY.md 5.1/5.5: print() only, a logger
created but unused in aggregator.py:18). For a production TPU deployment we
provide the minimal real thing:

  * ``get_logger``        -- namespaced stderr logging with one-line setup;
  * ``Metrics``           -- process-local counters/gauges/timings registry
                             with a ``summary()`` dict (scrape- or
                             log-friendly);
  * ``StepTimer``         -- wall-time per denoise step with device sync on
                             first use (the tunneled platform's
                             block_until_ready can return early, so the
                             timer syncs by fetching a scalar);
  * ``profile_trace``     -- context manager around jax.profiler.trace,
                             no-op when no directory is given.
"""
from __future__ import annotations

import contextlib
import logging
import sys
import time
from collections import defaultdict
from typing import Dict, Optional

_LOG_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"


def get_logger(name: str = "fantasy_world_tpu",
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_LOG_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


class Metrics:
    """Tiny process-local metrics registry: counters, gauges, and timing
    accumulators. Not thread-safe by design -- the inference path is
    single-threaded host code around device dispatch."""

    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)
        self.gauges: Dict[str, float] = {}
        self._timings: Dict[str, list] = defaultdict(list)

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = float(value)

    def observe(self, name: str, seconds: float) -> None:
        self._timings[name].append(float(seconds))

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(name, time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = dict(self.counters)
        out.update(self.gauges)
        for name, vals in self._timings.items():
            out[f"{name}.count"] = len(vals)
            out[f"{name}.total_s"] = sum(vals)
            out[f"{name}.mean_s"] = sum(vals) / max(1, len(vals))
            out[f"{name}.max_s"] = max(vals)
        return out

    def log_summary(self, logger: Optional[logging.Logger] = None) -> None:
        logger = logger or get_logger()
        for k in sorted(self.summary()):
            logger.info("%s = %.6g", k, self.summary()[k])


metrics = Metrics()          # module-level default registry


class StepTimer:
    """Per-step wall timing that actually synchronizes the device.

    On the tunneled 'axon' platform block_until_ready may return before
    execution finishes (measured round 1), so ``sync`` fetches one output
    element to host -- the only reliable barrier there.
    """

    def __init__(self, name: str = "step", registry: Optional[Metrics] = None):
        self.name = name
        self.registry = registry or metrics
        self._t0 = None

    @staticmethod
    def sync(x) -> None:
        import jax
        import numpy as np
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, output=None) -> float:
        if output is not None:
            self.sync(output)
        dt = time.perf_counter() - self._t0
        self.registry.observe(self.name, dt)
        return dt


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str]):
    """jax.profiler.trace when a directory is given, else a no-op. View the
    capture with xprof / tensorboard-plugin-profile."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
