"""Observability: phase timing, throughput logging, and optional XLA traces.

The reference has no tracing/profiling (SURVEY.md §5 — only timestamped
logging and a commented-out C++ ProgressMeter).  Here:

* ``phase(label)``     — context manager logging wall time per phase at DEBUG
                         (INFO when TRACS_TPU_TIMINGS=1).
* ``rate_logger(unit)``— returns a callable accumulating work items and
                         logging cumulative throughput (e.g. pairs/s).
* ``trace(label)``     — wraps ``jax.profiler.trace`` when TRACS_TPU_PROFILE
                         points at a directory, else a no-op; view the
                         resulting trace with TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time


def _timings_level():
    return logging.INFO if os.environ.get("TRACS_TPU_TIMINGS") else logging.DEBUG


@contextlib.contextmanager
def phase(label: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logging.log(_timings_level(), "[phase] %s: %.3fs", label, time.perf_counter() - t0)


def rate_logger(unit: str = "items"):
    """Returns ``log(n_done)``: call with the number of work items finished
    since the previous call; logs cumulative count and rate."""
    state = {"t0": time.perf_counter(), "n": 0}

    def log(n_done: int):
        state["n"] += int(n_done)
        dt = time.perf_counter() - state["t0"]
        if dt > 0:
            logging.log(
                _timings_level(),
                "[rate] %s %s in %.1fs (%.0f %s/s)",
                f"{state['n']:,}", unit, dt, state["n"] / dt, unit,
            )

    return log


@contextlib.contextmanager
def trace(label: str = "tracs_tpu"):
    trace_dir = os.environ.get("TRACS_TPU_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        logging.info("[profile] writing XLA trace for %r to %s", label, trace_dir)
        yield
