"""Tracing / profiling utilities (SURVEY §5: the reference has none — its
only observability is per-epoch printed loss lines with a host sync every
step, ``mapping_optimizer.py:272-307``).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace of the training steps.
* :func:`benchmark_mapping` — compile-excluded steps/sec measurement for a
  mapping problem, the building block of ``bench.py``.
* :class:`StepTimer` — lightweight wall-clock segment timing for host-side
  pipeline stages (IO, preprocessing, scoring).
"""

from __future__ import annotations

import contextlib
import threading
import time
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "trace",
    "annotate",
    "benchmark_mapping",
    "StepTimer",
    "record_phases",
    "phase",
]

_PHASE_SINK = threading.local()


@contextlib.contextmanager
def record_phases():
    """Collect wall-clock phase timings from library internals.

    The public entry points (:func:`tangram_tpu.map_cells_to_space`,
    ``Mapper.train``) mark their pipeline stages with :func:`phase`;
    wrapping a call in ``record_phases`` itemizes where the wall time went
    — trace/compile dispatch vs. device execution vs. host fetches —
    without any internal API:

    >>> with tg.profiling.record_phases() as phases:
    ...     tg.map_cells_to_space(ad_sc, ad_sp, ...)
    >>> phases  # {"mapper_init": 1.2, "train_dispatch": 38.5, ...}

    Thread-local and reentrant (an inner recording shadows the outer for
    its duration). When no recording is active, :func:`phase` is a no-op,
    so instrumented library code costs nothing in normal use.
    """
    prev = getattr(_PHASE_SINK, "sink", None)
    sink: dict = {}
    _PHASE_SINK.sink = sink
    try:
        yield sink
    finally:
        _PHASE_SINK.sink = prev


@contextlib.contextmanager
def phase(name: str):
    """Accumulate a named wall-clock segment into the active
    :func:`record_phases` sink; no-op when none is active."""
    sink = getattr(_PHASE_SINK, "sink", None)
    if sink is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink[name] = sink.get(name, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with profiling.trace('/tmp/tb'): ...``"""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (host-side annotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Accumulates named wall-clock segments: ``with timer('io'): ...``"""

    segments: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.segments.setdefault(name, 0.0)
            self.segments[name] += time.perf_counter() - t0

    def summary(self) -> dict:
        return dict(self.segments)


def benchmark_mapping(
    n_cells: int,
    n_spots: int,
    n_genes: int = 249,
    num_epochs: int = 100,
    learning_rate: float = 0.1,
    impl: str = "auto",
    seed: int = 0,
):
    """Steps/sec for a synthetic mapping problem (compile excluded).

    Returns a dict with per-step milliseconds, epochs/sec, and the projected
    seconds for a default 1000-epoch mapping at this shape.
    """
    import jax
    import jax.numpy as jnp

    from .models.mapper import fit_mapping, init_logits
    from .ops.losses import LossWeights, MapperData

    rng = np.random.default_rng(seed)
    S = rng.poisson(1.0, (n_cells, n_genes)).astype(np.float32)
    G = rng.poisson(2.0, (n_spots, n_genes)).astype(np.float32)
    d = rng.random(n_spots).astype(np.float32)
    d /= d.sum()

    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d))
    M0 = init_logits(n_cells, n_spots, random_state=seed, method="jax")

    params, history = fit_mapping(M0, data, lw, num_epochs, learning_rate, impl=impl)
    _ = float(np.asarray(history["total_loss"])[-1])  # force completion

    t0 = time.perf_counter()
    params, history = fit_mapping(
        M0 * 1.0001, data, lw, num_epochs, learning_rate, impl=impl
    )
    _ = float(np.asarray(history["total_loss"])[-1])
    elapsed = time.perf_counter() - t0

    return {
        "backend": jax.default_backend(),
        "n_cells": n_cells,
        "n_spots": n_spots,
        "n_genes": n_genes,
        "num_epochs": num_epochs,
        "seconds": elapsed,
        "ms_per_step": elapsed / num_epochs * 1e3,
        "epochs_per_s": num_epochs / elapsed,
        "projected_1000_epochs_s": elapsed / num_epochs * 1000,
    }
