"""Profiling / tracing hooks.

The reference instruments with wall-clock spans around each assemble/solve
(solver.py:474-525) plus PETSc ksp_view/ksp_monitor options.  Here the
device-side equivalents:

* :func:`trace` -- context manager around jax.profiler.trace, producing a
  TensorBoard/Perfetto trace of the fused step (kernel-level timeline);
* :func:`annotate` -- named TraceAnnotation for phases inside jit;
* :class:`StepTimer` -- host wall-clock spans keyed by the reference's
  phase names (ode/emi_assemble/emi_solve/knp_assemble/knp_solve).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace of everything inside the block."""
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named region visible in profiler timelines (usable inside jit)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulating host-side phase timers (reference *_timer attributes,
    solver.py:77-81)."""

    def __init__(self):
        self.spans: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.spans[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return dict(self.spans)
