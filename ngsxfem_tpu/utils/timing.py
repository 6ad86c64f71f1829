"""Timers & profiling hooks.

TPU-native counterpart of NGSolve's static ``Timer``/``RegionTimer``
instrumentation that the reference leans on (e.g.
``cutint/straightcutrule.cpp:589-591``, ``projshift.cpp:15-16``; results via
NGSolve's timer report, SURVEY.md §5): a process-global registry of named
wall-clock timers with a context manager that blocks on device results (so
async dispatch does not misattribute time), plus a thin wrapper around the
JAX profiler for on-device traces.

Usage::

    from ngsxfem_tpu.utils.timing import Timer, PrintTimers

    with Timer("assemble"):
        a.Assemble()
    PrintTimers()

    with jax_trace("/tmp/ngsxfem-trace"):   # view in xprof/tensorboard
        model.step(...)
"""
from __future__ import annotations

import time
from contextlib import contextmanager

_REGISTRY: dict[str, list] = {}  # name -> [total_seconds, calls]


class Timer:
    """Named accumulating wall-clock timer (NGSolve Timer analog)."""

    def __init__(self, name: str, block=True):
        self.name = name
        self.block = block
        self._t0 = None

    def Start(self):
        self._t0 = time.perf_counter()
        return self

    def Stop(self, result=None):
        if self.block and result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        ent = _REGISTRY.setdefault(self.name, [0.0, 0])
        ent[0] += dt
        ent[1] += 1
        return dt

    def __enter__(self):
        return self.Start()

    def __exit__(self, *exc):
        if self.block:
            # drain the device queue: a trivial computation enqueued after
            # the timed region completes only once prior dispatches have
            # (per-device in-order execution), honoring the module contract
            # that the context manager blocks on device results
            import jax.numpy as jnp

            # a device->host READ, not block_until_ready: on the tunneled
            # axon runtime's async regime block_until_ready returns before
            # computation (memory: enqueue timings are fiction); fetching a
            # scalar forces completion on every runtime
            float(jnp.zeros(()) + 0)
        self.Stop()
        return False


def GetTimers():
    """{name: (total_seconds, calls)} snapshot of all timers."""
    return {k: tuple(v) for k, v in _REGISTRY.items()}


def ResetTimers():
    _REGISTRY.clear()


def PrintTimers():
    """NGSolve-timer-report-style table."""
    if not _REGISTRY:
        print("no timers recorded")
        return
    w = max(len(k) for k in _REGISTRY)
    print(f"{'timer':<{w}} {'calls':>7} {'total[s]':>10} {'per-call[ms]':>13}")
    for k, (tot, n) in sorted(_REGISTRY.items(), key=lambda kv: -kv[1][0]):
        print(f"{k:<{w}} {n:>7} {tot:>10.4f} {1e3 * tot / max(n, 1):>13.3f}")


@contextmanager
def jax_trace(logdir: str):
    """On-device profiler trace (JAX profiler; view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def region(name: str):
    """RegionTimer analog: `with region("assemble"): ...`."""
    with Timer(name):
        yield
