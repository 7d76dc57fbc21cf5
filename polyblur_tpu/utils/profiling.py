"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference's observability is wall-clock prints behind a ``verbose``
flag (deblurring.py:59-90) plus a warm-up-then-measure protocol
(main.py:117-128). Under ``jax.jit`` per-stage wall-clocks inside one fused
program are meaningless, so the TPU-native equivalents are:

* :func:`stage_timer` — wall-clock a *whole* jitted call correctly
  (forces execution; on tunneled backends ``block_until_ready`` can
  return early, so completion is forced by a scalar readback);
* :func:`trace` — a ``jax.profiler`` trace context whose artifacts open
  in XProf/TensorBoard for per-op device timing;
* :func:`annotate` — ``jax.named_scope`` wrapper so pipeline stages are
  identifiable inside the profile;
* :func:`record_dispatch` / :func:`dispatch_log` — a trace-time counter of
  which backend each dispatch guard chose (mega-kernel vs fused Pallas vs
  XLA band composition vs fft), so perf regressions in the eligibility
  guards (pipeline.py, ops/sep_poly.py) are diagnosable without a profiler.
  Entries are recorded once per *compilation* (the guards are Python-level
  and run at trace time), not per call.
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["stage_timer", "trace", "annotate", "force_execution",
           "record_dispatch", "dispatch_log", "reset_dispatch_log"]

_DISPATCH_LOG: collections.Counter = collections.Counter()


def record_dispatch(site: str, backend: str) -> None:
    """Record that dispatch guard ``site`` selected ``backend`` (trace time)."""
    _DISPATCH_LOG[(site, backend)] += 1


def dispatch_log() -> dict:
    """{(site, backend): n_compilations} since the last reset."""
    return dict(_DISPATCH_LOG)


def reset_dispatch_log() -> None:
    _DISPATCH_LOG.clear()


def force_execution(tree) -> float:
    """Force device execution of every array in ``tree``; returns a checksum.

    ``jax.block_until_ready`` alone is not reliable through remote-relay
    backends; a scalar reduction fetched to host is.
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    total = 0.0
    for leaf in leaves:
        total += float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
    return total


@contextlib.contextmanager
def stage_timer(name: str, results: dict | None = None, verbose: bool = True):
    """Wall-clock a stage; optionally records into ``results[name]``.

    The caller is responsible for forcing execution of the stage's outputs
    (e.g. via :func:`force_execution`) before the context exits.
    """
    start = time.perf_counter()
    yield
    dt = time.perf_counter() - start
    if results is not None:
        results[name] = dt
    if verbose:
        print(f"-- {name}: {dt:.5f}s")


@contextlib.contextmanager
def trace(logdir: str = "/tmp/polyblur_trace"):
    """jax.profiler trace context; view with XProf / TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator adding a named scope visible in profiler traces."""
    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco
