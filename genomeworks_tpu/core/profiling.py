"""Tracing/profiling — the TPU counterpart of the reference's NVTX layer.

The reference wraps every hot phase in ``GW_NVTX_RANGE`` RAII ranges
behind the ``gw_profiling`` CMake flag (common/base/include/.../
cudautils.hpp:161-176; dense usage e.g. cudamapper/src/main.cu:215,
index_gpu.cuh:822+). Here:

- :func:`annotate` — a context manager combining ``jax.named_scope``
  (names ops in profiler traces / HLO) with wall-clock accumulation into
  a process-wide phase table;
- :func:`phase_times` / :func:`reset_phase_times` — the accumulated
  per-phase wall times (bench.py reports them);
- :func:`trace` — capture a ``jax.profiler`` trace directory for
  tensorboard/xprof, gated by the GW_PROFILE env var so production runs
  pay nothing.

Wall times include host time between dispatches; for device-side
attribution use the captured trace.
"""

from __future__ import annotations

import collections
import contextlib
import os
import time

import jax

_times: dict[str, float] = collections.defaultdict(float)
_counts: dict[str, int] = collections.defaultdict(int)


@contextlib.contextmanager
def annotate(name: str):
    """Name a phase: ops traced inside get ``name`` in profiler output,
    and host wall time is accumulated under ``name``."""
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    _times[name] += time.perf_counter() - t0
    _counts[name] += 1


def phase_times() -> dict[str, dict[str, float]]:
    return {
        k: {"seconds": round(_times[k], 4), "calls": _counts[k]}
        for k in sorted(_times)
    }


def reset_phase_times() -> None:
    _times.clear()
    _counts.clear()


@contextlib.contextmanager
def trace(trace_dir: str | None = None):
    """Capture a jax.profiler trace when GW_PROFILE=1 (or a dir is given
    explicitly); no-op otherwise."""
    explicit = trace_dir is not None
    trace_dir = trace_dir or os.environ.get("GW_PROFILE_DIR", "/tmp/gw_trace")
    if explicit or os.environ.get("GW_PROFILE") == "1":
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
