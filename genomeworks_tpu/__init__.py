"""genomeworks_tpu — a TPU-native sequence-analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NVIDIA
GenomeWorks (reference: NVIDIA-Genomics-Research/GenomeWorks v0.6.0):

- ``genomeworks_tpu.mapper``   — minimizer-based all-vs-all read overlapping
  (reference: ``cudamapper``): sketching, index build, anchor matching,
  chaining into overlaps, PAF/SAM output.
- ``genomeworks_tpu.poa``      — batched partial-order alignment producing
  consensus and MSA (reference: ``cudapoa``).
- ``genomeworks_tpu.aligner``  — batched banded pairwise global alignment
  with CIGARs (reference: ``cudaaligner``).
- ``genomeworks_tpu.extender`` — ungapped X-drop seed extension
  (reference: ``cudaextender``).
- ``genomeworks_tpu.io``       — FASTA/FASTQ parsing, PAF/SAM writers
  (reference: ``common/io`` + ``cudamapper/src/utils.cpp``).
- ``genomeworks_tpu.core``     — types, config, logging, bucketing
  (reference: ``common/base``).
- ``genomeworks_tpu.parallel`` — mesh sharding / multi-host scaling (replaces
  the reference's CUDA streams + per-GPU worker threads).
- ``genomeworks_tpu.simulators`` / ``tools`` — genome/read simulators and
  PAF evaluation (reference: ``pygenomeworks``).

The architecture is TPU-first, not a CUDA port: fixed-shape bucketed batches,
wavefront DP via ``lax.scan`` + Pallas kernels, sort/segment-op pipelines in
place of CUB primitives, and ``jax.sharding`` data parallelism in place of
streams/threads.
"""

__version__ = "0.1.0"

import os as _os

# Keep large freed blocks on the heap instead of munmapping them. The
# deployment VM services fresh page faults at ~10 MB/s (measured: a 136 MB
# numpy allocation takes ~7 s to first-touch despite 128 GB free), and
# glibc's default M_MMAP_THRESHOLD returns every big freed buffer to the
# OS — so each batched call re-faulted its working set from scratch.
# Raising the trim/mmap thresholds makes buffer REUSE instant (0.02 s for
# the same 136 MB). Opt out with GW_NO_MALLOC_TUNING=1.
if not _os.environ.get("GW_NO_MALLOC_TUNING"):
    try:
        import ctypes as _ctypes

        _libc = _ctypes.CDLL("libc.so.6", use_errno=True)
        _libc.mallopt(_ctypes.c_int(-1), _ctypes.c_int(2**31 - 1))  # M_TRIM_THRESHOLD
        _libc.mallopt(_ctypes.c_int(-3), _ctypes.c_int(2**31 - 1))  # M_MMAP_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc platform
        pass

# Persistent XLA compilation cache. On the TPU tunnel a cold compile of the
# sketch/POA/aligner programs costs tens of seconds; the cache brings every
# later process to warm-start. Safe with Pallas kernels because each kernel
# bakes a source-version tag into its program (the cache key alone does not
# cover Mosaic custom-call payloads). Opt out with GW_TPU_NO_CACHE=1.
if not _os.environ.get("GW_TPU_NO_CACHE"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("GW_TPU_CACHE_DIR", "/tmp/gw_tpu_jax_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - jax absent or too old
        pass

# Backend override: GW_PLATFORM=cpu forces the CPU backend. Needed because
# some TPU PJRT plugins register via sitecustomize and override the
# JAX_PLATFORMS env var; jax.config.update after import is the only
# selection mechanism that always works.
_plat = _os.environ.get("GW_PLATFORM")
if _plat:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
    except Exception:  # pragma: no cover
        pass


def version() -> str:
    """Framework version (reference: common/base version.hpp)."""
    return __version__
