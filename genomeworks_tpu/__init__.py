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


def version() -> str:
    """Framework version (reference: common/base version.hpp)."""
    return __version__
