"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: POA consensus throughput (windows/s) on the per-window Pallas
kernel (the flagship compute path, reference: cudapoa generatePOAKernel),
measured on the reference benchmark's workload shape (racon-style windows,
~250 bp reads, 8 reads/window — cudapoa/benchmarks BM_SingleBatchTest).
vs_baseline compares against the single-core CPU SPOA-equivalent (this
repo's cpu_reference implementation of the identical algorithm chain,
NumPy-vectorized DP rows).

Secondary metrics (also printed, one JSON line each, headline last):
- banded pairwise alignment throughput (Gcells/s, reference: cudaaligner).
"""

import json
import time

import numpy as np


def _make_windows(B, S, Lb, seed=0):
    from genomeworks_tpu.simulators.genomesim import (
        generate_random_genome,
        mutate_sequence,
    )

    rng = np.random.default_rng(seed)
    windows = []
    for _ in range(B):
        t = generate_random_genome(Lb, rng)
        windows.append(
            [t] + [mutate_sequence(t, rng, 0.03, 0.03) for _ in range(S - 1)]
        )
    return windows


def bench_poa_tpu(B=512, S=8, Lb=250, iters=3):
    from genomeworks_tpu.poa.jax_poa import poa_batch_consensus

    windows = _make_windows(B, S, Lb)
    # warmup/compile (np.asarray inside forces sync)
    cons, cov, st = poa_batch_consensus(windows)
    assert all(s == 0 for s in st)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        poa_batch_consensus(windows)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return B / dt


def bench_poa_cpu(B=8, S=8, Lb=250, iters=3):
    from genomeworks_tpu.poa.cpu_reference import poa_consensus

    windows = _make_windows(B, S, Lb)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for w in windows:
            poa_consensus(w)
        times.append(time.perf_counter() - t0)
    return B / float(np.median(times))


def bench_aligner(B=1024, M=2048, N=2048, W=256, iters=5):
    import jax.numpy as jnp
    from genomeworks_tpu.ops.banded_nw_pallas import banded_nw_forward_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, size=(B, M)), dtype=jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, size=(B, N)), dtype=jnp.uint8)
    qlen = jnp.full((B,), M, dtype=jnp.int32)
    tlen = jnp.full((B,), N, dtype=jnp.int32)
    c, f = banded_nw_forward_pallas(q, t, qlen, tlen, W)
    _ = np.asarray(c[0, 0, :1])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c, f = banded_nw_forward_pallas(q, t, qlen, tlen, W)
        _ = np.asarray(c[0, 0, :1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return B * M * W / dt / 1e9


def main():
    aligner_gcups = bench_aligner()
    print(json.dumps({
        "metric": "banded_alignment_throughput",
        "value": round(aligner_gcups, 2),
        "unit": "Gcells/s",
        "vs_baseline": None,
    }))

    tpu_wps = bench_poa_tpu()
    cpu_wps = bench_poa_cpu()
    print(json.dumps({
        "metric": "poa_consensus_throughput",
        "value": round(tpu_wps, 1),
        "unit": "windows/s",
        "vs_baseline": round(tpu_wps / cpu_wps, 2),
    }))


if __name__ == "__main__":
    main()
