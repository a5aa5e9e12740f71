"""Pairwise-aligner benchmark harness.

Mirrors cudaaligner/benchmarks (BM_SingleAlignment: one pair per launch;
BM_SingleBatchAlignment: a full batch per launch, benchmarks/main.cpp) on
random genome pairs (genomeutils-style generation).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _pairs(n, length, seed=0):
    from genomeworks_tpu.simulators.genomesim import (
        generate_random_genome,
        mutate_sequence,
    )

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        q = generate_random_genome(length, rng)
        out.append((q, mutate_sequence(q, rng, 0.05, 0.05)))
    return out


def bm_single_alignment(lengths=(256, 1024, 4096), iters=3):
    from genomeworks_tpu.aligner import create_aligner

    results = {}
    for L in lengths:
        (q, t), = _pairs(1, L)
        aligner = create_aligner(max_bandwidth=1024)
        aligner.add_alignment(q, t)
        aligner.align_all()  # warm/compile
        times = []
        for _ in range(iters):
            aligner.reset()
            aligner.add_alignment(q, t)
            t0 = time.perf_counter()
            aligner.align_all()
            times.append(time.perf_counter() - t0)
        results[L] = {"ms": round(float(np.median(times)) * 1e3, 2)}
    return results


def bm_single_batch_alignment(batch=512, length=1024, iters=3):
    from genomeworks_tpu.aligner import create_aligner

    pairs = _pairs(batch, length)
    aligner = create_aligner(max_bandwidth=1024)
    for q, t in pairs:
        aligner.add_alignment(q, t)
    aligner.align_all()  # warm
    times = []
    for _ in range(iters):
        aligner.reset()
        for q, t in pairs:
            aligner.add_alignment(q, t)
        t0 = time.perf_counter()
        aligner.align_all()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "batch": batch,
        "length": length,
        "s": round(dt, 3),
        "alignments_per_s": round(batch / dt, 1),
        "Gcells_per_s": round(batch * length * length / dt / 1e9, 2),
    }


def main():
    p = argparse.ArgumentParser(description="cudaaligner-style benchmarks")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--length", type=int, default=1024)
    args = p.parse_args()
    print("BM_SingleAlignment:")
    print(json.dumps(bm_single_alignment(), indent=2))
    print("BM_SingleBatchAlignment:")
    print(json.dumps(bm_single_batch_alignment(args.batch, args.length), indent=2))


if __name__ == "__main__":
    main()
