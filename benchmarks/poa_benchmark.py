"""POA benchmark harness.

Mirrors cudapoa/benchmarks (BM_SingleBatchTest: one batch of 1..1024
windows; BM_MultiBatchTest: 5500 windows across 1..16 batches,
benchmarks/main.cpp:36-73). The reference's sample-windows.txt is not
bundled in this checkout (LFS), so windows are generated with the racon
workload shape (~250 bp reads, 8 reads/window) unless a windows file is
passed with --windows.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_windows(n, reads_per_window=8, read_len=250, seed=0):
    from genomeworks_tpu.simulators.genomesim import (
        generate_random_genome,
        mutate_sequence,
    )

    rng = np.random.default_rng(seed)
    windows = []
    for _ in range(n):
        t = generate_random_genome(read_len, rng)
        windows.append(
            [t] + [mutate_sequence(t, rng, 0.03, 0.03) for _ in range(reads_per_window - 1)]
        )
    return windows


def bm_single_batch(windows_pool, sizes=(1, 4, 16, 64, 256, 1024), iters=3):
    """BM_SingleBatchTest: latency of one generate_poa over N windows."""
    from genomeworks_tpu.poa.jax_poa import poa_batch_consensus

    results = {}
    for n in sizes:
        windows = [windows_pool[i % len(windows_pool)] for i in range(n)]
        poa_batch_consensus(windows)  # warm/compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            poa_batch_consensus(windows)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[n] = {"ms": round(dt * 1e3, 1), "windows_per_s": round(n / dt, 1)}
    return results


def bm_multi_batch(windows_pool, total_windows=5500, batches=(1, 2, 4, 8, 16)):
    """BM_MultiBatchTest: total_windows processed in N sequential batches
    (the reference's N concurrent GPU batches map to batched dispatches on
    one chip; multi-chip spreading lives in parallel/sharded.py)."""
    from genomeworks_tpu.poa.jax_poa import poa_batch_consensus

    windows = [windows_pool[i % len(windows_pool)] for i in range(total_windows)]
    results = {}
    for nb in batches:
        per = (total_windows + nb - 1) // nb
        poa_batch_consensus(windows[:per])  # warm
        t0 = time.perf_counter()
        for b in range(nb):
            chunk = windows[b * per : (b + 1) * per]
            if chunk:
                poa_batch_consensus(chunk)
        dt = time.perf_counter() - t0
        results[nb] = {"s": round(dt, 2), "windows_per_s": round(total_windows / dt, 1)}
    return results


def main():
    p = argparse.ArgumentParser(description="cudapoa-style POA benchmarks")
    p.add_argument("--windows", help="cudapoa-format windows file")
    p.add_argument("--total-windows", type=int, default=5500)
    p.add_argument("--single-only", action="store_true")
    p.add_argument("--multi-only", action="store_true")
    args = p.parse_args()

    if args.windows:
        from genomeworks_tpu.poa.windows import parse_cudapoa_file

        pool = parse_cudapoa_file(args.windows, -1)
    else:
        pool = make_windows(64)

    if not args.multi_only:
        print("BM_SingleBatchTest:")
        print(json.dumps(bm_single_batch(pool), indent=2))
    if not args.single_only:
        print("BM_MultiBatchTest:")
        print(json.dumps(bm_multi_batch(pool, args.total_windows), indent=2))


if __name__ == "__main__":
    main()
