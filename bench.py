"""Benchmark driver: prints ONE JSON line with the headline metric.

Round-1 headline: banded alignment DP throughput (giga cell-updates/s) on
the flagship wavefront kernel, vs a single-thread vectorized NumPy CPU
implementation of the identical DP (the reference's own oracle semantics).
Later rounds add POA windows/s vs CPU SPOA.
"""

import json
import time

import numpy as np


def _bench_tpu(B=1024, M=2048, N=2048, W=256, iters=8):
    import jax
    import jax.numpy as jnp
    from genomeworks_tpu.ops.banded_nw_pallas import banded_nw_forward_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, size=(B, M)), dtype=jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, size=(B, N)), dtype=jnp.uint8)
    qlen = jnp.full((B,), M, dtype=jnp.int32)
    tlen = jnp.full((B,), N, dtype=jnp.int32)

    # warmup/compile (np.asarray forces a sync; block_until_ready does not
    # reliably block through the axon tunnel)
    c, f = banded_nw_forward_pallas(q, t, qlen, tlen, W)
    _ = np.asarray(c[0, 0, :1])

    times = []
    for _ in range(iters):
        start = time.perf_counter()
        c, f = banded_nw_forward_pallas(q, t, qlen, tlen, W)
        _ = np.asarray(c[0, 0, :1])
        times.append(time.perf_counter() - start)
    elapsed = float(np.median(times))
    cells = B * M * W
    return cells / elapsed, elapsed


def _bench_cpu(B=4, M=512, W=256):
    """Same banded DP, vectorized NumPy on host (single core)."""
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, size=(B, M)).astype(np.uint8)
    t = rng.integers(0, 4, size=(B, M)).astype(np.uint8)
    INF = 1 << 24
    k = np.arange(W)
    dlo = -(W // 2)
    start = time.perf_counter()
    prev = np.where((dlo + k >= 0) & (dlo + k <= M), dlo + k, INF).astype(np.int32)
    prev = np.broadcast_to(prev, (B, W)).copy()
    for i in range(1, M + 1):
        j = i + dlo + k[None, :]
        tj = np.take_along_axis(t, np.clip(j - 1, 0, M - 1), axis=1)
        sub = (q[:, i - 1 : i] != tj).astype(np.int32)
        up = np.concatenate([prev[:, 1:], np.full((B, 1), INF, np.int32)], axis=1) + 1
        base = np.minimum(prev + sub, up)
        base = np.where(j == 0, i, base)
        base = np.where((j < 0) | (j > M), INF, base)
        cur = k[None, :] + np.minimum.accumulate(base - k[None, :], axis=1)
        prev = cur
    elapsed = time.perf_counter() - start
    return (B * M * W) / elapsed


def main():
    tpu_cells_per_sec, latency = _bench_tpu()
    cpu_cells_per_sec = _bench_cpu()
    print(
        json.dumps(
            {
                "metric": "banded_alignment_dp_throughput",
                "value": round(tpu_cells_per_sec / 1e9, 3),
                "unit": "GCUPS",
                "vs_baseline": round(tpu_cells_per_sec / cpu_cells_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
