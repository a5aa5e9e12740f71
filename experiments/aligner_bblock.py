"""Measure banded_nw forward throughput vs B_BLOCK (latency hiding)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

import genomeworks_tpu.ops.banded_nw_pallas as bnp


def bench(B=1024, M=2048, W=256, iters=5):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, size=(B, M)), dtype=jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, size=(B, M)), dtype=jnp.uint8)
    qlen = jnp.full((B,), M, dtype=jnp.int32)
    tlen = jnp.full((B,), M, dtype=jnp.int32)
    c, f = bnp.banded_nw_forward_pallas(q, t, qlen, tlen, W)
    _ = np.asarray(c[0, 0, :1])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c, f = bnp.banded_nw_forward_pallas(q, t, qlen, tlen, W)
        _ = np.asarray(c[0, 0, :1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return B * M * W / dt / 1e9


if __name__ == "__main__":
    for bb in (128, 256, 512, 1024):
        bnp.B_BLOCK = bb
        bnp.banded_nw_forward_pallas.clear_cache()
        try:
            g = bench()
            print(f"B_BLOCK={bb:5d}: {g:7.2f} Gcells/s")
        except Exception as e:
            print(f"B_BLOCK={bb:5d}: FAILED {str(e)[:160]}")
