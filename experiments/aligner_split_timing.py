"""Split the bit-parallel aligner's time between the Myers forward kernel
and the XLA repack (column-major bit planes -> row-major packed codes).

r2 measured 11.76 Gcells/s end-to-end at 4.8% of the kernel's issue-bound
ceiling; hypothesis: the repack's unpacked (B, Mc, W) int32 intermediates
(~2 GB of HBM traffic at the bench shape) dominate, not the kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aligner_split_timing.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(out):
    # block_until_ready does not reliably block through the axon tunnel;
    # a tiny D2H readback does
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.lax.slice(leaves[0].reshape(-1), (0,), (1,)))


def timed(fn, iters=5):
    _sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(B=1024, M=2048, N=2048, W=256):
    import genomeworks_tpu.ops.myers_banded_pallas as mb

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, size=(B, M)), dtype=jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, size=(B, N)), dtype=jnp.uint8)
    qlen = jnp.full((B,), M, dtype=jnp.int32)
    tlen = jnp.full((B,), N, dtype=jnp.int32)

    cells = B * M * W / 1e9

    # full path (kernel + repack)
    t_full = timed(lambda: mb.myers_banded_forward_pallas(q, t, qlen, tlen, W))
    print(f"full fwd (kernel+repack): {t_full*1e3:8.2f} ms  "
          f"{cells/t_full:7.2f} Gcells/s")

    # kernel only: call the pallas_call via a jit wrapper that returns the
    # raw bit planes (monkeypatch the repack to identity)
    orig = mb._repack_rowmajor
    mb._repack_rowmajor = lambda c0, c1, M_, W_, WWS_: (c0, c1)
    try:
        mb.myers_banded_forward_pallas.clear_cache()
        t_k = timed(lambda: mb.myers_banded_forward_pallas(q, t, qlen, tlen, W))
    finally:
        mb._repack_rowmajor = orig
        mb.myers_banded_forward_pallas.clear_cache()
    print(f"kernel only:              {t_k*1e3:8.2f} ms  "
          f"{cells/t_k:7.2f} Gcells/s")
    print(f"repack share: {100*(t_full-t_k)/t_full:.1f}%")

    # traceback on top
    from genomeworks_tpu.ops.rle_traceback_pallas import rle_traceback_pallas
    from genomeworks_tpu.aligner.banded_nw import band_offset

    codes, fits = mb.myers_banded_forward_pallas(q, t, qlen, tlen, W)
    dlo = band_offset(qlen, tlen, W)
    t_tb = timed(lambda: rle_traceback_pallas(codes, qlen, tlen, dlo, W))
    print(f"rle traceback:            {t_tb*1e3:8.2f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
