"""On-chip probes for Mosaic capabilities the v4 POA kernel design needs.

1. VMEM->SMEM async copy (for the best-finder column extraction)
2. pltpu.roll with a dynamic (traced) shift (for banded NW realignment)
3. fori_loop scalar-iteration overhead curve (fusion gain model)
4. cost of G stacked dynamic-row reads + fused vector ops vs G separate
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *a, iters=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters, r


def probe_vmem_to_smem_dma():
    N = 512

    def kern(x_ref, o_ref, smem, sem):
        dma = pltpu.make_async_copy(x_ref, smem, sem)
        dma.start()
        dma.wait()

        def body(i, acc):
            return acc + smem[i]

        o_ref[0] = jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    x = jnp.arange(N, dtype=jnp.float32)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((N,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x)
        ok = float(out[0]) == float(np.arange(N).sum())
        print(f"VMEM->SMEM DMA: works, correct={ok}")
    except Exception as e:
        print(f"VMEM->SMEM DMA: FAILED: {type(e).__name__}: {str(e)[:200]}")


def probe_dynamic_roll():
    def kern(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)

    x = jnp.arange(256, dtype=jnp.int32).reshape(1, 256)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 256), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, jnp.array([5], dtype=jnp.int32))
        expect = np.roll(np.arange(256), 5)
        print(f"dynamic pltpu.roll: works, correct={bool((np.asarray(out)[0]==expect).all())}")
    except Exception as e:
        print(f"dynamic pltpu.roll: FAILED: {type(e).__name__}: {str(e)[:200]}")


def probe_loop_overhead():
    # fori_loop of T iterations doing K dependent SMEM scalar ops each.
    def make(T, K):
        def kern(x_ref, o_ref, smem):
            smem[0] = x_ref[0]

            def body(i, acc):
                v = acc
                for k in range(K):
                    v = smem[(v + i + k) % 64]
                smem[(i + 1) % 64] = v + 1
                return v

            o_ref[0] = jax.lax.fori_loop(0, T, body, jnp.int32(0))

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
            )(x)

        return run

    x = jnp.zeros(1, jnp.int32)
    base = {}
    for T in (1000, 50000):
        for K in (1, 4, 16):
            f = make(T, K)
            dt, _ = timeit(f, x)
            base[(T, K)] = dt
    for K in (1, 4, 16):
        per_iter = (base[(50000, K)] - base[(1000, K)]) / 49000 * 1e9
        print(f"fori_loop overhead: K={K:2d} dependent SMEM ops -> {per_iter:7.1f} ns/iter")


def probe_fused_rows(G):
    # G dynamic row reads stacked + ~30 fused vector ops, T rows.
    N1, Lp, T = 513, 384, 2000

    def kern(x_ref, o_ref, scores):
        def body(gp, acc):
            rows = [scores[pl.ds(g * N1 + ((gp * 7 + g) % 512), 1), :] for g in range(G)]
            r = jnp.concatenate(rows, axis=0) if G > 1 else rows[0]
            for _ in range(10):
                m = r - 1.0
                m = jnp.maximum(m, jnp.pad(m, ((0, 0), (1, 0)))[:, :Lp])
                r = jnp.maximum(r, m)
            scores[pl.ds(((gp * 13) % 512) + 1, 1), :] = r[0:1, :]
            return acc + jnp.sum(r[:, 0:1])

        o_ref[0, 0] = jax.lax.fori_loop(0, T, body, jnp.float32(0.0))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((G * N1, Lp), jnp.float32)],
        )(x)

    x = jnp.zeros((8, 128), jnp.float32)
    dt, _ = timeit(run, x, iters=5)
    print(f"fused rows G={G}: {dt / T * 1e9:7.1f} ns/row-iter ({dt*1e3:.2f} ms total)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "dma"):
        probe_vmem_to_smem_dma()
    if which in ("all", "roll"):
        probe_dynamic_roll()
    if which in ("all", "loop"):
        probe_loop_overhead()
    if which in ("all", "rows"):
        for G in (1, 2, 4, 8):
            probe_fused_rows(G)
