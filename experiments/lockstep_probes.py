"""On-chip probes for the primitives the lockstep POA kernel rests on.

The lockstep kernel (ops/poa_lockstep_pallas.py) processes 128 windows in
vector lanes with graph state as (N, 128) VMEM planes. Before building it,
verify each primitive compiles + runs correctly on the chip (and measure):

1. one-hot gather: val[w] = plane[idx[w], w] via mask+reduce over axis 0
2. one-hot scatter: plane[idx[w], w] = val[w] via select
3. dynamic fori_loop bound from a lane-max reduction
4. ring access: uniform dynamic first-dim index (pl.ds) into VMEM scratch
5. sublane-axis static shift via concatenate (the NW closure building block)
6. scalar dynamic loads from an (R, Lp, 128) i8 VMEM chunk (traceback)
7. in-kernel DMA: VMEM staging -> HBM out ref -> back into VMEM scratch
8. int16 plane arithmetic + select + reduce
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, W = 512, 128
INTERP = "--interpret" in sys.argv


def call(kernel, out_shape, **kw):
    return pl.pallas_call(kernel, out_shape=out_shape, interpret=INTERP, **kw)


def probe_gather_scatter():
    def kern(idx_ref, plane_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)
        idx = idx_ref[0, :]  # (W,)
        mask = iota == idx[None, :]
        # gather
        val = jnp.sum(jnp.where(mask, plane_ref[:, :], 0), axis=0)
        # scatter val*2 back at idx+1
        mask2 = iota == (idx[None, :] + 1)
        out_ref[:, :] = jnp.where(mask2, val[None, :] * 2, plane_ref[:, :])

    rng = np.random.default_rng(0)
    plane = rng.integers(0, 1000, size=(N, W)).astype(np.int32)
    idx = rng.integers(0, N - 1, size=(1, W)).astype(np.int32)
    out = call(
        kern, jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(plane))
    out = np.asarray(out)
    exp = plane.copy()
    exp[idx[0] + 1, np.arange(W)] = plane[idx[0], np.arange(W)] * 2
    ok = (out == exp).all()
    print("gather/scatter i32:", "OK" if ok else "FAIL")
    return ok


def probe_gather_i16():
    def kern(idx_ref, plane_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)
        idx = idx_ref[0, :].astype(jnp.int32)
        mask = iota == idx[None, :]
        val = jnp.sum(
            jnp.where(mask, plane_ref[:, :].astype(jnp.int32), 0), axis=0
        ).astype(jnp.int16)
        out_ref[:, :] = jnp.where(
            mask, val[None, :] + jnp.int16(1), plane_ref[:, :]
        )

    rng = np.random.default_rng(1)
    plane = rng.integers(-100, 100, size=(N, W)).astype(np.int16)
    idx = rng.integers(0, N, size=(1, W)).astype(np.int32)
    out = call(
        kern, jax.ShapeDtypeStruct((N, W), jnp.int16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(plane))
    out = np.asarray(out)
    exp = plane.copy()
    exp[idx[0], np.arange(W)] = plane[idx[0], np.arange(W)] + 1
    ok = (out == exp).all()
    print("gather/scatter i16:", "OK" if ok else "FAIL")
    return ok


def probe_dyn_bound_ring_shift():
    D, Lp = 16, 384

    def kern(lens_ref, out_ref, ring):
        # dynamic bound = max over lanes
        bound = jnp.max(lens_ref[0, :])

        def body(r, acc):
            # ring write at r % D, read at (r-1) % D
            ring[(r - 1) % D] = acc + 1
            prev = ring[(r - 1) % D]
            # sublane-axis shift by 1 (concat)
            sh = jnp.concatenate(
                [jnp.full((1, W), -7, jnp.int32), prev[:-1, :]], axis=0
            )
            return sh

        acc = jax.lax.fori_loop(
            0, bound, body, jnp.zeros((Lp, W), jnp.int32)
        )
        out_ref[:, :] = acc

    lens = np.full((1, W), 3, np.int32)
    lens[0, 5] = 7  # max = 7
    out = call(
        kern, jax.ShapeDtypeStruct((Lp, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((D, Lp, W), jnp.int32)],
    )(jnp.asarray(lens))
    out = np.asarray(out)
    # after 7 iterations: acc = shift^7 of cumulative +1s; row 0..6 = -7,
    # row 7.. = 7 - ... compute reference
    acc = np.zeros((Lp, W), np.int32)
    for r in range(7):
        t = acc + 1
        acc = np.concatenate([np.full((1, W), -7, np.int32), t[:-1]], axis=0)
    ok = (out == acc).all()
    print("dyn-bound + ring + sublane shift:", "OK" if ok else "FAIL")
    return ok


def probe_scalar_loads_i8():
    # Mosaic only supports 32-bit scalar vector.extracts, so i8 codes must
    # be packed 4-per-i32-word for scalar dynamic loads (same contract as
    # the existing kernel's seqs_s_ref packing).
    R, Lp = 64, 384

    def kern(codes_ref, ij_ref, out_ref):
        def body(w, acc):
            i = ij_ref[0, w]
            j = ij_ref[1, w]
            word = codes_ref[i, j >> 2, w]
            v = (word >> ((j & 3) * 8)) & 0xFF
            out_ref[0, w] = v
            return acc

        jax.lax.fori_loop(0, W, body, jnp.int32(0))

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 34, size=(R, Lp, W)).astype(np.int8)
    packed = (
        codes.astype(np.uint32).reshape(R, Lp // 4, 4, W)
        * (1 << (8 * np.arange(4)[None, None, :, None]))
    ).sum(2).astype(np.int32)
    ij = np.stack([
        rng.integers(0, R, size=W),
        rng.integers(0, Lp, size=W),
    ]).astype(np.int32)
    f = call(
        kern, jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    f = jax.jit(f)
    out = np.asarray(f(jnp.asarray(packed), jnp.asarray(ij)))
    exp = codes[ij[0], ij[1], np.arange(W)].astype(np.int32)
    ok = (out[0] == exp).all()
    if INTERP:
        print("scalar dyn loads, packed-i8 VMEM:", "OK" if ok else "FAIL")
        return ok
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(jnp.asarray(packed), jnp.asarray(ij)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(
        f"scalar dyn loads, packed-i8 VMEM: {'OK' if ok else 'FAIL'}  "
        f"{dt / W * 1e9:.0f} ns/load ({dt * 1e3:.3f} ms for {W})"
    )
    return ok


def probe_hbm_roundtrip():
    R, Lp = 64, 384
    CH = 16

    def kern(x_ref, hbm_ref, out_ref, stage, back, sem1, sem2):
        # write x*3 to HBM in row chunks, read back rows [16:32) into
        # scratch, emit
        def chunk(c, _):
            stage[:, :] = x_ref[pl.ds(c * CH, CH), :] * 3
            cp = pltpu.make_async_copy(
                stage, hbm_ref.at[pl.ds(c * CH, CH), :], sem1
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, R // CH, chunk, 0)
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(16, CH), :], back, sem2
        )
        cp.start()
        cp.wait()
        out_ref[:, :] = back[:, :]

    rng = np.random.default_rng(3)
    x = rng.integers(0, 40, size=(R, Lp)).astype(np.int32)
    hbm, out = call(
        kern,
        (
            jax.ShapeDtypeStruct((R, Lp), jnp.int32),
            jax.ShapeDtypeStruct((CH, Lp), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CH, Lp), jnp.int32),
            pltpu.VMEM((CH, Lp), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(x))
    out = np.asarray(out)
    ok = (out == x[16:32] * 3).all()
    print("HBM DMA roundtrip:", "OK" if ok else "FAIL")
    return ok


def probe_onehot_rate():
    """Measure one-hot gather cost: K gathers from (N, W) i32 plane."""
    K = 512

    def kern(idx_ref, plane_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)

        def body(k, acc):
            mask = iota == idx_ref[k, :][None, :]
            return acc + jnp.sum(jnp.where(mask, plane_ref[:, :], 0), axis=0)

        out_ref[0, :] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((W,), jnp.int32)
        )

    rng = np.random.default_rng(4)
    plane = rng.integers(0, 100, size=(N, W)).astype(np.int32)
    idx = rng.integers(0, N, size=(K, W)).astype(np.int32)
    f = call(
        kern, jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    out = np.asarray(f(jnp.asarray(idx), jnp.asarray(plane)))
    exp = plane[idx, np.arange(W)[None, :]].sum(0)
    ok = (out[0] == exp).all()
    if INTERP:
        print("one-hot gather loop:", "OK" if ok else "FAIL")
        return ok
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(jnp.asarray(idx), jnp.asarray(plane)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(
        f"one-hot gather loop: {'OK' if ok else 'FAIL'}  "
        f"{dt / K * 1e9:.0f} ns/gather ({dt * 1e3:.2f} ms for {K})"
    )
    return ok


def main():
    probes = {
        "gather": probe_gather_scatter,
        "gather16": probe_gather_i16,
        "ring": probe_dyn_bound_ring_shift,
        "scalar": probe_scalar_loads_i8,
        "hbm": probe_hbm_roundtrip,
        "rate": probe_onehot_rate,
    }
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(probes)
    oks = [probes[n]() for n in names]
    print("ALL OK" if all(oks) else "SOME FAILED")


if __name__ == "__main__":
    main()
