"""One-hot gather rate, variant hunt.

v0 (lockstep_probes.probe_onehot_rate) measured 72.7us/gather on a
(512, 128) i32 plane — ~500x off the vector-issue bound. Suspects: the
(W,) 1D loop carry and 1D reduce result forcing per-iteration layout
conversions. Variants here keep everything 2D / tile-aligned.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
N, W, K = 512, 128, int(os.environ.get("K", "512"))
INTERP = "--interpret" in sys.argv


def timeit(name, f, *args, ok=None):
    f = jax.jit(f)
    out = np.asarray(f(*args))
    good = True if ok is None else ok(out)
    if INTERP:
        print(f"{name}: {'OK' if good else 'FAIL'}")
        return
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(
        f"{name}: {'OK' if good else 'FAIL'}  "
        f"{dt / K * 1e9:.0f} ns/gather ({dt * 1e3:.2f} ms for {K})"
    )


rng = np.random.default_rng(4)
plane_np = rng.integers(0, 100, size=(N, W)).astype(np.int32)
idx_np = rng.integers(0, N, size=(K, W)).astype(np.int32)
exp = plane_np[idx_np, np.arange(W)[None, :]].sum(0)
plane = jnp.asarray(plane_np)
idx = jnp.asarray(idx_np)


def okf(out):
    return (np.asarray(out).reshape(-1)[:W] == exp).all()


# v1: 2D keepdims accumulator
def v1(idx, plane):
    def kern(idx_ref, plane_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)

        def body(k, acc):
            mask = iota == idx_ref[pl.ds(k, 1), :]
            return acc + jnp.sum(
                jnp.where(mask, plane_ref[:, :], 0), axis=0, keepdims=True
            )

        out_ref[:, :] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((1, W), jnp.int32)
        )

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(idx, plane)


# v2: tile-aligned partial reduce — reshape (N,W) as (N/8, 8, W) adds,
# keep an (8, W) partial accumulator, single final reduce
def v2(idx, plane):
    T = N // 8

    def kern(idx_ref, plane_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)

        def body(k, acc):
            mask = iota == idx_ref[pl.ds(k, 1), :]
            sel = jnp.where(mask, plane_ref[:, :], 0).reshape(T, 8, W)
            return acc + jnp.sum(sel, axis=0)

        acc = jax.lax.fori_loop(0, K, body, jnp.zeros((8, W), jnp.int32))
        out_ref[:, :] = jnp.sum(acc, axis=0, keepdims=True)

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(idx, plane)


# v3: no reduction at all — gather via max of masked NEG (idx one-hot),
# still produces (1, W) per step but through max
def v3(idx, plane):
    def kern(idx_ref, plane_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)

        def body(k, acc):
            mask = iota == idx_ref[pl.ds(k, 1), :]
            v = jnp.max(
                jnp.where(mask, plane_ref[:, :], -(1 << 30)),
                axis=0, keepdims=True,
            )
            return acc + v

        out_ref[:, :] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((1, W), jnp.int32)
        )

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(idx, plane)


# v4: dependent-chain version (the real walk shape): next idx = gathered
# value % N, so each gather depends on the previous — measures latency,
# not throughput
def v4(idx, plane):
    def kern(idx_ref, plane_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)

        def body(k, cur):
            mask = iota == cur
            v = jnp.sum(
                jnp.where(mask, plane_ref[:, :], 0), axis=0, keepdims=True
            )
            return (v + k) % N

        out_ref[:, :] = jax.lax.fori_loop(
            0, K, body, idx_ref[pl.ds(0, 1), :]
        )

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(idx, plane)


# v5: i16 plane (half the tiles)
def v5(idx, plane16):
    def kern(idx_ref, plane_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)

        def body(k, acc):
            mask = iota == idx_ref[pl.ds(k, 1), :]
            return acc + jnp.sum(
                jnp.where(mask, plane_ref[:, :].astype(jnp.int32), 0),
                axis=0, keepdims=True,
            )

        out_ref[:, :] = jax.lax.fori_loop(
            0, K, body, jnp.zeros((1, W), jnp.int32)
        )

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(idx, plane16)


names = [a for a in sys.argv[1:] if not a.startswith("-")] or [
    "v1", "v2", "v3", "v4", "v5"
]
for nm in names:
    if nm == "v5":
        timeit("v5 i16 keepdims", v5, idx, jnp.asarray(
            plane_np.astype(np.int16)), ok=okf)
    elif nm == "v4":
        timeit("v4 dependent chain", v4, idx, plane)
    else:
        timeit(
            {"v1": "v1 keepdims", "v2": "v2 tile partial",
             "v3": "v3 max-gather"}[nm],
        {"v1": v1, "v2": v2, "v3": v3}[nm], idx, plane, ok=okf)
