"""Probe: dynamic-sublane vs dynamic-leading-dim DP row access.

The POA kernel's NW row loop stores scores/codes as (G*R1, Lp) and does
per-window dynamic-SUBLANE row loads/stores (~44 ns each, ~24 per row).
Hypothesis: a (R1, G, Lp) layout — DP row index in the LEADING dim,
window as a static sublane — makes the same accesses cheap (leading-dim
dynamic indexing is address arithmetic; the ring probe already compiles).

Measures a synthetic row loop: per row, G pred-row loads at per-window
dynamic indices + one row store, same vector op count both layouts.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, Lp = 8, 320
R1 = 513
ROWS = int(os.environ.get("ROWS", "448"))
REP = int(os.environ.get("REP", "1"))
INTERP = "--interpret" in sys.argv


def bench(name, f, *args):
    f = jax.jit(f)
    out = np.asarray(f(*args))
    if INTERP:
        print(name, "ran", out.ravel()[:3])
        return
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name}: {dt * 1e3:8.3f} ms  ({dt / (REP * ROWS) * 1e9:7.1f} ns/row)")


rng = np.random.default_rng(0)
preds_np = rng.integers(0, 256, size=(ROWS, G)).astype(np.int32)
preds = jnp.asarray(preds_np)
init = jnp.asarray(rng.standard_normal((G, Lp)).astype(np.float32))


# A: current layout (G*R1, Lp), dynamic-sublane load+store per window
def layout_a(preds, init):
    def kern(preds_ref, init_ref, out_ref, scores):
        for g in range(G):
            scores[pl.ds(g * R1, 1), :] = init_ref[g : g + 1, :]

        def body(r0, _):
            r = r0 % ROWS
            rows = []
            for g in range(G):
                pp = preds_ref[r, g]
                rows.append(scores[pl.ds(g * R1 + pp, 1), :])
            prow = jnp.concatenate(rows, axis=0)
            val = jnp.maximum(prow * 0.5, prow - 1.0)
            for g in range(G):
                scores[pl.ds(g * R1 + r + 1, 1), :] = val[g : g + 1, :]
            return 0

        jax.lax.fori_loop(0, REP * ROWS, body, 0)
        out_ref[:, :] = scores[pl.ds(R1 - 8, 8), :]

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, Lp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * R1, Lp), jnp.float32)],
        interpret=INTERP,
    )(preds, init)


# B: (R1, G, Lp) layout — dynamic leading-dim loads, one fused store
def layout_b(preds, init):
    def kern(preds_ref, init_ref, out_ref, scores):
        scores[0] = init_ref[:, :]

        def body(r0, _):
            r = r0 % ROWS
            rows = []
            for g in range(G):
                pp = preds_ref[r, g]
                rows.append(scores[pp, g : g + 1, :])
            prow = jnp.concatenate(rows, axis=0)
            val = jnp.maximum(prow * 0.5, prow - 1.0)
            scores[r + 1] = val
            return 0

        jax.lax.fori_loop(0, REP * ROWS, body, 0)
        out_ref[:, :] = scores[R1 - 1]

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((G, Lp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R1, G, Lp), jnp.float32)],
        interpret=INTERP,
    )(preds, init)


# C: like B but uniform pred load for all windows (single (G,Lp) load at
# one dynamic leading index) — the lower bound if preds could be shared
def layout_c(preds, init):
    def kern(preds_ref, init_ref, out_ref, scores):
        scores[0] = init_ref[:, :]

        def body(r0, _):
            r = r0 % ROWS
            pp = preds_ref[r, 0]
            prow = scores[pp]
            val = jnp.maximum(prow * 0.5, prow - 1.0)
            scores[r + 1] = val
            return 0

        jax.lax.fori_loop(0, REP * ROWS, body, 0)
        out_ref[:, :] = scores[R1 - 1]

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((G, Lp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R1, G, Lp), jnp.float32)],
        interpret=INTERP,
    )(preds, init)


names = [a for a in sys.argv[1:] if not a.startswith("-")] or ["a", "b", "c"]
for nm in names:
    bench({"a": "A dyn-sublane  ", "b": "B dyn-leading  ",
           "c": "C uniform-lead "}[nm],
          {"a": layout_a, "b": layout_b, "c": layout_c}[nm], preds, init)
