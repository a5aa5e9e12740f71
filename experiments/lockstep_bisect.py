"""Bisect compiled-vs-interpret divergence per lockstep kernel.

Usage: python experiments/lockstep_bisect.py <rounds> <kernels-compiled>
where kernels-compiled is a subset of "n,t,a,s,c" (nw, tb, add, sort,
consensus)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from genomeworks_tpu.poa import jax_poa as jp
from genomeworks_tpu.poa import lockstep as ls
from genomeworks_tpu.ops import poa_lockstep_pallas as lk
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)

ROUNDS = int(sys.argv[1])
comp = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else set()
B, S, Lb = 128, ROUNDS + 1, 60
N, E, EO, A, D = 128, 7, 8, 8, 32

rng = np.random.default_rng(7)
windows = []
for _ in range(B):
    t = generate_random_genome(Lb + int(rng.integers(0, 5)), rng)
    windows.append(
        [t] + [mutate_sequence(t, rng, 0.05, 0.05) for _ in range(S - 1)]
    )
L = max(max(len(s) for s in w) for w in windows)
seqs = np.zeros((B, S, L), np.int32)
lens = np.zeros((B, S), np.int32)
for b, w in enumerate(windows):
    for s, seq in enumerate(w):
        e = np.frombuffer(seq.encode(), np.uint8)
        seqs[b, s, : len(e)] = e
        lens[b, s] = len(e)
seqs_j = jnp.asarray(seqs)
lens_j = jnp.asarray(lens)
wts = jnp.ones((B, L), jnp.int32)
act = jnp.ones(B, bool)

state = jp.init_graph_state(B, N, E, A)
state = jp.build_backbone_batched(state, seqs_j[:, 0], lens_j[:, 0], wts, act)

NG = B // ls.W
Wp = (L + 1 + 7) // 8
Lp = 8 * Wp
K = ((N + L + 2 + 7) // 8) * 8
rpl, lnp = ls.read_planes(seqs_j, lens_j, Lp)
wt_pl = jnp.ones((NG, Lp, ls.W), jnp.int32)
planes = ls.to_planes(state, NG)
actp = jnp.ones((NG, 1, ls.W), jnp.int32)

ok = True
for s in range(1, ROUNDS + 1):
    rl = lnp[:, s].reshape(NG, 1, ls.W)
    codes, best_i, err_nw = lk.nw_lockstep(
        planes, rpl[:, s], rl, actp, D=D,
        gap=-8, mismatch=-6, match=8, interpret="n" not in comp)
    ag, ar, klen, err_tb = lk.tb_lockstep(
        planes, codes, best_i, rl, actp, err_nw, K=K, Lp=Lp,
        interpret="t" not in comp)
    planes = dict(planes)
    planes["error"] = jnp.maximum(planes["error"], err_tb)
    planes = lk.add_lockstep(
        planes, ag, ar, klen, rpl[:, s], wt_pl, actp,
        unit_w=True, interpret="a" not in comp)
    planes = lk.topsort_lockstep(planes, actp,
                                 interpret="s" not in comp)
    state, far = jp.poa_step_batched(
        state, seqs_j[:, s], lens_j[:, s], wts, act, s,
        gap=-8, mismatch=-6, match=8, max_dist=D, n_rows=N)
    got = ls.from_planes(planes)
    ncs = np.asarray(state["node_count"])
    for key in ("error", "node_count", "nodes", "in_count", "in_edges",
                "in_w", "out_count", "out_edges", "al", "al_count", "cov",
                "sorted", "pos_of"):
        a_ref = np.asarray(state[key])
        a_got = np.asarray(got[key])
        nbad = 0
        for b in range(B):
            n = ncs[b]
            if a_ref.ndim == 1:
                va, vb = a_ref[b], a_got[b]
            elif a_ref.ndim == 2:
                va, vb = a_ref[b, :n], a_got[b, :n]
            else:
                cnt_key = {"in_edges": "in_count", "in_w": "in_count",
                           "out_edges": "out_count", "al": "al_count"}[key]
                cnts = np.asarray(state[cnt_key])[b, :n]
                ee = a_ref.shape[2]
                msk = np.arange(ee)[None, :] < cnts[:, None]
                va = np.where(msk, a_ref[b, :n], 0)
                vb = np.where(msk, a_got[b, :n, :ee], 0)
            if not np.array_equal(va, vb):
                nbad += 1
        if nbad:
            print(f"round {s}: {key} mismatch in {nbad} windows")
            ok = False
    if not ok:
        break
    print(f"round {s} OK")
print("ALL OK" if ok else "DIVERGED")
