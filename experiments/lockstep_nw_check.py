"""Parity check: lockstep NW+TB kernels vs jax_poa.nw_batched_fast.

Run with GW_TEST_CPU-style env for interpret mode:
    JAX_PLATFORMS=cpu python experiments/lockstep_nw_check.py [round]
or on-chip (compiled):
    python experiments/lockstep_nw_check.py [round] --compiled
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

COMPILED = "--compiled" in sys.argv
if not COMPILED:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from genomeworks_tpu.poa import jax_poa as jp
from genomeworks_tpu.poa import lockstep as ls
from genomeworks_tpu.ops import poa_lockstep_pallas as lk
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)

B, S, Lb = 128, 8, 60
N, E, A, D = 128, 7, 8, 32
ROUNDS = int([a for a in sys.argv[1:] if not a.startswith("-")][0]) if [
    a for a in sys.argv[1:] if not a.startswith("-")
] else 2

rng = np.random.default_rng(42)
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
for s in range(1, ROUNDS):
    state, far = jp.poa_step_batched(
        state, seqs_j[:, s], lens_j[:, s], wts, act, s,
        gap=-8, mismatch=-6, match=8, max_dist=D, n_rows=N,
    )
    assert not bool(jnp.any(far)), "far pred in tiny test"
print("graph built; node counts:", np.asarray(state["node_count"])[:4],
      "err:", int(jnp.sum(state["error"] != 0)))

s = ROUNDS
read = seqs_j[:, s]
rl = lens_j[:, s]
ag0, ar0, k0, failed0, far0 = jp.nw_batched_fast(
    state, read, rl, act, gap=-8, mismatch=-6, match=8,
    max_dist=D, n_rows=N,
)
ag0, ar0, k0 = np.asarray(ag0), np.asarray(ar0), np.asarray(k0)
print("ref aln lens:", k0[:8], "failed:", int(jnp.sum(failed0)),
      "far:", int(jnp.sum(far0)))

# ---- lockstep kernels ----------------------------------------------------
NG = B // ls.W
planes = ls.to_planes(state, NG)
Wp = (L + 1 + 7) // 8
Lp = 8 * Wp
rpl, lnp = ls.read_planes(seqs_j, lens_j, Lp)
actp = jnp.ones((NG, 1, ls.W), jnp.int32)

codes, best_i, err_nw = lk.nw_lockstep(
    planes, rpl[:, s], lnp[:, s : s + 1].reshape(NG, 1, ls.W), actp,
    D=D, gap=-8, mismatch=-6, match=8, interpret=not COMPILED,
)
K = N + L + 2
K = ((K + 7) // 8) * 8
ag1, ar1, k1, err_tb = lk.tb_lockstep(
    planes, codes, best_i,
    lnp[:, s : s + 1].reshape(NG, 1, ls.W), actp, err_nw,
    K=K, Lp=Lp, interpret=not COMPILED,
)
ag1 = np.asarray(jnp.transpose(ag1, (0, 2, 1)).reshape(B, K))
ar1 = np.asarray(jnp.transpose(ar1, (0, 2, 1)).reshape(B, K))
k1 = np.asarray(k1).reshape(B)
err_nw_h = np.asarray(err_nw).reshape(B)
err_tb_h = np.asarray(err_tb).reshape(B)
print("lockstep aln lens:", k1[:8], "err_nw:", err_nw_h.sum(),
      "err_tb nonzero:", (err_tb_h != 0).sum())

bad = 0
for b in range(B):
    if k0[b] != k1[b]:
        print(f"window {b}: len mismatch {k0[b]} vs {k1[b]}")
        bad += 1
        continue
    kk = k0[b]
    if not (ag0[b, :kk] == ag1[b, :kk]).all() or not (
        ar0[b, :kk] == ar1[b, :kk]
    ).all():
        print(f"window {b}: alignment mismatch")
        ii = np.where(
            (ag0[b, :kk] != ag1[b, :kk]) | (ar0[b, :kk] != ar1[b, :kk])
        )[0]
        print("  first diffs at", ii[:5])
        print("  ref ag", ag0[b, max(0, ii[0] - 2) : ii[0] + 3],
              "ar", ar0[b, max(0, ii[0] - 2) : ii[0] + 3])
        print("  new ag", ag1[b, max(0, ii[0] - 2) : ii[0] + 3],
              "ar", ar1[b, max(0, ii[0] - 2) : ii[0] + 3])
        bad += 1
        if bad > 3:
            break
print("PARITY OK" if bad == 0 else f"{bad} windows mismatch")
