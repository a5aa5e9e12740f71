"""Full-chain lockstep POA: compiled timing + parity at bench shape.

SUPERSEDED by experiments/lockstep_phase_profile.py, which times the
PRODUCTION driver (poa_batch_consensus_lockstep) per phase; this script
keeps the raw chain-builder timing for kernel-level experiments. Runs
against the production kernels via the repo-relative path (ADVICE r4).

Usage: python experiments/lockstep_full_bench.py [B S Lb N D] [--parity]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from genomeworks_tpu.poa import jax_poa as jp
from genomeworks_tpu.poa import lockstep as ls
from genomeworks_tpu.ops import poa_lockstep_pallas as lk

args = [a for a in sys.argv[1:] if not a.startswith("-")]
B = int(args[0]) if len(args) > 0 else 1024
S = int(args[1]) if len(args) > 1 else 8
Lb = int(args[2]) if len(args) > 2 else 250
N = int(args[3]) if len(args) > 3 else 512
D = int(args[4]) if len(args) > 4 else 32
PARITY = "--parity" in sys.argv
E, A = 7, 8

from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)

rng = np.random.default_rng(0)
windows = []
for _ in range(B):
    t = generate_random_genome(Lb, rng)
    windows.append(
        [t] + [mutate_sequence(t, rng, 0.03, 0.03) for _ in range(S - 1)]
    )

L = max(max(len(s) for s in w) for w in windows)
seqs, wts, lens, nseqs = jp._pack_windows(windows, None, S, L)
seqs = seqs.astype(np.int32)

NG = B // ls.W
Wp = (L + 1 + 7) // 8
Lp = 8 * Wp
K = ((N + L + 2 + 7) // 8) * 8
print(f"B={B} S={S} L={L} N={N} D={D} Lp={Lp} K={K} NG={NG}")


@jax.jit
def full_chain(seqs_j, lens_j, nseqs_j):
    Bj = seqs_j.shape[0]
    wts_j = jnp.ones((Bj, L), jnp.int32)
    state = jp.init_graph_state(Bj, N, E, A)
    state = jp.build_backbone_batched(
        state, seqs_j[:, 0], lens_j[:, 0], wts_j, nseqs_j > 0
    )
    rpl, lnp = ls.read_planes(seqs_j, lens_j, Lp)
    wt_pl = jnp.ones((NG, Lp, ls.W), jnp.int32)
    planes = ls.to_planes(state, NG)
    for s in range(1, S):
        actp = (nseqs_j > s).astype(jnp.int32).reshape(NG, 1, ls.W)
        rl = lnp[:, s].reshape(NG, 1, ls.W)
        codes, best_i, err_nw = lk.nw_lockstep(
            planes, rpl[:, s], rl, actp, D=D,
            gap=-8, mismatch=-6, match=8)
        ag, ar, klen, err_tb = lk.tb_lockstep(
            planes, codes, best_i, rl, actp, err_nw, K=K, Lp=Lp)
        planes = dict(planes)
        planes["error"] = jnp.maximum(planes["error"], err_tb)
        planes = lk.add_lockstep(
            planes, ag, ar, klen, rpl[:, s], wt_pl, actp, unit_w=True)
        planes = lk.topsort_lockstep(planes, actp)
    actp = (nseqs_j > 0).astype(jnp.int32).reshape(NG, 1, ls.W)
    cons, cov, length, err = lk.consensus_lockstep(planes, actp)
    cons = jnp.transpose(cons, (0, 2, 1)).reshape(Bj, N)
    cov = jnp.transpose(cov, (0, 2, 1)).reshape(Bj, N)
    return cons, cov, length.reshape(Bj), err.reshape(Bj)


seqs_j = jnp.asarray(seqs)
lens_j = jnp.asarray(lens)
nseqs_j = jnp.asarray(nseqs)

t0 = time.perf_counter()
cons, cov, length, err = jax.block_until_ready(
    full_chain(seqs_j, lens_j, nseqs_j)
)
print(f"compile+run: {time.perf_counter() - t0:.2f}s")
errs = np.asarray(err)
print("error codes:", dict(zip(*[x.tolist() for x in np.unique(errs, return_counts=True)])))

times = []
for _ in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(full_chain(seqs_j, lens_j, nseqs_j))
    times.append(time.perf_counter() - t0)
dt = float(np.median(times))
print(f"median {dt*1e3:.1f} ms -> {B/dt:.1f} windows/s (times: "
      + " ".join(f"{t*1e3:.0f}" for t in times) + ")")

if PARITY:
    cons = np.asarray(cons)
    cov_n = np.asarray(cov)
    length_n = np.asarray(length)
    ref_c, ref_v, ref_st = jp.poa_batch_consensus(windows)
    bad = 0
    for b in range(B):
        if errs[b] != 0:
            continue
        k = int(length_n[b])
        got = bytes(cons[b, :k][::-1].astype(np.uint8)).decode("latin1")
        gcov = cov_n[b, :k][::-1]
        if ref_st[b] != 0:
            print(f"window {b}: lockstep ok but production st={ref_st[b]}")
            bad += 1
            continue
        if got != ref_c[b] or not np.array_equal(gcov, ref_v[b]):
            bad += 1
            if bad <= 3:
                print(f"window {b} mismatch:\n  ref {ref_c[b][:70]}\n  got {got[:70]}")
    print("PARITY OK" if bad == 0 else f"{bad} mismatches")
