"""Full-chain parity: lockstep kernels end-to-end vs cpu_reference."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

COMPILED = "--compiled" in sys.argv
if not COMPILED:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from genomeworks_tpu.poa import cpu_reference as cr
from genomeworks_tpu.poa import jax_poa as jp
from genomeworks_tpu.poa import lockstep as ls
from genomeworks_tpu.ops import poa_lockstep_pallas as lk
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)

args = [a for a in sys.argv[1:] if not a.startswith("-")]
S = int(args[0]) if args else 6
B, Lb = 128, 60
N, E, EO, A, D = 128, 7, 8, 8, 32

rng = np.random.default_rng(11)
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
interp = not COMPILED

for s in range(1, S):
    rl = lnp[:, s].reshape(NG, 1, ls.W)
    codes, best_i, err_nw = lk.nw_lockstep(
        planes, rpl[:, s], rl, actp, D=D,
        gap=-8, mismatch=-6, match=8, interpret=interp)
    ag, ar, klen, err_tb = lk.tb_lockstep(
        planes, codes, best_i, rl, actp, err_nw, K=K, Lp=Lp,
        interpret=interp)
    planes = dict(planes)
    planes["error"] = jnp.maximum(planes["error"], err_tb)
    planes = lk.add_lockstep(
        planes, ag, ar, klen, rpl[:, s], wt_pl, actp,
        unit_w=True, interpret=interp)
    planes = lk.topsort_lockstep(planes, actp, interpret=interp)

cons, cov, length, err = lk.consensus_lockstep(
    planes, actp, interpret=interp)
cons = np.asarray(jnp.transpose(cons, (0, 2, 1)).reshape(B, N))
cov = np.asarray(jnp.transpose(cov, (0, 2, 1)).reshape(B, N))
length = np.asarray(length).reshape(B)
err = np.asarray(err).reshape(B)

bad = 0
nerr = 0
for b in range(B):
    seqs_b = [np.frombuffer(w.encode(), np.uint8) for w in windows[b]]
    try:
        c_ref, cov_ref = cr.poa_consensus(windows[b])
    except cr.PoaError:
        nerr += 1
        continue
    if err[b] != 0:
        print(f"window {b}: lockstep err {err[b]} but cpu ok")
        bad += 1
        continue
    k = int(length[b])
    got = bytes(cons[b, :k][::-1].astype(np.uint8)).decode()
    gcov = cov[b, :k][::-1]
    if got != c_ref or not np.array_equal(gcov, np.asarray(cov_ref)):
        print(f"window {b}: consensus mismatch")
        print("  ref", c_ref[:60])
        print("  got", got[:60])
        bad += 1
        if bad > 3:
            break
print(f"cpu errors skipped: {nerr}")
print("CONSENSUS PARITY OK" if bad == 0 else f"{bad} mismatch")
