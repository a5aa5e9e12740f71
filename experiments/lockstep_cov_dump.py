import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from genomeworks_tpu.poa import jax_poa as jp
from genomeworks_tpu.poa import lockstep as ls
from genomeworks_tpu.ops import poa_lockstep_pallas as lk
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome, mutate_sequence)

B, S, Lb = 128, 2, 60
N, E, EO, A, D = 128, 7, 8, 8, 32
rng = np.random.default_rng(7)
windows = []
for _ in range(B):
    t = generate_random_genome(Lb + int(rng.integers(0, 5)), rng)
    windows.append([t] + [mutate_sequence(t, rng, 0.05, 0.05)])
L = max(max(len(s) for s in w) for w in windows)
seqs = np.zeros((B, S, L), np.int32); lens = np.zeros((B, S), np.int32)
for b, w in enumerate(windows):
    for s, seq in enumerate(w):
        e = np.frombuffer(seq.encode(), np.uint8)
        seqs[b, s, :len(e)] = e; lens[b, s] = len(e)
seqs_j = jnp.asarray(seqs); lens_j = jnp.asarray(lens)
wts = jnp.ones((B, L), jnp.int32); act = jnp.ones(B, bool)
state = jp.init_graph_state(B, N, E, A)
state = jp.build_backbone_batched(state, seqs_j[:, 0], lens_j[:, 0], wts, act)
NG = B // ls.W
Wp = (L + 1 + 7) // 8; Lp = 8 * Wp
K = ((N + L + 2 + 7) // 8) * 8
rpl, lnp = ls.read_planes(seqs_j, lens_j, Lp)
wt_pl = jnp.ones((NG, Lp, ls.W), jnp.int32)
planes = ls.to_planes(state, NG)
actp = jnp.ones((NG, 1, ls.W), jnp.int32)
s = 1
rl = lnp[:, s].reshape(NG, 1, ls.W)
codes, best_i, err_nw = lk.nw_lockstep(
    planes, rpl[:, s], rl, actp, D=D, gap=-8, mismatch=-6, match=8,
    interpret=True)
ag, ar, klen, err_tb = lk.tb_lockstep(
    planes, codes, best_i, rl, actp, err_nw, K=K, Lp=Lp, interpret=True)
planes["error"] = jnp.maximum(planes["error"], err_tb)
p_c = lk.add_lockstep(dict(planes), ag, ar, klen, rpl[:, s], wt_pl, actp,
                      unit_w=True, interpret=False)
p_i = lk.add_lockstep(dict(planes), ag, ar, klen, rpl[:, s], wt_pl, actp,
                      unit_w=True, interpret=True)
gc = ls.from_planes(p_c); gi = ls.from_planes(p_i)
nc = np.asarray(gi["node_count"])
for key in gc:
    a, b_ = np.asarray(gc[key]), np.asarray(gi[key])
    if not np.array_equal(a, b_):
        idx = np.argwhere(a != b_)
        print(key, "differs at", idx[:6].tolist(), "of", len(idx))
        for ix in idx[:6]:
            print("   compiled", a[tuple(ix)], "interp", b_[tuple(ix)])
b0 = int(np.argwhere(np.asarray(gc["cov"]) != np.asarray(gi["cov"]))[0][0])
print("window", b0, "nc", nc[b0])
print("cov compiled", np.asarray(gc["cov"])[b0, :nc[b0]])
print("cov interp  ", np.asarray(gi["cov"])[b0, :nc[b0]])
print("klen", np.asarray(klen).reshape(B)[b0])
