"""Bisect the compiled-only static-band divergence: dump scores/codes and
the SMEM boundary column per sequence, compare compiled vs interpret."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from genomeworks_tpu.ops.poa_pallas import poa_consensus_pallas
from genomeworks_tpu.poa import jax_poa
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)


def _windows(n, lo, hi, smax, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        t = generate_random_genome(int(rng.integers(lo, hi)), rng)
        k = int(rng.integers(1, smax))
        out.append([t] + [mutate_sequence(t, rng, 0.08, 0.08) for _ in range(k)])
    return out


windows = _windows(48, 100, 250, 8, seed=5)
WID = int(sys.argv[1]) if len(sys.argv) > 1 else 1
sub = [windows[WID]]
bw = 256

plan = jax_poa._pallas_banded_plan(sub, None, jax_poa.MAX_NODE_EDGES,
                                   jax_poa.MAX_NODE_ALIGNMENTS, bw, unit_w=True)
S, L, N, E_k, Gp = plan
seqs, wts, lens, nseqs = jax_poa._pack_windows(sub, None, S, L)
pad = (-1) % Gp
if pad:
    seqs = np.concatenate([seqs, np.zeros((pad, S, L), np.int32)])
    lens = np.concatenate([lens, np.zeros((pad, S), np.int32)])
    nseqs = np.concatenate([nseqs, np.zeros(pad, np.int32)])


def run(interpret, dbg_seq):
    out = poa_consensus_pallas(
        jnp.asarray(seqs.astype(np.uint8)), jnp.ones((1, 1, 1), jnp.int32),
        jnp.asarray(lens), jnp.asarray(nseqs),
        S=S, L=L, N=N, E=E_k, A=min(jax_poa.MAX_NODE_ALIGNMENTS, E_k),
        gap=-8, mismatch=-6, match=8, windows_per_step=Gp,
        band_width=bw, band_alloc=bw, adaptive=False, interpret=interpret,
        debug_scores_seq=dbg_seq)
    sc, cd, bnd, c0 = (np.asarray(x) for x in out[-4:])
    return sc[0], cd[0], bnd[0, 0], c0[0, 0], np.asarray(out[3])


nseq_real = int(nseqs[0])
# node counts per seq step from the host chain
from genomeworks_tpu.poa import cpu_reference as cr, banded as bd
ncs = []
orig = bd.nw_align_banded
def spy(graph, read, *a, **k):
    ncs.append(graph.node_count)
    return orig(graph, read, *a, **k)
bd.nw_align_banded = spy
try:
    cr.poa_consensus(sub[0], None, -8, -6, 8, None, band_mode="static_band", band_width=bw)
except Exception as e:
    print("host err:", e)
bd.nw_align_banded = spy.__wrapped__ if hasattr(spy, "__wrapped__") else orig
print("host node counts per seq:", ncs)
for s in range(1, nseq_real):
    nc = ncs[s - 1] if s - 1 < len(ncs) else N - 1
    sc_c, cd_c, bnd_c, c0_c, err_c = run(False, s)
    sc_i, cd_i, bnd_i, c0_i, err_i = run(True, s)
    rows = slice(1, nc + 1)
    sc_c, sc_i = sc_c[rows], sc_i[rows]
    cd_c, cd_i = cd_c[rows], cd_i[rows]
    bnd_c, bnd_i = bnd_c[1:nc + 1], bnd_i[1:nc + 1]
    c0_c, c0_i = c0_c[1:nc + 1], c0_i[1:nc + 1]
    ds = np.argwhere(sc_c != sc_i)
    dc = np.argwhere(cd_c != cd_i)
    db = np.argwhere(bnd_c != bnd_i)
    d0 = np.argwhere(c0_c != c0_i)
    print(f"seq {s}: score diffs {len(ds)}, code diffs {len(dc)}, "
          f"bnd diffs {len(db)}, c0 diffs {len(d0)}, err {err_c[0]}/{err_i[0]}")
    if len(ds):
        r, l = ds[0]
        print("  first score diff at row", r, "lane", l,
              "compiled", sc_c[r, l], "interp", sc_i[r, l])
        print("  row slice compiled:", sc_c[r, max(0, l - 3):l + 4])
        print("  row slice interp  :", sc_i[r, max(0, l - 3):l + 4])
    if len(dc):
        r, l = dc[0]
        print("  first code diff at row", r, "lane", l,
              "compiled", cd_c[r, l], "interp", cd_i[r, l])
    if len(db):
        print("  first bnd diff at row", db[0], bnd_c[db[0][0]], bnd_i[db[0][0]])
    if len(ds) or len(dc) or len(db) or len(d0):
        break
