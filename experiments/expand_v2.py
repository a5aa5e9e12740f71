"""Prototype: division-free, gather-minimal anchor expansion.

Current _expand_sort_chain does ~8 XLA gathers at anchor scale (~106 ms
each at covid's 8.4M) plus rel//n_t and rel%n_t (no integer divide on the
VPU). This variant:

- fills monotone-index "gathers" (starts/q_first/base at rep_idx) with
  scatter + cummax (the rep_idx trick, reused),
- kills the division: scatter per-OCCURRENCE anchor bases (cumsum of n_t
  over matched q occurrences), then occ_idx/base_at come from cummaxes
  and t_off = j - base_at,
- packs (rid, pos) into one u32 when both fit 16 bits -> 1 value gather
  per side instead of 2; the non-monotone t-side gather remains.

Checks exact equality of the four sorted anchor arrays vs the current
code path on the covid workload, then times both.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from genomeworks_tpu.io.fasta import create_fasta_parser
from genomeworks_tpu.mapper import device_pipeline as dp


def expand_v2(q_rids, q_poss, t_rids, t_poss, q_first, starts, t_first_m,
              t_counts, total, cap):
    """Anchor arrays (qrid, trid, qpos, tpos) sorted by the compound key.
    Same output as the expansion+sort in _expand_sort_chain."""
    nocc = q_rids.shape[0]
    nrep = starts.shape[0]
    j = jnp.arange(cap, dtype=jnp.int32)
    in_range = j < total

    # --- occurrence level (nocc) ---
    io = jnp.arange(nocc, dtype=jnp.int32)
    ir = jnp.arange(nrep, dtype=jnp.int32)
    rep_of_occ = jax.lax.cummax(
        jnp.zeros(nocc, jnp.int32).at[q_first[:-1]].max(ir)
    )
    # per-occ t segment: pack (t_first_m, t_counts); t_first_m < 2^20-ish,
    # t_counts < 2^11 after frequency filtering. Guard: fall back handled
    # by caller when the packing is unsafe.
    tseg = (t_first_m << 11) | jnp.minimum(t_counts, (1 << 11) - 1)
    tseg_occ = tseg[rep_of_occ]
    n_t_occ = tseg_occ & ((1 << 11) - 1)
    # zero pairs for occurrences of unmatched reps: t_counts==0 there
    bases_occ = jnp.cumsum(n_t_occ) - n_t_occ  # exclusive
    bases_occ = bases_occ.astype(jnp.int32)

    # --- anchor level (cap) ---
    # occ_idx: rightmost occurrence whose base <= j (zero-length occs
    # resolve rightmost, like the starts trick)
    occ_idx = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[bases_occ].max(io)
    )
    base_at = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[bases_occ].max(bases_occ)
    )
    t_off = j - base_at
    qpacked_tab = (q_rids << 16) | (q_poss & jnp.uint32(0xFFFF))
    tpacked_tab = (t_rids << 16) | (t_poss & jnp.uint32(0xFFFF))
    qpk = qpacked_tab[occ_idx]
    tseg_at = tseg_occ[occ_idx]
    t_idx = jnp.clip((tseg_at >> 11) + t_off, 0, t_rids.shape[0] - 1)
    tpk = tpacked_tab[t_idx]

    ones = jnp.uint32(0xFFFFFFFF)
    qrid = jnp.where(in_range, qpk >> 16, ones)
    qpos = jnp.where(in_range, qpk & jnp.uint32(0xFFFF), ones)
    trid = jnp.where(in_range, tpk >> 16, ones)
    tpos = jnp.where(in_range, tpk & jnp.uint32(0xFFFF), ones)
    return jax.lax.sort((qrid, trid, qpos, tpos), num_keys=4,
                        is_stable=False)


def reference_expand(q_rids, q_poss, t_rids, t_poss, q_first, starts,
                     t_first_m, t_counts, total, cap):
    j = jnp.arange(cap, dtype=jnp.int32)
    in_range = j < total
    iq_rep = jnp.arange(starts.shape[0], dtype=jnp.int32)
    rep_idx = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[starts].max(iq_rep)
    )
    rel = j - starts[rep_idx]
    n_t = jnp.maximum(t_counts[rep_idx], 1)
    q_idx = q_first[:-1][rep_idx] + rel // n_t
    t_idx = t_first_m[rep_idx] + rel % n_t
    q_idx = jnp.clip(q_idx, 0, q_rids.shape[0] - 1)
    t_idx = jnp.clip(t_idx, 0, t_rids.shape[0] - 1)
    qrid = jnp.where(in_range, q_rids[q_idx], jnp.uint32(0xFFFFFFFF))
    trid = jnp.where(in_range, t_rids[t_idx], jnp.uint32(0xFFFFFFFF))
    qpos = jnp.where(in_range, q_poss[q_idx], jnp.uint32(0xFFFFFFFF))
    tpos = jnp.where(in_range, t_poss[t_idx], jnp.uint32(0xFFFFFFFF))
    return jax.lax.sort((qrid, trid, qpos, tpos), num_keys=4,
                        is_stable=False)


def main():
    p = create_fasta_parser(
        "/root/reference/cudamapper/data/covid-reads.fasta.gz"
    )
    idx = dp.build_index_device(p, 0, len(p), filtering_parameter=0.001)
    uq_b = dp._pow2(max(idx.u, 1))
    starts, t_first_m, t_counts, total = dp._match_counts(
        idx.unique_representations[:uq_b], idx.first_occurrence[:uq_b + 1],
        idx.unique_representations[:uq_b], idx.first_occurrence[:uq_b + 1],
        jnp.int32(idx.u), jnp.int32(idx.u))
    total_i = int(total)
    cap = dp._pow2(total_i)
    print("anchors:", total_i, "cap:", cap)
    args = (idx.read_ids, idx.positions_in_reads, idx.read_ids,
            idx.positions_in_reads, idx.first_occurrence[:uq_b + 1],
            starts, t_first_m, t_counts, total)

    f_ref = jax.jit(lambda *a: reference_expand(*a, cap=cap))
    f_v2 = jax.jit(lambda *a: expand_v2(*a, cap=cap))
    r = [np.asarray(x) for x in f_ref(*args)]
    v = [np.asarray(x) for x in f_v2(*args)]
    ok = all((a == b).all() for a, b in zip(r, v))
    print("exact equality:", ok)
    if not ok:
        for nm, a, b in zip("qrid trid qpos tpos".split(), r, v):
            bad = np.nonzero(a != b)[0]
            print(nm, "first diffs", bad[:5], a[bad[:5]], b[bad[:5]])
        return

    for nm, f in [("ref", f_ref), ("v2 ", f_v2)]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(out[0][:4])
            ts.append(time.perf_counter() - t0)
        print(nm, f"{min(ts) * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
