"""Pallas TPU kernel: the full POA chain, one window per grid step.

This is the TPU realization of the reference's generatePOAKernel design
(cudapoa/src/cudapoa_kernels.cuh:78 — one warp per window, graph + DP
state near the compute units). XLA's lockstep-batch formulation loses to
two platform facts measured on v5e: batched per-window row gathers lower
to one-hot contractions, and scatter updates of graph arrays serialize
per element. Inside a Pallas program both become addressed loads/stores.

Memory placement is chosen from measured access latencies:
- graph state (node fields, edge/alignment lists), topological order, the
  alignment walk, and the consensus pass are POINTER-CHASING scalar code —
  they live entirely in SMEM, where a dependent scalar load costs ~3 ns
  (vs ~44 ns for a dynamic-sublane VMEM load + reduce);
- the NW score/code matrices are vector data — they live in VMEM, with
  the row sweep lane-parallel on the VPU and the in-row horizontal
  closure computed as a logarithmic prefix-max over m = row - j*gap;
- sequences are passed twice: a VMEM copy feeding the vector NW rows and
  an SMEM copy for scalar per-base access during the graph walk.

Semantics are bit-identical to genomeworks_tpu.poa.cpu_reference (the
full_band mode of the reference chain): NW per cudapoa_nw.cuh with the
reference's traceback re-derivation priority (diagonal < vertical by edge
order, then horizontal), add-alignment per cudapoa_add_alignment.cuh,
topological sort per cudapoa_topsort.cuh:46, consensus per
cudapoa_generate_consensus.cuh.

Error codes in ``err`` match jax_poa's internal codes: 0 ok, 1 node-count
overflow, 2 edge/alignment-count overflow, 3 NW traceback failure.
"""

from __future__ import annotations

import functools
import zlib

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 30)

# Source-version tag baked into the kernel program: the persistent XLA
# compilation cache does not key on the Mosaic custom-call payload, so two
# versions of this file can otherwise collide on one cache entry (the stale
# binary crashes with "TPU backend error (Internal)"). Embedding the tag in
# the kernel body forces a distinct cache key per source version.
with open(__file__, "rb") as _f:
    _SRC_TAG = zlib.crc32(_f.read()) & 0x7FFFFFFF


def _roundup(x, m):
    return ((x + m - 1) // m) * m


def _poa_kernel(
    # inputs
    nseqs_ref,    # SMEM (1, 1, 1)
    lens_ref,     # SMEM (1, 1, S)
    seqs_ref,     # VMEM (1, S, L) i32 (vector rows for NW)
    seqs_s_ref,   # SMEM (1, S, L) i32 (scalar per-base access)
    wts_s_ref,    # SMEM (1, S, L) i32
    # outputs
    cons_ref,     # SMEM (1, 1, C) i32 (BACKWARD order)
    cov_ref,      # SMEM (1, 1, C) i32
    clen_ref,     # SMEM (1, 1, 1) i32
    err_ref,      # SMEM (1, 1, 1) i32
    *rest,        # MSA=True: msa_ref SMEM (1, S, C), mlen_ref SMEM (1,1,1),
                  # then scratch; MSA=False: scratch only
    # (scratch order: scores, codes VMEM; then SMEM graph state s_node,
    # s_inc, s_outc, s_alc, s_cov, s_sort, s_pos, s_ocs, s_loc, s_csc,
    # s_cpr, s_in_e, s_in_w, s_out_e, s_al, s_ag, s_ar, sm[, s_next (N*S),
    # s_begin (S,), s_mark (N+8,), s_chk (N+8,), s_stack (2N,), s_col
    # (N+8,) when MSA])
    S: int, L: int, N: int, E: int, A: int, C: int, Lp: int,
    gap: int, mismatch: int, match: int, MSA: bool = False,
    PH: int = 0b11111,
):
    # PH: static phase bitmask for perf attribution (experiments/
    # poa_phase_profile.py). 1=NW, 2=traceback, 4=add, 8=topsort,
    # 16=consensus. Production always runs 0b11111.
    if MSA:
        (msa_ref, mlen_ref,
         scores, codes,
         s_node, s_inc, s_outc, s_alc, s_cov,
         s_sort, s_pos, s_ocs, s_loc,
         s_csc, s_cpr,
         s_in_e, s_in_w, s_out_e, s_al,
         s_ag, s_ar, sm,
         s_next, s_begin, s_mark, s_chk, s_stack, s_col) = rest
    else:
        (scores, codes,
         s_node, s_inc, s_outc, s_alc, s_cov,
         s_sort, s_pos, s_ocs, s_loc,
         s_csc, s_cpr,
         s_in_e, s_in_w, s_out_e, s_al,
         s_ag, s_ar, sm) = rest
    K = N + L
    HORIZ = 2 * E
    BIGP = 2 * E + 1
    fNEG = jnp.float32(NEG)
    SCRAP = N          # scrap node index
    ESCRAP = N * E     # scrap edge index

    ns = nseqs_ref[0, 0, 0]
    len0 = lens_ref[0, 0, 0]

    iota_lp = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    slope_f = (jnp.float32(gap) * iota_lp).astype(jnp.float32)

    # ---------------- backbone (cudapoa_kernels.cuh:200-238) -------------
    def bb(i, _):
        s_node[i] = seqs_s_ref[0, 0, i]
        s_inc[i] = jnp.where(i > 0, 1, 0)
        s_outc[i] = jnp.where(i < len0 - 1, 1, 0)
        s_alc[i] = 0
        s_cov[i] = 1
        s_sort[i] = i
        s_pos[i] = i
        s_ocs[i] = jnp.where(i < len0 - 1, 1, 0)
        s_in_e[i * E] = i - 1
        s_out_e[i * E] = i + 1
        w = wts_s_ref[0, 0, i]
        wp = wts_s_ref[0, 0, jnp.maximum(i - 1, 0)]
        s_in_w[i * E] = jnp.where(i > 0, wp + w, w)
        return 0

    jax.lax.fori_loop(0, len0, bb, 0)

    if MSA:
        # successor map: a sequence covers each node at most once, so the
        # covered out-edge is unique — s_next[node*S + s] replaces the
        # reference's per-edge coverage lists (cudapoa_add_alignment.cuh
        # :239-272) at 1/E the memory
        def ini_next(i, _):
            s_next[i] = -1
            return 0

        jax.lax.fori_loop(0, N * S, ini_next, 0)

        def bb_next(i, _):
            s_next[i * S] = jnp.where(i < len0 - 1, i + 1, -1)
            return 0

        jax.lax.fori_loop(0, len0, bb_next, 0)
        s_begin[0] = 0

    sm[0] = len0       # node_count
    sm[1] = 0          # err
    sm[7] = jnp.int32(_SRC_TAG)  # cache-key versioning (see _SRC_TAG)
    err_ref[0, 0, 0] = 0
    clen_ref[0, 0, 0] = 0

    # ============== per-sequence loop =====================================
    def seq_body(s, _):
        rl = lens_ref[0, 0, s]
        read = jnp.where(iota_l < rl, seqs_ref[0, pl.ds(s, 1), :], -1)  # (1, L)

        run = (s < ns) & (sm[1] == 0)

        # node-count guard (kernels.cuh:254-259)
        @pl.when(run & (sm[0] >= N))
        def _():
            sm[1] = 1

        @pl.when((s < ns) & (sm[1] == 0))
        def _process():
            nc = sm[0]

            # ---------------- NW (cudapoa_nw.cuh) -------------------------
            if PH & 1:
                scores[0:1, :] = slope_f

            def row_body(gp, _):
                nid = s_sort[gp]
                pc = s_inc[nid]
                gbase = s_node[nid]
                sub = jnp.where(read == gbase, match, mismatch).astype(jnp.float32)
                # shifted profile: sub_sh[j] = sub[j-1] (diag cost at col j)
                sub_sh = jnp.pad(sub, ((0, 0), (1, Lp - L - 1)))

                def pred_cands(e):
                    pred = s_in_e[nid * E + e]
                    ppos = jnp.where(pc == 0, 0, s_pos[pred] + 1)
                    prow = scores[pl.ds(ppos, 1), :]  # (1, Lp)
                    diag = jnp.pad(prow, ((0, 0), (1, 0)))[:, :Lp] + sub_sh
                    vert = prow + jnp.float32(gap)
                    c0 = jnp.sum(prow[:, 0:1]) + jnp.float32(gap)
                    return diag, vert, c0

                # predecessor 0 fast path (single-pred rows dominate): codes
                # prefer diagonal on ties (diag code e < vert code E+e)
                diag, vert, c0val = pred_cands(0)
                val = jnp.maximum(diag, vert)
                code = jnp.where(diag >= vert, 0, E)
                c0code = jnp.int32(E)

                def pred_body(e, carry):
                    val, code, c0val, c0code = carry
                    diag, vert, c0 = pred_cands(e)
                    for cand, cc in ((diag, e), (vert, E + e)):
                        better = cand > val
                        tie = cand == val
                        code = jnp.where(
                            better, cc, jnp.where(tie, jnp.minimum(code, cc), code)
                        )
                        val = jnp.maximum(val, cand)
                    c0code = jnp.where(
                        c0 > c0val, E + e,
                        jnp.where(c0 == c0val, jnp.minimum(c0code, E + e), c0code),
                    )
                    c0val = jnp.maximum(c0val, c0)
                    return val, code, c0val, c0code

                val, code, c0val, c0code = jax.lax.fori_loop(
                    1, jnp.maximum(pc, 1), pred_body, (val, code, c0val, c0code)
                )
                row = jnp.where(iota_lp == 0, c0val, val)
                row = jnp.where(iota_lp > rl, fNEG, row)
                # horizontal closure: prefix max of m = row - j*gap (exact:
                # scores are small integers in f32)
                m = row - slope_f
                sh = 1
                while sh < Lp:
                    m = jnp.maximum(
                        m, jnp.pad(m, ((0, 0), (sh, 0)), constant_values=NEG)[:, :Lp]
                    )
                    sh *= 2
                row = m + slope_f
                horiz = row == jnp.pad(row, ((0, 0), (1, 0)))[:, :Lp] + jnp.float32(gap)
                fin = jnp.where(row == val, code, BIGP)
                fin = jnp.minimum(fin, jnp.where(horiz, HORIZ, BIGP))
                fin = jnp.where(
                    iota_lp == 0, jnp.where(row == c0val, c0code, BIGP), fin
                )
                scores[pl.ds(gp + 1, 1), :] = row
                codes[pl.ds(gp + 1, 1), :] = fin
                return 0

            if PH & 1:
                jax.lax.fori_loop(0, nc, row_body, 0)

            # traceback start: first max at column rl among sink rows
            def best_body(r, carry):
                b_i, b_s = carry
                sc = jnp.sum(
                    jnp.where(iota_lp == rl, scores[pl.ds(r + 1, 1), :], 0.0)
                )
                take = (s_ocs[r] == 0) & (b_s < sc)
                return jnp.where(take, r + 1, b_i), jnp.where(take, sc, b_s)

            best, _ = jax.lax.fori_loop(0, nc, best_body, (jnp.int32(0), fNEG))

            # traceback walk
            def tb_cond(c):
                i, j, k, steps = c
                return ((i != 0) | (j != 0)) & (steps < K + 2)

            def tb_body(c):
                i, j, k, steps = c
                crow = codes[pl.ds(jnp.maximum(i, 0), 1), :]
                cd = jnp.sum(jnp.where(iota_lp == j, crow, 0))
                cd = jnp.where(i == 0, HORIZ, cd)
                is_horiz = cd == HORIZ
                is_diag = cd < E
                e = jnp.where(is_horiz, 0, cd % E)
                nid = s_sort[jnp.maximum(i - 1, 0)]
                pc = s_inc[nid]
                pred = s_in_e[nid * E + e]
                pi = jnp.where(pc == 0, 0, s_pos[pred] + 1)
                prev_i = jnp.where(is_horiz, i, pi)
                prev_j = jnp.where(is_horiz | is_diag, j - 1, j)
                s_ag[k] = jnp.where(prev_i == i, -1, nid)
                s_ar[k] = jnp.where(prev_j == j, -1, j - 1)
                return prev_i, prev_j, k + 1, steps + 1

            if PH & 2:
                i_f, j_f, aln_len, steps = jax.lax.while_loop(
                    tb_cond, tb_body, (best, rl, jnp.int32(0), jnp.int32(0))
                )

                @pl.when((i_f != 0) | (j_f != 0))
                def _():
                    sm[1] = 3
            else:
                aln_len = jnp.int32(0)

            # ------------- add alignment (cudapoa_add_alignment.cuh) ------
            @pl.when((sm[1] == 0) if PH & 4 else jnp.bool_(False))
            def _add():
                def add_body(t, carry):
                    head, prev_w = carry
                    p = aln_len - 1 - t
                    read_pos = s_ar[p]

                    def do(carry):
                        head, prev_w = carry
                        base = seqs_s_ref[0, s, read_pos]
                        w = wts_s_ref[0, s, read_pos]
                        gid = s_ag[p]
                        gid_c = jnp.maximum(gid, 0)

                        def find_aligned(_):
                            def fa(a0, acc):
                                aid = s_al[gid_c * E + a0]
                                return jnp.where(
                                    (acc == -1) & (s_node[aid] == base), aid, acc
                                )
                            return jax.lax.fori_loop(
                                0, s_alc[gid_c], fa, jnp.int32(-1)
                            )

                        gnode_base = s_node[gid_c]
                        aligned = jax.lax.cond(
                            (gid != -1) & (gnode_base != base),
                            find_aligned,
                            lambda _: jnp.int32(-1),
                            0,
                        )
                        reuse_graph = (gid != -1) & (gnode_base == base)
                        reuse_aligned = (gid != -1) & ~reuse_graph & (aligned != -1)
                        new_node = ~reuse_graph & ~reuse_aligned
                        cur = jnp.where(
                            reuse_graph, gid_c,
                            jnp.where(reuse_aligned, aligned, sm[0]),
                        )

                        @pl.when(new_node)
                        def _create():
                            sm[0] = sm[0] + 1

                            @pl.when(sm[0] >= N)
                            def _():
                                sm[1] = 1

                            @pl.when(sm[1] == 0)
                            def _():
                                s_node[cur] = base
                                s_inc[cur] = 0
                                s_outc[cur] = 0
                                s_alc[cur] = 0
                                s_cov[cur] = 0

                                @pl.when(gid != -1)
                                def _link():
                                    na = s_alc[gid_c]

                                    def la(a0, _):
                                        aid = s_al[gid_c * E + a0]
                                        s_al[aid * E + s_alc[aid]] = cur
                                        s_alc[aid] = s_alc[aid] + 1
                                        s_al[cur * E + a0] = aid
                                        return 0

                                    jax.lax.fori_loop(0, na, la, 0)
                                    s_al[gid_c * E + na] = cur
                                    s_alc[gid_c] = na + 1
                                    s_al[cur * E + na] = gid_c
                                    s_alc[cur] = na + 1

                                    @pl.when(na + 1 > A - 1)
                                    def _():
                                        sm[1] = 2

                        @pl.when((head != -1) & (sm[1] == 0))
                        def _edge():
                            ic = s_inc[cur]

                            def fe(e0, acc):
                                return jnp.where(
                                    s_in_e[cur * E + e0] == head, e0, acc
                                )

                            eslot = jax.lax.fori_loop(0, ic, fe, jnp.int32(-1))

                            @pl.when(eslot != -1)
                            def _bump():
                                idx = cur * E + jnp.maximum(eslot, 0)
                                s_in_w[idx] = s_in_w[idx] + prev_w + w

                            @pl.when(eslot == -1)
                            def _append():
                                oc = s_outc[head]
                                s_in_e[cur * E + ic] = head
                                s_in_w[cur * E + ic] = prev_w + w
                                s_inc[cur] = ic + 1
                                s_out_e[head * E + oc] = cur
                                s_outc[head] = oc + 1

                                @pl.when((oc + 1 >= E) | (ic + 1 >= E))
                                def _():
                                    sm[1] = 2

                        @pl.when(sm[1] == 0)
                        def _cov():
                            s_cov[cur] = s_cov[cur] + 1

                        if MSA:
                            @pl.when(sm[1] == 0)
                            def _msa_track():
                                s_next[
                                    jnp.where(head != -1, head, SCRAP) * S + s
                                ] = cur
                                s_begin[jnp.where(read_pos == 0, s, S)] = cur

                        return cur, w

                    return jax.lax.cond(
                        (read_pos != -1) & (sm[1] == 0), do, lambda c: c,
                        (head, prev_w),
                    )

                jax.lax.fori_loop(
                    0, aln_len, add_body, (jnp.int32(-1), jnp.int32(0))
                )

            # ------------- topological sort (cudapoa_topsort.cuh:46) ------
            @pl.when((sm[1] == 0) if PH & 8 else jnp.bool_(False))
            def _sort():
                nc2 = sm[0]

                def cp(i, _):
                    s_loc[i] = s_inc[i]
                    return 0

                jax.lax.fori_loop(0, nc2, cp, 0)

                # branch-free Kahn: non-emitting iterations write to scrap
                def seed(i, tail):
                    emit = s_loc[i] == 0
                    dst = jnp.where(emit, tail, SCRAP)
                    s_sort[dst] = i
                    s_ocs[dst] = s_outc[i]
                    s_pos[jnp.where(emit, i, SCRAP)] = tail
                    return tail + emit.astype(jnp.int32)

                tail = jax.lax.fori_loop(0, nc2, seed, jnp.int32(0))

                def expand(i, tail):
                    node = s_sort[i]

                    def eb(e0, tail):
                        out = s_out_e[node * E + e0]
                        lc = s_loc[out] - 1
                        s_loc[out] = lc
                        emit = lc == 0
                        dst = jnp.where(emit, tail, SCRAP)
                        s_sort[dst] = out
                        s_ocs[dst] = s_outc[out]
                        s_pos[jnp.where(emit, out, SCRAP)] = tail
                        return tail + emit.astype(jnp.int32)

                    return jax.lax.fori_loop(0, s_outc[node], eb, tail)

                jax.lax.fori_loop(0, nc2, expand, tail)

        return 0

    jax.lax.fori_loop(1, S, seq_body, 0)

    # =============== consensus (cudapoa_generate_consensus.cuh) ===========
    @pl.when((sm[1] == 0) if PH & 16 else jnp.bool_(False))
    def _consensus():
        nc = sm[0]

        def cpass(gp, carry):
            max_id, max_sc = carry
            nid = s_sort[gp]

            def eb(e0, c):
                sc, p = c
                ew = s_in_w[nid * E + e0]
                begin = s_in_e[nid * E + e0]
                take = (sc < ew) | (
                    (sc == ew)
                    & (p != -1)
                    & (s_csc[jnp.maximum(p, 0)] <= s_csc[begin])
                )
                return jnp.where(take, ew, sc), jnp.where(take, begin, p)

            sc, p = jax.lax.fori_loop(
                0, s_inc[nid], eb, (jnp.int32(-1), jnp.int32(-1))
            )
            sc = jnp.where(p != -1, sc + s_csc[jnp.maximum(p, 0)], sc)
            s_csc[nid] = sc
            s_cpr[nid] = p
            upd = max_sc <= sc
            return jnp.where(upd, nid, max_id), jnp.where(upd, sc, max_sc)

        max_id, _ = jax.lax.fori_loop(
            0, nc, cpass, (jnp.int32(0), jnp.int32(-(1 << 30)))
        )

        def bc_cond(c):
            max_id, loops = c
            return (s_outc[max_id] != 0) & (loops < nc)

        def bc_body(c):
            max_id, loops = c
            nid = s_sort[s_pos[max_id]]

            def clear_oe(e0, _):
                out = s_out_e[nid * E + e0]

                def clear_ie(i0, _):
                    iid = s_in_e[out * E + i0]
                    s_csc[jnp.where(iid != nid, iid, SCRAP)] = -1
                    return 0

                jax.lax.fori_loop(0, s_inc[out], clear_ie, 0)
                return 0

            jax.lax.fori_loop(0, s_outc[nid], clear_oe, 0)

            def rescan(gp, carry):
                m_id, m_sc = carry
                node = s_sort[gp]

                def eb(e0, c):
                    sc, p = c
                    begin = s_in_e[node * E + e0]
                    skip = s_csc[begin] == -1
                    ew = s_in_w[node * E + e0]
                    take = ~skip & (
                        (sc < ew)
                        | (
                            (sc == ew)
                            & (p != -1)
                            & (s_csc[jnp.maximum(p, 0)] <= s_csc[begin])
                        )
                    )
                    return jnp.where(take, ew, sc), jnp.where(take, begin, p)

                sc, p = jax.lax.fori_loop(
                    0, s_inc[node], eb, (jnp.int32(-1), jnp.int32(-1))
                )
                s_cpr[node] = p
                sc = jnp.where(p != -1, sc + s_csc[jnp.maximum(p, 0)], sc)
                s_csc[node] = sc
                upd = m_sc <= sc
                return jnp.where(upd, node, m_id), jnp.where(upd, sc, m_sc)

            m_id, _ = jax.lax.fori_loop(
                s_pos[max_id] + 1, nc, rescan, (jnp.int32(0), jnp.int32(0))
            )
            return m_id, loops + 1

        max_id, loops = jax.lax.while_loop(bc_cond, bc_body, (max_id, jnp.int32(0)))

        @pl.when(loops >= nc)
        def _():
            sm[1] = 3

        @pl.when(sm[1] == 0)
        def _emit():
            def em_cond(c):
                nid, k, done = c
                return (~done) & (k < C)

            def em_body(c):
                nid, k, done = c

                def cv(a0, acc):
                    return acc + s_cov[s_al[nid * E + a0]]

                cov = jax.lax.fori_loop(0, s_alc[nid], cv, s_cov[nid])
                cons_ref[0, 0, k] = s_node[nid]
                cov_ref[0, 0, k] = cov
                p = s_cpr[nid]
                return jnp.where(p == -1, nid, p), k + 1, p == -1

            nid_f, k_f, _ = jax.lax.while_loop(
                em_cond, em_body, (max_id, jnp.int32(0), False)
            )
            clen_ref[0, 0, 0] = k_f

    if MSA:
        STK = 2 * N + 8

        @pl.when(sm[1] == 0)
        def _msa():
            nc = sm[0]
            nseq = ns

            def ini(i, _):
                s_mark[i] = 0
                s_chk[i] = 1
                return 0

            jax.lax.fori_loop(0, nc, ini, 0)

            # racon/SPOA-exact DFS ordering fused with the column map
            # (cudapoa_topsort.cuh:104 + cudapoa_generate_msa.cuh:35)
            def outer(i, col):
                def run(col):
                    s_stack[0] = i

                    def wc(c):
                        return c[0] >= 0

                    def wb(c):
                        top, col = c
                        nid = s_stack[top]
                        done = s_mark[nid] == 2

                        def pp(e0, t2):
                            b = s_in_e[nid * E + e0]
                            push = (s_mark[b] != 2) & ~done
                            s_stack[jnp.where(push, t2 + 1, STK - 1)] = b
                            return t2 + push.astype(jnp.int32)

                        top2 = jax.lax.fori_loop(0, s_inc[nid], pp, top)
                        chk = s_chk[nid] == 1

                        def pa(a0, t2):
                            aid = s_al[nid * E + a0]
                            push = (s_mark[aid] != 2) & ~done & chk
                            s_stack[jnp.where(push, t2 + 1, STK - 1)] = aid
                            s_chk[jnp.where(push, aid, SCRAP)] = 0
                            return t2 + push.astype(jnp.int32)

                        top3 = jax.lax.fori_loop(0, s_alc[nid], pa, top2)
                        valid = done | (top3 == top)
                        emit = valid & ~done
                        s_mark[jnp.where(emit, nid, SCRAP)] = 2
                        s_mark[jnp.where((~valid) & (~done), nid, SCRAP)] = 1
                        emitc = emit & chk
                        s_col[jnp.where(emitc, nid, SCRAP)] = col

                        def ec(a0, _):
                            aid = s_al[nid * E + a0]
                            s_col[jnp.where(emitc, aid, SCRAP)] = col
                            return 0

                        jax.lax.fori_loop(0, s_alc[nid], ec, 0)
                        col = col + emitc.astype(jnp.int32)
                        top_new = jnp.where(valid, top - 1, top3)
                        return top_new, col

                    top_f, col = jax.lax.while_loop(wc, wb, (jnp.int32(0), col))
                    return col

                return jax.lax.cond(s_mark[i] == 0, run, lambda c: c, col)

            msa_len = jax.lax.fori_loop(0, nc, outer, jnp.int32(0))
            mlen_ref[0, 0, 0] = msa_len

            # per-sequence gapped rows (generateMSADevice,
            # cudapoa_generate_msa.cuh:56): prefill '-', then walk the
            # successor chain writing bases at the node columns
            def prefill(t, _):
                msa_ref[0, t // C, t % C] = 45  # '-'
                return 0

            jax.lax.fori_loop(0, S * C, prefill, 0)

            def emit_seq(sq, _):
                @pl.when(sq < nseq)
                def _():
                    def wc(c):
                        nid, steps = c
                        return (nid != -1) & (steps < N + 2)

                    def wb(c):
                        nid, steps = c
                        msa_ref[0, sq, s_col[nid]] = s_node[nid]
                        return s_next[nid * S + sq], steps + 1

                    jax.lax.while_loop(wc, wb, (s_begin[sq], jnp.int32(0)))

                return 0

            jax.lax.fori_loop(0, S, emit_seq, 0)

        @pl.when(sm[1] != 0)
        def _msa_err():
            mlen_ref[0, 0, 0] = 0

    err_ref[0, 0, 0] = sm[1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "L", "N", "E", "A", "gap", "mismatch", "match", "interpret",
        "msa", "phases",
    ),
)
def poa_consensus_pallas(seqs, wts, lens, nseqs,
                         S: int, L: int, N: int, E: int, A: int,
                         gap: int = -8, mismatch: int = -6, match: int = 8,
                         interpret: bool = False, msa: bool = False,
                         phases: int = 0b11111):
    """Run the full POA chain per window. seqs/wts (B, S, L) i32,
    lens (B, S) i32, nseqs (B,) i32. Returns (consensus (B, C) i32 in
    BACKWARD order, coverage (B, C) i32, lengths (B,), err (B,)) and, when
    ``msa``, additionally (msa (B, S, C) i32 gapped rows, msa_len (B,)).

    Note: alignment lists share the per-node stride E with edge lists
    (A <= E is required; both are 50 in the reference)."""
    if A > E:
        raise ValueError("kernel requires max_alignments <= max_edges")
    B = seqs.shape[0]
    C = N
    Lp = _roundup(L + 1, 128)
    K = N + L

    kernel = functools.partial(
        _poa_kernel,
        S=S, L=L, N=N, E=E, A=A, C=C, Lp=Lp,
        gap=gap, mismatch=mismatch, match=match, MSA=msa, PH=phases,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, L), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, L), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ] + ([
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ] if msa else []),
        scratch_shapes=[
            pltpu.VMEM((N + 1, Lp), jnp.float32),  # scores
            pltpu.VMEM((N + 1, Lp), jnp.int32),    # codes
            pltpu.SMEM((N + 8,), jnp.int32),   # s_node
            pltpu.SMEM((N + 8,), jnp.int32),   # s_inc
            pltpu.SMEM((N + 8,), jnp.int32),   # s_outc
            pltpu.SMEM((N + 8,), jnp.int32),   # s_alc
            pltpu.SMEM((N + 8,), jnp.int32),   # s_cov
            pltpu.SMEM((N + 8,), jnp.int32),   # s_sort
            pltpu.SMEM((N + 8,), jnp.int32),   # s_pos
            pltpu.SMEM((N + 8,), jnp.int32),   # s_ocs
            pltpu.SMEM((N + 8,), jnp.int32),   # s_loc
            pltpu.SMEM((N + 8,), jnp.int32),   # s_csc
            pltpu.SMEM((N + 8,), jnp.int32),   # s_cpr
            pltpu.SMEM((N * E + 8,), jnp.int32),  # s_in_e
            pltpu.SMEM((N * E + 8,), jnp.int32),  # s_in_w
            pltpu.SMEM((N * E + 8,), jnp.int32),  # s_out_e
            pltpu.SMEM((N * E + 8,), jnp.int32),  # s_al
            pltpu.SMEM((K,), jnp.int32),       # s_ag
            pltpu.SMEM((K,), jnp.int32),       # s_ar
            pltpu.SMEM((8,), jnp.int32),       # sm
        ] + ([
            pltpu.SMEM((N * S + 8,), jnp.int32),   # s_next
            pltpu.SMEM((S + 8,), jnp.int32),       # s_begin
            pltpu.SMEM((N + 8,), jnp.int32),       # s_mark
            pltpu.SMEM((N + 8,), jnp.int32),       # s_chk
            pltpu.SMEM((2 * N + 8,), jnp.int32),   # s_stack
            pltpu.SMEM((N + 8,), jnp.int32),       # s_col
        ] if msa else []),
    )

    out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ] + ([
            jax.ShapeDtypeStruct((B, S, C), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ] if msa else []),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        nseqs.reshape(B, 1, 1).astype(jnp.int32),
        lens.reshape(B, 1, S).astype(jnp.int32),
        seqs, seqs, wts,
    )
    cons, cov, clen, err = out[:4]
    base = (cons[:, 0, :], cov[:, 0, :], clen[:, 0, 0], err[:, 0, 0])
    if msa:
        return base + (out[4], out[5][:, 0, 0])
    return base
