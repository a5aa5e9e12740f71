"""Pallas TPU kernel: the full POA chain, one window per grid step.

This is the TPU realization of the reference's generatePOAKernel design
(cudapoa/src/cudapoa_kernels.cuh:78 — one warp per window, graph + DP
state near the compute units). XLA's lockstep-batch formulation loses to
two platform facts measured on v5e: batched per-window row gathers lower
to one-hot contractions, and scatter updates of graph arrays serialize
per element. Inside a Pallas program both become addressed VMEM accesses,
so the whole chain —

  backbone -> [ NW align -> add-alignment walk -> topological sort ]* ->
  consensus

runs per window with the NW row sweep lane-parallel on the VPU and the
graph mutation as short masked vector ops, with zero HBM traffic between
phases.

Mosaic only allows dynamic indexing on SUBLANES (and scalar load/store
only in SMEM), which dictates the data layout:
- all per-node scalar fields live as STATIC LANES of one (N, 128) int32
  array (``pernode``) indexed by node id / rank on the sublane dim;
- edge/alignment lists are (N, E<=128) rows, element extraction via lane
  masks, element update via full-row masked read-modify-write;
- DP score/code matrices are (N+1, Lp) with the row on the sublane dim;
- read sequences are passed in both row layout (lane-parallel NW) and
  column layout (per-position scalar access during the graph walk).

Semantics are bit-identical to genomeworks_tpu.poa.cpu_reference (the
full_band mode of the reference chain): NW per cudapoa_nw.cuh with the
reference's traceback re-derivation priority, add-alignment per
cudapoa_add_alignment.cuh, topological sort per cudapoa_topsort.cuh:46,
consensus per cudapoa_generate_consensus.cuh.

Error codes in ``err`` match jax_poa's internal codes: 0 ok, 1 node-count
overflow, 2 edge/alignment-count overflow, 3 NW traceback failure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 30)

# pernode field lanes
F_NODE = 0      # base character
F_INC = 1       # incoming edge count
F_OUTC = 2      # outgoing edge count
F_ALC = 3       # aligned-node count
F_COV = 4       # coverage count
F_SORT = 5      # sorted_poa (indexed by rank)
F_POS = 6       # node id -> rank
F_OCS = 7       # out_count in sorted order (indexed by rank)
F_LOC = 8       # topsort local counts
F_CSC = 9       # consensus score
F_CPR = 10      # consensus predecessor
NFIELDS = 128

# aln buffer field lanes
F_AG = 0
F_AR = 1


def _roundup(x, m):
    return ((x + m - 1) // m) * m


def _poa_kernel(
    # inputs
    nseqs_ref,    # SMEM (1, 1, 1)
    lens_ref,     # SMEM (1, 1, S)
    seqs_ref,     # VMEM (1, S, L) i32 (row layout)
    seqs_c_ref,   # VMEM (1, L, S) i32 (column layout)
    wts_c_ref,    # VMEM (1, L, S) i32 (column layout)
    # outputs
    out_ref,      # VMEM (1, C, 128) i32: lane 0 = consensus (BACKWARD), 1 = coverage
    clen_ref,     # SMEM (1, 1, 1) i32
    err_ref,      # SMEM (1, 1, 1) i32
    # scratch
    pernode,      # VMEM (N, 128) i32 — per-node fields (see F_*)
    in_e,         # VMEM (N, E) i32
    in_w,         # VMEM (N, E) i32
    out_e,        # VMEM (N, E) i32
    al,           # VMEM (N, A) i32
    scores,       # VMEM (N + 1, Lp) f32
    codes,        # VMEM (N + 1, Lp) i32
    aln,          # VMEM (KR, 128) i32 — 64 walk entries per row, lanes
                  # (k%64)*2 + {F_AG, F_AR}
    sm,           # SMEM (8,) i32 scalars: 0 node_count, 1 err
    *,
    S: int, L: int, N: int, E: int, A: int, C: int, Lp: int,
    gap: int, mismatch: int, match: int,
):
    K = N + L
    HORIZ = 2 * E        # must stay < 128: codes live in an int8 matrix
    BIGP = 2 * E + 1
    fNEG = jnp.float32(NEG)

    ns = nseqs_ref[0, 0, 0]
    len0 = lens_ref[0, 0, 0]

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, NFIELDS), 1)
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    iota_lp = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    fieldn = jax.lax.broadcasted_iota(jnp.int32, (N, NFIELDS), 1)
    lane_ne = jax.lax.broadcasted_iota(jnp.int32, (N, E), 1)

    # ---- scalar helpers (Mosaic: dynamic index only on sublanes) --------
    def pget(f, idx):
        return jnp.sum(pernode[pl.ds(idx, 1), f : f + 1])

    def pset(f, idx, val):
        pernode[pl.ds(idx, 1), f : f + 1] = jnp.full((1, 1), val, jnp.int32)

    def eget(ref, nid, e):
        row = ref[pl.ds(nid, 1), :]
        lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        return jnp.sum(jnp.where(lane == e, row, 0))

    def eset(ref, nid, e, val):
        row = ref[pl.ds(nid, 1), :]
        lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        ref[pl.ds(nid, 1), :] = jnp.where(lane == e, val, row)

    def aget(k, f):
        row = aln[pl.ds(k // 64, 1), :]
        return jnp.sum(jnp.where(lane_f == (k % 64) * 2 + f, row, 0))

    # ---------------- backbone (cudapoa_kernels.cuh:200-238) -------------
    seq0_col = seqs_c_ref[0, :, 0:1]  # (L, 1)
    w0_col = wts_c_ref[0, :, 0:1]     # (L, 1)
    in_graph = rown < len0  # (N, 1)

    base_col = jnp.pad(seq0_col, ((0, N - L), (0, 0)))
    w_col = jnp.pad(w0_col, ((0, N - L), (0, 0)))
    wprev_col = jnp.pad(w0_col, ((1, N - L - 1), (0, 0)))

    pn = jnp.zeros((N, NFIELDS), jnp.int32)
    pn = jnp.where(fieldn == F_NODE, jnp.where(in_graph, base_col, 0), pn)
    pn = jnp.where(fieldn == F_INC, jnp.where(in_graph & (rown > 0), 1, 0), pn)
    pn = jnp.where(fieldn == F_OUTC, jnp.where(rown < len0 - 1, 1, 0), pn)
    pn = jnp.where(fieldn == F_COV, jnp.where(in_graph, 1, 0), pn)
    pn = jnp.where(fieldn == F_SORT, rown, pn)
    pn = jnp.where(fieldn == F_POS, rown, pn)
    pn = jnp.where(fieldn == F_OCS, jnp.where(rown < len0 - 1, 1, 0), pn)
    pernode[:, :] = pn

    in_e[:, :] = jnp.where(lane_ne == 0, rown - 1, 0)
    out_e[:, :] = jnp.where(lane_ne == 0, rown + 1, 0)
    bw_col = jnp.where(rown == 0, w_col, wprev_col + w_col)
    in_w[:, :] = jnp.where(lane_ne == 0, bw_col, 0)

    sm[0] = len0       # node_count
    sm[1] = 0          # err
    err_ref[0, 0, 0] = 0
    clen_ref[0, 0, 0] = 0

    slope_f = (jnp.float32(gap) * iota_lp).astype(jnp.float32)

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
            scores[0:1, :] = slope_f

            def row_body(gp, _):
                nid = pget(F_SORT, gp)
                pc = pget(F_INC, nid)
                gbase = pget(F_NODE, nid)
                sub = jnp.where(read == gbase, match, mismatch).astype(jnp.float32)
                subp = jnp.pad(sub, ((0, 0), (0, Lp - L)))
                in_row = in_e[pl.ds(nid, 1), :]  # (1, E)

                def pred_body(e, carry):
                    val, code, c0val, c0code = carry
                    pred = jnp.sum(jnp.where(lane_e == e, in_row, 0))
                    ppos = jnp.where(pc == 0, 0, pget(F_POS, pred) + 1)
                    prow = scores[pl.ds(ppos, 1), :]  # (1, Lp)
                    diag = jnp.pad(prow, ((0, 0), (1, 0)))[:, :Lp] + jnp.pad(
                        subp, ((0, 0), (1, 0))
                    )[:, :Lp]
                    vert = prow + jnp.float32(gap)
                    for cand, cc in ((diag, e), (vert, E + e)):
                        better = cand > val
                        tie = cand == val
                        code = jnp.where(
                            better, cc, jnp.where(tie, jnp.minimum(code, cc), code)
                        )
                        val = jnp.maximum(val, cand)
                    c0 = jnp.sum(prow[:, 0:1]) + jnp.float32(gap)
                    c0code = jnp.where(
                        c0 > c0val, E + e,
                        jnp.where(c0 == c0val, jnp.minimum(c0code, E + e), c0code),
                    )
                    c0val = jnp.maximum(c0val, c0)
                    return val, code, c0val, c0code

                val0 = jnp.full((1, Lp), fNEG, jnp.float32)
                code0 = jnp.full((1, Lp), BIGP, jnp.int32)
                val, code, c0val, c0code = jax.lax.fori_loop(
                    0, jnp.maximum(pc, 1), pred_body,
                    (val0, code0, fNEG, jnp.int32(BIGP)),
                )
                row = jnp.where(iota_lp == 0, c0val, val)
                row = jnp.where(iota_lp > rl, fNEG, row)
                # horizontal closure: prefix max of row[j'] + (j-j')*gap
                sh = 1
                while sh < Lp:
                    shifted = jnp.pad(row, ((0, 0), (sh, 0)))[:, :Lp] + jnp.float32(
                        sh * gap
                    )
                    shifted = jnp.where(iota_lp >= sh, shifted, fNEG)
                    row = jnp.maximum(row, shifted)
                    sh *= 2
                horiz = row == jnp.pad(row, ((0, 0), (1, 0)))[:, :Lp] + jnp.float32(gap)
                fin = jnp.where(row == val, code, BIGP)
                fin = jnp.minimum(fin, jnp.where(horiz, HORIZ, BIGP))
                fin = jnp.where(
                    iota_lp == 0, jnp.where(row == c0val, c0code, BIGP), fin
                )
                scores[pl.ds(gp + 1, 1), :] = row
                codes[pl.ds(gp + 1, 1), :] = fin
                return 0

            jax.lax.fori_loop(0, nc, row_body, 0)

            # traceback start: first max at column rl among sink rows
            def best_body(r, carry):
                b_i, b_s = carry
                sc = jnp.sum(
                    jnp.where(iota_lp == rl, scores[pl.ds(r + 1, 1), :], 0.0)
                )
                is_sink = pget(F_OCS, r) == 0
                take = is_sink & (b_s < sc)
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
                nid = pget(F_SORT, jnp.maximum(i - 1, 0))
                pc = pget(F_INC, nid)
                pred = eget(in_e, nid, e)
                pi = jnp.where(pc == 0, 0, pget(F_POS, pred) + 1)
                prev_i = jnp.where(is_horiz, i, pi)
                prev_j = jnp.where(is_horiz | is_diag, j - 1, j)
                ag_v = jnp.where(prev_i == i, -1, nid)
                ar_v = jnp.where(prev_j == j, -1, j - 1)
                arow = aln[pl.ds(k // 64, 1), :]
                l0 = (k % 64) * 2
                aln[pl.ds(k // 64, 1), :] = jnp.where(
                    lane_f == l0 + F_AG, ag_v,
                    jnp.where(lane_f == l0 + F_AR, ar_v, arow),
                )
                return prev_i, prev_j, k + 1, steps + 1

            i_f, j_f, aln_len, steps = jax.lax.while_loop(
                tb_cond, tb_body, (best, rl, jnp.int32(0), jnp.int32(0))
            )

            @pl.when((i_f != 0) | (j_f != 0))
            def _():
                sm[1] = 3

            # ------------- add alignment (cudapoa_add_alignment.cuh) ------
            @pl.when(sm[1] == 0)
            def _add():
                def add_body(t, carry):
                    head, prev_w = carry
                    p = aln_len - 1 - t
                    read_pos = aget(p, F_AR)

                    def do(carry):
                        head, prev_w = carry
                        sc_row = seqs_c_ref[0, pl.ds(read_pos, 1), :]  # (1, S)
                        base = jnp.sum(jnp.where(lane_s == s, sc_row, 0))
                        wc_row = wts_c_ref[0, pl.ds(read_pos, 1), :]
                        w = jnp.sum(jnp.where(lane_s == s, wc_row, 0))
                        gid = aget(p, F_AG)
                        gid_c = jnp.maximum(gid, 0)

                        def find_aligned(_):
                            def fa(a0, acc):
                                aid = eget(al, gid_c, a0)
                                return jnp.where(
                                    (acc == -1) & (pget(F_NODE, aid) == base),
                                    aid,
                                    acc,
                                )
                            return jax.lax.fori_loop(
                                0, pget(F_ALC, gid_c), fa, jnp.int32(-1)
                            )

                        gnode_base = pget(F_NODE, gid_c)
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
                                # zero all fields, set base
                                pernode[pl.ds(cur, 1), :] = jnp.where(
                                    lane_f == F_NODE, base, 0
                                )

                                @pl.when(gid != -1)
                                def _link():
                                    na = pget(F_ALC, gid_c)

                                    def la(a0, _):
                                        aid = eget(al, gid_c, a0)
                                        eset(al, aid, pget(F_ALC, aid), cur)
                                        pset(F_ALC, aid, pget(F_ALC, aid) + 1)
                                        eset(al, cur, a0, aid)
                                        return 0

                                    jax.lax.fori_loop(0, na, la, 0)
                                    eset(al, gid_c, na, cur)
                                    pset(F_ALC, gid_c, na + 1)
                                    eset(al, cur, na, gid_c)
                                    pset(F_ALC, cur, na + 1)

                                    @pl.when(na + 1 > A - 1)
                                    def _():
                                        sm[1] = 2

                        @pl.when((head != -1) & (sm[1] == 0))
                        def _edge():
                            ic = pget(F_INC, cur)
                            ie_row = in_e[pl.ds(cur, 1), :]
                            emask = (lane_e < ic) & (ie_row == head)
                            exists = jnp.sum(emask.astype(jnp.int32)) > 0

                            @pl.when(exists)
                            def _bump():
                                iw_row = in_w[pl.ds(cur, 1), :]
                                in_w[pl.ds(cur, 1), :] = jnp.where(
                                    emask, iw_row + prev_w + w, iw_row
                                )

                            @pl.when(~exists)
                            def _append():
                                oc = pget(F_OUTC, head)
                                eset(in_e, cur, ic, head)
                                eset(in_w, cur, ic, prev_w + w)
                                pset(F_INC, cur, ic + 1)
                                eset(out_e, head, oc, cur)
                                pset(F_OUTC, head, oc + 1)

                                @pl.when((oc + 1 >= E) | (ic + 1 >= E))
                                def _():
                                    sm[1] = 2

                        @pl.when(sm[1] == 0)
                        def _cov():
                            pset(F_COV, cur, pget(F_COV, cur) + 1)

                        return cur, w

                    return jax.lax.cond(
                        (read_pos != -1) & (sm[1] == 0), do, lambda c: c,
                        (head, prev_w),
                    )

                jax.lax.fori_loop(
                    0, aln_len, add_body, (jnp.int32(-1), jnp.int32(0))
                )

            # ------------- topological sort (cudapoa_topsort.cuh:46) ------
            @pl.when(sm[1] == 0)
            def _sort():
                nc2 = sm[0]
                pernode[:, F_LOC : F_LOC + 1] = pernode[:, F_INC : F_INC + 1]

                def seed(i, tail):
                    def emit(tail):
                        pset(F_SORT, tail, i)
                        pset(F_POS, i, tail)
                        return tail + 1
                    return jax.lax.cond(
                        pget(F_LOC, i) == 0, emit, lambda t: t, tail
                    )

                tail = jax.lax.fori_loop(0, nc2, seed, jnp.int32(0))

                def expand(i, tail):
                    node = pget(F_SORT, i)

                    def eb(e0, tail):
                        out = eget(out_e, node, e0)
                        lc = pget(F_LOC, out) - 1
                        pset(F_LOC, out, lc)

                        def emit(tail):
                            pset(F_SORT, tail, out)
                            pset(F_POS, out, tail)
                            return tail + 1

                        return jax.lax.cond(lc == 0, emit, lambda t: t, tail)

                    return jax.lax.fori_loop(0, pget(F_OUTC, node), eb, tail)

                jax.lax.fori_loop(0, nc2, expand, tail)

                def ocs(i, _):
                    pset(F_OCS, i, pget(F_OUTC, pget(F_SORT, i)))
                    return 0

                jax.lax.fori_loop(0, nc2, ocs, 0)

        return 0

    jax.lax.fori_loop(1, S, seq_body, 0)

    # =============== consensus (cudapoa_generate_consensus.cuh) ===========
    @pl.when(sm[1] == 0)
    def _consensus():
        nc = sm[0]

        def cpass(gp, carry):
            max_id, max_sc = carry
            nid = pget(F_SORT, gp)

            def eb(e0, c):
                sc, p = c
                ew = eget(in_w, nid, e0)
                begin = eget(in_e, nid, e0)
                take = (sc < ew) | (
                    (sc == ew)
                    & (p != -1)
                    & (pget(F_CSC, jnp.maximum(p, 0)) <= pget(F_CSC, begin))
                )
                return jnp.where(take, ew, sc), jnp.where(take, begin, p)

            sc, p = jax.lax.fori_loop(
                0, pget(F_INC, nid), eb, (jnp.int32(-1), jnp.int32(-1))
            )
            sc = jnp.where(p != -1, sc + pget(F_CSC, jnp.maximum(p, 0)), sc)
            pset(F_CSC, nid, sc)
            pset(F_CPR, nid, p)
            upd = max_sc <= sc
            return jnp.where(upd, nid, max_id), jnp.where(upd, sc, max_sc)

        max_id, _ = jax.lax.fori_loop(
            0, nc, cpass, (jnp.int32(0), jnp.int32(-(1 << 30)))
        )

        def bc_cond(c):
            max_id, loops = c
            return (pget(F_OUTC, max_id) != 0) & (loops < nc)

        def bc_body(c):
            max_id, loops = c
            nid = pget(F_SORT, pget(F_POS, max_id))

            def clear_oe(e0, _):
                out = eget(out_e, nid, e0)

                def clear_ie(i0, _):
                    iid = eget(in_e, out, i0)

                    @pl.when(iid != nid)
                    def _():
                        pset(F_CSC, iid, -1)

                    return 0

                jax.lax.fori_loop(0, pget(F_INC, out), clear_ie, 0)
                return 0

            jax.lax.fori_loop(0, pget(F_OUTC, nid), clear_oe, 0)

            def rescan(gp, carry):
                m_id, m_sc = carry
                node = pget(F_SORT, gp)

                def eb(e0, c):
                    sc, p = c
                    begin = eget(in_e, node, e0)
                    skip = pget(F_CSC, begin) == -1
                    ew = eget(in_w, node, e0)
                    take = ~skip & (
                        (sc < ew)
                        | (
                            (sc == ew)
                            & (p != -1)
                            & (pget(F_CSC, jnp.maximum(p, 0)) <= pget(F_CSC, begin))
                        )
                    )
                    return jnp.where(take, ew, sc), jnp.where(take, begin, p)

                sc, p = jax.lax.fori_loop(
                    0, pget(F_INC, node), eb, (jnp.int32(-1), jnp.int32(-1))
                )
                pset(F_CPR, node, p)
                sc = jnp.where(p != -1, sc + pget(F_CSC, jnp.maximum(p, 0)), sc)
                pset(F_CSC, node, sc)
                upd = m_sc <= sc
                return jnp.where(upd, node, m_id), jnp.where(upd, sc, m_sc)

            m_id, _ = jax.lax.fori_loop(
                pget(F_POS, max_id) + 1, nc, rescan, (jnp.int32(0), jnp.int32(0))
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
                    return acc + pget(F_COV, eget(al, nid, a0))

                cov = jax.lax.fori_loop(0, pget(F_ALC, nid), cv, pget(F_COV, nid))
                orow = out_ref[0, pl.ds(k, 1), :]
                out_ref[0, pl.ds(k, 1), :] = jnp.where(
                    lane_f == 0, pget(F_NODE, nid), jnp.where(lane_f == 1, cov, orow)
                )
                p = pget(F_CPR, nid)
                return jnp.where(p == -1, nid, p), k + 1, p == -1

            nid_f, k_f, _ = jax.lax.while_loop(
                em_cond, em_body, (max_id, jnp.int32(0), False)
            )
            clen_ref[0, 0, 0] = k_f

    err_ref[0, 0, 0] = sm[1]


@functools.partial(
    jax.jit,
    static_argnames=("S", "L", "N", "E", "A", "gap", "mismatch", "match", "interpret"),
)
def poa_consensus_pallas(seqs, wts, lens, nseqs,
                         S: int, L: int, N: int, E: int, A: int,
                         gap: int = -8, mismatch: int = -6, match: int = 8,
                         interpret: bool = False):
    """Run the full POA chain per window. seqs/wts (B, S, L) i32,
    lens (B, S) i32, nseqs (B,) i32. Returns (consensus (B, C) i32 in
    BACKWARD order, coverage (B, C) i32, lengths (B,), err (B,))."""
    B = seqs.shape[0]
    C = N
    Lp = _roundup(L + 1, 128)
    K = N + L

    kernel = functools.partial(
        _poa_kernel,
        S=S, L=L, N=N, E=E, A=A, C=C, Lp=Lp,
        gap=gap, mismatch=mismatch, match=match,
    )

    seqs_c = jnp.swapaxes(seqs, 1, 2)  # (B, L, S)
    wts_c = jnp.swapaxes(wts, 1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, NFIELDS), jnp.int32),   # pernode
            pltpu.VMEM((N, E), jnp.int32),         # in_e
            pltpu.VMEM((N, E), jnp.int32),         # in_w
            pltpu.VMEM((N, E), jnp.int32),         # out_e
            pltpu.VMEM((N, A), jnp.int32),         # al
            pltpu.VMEM((N + 1, Lp), jnp.float32),  # scores
            pltpu.VMEM((N + 1, Lp), jnp.int32),    # codes
            pltpu.VMEM(((K + 63) // 64, 128), jnp.int32),  # aln (packed)
            pltpu.SMEM((8,), jnp.int32),           # scalars
        ],
    )

    out, clen, err = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, C, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        nseqs.reshape(B, 1, 1).astype(jnp.int32),
        lens.reshape(B, 1, S).astype(jnp.int32),
        seqs, seqs_c, wts_c,
    )
    return out[:, :, 0], out[:, :, 1], clen[:, 0, 0], err[:, 0, 0]
