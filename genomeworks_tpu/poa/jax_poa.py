"""Batched TPU partial-order alignment (JAX) — the flagship compute path.

A windows-batched, fixed-shape re-design of cudapoa's generatePOAKernel
(cudapoa/src/cudapoa_kernels.cuh): where the reference assigns one warp per
window and leans on per-warp divergence, this implementation advances a
whole BATCH of windows in lockstep through the same phases —

  backbone -> [ NW align -> add-alignment walk -> topological sort ]*  ->
  consensus

with every phase expressed as fixed-shape ``lax`` control flow, vectorized
over the batch dimension:

- the sequence-vs-graph NW (cudapoa_nw.cuh) runs as a ``fori_loop`` over
  topologically sorted graph rows; per row, predecessor score rows are
  gathered, diagonal/vertical candidates reduced, and the in-row horizontal
  closure solved as a prefix max (``cummax(base - j*gap) + j*gap``) — a
  single VPU pass instead of the reference's shfl-up correction loop;
- traceback moves are recorded per cell as a PRIORITY CODE
  (diag-pred-e < vert-pred-e < horizontal, matching the reference's
  re-derivation order, cudapoa_nw.cuh:340-430) in a second predecessor
  pass; the traceback itself is then a pure pointer walk;
- the add-alignment walk (cudapoa_add_alignment.cuh) and topological sort
  (cudapoa_topsort.cuh:46) are ``scan``s whose per-step work is (B, E)- and
  (B, A)-shaped vector ops with masked flat scatters;
- consensus (cudapoa_generate_consensus.cuh) runs the heaviest-edge
  predecessor pass in topological order, the branch-completion loop, and
  backward emission, with the reference's exact tie-breaking.

Semantics are bit-equal to genomeworks_tpu.poa.cpu_reference (tested), which
in turn mirrors the reference CUDA code path for full_band mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomeworks_tpu.poa.cpu_reference import MAX_NODE_EDGES, MAX_NODE_ALIGNMENTS

NEG = np.int32(-(1 << 30))


def init_graph_state(
    B: int,
    N: int,
    E: int = MAX_NODE_EDGES,
    A: int = MAX_NODE_ALIGNMENTS,
    max_seqs: int | None = None,
):
    z = lambda *s: jnp.zeros(s, jnp.int32)
    state = {
        "nodes": z(B, N),
        "in_edges": z(B, N, E),
        "in_count": z(B, N),
        "in_w": z(B, N, E),
        "out_edges": z(B, N, E),
        "out_count": z(B, N),
        "al": z(B, N, A),
        "al_count": z(B, N),
        "cov": z(B, N),
        "sorted": z(B, N),
        "pos_of": z(B, N),
        "node_count": z(B),
        "error": z(B),
    }
    if max_seqs is not None:
        # MSA bookkeeping. Where the reference stores per-edge coverage
        # lists (cudapoa_add_alignment.cuh:239-272, N*E*S uint16 words), a
        # sequence traverses each graph node at most once, so its covered
        # out-edge is unique — the successor map seq_next[b, node, s] is an
        # equivalent, E-times smaller encoding of the MSA walk.
        state["seq_next"] = jnp.full((B, N, max_seqs), -1, jnp.int32)
        state["begin"] = z(B, max_seqs)
    return state


# ---------------------------------------------------------------------------
# backbone (cudapoa_kernels.cuh:200-238)
# ---------------------------------------------------------------------------


@jax.jit
def build_backbone_batched(state, seq, seq_len, weights, active):
    """seq (B, L) i32 base chars, seq_len (B,), weights (B, L), active (B,)."""
    B, N = state["nodes"].shape
    L = seq.shape[1]
    n_idx = jnp.arange(N)
    in_range = n_idx[None, :] < seq_len[:, None]  # (B, N) valid backbone nodes
    act = active[:, None]
    upd = act & in_range

    padseq = jnp.zeros((B, N), jnp.int32).at[:, :L].set(seq)
    padw = jnp.zeros((B, N), jnp.int32).at[:, :L].set(weights)

    st = dict(state)
    st["nodes"] = jnp.where(upd, padseq, state["nodes"])
    st["sorted"] = jnp.where(upd, n_idx[None, :], state["sorted"])
    st["pos_of"] = jnp.where(upd, n_idx[None, :], state["pos_of"])
    st["in_count"] = jnp.where(upd, jnp.where(n_idx[None, :] == 0, 0, 1), state["in_count"])
    st["out_count"] = jnp.where(
        upd, jnp.where(n_idx[None, :] == seq_len[:, None] - 1, 0, 1), state["out_count"]
    )
    st["al_count"] = jnp.where(upd, 0, state["al_count"])
    st["cov"] = jnp.where(upd, 1, state["cov"])

    in_e0 = jnp.where(upd, n_idx[None, :] - 1, state["in_edges"][:, :, 0])
    st["in_edges"] = state["in_edges"].at[:, :, 0].set(in_e0)
    out_e0 = jnp.where(upd, n_idx[None, :] + 1, state["out_edges"][:, :, 0])
    st["out_edges"] = state["out_edges"].at[:, :, 0].set(out_e0)

    prev_w = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), padw[:, :-1]], axis=1)
    w0 = jnp.where(n_idx[None, :] == 0, padw, prev_w + padw)
    in_w0 = jnp.where(upd, w0, state["in_w"][:, :, 0])
    st["in_w"] = state["in_w"].at[:, :, 0].set(in_w0)

    st["node_count"] = jnp.where(active, seq_len, state["node_count"])
    if "seq_next" in state:
        # backbone path: node i -> i+1, all covered by sequence 0
        # (kernels.cuh:212-234); begin node of sequence 0 is node 0.
        nxt0 = jnp.where(
            upd & (n_idx[None, :] < seq_len[:, None] - 1),
            n_idx[None, :] + 1,
            state["seq_next"][:, :, 0],
        )
        st["seq_next"] = state["seq_next"].at[:, :, 0].set(nxt0)
        st["begin"] = state["begin"].at[:, 0].set(
            jnp.where(active, 0, state["begin"][:, 0])
        )
    return st


# ---------------------------------------------------------------------------
# topological sort (cudapoa_topsort.cuh:46 topologicalSortDeviceUtil)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_rows",))
def topsort_batched(state, active, n_rows: int | None = None):
    B, N = state["in_count"].shape
    R = N if n_rows is None else min(n_rows, N)
    E = state["out_edges"].shape[2]
    n_idx = jnp.arange(N)[None, :]
    in_graph = n_idx < state["node_count"][:, None]

    local = jnp.where(in_graph, state["in_count"], 1 << 20)
    is_seed = local == 0
    seed_rank = jnp.cumsum(is_seed.astype(jnp.int32), axis=1) - 1
    tail0 = jnp.sum(is_seed.astype(jnp.int32), axis=1)

    big = B * N  # drop sentinel for flat scatters
    b_idx = jnp.arange(B)[:, None]
    flat_rank = jnp.where(is_seed, b_idx * N + seed_rank, big)
    sorted0 = (
        jnp.full((B * N,), -1, jnp.int32)
        .at[flat_rank.reshape(-1)]
        .set(jnp.broadcast_to(jnp.arange(N)[None, :], (B, N)).reshape(-1), mode="drop")
        .reshape(B, N)
    )
    pos0 = jnp.where(is_seed, seed_rank, -1)

    e_idx = jnp.arange(E)[None, :]

    def step2(carry, i):
        sorted_poa, pos_of, local, tail = carry
        node = jnp.take_along_axis(sorted_poa, jnp.broadcast_to(i, (B, 1)), axis=1)[:, 0]
        valid = active & (i < tail) & (node >= 0)
        node_c = jnp.clip(node, 0, N - 1)
        outs = jnp.take_along_axis(state["out_edges"], node_c[:, None, None], axis=1)[:, 0, :]
        oc = jnp.take_along_axis(state["out_count"], node_c[:, None], axis=1)[:, 0]
        emask = valid[:, None] & (e_idx < oc[:, None])
        outs_c = jnp.clip(outs, 0, N - 1)
        flat = jnp.where(emask, jnp.arange(B)[:, None] * N + outs_c, big)
        local = local.reshape(-1).at[flat.reshape(-1)].add(-1, mode="drop").reshape(B, N)
        newly = emask & (jnp.take_along_axis(local, outs_c, axis=1) == 0)
        rank = tail[:, None] + jnp.cumsum(newly.astype(jnp.int32), axis=1) - 1
        flat_r = jnp.where(newly, jnp.arange(B)[:, None] * N + rank, big)
        sorted_poa = (
            sorted_poa.reshape(-1)
            .at[flat_r.reshape(-1)]
            .set(outs_c.reshape(-1), mode="drop")
            .reshape(B, N)
        )
        flat_p = jnp.where(newly, jnp.arange(B)[:, None] * N + outs_c, big)
        pos_of = (
            pos_of.reshape(-1)
            .at[flat_p.reshape(-1)]
            .set(rank.reshape(-1), mode="drop")
            .reshape(B, N)
        )
        tail = tail + jnp.sum(newly.astype(jnp.int32), axis=1)
        return (sorted_poa, pos_of, local, tail), None

    (sorted_poa, pos_of, _, tail), _ = jax.lax.scan(
        step2, (sorted0, pos0, local, tail0), jnp.arange(R, dtype=jnp.int32)
    )
    st = dict(state)
    st["sorted"] = jnp.where(active[:, None], sorted_poa, state["sorted"])
    st["pos_of"] = jnp.where(active[:, None], pos_of, state["pos_of"])
    # a non-DAG (tail != node_count) would be a bug; record as error 100
    st["error"] = jnp.where(
        active & (tail != state["node_count"]), 100, state["error"]
    )
    return st


# ---------------------------------------------------------------------------
# sequence-vs-graph NW, full band (cudapoa_nw.cuh)
# ---------------------------------------------------------------------------


def _gather_rows(mat, idx):
    """mat (B, R, C), idx (B,) -> (B, C)."""
    return jnp.take_along_axis(mat, idx[:, None, None], axis=1)[:, 0, :]


def _gather_bn(arr, idx):
    """arr (B, N), idx (B,) -> (B,)."""
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


def _gather_bne(arr, idx):
    """arr (B, N, E), idx (B,) -> (B, E)."""
    return jnp.take_along_axis(arr, idx[:, None, None], axis=1)[:, 0, :]


@functools.partial(
    jax.jit, static_argnames=("gap", "mismatch", "match", "max_dist", "n_rows")
)
def nw_batched_fast(state, read, read_len, active,
                    gap: int, mismatch: int, match: int,
                    max_dist: int, n_rows: int):
    """Full-band NW of `read` (B, L) vs the current graphs — the flagship
    TPU path (cudapoa_nw.cuh re-designed for XLA).

    Key design constraints on TPU/XLA: per-window row gathers from a large
    carried score matrix lower to one-hot contractions, and updates of a
    large loop carry copy the whole buffer every iteration. So this kernel
    never materializes the score matrix at all:

    - the last ``max_dist`` DP rows ride the ``lax.scan`` carry as an
      unrolled tuple of (B, L+1) arrays — row rotation is pure SSA
      renaming, costing nothing;
    - predecessor rows are selected by DISTANCE (row - predecessor row in
      topological order), with per-row distance masks precomputed in one
      vectorized pass over the graph;
    - max values and traceback codes are tracked together in a single
      running (value, min-code) reduction, reproducing the reference's
      re-derivation priority (diagonal < vertical by edge order, then
      horizontal, cudapoa_nw.cuh:340-430);
    - traceback codes leave the scan through its stacked `ys` output.

    Windows containing a predecessor farther than ``max_dist`` rows are
    reported in `far` and must be re-run via :func:`nw_batched_farpred`.
    Returns (alignment_graph (B, K), alignment_read (B, K), aln_len (B,),
    failed (B,), far (B,)); alignment entries are in BACKWARD order, like
    the reference device buffers consumed by addAlignmentToGraph.
    """
    B, N = state["nodes"].shape
    E = state["in_edges"].shape[2]
    L = read.shape[1]
    D = max_dist
    R = n_rows
    HORIZ = 2 * E
    BIGP = 3 * E + 1
    fNEG = jnp.float32(NEG)

    slope = (gap * jnp.arange(L + 1)).astype(jnp.float32)

    # ---- vectorized per-row metadata (one pass over the whole graph) ----
    rows_idx = jnp.arange(R, dtype=jnp.int32)
    nids = jnp.clip(state["sorted"][:, :R], 0, N - 1)  # (B, R)
    pcs = jnp.take_along_axis(state["in_count"], nids, axis=1)
    gbases = jnp.take_along_axis(state["nodes"], nids, axis=1)
    preds = jnp.take_along_axis(state["in_edges"], nids[:, :, None], axis=1)  # (B,R,E)
    ppos = jnp.take_along_axis(
        state["pos_of"], jnp.clip(preds, 0, N - 1).reshape(B, -1), axis=1
    ).reshape(B, R, E)
    nc = jnp.where(active, state["node_count"], 0)
    row_active = rows_idx[None, :] < nc[:, None]  # (B, R)
    e_valid = jnp.arange(E)[None, None, :] < pcs[:, :, None]
    valid = e_valid & row_active[:, :, None]
    rel = rows_idx[None, :, None] - ppos  # distance k >= 1 (topological order)
    far = jnp.any(valid & (rel > D), axis=(1, 2)) & active  # (B,)
    act = active & ~far
    valid = valid & act[:, None, None]

    # distance masks: dmask[b,r,k-1] = row r has a predecessor at distance k;
    # e_at = that predecessor's (unique) edge index
    flat = (
        (jnp.arange(B)[:, None, None] * R + rows_idx[None, :, None]) * D
        + jnp.clip(rel - 1, 0, D - 1)
    )
    flat = jnp.where(valid & (rel >= 1) & (rel <= D), flat, B * R * D)
    dmask = (
        jnp.zeros((B * R * D,), jnp.bool_)
        .at[flat.reshape(-1)]
        .set(True, mode="drop")
        .reshape(B, R, D)
    )
    e_ids = jnp.broadcast_to(
        jnp.arange(E, dtype=jnp.int32)[None, None, :], (B, R, E)
    )
    e_at = (
        jnp.full((B * R * D,), E, jnp.int32)
        .at[flat.reshape(-1)]
        .min(e_ids.reshape(-1), mode="drop")
        .reshape(B, R, D)
    )
    bnd = (pcs == 0) & row_active & act[:, None]  # boundary rows: pred = row 0

    xs = (
        jnp.moveaxis(dmask, 1, 0),      # (R, B, D)
        jnp.moveaxis(e_at, 1, 0),       # (R, B, D)
        gbases.T,                        # (R, B)
        bnd.T,                           # (R, B)
        (row_active & act[:, None]).T,   # (R, B)
    )

    def body(rows, x):
        dmask_r, e_at_r, gbase_r, bnd_r, act_r = x
        sub = jnp.where(read == gbase_r[:, None], match, mismatch).astype(jnp.float32)

        # running (value, min-code) over all predecessor candidates
        val = jnp.full((B, L), fNEG)
        code = jnp.full((B, L), BIGP, jnp.int32)
        c0val = jnp.full((B,), fNEG)
        c0code = jnp.full((B,), BIGP, jnp.int32)

        def consider(val, code, cand, ccode, use):
            cand = jnp.where(use, cand, fNEG)
            better = cand > val
            tie = cand == val
            code = jnp.where(
                better, ccode, jnp.where(tie, jnp.minimum(code, ccode), code)
            )
            val = jnp.maximum(val, cand)
            return val, code

        # boundary (pc == 0): predecessor is virtual row 0 = slope, edge 0
        use_b = bnd_r[:, None]
        val, code = consider(val, code, slope[None, :-1] + sub, jnp.int32(0), use_b)
        val, code = consider(
            val, code, jnp.broadcast_to(slope[None, 1:] + gap, (B, L)), jnp.int32(E), use_b
        )
        c0val, c0code = consider(
            c0val, c0code, jnp.broadcast_to(slope[0] + gap, (B,)), jnp.int32(E), bnd_r
        )

        for k in range(1, D + 1):
            prow = rows[k - 1]
            use = dmask_r[:, k - 1][:, None]
            ec = e_at_r[:, k - 1]
            val, code = consider(val, code, prow[:, :-1] + sub, ec[:, None], use)
            val, code = consider(val, code, prow[:, 1:] + gap, (E + ec)[:, None], use)
            c0val, c0code = consider(
                c0val, c0code, prow[:, 0] + gap, E + ec, dmask_r[:, k - 1]
            )

        row = jnp.concatenate([c0val[:, None], val], axis=1)
        row = jax.lax.cummax(row - slope[None, :], axis=1) + slope[None, :]

        # codes vs the closed row: predecessor code where it still achieves
        # the final value, else horizontal
        horiz = row[:, 1:] == row[:, :-1] + gap
        fin = jnp.where(row[:, 1:] == val, code, BIGP)
        fin = jnp.minimum(fin, jnp.where(horiz, HORIZ, BIGP))
        code_row = jnp.concatenate(
            [jnp.where(row[:, 0] == c0val, c0code, BIGP)[:, None], fin], axis=1
        )

        colL = jnp.take_along_axis(row, read_len[:, None], axis=1)[:, 0]
        new_row = jnp.where(act_r[:, None], row, rows[0])
        new_rows = (new_row,) + rows[: D - 1]
        return new_rows, (code_row, colL)

    rows0 = tuple(jnp.full((B, L + 1), fNEG) for _ in range(D))
    _, (codes_ys, colL_ys) = jax.lax.scan(body, rows0, xs)
    # codes_ys (R, B, L+1); colL_ys (R, B)

    # traceback start: first max at column read_len among sink rows
    col_at_L = colL_ys.T  # (B, R)
    sorted_oc = jnp.take_along_axis(state["out_count"], nids, axis=1)  # (B, R)
    sink = (sorted_oc == 0) & row_active
    masked = jnp.where(sink, col_at_L, fNEG)
    best_i = jnp.argmax(masked, axis=1).astype(jnp.int32) + 1

    # traceback walk over the stacked code rows
    K = N + L
    ag = jnp.full((B, K), -1, jnp.int32)
    ar = jnp.full((B, K), -1, jnp.int32)
    b_idx = jnp.arange(B)
    bigflat = B * K
    codes_flat = codes_ys.reshape(-1)  # ((R*B*(L+1)),)

    def tb_cond(carry):
        i, j, k, ag, ar, steps = carry
        return jnp.any(act & ((i != 0) | (j != 0))) & (steps < K + 2)

    def tb_body(carry):
        i, j, k, ag, ar, steps = carry
        a_t = act & ((i != 0) | (j != 0))
        flat_ij = (jnp.clip(i - 1, 0, R - 1) * B + b_idx) * (L + 1) + jnp.clip(j, 0, L)
        code = codes_flat[flat_ij]
        code = jnp.where(i == 0, HORIZ, code)
        is_horiz = code == HORIZ
        is_diag = code < E
        e = jnp.where(is_horiz, 0, code % E)
        nid = jnp.clip(
            _gather_bn(state["sorted"], jnp.clip(i - 1, 0, N - 1)), 0, N - 1
        )
        pc = _gather_bn(state["in_count"], nid)
        pred = jnp.clip(
            jnp.take_along_axis(
                _gather_bne(state["in_edges"], nid), e[:, None], axis=1
            )[:, 0],
            0,
            N - 1,
        )
        pi = jnp.where(pc == 0, 0, _gather_bn(state["pos_of"], pred) + 1)
        prev_i = jnp.where(is_horiz, i, pi)
        prev_j = jnp.where(is_horiz | is_diag, j - 1, j)

        ag_val = jnp.where(prev_i == i, -1, nid)
        ar_val = jnp.where(prev_j == j, -1, j - 1)
        flat_k = jnp.where(a_t, b_idx * K + k, bigflat)
        ag = ag.reshape(-1).at[flat_k].set(ag_val, mode="drop").reshape(B, K)
        ar = ar.reshape(-1).at[flat_k].set(ar_val, mode="drop").reshape(B, K)
        i = jnp.where(a_t, prev_i, i)
        j = jnp.where(a_t, prev_j, j)
        k = k + a_t.astype(jnp.int32)
        return i, j, k, ag, ar, steps + 1

    i0 = jnp.where(act, best_i, 0)
    j0 = jnp.where(act, read_len, 0)
    i, j, k, ag, ar, steps = jax.lax.while_loop(
        tb_cond, tb_body, (i0, j0, jnp.zeros(B, jnp.int32), ag, ar, jnp.int32(0))
    )
    failed = act & ((i != 0) | (j != 0))
    return ag, ar, k, failed, far


@functools.partial(jax.jit, static_argnames=("gap", "mismatch", "match"))
def nw_batched(state, read, read_len, scores_buf, codes_buf, active,
               gap: int, mismatch: int, match: int):
    """Full-band NW of `read` (B, L) vs the current graphs — gather-based
    fallback for windows whose predecessor distance exceeds the fast
    kernel's window (see :func:`nw_batched_fast`).

    Returns (alignment_graph (B, K), alignment_read (B, K), aln_len (B,),
    scores_buf, codes_buf) with K = N + L; alignment entries are stored in
    BACKWARD order (index 0 = last move), exactly like the reference device
    buffers consumed by addAlignmentToGraph.
    """
    B, N = state["nodes"].shape
    E = state["in_edges"].shape[2]
    L = read.shape[1]
    HORIZ = 2 * E
    BIGP = 3 * E + 1

    # Scores live in float32: every score is a small exact integer
    # (|score| <= max(|gap|,|match|) * (N+L) << 2^24), and f32 lets the
    # predecessor-row gathers run as one-hot matmuls on the MXU. XLA lowers
    # int32 batched gathers from this (B, N+1, L+1) buffer to serialized
    # VPU one-hot contractions — 3 orders of magnitude slower at N ~ 3k.
    fNEG = jnp.float32(NEG)
    slope = (gap * jnp.arange(L + 1)).astype(jnp.float32)
    row_ids = jnp.arange(N + 1, dtype=jnp.int32)

    # row 0 boundary: scores[0][j] = j*gap (cudapoa_nw.cuh:185)
    scores_buf = scores_buf.at[:, 0, :].set(jnp.broadcast_to(slope, (B, L + 1)))

    max_nc = jnp.max(jnp.where(active, state["node_count"], 0))

    def row_body(gp, bufs):
        scores_buf, codes_buf = bufs
        nid = jnp.clip(_gather_bn(state["sorted"], jnp.broadcast_to(gp, (B,))), 0, N - 1)
        pc = _gather_bn(state["in_count"], nid)
        gbase = _gather_bn(state["nodes"], nid)
        preds = _gather_bne(state["in_edges"], nid)  # (B, E)
        sub = jnp.where(read == gbase[:, None], match, mismatch).astype(jnp.float32)

        max_pc = jnp.maximum(jnp.max(pc), 1)

        def gather_prow(e):
            """Predecessor score row via one-hot MXU matmul. Returns
            (prow (B, L+1) f32, use (B,) mask)."""
            pred = jnp.clip(preds[:, e], 0, N - 1)
            ppos = jnp.where(pc == 0, 0, _gather_bn(state["pos_of"], pred) + 1)
            use = (e == 0) | (e < pc)
            ppos = jnp.where(use, jnp.clip(ppos, 0, N), 0)
            onehot = (row_ids[None, :] == ppos[:, None]).astype(jnp.float32)
            prow = jnp.einsum(
                "bn,bnl->bl", onehot, scores_buf,
                preferred_element_type=jnp.float32,
            )
            return prow, use

        def e_body(e, carry):
            base, col0 = carry
            prow, use = gather_prow(e)
            cand = jnp.maximum(prow[:, :-1] + sub, prow[:, 1:] + gap)
            base = jnp.where(use[:, None], jnp.maximum(base, cand), base)
            col0 = jnp.where(use, jnp.maximum(col0, prow[:, 0] + gap), col0)
            return base, col0

        base0 = jnp.full((B, L), fNEG, jnp.float32)
        col00 = jnp.full((B,), fNEG, jnp.float32)
        base, col0 = jax.lax.fori_loop(0, max_pc, e_body, (base0, col00))

        # horizontal closure (prefix max with slope gap)
        row = jnp.concatenate([col0[:, None], base], axis=1)
        row = jax.lax.cummax(row - slope[None, :], axis=1) + slope[None, :]

        # pass 2: record priority codes against the final row values
        def e_body2(e, carry):
            best, col0_best = carry
            prow, use = gather_prow(e)
            diag_eq = row[:, 1:] == prow[:, :-1] + sub
            vert_eq = row[:, 1:] == prow[:, 1:] + gap
            cand = jnp.where(diag_eq, e, jnp.where(vert_eq, E + e, BIGP))
            cand = jnp.where(use[:, None], cand, BIGP)
            best = jnp.minimum(best, cand)
            c0 = jnp.where(use & (prow[:, 0] + gap == row[:, 0]), E + e, BIGP)
            col0_best = jnp.minimum(col0_best, c0)
            return best, col0_best

        horiz_eq = row[:, 1:] == row[:, :-1] + gap
        best0 = jnp.where(horiz_eq, HORIZ, BIGP)
        best, col0_best = jax.lax.fori_loop(0, max_pc, e_body2, (best0, jnp.full((B,), BIGP, jnp.int32)))
        code_row = jnp.concatenate([col0_best[:, None], jnp.minimum(best, jnp.where(horiz_eq, HORIZ, BIGP))], axis=1)

        scores_buf = jax.lax.dynamic_update_slice(
            scores_buf, row[:, None, :].astype(scores_buf.dtype), (0, gp + 1, 0)
        )
        codes_buf = jax.lax.dynamic_update_slice(
            codes_buf, code_row[:, None, :].astype(codes_buf.dtype), (0, gp + 1, 0)
        )
        return scores_buf, codes_buf

    scores_buf, codes_buf = jax.lax.fori_loop(0, max_nc, row_body, (scores_buf, codes_buf))

    # traceback start: first max at column read_len among sink rows
    col_at_L = jnp.take_along_axis(scores_buf, read_len[:, None, None], axis=2)[:, :, 0]
    col_at_L = col_at_L.astype(jnp.float32)
    sorted_oc = jnp.take_along_axis(
        state["out_count"], jnp.clip(state["sorted"], 0, N - 1), axis=1
    )  # (B, N) out_count in sorted order
    row_idx = jnp.arange(1, N + 1)[None, :]
    sink = (sorted_oc == 0) & (row_idx <= state["node_count"][:, None])
    masked = jnp.where(sink, col_at_L[:, 1:], jnp.float32(NEG))
    best_i = jnp.argmax(masked, axis=1).astype(jnp.int32) + 1

    # traceback walk
    K = N + L
    ag = jnp.full((B, K), -1, jnp.int32)
    ar = jnp.full((B, K), -1, jnp.int32)
    b_idx = jnp.arange(B)
    bigflat = B * K

    def tb_cond(carry):
        i, j, k, ag, ar, steps = carry
        return jnp.any(active & ((i != 0) | (j != 0))) & (steps < K + 2)

    def tb_body(carry):
        i, j, k, ag, ar, steps = carry
        act = active & ((i != 0) | (j != 0))
        flat_ij = jnp.clip(i, 0, N) * (L + 1) + jnp.clip(j, 0, L)
        code = jnp.take_along_axis(
            codes_buf.reshape(B, -1), flat_ij[:, None], axis=1
        )[:, 0]
        code = jnp.where(i == 0, HORIZ, code)
        is_horiz = code == HORIZ
        is_diag = code < E
        e = jnp.where(is_horiz, 0, code % E)
        nid = jnp.clip(
            _gather_bn(state["sorted"], jnp.clip(i - 1, 0, N - 1)), 0, N - 1
        )
        pc = _gather_bn(state["in_count"], nid)
        pred = jnp.clip(
            jnp.take_along_axis(
                _gather_bne(state["in_edges"], nid), e[:, None], axis=1
            )[:, 0],
            0,
            N - 1,
        )
        pi = jnp.where(pc == 0, 0, _gather_bn(state["pos_of"], pred) + 1)
        prev_i = jnp.where(is_horiz, i, pi)
        prev_j = jnp.where(is_horiz | is_diag, j - 1, j)

        ag_val = jnp.where(prev_i == i, -1, nid)
        ar_val = jnp.where(prev_j == j, -1, j - 1)
        flat_k = jnp.where(act, b_idx * K + k, bigflat)
        ag = ag.reshape(-1).at[flat_k].set(ag_val, mode="drop").reshape(B, K)
        ar = ar.reshape(-1).at[flat_k].set(ar_val, mode="drop").reshape(B, K)
        i = jnp.where(act, prev_i, i)
        j = jnp.where(act, prev_j, j)
        k = k + act.astype(jnp.int32)
        return i, j, k, ag, ar, steps + 1

    i0 = jnp.where(active, best_i, 0)
    j0 = jnp.where(active, read_len, 0)
    i, j, k, ag, ar, steps = jax.lax.while_loop(
        tb_cond, tb_body, (i0, j0, jnp.zeros(B, jnp.int32), ag, ar, jnp.int32(0))
    )
    failed = active & ((i != 0) | (j != 0))
    return ag, ar, k, failed, scores_buf, codes_buf


# ---------------------------------------------------------------------------
# add alignment to graph (cudapoa_add_alignment.cuh addAlignmentToGraph)
# ---------------------------------------------------------------------------


def add_alignment_batched_seq(state, ag, ar, aln_len, read, weights, active, seq_id=None):
    """Sequential (scan) alignment-to-graph walk — the exact reference
    semantics, used for the rare windows where the vectorized walk detects
    an aligned-clique conflict. Cost is proportional to the longest
    alignment among ``active`` windows (free when none are)."""
    B, N = state["nodes"].shape
    E = state["in_edges"].shape[2]
    A = state["al"].shape[2]
    L = read.shape[1]
    K = ag.shape[1]
    b_idx = jnp.arange(B)
    bigN = B * N
    bigNE = B * N * E
    bigNA = B * N * A
    e_idx = jnp.arange(E)[None, :]
    a_idx = jnp.arange(A)[None, :]

    max_len = jnp.max(jnp.where(active, aln_len, 0))

    def step(carry, t):
        st, head, prev_w = carry
        pos = jnp.clip(aln_len - 1 - t, 0, K - 1)
        act_t = active & (t < aln_len) & (st["error"] == 0)
        read_pos = _gather_bn(ar, pos)  # ar has width K; helper works for (B, K)
        gid = _gather_bn(ag, pos)
        act = act_t & (read_pos != -1)
        rp = jnp.clip(read_pos, 0, L - 1)
        w = _gather_bn(weights, rp)
        base = _gather_bn(read, rp)

        gid_c = jnp.clip(gid, 0, N - 1)
        gbase = _gather_bn(st["nodes"], gid_c)
        # aligned-node search
        al_list = _gather_bne(st["al"], gid_c)  # (B, A)
        na = _gather_bn(st["al_count"], gid_c)
        al_bases = jnp.take_along_axis(
            st["nodes"], jnp.clip(al_list, 0, N - 1), axis=1
        )  # (B, A)
        match_mask = (a_idx < na[:, None]) & (al_bases == base[:, None])
        has_aligned = jnp.any(match_mask, axis=1)
        first_aligned = jnp.take_along_axis(
            al_list, jnp.argmax(match_mask, axis=1)[:, None], axis=1
        )[:, 0]

        reuse_graph = (gid != -1) & (gbase == base)
        reuse_aligned = (gid != -1) & (gbase != base) & has_aligned
        new_node = act & ~reuse_graph & ~reuse_aligned
        new_aligned = new_node & (gid != -1)  # new node aligned to gid

        cur = jnp.where(
            reuse_graph, gid_c, jnp.where(reuse_aligned, first_aligned, st["node_count"])
        )
        cur = jnp.clip(cur, 0, N - 1)

        node_count = st["node_count"] + new_node.astype(jnp.int32)
        err = jnp.where(
            act & (node_count >= N) & new_node, 1, st["error"]
        )  # node_count_exceeded

        # init new node
        flat_cur = jnp.where(new_node, b_idx * N + cur, bigN)
        nodes = st["nodes"].reshape(-1).at[flat_cur].set(base, mode="drop").reshape(B, N)
        zero = jnp.zeros((B,), jnp.int32)
        out_count = st["out_count"].reshape(-1).at[flat_cur].set(zero, mode="drop").reshape(B, N)
        in_count = st["in_count"].reshape(-1).at[flat_cur].set(zero, mode="drop").reshape(B, N)
        al_count = st["al_count"].reshape(-1).at[flat_cur].set(zero, mode="drop").reshape(B, N)
        cov = st["cov"].reshape(-1).at[flat_cur].set(zero, mode="drop").reshape(B, N)

        # alignment-list updates for new aligned nodes
        amask = new_aligned[:, None] & (a_idx < na[:, None])  # (B, A) existing aligned
        aid_c = jnp.clip(al_list, 0, N - 1)
        aid_counts = jnp.take_along_axis(al_count, aid_c, axis=1)  # (B, A)
        flat_app = jnp.where(amask, (b_idx[:, None] * N + aid_c) * A + aid_counts, bigNA)
        al = (
            st["al"].reshape(-1)
            .at[flat_app.reshape(-1)]
            .set(jnp.broadcast_to(cur[:, None], (B, A)).reshape(-1), mode="drop")
            .reshape(B, N, A)
        )
        al_count = (
            al_count.reshape(-1)
            .at[jnp.where(amask, b_idx[:, None] * N + aid_c, bigN).reshape(-1)]
            .add(1, mode="drop")
            .reshape(B, N)
        )
        # cur's own list: [al_list[0:na], gid]
        flat_own = jnp.where(amask, (b_idx[:, None] * N + cur[:, None]) * A + a_idx, bigNA)
        al = al.reshape(-1).at[flat_own.reshape(-1)].set(al_list.reshape(-1), mode="drop").reshape(B, N, A)
        flat_gid_app = jnp.where(new_aligned, (b_idx * N + gid_c) * A + na, bigNA)
        al = al.reshape(-1).at[flat_gid_app].set(cur, mode="drop").reshape(B, N, A)
        al_count = al_count.reshape(-1).at[jnp.where(new_aligned, b_idx * N + gid_c, bigN)].set(na + 1, mode="drop").reshape(B, N)
        flat_cur_app = jnp.where(new_aligned, (b_idx * N + cur) * A + na, bigNA)
        al = al.reshape(-1).at[flat_cur_app].set(gid_c, mode="drop").reshape(B, N, A)
        al_count = al_count.reshape(-1).at[jnp.where(new_aligned, b_idx * N + cur, bigN)].set(na + 1, mode="drop").reshape(B, N)
        err = jnp.where(act & new_aligned & (na + 1 > A - 1), 2, err)

        # edge insertion/update
        has_head = act & (head != -1)
        head_c = jnp.clip(head, 0, N - 1)
        in_list = _gather_bne(st["in_edges"], cur)  # (B, E)
        ic = jnp.take_along_axis(in_count, cur[:, None], axis=1)[:, 0]
        exist_mask = has_head[:, None] & (e_idx < ic[:, None]) & (in_list == head[:, None])
        exists = jnp.any(exist_mask, axis=1)
        # weight bump on every matching slot (reference adds in the scan loop)
        flat_w = jnp.where(exist_mask, (b_idx[:, None] * N + cur[:, None]) * E + e_idx, bigNE)
        in_w = (
            st["in_w"].reshape(-1)
            .at[flat_w.reshape(-1)]
            .add(jnp.broadcast_to((prev_w + w)[:, None], (B, E)).reshape(-1), mode="drop")
            .reshape(B, N, E)
        )
        # append new edge
        app = has_head & ~exists
        flat_ie = jnp.where(app, (b_idx * N + cur) * E + ic, bigNE)
        in_edges = st["in_edges"].reshape(-1).at[flat_ie].set(head_c, mode="drop").reshape(B, N, E)
        in_w = in_w.reshape(-1).at[flat_ie].set(prev_w + w, mode="drop").reshape(B, N, E)
        in_count = in_count.reshape(-1).at[jnp.where(app, b_idx * N + cur, bigN)].add(1, mode="drop").reshape(B, N)
        oc = jnp.take_along_axis(out_count, head_c[:, None], axis=1)[:, 0]
        flat_oe = jnp.where(app, (b_idx * N + head_c) * E + oc, bigNE)
        out_edges = st["out_edges"].reshape(-1).at[flat_oe].set(cur, mode="drop").reshape(B, N, E)
        out_count = out_count.reshape(-1).at[jnp.where(app, b_idx * N + head_c, bigN)].add(1, mode="drop").reshape(B, N)
        err = jnp.where(app & ((oc + 1 >= E) | (ic + 1 >= E)), 2, err)

        # coverage
        cov = cov.reshape(-1).at[jnp.where(act, b_idx * N + cur, bigN)].add(1, mode="drop").reshape(B, N)

        # MSA bookkeeping: successor of head on this sequence's path, and
        # the sequence's begin node (add_alignment.cuh:215-272).
        if "seq_next" in st:
            S = st["seq_next"].shape[2]
            flat_sn = jnp.where(has_head, (b_idx * N + head_c) * S + seq_id, B * N * S)
            st = dict(st)
            st["seq_next"] = (
                st["seq_next"].reshape(-1).at[flat_sn].set(cur, mode="drop").reshape(B, N, S)
            )
            beg = act & (read_pos == 0)
            flat_bg = jnp.where(beg, b_idx * S + seq_id, B * S)
            st["begin"] = (
                st["begin"].reshape(-1).at[flat_bg].set(cur, mode="drop").reshape(B, S)
            )

        st = dict(st)
        st["nodes"] = nodes
        st["in_edges"] = in_edges
        st["in_count"] = in_count
        st["in_w"] = in_w
        st["out_edges"] = out_edges
        st["out_count"] = out_count
        st["al"] = al
        st["al_count"] = al_count
        st["cov"] = cov
        st["node_count"] = jnp.where(act, node_count, st["node_count"])
        st["error"] = err

        head = jnp.where(act, cur, head)
        prev_w = jnp.where(act, w, prev_w)
        return (st, head, prev_w), None

    head0 = jnp.full((B,), -1, jnp.int32)
    prev_w0 = jnp.zeros((B,), jnp.int32)

    def cond(carry_t):
        (st, head, prev_w), t = carry_t
        return t < max_len

    def body(carry_t):
        carry, t = carry_t
        carry, _ = step(carry, t)
        return carry, t + 1

    (st, _, _), _ = jax.lax.while_loop(
        cond, body, ((dict(state), head0, prev_w0), jnp.int32(0))
    )
    return st


@jax.jit
def add_alignment_batched(state, ag, ar, aln_len, read, weights, active, seq_id=None):
    """Alignment-to-graph walk (cudapoa_add_alignment.cuh), vectorized.

    The reference walks the alignment sequentially; on TPU a sequential
    walk costs a loop step per alignment column. But along one read's path
    every (head, cur) node pair is distinct, so edge existence, append
    slots, and weight bumps depend only on the PRE-walk graph, and new-node
    ids follow from a prefix count — the whole walk collapses into
    one-shot vectorized decisions + scatters. The only sequential coupling
    left is through node-alignment cliques: if two alignment columns touch
    the same clique, a later column could reuse/extend a node created
    earlier in the same walk. Such windows are detected (shared clique ids
    among the walk's graph nodes) and re-run through the exact sequential
    walk, which costs nothing when no window needs it.
    """
    B, N = state["nodes"].shape
    E = state["in_edges"].shape[2]
    A = state["al"].shape[2]
    L = read.shape[1]
    K = ag.shape[1]
    b_idx = jnp.arange(B)
    bigN = B * N
    bigNE = B * N * E
    bigNA = B * N * A

    # ---- flip to walk order (reference walks pos = len-1 .. 0) ----------
    ag_w = ag[:, ::-1]
    ar_w = ar[:, ::-1]
    valid = active[:, None] & (ar_w != -1)  # participating steps (B, K)

    rp = jnp.clip(ar_w, 0, L - 1)
    base = jnp.take_along_axis(read, rp, axis=1)
    w = jnp.take_along_axis(weights, rp, axis=1)
    gid = ag_w
    gid_c = jnp.clip(gid, 0, N - 1)
    gbase = jnp.take_along_axis(state["nodes"], gid_c, axis=1)

    # pre-state aligned-node search
    al_list = jnp.take_along_axis(state["al"], gid_c[:, :, None], axis=1)  # (B,K,A)
    na = jnp.take_along_axis(state["al_count"], gid_c, axis=1)
    al_bases = jnp.take_along_axis(
        state["nodes"], jnp.clip(al_list, 0, N - 1).reshape(B, -1), axis=1
    ).reshape(B, K, A)
    a_idx = jnp.arange(A)[None, None, :]
    match_mask = (a_idx < na[:, :, None]) & (al_bases == base[:, :, None])
    has_aligned = jnp.any(match_mask, axis=2)
    first_aligned = jnp.take_along_axis(
        al_list, jnp.argmax(match_mask, axis=2)[:, :, None], axis=2
    )[:, :, 0]

    reuse_graph = valid & (gid != -1) & (gbase == base)
    reuse_aligned = valid & (gid != -1) & (gbase != base) & has_aligned
    new_node = valid & ~reuse_graph & ~reuse_aligned
    new_aligned = new_node & (gid != -1)

    # ---- conflict detection: two walk columns sharing an aligned clique --
    clique = jnp.minimum(
        gid_c, jnp.min(jnp.where(a_idx < na[:, :, None], al_list, N), axis=2)
    )
    clique = jnp.where(valid & (gid != -1), clique, N + jnp.arange(K)[None, :])
    csort = jnp.sort(clique, axis=1)
    conflict = jnp.any((csort[:, 1:] == csort[:, :-1]) & (csort[:, 1:] < N), axis=1)
    ok = active & ~conflict
    valid = valid & ok[:, None]
    reuse_graph = reuse_graph & ok[:, None]
    reuse_aligned = reuse_aligned & ok[:, None]
    new_node = new_node & ok[:, None]
    new_aligned = new_aligned & ok[:, None]

    # ---- node ids: prefix count of new nodes along the walk -------------
    new_i = new_node.astype(jnp.int32)
    cum_excl = jnp.cumsum(new_i, axis=1) - new_i
    new_total = jnp.sum(new_i, axis=1)
    cur = jnp.where(
        reuse_graph,
        gid_c,
        jnp.where(
            reuse_aligned, first_aligned, state["node_count"][:, None] + cum_excl
        ),
    )
    cur = jnp.where(valid, jnp.clip(cur, 0, N - 1), N)  # N = drop sentinel slot

    node_count = jnp.where(ok, state["node_count"] + new_total, state["node_count"])
    err = jnp.where(ok & (node_count >= N) & (new_total > 0), 1, state["error"])

    # ---- head / prev_weight: forward fill of the previous valid step ----
    k_ids = jnp.arange(K, dtype=jnp.int32)[None, :]
    last_valid = jax.lax.cummax(jnp.where(valid, k_ids, -1), axis=1)
    prev_idx = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), last_valid[:, :-1]], axis=1
    )
    has_head = valid & (prev_idx >= 0)
    prev_c = jnp.clip(prev_idx, 0, K - 1)
    head = jnp.where(has_head, jnp.take_along_axis(cur, prev_c, axis=1), N)
    prev_w = jnp.where(has_head, jnp.take_along_axis(w, prev_c, axis=1), 0)
    head_c = jnp.clip(head, 0, N - 1)

    # effective counts: nodes created this walk start at zero
    is_new_cur = new_node
    head_is_new = has_head & jnp.take_along_axis(new_node, prev_c, axis=1)

    # ---- edge existence (pre-state only: walk pairs are distinct) -------
    in_list = jnp.take_along_axis(
        state["in_edges"], jnp.clip(cur, 0, N - 1)[:, :, None], axis=1
    )  # (B,K,E)
    ic_pre = jnp.take_along_axis(state["in_count"], jnp.clip(cur, 0, N - 1), axis=1)
    ic_eff = jnp.where(is_new_cur, 0, ic_pre)
    e_idx = jnp.arange(E)[None, None, :]
    exist_mask = (
        has_head[:, :, None]
        & ~is_new_cur[:, :, None]
        & (e_idx < ic_eff[:, :, None])
        & (in_list == head[:, :, None])
    )
    exists = jnp.any(exist_mask, axis=2)
    app = has_head & ~exists

    oc_pre = jnp.take_along_axis(state["out_count"], head_c, axis=1)
    oc_eff = jnp.where(head_is_new, 0, oc_pre)
    err = jnp.where(
        jnp.any(app & ((oc_eff + 1 >= E) | (ic_eff + 1 >= E)), axis=1) & ok, 2, err
    )
    err = jnp.where(jnp.any(new_aligned & (na + 1 > A - 1), axis=1) & ok, 2, err)

    # ---- apply: new-node init -------------------------------------------
    flat_cur = jnp.where(new_node, b_idx[:, None] * N + cur, bigN).reshape(-1)
    nodes = state["nodes"].reshape(-1).at[flat_cur].set(base.reshape(-1), mode="drop").reshape(B, N)
    zeroK = jnp.zeros((B * K,), jnp.int32)
    in_count = state["in_count"].reshape(-1).at[flat_cur].set(zeroK, mode="drop").reshape(B, N)
    out_count = state["out_count"].reshape(-1).at[flat_cur].set(zeroK, mode="drop").reshape(B, N)
    al_count = state["al_count"].reshape(-1).at[flat_cur].set(zeroK, mode="drop").reshape(B, N)
    cov = state["cov"].reshape(-1).at[flat_cur].set(zeroK, mode="drop").reshape(B, N)

    # ---- apply: aligned-clique updates for new aligned nodes ------------
    amask = new_aligned[:, :, None] & (a_idx < na[:, :, None])  # (B,K,A)
    aid_c = jnp.clip(al_list, 0, N - 1)
    aid_counts = jnp.take_along_axis(
        al_count, aid_c.reshape(B, -1), axis=1
    ).reshape(B, K, A)
    flat_app = jnp.where(
        amask, (b_idx[:, None, None] * N + aid_c) * A + aid_counts, bigNA
    ).reshape(-1)
    al = (
        state["al"].reshape(-1)
        .at[flat_app]
        .set(jnp.broadcast_to(cur[:, :, None], (B, K, A)).reshape(-1), mode="drop")
        .reshape(B, N, A)
    )
    al_count = (
        al_count.reshape(-1)
        .at[jnp.where(amask, b_idx[:, None, None] * N + aid_c, bigN).reshape(-1)]
        .add(1, mode="drop")
        .reshape(B, N)
    )
    # cur's own list: gid's pre list + gid
    flat_own = jnp.where(
        amask, (b_idx[:, None, None] * N + cur[:, :, None]) * A + a_idx, bigNA
    ).reshape(-1)
    al = al.reshape(-1).at[flat_own].set(al_list.reshape(-1), mode="drop").reshape(B, N, A)
    flat_gid_app = jnp.where(new_aligned, (b_idx[:, None] * N + gid_c) * A + na, bigNA).reshape(-1)
    al = al.reshape(-1).at[flat_gid_app].set(cur.reshape(-1), mode="drop").reshape(B, N, A)
    al_count = (
        al_count.reshape(-1)
        .at[jnp.where(new_aligned, b_idx[:, None] * N + gid_c, bigN).reshape(-1)]
        .set((na + 1).reshape(-1), mode="drop")
        .reshape(B, N)
    )
    flat_cur_app = jnp.where(new_aligned, (b_idx[:, None] * N + cur) * A + na, bigNA).reshape(-1)
    al = al.reshape(-1).at[flat_cur_app].set(gid_c.reshape(-1), mode="drop").reshape(B, N, A)
    al_count = (
        al_count.reshape(-1)
        .at[jnp.where(new_aligned, b_idx[:, None] * N + cur, bigN).reshape(-1)]
        .set((na + 1).reshape(-1), mode="drop")
        .reshape(B, N)
    )

    # ---- apply: edges -----------------------------------------------------
    # weight bump on the unique existing slot
    slot = jnp.argmax(exist_mask, axis=2)
    flat_w = jnp.where(exists, (b_idx[:, None] * N + cur) * E + slot, bigNE).reshape(-1)
    in_w = (
        state["in_w"].reshape(-1)
        .at[flat_w]
        .add((prev_w + w).reshape(-1), mode="drop")
        .reshape(B, N, E)
    )
    # appends
    flat_ie = jnp.where(app, (b_idx[:, None] * N + cur) * E + ic_eff, bigNE).reshape(-1)
    in_edges = state["in_edges"].reshape(-1).at[flat_ie].set(head_c.reshape(-1), mode="drop").reshape(B, N, E)
    in_w = in_w.reshape(-1).at[flat_ie].set((prev_w + w).reshape(-1), mode="drop").reshape(B, N, E)
    in_count = (
        in_count.reshape(-1)
        .at[jnp.where(app, b_idx[:, None] * N + cur, bigN).reshape(-1)]
        .set((ic_eff + 1).reshape(-1), mode="drop")
        .reshape(B, N)
    )
    flat_oe = jnp.where(app, (b_idx[:, None] * N + head_c) * E + oc_eff, bigNE).reshape(-1)
    out_edges = state["out_edges"].reshape(-1).at[flat_oe].set(cur.reshape(-1), mode="drop").reshape(B, N, E)
    out_count = (
        out_count.reshape(-1)
        .at[jnp.where(app, b_idx[:, None] * N + head_c, bigN).reshape(-1)]
        .set((oc_eff + 1).reshape(-1), mode="drop")
        .reshape(B, N)
    )

    # ---- apply: coverage (path nodes are distinct) -----------------------
    cov = (
        cov.reshape(-1)
        .at[jnp.where(valid, b_idx[:, None] * N + cur, bigN).reshape(-1)]
        .add(1, mode="drop")
        .reshape(B, N)
    )

    st = dict(state)
    st["nodes"] = nodes
    st["in_edges"] = in_edges
    st["in_count"] = in_count
    st["in_w"] = in_w
    st["out_edges"] = out_edges
    st["out_count"] = out_count
    st["al"] = al
    st["al_count"] = al_count
    st["cov"] = cov
    st["node_count"] = node_count
    st["error"] = err

    # ---- MSA bookkeeping --------------------------------------------------
    if "seq_next" in st:
        S = st["seq_next"].shape[2]
        flat_sn = jnp.where(
            has_head, (b_idx[:, None] * N + head_c) * S + seq_id, B * N * S
        ).reshape(-1)
        st["seq_next"] = (
            st["seq_next"].reshape(-1).at[flat_sn].set(cur.reshape(-1), mode="drop").reshape(B, N, S)
        )
        beg = valid & (ar_w == 0)
        flat_bg = jnp.where(beg, b_idx[:, None] * S + seq_id, B * S).reshape(-1)
        st["begin"] = (
            st["begin"].reshape(-1)
            .at[flat_bg]
            .set(cur.reshape(-1), mode="drop")
            .reshape(B, S)
        )

    # ---- conflicted windows: exact sequential walk (free when none) ------
    st = add_alignment_batched_seq(
        st, ag, ar, aln_len, read, weights, active & conflict, seq_id
    )
    return st


# ---------------------------------------------------------------------------
# consensus (cudapoa_generate_consensus.cuh)
# ---------------------------------------------------------------------------


def _consensus_row_update(st, scores, preds, nid, row_act, skip_cleared):
    """One row of the heaviest-edge predecessor pass, reference tie-breaks
    (generateConsensus / branchCompletion inner loop). Returns (s, pred)."""
    B, N = st["nodes"].shape
    E = st["in_edges"].shape[2]
    nid_c = jnp.clip(nid, 0, N - 1)
    pc = _gather_bn(st["in_count"], nid_c)
    edges = _gather_bne(st["in_edges"], nid_c)  # (B, E)
    ws = _gather_bne(st["in_w"], nid_c)

    if skip_cleared:
        s0 = jnp.full((B,), -1, jnp.int32)
        p0 = jnp.full((B,), -1, jnp.int32)
    else:
        s0 = jnp.take_along_axis(scores, nid_c[:, None], axis=1)[:, 0].astype(jnp.int32)
        p0 = jnp.full((B,), -1, jnp.int32)

    max_pc = jnp.maximum(jnp.max(jnp.where(row_act, pc, 0)), 0)

    def e_body(e, carry):
        s, p = carry
        begin = jnp.clip(edges[:, e], 0, N - 1)
        ew = ws[:, e]
        sc_begin = jnp.take_along_axis(scores, begin[:, None], axis=1)[:, 0]
        use = row_act & (e < pc)
        if skip_cleared:
            use = use & (sc_begin != -1)
        sc_pred = jnp.take_along_axis(
            scores, jnp.clip(p, 0, N - 1)[:, None], axis=1
        )[:, 0]
        take = use & (
            (s < ew) | ((s == ew) & (p != -1) & (sc_pred <= sc_begin))
        )
        s = jnp.where(take, ew, s)
        p = jnp.where(take, begin, p)
        return s, p

    s, p = jax.lax.fori_loop(0, max_pc, e_body, (s0, p0))
    sc_p = jnp.take_along_axis(scores, jnp.clip(p, 0, N - 1)[:, None], axis=1)[:, 0]
    s = jnp.where(p != -1, s + sc_p, s)
    return s, p


@jax.jit
def consensus_batched(state, active):
    """Returns (consensus chars (B, C) BACKWARD order, coverage (B, C),
    lengths (B,)). C = N."""
    st = state
    B, N = st["nodes"].shape
    E = st["in_edges"].shape[2]
    A = st["al"].shape[2]
    b_idx = jnp.arange(B)
    bigN = B * N

    scores = jnp.full((B, N), -1, jnp.int32)
    preds = jnp.full((B, N), -1, jnp.int32)
    act0 = active & (st["error"] == 0)
    max_nc = jnp.max(jnp.where(act0, st["node_count"], 0))

    def pass_body(gp, carry):
        scores, preds, max_score, max_id = carry
        nid = _gather_bn(st["sorted"], jnp.broadcast_to(gp, (B,)))
        row_act = act0 & (gp < st["node_count"])
        nid_c = jnp.clip(nid, 0, N - 1)
        s, p = _consensus_row_update(st, scores, preds, nid_c, row_act, False)
        flat = jnp.where(row_act, b_idx * N + nid_c, bigN)
        scores = scores.reshape(-1).at[flat].set(s, mode="drop").reshape(B, N)
        preds = preds.reshape(-1).at[flat].set(p, mode="drop").reshape(B, N)
        upd = row_act & (max_score <= s)
        max_score = jnp.where(upd, s, max_score)
        max_id = jnp.where(upd, nid_c, max_id)
        return scores, preds, max_score, max_id

    scores, preds, max_score, max_id = jax.lax.fori_loop(
        0, max_nc, pass_body, (scores, preds, jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32))
    )

    # branch completion loop
    def bc_cond(carry):
        scores, preds, max_id, loops = carry
        oc = jnp.take_along_axis(st["out_count"], max_id[:, None], axis=1)[:, 0]
        return jnp.any(act0 & (oc != 0) & (loops < st["node_count"]))

    def bc_body(carry):
        scores, preds, max_id, loops = carry
        oc = jnp.take_along_axis(st["out_count"], max_id[:, None], axis=1)[:, 0]
        br_act = act0 & (oc != 0) & (loops < st["node_count"])
        pos = jnp.take_along_axis(st["pos_of"], max_id[:, None], axis=1)[:, 0]
        # clear sibling scores (branchCompletion:55-70)
        outs = _gather_bne(st["out_edges"], max_id)  # (B, E)
        e_idx = jnp.arange(E)[None, :]
        oc_mask = br_act[:, None] & (e_idx < oc[:, None])

        def clear_body(oe, scores):
            out = jnp.clip(outs[:, oe], 0, N - 1)
            out_ic = jnp.take_along_axis(st["in_count"], out[:, None], axis=1)[:, 0]
            ins = _gather_bne(st["in_edges"], out)  # (B, E)
            m = (
                oc_mask[:, oe][:, None]
                & (e_idx < out_ic[:, None])
                & (ins != max_id[:, None])
            )
            flat = jnp.where(m, b_idx[:, None] * N + jnp.clip(ins, 0, N - 1), bigN)
            return (
                scores.reshape(-1)
                .at[flat.reshape(-1)]
                .set(-1, mode="drop")
                .reshape(B, N)
            )

        max_oc = jnp.maximum(jnp.max(jnp.where(br_act, oc, 0)), 0)
        scores = jax.lax.fori_loop(0, max_oc, clear_body, scores)

        # rescan from pos+1 (branchCompletion:75-115)
        def rescan_body(gp, carry):
            scores, preds, mxs, mxi = carry
            nid = _gather_bn(st["sorted"], jnp.broadcast_to(gp, (B,)))
            row_act = br_act & (gp > pos) & (gp < st["node_count"])
            nid_c = jnp.clip(nid, 0, N - 1)
            s, p = _consensus_row_update(st, scores, preds, nid_c, row_act, True)
            flat = jnp.where(row_act, b_idx * N + nid_c, bigN)
            # predecessors reset to -1 then set (reference resets per node)
            preds = preds.reshape(-1).at[flat].set(p, mode="drop").reshape(B, N)
            scores = scores.reshape(-1).at[flat].set(s, mode="drop").reshape(B, N)
            upd = row_act & (mxs <= s)
            mxs = jnp.where(upd, s, mxs)
            mxi = jnp.where(upd, nid_c, mxi)
            return scores, preds, mxs, mxi

        scores, preds, mxs, mxi = jax.lax.fori_loop(
            0, max_nc, rescan_body,
            (scores, preds, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32)),
        )
        max_id = jnp.where(br_act, mxi, max_id)
        loops = loops + br_act.astype(jnp.int32)
        return scores, preds, max_id, loops

    scores, preds, max_id, loops = jax.lax.while_loop(
        bc_cond, bc_body, (scores, preds, max_id, jnp.zeros((B,), jnp.int32))
    )
    err = jnp.where(act0 & (loops >= st["node_count"]) & (loops > 0), 3, st["error"])

    # backward emission
    C = N
    cons = jnp.zeros((B, C), jnp.int32)
    cov = jnp.zeros((B, C), jnp.int32)
    a_idx = jnp.arange(A)[None, :]
    bigC = B * C

    def em_cond(carry):
        cur, k, cons, cov, done = carry
        return jnp.any(~done)

    def em_body(carry):
        cur, k, cons, cov, done = carry
        act = ~done
        cur_c = jnp.clip(cur, 0, N - 1)
        ch = _gather_bn(st["nodes"], cur_c)
        cv = _gather_bn(st["cov"], cur_c)
        als = _gather_bne(st["al"], cur_c)  # (B, A)
        nal = _gather_bn(st["al_count"], cur_c)
        al_cov = jnp.take_along_axis(st["cov"], jnp.clip(als, 0, N - 1), axis=1)
        cv = cv + jnp.sum(jnp.where(a_idx < nal[:, None], al_cov, 0), axis=1)
        kc = jnp.clip(k, 0, C - 1)
        flat = jnp.where(act, b_idx * C + kc, bigC)
        cons = cons.reshape(-1).at[flat].set(ch, mode="drop").reshape(B, C)
        cov = cov.reshape(-1).at[flat].set(cv, mode="drop").reshape(B, C)
        p = jnp.take_along_axis(preds, cur_c[:, None], axis=1)[:, 0]
        newly_done = act & (p == -1)
        cur = jnp.where(act & ~newly_done, p, cur)
        k = k + act.astype(jnp.int32)
        done = done | newly_done
        return cur, k, cons, cov, done

    done0 = ~act0 | (err != 0)
    cur0 = max_id
    _, length, cons, cov, _ = jax.lax.while_loop(
        em_cond, em_body, (cur0, jnp.zeros((B,), jnp.int32), cons, cov, done0)
    )
    return cons, cov, length, err


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("gap", "mismatch", "match", "max_dist", "n_rows"),
)
def poa_step_batched(state, read, read_len, weights, active, seq_id,
                     gap: int, mismatch: int, match: int,
                     max_dist: int, n_rows: int):
    """One fused POA iteration: NW align + add-alignment + topological sort
    (the per-sequence body of generatePOAKernel, cudapoa_kernels.cuh:243-330)
    in a single dispatch. Windows flagged ``far`` (predecessor beyond the
    fast kernel's distance window) are left untouched for the caller to
    re-run via the exact gather path."""
    N = state["nodes"].shape[1]
    err = jnp.where(
        active & (state["node_count"] >= N) & (state["error"] == 0),
        1,
        state["error"],
    )
    state = dict(state)
    state["error"] = err
    act = active & (state["error"] == 0)
    ag, ar, aln_len, failed, far = nw_batched_fast(
        state, read, read_len, act,
        gap=gap, mismatch=mismatch, match=match,
        max_dist=max_dist, n_rows=n_rows,
    )
    act = act & ~far
    state["error"] = jnp.where(act & failed, 3, state["error"])
    act = act & (state["error"] == 0)
    state = add_alignment_batched(state, ag, ar, aln_len, read, weights, act, seq_id)
    act = act & (state["error"] == 0)
    # the graph may have grown by up to read_len nodes during add-alignment
    state = topsort_batched(state, act, n_rows=min(N, n_rows + read.shape[1]))
    return state, far


def build_windows_graphs(
    windows: list[list[str]],
    gap: int = -8,
    mismatch: int = -6,
    match: int = 8,
    max_nodes: int | None = None,
    max_edges: int = MAX_NODE_EDGES,
    max_alignments: int = MAX_NODE_ALIGNMENTS,
    weights: list[list[np.ndarray]] | None = None,
    msa: bool = False,
):
    """Pack windows into fixed-shape batch tensors and run the lockstep
    graph build (backbone + per-sequence NW/add-alignment/topsort).
    Returns the final graph ``state`` plus (nseqs, B)."""
    B = len(windows)
    S = max(len(w) for w in windows)
    L = max(max(len(s) for s in w) for w in windows)
    if max_nodes is None:
        max_nodes = 3 * L  # BatchConfig: max_nodes_per_graph = 3 * max seq size
    if max_nodes < L:
        # the reference rejects such groups at add time with
        # StatusType::exceeded_maximum_sequence_size (cudapoa_batch.cuh)
        raise ValueError(
            f"max_nodes={max_nodes} is smaller than the longest window "
            f"sequence ({L}); exceeded_maximum_sequence_size"
        )
    N = max_nodes

    seqs = np.zeros((B, S, L), dtype=np.int32)
    wts = np.ones((B, S, L), dtype=np.int32)
    lens = np.zeros((B, S), dtype=np.int32)
    nseqs = np.zeros(B, dtype=np.int32)
    for b, w in enumerate(windows):
        nseqs[b] = len(w)
        for s, seq in enumerate(w):
            e = np.frombuffer(seq.encode("latin1"), dtype=np.uint8)
            seqs[b, s, : len(e)] = e
            lens[b, s] = len(e)
            if weights is not None:
                wts[b, s, : len(e)] = weights[b][s]

    seqs_j = jnp.asarray(seqs)
    wts_j = jnp.asarray(wts)
    lens_j = jnp.asarray(lens)
    nseqs_j = jnp.asarray(nseqs)

    state = init_graph_state(
        B, N, max_edges, max_alignments, max_seqs=S if msa else None
    )
    all_active = jnp.ones(B, dtype=bool)
    state = build_backbone_batched(
        state, seqs_j[:, 0], lens_j[:, 0], wts_j[:, 0], all_active
    )

    scores_buf = codes_buf = None  # lazy: only the far-pred fallback needs them
    D_FAST = 32  # fast-kernel predecessor-distance window

    for s in range(1, S):
        if not bool((nseqs > s).any()):
            break
        active = nseqs_j > s
        seq_id = jnp.int32(s) if msa else None
        # row-count bucket: pad the scan length to a multiple of 128 so the
        # set of compiled fast-kernel variants stays small
        max_nc = int(jnp.max(jnp.where(active, state["node_count"], 0)))
        R = min(N, max(128, ((max_nc + 127) // 128) * 128))
        state, far_w = poa_step_batched(
            state, seqs_j[:, s], lens_j[:, s], wts_j[:, s], active, seq_id,
            gap=gap, mismatch=mismatch, match=match,
            max_dist=D_FAST, n_rows=R,
        )
        if bool(jnp.any(far_w)):
            # rare: a predecessor farther than D_FAST rows in topological
            # order — run those windows through the exact gather-based path
            if scores_buf is None:
                scores_buf = jnp.zeros((B, N + 1, L + 1), jnp.float32)
                codes_buf = jnp.zeros((B, N + 1, L + 1), jnp.int32)
            err = jnp.where(
                far_w & (state["node_count"] >= N) & (state["error"] == 0),
                1,
                state["error"],
            )
            state = dict(state)
            state["error"] = err
            act = far_w & (state["error"] == 0)
            ag, ar, aln_len, failed, scores_buf, codes_buf = nw_batched(
                state, seqs_j[:, s], lens_j[:, s], scores_buf, codes_buf, act,
                gap=gap, mismatch=mismatch, match=match,
            )
            state["error"] = jnp.where(act & failed, 3, state["error"])
            act = far_w & (state["error"] == 0)
            state = add_alignment_batched(
                state, ag, ar, aln_len, seqs_j[:, s], wts_j[:, s], act, seq_id
            )
            act = far_w & (state["error"] == 0)
            state = topsort_batched(state, act)
    return state, nseqs


def _pack_windows(windows, weights, S, L):
    """(B, S, L) uint8 base matrix + weights/lengths/counts. One flat
    encode + a single vectorized scatter: the per-sequence strided-write
    loop cost ~150 us/sequence (14 s on the 5776-window covid workload)."""
    B = len(windows)
    lens = np.zeros((B, S), dtype=np.int32)
    nseqs = np.zeros(B, dtype=np.int32)
    # padded bytes join: builds the (B, S, L) matrix as ONE buffer with no
    # index temporaries (np.repeat/arange over per-base int64 index arrays
    # re-faulted hundreds of MB per call on the slow-page-fault VM)
    zeros = {}

    def zpad(n):
        z = zeros.get(n)
        if z is None:
            z = zeros[n] = b"\0" * n
        return z

    parts = []
    for b, w in enumerate(windows):
        nseqs[b] = len(w)
        for s, seq in enumerate(w):
            n = len(seq)
            lens[b, s] = n
            parts.append(seq.encode("latin1"))
            if n < L:
                parts.append(zpad(L - n))
        if len(w) < S:
            parts.append(zpad((S - len(w)) * L))
    buf = b"".join(parts)
    seqs = np.frombuffer(buf, dtype=np.uint8).reshape(B, S, L).copy()
    if weights is None:
        # callers broadcast unit weights on device; materializing the
        # (B, S, L) i32 ones cost ~120 MB/alloc on the covid workload
        return seqs, None, lens, nseqs
    wts = np.ones((B, S, L), dtype=np.int32)
    for b, w in enumerate(windows):
        for s in range(len(w)):
            wts[b, s, : lens[b, s]] = weights[b][s]
    return seqs, wts, lens, nseqs


def _encode_seqs_2bit(seqs: np.ndarray):
    """(packed-or-raw uint8 device upload, acgt flag, consensus decode
    LUT). Pure-{0,A,C,G,T} batches pack 2-bit (4x fewer H2D bytes over
    the ~50 MB/s tunnel); one native C pass when available (the numpy
    LUT+shift pipeline cost ~180 ms/call on the covid workload).
    Encoding = the reference ASCII trick (minimizer.cu:197): A0 C1 G2 T3,
    kernel codes 1..4 after the on-device +1; code 0 = never-match pad."""
    from genomeworks_tpu.io.native import codes_pack_2bit

    native = codes_pack_2bit(seqs) if seqs.shape[-1] % 4 == 0 else None
    if native is not None:
        packed, acgt = native
        if acgt:
            return packed, True, np.frombuffer(b"\0ACGT\0\0\0", np.uint8)
        return seqs, False, None
    _ok = np.zeros(256, dtype=bool)
    _ok[[0, 65, 67, 71, 84]] = True
    if not _ok[seqs].all():
        return seqs, False, None
    lut = np.zeros(85, np.uint8)
    lut[[65, 67, 71, 84]] = [0, 1, 2, 3]  # ASCII-trick order (A0 C1 G2 T3)
    codes = lut[seqs]
    c4 = codes.reshape(codes.shape[:-1] + (seqs.shape[-1] // 4, 4))
    packed = (
        c4[..., 0] | (c4[..., 1] << 2) | (c4[..., 2] << 4) | (c4[..., 3] << 6)
    ).astype(np.uint8)
    return packed, True, np.frombuffer(b"\0ACGT\0\0\0", np.uint8)



def _pallas_poa_plan(windows, max_nodes, max_edges, max_alignments, msa,
                     unit_w=False, strict_caps=False):
    """Shape plan + feasibility for the per-window Pallas kernel. Returns
    (S, L, N, E_kernel, G) or None when the workload exceeds the kernel's
    SMEM/VMEM budget (graph state lives in SMEM, capped at 1 MB/core on
    v5e). G is the number of windows fused per grid step (largest that
    fits — the fused NW sweep and interleaved scalar phases scale ~G x,
    see ops/poa_pallas.py). When the full edge/node caps do not fit, the
    kernel runs with reduced in-kernel caps — windows overflowing them
    error out and are re-run exactly through the XLA path by the caller."""
    Lmax = max(max(len(s) for s in w) for w in windows)
    Smax = max(len(w) for w in windows)
    L = ((Lmax + 63) // 64) * 64
    S = max(2, ((Smax + 1) // 2) * 2)
    N_full = 3 * L if max_nodes is None else min(max_nodes, 3 * L)
    if N_full < Lmax or max_edges > 128 or max_alignments > max_edges:
        return None
    Lp = ((L + 1 + 127) // 128) * 128
    n_cands = sorted(
        {N_full, min(N_full, 2 * L), min(N_full, (3 * L) // 2),
         min(N_full, max(512, Lmax + 2))},
        reverse=True,
    )
    n_cands = [n for n in n_cands if n > Lmax]
    e_cands = [e for e in (max_edges, 24, 16) if e <= max_edges]
    if strict_caps:
        # capacity-redo plan: only the full caps (smaller G); used for
        # windows that overflowed a fast reduced-cap plan
        n_cands = n_cands[:1]
        e_cands = e_cands[:1]
    for G in ((1,) if msa else (8, 6, 5, 4, 3, 2, 1)):
        for E_k in e_cands:
            for N in n_cands:
                K = N + L
                # mirrors poa_consensus_pallas scratch_shapes (+2x pipeline
                # buffering allowance on the SMEM input/output blocks);
                # unit weights drop the per-base weight copy
                # edge-list packing (ops/poa_pallas.py accessors):
                # in_e+in_w fused per word when unit_w; out_e/al always
                # two 16-bit ids per word; seqs SMEM copy 4 bytes/word
                w = (
                    11 * (N + 8)
                    + (1 if unit_w else 2) * (N * E_k + 8)
                    + 2 * ((N * E_k) // 2 + 8)
                    + 2 * (K + 8)
                    + 2 * S * (L // 4) + (0 if unit_w else 2 * S * L)
                    + 2 * N + 8 + (N + 1) + 16
                )
                if msa:
                    w += (N + 1) * S + 8 + S + 8 + 3 * (N + 8) + 2 * N + 8
                    w += 2 * S * N  # msa output block (x2 buffering)
                if w * G * 4 > 860_000:  # 1 MB minus Mosaic overhead headroom  # 1 MB SMEM minus headroom
                    continue
                vmem = G * ((N + 1) * (2 * Lp + 1) * 4 + 2 * S * L * 4)
                if vmem > 14_000_000:
                    continue
                return S, L, N, E_k, G
    return None

def _poa_batch_consensus_pallas(windows, gap, mismatch, match, max_nodes,
                                max_edges, max_alignments, weights):
    """Consensus via the per-window Pallas kernel (ops/poa_pallas.py) —
    the fast path on TPU. Shape buckets (S to a multiple of 2, L to a
    multiple of 64) bound the number of compiled kernel variants."""
    from genomeworks_tpu.ops.poa_pallas import poa_consensus_pallas

    def run_plan(sub_windows, sub_weights, plan):
        """One kernel pass at a given plan; returns (cons, cov, status,
        err) lists (err = raw in-kernel code per window)."""
        S, L, N, E_k, G = plan
        seqs, wts, lens, nseqs = _pack_windows(sub_windows, sub_weights, S, L)
        B = len(sub_windows)
        pad = (-B) % G
        if pad:
            # grid padding: nseqs == 0 windows are skipped in-kernel
            seqs = np.concatenate([seqs, np.zeros((pad, S, L), seqs.dtype)])
            if wts is not None:
                wts = np.concatenate([wts, np.ones((pad, S, L), np.int32)])
            lens = np.concatenate([lens, np.zeros((pad, S), np.int32)])
            nseqs = np.concatenate([nseqs, np.zeros(pad, np.int32)])
        # uint8 sequences + broadcastable unit weights: the upload rides
        # a ~50 MB/s tunnel, the kernel widens on device. Pure-ACGT
        # batches (the norm) upload 2-bit packed codes — 4x fewer H2D
        # bytes again — and decode the consensus through a LUT (kernel
        # codes 1..4; code 0 is the never-matching pad, see
        # poa_consensus_pallas).
        wts_dev = (
            jnp.ones((1, 1, 1), jnp.int32) if sub_weights is None
            else jnp.asarray(wts)
        )
        enc, acgt, dec = _encode_seqs_2bit(seqs)
        seqs_dev = jnp.asarray(enc)
        cons, cov, length, err = poa_consensus_pallas(
            seqs_dev, wts_dev, jnp.asarray(lens),
            jnp.asarray(nseqs),
            S=S, L=L, N=N, E=E_k, A=min(max_alignments, E_k),
            gap=gap, mismatch=mismatch, match=match, windows_per_step=G,
            packed_seqs=acgt,
        )
        cons = np.asarray(cons)
        if acgt:
            cons = dec[cons & 7]
        cov = np.asarray(cov).astype(np.int32)
        length = np.asarray(length)
        err = np.asarray(err)
        o_cons, o_cov, o_st = [], [], []
        for b in range(B):
            if err[b] != 0:
                o_cons.append("")
                o_cov.append(np.zeros(0, np.int32))
                o_st.append(int(err[b]))
            else:
                k = int(length[b])
                o_cons.append(
                    bytes(cons[b, :k][::-1].astype(np.uint8)).decode("latin1")
                )
                o_cov.append(cov[b, :k][::-1].copy())
                o_st.append(0)
        return o_cons, o_cov, o_st

    plan = _pallas_poa_plan(
        windows, max_nodes, max_edges, max_alignments, False,
        unit_w=weights is None,
    )
    S, L, N, E_k, G = plan
    N_full = 3 * L if max_nodes is None else min(max_nodes, 3 * L)
    out_cons, out_cov, out_status = run_plan(windows, weights, plan)

    # with reduced in-kernel edge/node caps an error may be a cap
    # artifact; redo those windows at FULL caps through a second (smaller
    # G) kernel plan first — ~8x faster than the XLA lockstep fallback
    # that remains the last resort. On real racon workloads (16 noisy
    # reads/window) most windows overflow the fast plan's node cap, so
    # this second pass carries the bulk of the work.
    redo = [
        b for b, st in enumerate(out_status)
        if st != 0 and (E_k < max_edges or N < N_full)
    ]
    if redo and (E_k < max_edges or N < N_full):
        sub_w = [windows[b] for b in redo]
        sub_wt = [weights[b] for b in redo] if weights else None
        plan2 = _pallas_poa_plan(
            sub_w, max_nodes, max_edges, max_alignments, False,
            unit_w=weights is None, strict_caps=True,
        )
        if plan2 is not None and (plan2[2] > N or plan2[3] > E_k):
            r_cons, r_cov, r_st = run_plan(sub_w, sub_wt, plan2)
            for i, b in enumerate(redo):
                out_cons[b], out_cov[b], out_status[b] = (
                    r_cons[i], r_cov[i], r_st[i]
                )
            redo = [b for b in redo if out_status[b] != 0]
    if redo:
        r_cons, r_cov, r_st = poa_batch_consensus(
            [windows[b] for b in redo], gap, mismatch, match, max_nodes,
            max_edges, max_alignments,
            [weights[b] for b in redo] if weights else None,
            use_pallas=False,
        )
        for i, b in enumerate(redo):
            out_cons[b], out_cov[b], out_status[b] = r_cons[i], r_cov[i], r_st[i]
    return out_cons, out_cov, out_status


def poa_batch_consensus(
    windows: list[list[str]],
    gap: int = -8,
    mismatch: int = -6,
    match: int = 8,
    max_nodes: int | None = None,
    max_edges: int = MAX_NODE_EDGES,
    max_alignments: int = MAX_NODE_ALIGNMENTS,
    weights: list[list[np.ndarray]] | None = None,
    use_pallas: bool | None = None,
    use_lockstep: bool | None = None,
) -> tuple[list[str], list[np.ndarray], list[int]]:
    """Run batched POA consensus over a list of windows (each a list of
    sequences). Returns (consensus list, coverage list, status list —
    0 = success). The lockstep-batch equivalent of Batch::generate_poa +
    get_consensus (cudapoa_batch.cuh). On TPU the lockstep kernel chain
    (one window per vector lane, ops/poa_lockstep_pallas.py) is the fast
    tier; cap-overflow windows re-run through the per-window Pallas
    kernel; the XLA lockstep path serves CPU and as the last fallback."""
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_lockstep is None:
        # the lane-lockstep tier only pays off compiled on a real TPU and
        # at batch scale; with caller caps stricter than the lockstep plane
        # caps its cap semantics would diverge (ADVICE r4), so defer
        use_lockstep = (
            use_pallas
            and len(windows) >= 64
            and jax.default_backend() == "tpu"
            and max_edges >= 7
            and max_alignments >= 8
        )
    if use_lockstep:
        from genomeworks_tpu.poa import lockstep as _lk
        from genomeworks_tpu.poa.lockstep import poa_batch_consensus_lockstep

        try:
            out = poa_batch_consensus_lockstep(
                windows, gap, mismatch, match, weights,
                max_nodes=max_nodes,
            )
        except Exception as e:
            from genomeworks_tpu.core.logging import log_warn

            log_warn(
                "lockstep POA tier failed to compile/run; falling back to "
                f"the per-window kernel: {e!r:.200}"
            )
            out = None
        if out is not None:
            out_cons, out_cov, out_status = out
            redo = [b for b, st in enumerate(out_status) if st != 0]
            _lk.tier_stats["lockstep_windows"] += len(windows) - len(redo)
            _lk.tier_stats["lockstep_overflow_windows"] += len(redo)
            if redo:
                r_cons, r_cov, r_st = poa_batch_consensus(
                    [windows[b] for b in redo], gap, mismatch, match,
                    max_nodes, max_edges, max_alignments,
                    [weights[b] for b in redo] if weights else None,
                    use_pallas=use_pallas, use_lockstep=False,
                )
                for i, b in enumerate(redo):
                    out_cons[b], out_cov[b], out_status[b] = (
                        r_cons[i], r_cov[i], r_st[i]
                    )
            return out_cons, out_cov, out_status
        else:
            _lk.tier_stats["lockstep_unserved_windows"] += len(windows)
    if use_pallas and _pallas_poa_plan(
        windows, max_nodes, max_edges, max_alignments, False,
        unit_w=weights is None,
    ) is not None:
        return _poa_batch_consensus_pallas(
            windows, gap, mismatch, match, max_nodes, max_edges,
            max_alignments, weights,
        )
    state, _ = build_windows_graphs(
        windows, gap, mismatch, match, max_nodes, max_edges, max_alignments,
        weights,
    )
    B = len(windows)
    all_active = jnp.ones(B, dtype=bool)
    cons, cov, length, err = consensus_batched(state, all_active)
    cons = np.asarray(cons)
    cov = np.asarray(cov)
    length = np.asarray(length)
    err = np.asarray(err)

    out_cons: list[str] = []
    out_cov: list[np.ndarray] = []
    out_status: list[int] = []
    for b in range(B):
        if err[b] != 0:
            out_cons.append("")
            out_cov.append(np.zeros(0, np.int32))
            out_status.append(int(err[b]))
        else:
            k = int(length[b])
            out_cons.append(bytes(cons[b, :k][::-1].astype(np.uint8)).decode("latin1"))
            out_cov.append(cov[b, :k][::-1].copy())
            out_status.append(0)
    return out_cons, out_cov, out_status


def _pallas_banded_plan(windows, max_nodes, max_edges, max_alignments,
                        band_width, unit_w=False, msa=False):
    """Shape plan for the static-band kernel: identical SMEM budget to
    _pallas_poa_plan but score/code rows are band_width wide (plus the
    SMEM boundary arrays), so much longer windows fit on-chip. ``msa``
    adds the in-kernel MSA bookkeeping/output budget and pins G = 1."""
    if band_width < 128 or band_width % 128:
        return None
    Lmax = max(max(len(s) for s in w) for w in windows)
    Smax = max(len(w) for w in windows)
    L = ((Lmax + 63) // 64) * 64
    S = max(2, ((Smax + 1) // 2) * 2)
    Lp = ((L + 1 + 127) // 128) * 128
    if Lp < L + 9:  # banded read roll must not wrap into live lanes
        return None
    N_full = 3 * L if max_nodes is None else min(max_nodes, 3 * L)
    if N_full < Lmax or max_edges > 128 or max_alignments > max_edges:
        return None
    n_cands = sorted(
        {N_full, min(N_full, 2 * L), min(N_full, (3 * L) // 2),
         min(N_full, max(512, Lmax + 2))},
        reverse=True,
    )
    n_cands = [n for n in n_cands if n > Lmax]
    e_cands = [e for e in (max_edges, 24, 16) if e <= max_edges]
    for G in ((1,) if msa else (8, 6, 5, 4, 3, 2, 1)):
        for E_k in e_cands:
            for N in n_cands:
                K = N + L
                w = (
                    11 * (N + 8)
                    + (1 if unit_w else 2) * (N * E_k + 8)
                    + 2 * ((N * E_k) // 2 + 8)
                    + 2 * (K + 8)
                    + 2 * S * (L // 4) + (0 if unit_w else 2 * S * L)
                    + 2 * N + 8 + (N + 1) + 16
                    + 2 * (N + 1 + 8) + 64  # s_bnd + s_c0c + s_pow2
                )
                if msa:
                    w += (N + 1) * S + 8 + S + 8 + 3 * (N + 8) + 2 * N + 8
                    w += 2 * S * N  # msa output block (x2 buffering)
                if w * G * 4 > 860_000:  # 1 MB minus Mosaic overhead headroom
                    continue
                vmem = G * (
                    (N + 1) * (2 * band_width + 1) * 4 + 2 * S * L * 4
                )
                if vmem > 14_000_000:
                    continue
                return S, L, N, E_k, G
    return None


def poa_batch_consensus_banded(
    windows: list[list[str]],
    gap: int = -8,
    mismatch: int = -6,
    match: int = 8,
    max_nodes: int | None = None,
    band_width: int = 256,
    weights: list[list[np.ndarray]] | None = None,
    use_pallas: bool | None = None,
    band_mode: str = "static_band",
) -> tuple[list[str], list[np.ndarray], list[int]]:
    """Banded POA consensus — the TPU kernel realization of
    cudapoa_nw_banded.cuh (static and adaptive modes incl. the in-kernel
    shift-rerun protocol), bit-exact to the host chain
    cpu_reference.poa_consensus(band_mode=...). Windows the kernel flags
    (boundary-cell traceback, band exceeding the allocated lanes,
    capacity overflow) are re-run through the host banded chain. Returns
    (consensus, coverage, status) with jax_poa's internal codes (0 ok)."""
    from genomeworks_tpu.poa.cpu_reference import PoaError, poa_consensus
    from genomeworks_tpu.ops.poa_pallas import poa_consensus_pallas

    adaptive = band_mode.startswith("adaptive")
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    # adaptive rules can grow the band to 2x the rule-1/2 width on rerun;
    # allocate lanes for the common growth, host-fallback beyond. Rounded
    # to a pow2 lane count (dynamic rolls are miscompiled on non-pow2
    # vreg widths — ops/poa_pallas._pow2_lanes); the kernel applies the
    # same rounding, so plan and kernel budgets agree.
    from genomeworks_tpu.ops.poa_pallas import _pow2_lanes

    band_alloc = _pow2_lanes(
        band_width if not adaptive else min(1536, max(2 * band_width, 512))
    )
    plan = (
        _pallas_banded_plan(
            windows, max_nodes, MAX_NODE_EDGES, MAX_NODE_ALIGNMENTS,
            band_alloc, unit_w=weights is None,
        )
        if use_pallas
        else None
    )

    def host_one(b):
        try:
            c, v = poa_consensus(
                windows[b], weights[b] if weights else None, gap, mismatch,
                match, max_nodes, band_mode=band_mode,
                band_width=band_width,
            )
            return c, v, 0
        except PoaError as e:
            code = {
                "node_count_exceeded_maximum_graph_size": 1,
                "edge_count_exceeded_maximum_graph_size": 2,
                "loop_count_exceeded_upper_bound": 3,
            }.get(str(e), 3)
            return "", np.zeros(0, np.int32), code

    if plan is None:
        out = [host_one(b) for b in range(len(windows))]
        return [o[0] for o in out], [o[1] for o in out], [o[2] for o in out]

    S, L, N, E_k, G = plan
    seqs, wts, lens, nseqs = _pack_windows(windows, weights, S, L)
    B = len(windows)
    pad = (-B) % G
    if pad:
        seqs = np.concatenate([seqs, np.zeros((pad, S, L), seqs.dtype)])
        if wts is not None:
            wts = np.concatenate([wts, np.ones((pad, S, L), np.int32)])
        lens = np.concatenate([lens, np.zeros((pad, S), np.int32)])
        nseqs = np.concatenate([nseqs, np.zeros(pad, np.int32)])
    wts_dev = (
        jnp.ones((1, 1, 1), jnp.int32) if weights is None
        else jnp.asarray(wts)
    )
    cons, cov, length, err = poa_consensus_pallas(
        jnp.asarray(seqs.astype(np.uint8)), wts_dev, jnp.asarray(lens),
        jnp.asarray(nseqs),
        S=S, L=L, N=N, E=E_k, A=min(MAX_NODE_ALIGNMENTS, E_k),
        gap=gap, mismatch=mismatch, match=match, windows_per_step=G,
        band_width=band_width, band_alloc=band_alloc, adaptive=adaptive,
    )
    cons = np.asarray(cons)
    cov = np.asarray(cov)
    length = np.asarray(length)
    err = np.asarray(err)
    out_cons, out_cov, out_status = [], [], []
    for b in range(len(windows)):
        if err[b] != 0:
            # host banded rerun: exact semantics incl. capacity errors
            c, v, st = host_one(b)
            out_cons.append(c)
            out_cov.append(v)
            out_status.append(st)
        else:
            k = int(length[b])
            out_cons.append(
                bytes(cons[b, :k][::-1].astype(np.uint8)).decode("latin1")
            )
            out_cov.append(cov[b, :k][::-1].copy())
            out_status.append(0)
    return out_cons, out_cov, out_status


def _racon_sort_host(n, in_edges, in_count, al, al_count):
    """Host half of the MSA finishing pass: raconTopologicalSortDeviceUtil
    (cudapoa_topsort.cuh:104) + getNodeIDToMSAPosDevice
    (cudapoa_generate_msa.cuh:35) fused — returns (node->msa column,
    msa_length)."""
    node_to_col = np.zeros(n, dtype=np.int32)
    marks = np.zeros(n, dtype=np.int8)
    check_aligned = np.ones(n, dtype=bool)
    stack: list[int] = []
    col = 0
    for i in range(n):
        if marks[i] != 0:
            continue
        stack.append(i)
        while stack:
            nid = stack[-1]
            valid = True
            if marks[nid] != 2:
                for e in range(in_count[nid]):
                    b = in_edges[nid, e]
                    if marks[b] != 2:
                        stack.append(int(b))
                        valid = False
                if check_aligned[nid]:
                    for a in range(al_count[nid]):
                        aid = al[nid, a]
                        if marks[aid] != 2:
                            stack.append(int(aid))
                            check_aligned[aid] = False
                            valid = False
                if valid:
                    marks[nid] = 2
                    if check_aligned[nid]:
                        node_to_col[nid] = col
                        for a in range(al_count[nid]):
                            node_to_col[al[nid, a]] = col
                        col += 1
            if valid:
                stack.pop()
    return node_to_col, col


def _poa_batch_msa_pallas(windows, gap, mismatch, match, max_nodes,
                          max_edges, max_alignments, weights):
    """MSA via the per-window Pallas kernel (racon sort + column map +
    emission all in-kernel)."""
    from genomeworks_tpu.ops.poa_pallas import poa_consensus_pallas

    S, L, N, E_k, G = _pallas_poa_plan(
        windows, max_nodes, max_edges, max_alignments, True
    )
    assert G == 1  # MSA fusion is a planned follow-up
    N_full = 3 * L if max_nodes is None else min(max_nodes, 3 * L)
    seqs, wts, lens, nseqs = _pack_windows(windows, weights, S, L)
    wts_dev = (
        jnp.ones((1, 1, 1), jnp.int32) if weights is None
        else jnp.asarray(wts)
    )
    cons, cov, length, err, msa, mlen = poa_consensus_pallas(
        jnp.asarray(seqs.astype(np.uint8)), wts_dev, jnp.asarray(lens),
        jnp.asarray(nseqs),
        S=S, L=L, N=N, E=E_k, A=min(max_alignments, E_k),
        gap=gap, mismatch=mismatch, match=match, msa=True,
    )
    msa = np.asarray(msa)
    mlen = np.asarray(mlen)
    err = np.asarray(err)
    out_msa, out_status = [], []
    redo = []
    for b, w in enumerate(windows):
        if err[b] != 0:
            if E_k < max_edges or N < N_full:
                redo.append(b)
            out_msa.append([])
            out_status.append(int(err[b]))
            continue
        k = int(mlen[b])
        out_msa.append(
            [bytes(msa[b, s, :k].astype(np.uint8)).decode("latin1")
             for s in range(len(w))]
        )
        out_status.append(0)
    if redo:
        r_msa, r_st = poa_batch_msa(
            [windows[b] for b in redo], gap, mismatch, match, max_nodes,
            max_edges, max_alignments,
            [weights[b] for b in redo] if weights else None,
            use_pallas=False,
        )
        for i, b in enumerate(redo):
            out_msa[b], out_status[b] = r_msa[i], r_st[i]
    return out_msa, out_status


def poa_batch_msa_banded(
    windows: list[list[str]],
    gap: int = -8,
    mismatch: int = -6,
    match: int = 8,
    max_nodes: int | None = None,
    band_width: int = 256,
    weights: list[list[np.ndarray]] | None = None,
    use_pallas: bool | None = None,
    band_mode: str = "static_band",
) -> tuple[list[list[str]], list[int]]:
    """Banded POA with MSA output on device — the banded NW phases of
    poa_batch_consensus_banded composed with the in-kernel racon
    sort/column-map/emission of _poa_batch_msa_pallas (the reference
    instantiates MSA x every band mode in one kernel,
    cudapoa_kernels.cuh:613-1053; r4 ran banded MSA as a per-window host
    loop). Kernel-flagged windows re-run through the host banded chain."""
    from genomeworks_tpu.poa.cpu_reference import PoaError, poa_msa
    from genomeworks_tpu.ops.poa_pallas import _pow2_lanes, poa_consensus_pallas

    adaptive = band_mode.startswith("adaptive")
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    band_alloc = _pow2_lanes(
        band_width if not adaptive else min(1536, max(2 * band_width, 512))
    )
    plan = (
        _pallas_banded_plan(
            windows, max_nodes, MAX_NODE_EDGES, MAX_NODE_ALIGNMENTS,
            band_alloc, unit_w=weights is None, msa=True,
        )
        if use_pallas
        else None
    )

    def host_one(b):
        try:
            return poa_msa(
                windows[b], weights[b] if weights else None, gap, mismatch,
                match, max_nodes, band_mode=band_mode,
                band_width=band_width,
            ), 0
        except PoaError as e:
            code = {
                "node_count_exceeded_maximum_graph_size": 1,
                "edge_count_exceeded_maximum_graph_size": 2,
                "loop_count_exceeded_upper_bound": 3,
            }.get(str(e), 3)
            return [], code

    if plan is None:
        out = [host_one(b) for b in range(len(windows))]
        return [o[0] for o in out], [o[1] for o in out]

    S, L, N, E_k, G = plan
    assert G == 1  # in-kernel MSA emission requires one window per step
    seqs, wts, lens, nseqs = _pack_windows(windows, weights, S, L)
    wts_dev = (
        jnp.ones((1, 1, 1), jnp.int32) if weights is None
        else jnp.asarray(wts)
    )
    cons, cov, length, err, msa, mlen = poa_consensus_pallas(
        jnp.asarray(seqs.astype(np.uint8)), wts_dev, jnp.asarray(lens),
        jnp.asarray(nseqs),
        S=S, L=L, N=N, E=E_k, A=min(MAX_NODE_ALIGNMENTS, E_k),
        gap=gap, mismatch=mismatch, match=match, msa=True,
        band_width=band_width, band_alloc=band_alloc, adaptive=adaptive,
    )
    msa = np.asarray(msa)
    mlen = np.asarray(mlen)
    err = np.asarray(err)
    out_msa, out_status = [], []
    for b, w in enumerate(windows):
        if err[b] != 0:
            # host banded rerun: exact semantics incl. capacity errors
            m, st = host_one(b)
            out_msa.append(m)
            out_status.append(st)
        else:
            k = int(mlen[b])
            out_msa.append(
                [bytes(msa[b, s, :k].astype(np.uint8)).decode("latin1")
                 for s in range(len(w))]
            )
            out_status.append(0)
    return out_msa, out_status


def poa_batch_msa(
    windows: list[list[str]],
    gap: int = -8,
    mismatch: int = -6,
    match: int = 8,
    max_nodes: int | None = None,
    max_edges: int = MAX_NODE_EDGES,
    max_alignments: int = MAX_NODE_ALIGNMENTS,
    weights: list[list[np.ndarray]] | None = None,
    use_pallas: bool | None = None,
) -> tuple[list[list[str]], list[int]]:
    """Batched multiple-sequence-alignment output (the OutputType::msa path
    of Batch::generate_poa + get_msa). On TPU the per-window Pallas kernel
    handles the whole chain; on CPU the graph build runs via the XLA path
    and the column mapping + per-sequence emission (pure pointer chasing,
    zero FLOPs) runs on host from a single device->host state copy, like
    the reference's D2H of multiple_sequence_alignments_d."""
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas and _pallas_poa_plan(
        windows, max_nodes, max_edges, max_alignments, True
    ) is not None:
        return _poa_batch_msa_pallas(
            windows, gap, mismatch, match, max_nodes, max_edges,
            max_alignments, weights,
        )
    state, nseqs = build_windows_graphs(
        windows, gap, mismatch, match, max_nodes, max_edges, max_alignments,
        weights, msa=True,
    )
    err = np.asarray(state["error"])
    node_count = np.asarray(state["node_count"])
    nodes = np.asarray(state["nodes"])
    in_edges = np.asarray(state["in_edges"])
    in_count = np.asarray(state["in_count"])
    al = np.asarray(state["al"])
    al_count = np.asarray(state["al_count"])
    seq_next = np.asarray(state["seq_next"])
    begin = np.asarray(state["begin"])

    out_msa: list[list[str]] = []
    out_status: list[int] = []
    for b in range(len(windows)):
        if err[b] != 0:
            out_msa.append([])
            out_status.append(int(err[b]))
            continue
        n = int(node_count[b])
        node_to_col, msa_length = _racon_sort_host(
            n, in_edges[b], in_count[b], al[b], al_count[b]
        )
        ns = int(nseqs[b])
        # vectorized walk over all sequences of the window at once: every
        # live sequence advances one node per step via seq_next
        cur = begin[b, :ns].copy()
        rows = np.full((ns, msa_length), ord("-"), dtype=np.uint8)
        live = np.ones(ns, dtype=bool)
        sidx = np.arange(ns)
        while live.any():
            c = np.clip(cur, 0, n - 1)
            rows[live, node_to_col[c[live]]] = nodes[b][c[live]]
            nxt = seq_next[b][c, sidx]
            cur = np.where(live, nxt, cur)
            live = live & (cur != -1)
        out_msa.append([bytes(r).decode("latin1") for r in rows])
        out_status.append(0)
    return out_msa, out_status
