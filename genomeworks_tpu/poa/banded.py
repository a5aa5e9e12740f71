"""Banded sequence-vs-graph NW — CPU reference of cudapoa's banded modes.

Exact port of cudapoa/src/cudapoa_nw_banded.cuh:
- band storage of width band_width + 8 per row, slot 0 holding the
  merged "column -1" boundary value (get_score_ptr/set_score :36-64);
- per-row band start from the matrix aspect ratio gradient with 4-cell
  alignment (get_band_start_for_row :66-77);
- adaptive band sizing ad-hoc rules 1-3 and rerun rules 5-6
  (needlemanWunschBanded :205-265);
- chunk-of-4 predecessor loads with the reference's conservative edge
  guard (get_scores :104-158) — reproduced exactly, including the
  guard-clipped reads near the band's right edge;
- in-band horizontal closure seeded from the boundary value (the
  shfl-up fixpoint loop :358-390 is a sequential prefix max);
- traceback with adaptive band-shift sentinels when the path approaches
  the band limits (ad-hoc rules 7-8, :436-462).

Sentinels/status codes match cudapoa_structs.cuh:41-54.
"""

from __future__ import annotations

import numpy as np

from genomeworks_tpu.poa.cpu_reference import PoaGraph

CELLS_PER_THREAD = 4
MIN_BAND_WIDTH = 128
BANDED_MATRIX_RIGHT_PADDING = CELLS_PER_THREAD * 2  # = 8
MAX_ADAPTIVE_BAND_WIDTH = 1536
SHIFT_LEFT = -10   # CUDAPOA_SHIFT_ADAPTIVE_BAND_TO_LEFT
SHIFT_RIGHT = -11  # CUDAPOA_SHIFT_ADAPTIVE_BAND_TO_RIGHT
BACKTRACKING_LOOP_FAILED = -1
ADAPTIVE_STORAGE_FAILED = -2

MIN_SCORE = -(1 << 30)  # numeric_limits<int32>::min() / 2


def _align_up(x, m):
    return ((x + m - 1) // m) * m


def _band_start_for_row(row, gradient, band_width, band_shift, max_column):
    """get_band_start_for_row (cudapoa_nw_banded.cuh:66-77).

    ``gradient`` is an np.float32 and the product is f32, matching the
    reference's ``int32_t(row * gradient)`` with ``float gradient``
    exactly (CUDA f32 multiply is IEEE; so is numpy's)."""
    diagonal_index = int(np.float32(row) * gradient)
    start_pos = max(0, diagonal_index - band_shift)
    if max_column < start_pos + band_width:
        start_pos = max(0, max_column - band_width + CELLS_PER_THREAD)
    return start_pos - (start_pos % CELLS_PER_THREAD)


def nw_align_banded(
    graph: PoaGraph,
    read: np.ndarray,
    gap: int,
    mismatch: int,
    match: int,
    band_width: int,
    adaptive: bool,
    rerun: int = 0,
    max_buffer_size: float | None = None,
):
    """Banded NW of read vs graph. Returns (alignment_graph,
    alignment_read) in BACKWARD order, or a negative sentinel/status int
    (SHIFT_LEFT/SHIFT_RIGHT/BACKTRACKING_LOOP_FAILED/
    ADAPTIVE_STORAGE_FAILED)."""
    g = graph
    nc = g.node_count
    rl = len(read)
    order = g.sorted_poa[:nc]
    pos_of = g.node_id_to_pos

    # f32 division as in the reference (cudapoa_nw_banded.cuh:207 —
    # ``float gradient = float(read_length+1)/float(graph_count+1)``;
    # CUDA f32 division is IEEE, as is numpy's). The r2 version computed
    # this in Python f64, which disagrees with the f32 value on trunc
    # boundaries of int(row * gradient).
    gradient = np.float32(rl + 1) / np.float32(nc + 1)
    max_column = rl + 1

    if adaptive:
        # the rules promote to double in the reference (0.08/0.1/1.1 are
        # f64 literals); float(gradient) keeps that chain in f64 here
        if float(gradient) > 1.1:  # ad-hoc rule 1
            band_width = max(
                band_width,
                _align_up(int(max_column * 0.08 * float(gradient)), MIN_BAND_WIDTH),
            )
        if float(gradient) < 0.8:  # ad-hoc rule 2
            band_width = max(
                band_width,
                _align_up(int(max_column * 0.1 / float(gradient)), MIN_BAND_WIDTH),
            )
        band_width = min(band_width, MAX_ADAPTIVE_BAND_WIDTH)  # rule 3
        if band_width == MAX_ADAPTIVE_BAND_WIDTH and rerun != 0:
            return rerun

    band_shift = band_width // 2  # ad-hoc rule 4

    if adaptive:
        if rerun == SHIFT_LEFT and band_width <= MAX_ADAPTIVE_BAND_WIDTH // 2:
            band_width *= 2               # rule 5
            band_shift = int(band_shift * 2.5)
        if rerun == SHIFT_RIGHT and band_width <= MAX_ADAPTIVE_BAND_WIDTH // 2:
            band_width *= 2               # rule 6
            band_shift = int(band_shift * 1.5)
        if max_buffer_size is not None:
            required = float(nc) * float(band_width + BANDED_MATRIX_RIGHT_PADDING)
            if required > max_buffer_size:
                return ADAPTIVE_STORAGE_FAILED

    W = band_width + BANDED_MATRIX_RIGHT_PADDING
    scores = np.full((nc + 1, W), MIN_SCORE, dtype=np.int64)
    band_starts = np.zeros(nc + 1, dtype=np.int64)

    # horizontal boundary (row 0, band_start = 0)
    scores[0, :] = np.arange(W, dtype=np.int64) * gap

    read_pad = np.zeros(max(rl, 0) + band_width + 2 * CELLS_PER_THREAD, dtype=np.int64)
    read_pad[:rl] = read

    def get_score(row, col):
        """get_score (:81-102): out-of-band -> MIN_SCORE; col -1 -> slot 0."""
        bs = band_starts[row]
        be = min(bs + band_width, max_column)
        if (col > be or col < bs) and col != -1:
            return MIN_SCORE
        slot = 0 if col == -1 else col - bs
        return int(scores[row, slot])

    for gp in range(nc):
        nid = order[gp]
        row = gp + 1
        bs = _band_start_for_row(row, gradient, band_width, band_shift, max_column)
        band_starts[row] = bs

        # initialize_band (:159-175): slot 0 and the right padding
        scores[row, :] = 0
        scores[row, 0] = MIN_SCORE
        scores[row, band_width : band_width + BANDED_MATRIX_RIGHT_PADDING] = MIN_SCORE

        pc = int(g.incoming_edge_count[nid])
        preds = g.incoming_edges[nid, :pc]

        # column -1 boundary (:296-326)
        if pc == 0:
            fe_prev = gap
        else:
            if bs > CELLS_PER_THREAD and pc == 1:
                fe_prev = MIN_SCORE + gap
            else:
                penalty = MIN_SCORE
                for p in range(pc):
                    pi = pos_of[preds[p]] + 1
                    penalty = max(penalty, get_score(pi, -1))
                fe_prev = penalty + gap
        scores[row, 0] = fe_prev

        gbase = g.nodes[nid]

        # cell chunks of 4 (get_scores semantics, :104-158)
        base = np.empty(band_width, dtype=np.int64)
        for k0 in range(0, band_width, CELLS_PER_THREAD):
            rp = bs + k0
            profile = np.where(
                read_pad[rp : rp + 4] == gbase, match, mismatch
            ).astype(np.int64)
            cand = np.full(4, MIN_SCORE, dtype=np.int64)
            for p in range(max(pc, 1)):
                if pc == 0:
                    pi = 0
                else:
                    pi = pos_of[preds[p]] + 1
                pbs = band_starts[pi]
                pbe = min(pbs + band_width - CELLS_PER_THREAD, max_column)
                if rp > pbe or rp < pbs:
                    vals = np.full(5, MIN_SCORE, dtype=np.int64)
                else:
                    vals = scores[pi, rp - pbs : rp - pbs + 5]
                c = np.maximum(vals[:4] + profile, vals[1:5] + gap)
                cand = np.maximum(cand, c)
            base[k0 : k0 + 4] = cand

        # horizontal closure seeded from the boundary (:358-390)
        last = fe_prev
        for k in range(band_width):
            v = max(base[k], last + gap)
            base[k] = v
            last = v
        # columns bs+1 .. bs+band_width live at slots 1 .. band_width; the
        # remaining right-padding slots keep MIN_SCORE from initialize_band
        scores[row, 1 : band_width + 1] = base

    # traceback start (:408-425)
    i, j = 0, rl
    mscore = MIN_SCORE
    for idx in range(1, nc + 1):
        if g.outgoing_edge_count[order[idx - 1]] == 0:
            s = get_score(idx, j)
            if mscore < s:
                mscore = s
                i = idx

    ag, ar = [], []
    loop_count = 0
    while not (i == 0 and j == 0) and loop_count < rl + nc + 2:
        loop_count += 1
        scores_ij = get_score(i, j)
        pred_found = False
        prev_i = prev_j = 0
        if i != 0 and j != 0:
            if adaptive and rerun == 0 and band_width < MAX_ADAPTIVE_BAND_WIDTH:
                # ad-hoc rules 7-8: path too close to a band limit
                threshold = max(1, max_column // 1024)
                if threshold < j < max_column - threshold:
                    bs = _band_start_for_row(
                        i, gradient, band_width, band_shift, max_column
                    )
                    if j <= bs + threshold:
                        return SHIFT_LEFT
                    if j >= bs + band_width - threshold:
                        return SHIFT_RIGHT

            nid = order[i - 1]
            mcost = match if g.nodes[nid] == read[j - 1] else mismatch
            pc = int(g.incoming_edge_count[nid])
            for p in range(max(pc, 1)):
                pi = 0 if pc == 0 else pos_of[g.incoming_edges[nid, p]] + 1
                if scores_ij == get_score(pi, j - 1) + mcost:
                    prev_i, prev_j, pred_found = pi, j - 1, True
                    break
                if pc == 0:
                    break
        if not pred_found and i != 0:
            nid = order[i - 1]
            pc = int(g.incoming_edge_count[nid])
            for p in range(max(pc, 1)):
                pi = 0 if pc == 0 else pos_of[g.incoming_edges[nid, p]] + 1
                if scores_ij == get_score(pi, j) + gap:
                    prev_i, prev_j, pred_found = pi, j, True
                    break
                if pc == 0:
                    break
        if not pred_found and scores_ij == get_score(i, j - 1) + gap:
            prev_i, prev_j, pred_found = i, j - 1, True

        ag.append(-1 if i == prev_i else order[i - 1])
        ar.append(-1 if j == prev_j else j - 1)
        i, j = prev_i, prev_j

    if loop_count >= rl + nc + 2:
        return BACKTRACKING_LOOP_FAILED
    return np.array(ag, dtype=np.int32), np.array(ar, dtype=np.int32)


TRACEBACK_BUFFER_FAILED = -3  # CUDAPOA_KERNEL_NW_TRACEBACK_BUFFER_FAILED


def nw_align_banded_tb(
    graph: PoaGraph,
    read: np.ndarray,
    gap: int,
    mismatch: int,
    match: int,
    band_width: int,
    adaptive: bool,
    score_matrix_height: int,
    rerun: int = 0,
    max_buffer_size: float | None = None,
):
    """Banded NW with a TRACEBACK BUFFER — exact port of
    cudapoa/src/cudapoa_nw_tb_banded.cuh (needlemanWunschBandedTraceback).

    Distinct semantics vs the score-re-derivation banded mode:
    - scores live in a rolling buffer of ``score_matrix_height`` rows
      (row % H); predecessors farther than H-1 rows are SKIPPED in the DP
      (:382,401,425,463);
    - the move is recorded during the forward pass in a full-height
      traceback matrix: trace > 0 = diagonal distance, < 0 = vertical
      distance, 0 = horizontal (:190-258 get_scores_tb, :523-530);
      within one predecessor diagonal wins ties over vertical; across
      predecessors and for the horizontal closure only a STRICTLY greater
      score replaces the stored move;
    - the traceback start only considers sinks with
      (graph_count - idx) < H (:548-560); none in range returns
      TRACEBACK_BUFFER_FAILED -> StatusType.exceeded_maximum_predecessor_
      distance (cudapoa_kernels.cuh:464-469);
    - the adaptive variant applies only rerun rules 5-6 + the storage
      check (:306-332 — the gradient-based widening rules 1-2 of the
      non-tb kernel are absent) and checks band-proximity rules 7-8 on
      the DIAGONAL branch of the walk (:600-619).

    Returns (alignment_graph, alignment_read) BACKWARD, or a sentinel int
    (SHIFT_LEFT/SHIFT_RIGHT/BACKTRACKING_LOOP_FAILED/
    ADAPTIVE_STORAGE_FAILED/TRACEBACK_BUFFER_FAILED)."""
    g = graph
    nc = g.node_count
    rl = len(read)
    H = score_matrix_height
    order = g.sorted_poa[:nc]
    pos_of = g.node_id_to_pos

    gradient = np.float32(rl + 1) / np.float32(nc + 1)
    max_column = rl + 1
    band_shift = band_width // 2  # rule 4

    if adaptive:
        if rerun == SHIFT_LEFT and band_width <= MAX_ADAPTIVE_BAND_WIDTH // 2:
            band_width *= 2               # rule 5
            band_shift = int(band_shift * 2.5)
        if rerun == SHIFT_RIGHT and band_width <= MAX_ADAPTIVE_BAND_WIDTH // 2:
            band_width *= 2               # rule 6
            band_shift = int(band_shift * 1.5)
        if max_buffer_size is not None:
            required = float(nc) * float(band_width + BANDED_MATRIX_RIGHT_PADDING)
            if required > max_buffer_size:
                return ADAPTIVE_STORAGE_FAILED

    W = band_width + BANDED_MATRIX_RIGHT_PADDING
    scores = np.full((H, W), MIN_SCORE, dtype=np.int64)  # rolling rows
    trace = np.zeros((nc + 1, W), dtype=np.int32)        # full height
    band_starts = np.zeros(nc + 1, dtype=np.int64)

    scores[0, :] = np.arange(W, dtype=np.int64) * gap  # row 0 boundary

    read_pad = np.zeros(rl + band_width + 2 * CELLS_PER_THREAD, dtype=np.int64)
    read_pad[:rl] = read

    def get_score(row, col):
        """get_score_tb (:118-138): out-of-band -> MIN; col -1 -> slot 0;
        row mapped into the rolling buffer."""
        bs = band_starts[row]
        be = min(bs + band_width, max_column)
        if (col > be or col < bs) and col != -1:
            return MIN_SCORE
        slot = 0 if col == -1 else col - bs
        return int(scores[row % H, slot])

    for gp in range(nc):
        nid = order[gp]
        row = gp + 1
        bs = _band_start_for_row(row, gradient, band_width, band_shift, max_column)
        band_starts[row] = bs

        # initialize_band_tb (:85-103): slot 0 + right padding only
        scores[row % H, 0] = MIN_SCORE
        scores[row % H, band_width:] = MIN_SCORE

        pc = int(g.incoming_edge_count[nid])
        preds = g.incoming_edges[nid, :pc]

        # vertical boundary + first traceback column (:366-438)
        fe_prev = 0
        if pc == 0:
            scores[row % H, 0] = gap
            trace[row, 0] = -row
        else:
            pred_idx = pos_of[preds[0]] + 1
            if (gp - pred_idx) < H:
                trace[row, 0] = -(row - pred_idx)
                if bs > CELLS_PER_THREAD and pc == 1:
                    fe_prev = MIN_SCORE + gap
                else:
                    penalty = max(MIN_SCORE, get_score(pred_idx, -1))
                    for p in range(1, pc):
                        pit = pos_of[preds[p]] + 1
                        if (row - pit) < H:
                            st = get_score(pit, -1)
                            if penalty < st:
                                penalty = st
                                trace[row, 0] = -(row - pit)
                    fe_prev = penalty + gap
                    scores[row % H, 0] = fe_prev
            else:
                penalty = MIN_SCORE
                for p in range(1, pc):
                    pit = pos_of[preds[p]] + 1
                    if (row - pit) < H:
                        st = get_score(pit, -1)
                        if penalty < st:
                            penalty = st
                            trace[row, 0] = -(row - pit)
                fe_prev = penalty + gap
                scores[row % H, 0] = fe_prev

        gbase = g.nodes[nid]

        # per-cell DP with per-predecessor distance skip (:446-536)
        base = np.full(band_width, MIN_SCORE, dtype=np.int64)
        tr_row = np.zeros(band_width, dtype=np.int32)
        plist = [0] if pc == 0 else [pos_of[preds[p]] + 1 for p in range(pc)]
        for k0 in range(0, band_width, CELLS_PER_THREAD):
            rp = bs + k0
            profile = np.where(
                read_pad[rp : rp + 4] == gbase, match, mismatch
            ).astype(np.int64)
            cur = np.full(4, MIN_SCORE, dtype=np.int64)
            tr4 = np.zeros(4, dtype=np.int32)
            for p_i, pi in enumerate(plist):
                # the reference gates predecessors p >= 1 on
                # (score_gIdx - pred_idx) < H (:460-467) but calls
                # get_scores_tb for pred 0 UNCONDITIONALLY (:456) — an
                # out-of-range pred 0 reads whatever newer row currently
                # occupies its rolling-buffer slot. Deterministic, so
                # reproduced exactly (scores[pi % H] below).
                if pc > 0 and p_i >= 1 and (row - pi) >= H:
                    continue
                pbs = band_starts[pi]
                pbe = min(pbs + band_width - CELLS_PER_THREAD, max_column)
                if rp > pbe or rp < pbs:
                    continue
                vals = scores[pi % H, rp - pbs : rp - pbs + 5]
                dist = row - pi
                for k in range(4):
                    diag = vals[k] + profile[k]
                    vert = vals[k + 1] + gap
                    if diag >= vert:
                        if diag > cur[k]:
                            cur[k] = diag
                            tr4[k] = dist
                    else:
                        if vert > cur[k]:
                            cur[k] = vert
                            tr4[k] = -dist
            base[k0 : k0 + 4] = cur
            tr_row[k0 : k0 + 4] = tr4

        # horizontal closure, strictly-greater -> trace 0 (:473-516)
        last = fe_prev
        for k in range(band_width):
            if base[k] < last + gap:
                base[k] = last + gap
                tr_row[k] = 0
            last = base[k]
        scores[row % H, 1 : band_width + 1] = base
        trace[row, 1 : band_width + 1] = tr_row

    # traceback start among distance-reachable sinks (:543-568)
    i, j = 0, rl
    mscore = MIN_SCORE
    for idx in range(1, nc + 1):
        if g.outgoing_edge_count[order[idx - 1]] == 0:
            if (nc - idx) < H:
                s = get_score(idx, j)
                if mscore < s:
                    mscore = s
                    i = idx
    if i == 0:
        return TRACEBACK_BUFFER_FAILED

    ag, ar = [], []
    loop_count = 0
    while not (i == 0 and j == 0) and loop_count < rl + nc + 2:
        loop_count += 1
        bs = _band_start_for_row(i, gradient, band_width, band_shift, max_column)
        t = int(trace[i, j - bs]) if 0 <= j - bs < W else 0
        if t == 0:
            ag.append(-1)
            ar.append(j - 1)
            j -= 1
        elif t < 0:
            ag.append(order[i - 1])
            ar.append(-1)
            i += t
        else:
            ag.append(order[i - 1])
            ar.append(j - 1)
            i -= t
            j -= 1
            if adaptive and rerun == 0 and band_width < MAX_ADAPTIVE_BAND_WIDTH:
                threshold = max(1, max_column // 1024)  # rule 7
                if threshold < j < max_column - threshold:
                    bs2 = _band_start_for_row(
                        i, gradient, band_width, band_shift, max_column
                    )
                    if j <= bs2 + threshold:  # rule 8-a
                        return SHIFT_LEFT
                    if j >= bs2 + band_width - threshold:  # rule 8-b
                        return SHIFT_RIGHT

    if loop_count >= rl + nc + 2:
        return BACKTRACKING_LOOP_FAILED
    return np.array(ag, dtype=np.int32), np.array(ar, dtype=np.int32)


def nw_align_banded_tb_with_rerun(
    graph: PoaGraph,
    read: np.ndarray,
    gap: int,
    mismatch: int,
    match: int,
    band_width: int,
    adaptive: bool,
    score_matrix_height: int,
    max_buffer_size: float | None = None,
):
    """generatePOAKernel rerun protocol for the traceback band modes
    (cudapoa_kernels.cuh:355-440)."""
    r = nw_align_banded_tb(
        graph, read, gap, mismatch, match, band_width, adaptive,
        score_matrix_height, 0, max_buffer_size,
    )
    if isinstance(r, int) and r in (SHIFT_LEFT, SHIFT_RIGHT):
        r = nw_align_banded_tb(
            graph, read, gap, mismatch, match, band_width, adaptive,
            score_matrix_height, r, max_buffer_size,
        )
    return r


def nw_align_banded_with_rerun(
    graph: PoaGraph,
    read: np.ndarray,
    gap: int,
    mismatch: int,
    match: int,
    band_width: int,
    adaptive: bool,
    max_buffer_size: float | None = None,
):
    """The generatePOAKernel rerun protocol (cudapoa_kernels.cuh:355-440):
    run once; on a band-shift sentinel re-run with the sentinel as the
    rerun code (doubled, shifted band)."""
    r = nw_align_banded(
        graph, read, gap, mismatch, match, band_width, adaptive, 0,
        max_buffer_size,
    )
    if isinstance(r, int) and r in (SHIFT_LEFT, SHIFT_RIGHT):
        r = nw_align_banded(
            graph, read, gap, mismatch, match, band_width, adaptive, r,
            max_buffer_size,
        )
    return r
