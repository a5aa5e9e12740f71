"""CPU/NumPy reference implementation of partial-order alignment.

A faithful re-implementation of cudapoa's full-band algorithm chain —
serves as the oracle for the batched TPU implementation and as the
CPU baseline for the POA benchmark:

- backbone build: cudapoa_kernels.cuh:200-238
- sequence-vs-graph full-band NW: cudapoa_nw.cuh (row-major DP over
  topologically sorted nodes, per-predecessor diagonal/vertical candidates
  + in-row horizontal closure; traceback by score re-derivation with
  diagonal > vertical > horizontal priority and predecessor list order)
- graph update: cudapoa_add_alignment.cuh (node reuse via aligned-node
  lists, edge insertion with weight accumulation prev_weight+base_weight)
- topological sort: cudapoa_topsort.cuh:46 topologicalSortDeviceUtil
  (Kahn by ascending node id seeding, FIFO expansion in outgoing-edge
  order) — the default (non-SPOA_ACCURATE) variant
- consensus: cudapoa_generate_consensus.cuh (heaviest-edge predecessor
  pass in topological order with the reference's exact tie-breaks,
  branchCompletion when the max node is not a sink, backward emission +
  coverage = node + aligned-node coverages)
- MSA: cudapoa_generate_msa.cuh (racon/SPOA-exact DFS topological sort
  cudapoa_topsort.cuh:104, node->MSA-column map getNodeIDToMSAPosDevice
  :35 grouping aligned nodes into one column, per-sequence path walk
  generateMSADevice :56 following out-edges covered by the sequence)
  with the per-edge coverage bookkeeping of cudapoa_add_alignment.cuh
  :239-272 and begin-node tracking :215-219

Default scores match the reference tool/benchmark: gap=-8, mismatch=-6,
match=8 (benchmarks/multi_batch.hpp:62, application_parameters.hpp:30-45).
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAX_NODE_EDGES = 50  # cudapoa_structs.cuh CUDAPOA_MAX_NODE_EDGES
MAX_NODE_ALIGNMENTS = 50  # cudapoa_structs.cuh CUDAPOA_MAX_NODE_ALIGNMENTS


class PoaError(Exception):
    pass


@dataclasses.dataclass
class PoaGraph:
    max_nodes: int

    def __post_init__(self):
        n = self.max_nodes
        self.nodes = np.zeros(n, dtype=np.uint8)
        self.incoming_edges = np.zeros((n, MAX_NODE_EDGES), dtype=np.int32)
        self.incoming_edge_count = np.zeros(n, dtype=np.int32)
        self.incoming_edge_w = np.zeros((n, MAX_NODE_EDGES), dtype=np.int32)
        self.outgoing_edges = np.zeros((n, MAX_NODE_EDGES), dtype=np.int32)
        self.outgoing_edge_count = np.zeros(n, dtype=np.int32)
        self.node_alignments = np.zeros((n, MAX_NODE_ALIGNMENTS), dtype=np.int32)
        self.node_alignment_count = np.zeros(n, dtype=np.int32)
        self.node_coverage_counts = np.zeros(n, dtype=np.int32)
        self.sorted_poa = np.zeros(n, dtype=np.int32)
        self.node_id_to_pos = np.zeros(n, dtype=np.int32)
        self.node_count = 0
        # MSA bookkeeping (cudapoa_add_alignment.cuh:239-272): per outgoing
        # edge, the list of sequence ids whose path traverses it; and the
        # first graph node of each added sequence (:215-219).
        self.out_edge_coverage: dict[tuple[int, int], list[int]] = {}
        self.seq_begin_nodes: list[int] = []


def build_backbone(graph: PoaGraph, seq: np.ndarray, weights: np.ndarray) -> None:
    """cudapoa_kernels.cuh:200-238."""
    L = len(seq)
    if L > graph.max_nodes:
        raise PoaError("node_count_exceeded_maximum_graph_size")
    g = graph
    g.nodes[:L] = seq
    g.sorted_poa[:L] = np.arange(L)
    g.node_id_to_pos[:L] = np.arange(L)
    g.incoming_edge_count[:L] = 1
    g.incoming_edge_count[0] = 0
    g.outgoing_edge_count[:L] = 1
    g.outgoing_edge_count[L - 1] = 0
    g.node_alignment_count[:L] = 0
    g.node_coverage_counts[:L] = 1
    g.incoming_edges[1:L, 0] = np.arange(L - 1)
    g.outgoing_edges[: L - 1, 0] = np.arange(1, L)
    g.incoming_edge_w[0, 0] = weights[0]
    g.incoming_edge_w[1:L, 0] = weights[: L - 1].astype(np.int32) + weights[1:L]
    g.node_count = L
    # backbone edges are all covered by sequence 0 (kernels.cuh:212-234)
    for i in range(L - 1):
        g.out_edge_coverage[(i, 0)] = [0]
    g.seq_begin_nodes = [0]


def nw_align(
    graph: PoaGraph,
    read: np.ndarray,
    gap: int,
    mismatch: int,
    match: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Full-band NW of read vs graph (cudapoa_nw.cuh). Returns
    (alignment_graph, alignment_read) in BACKWARD order (same as the
    device buffers consumed by addAlignmentToGraph)."""
    g = graph
    n = g.node_count
    L = len(read)
    order = g.sorted_poa[:n]
    pos_of = g.node_id_to_pos

    scores = np.zeros((n + 1, L + 1), dtype=np.int32)
    scores[0, :] = np.arange(L + 1, dtype=np.int32) * gap

    # column 0 (vertical boundary, cudapoa_nw.cuh:190-215)
    for gp in range(n):
        nid = order[gp]
        pc = g.incoming_edge_count[nid]
        if pc == 0:
            scores[gp + 1, 0] = gap
        else:
            preds = g.incoming_edges[nid, :pc]
            scores[gp + 1, 0] = scores[pos_of[preds] + 1, 0].max() + gap

    j_idx = np.arange(1, L + 1)
    slope = gap * np.arange(L + 1, dtype=np.int64)
    for gp in range(n):
        nid = order[gp]
        pc = g.incoming_edge_count[nid]
        sub = np.where(read == g.nodes[nid], match, mismatch).astype(np.int32)
        if pc == 0:
            pred_rows = scores[0:1]
        else:
            preds = g.incoming_edges[nid, :pc]
            pred_rows = scores[pos_of[preds] + 1]
        cand = np.maximum(pred_rows[:, :-1] + sub[None, :], pred_rows[:, 1:] + gap)
        base = cand.max(axis=0)
        # horizontal closure seeded from column 0
        row = np.empty(L + 1, dtype=np.int64)
        row[0] = scores[gp + 1, 0]
        row[1:] = base
        row = np.maximum.accumulate(row - slope) + slope
        scores[gp + 1] = row.astype(np.int32)

    # traceback start: max score at column L among sink rows (first max wins)
    best_i, best = 0, np.iinfo(np.int32).min
    for idx in range(1, n + 1):
        if g.outgoing_edge_count[order[idx - 1]] == 0:
            s = scores[idx, L]
            if best < s:
                best = s
                best_i = idx

    i, j = best_i, L
    ag, ar = [], []
    loop_count = 0
    max_loops = L + n + 2
    while not (i == 0 and j == 0) and loop_count < max_loops:
        loop_count += 1
        sij = scores[i, j]
        prev_i = prev_j = 0
        found = False
        if i != 0 and j != 0:
            nid = order[i - 1]
            mcost = match if g.nodes[nid] == read[j - 1] else mismatch
            pc = g.incoming_edge_count[nid]
            pi = 0 if pc == 0 else pos_of[g.incoming_edges[nid, 0]] + 1
            if sij == scores[pi, j - 1] + mcost:
                prev_i, prev_j, found = pi, j - 1, True
            if not found:
                for p in range(1, pc):
                    pi = pos_of[g.incoming_edges[nid, p]] + 1
                    if sij == scores[pi, j - 1] + mcost:
                        prev_i, prev_j, found = pi, j - 1, True
                        break
        if not found and i != 0:
            nid = order[i - 1]
            pc = g.incoming_edge_count[nid]
            pi = 0 if pc == 0 else pos_of[g.incoming_edges[nid, 0]] + 1
            if sij == scores[pi, j] + gap:
                prev_i, prev_j, found = pi, j, True
            if not found:
                for p in range(1, pc):
                    pi = pos_of[g.incoming_edges[nid, p]] + 1
                    if sij == scores[pi, j] + gap:
                        prev_i, prev_j, found = pi, j, True
                        break
        if not found and sij == scores[i, j - 1] + gap:
            prev_i, prev_j, found = i, j - 1, True

        ag.append(-1 if i == prev_i else order[i - 1])
        ar.append(-1 if j == prev_j else j - 1)
        i, j = prev_i, prev_j

    if loop_count >= max_loops:
        raise PoaError("loop_count_exceeded_upper_bound")
    return np.array(ag, dtype=np.int32), np.array(ar, dtype=np.int32)


def add_alignment(
    graph: PoaGraph,
    alignment_graph: np.ndarray,
    alignment_read: np.ndarray,
    read: np.ndarray,
    weights: np.ndarray,
    seq_id: int | None = None,
) -> None:
    """cudapoa_add_alignment.cuh addAlignmentToGraph. When ``seq_id`` is
    given, MSA bookkeeping (edge coverage, begin nodes) is tracked as in
    the MSA=true template instantiation (:215-272)."""
    g = graph
    head = -1
    prev_weight = 0
    for pos in range(len(alignment_graph) - 1, -1, -1):
        read_pos = alignment_read[pos]
        if read_pos == -1:
            continue
        w = int(weights[read_pos])
        base = read[read_pos]
        gid = alignment_graph[pos]
        if gid == -1:
            cur = g.node_count
            g.node_count += 1
            if g.node_count >= g.max_nodes:
                raise PoaError("node_count_exceeded_maximum_graph_size")
            g.nodes[cur] = base
            g.outgoing_edge_count[cur] = 0
            g.incoming_edge_count[cur] = 0
            g.node_alignment_count[cur] = 0
            g.node_coverage_counts[cur] = 0
        else:
            if g.nodes[gid] == base:
                cur = gid
            else:
                na = g.node_alignment_count[gid]
                aligned = -1
                for t in range(na):
                    aid = g.node_alignments[gid, t]
                    if g.nodes[aid] == base:
                        aligned = aid
                        break
                if aligned != -1:
                    cur = aligned
                else:
                    cur = g.node_count
                    g.node_count += 1
                    if g.node_count >= g.max_nodes:
                        raise PoaError("node_count_exceeded_maximum_graph_size")
                    g.nodes[cur] = base
                    g.outgoing_edge_count[cur] = 0
                    g.incoming_edge_count[cur] = 0
                    g.node_alignment_count[cur] = 0
                    g.node_coverage_counts[cur] = 0
                    new_al = 0
                    for t in range(na):
                        aid = g.node_alignments[gid, t]
                        g.node_alignments[aid, g.node_alignment_count[aid]] = cur
                        g.node_alignment_count[aid] += 1
                        g.node_alignments[cur, new_al] = aid
                        new_al += 1
                    g.node_alignments[gid, na] = cur
                    g.node_alignment_count[gid] = na + 1
                    g.node_alignments[cur, new_al] = gid
                    new_al += 1
                    g.node_alignment_count[cur] = new_al

        if seq_id is not None and read_pos == 0:
            g.seq_begin_nodes.append(int(cur))

        if head != -1:
            in_count = g.incoming_edge_count[cur]
            edge_exists = False
            for e in range(in_count):
                if g.incoming_edges[cur, e] == head:
                    edge_exists = True
                    g.incoming_edge_w[cur, e] += prev_weight + w
            if not edge_exists:
                g.incoming_edges[cur, in_count] = head
                g.incoming_edge_w[cur, in_count] = prev_weight + w
                g.incoming_edge_count[cur] = in_count + 1
                oc = g.outgoing_edge_count[head]
                g.outgoing_edges[head, oc] = cur
                if seq_id is not None:
                    g.out_edge_coverage[(int(head), int(oc))] = [seq_id]
                g.outgoing_edge_count[head] = oc + 1
                if oc + 1 >= MAX_NODE_EDGES or in_count + 1 >= MAX_NODE_EDGES:
                    raise PoaError("edge_count_exceeded_maximum_graph_size")
            elif seq_id is not None:
                for e in range(g.outgoing_edge_count[head]):
                    if g.outgoing_edges[head, e] == cur:
                        g.out_edge_coverage.setdefault(
                            (int(head), int(e)), []
                        ).append(seq_id)
                        break
        head = cur
        g.node_coverage_counts[head] += 1
        prev_weight = w


def topological_sort(graph: PoaGraph) -> None:
    """cudapoa_topsort.cuh:46 topologicalSortDeviceUtil (default variant)."""
    g = graph
    n = g.node_count
    local = g.incoming_edge_count[:n].copy()
    sorted_pos = 0
    for nid in range(n):
        if local[nid] == 0:
            g.node_id_to_pos[nid] = sorted_pos
            g.sorted_poa[sorted_pos] = nid
            sorted_pos += 1
    i = 0
    while i < sorted_pos:
        node = g.sorted_poa[i]
        for e in range(g.outgoing_edge_count[node]):
            out = g.outgoing_edges[node, e]
            local[out] -= 1
            if local[out] == 0:
                g.node_id_to_pos[out] = sorted_pos
                g.sorted_poa[sorted_pos] = out
                sorted_pos += 1
        i += 1
    if sorted_pos != n:
        raise PoaError("graph is not a DAG after update")


def racon_topological_sort(graph: PoaGraph) -> tuple[np.ndarray, np.ndarray]:
    """cudapoa_topsort.cuh:104 raconTopologicalSortDeviceUtil — SPOA-exact
    DFS ordering that places every node immediately followed by its aligned
    nodes. Returns (sorted_poa, node_id_to_pos) without mutating the graph
    (the MSA kernel recomputes this ordering privately)."""
    g = graph
    n = g.node_count
    sorted_poa = np.zeros(n, dtype=np.int32)
    pos_of = np.zeros(g.max_nodes, dtype=np.int32)
    marks = np.zeros(g.max_nodes, dtype=np.int8)
    check_aligned = np.ones(g.max_nodes, dtype=bool)
    stack: list[int] = []
    out = 0
    for i in range(n):
        if marks[i] != 0:
            continue
        stack.append(i)
        while stack:
            nid = stack[-1]
            valid = True
            if marks[nid] != 2:
                for e in range(g.incoming_edge_count[nid]):
                    b = g.incoming_edges[nid, e]
                    if marks[b] != 2:
                        stack.append(int(b))
                        valid = False
                if check_aligned[nid]:
                    for a in range(g.node_alignment_count[nid]):
                        aid = g.node_alignments[nid, a]
                        if marks[aid] != 2:
                            stack.append(int(aid))
                            check_aligned[aid] = False
                            valid = False
                if valid:
                    marks[nid] = 2
                    if check_aligned[nid]:
                        sorted_poa[out] = nid
                        pos_of[nid] = out
                        out += 1
                        for a in range(g.node_alignment_count[nid]):
                            aid = g.node_alignments[nid, a]
                            sorted_poa[out] = aid
                            pos_of[aid] = out
                            out += 1
                else:
                    marks[nid] = 1
            if valid:
                stack.pop()
    return sorted_poa, pos_of


def generate_msa(graph: PoaGraph, num_sequences: int) -> list[str]:
    """cudapoa_generate_msa.cuh — node->column map (getNodeIDToMSAPosDevice
    :35) over the racon ordering, then one gapped row per sequence
    (generateMSADevice :56)."""
    g = graph
    n = g.node_count
    sorted_poa, _ = racon_topological_sort(g)

    node_to_col = np.zeros(n, dtype=np.int32)
    col = 0
    rank = 0
    while rank < n:
        nid = sorted_poa[rank]
        node_to_col[nid] = col
        for _ in range(g.node_alignment_count[nid]):
            rank += 1
            node_to_col[sorted_poa[rank]] = col
        col += 1
        rank += 1
    msa_length = col

    rows: list[str] = []
    for s in range(num_sequences):
        row = np.full(msa_length, ord("-"), dtype=np.uint8)
        nid = g.seq_begin_nodes[s]
        while True:
            row[node_to_col[nid]] = g.nodes[nid]
            nxt = -1
            for e in range(g.outgoing_edge_count[nid]):
                cov = g.out_edge_coverage.get((int(nid), int(e)), [])
                if s in cov:
                    nxt = int(g.outgoing_edges[nid, e])
                    break
            if nxt == -1:
                break
            nid = nxt
        rows.append(bytes(row).decode("latin1"))
    return rows


def poa_msa(
    seqs: list[str],
    weights: list[np.ndarray] | None = None,
    gap: int = -8,
    mismatch: int = -6,
    match: int = 8,
    max_nodes: int | None = None,
    band_mode: str = "full_band",
    band_width: int = 256,
    max_pred_distance: int | None = None,
) -> list[str]:
    """Full window POA returning the multiple sequence alignment (the
    OutputType::msa path of Batch::generate_poa + get_msa)."""
    g = _build_window_graph(
        seqs, weights, gap, mismatch, match, max_nodes, band_mode,
        band_width, max_pred_distance,
    )
    return generate_msa(g, len(seqs))


def _build_window_graph(
    seqs: list[str],
    weights: list[np.ndarray] | None,
    gap: int,
    mismatch: int,
    match: int,
    max_nodes: int | None,
    band_mode: str = "full_band",
    band_width: int = 256,
    max_pred_distance: int | None = None,
) -> PoaGraph:
    """band_mode in {"full_band", "static_band", "adaptive_band",
    "static_band_traceback", "adaptive_band_traceback"} — banded modes run
    the exact port of cudapoa_nw_banded.cuh incl. the adaptive band-shift
    rerun protocol; the *_traceback modes run the distinct
    cudapoa_nw_tb_banded.cuh semantics (rolling score buffer of
    ``max_pred_distance`` rows, distance-gated predecessors, stored-trace
    walk — default distance 2 * band_width, batch.cu:58)."""
    if not seqs:
        raise ValueError("empty window")
    enc = [np.frombuffer(s.encode("latin1"), dtype=np.uint8) for s in seqs]
    if weights is None:
        weights = [np.ones(len(s), dtype=np.int32) for s in seqs]
    if max_nodes is None:
        max_nodes = 3 * max(len(s) for s in seqs)
    g = PoaGraph(max_nodes)
    build_backbone(g, enc[0], weights[0])
    for s in range(1, len(enc)):
        if g.node_count >= g.max_nodes:
            raise PoaError("node_count_exceeded_maximum_graph_size")
        if band_mode == "full_band":
            ag, ar = nw_align(g, enc[s], gap, mismatch, match)
        else:
            from genomeworks_tpu.poa import banded

            if band_mode.endswith("_traceback"):
                H = (
                    max_pred_distance if max_pred_distance
                    else 2 * band_width
                )
                r = banded.nw_align_banded_tb_with_rerun(
                    g, enc[s], gap, mismatch, match, band_width,
                    adaptive=band_mode.startswith("adaptive"),
                    score_matrix_height=H,
                )
            else:
                r = banded.nw_align_banded_with_rerun(
                    g, enc[s], gap, mismatch, match, band_width,
                    adaptive=band_mode.startswith("adaptive"),
                )
            if isinstance(r, int):
                if r == banded.ADAPTIVE_STORAGE_FAILED:
                    raise PoaError("exceeded_adaptive_banded_matrix_size")
                if r == banded.TRACEBACK_BUFFER_FAILED:
                    raise PoaError("exceeded_maximum_predecessor_distance")
                raise PoaError("loop_count_exceeded_upper_bound")
            ag, ar = r
        add_alignment(g, ag, ar, enc[s], weights[s], seq_id=s)
        topological_sort(g)
    return g


def generate_consensus(graph: PoaGraph) -> tuple[str, np.ndarray]:
    """cudapoa_generate_consensus.cuh generateConsensus + branchCompletion."""
    g = graph
    n = g.node_count
    scores = np.full(n, -1, dtype=np.int64)
    predecessors = np.full(n, -1, dtype=np.int32)

    max_score_id = 0
    max_score = -1
    for gp in range(n):
        nid = g.sorted_poa[gp]
        s = int(scores[nid])
        for e in range(g.incoming_edge_count[nid]):
            ew = int(g.incoming_edge_w[nid, e])
            begin = g.incoming_edges[nid, e]
            if s < ew or (
                s == ew
                and predecessors[nid] != -1
                and scores[predecessors[nid]] <= scores[begin]
            ):
                s = ew
                predecessors[nid] = begin
        if predecessors[nid] != -1:
            s += int(scores[predecessors[nid]])
        if max_score <= s:
            max_score_id = nid
            max_score = s
        scores[nid] = s

    loop_count = 0
    while g.outgoing_edge_count[max_score_id] != 0 and loop_count < n:
        max_score_id = _branch_completion(g, scores, predecessors, max_score_id)
        loop_count += 1
    if loop_count >= n:
        raise PoaError("loop_count_exceeded_upper_bound")

    # backward emission (host reverses)
    out = []
    cov = []

    def _cov(nid):
        c = int(g.node_coverage_counts[nid])
        for a in range(g.node_alignment_count[nid]):
            c += int(g.node_coverage_counts[g.node_alignments[nid, a]])
        return c

    nid = max_score_id
    while predecessors[nid] != -1:
        out.append(g.nodes[nid])
        cov.append(_cov(nid))
        nid = predecessors[nid]
    out.append(g.nodes[nid])
    cov.append(_cov(nid))

    consensus = bytes(out[::-1]).decode("latin1")
    return consensus, np.array(cov[::-1], dtype=np.int32)


def _branch_completion(g: PoaGraph, scores, predecessors, max_score_id) -> int:
    """cudapoa_generate_consensus.cuh:35-120 branchCompletion."""
    pos = g.node_id_to_pos[max_score_id]
    nid = g.sorted_poa[pos]
    for oe in range(g.outgoing_edge_count[nid]):
        out = g.outgoing_edges[nid, oe]
        for ie in range(g.incoming_edge_count[out]):
            iid = g.incoming_edges[out, ie]
            if iid != nid:
                scores[iid] = -1

    max_score = 0
    new_max_id = 0
    for gp in range(pos + 1, g.node_count):
        node = g.sorted_poa[gp]
        predecessors[node] = -1
        s = -1
        for e in range(g.incoming_edge_count[node]):
            begin = g.incoming_edges[node, e]
            if scores[begin] == -1:
                continue
            ew = int(g.incoming_edge_w[node, e])
            if s < ew or (
                s == ew
                and predecessors[node] != -1
                and scores[predecessors[node]] <= scores[begin]
            ):
                s = ew
                predecessors[node] = begin
        if predecessors[node] != -1:
            s += int(scores[predecessors[node]])
        if max_score <= s:
            max_score = s
            new_max_id = node
        scores[node] = s
    return new_max_id


def poa_consensus(
    seqs: list[str],
    weights: list[np.ndarray] | None = None,
    gap: int = -8,
    mismatch: int = -6,
    match: int = 8,
    max_nodes: int | None = None,
    band_mode: str = "full_band",
    band_width: int = 256,
    max_pred_distance: int | None = None,
) -> tuple[str, np.ndarray]:
    """Full window POA: backbone + iterative align/add/sort + consensus.
    Returns (consensus string, per-base coverage). max_nodes defaults to
    3 * max sequence size (BatchConfig ctor, batch.cu)."""
    g = _build_window_graph(
        seqs, weights, gap, mismatch, match, max_nodes, band_mode,
        band_width, max_pred_distance,
    )
    return generate_consensus(g)
