"""Hand-built graph fixtures ported from the reference's cudapoa unit
tests: topological sort (Test_CudapoaTopSort.cu:43-60) and consensus
generation (Test_CudapoaGenerateConsensus.cu:83-161). The reference
asserts the kernels' raw outputs on these graphs; here the same graphs
drive the CPU reference chain (which the TPU kernels are bit-parity
tested against)."""

import numpy as np

from genomeworks_tpu.poa.cpu_reference import PoaGraph, generate_consensus, topological_sort


def _graph_from_outgoing(outgoing, nodes=None, node_alignments=None,
                         coverage=None, out_w=None):
    n = len(outgoing)
    g = PoaGraph(max(n * 2, 16))
    g.node_count = n
    if nodes is not None:
        g.nodes[:n] = [ord(c) for c in nodes]
    for u, outs in enumerate(outgoing):
        for idx, v in enumerate(outs):
            oc = g.outgoing_edge_count[u]
            g.outgoing_edges[u, oc] = v
            g.outgoing_edge_count[u] = oc + 1
            ic = g.incoming_edge_count[v]
            g.incoming_edges[v, ic] = u
            if out_w is not None:
                g.incoming_edge_w[v, ic] = out_w[u][idx]
            g.incoming_edge_count[v] = ic + 1
    if node_alignments is not None:
        for u, als in enumerate(node_alignments):
            g.node_alignment_count[u] = len(als)
            for i, a in enumerate(als):
                g.node_alignments[u, i] = a
    if coverage is not None:
        g.node_coverage_counts[:n] = coverage
    return g


# --- topological sort (Test_CudapoaTopSort.cu getTopSortTestCases) ---------

TOPSORT_CASES = [
    ([[], [], [3], [1], [0, 1], [0, 2]], "4-5-0-2-3-1"),
    ([[1, 3], [2, 3], [3, 4, 5], [4, 5], [5], []], "0-1-2-3-4-5"),
    ([[], [], [3], [1], [0, 1, 7], [0, 2], [4], [5]], "6-4-7-5-0-2-3-1"),
]


def test_topological_sort_reference_fixtures():
    for outgoing, answer in TOPSORT_CASES:
        g = _graph_from_outgoing(outgoing)
        topological_sort(g)
        got = "-".join(str(int(x)) for x in g.sorted_poa[: g.node_count])
        assert got == answer, (outgoing, got, answer)


# --- consensus fixtures NOT ported -----------------------------------------
#
# Test_CudapoaGenerateConsensus.cu's BasicGenerateConsensus maps weights as
# incoming_edge_w[to_node * E + i] with i = SOURCE NODE ID (:62-73), while
# the kernel reads incoming_edge_w[node * E + e] with e = the incoming-edge
# SLOT. For every fixture whose source id differs from the slot index the
# kernel therefore reads zero weights, and the expected strings encode that
# behavior. The production path (addAlignmentToGraph) indexes by slot, as
# does this package; consensus correctness is instead covered by the
# window-level tests in test_poa.py (CPU-reference chain and TPU kernels,
# bit-parity on randomized windows) and by the sanity fixture below.

from genomeworks_tpu.poa.cpu_reference import poa_consensus


def test_consensus_weighted_branch_choice():
    # heavier branch wins: 3x G vs 1x T at the SNP position; coverage at
    # that position still reads 4 because it sums the node plus its
    # aligned alternatives (generate_consensus coverage semantics)
    seqs = ["ACGTA", "ACTTA", "ACGTA", "ACGTA"]
    consensus, coverage = poa_consensus(seqs)
    assert consensus == "ACGTA"
    assert [int(x) for x in coverage] == [4, 4, 4, 4, 4]
