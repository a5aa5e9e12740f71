"""POA Batch API tests (reference: cudapoa Test_CudapoaBatch.cu semantics,
batch.hpp contract) plus graph serialization and window parsing."""

import numpy as np
import pytest

from genomeworks_tpu.core.graph import DirectedGraph, UndirectedGraph
from genomeworks_tpu.poa import (
    BandMode,
    BatchConfig,
    OutputType,
    PoaBatch,
    StatusType,
    create_batch,
    decode_error,
    parse_cudapoa_file,
    resize_windows,
    get_multi_batch_sizes,
    poa_consensus,
    poa_msa,
)


def test_batch_config_derivations():
    cfg = BatchConfig(max_sequence_size=1024, band_width=256)
    assert cfg.max_consensus_size == 2048
    assert cfg.max_nodes_per_graph == 3072
    assert cfg.alignment_band_width == 256
    # band width is 128-aligned (batch.cu:41)
    assert BatchConfig(band_width=200).alignment_band_width == 256
    # banded matrix dim = band + right padding, 4-aligned (batch.cu:54)
    c2 = BatchConfig(max_sequence_size=512, band_width=128, band_mode=BandMode.static_band)
    assert c2.matrix_sequence_dimension == 136  # band + 8 right padding, 4-aligned
    assert c2.max_banded_pred_distance == 256


def test_add_poa_group_per_seq_status():
    cfg = BatchConfig(max_sequence_size=10, max_sequences_per_poa=3)
    b = PoaBatch(cfg)
    status, per_seq = b.add_poa_group(
        ["ACGTACGT", "A" * 11, "ACGT", "ACGT"]  # 2nd too long, 4th over count
    )
    assert status == StatusType.success
    assert per_seq == [
        StatusType.success,
        StatusType.exceeded_maximum_sequence_size,
        StatusType.success,
        StatusType.exceeded_maximum_sequences_per_poa,
    ]
    assert b.get_total_poas() == 1


def test_add_poa_group_rejects_empty_and_zero_weights():
    b = PoaBatch(BatchConfig(max_sequence_size=100))
    status, per_seq = b.add_poa_group([("ACGT", np.zeros(4))])
    assert status == StatusType.empty_poa_group
    assert per_seq == [StatusType.zero_weighted_poa_sequence]
    status, per_seq = b.add_poa_group([])
    assert status == StatusType.empty_poa_group


def test_batch_consensus_and_reset():
    b = create_batch(BatchConfig(max_sequence_size=64))
    seqs = ["ACGTACGTAA", "ACGCACGTAA", "ACGTACGTAA"]
    assert b.add_poa_group(seqs)[0] == StatusType.success
    assert b.add_poa_group(["TTTT", "TTTT"])[0] == StatusType.success
    b.generate_poa()
    cons, cov, st = b.get_consensus()
    assert st == [StatusType.success] * 2
    assert cons[0] == poa_consensus(seqs)[0]
    assert cons[1] == "TTTT"
    np.testing.assert_array_equal(cov[1], [2, 2, 2, 2])
    # consensus-only batch must refuse MSA output
    msa, mst = b.get_msa()
    assert mst == [StatusType.output_type_unavailable] * 2
    b.reset()
    assert b.get_total_poas() == 0
    with pytest.raises(RuntimeError):
        b.generate_poa()


def test_batch_msa_output():
    b = PoaBatch(BatchConfig(max_sequence_size=64), output_mask=OutputType.msa)
    seqs = ["ACGTACGT", "ACGTTTACGT", "ACGTACGT"]
    b.add_poa_group(seqs)
    b.generate_poa()
    msa, st = b.get_msa()
    assert st == [StatusType.success]
    assert msa[0] == poa_msa(seqs)
    cons, _, cst = b.get_consensus()
    assert cst == [StatusType.output_type_unavailable]


def test_batch_max_poas_capacity():
    b = PoaBatch(BatchConfig(max_sequence_size=32), max_poas=1)
    assert b.add_poa_group(["ACGT"])[0] == StatusType.success
    assert b.add_poa_group(["ACGT"])[0] == StatusType.exceeded_maximum_poas


def test_get_graphs_structure():
    b = PoaBatch(BatchConfig(max_sequence_size=32))
    b.add_poa_group(["ACGT", "ACGT"])
    b.generate_poa()
    graphs, st = b.get_graphs()
    assert st == [StatusType.success]
    g = graphs[0]
    assert g.get_node_label(0) == "A"
    assert g.get_node_label(3) == "T"
    assert g.get_adjacent_nodes(0) == [1]
    # backbone edge weights doubled by the second identical read
    assert g.get_edge_weight(0, 1) == 4
    dot = g.serialize_to_dot()
    assert dot.startswith("digraph g {") and '0 [label="A"];' in dot and "0 -> 1" in dot
    gfa = g.serialize_to_gfa()
    assert "S\t0\tA" in gfa and "L\t0\t+\t1\t+\t*" in gfa


def test_decode_error_messages():
    msg, hint = decode_error(StatusType.empty_poa_group)
    assert "No sequence was added" in msg
    assert decode_error(StatusType.success)[0] == "Success."
    with pytest.raises(RuntimeError):
        decode_error(99)


def test_undirected_graph_dot():
    g = UndirectedGraph()
    g.add_edge(1, 2, 7)
    assert g.get_adjacent_nodes(2) == [1]
    assert g.serialize_to_dot().startswith("graph g {")
    assert "1 -- 2" in g.serialize_to_dot()


def test_parse_cudapoa_file_and_resize(tmp_path):
    p = tmp_path / "w.txt"
    p.write_text("2\nACGT\nACGG\n1\nTTTT\n")
    w = parse_cudapoa_file(str(p))
    assert w == [["ACGT", "ACGG"], ["TTTT"]]
    # cyclic refill (utils.hpp:78)
    assert resize_windows([["A"], ["B"], ["C"]], 5) == [["A"], ["B"], ["C"], ["A"], ["B"]]
    assert resize_windows([["A"], ["B"], ["C"]], 2) == [["A"], ["B"]]


def test_get_multi_batch_sizes_bins_by_length():
    windows = [["ACGT"] * 2, ["A" * 500] * 3, ["A" * 30]]
    configs, groups = get_multi_batch_sizes(windows)
    assert sum(len(g) for g in groups) == 3
    # short windows land in small bins, long in bigger
    sizes = {tuple(g): c.max_sequence_size for c, g in zip(configs, groups)}
    for g, sz in sizes.items():
        for wid in g:
            assert max(len(s) for s in windows[wid]) <= sz


def test_gw_poa_cli(tmp_path, capsys):
    from genomeworks_tpu.tools.gw_poa import main

    p = tmp_path / "w.txt"
    p.write_text("3\nACGTACGTAA\nACGCACGTAA\nACGTACGTAA\n1\nGGGG\n")
    assert main(["-i", str(p)]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [poa_consensus(["ACGTACGTAA", "ACGCACGTAA", "ACGTACGTAA"])[0], "GGGG"]
    # MSA mode
    assert main(["-i", str(p), "-a"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[:3] == poa_msa(["ACGTACGTAA", "ACGCACGTAA", "ACGTACGTAA"])
    assert out[3] == "GGGG"
    # graph output
    dot = tmp_path / "g.dot"
    assert main(["-i", str(p), "-d", str(dot)]) == 0
    capsys.readouterr()
    assert dot.read_text().count("digraph g {") == 2


def test_parse_fasta_files_windows(tmp_path):
    from genomeworks_tpu.poa.windows import parse_fasta_files

    f1 = tmp_path / "a.fa"
    f1.write_text(">r0\nACGT\n>r1\nGGGG\n")
    f2 = tmp_path / "b.fa"
    f2.write_text(">s0\nACGA\n")
    # window i = i-th read of every input file
    w = parse_fasta_files([str(f1), str(f2)])
    assert w == [["ACGT", "ACGA"], ["GGGG"]]


def test_gw_poa_cli_fasta_inputs_and_max_groups(tmp_path, capsys):
    from genomeworks_tpu.tools.gw_poa import main
    from genomeworks_tpu.poa import poa_consensus

    f1 = tmp_path / "a.fa"
    f1.write_text(">r0\nACGTACGTAA\n>r1\nTTTTCCCC\n")
    f2 = tmp_path / "b.fa"
    f2.write_text(">s0\nACGCACGTAA\n>s1\nTTTTCCCC\n")
    assert main(["-i", str(f1), "-i", str(f2)]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == poa_consensus(["ACGTACGTAA", "ACGCACGTAA"])[0]
    assert out[1] == "TTTTCCCC"
    # -M limits processed windows
    assert main(["-i", str(f1), "-i", str(f2), "-M", "1"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
