"""End-to-end mapper tests on synthetic reads with known overlaps and on
the reference's bundled fixtures."""

import numpy as np
import pytest

from genomeworks_tpu.core.sequence import reverse_complement
from genomeworks_tpu.io.fasta import FastaParser, FastaSequence, create_fasta_parser
from genomeworks_tpu.mapper import (
    MapperParams,
    build_index,
    generate_anchors,
    map_reads,
    overlaps_to_paf,
)
from genomeworks_tpu.simulators.genomesim import generate_random_genome


def _parser(seqs):
    return FastaParser([FastaSequence(f"read_{i}", s) for i, s in enumerate(seqs)])


def test_index_build_catcaag_aagcta():
    # fixture from reference cudamapper/data/catcaag_aagcta.fasta, k=3 w=2
    p = create_fasta_parser("/root/reference/cudamapper/data/catcaag_aagcta.fasta")
    idx = build_index(p, 0, 2, kmer_size=3, window_size=2, hash_representations=False,
                      filtering_parameter=1.0)
    # minimizers (from reference unit test): (032,0,R,0) (031,1,F,0)
    # (100,3,F,0) (002,4,F,0) (002,0,F,1) (021,2,R,1) (130,3,F,1)
    # sorted by (rep, read, pos):
    np.testing.assert_array_equal(
        idx.representations, [0b000010, 0b000010, 0b001001, 0b001101, 0b001110, 0b010000, 0b011100]
    )
    np.testing.assert_array_equal(idx.read_ids, [0, 1, 1, 0, 0, 0, 1])
    np.testing.assert_array_equal(idx.positions_in_reads, [4, 0, 2, 1, 0, 3, 3])
    np.testing.assert_array_equal(idx.directions_of_reads, [0, 0, 1, 0, 1, 0, 0])
    np.testing.assert_array_equal(
        idx.unique_representations, [0b000010, 0b001001, 0b001101, 0b001110, 0b010000, 0b011100]
    )
    np.testing.assert_array_equal(
        idx.first_occurrence_of_representations, [0, 2, 3, 4, 5, 6, 7]
    )


def test_anchors_catcaag_vs_aagcta():
    # query CATCAAG vs target AAGCTA with k=3 w=2: shared representation
    # AAG (002) at query pos 4 and target pos 0 -> one anchor
    q = create_fasta_parser("/root/reference/cudamapper/data/catcaag.fasta")
    t = create_fasta_parser("/root/reference/cudamapper/data/aagcta.fasta")
    qi = build_index(q, 0, 1, kmer_size=3, window_size=2, hash_representations=False)
    ti = build_index(t, 0, 1, kmer_size=3, window_size=2, hash_representations=False)
    anchors = generate_anchors(qi, ti)
    assert len(anchors) == 1
    assert anchors.query_positions[0] == 4
    assert anchors.target_positions[0] == 0


def test_map_reads_synthetic_overlap():
    rng = np.random.default_rng(11)
    genome = generate_random_genome(8000, rng)
    # two reads overlapping by 3000 bases
    r0 = genome[:5000]
    r1 = genome[2000:8000]
    parser = _parser([r0, r1])
    overlaps = map_reads(parser, parser, MapperParams(), all_to_all=True)
    assert len(overlaps) >= 1
    o = max(overlaps, key=lambda o: o.num_residues)
    pair = {o.query_read_id, o.target_read_id}
    assert pair == {0, 1}
    assert o.relative_strand == "+"
    # the overlap spans roughly [2000,5000) on r0 and [0,3000) on r1
    if o.query_read_id == 0:
        assert abs(o.query_start_position_in_read - 2000) < 200
        assert o.target_start_position_in_read < 200
    span = o.query_end_position_in_read - o.query_start_position_in_read
    assert span > 2500


def test_map_reads_reverse_strand():
    rng = np.random.default_rng(13)
    genome = generate_random_genome(6000, rng)
    r0 = genome[:4000]
    r1 = reverse_complement(genome[1500:6000])
    parser = _parser([r0, r1])
    overlaps = map_reads(parser, parser, MapperParams(), all_to_all=True)
    assert len(overlaps) >= 1
    o = max(overlaps, key=lambda o: o.num_residues)
    assert o.relative_strand == "-"


def test_map_reads_paf_output():
    rng = np.random.default_rng(17)
    genome = generate_random_genome(6000, rng)
    parser = _parser([genome[:4000], genome[1000:5000]])
    overlaps = map_reads(parser, parser, MapperParams(), all_to_all=True)
    lines = list(overlaps_to_paf(overlaps, parser, parser, 15))
    assert len(lines) == len(overlaps)
    cols = lines[0].split("\t")
    assert cols[0].startswith("read_")
    assert cols[11] == "255"
    assert int(cols[9]) == overlaps[0].num_residues * 15


def test_covid_reads_all_to_all():
    parser = create_fasta_parser(
        "/root/reference/cudamapper/data/covid-reads.fasta.gz", min_sequence_length=24
    )
    # only first 200 reads to keep the test fast
    parser = FastaParser(parser.sequences()[:200])
    overlaps = map_reads(parser, parser, MapperParams(min_overlap_len=100), all_to_all=True)
    # covid reads are dense 200-500bp fragments of a 30kb genome: expect many overlaps
    assert len(overlaps) > 50
    # sanity: every overlap internally consistent
    for o in overlaps:
        assert o.query_end_position_in_read > o.query_start_position_in_read
        assert o.target_end_position_in_read > o.target_start_position_in_read
        assert o.query_read_id != o.target_read_id


def test_device_anchors_match_host():
    import numpy as np

    from genomeworks_tpu.io import create_fasta_parser
    from genomeworks_tpu.mapper.index import build_index
    from genomeworks_tpu.mapper.matcher import generate_anchors, generate_anchors_device

    parser = create_fasta_parser(
        "/root/reference/cudamapper/data/covid-reads.fasta.gz",
        min_sequence_length=24,
    )
    idx = build_index(parser, 0, 50, kmer_size=15, window_size=10,
                      filtering_parameter=1.0)
    host = generate_anchors(idx, idx)
    dev = generate_anchors_device(idx, idx)
    assert len(host) > 0
    for f in ("query_read_ids", "target_read_ids", "query_positions", "target_positions"):
        np.testing.assert_array_equal(getattr(host, f), getattr(dev, f))
