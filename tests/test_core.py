import numpy as np
import os

from genomeworks_tpu.core import (
    encode_bases,
    decode_bases,
    reverse_complement,
    pad_to_multiple,
    bucket_by_length,
)
from genomeworks_tpu.core.sequence import pack_reads
from genomeworks_tpu.io import create_fasta_parser, read_paf, write_paf, PafRecord
from genomeworks_tpu.io.paf import overlap_to_paf_line


def test_encode_decode_roundtrip():
    s = "ACGTACGTTTGGCCAA"
    assert decode_bases(encode_bases(s)) == s
    np.testing.assert_array_equal(encode_bases("ACGT"), [0, 1, 2, 3])


def test_reverse_complement():
    # reference genomeutils.hpp:144 semantics
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AACG") == "CGTT"
    assert reverse_complement("GATT") == "AATC"


def test_pack_reads():
    mat, lens = pack_reads(["ACGT", "AA"])
    assert mat.shape == (2, 4)
    np.testing.assert_array_equal(lens, [4, 2])
    np.testing.assert_array_equal(mat[1], [0, 0, 0, 0])


def test_bucketing():
    buckets = bucket_by_length([100, 5000, 130, 4000], min_bucket=128)
    sizes = {b.padded_length: b.indices for b in buckets}
    assert sizes[128] == (0,)
    assert sizes[256] == (2,)
    assert sizes[4096] == (3,)
    assert sizes[8192] == (1,)
    assert pad_to_multiple(129, 128) == 256


def test_fasta_parser_reference_fixture():
    p = create_fasta_parser("/root/reference/cudamapper/data/catcaag_aagcta.fasta")
    assert len(p) == 2
    assert p.get_sequence_by_id(0).seq == "CATCAAG"
    assert p.get_sequence_by_id(1).seq == "AAGCTA"
    assert p.get_sequence_by_id(0).name == "read_0"


def test_fasta_parser_gzip_and_filter():
    p = create_fasta_parser("/root/reference/cudamapper/data/covid-reads.fasta.gz")
    assert len(p) == 3000
    p_filtered = create_fasta_parser(
        "/root/reference/cudamapper/data/covid-reads.fasta.gz", min_sequence_length=400
    )
    assert 0 < len(p_filtered) < 3000
    assert all(len(s.seq) >= 400 for s in p_filtered.sequences())


def test_paf_roundtrip(tmp_path):
    line = overlap_to_paf_line("q", 100, 10, 90, "+", "t", 200, 20, 105, 12, 15)
    cols = line.split("\t")
    assert cols[9] == str(12 * 15)
    assert cols[10] == "85"  # max(span_q=80, span_t=85)
    assert cols[11] == "255"

    rec = PafRecord("q", 100, 10, 90, "+", "t", 200, 20, 105, 180, 85, 255, {"cg": "85M"})
    path = tmp_path / "x.paf"
    write_paf([rec], path)
    back = read_paf(path)
    assert back[0] == rec
