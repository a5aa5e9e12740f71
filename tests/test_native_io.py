"""Native C++ IO layer tests (native/gwio.cpp via ctypes): parity with the
pure-Python parser on the reference fixtures, min-length filtering,
deterministic shuffle set-equality, and parallel 2-bit packing."""

import numpy as np
import pytest

from genomeworks_tpu.core.sequence import encode_bases
from genomeworks_tpu.io.fasta import create_fasta_parser
from genomeworks_tpu.io.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native gwio library not built"
)

FIXTURES = [
    "/root/reference/cudamapper/data/catcaag_aagcta.fasta",
    "/root/reference/cudamapper/data/20_reads.fasta",
    "/root/reference/cudamapper/data/covid-reads.fasta.gz",
    "/root/reference/cudaextender/data/sample.fa",
]


@pytest.mark.parametrize("path", FIXTURES)
def test_native_matches_python(path):
    pn = create_fasta_parser(path, use_native=True)
    pp = create_fasta_parser(path, use_native=False)
    assert len(pn) == len(pp)
    assert pn.get_max_sequence_length() == pp.get_max_sequence_length()
    for i in range(len(pn)):
        a, b = pn.get_sequence_by_id(i), pp.get_sequence_by_id(i)
        assert a.name == b.name
        assert a.seq == b.seq


def test_native_min_length_filter():
    path = "/root/reference/cudamapper/data/20_reads.fasta"
    pn = create_fasta_parser(path, min_sequence_length=4, use_native=True)
    pp = create_fasta_parser(path, min_sequence_length=4, use_native=False)
    assert len(pn) == len(pp)
    assert {r.seq for r in pn.sequences()} == {r.seq for r in pp.sequences()}


def test_native_shuffle_is_permutation():
    path = "/root/reference/cudamapper/data/20_reads.fasta"
    base = create_fasta_parser(path, use_native=True)
    shuf = create_fasta_parser(path, shuffle=True, use_native=True)
    assert len(base) == len(shuf)
    assert sorted(r.name for r in base.sequences()) == sorted(
        r.name for r in shuf.sequences()
    )
    # deterministic: same permutation on every parse (std::mt19937(0))
    shuf2 = create_fasta_parser(path, shuffle=True, use_native=True)
    assert [r.name for r in shuf.sequences()] == [r.name for r in shuf2.sequences()]


def test_native_pack_2bit():
    path = "/root/reference/cudamapper/data/covid-reads.fasta.gz"
    pn = create_fasta_parser(path, use_native=True)
    codes, lens = pn.pack_2bit(first=5, n=10)
    assert codes.shape == (10, pn.get_max_sequence_length())
    for i in range(10):
        rec = pn.get_sequence_by_id(5 + i)
        assert lens[i] == len(rec.seq)
        np.testing.assert_array_equal(codes[i, : lens[i]], encode_bases(rec.seq))
        assert not codes[i, lens[i]:].any()
