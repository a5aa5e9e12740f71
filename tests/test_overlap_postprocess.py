"""Host overlap post-processing tests: kmer utilities (fixtures ported from
the reference's Test_CudamapperUtilsKmerFunctions.cpp), filter_overlaps,
rescue_overlap_ends, and SAM output."""

import io

import pytest

from genomeworks_tpu.core.sequence import reverse_complement
from genomeworks_tpu.mapper.kmers import (
    count_shared_elements,
    sequence_jaccard_similarity,
    split_into_kmers,
)
from genomeworks_tpu.mapper.overlapper import (
    Overlap,
    extend_overlap_by_sequence_similarity,
    filter_overlaps,
    rescue_overlap_ends,
)
from genomeworks_tpu.io.sam import write_sam


def _ov(**kw):
    base = dict(
        query_read_id=0,
        target_read_id=0,
        query_start_position_in_read=100,
        query_end_position_in_read=200,
        target_start_position_in_read=100,
        target_end_position_in_read=200,
        relative_strand="+",
        num_residues=30,
    )
    base.update(kw)
    return Overlap(**base)


# --- kmer utils (Test_CudamapperUtilsKmerFunctions.cpp fixtures) -----------


def test_split_into_kmers_fixture():
    kmers = split_into_kmers("AAACCTTCTCT", 4, 1)
    assert len(kmers) == 8
    assert kmers[0] == "AAAC"
    assert kmers[7] == "CTCT"


def test_split_into_kmers_empty():
    assert split_into_kmers("", 4, 1) == [""]


def test_count_shared_elements_fixtures():
    assert count_shared_elements([1, 2, 5, 10, 1000, 10000], [1, 3, 5, 10, 20000]) == 3
    a = sorted(["A", "AA", "BET", "CAT"])
    b = sorted(["A", "B", "BEST", "BET", "cat", "CAT", "CHAT"])
    assert count_shared_elements(a, b) == 3
    assert count_shared_elements([], []) == 0
    assert count_shared_elements([], [1]) == 0


def test_jaccard_similarity_fixtures():
    assert sequence_jaccard_similarity("AAACCTATGAGGG", "AAACCTATGAGGG", 4, 1) == 1.0
    assert sequence_jaccard_similarity("AAACCTATGAGGG", "CCCAATTTAAATT", 4, 1) == 0.0
    sim = sequence_jaccard_similarity("AAACCTATGAGGG", "AAACCTAAGAGGG", 4, 1)
    assert 0.0 < sim < 1.0


# --- filter_overlaps --------------------------------------------------------


def test_filter_overlaps_thresholds():
    keep = _ov(num_residues=20, query_end_position_in_read=200)
    few_residues = _ov(num_residues=19)
    short = _ov(query_end_position_in_read=140, num_residues=25)
    assert filter_overlaps([keep, few_residues, short]) == [keep]


# --- rescue -----------------------------------------------------------------


class _FakeSeq:
    def __init__(self, name, seq):
        self.name = name
        self.seq = seq


class _FakeParser:
    def __init__(self, seqs):
        self._seqs = [_FakeSeq(f"read_{i}", s) for i, s in enumerate(seqs)]

    def get_sequence_by_id(self, i):
        return self._seqs[i]


def test_extend_overlap_identical_flanks():
    seq = "ACGTACGTACGTACGTACGTACGTACGTACGT"  # 32 bp
    o = _ov(
        query_start_position_in_read=8,
        query_end_position_in_read=24,
        target_start_position_in_read=8,
        target_end_position_in_read=24,
    )
    ext = extend_overlap_by_sequence_similarity(o, seq, seq, 8, 0.9)
    assert ext.query_start_position_in_read == 0
    assert ext.query_end_position_in_read == 32
    assert ext.target_start_position_in_read == 0
    assert ext.target_end_position_in_read == 32


def test_extend_overlap_dissimilar_flanks_untouched():
    q = "A" * 16 + "ACGTACGTACGTACGT" + "A" * 16
    t = "C" * 16 + "ACGTACGTACGTACGT" + "G" * 16
    o = _ov(
        query_start_position_in_read=16,
        query_end_position_in_read=32,
        target_start_position_in_read=16,
        target_end_position_in_read=32,
    )
    ext = extend_overlap_by_sequence_similarity(o, q, t, 16, 0.9)
    assert (
        ext.query_start_position_in_read,
        ext.query_end_position_in_read,
        ext.target_start_position_in_read,
        ext.target_end_position_in_read,
    ) == (16, 32, 16, 32)


def test_rescue_forward_and_reverse():
    core = "ACGGTCAGCTTAGCGGTACCAGTT" * 2
    flank = "TTGACCAGTCAGGATT"
    q = flank + core + flank
    # forward target identical
    parser_q = _FakeParser([q])
    parser_t = _FakeParser([q])
    o = _ov(
        query_start_position_in_read=16,
        query_end_position_in_read=16 + len(core),
        target_start_position_in_read=16,
        target_end_position_in_read=16 + len(core),
        num_residues=5,
    )
    (resc,) = rescue_overlap_ends([o], parser_q, parser_t, 16, 0.9)
    assert resc.query_start_position_in_read == 0
    assert resc.query_end_position_in_read == len(q)

    # reverse strand: target is the reverse complement of the query
    t_rc = reverse_complement(q)
    parser_t2 = _FakeParser([t_rc])
    o2 = _ov(
        query_start_position_in_read=16,
        query_end_position_in_read=16 + len(core),
        target_start_position_in_read=16,
        target_end_position_in_read=16 + len(core),
        relative_strand="-",
        num_residues=5,
    )
    (resc2,) = rescue_overlap_ends([o2], parser_q, parser_t2, 16, 0.9)
    assert resc2.relative_strand == "-"
    assert resc2.query_start_position_in_read == 0
    assert resc2.query_end_position_in_read == len(q)
    assert resc2.target_start_position_in_read == 0
    assert resc2.target_end_position_in_read == len(q)


# --- SAM --------------------------------------------------------------------


def test_write_sam():
    parser_q = _FakeParser(["ACGTACGT"])
    parser_t = _FakeParser(["TTTTACGTACGTTTTT"])
    o = _ov(
        query_start_position_in_read=0,
        query_end_position_in_read=8,
        target_start_position_in_read=4,
        target_end_position_in_read=12,
    )
    o_rev = _ov(
        relative_strand="-",
        query_start_position_in_read=0,
        query_end_position_in_read=8,
        target_start_position_in_read=4,
        target_end_position_in_read=12,
    )
    buf = io.StringIO()
    write_sam([o, o_rev], ["8M", None], parser_q, parser_t, buf, command_line="gw-mapper x y")
    lines = buf.getvalue().strip().splitlines()
    assert lines[0].startswith("@HD")
    assert lines[1] == "@SQ\tSN:read_0\tLN:16"
    assert lines[2].startswith("@PG\tID:gw-mapper") and "CL:gw-mapper x y" in lines[2]
    f = lines[3].split("\t")
    assert f[:6] == ["read_0", "0", "read_0", "5", "255", "8M"]
    assert f[9] == "ACGTACGT"
    r = lines[4].split("\t")
    assert r[1] == "16" and r[5] == "*"


# --- BAM --------------------------------------------------------------------


def test_write_bam_roundtrip():
    """BGZF/BAM writer (io/bam.py, reference utils.cpp:190-316 BAM mode):
    decompress with plain gzip and re-parse every record."""
    import gzip
    import struct

    from genomeworks_tpu.io.bam import write_bam

    parser_q = _FakeParser(["ACGTACGT"])
    parser_t = _FakeParser(["TTTTACGTACGTTTTT"])
    o = _ov(
        query_start_position_in_read=0,
        query_end_position_in_read=8,
        target_start_position_in_read=4,
        target_end_position_in_read=12,
    )
    o_rev = _ov(
        relative_strand="-",
        query_start_position_in_read=0,
        query_end_position_in_read=8,
        target_start_position_in_read=4,
        target_end_position_in_read=12,
    )
    buf = io.BytesIO()
    write_bam([o, o_rev], ["8M", None], parser_q, parser_t, buf,
              command_line="gw-mapper x y")
    raw = buf.getvalue()
    # BGZF: gzip magic + FEXTRA, BC subfield, fixed EOF block
    assert raw[:4] == b"\x1f\x8b\x08\x04"
    assert raw.endswith(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"))
    data = gzip.decompress(raw)

    assert data[:4] == b"BAM\x01"
    (l_text,) = struct.unpack_from("<i", data, 4)
    text = data[8 : 8 + l_text].decode()
    assert "@SQ\tSN:read_0\tLN:16" in text and "CL:gw-mapper x y" in text
    off = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    assert n_ref == 1
    (l_name,) = struct.unpack_from("<i", data, off)
    off += 4
    assert data[off : off + l_name] == b"read_0\x00"
    off += l_name
    (l_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    assert l_ref == 16

    recs = []
    while off < len(data):
        (block_size,) = struct.unpack_from("<i", data, off)
        off += 4
        body = data[off : off + block_size]
        off += block_size
        (ref_id, pos, l_rn, mapq, _bin, n_cig, flag, l_seq,
         nref, npos, tlen) = struct.unpack_from("<iiBBHHHiiii", body, 0)
        p = 32
        name = body[p : p + l_rn - 1].decode()
        p += l_rn
        cig = [struct.unpack_from("<I", body, p + 4 * i)[0]
               for i in range(n_cig)]
        p += 4 * n_cig
        seq_nib = body[p : p + (l_seq + 1) // 2]
        p += (l_seq + 1) // 2
        qual = body[p : p + l_seq]
        recs.append((ref_id, pos, mapq, cig, flag, l_seq, name, seq_nib,
                     qual, nref, npos, tlen))
    assert len(recs) == 2

    r0 = recs[0]
    assert r0[:3] == (0, 4, 255)  # refID, POS (0-based target start), MAPQ
    assert r0[3] == [(8 << 4) | 0]  # 8M
    assert r0[4] == 0 and r0[5] == 8 and r0[6] == "read_0"
    # ACGTACGT -> nibbles 1,2,4,8 repeated
    assert r0[7] == bytes([0x12, 0x48, 0x12, 0x48])
    assert r0[8] == b"\xff" * 8
    assert r0[9:] == (-1, -1, 0)

    r1 = recs[1]
    assert r1[4] == 16 and r1[3] == []  # '-' strand flag, no CIGAR

    # reference_quirks: FLAG always 0, POS = query start (utils.cpp:283-288)
    buf2 = io.BytesIO()
    write_bam([o_rev], None, parser_q, parser_t, buf2, reference_quirks=True)
    d2 = gzip.decompress(buf2.getvalue())
    (lt2,) = struct.unpack_from("<i", d2, 4)
    off2 = 8 + lt2
    (nr2,) = struct.unpack_from("<i", d2, off2)
    off2 += 4
    for _ in range(nr2):
        (ln2,) = struct.unpack_from("<i", d2, off2)
        off2 += 4 + ln2 + 4
    off2 += 4  # block_size
    ref_id2, pos2, _, _, _, _, flag2 = struct.unpack_from(
        "<iiBBHHH", d2, off2)
    assert (pos2, flag2) == (0, 0)
