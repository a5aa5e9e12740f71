"""Aligner tests: TPU banded kernel vs the CPU oracle, mirroring the
reference's test strategy (cudaaligner/tests/Test_MyersAlgorithm.cu,
Test_AlignerGlobal.cpp:240 parametrized CIGAR checks,
cudaaligner_test_cases.cpp random-genome cases)."""

import numpy as np
import pytest

from genomeworks_tpu.aligner import (
    Alignment,
    AlignmentState,
    CigarFormat,
    Aligner,
    create_aligner,
    align_cpu,
    edit_distance_cpu,
    states_to_cigar,
)
from genomeworks_tpu.simulators.genomesim import generate_random_genome, mutate_sequence


# -- CPU oracle sanity (mirrors Test_AlignerGlobal.cpp fixed cases) ----------

CASES = [
    ("AAAA", "TTAT", "4M"),
    ("ATAAAAAAAA", "AAAAAAAAA", "1M1D8M"),  # derived below from oracle rules
]


def test_cpu_oracle_identity():
    states = align_cpu("ACGT", "ACGT")
    assert list(states) == [AlignmentState.match] * 4
    assert states_to_cigar(states) == "4M"
    assert states_to_cigar(states, CigarFormat.extended) == "4="


def test_cpu_oracle_substitution():
    states = align_cpu("AAAA", "ATAA")
    assert states_to_cigar(states) == "4M"
    assert states_to_cigar(states, CigarFormat.extended) == "1=1X2="
    assert edit_distance_cpu("AAAA", "ATAA") == 1


def test_cpu_oracle_indel():
    assert edit_distance_cpu("AAA", "AAAA") == 1
    assert edit_distance_cpu("AAAAA", "AAAA") == 1
    states = align_cpu("", "AAA")
    assert states_to_cigar(states) == "3I"
    states = align_cpu("AAA", "")
    assert states_to_cigar(states) == "3D"


# -- TPU kernel vs oracle -----------------------------------------------------


def _aligner_cigars(pairs, **kwargs):
    a = create_aligner(**kwargs)
    for q, t in pairs:
        a.add_alignment(q, t)
    a.align_all()
    return a.get_alignments()


def test_banded_matches_oracle_small():
    pairs = [
        ("ACGT", "ACGT"),
        ("AAAA", "TTAT"),
        ("ACGTACGT", "ACGT"),
        ("ACGT", "ACGTACGT"),
        ("GATTACA", "GCATGCU".replace("U", "T")),
        ("A", "T"),
        ("AAAAAAAAAA", "AAAAAAAAA"),
    ]
    alns = _aligner_cigars(pairs)
    assert len(alns) == len(pairs)
    for (q, t), aln in zip(pairs, alns):
        oracle = align_cpu(q, t)
        assert aln.is_optimal
        np.testing.assert_array_equal(
            aln.states, oracle, err_msg=f"q={q} t={t}: {aln.convert_to_cigar()}"
        )


def test_banded_matches_oracle_random():
    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(24):
        n = int(rng.integers(10, 300))
        ref = generate_random_genome(n, rng)
        mut = mutate_sequence(ref, rng, snv_rate=0.05, indel_rate=0.04)
        pairs.append((ref, mut))
    alns = _aligner_cigars(pairs, max_bandwidth=512)
    for (q, t), aln in zip(pairs, alns):
        oracle = align_cpu(q, t)
        assert aln.get_edit_distance() == edit_distance_cpu(q, t)
        np.testing.assert_array_equal(aln.states, oracle, err_msg=f"q={q[:30]}...")


def test_band_retry_wide_indel():
    # large length difference: initial band cannot fit, retry must widen
    q = "A" * 200
    t = "A" * 40
    alns = _aligner_cigars([(q, t)], max_bandwidth=1024)
    assert alns[0].is_optimal
    assert alns[0].get_edit_distance() == 160


def test_reverse_complement_add():
    a = create_aligner()
    a.add_alignment("ACGTT", "AACGT", reverse_complement_query=True)
    a.align_all()
    aln = a.get_alignments()[0]
    assert aln.query == "AACGT"  # revcomp applied before alignment
    assert aln.get_edit_distance() == 0


def test_cigar_formats():
    states = np.array(
        [
            AlignmentState.match,
            AlignmentState.mismatch,
            AlignmentState.insertion,
            AlignmentState.deletion,
            AlignmentState.deletion,
        ],
        dtype=np.int8,
    )
    assert states_to_cigar(states, CigarFormat.basic) == "2M1I2D"
    assert states_to_cigar(states, CigarFormat.extended) == "1=1X1I2D"


def test_format_alignment():
    aln_list = _aligner_cigars([("GATT", "GAT")])
    q_row, pair, t_row = aln_list[0].format_alignment()
    assert len(q_row) == len(t_row) == len(pair)
    assert q_row.replace("-", "") == "GATT"
    assert t_row.replace("-", "") == "GAT"


def test_device_alignments_rle():
    from genomeworks_tpu.aligner import create_aligner
    import numpy as np

    aligner = create_aligner(max_bandwidth=128)
    aligner.add_alignment("AAAA", "AATA")   # 4M / 2=1X1=
    aligner.add_alignment("ACG", "ACGT")    # 3M1I
    aligner.align_all()
    dev = aligner.get_device_alignments()
    assert dev.num_alignments() == 2
    offs = np.asarray(dev.cigar_offsets)
    ops = np.asarray(dev.cigar_ops)
    runs = np.asarray(dev.cigar_runlengths)
    # alignment 0: states (=,=,X,=) -> 3 runs; alignment 1: (=,=,=,I) -> 2
    a0_ops = ops[offs[0]:offs[1]]
    a0_runs = runs[offs[0]:offs[1]]
    assert list(a0_ops) == [0, 1, 0] and list(a0_runs) == [2, 1, 1]
    a1_ops = ops[offs[1]:offs[2]]
    a1_runs = runs[offs[1]:offs[2]]
    assert list(a1_ops) == [0, 2] and list(a1_runs) == [3, 1]
    assert list(np.asarray(dev.metadata)) == [1, 1]
