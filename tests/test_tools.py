"""pygenomeworks-layer tests: read simulators + overlap truth (fixtures
ported from pygenomeworks/test/test_read_simulators.py and
test_overlap_generator.py), evaluate_paf, genome_simulator CLI, the
alignment visualizer, and gfa2fa."""

import random

import pytest

from genomeworks_tpu.simulators import (
    HIGH_GC_HOMOPOLYMERIC_TRANSITIONS,
    MarkovGenomeSimulator,
    NoisyReadSimulator,
    generate_overlaps,
)
from genomeworks_tpu.io.paf import PafRecord, read_paf, write_paf
from genomeworks_tpu.tools.evaluate_paf import (
    calculate_reciprocal_overlap,
    evaluate_paf,
    match_overlaps,
)
from genomeworks_tpu.tools.alignment_visualizer import (
    expand_cigar,
    render_ascii,
)
from genomeworks_tpu.utils.utilities import gfa2fa


# --- readsim (reference test fixtures) -------------------------------------

OVERLAP_CASES = [
    ((("read_0", "AACGTCA", 100, 900), ("read_1", "AACGTCA", 100, 900)), 1),
    ((("read_0", "AACGTCA", 100, 900), ("read_1", "AACGTCA", 1000, 9000)), 0),
    ((("read_1", "AACGTCA", 100, 900), ("read_0", "AACGTCA", 100, 900)), 1),
    (
        (
            ("read_1", "AACGTCA", 100, 900),
            ("read_2", "AACGTCA", 100, 900),
            ("read_3", "AACGTCA", 100, 900),
        ),
        3,
    ),
]


@pytest.mark.parametrize("reads,expected", OVERLAP_CASES)
def test_generate_overlaps_counts(reads, expected):
    assert len(generate_overlaps(list(reads))) == expected


def test_noisy_read_simulator_shapes():
    random.seed(0)
    ref = MarkovGenomeSimulator(seed=1).build_reference(
        2000, HIGH_GC_HOMOPOLYMERIC_TRANSITIONS
    )
    sim = NoisyReadSimulator()
    read, start, end = sim.generate_read(ref, 100)
    assert 0 <= start < end <= len(ref)
    assert set(read) <= set("ACGT")
    # errors applied: read differs from the reference slice but has similar size
    assert abs(len(read) - (end - start)) < 40


def test_noisy_read_zero_error_roundtrip():
    random.seed(0)
    ref = "ACGT" * 200
    sim = NoisyReadSimulator()
    read, start, end = sim.generate_read(
        ref, 100, snv_error_rate=0, insertion_error_rate=0, deletion_error_rate=0,
        homopolymer_clip_rate=0,
    )
    assert read == ref[start:end]


# --- evaluate_paf ------------------------------------------------------------


def _rec(qname="q", tname="t", qs=0, qe=100, ts=0, te=100, strand="+"):
    return PafRecord(qname, 1000, qs, qe, strand, tname, 1000, ts, te, 10, 100, 255)


def test_match_overlaps_slop_and_reciprocal():
    a = _rec()
    assert match_overlaps(a, _rec(qs=10, qe=105, ts=5, te=95), 20, 0.9)
    assert not match_overlaps(a, _rec(qs=500, qe=900, ts=500, te=900), 20, 0.9)
    # reference formula (evaluate_paf:38-45) is asymmetric: query term is
    # the start spread, target term the union span — identical records
    # score 2.0, comfortably above any min_reciprocal threshold
    assert calculate_reciprocal_overlap(a, a) == 2.0


def test_evaluate_paf_end_to_end(tmp_path):
    truth = [_rec(), _rec(qname="q2", ts=200, te=300, qs=200, qe=300)]
    test = [
        _rec(qs=5, qe=95, ts=5, te=95),  # TP
        _rec(qname="q3", tname="t3"),  # FP
        # reversed orientation of truth[1] -> still a TP
        _rec(qname="t", tname="q2", qs=200, qe=300, ts=200, te=300),
    ]
    write_paf(truth, tmp_path / "truth.paf")
    write_paf(test, tmp_path / "test.paf")
    tp, fp, fn, num_true = evaluate_paf(
        str(tmp_path / "truth.paf"), str(tmp_path / "test.paf"), 20, 0.9
    )
    assert (tp, fp, fn, num_true) == (2, 1, 0, 2)


def test_evaluate_paf_cli(tmp_path, capsys):
    from genomeworks_tpu.tools.evaluate_paf import main

    write_paf([_rec()], tmp_path / "truth.paf")
    write_paf([_rec()], tmp_path / "test.paf")
    assert main(["-T", str(tmp_path / "truth.paf"), "-i", str(tmp_path / "test.paf")]) == 0
    out = capsys.readouterr().out
    assert "Precision: 1.0000" in out and "Recall: 1.0000" in out


# --- genome_simulator CLI + full loop ---------------------------------------


def test_genome_simulator_cli_and_mapper_recall(tmp_path, capsys):
    from genomeworks_tpu.tools.genome_simulator import main

    ref = tmp_path / "ref.fasta"
    reads = tmp_path / "reads.fasta"
    paf = tmp_path / "truth.paf"
    assert (
        main(
            [
                "--reference-length", "3000",
                "--median-read-length", "700",
                "--num-reads", "12",
                "--reference-filepath", str(ref),
                "--reads-filepath", str(reads),
                "--paf-filepath", str(paf),
                "--random-seed", "7",
            ]
        )
        == 0
    )
    capsys.readouterr()
    assert ref.exists() and reads.exists() and paf.exists()
    truth = read_paf(paf)
    assert len(truth) > 0


def test_expand_cigar_and_ascii_render():
    assert expand_cigar("3M1I2D") == ["M", "M", "M", "I", "D", "D"]
    art = render_ascii("ACG", "ACG", ["3M"])
    assert "*" in art and art.count("\n") == 4


def test_gfa2fa(tmp_path):
    gfa = tmp_path / "g.gfa"
    gfa.write_text("H\tVN:Z:1.0\nS\t0\tACGTACGT\nL\t0\t+\t1\t+\t*\nS\t1\tTTTT\n")
    fa = tmp_path / "g.fa"
    gfa2fa(str(gfa), str(fa))
    assert fa.read_text() == ">0\nACGTACGT\n>1\nTTTT\n"
