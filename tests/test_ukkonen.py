"""Ukkonen banded aligner tests — mirrors the reference's strategy of
checking GPU/banded outputs against the NW oracle on random cases
(Test_NeedlemanWunschImplementation.cpp, cudaaligner_test_cases.cpp)."""

import numpy as np

from genomeworks_tpu.aligner.cpu_reference import edit_distance_cpu
from genomeworks_tpu.aligner.ukkonen import ukkonen_cpu, ukkonen_edit_distance_cpu
from genomeworks_tpu.simulators.genomesim import generate_random_genome, mutate_sequence


def test_ukkonen_matches_nw_oracle():
    rng = np.random.default_rng(8)
    for i in range(20):
        q = generate_random_genome(int(rng.integers(5, 150)), rng)
        t = (
            mutate_sequence(q, rng, 0.08, 0.08)
            if i % 2
            else generate_random_genome(int(rng.integers(5, 150)), rng)
        )
        d = edit_distance_cpu(q, t)
        assert ukkonen_edit_distance_cpu(q, t, p=max(16, d)) == d


def test_ukkonen_path_consumes_both_sequences():
    st = ukkonen_cpu("ACGTACGT", "ACGAACG", 8)
    assert int(np.count_nonzero(st != 2)) == 8  # query consumed
    assert int(np.count_nonzero(st != 3)) == 7  # target consumed


def test_ukkonen_empty_edges():
    assert list(ukkonen_cpu("", "ACG")) == [2, 2, 2]
    assert list(ukkonen_cpu("ACG", "")) == [3, 3, 3]


def test_ukkonen_narrow_band_is_band_limited():
    # with a tiny band the result may exceed the true distance but is
    # still a valid alignment path
    q = "A" * 30 + "C" * 30
    t = "A" * 30 + "G" * 10 + "C" * 30
    st = ukkonen_cpu(q, t, p=2)
    assert int(np.count_nonzero(st != 2)) == len(q)
    assert int(np.count_nonzero(st != 3)) == len(t)


def test_ukkonen_engine_device_path():
    """engine="ukkonen" — the reference's Ukkonen band policy driving the
    device banded DP (aligner_global_ukkonen.cpp band sizing; no retry).
    When the optimal distance fits the radius p, results are exact: edit
    distance matches the NW oracle and ukkonen_cpu."""
    from genomeworks_tpu.aligner.aligner import Aligner

    rng = np.random.default_rng(11)
    cases = []
    for i in range(12):
        q = generate_random_genome(int(rng.integers(10, 200)), rng)
        t = mutate_sequence(q, rng, 0.05, 0.05)
        cases.append((q, t))
    al = Aligner(engine="ukkonen", ukkonen_p=32)
    for q, t in cases:
        al.add_alignment(q, t)
    al.align_all()
    alns = al.get_alignments()
    assert len(alns) == len(cases)
    for (q, t), aln in zip(cases, alns):
        d = edit_distance_cpu(q, t)
        assert d <= 32  # p covers the optimal path for these cases
        assert aln.is_optimal
        st = np.asarray(aln.states)
        assert int(np.count_nonzero(st != 0)) == d
        assert int(np.count_nonzero(st != 2)) == len(q)
        assert int(np.count_nonzero(st != 3)) == len(t)
        assert ukkonen_edit_distance_cpu(q, t, p=32) == d


def test_ukkonen_engine_no_retry_band_limited():
    """A fixed tiny radius never grows the band (reference ukkonen has no
    widen-and-retry); band-limited results are flagged non-optimal."""
    from genomeworks_tpu.aligner.aligner import Aligner

    # equal lengths (band stays at the pow2 of 2p+1) but the optimal path
    # needs diagonals out to +-100: the fixed band cannot contain it
    q = "A" * 100 + "C" * 100
    t = "C" * 100 + "A" * 100
    al = Aligner(engine="ukkonen", ukkonen_p=4)
    al.add_alignment(q, t)
    al.align_all()
    (aln,) = al.get_alignments()
    st = np.asarray(aln.states)
    assert int(np.count_nonzero(st != 2)) == len(q)
    assert int(np.count_nonzero(st != 3)) == len(t)
    assert not aln.is_optimal


def test_ukkonen_engine_rejects_oversized_length_difference():
    """The reference rejects |len(q) - len(t)| > 0.1 * max_target_length at
    add time (aligner_global_ukkonen.cpp:30,53-58) instead of sizing a huge
    band; without max_target_length the band clamps to max_bandwidth."""
    from genomeworks_tpu.aligner.aligner import Aligner
    from genomeworks_tpu.aligner.types import StatusType

    al = Aligner(engine="ukkonen", max_target_length=1000, ukkonen_p=4)
    st = al.add_alignment("A" * 500, "A" * 1000)  # diff 500 > 100
    assert st == StatusType.exceeded_max_alignment_difference
    assert al.add_alignment("A" * 950, "A" * 1000) == StatusType.success

    # no max_target_length: accepted, but the band is clamped to
    # max_bandwidth (not next_pow2(diff + 2p + 1))
    al2 = Aligner(engine="ukkonen", max_bandwidth=64, ukkonen_p=4)
    assert al2.add_alignment("A" * 10, "A" * 500) == StatusType.success
    assert al2._initial_band(al2._entries[0]) <= 64
    al2.align_all()
    (aln,) = al2.get_alignments()
    assert not aln.is_optimal
