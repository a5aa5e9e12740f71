"""Myers bit-vector edit distance tests — mirrors the reference's
Test_MyersAlgorithm.cu strategy: compare against the NW edit-distance
oracle on randomized cases (cudaaligner_test_cases.cpp:29-97), plus
boundary cases where global and semi-global variants differ."""

import numpy as np
import pytest

from genomeworks_tpu.aligner.cpu_reference import edit_distance_cpu
from genomeworks_tpu.aligner.myers import (
    myers_edit_distance_batched,
    myers_edit_distance_cpu,
)
from genomeworks_tpu.simulators.genomesim import generate_random_genome, mutate_sequence


def _random_cases(n, seed=7):
    rng = np.random.default_rng(seed)
    cases = []
    for i in range(n):
        q = generate_random_genome(int(rng.integers(1, 200)), rng)
        if i % 2:
            t = mutate_sequence(q, rng, 0.1, 0.1)
        else:
            t = generate_random_genome(int(rng.integers(1, 200)), rng)
        cases.append((q, t))
    return cases


def test_myers_cpu_matches_nw_oracle():
    for q, t in _random_cases(25):
        assert myers_edit_distance_cpu(t, q) == edit_distance_cpu(q, t)


def test_myers_global_boundary_cases():
    # these distinguish global from the matching (semi-global) variant
    assert myers_edit_distance_cpu("AA", "A") == 1
    assert myers_edit_distance_cpu("TACGT", "ACGT") == 1
    assert myers_edit_distance_cpu("ACGT", "ACGT") == 0
    assert myers_edit_distance_cpu("TTTT", "AAAA") == 4


def test_myers_multi_word():
    rng = np.random.default_rng(3)
    q = generate_random_genome(300, rng)
    t = mutate_sequence(q, rng, 0.05, 0.05)
    assert myers_edit_distance_cpu(t, q) == edit_distance_cpu(q, t)


def test_myers_batched_matches_oracle():
    cases = _random_cases(20, seed=11)
    qs = [q for q, _ in cases] + ["A", "ACGT"]
    ts = [t for _, t in cases] + ["AA", "TACGT"]
    want = [edit_distance_cpu(q, t) for q, t in zip(qs, ts)]
    got = list(myers_edit_distance_batched(qs, ts))
    assert got == want


def test_myers_batched_multi_word_mixed_lengths():
    rng = np.random.default_rng(5)
    qs, ts = [], []
    for _ in range(6):
        q = generate_random_genome(int(rng.integers(30, 400)), rng)
        qs.append(q)
        ts.append(mutate_sequence(q, rng, 0.08, 0.08))
    want = [edit_distance_cpu(q, t) for q, t in zip(qs, ts)]
    assert list(myers_edit_distance_batched(qs, ts)) == want


def test_myers_full_engine_matches_oracles():
    """Aligner(engine="myers_full") — the reference's full-matrix Myers
    path for short pairs (myers_gpu.cu:317-443): band spans the whole
    matrix from the start, exact with no retry, parity vs the CPU Myers
    oracle and the batched full-matrix scan."""
    import numpy as np

    from genomeworks_tpu.aligner import create_aligner
    from genomeworks_tpu.aligner.myers import (
        myers_edit_distance_batched,
        myers_edit_distance_cpu,
    )

    rng = np.random.default_rng(9)
    bases = "ACGT"
    pairs = []
    for _ in range(12):
        n = int(rng.integers(20, 200))
        q = "".join(rng.choice(list(bases), n))
        t = list(q)
        for _ in range(int(rng.integers(1, 12))):
            i = int(rng.integers(0, len(t)))
            r = rng.random()
            if r < 0.4:
                t[i] = bases[int(rng.integers(4))]
            elif r < 0.7 and len(t) > 5:
                del t[i]
            else:
                t.insert(i, bases[int(rng.integers(4))])
        pairs.append((q, "".join(t)))

    a = create_aligner(engine="myers_full")
    for q, t in pairs:
        assert a.add_alignment(q, t) == 0
    a.align_all()
    alns = a.get_alignments()
    assert len(alns) == len(pairs)
    dists = myers_edit_distance_batched(
        [p[0] for p in pairs], [p[1] for p in pairs]
    )
    for (q, t), aln, d_batched in zip(pairs, alns, dists):
        assert aln.is_optimal
        d_oracle = myers_edit_distance_cpu(t, q)
        assert aln.get_edit_distance() == d_oracle == int(d_batched)
