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
