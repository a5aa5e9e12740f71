"""POA tests: CPU reference semantics + batched JAX implementation
cross-parity (the reference's golden window data file is not bundled in
this checkout, so the oracle chain is numpy-ref <- reference CUDA semantics,
and jax <- numpy-ref bit-parity)."""

import numpy as np
import pytest

from genomeworks_tpu.poa import poa_consensus
from genomeworks_tpu.poa.cpu_reference import poa_msa
from genomeworks_tpu.poa.jax_poa import poa_batch_consensus, poa_batch_msa
from genomeworks_tpu.simulators.genomesim import generate_random_genome, mutate_sequence
from genomeworks_tpu.aligner import edit_distance_cpu


def test_identical_sequences():
    c, cov = poa_consensus(["ACGTACGTAA"] * 5)
    assert c == "ACGTACGTAA"
    np.testing.assert_array_equal(cov, [5] * 10)


def test_snp_majority():
    seqs = ["ACGTACGTAA", "ACGCACGTAA", "ACGTACGTAA", "ACGCACGTAA", "ACGTACGTAA"]
    c, _ = poa_consensus(seqs)
    assert c == "ACGTACGTAA"


def test_indel_majority():
    seqs = ["ACGTACGTAA", "ACGTCGTAA", "ACGTACGTAA"]
    c, _ = poa_consensus(seqs)
    assert c == "ACGTACGTAA"


def test_consensus_recovers_truth():
    rng = np.random.default_rng(5)
    truth = generate_random_genome(300, rng)
    reads = [mutate_sequence(truth, rng, snv_rate=0.05, indel_rate=0.05) for _ in range(8)]
    c, cov = poa_consensus(reads)
    assert edit_distance_cpu(c, truth) <= 3
    assert len(cov) == len(c)
    assert cov.max() <= 8


def test_jax_matches_numpy_reference():
    rng = np.random.default_rng(123)
    windows = []
    for _ in range(5):
        truth = generate_random_genome(int(rng.integers(30, 100)), rng)
        n = int(rng.integers(1, 8))
        windows.append([truth] + [mutate_sequence(truth, rng, 0.12, 0.1) for _ in range(n)])
    windows.append(["ACGT"])
    windows.append(["AAAA", "AAAA", "AAAA"])
    windows.append(["ACGTACGTAC", "TACG"])

    cons, cov, status = poa_batch_consensus(windows)
    for b, w in enumerate(windows):
        nc, ncov = poa_consensus(w)
        assert status[b] == 0
        assert cons[b] == nc, f"window {b}"
        np.testing.assert_array_equal(cov[b], ncov, err_msg=f"window {b}")


def test_msa_simple_snp():
    seqs = ["ACGTACGT", "ACGAACGT", "ACGTACGT"]
    msa = poa_msa(seqs)
    assert msa == ["ACGTACGT", "ACGAACGT", "ACGTACGT"]


def test_msa_insertion_makes_gap_columns():
    seqs = ["ACGTACGT", "ACGTTTACGT", "ACGTACGT"]
    msa = poa_msa(seqs)
    assert len({len(r) for r in msa}) == 1
    for s, row in zip(seqs, msa):
        assert row.replace("-", "") == s
    # the two short sequences must carry gaps where the insertion sits
    assert "-" in msa[0] and "-" in msa[2] and "-" not in msa[1]


def test_msa_roundtrip_property():
    rng = np.random.default_rng(21)
    truth = generate_random_genome(80, rng)
    seqs = [truth] + [mutate_sequence(truth, rng, 0.08, 0.08) for _ in range(9)]
    msa = poa_msa(seqs)
    assert len(msa) == len(seqs)
    assert len({len(r) for r in msa}) == 1
    for s, row in zip(seqs, msa):
        assert row.replace("-", "") == s


def test_jax_msa_matches_numpy_reference():
    rng = np.random.default_rng(77)
    windows = []
    for _ in range(4):
        truth = generate_random_genome(int(rng.integers(30, 90)), rng)
        n = int(rng.integers(1, 7))
        windows.append([truth] + [mutate_sequence(truth, rng, 0.1, 0.1) for _ in range(n)])
    windows.append(["ACGT", "ACGT"])
    msa_j, status = poa_batch_msa(windows)
    assert all(s == 0 for s in status)
    for b, w in enumerate(windows):
        assert msa_j[b] == poa_msa(w), f"window {b}"
        for s, row in zip(w, msa_j[b]):
            assert row.replace("-", "") == s


def test_pallas_kernel_matches_reference():
    """The per-window Pallas kernel must be bit-equal to the CPU reference
    (it is the TPU fast path of poa_batch_consensus)."""
    import jax

    interpret = jax.default_backend() == "cpu"
    from genomeworks_tpu.poa.jax_poa import _poa_batch_consensus_pallas

    rng = np.random.default_rng(42)
    windows = []
    for _ in range(6):
        truth = generate_random_genome(int(rng.integers(40, 120)), rng)
        n = int(rng.integers(1, 8))
        windows.append([truth] + [mutate_sequence(truth, rng, 0.08, 0.08) for _ in range(n)])
    windows.append(["ACGTACGT"])
    if interpret:
        windows = windows[:3]  # interpreter is slow
        from genomeworks_tpu.ops import poa_pallas as pp
        import functools as ft
        orig = pp.poa_consensus_pallas
        pp.poa_consensus_pallas = ft.partial(orig, interpret=True)
        try:
            cons, cov, st = _poa_batch_consensus_pallas(
                windows, -8, -6, 8, None, 50, 50, None)
        finally:
            pp.poa_consensus_pallas = orig
    else:
        cons, cov, st = _poa_batch_consensus_pallas(
            windows, -8, -6, 8, None, 50, 50, None)
    for b, w in enumerate(windows):
        rc, rv = poa_consensus(w)
        assert st[b] == 0
        assert cons[b] == rc, f"window {b}"
        np.testing.assert_array_equal(cov[b], rv)


def test_jax_window_batch_masking():
    # windows of very different sequence counts in one batch must not
    # interfere (lockstep masking)
    rng = np.random.default_rng(9)
    t1 = generate_random_genome(50, rng)
    t2 = generate_random_genome(40, rng)
    w1 = [t1] + [mutate_sequence(t1, rng, 0.1, 0.1) for _ in range(7)]
    w2 = [t2, mutate_sequence(t2, rng, 0.1, 0.1)]
    cons, cov, status = poa_batch_consensus([w1, w2])
    for b, w in enumerate((w1, w2)):
        nc, ncov = poa_consensus(w)
        assert cons[b] == nc
        np.testing.assert_array_equal(cov[b], ncov)
