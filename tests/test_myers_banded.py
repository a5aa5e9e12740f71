"""Bit-parallel banded Myers: model vs oracle, kernel vs model, and the
Aligner running the myers engine end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from genomeworks_tpu.aligner import align_cpu
from genomeworks_tpu.aligner.banded_nw import band_offset
from genomeworks_tpu.aligner.myers_banded_model import myers_banded_codes
from genomeworks_tpu.core.sequence import encode_bases
from genomeworks_tpu.ops.banded_nw_pallas import traceback_host_packed
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)


def _random_batch(B, M, seed, lo=20, hi=None):
    rng = np.random.default_rng(seed)
    hi = hi or M - 16
    q = np.zeros((B, M), np.uint8)
    t = np.zeros((B, M), np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    qs_list, ts_list = [], []
    for b in range(B):
        m = int(rng.integers(lo, hi))
        qs = generate_random_genome(m, rng)
        ts = mutate_sequence(qs, rng, 0.12, 0.12)[:M]
        qc, tc = encode_bases(qs), encode_bases(ts)
        q[b, : len(qc)] = qc
        t[b, : len(tc)] = tc
        qlen[b], tlen[b] = len(qc), len(tc)
        qs_list.append(qs)
        ts_list.append(ts)
    return q, t, qlen, tlen, qs_list, ts_list


def test_model_paths_match_full_oracle():
    W = 128
    q, t, qlen, tlen, qs, ts = _random_batch(16, 256, seed=0)
    planes, fits = myers_banded_codes(q, t, qlen, tlen, W)
    dlo = np.asarray(band_offset(qlen, tlen, W))
    paths, edge = traceback_host_packed(np.asarray(planes), qlen, tlen, dlo, W)
    assert np.asarray(fits).all()
    for b in range(16):
        if edge[b]:
            continue
        oracle = np.asarray(align_cpu(qs[b], ts[b]), dtype=np.int8)
        np.testing.assert_array_equal(paths[b], oracle, err_msg=f"b={b}")


def test_windowed_model_matches_full_width():
    W = 128
    q, t, qlen, tlen, _, _ = _random_batch(8, 384, seed=3, hi=340)
    full, _ = myers_banded_codes(q, t, qlen, tlen, W)
    win, _ = myers_banded_codes(q, t, qlen, tlen, W, windowed=True)
    np.testing.assert_array_equal(full, win)


def _planes_equal_valid_rows(mp, kp, qlen):
    mp = mp.view(np.uint32)
    kp = kp.view(np.uint32)
    for b in range(mp.shape[0]):
        nrow = int(qlen[b])
        if nrow == 0:
            continue
        m16 = (nrow + 15) // 16
        if m16 > 1 and not (mp[b, : m16 - 1] == kp[b, : m16 - 1]).all():
            return False
        rr = nrow - 16 * (m16 - 1)
        mask = np.uint32((1 << (2 * rr)) - 1) if rr < 16 else np.uint32(0xFFFFFFFF)
        if not ((mp[b, m16 - 1] & mask) == (kp[b, m16 - 1] & mask)).all():
            return False
    return True


def test_kernel_matches_model():
    from genomeworks_tpu.ops.myers_banded_pallas import (
        myers_banded_forward_pallas,
    )

    W = 128
    q, t, qlen, tlen, _, _ = _random_batch(128, 128, seed=2, hi=112)
    mp, _ = myers_banded_codes(q, t, qlen, tlen, W, windowed=True)
    kp, _ = myers_banded_forward_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen), W
    )
    assert _planes_equal_valid_rows(np.asarray(mp), np.asarray(kp), qlen)


@pytest.mark.tpu
def test_aligner_long_sequences_tpu():
    """100 kb pairs align within memory via the myers engine's streamed
    row blocks + chunked repack (reference analogue: the legacy
    Hirschberg-Myers large-matrix path, hirschberg_myers_gpu.cu)."""
    from genomeworks_tpu.aligner import create_aligner

    rng = np.random.default_rng(5)
    qs = generate_random_genome(100_000, rng)
    # target: substitutions only plus one 1500-base deletion. The length
    # difference forces the initial band to 2048 directly (one kernel
    # shape, no retry ladder of fresh giant compiles), and the path drift
    # (<= 1500 + substitution wander) fits that band. An unconstrained
    # 5%+5% indel mutant at this seed drifts ~3400 diagonals — beyond any
    # 2048 band (the kernel then rightly reports non-optimal), and the
    # 4096-band compile at M=131072 is too slow for the test budget.
    subs = mutate_sequence(qs, rng, snv_rate=0.05, indel_rate=0.0)
    ts = subs[:50_000] + subs[51_500:]
    aligner = create_aligner(max_bandwidth=2048, engine="myers",
                             max_alignments_per_launch=1)
    aligner.add_alignment(qs, ts)
    aligner.align_all()
    (aln,) = aligner.get_alignments()
    assert aln.is_optimal
    states = np.asarray(aln.states)
    nq = int(np.sum(states != 2))
    nt = int(np.sum(states != 3))
    assert nq == len(qs) and nt == len(ts)


@pytest.mark.tpu
def test_aligner_myers_engine_matches_oracle_tpu():
    from genomeworks_tpu.aligner import create_aligner

    rng = np.random.default_rng(11)
    aligner = create_aligner(max_bandwidth=1024, engine="myers")
    pairs = []
    for _ in range(64):
        m = int(rng.integers(50, 900))
        qs = generate_random_genome(m, rng)
        ts = mutate_sequence(qs, rng, 0.1, 0.1)
        pairs.append((qs, ts))
        aligner.add_alignment(qs, ts)
    aligner.align_all()
    alns = aligner.get_alignments()
    assert len(alns) == len(pairs)
    for (qs, ts), aln in zip(pairs, alns):
        assert aln.is_optimal
        oracle = np.asarray(align_cpu(qs, ts), dtype=np.int8)
        np.testing.assert_array_equal(np.asarray(aln.states), oracle)
