"""Device-side RLE traceback vs the host walk (bit-parity).

Reference analogue: cudaaligner myers_gpu.cu:444-530 (device RLE CIGAR
emission); oracle = traceback_host_packed over the same packed codes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from genomeworks_tpu.aligner.banded_nw import band_offset
from genomeworks_tpu.ops.banded_nw_pallas import (
    banded_nw_forward_pallas,
    traceback_host_packed,
)
from genomeworks_tpu.ops.rle_traceback_pallas import rle_traceback_pallas
from genomeworks_tpu.core.sequence import encode_bases
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)


def _make_batch(B, M, seed=0, err=0.05):
    rng = np.random.default_rng(seed)
    q = np.full((B, M), 1, np.uint8)
    t = np.full((B, M), 2, np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for b in range(B):
        tg = generate_random_genome(M - 32 - (b * 13) % 48, rng)
        qs = mutate_sequence(tg, rng, err, err)[: M]
        qc, tc = encode_bases(qs), encode_bases(tg)
        q[b, : len(qc)] = qc
        t[b, : len(tc)] = tc
        qlen[b], tlen[b] = len(qc), len(tc)
    return q, t, qlen, tlen


@pytest.mark.parametrize("W", [128, 256])
def test_rle_matches_host_walk(W):
    B, M = 8, 256
    q, t, qlen, tlen = _make_batch(B, M)
    codes, fits = banded_nw_forward_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen), W
    )
    dlo = np.asarray(band_offset(jnp.asarray(qlen), jnp.asarray(tlen), W))
    paths, edge = traceback_host_packed(np.asarray(codes), qlen, tlen, dlo, W)

    runs, nruns, dist, edge_d, ovf = rle_traceback_pallas(
        codes, jnp.asarray(qlen), jnp.asarray(tlen), jnp.asarray(dlo), W
    )
    runs, nruns, dist = np.asarray(runs), np.asarray(nruns), np.asarray(dist)
    edge_d, ovf = np.asarray(edge_d), np.asarray(ovf)
    assert not ovf.any()
    for b in range(B):
        rr = runs[b, : nruns[b]][::-1]
        path = np.repeat((rr >> 28).astype(np.int8), rr & ((1 << 28) - 1))
        assert (path == paths[b]).all(), b
        assert bool(edge_d[b]) == bool(edge[b]), b
        assert dist[b] == int((paths[b] != 0).sum()), b


def test_rle_overflow_flag():
    # alternating bases force ~per-base runs > rcap
    B, M, W = 8, 256, 128
    q = np.full((B, M), 1, np.uint8)
    t = np.full((B, M), 2, np.uint8)
    qc = encode_bases("ACGT" * 50)
    tc = encode_bases("TGCA" * 50)
    q[:, : len(qc)] = qc
    t[:, : len(tc)] = tc
    qlen = np.full(B, len(qc), np.int32)
    tlen = np.full(B, len(tc), np.int32)
    codes, _ = banded_nw_forward_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen), W
    )
    dlo = np.asarray(band_offset(jnp.asarray(qlen), jnp.asarray(tlen), W))
    runs, nruns, dist, edge_d, ovf = rle_traceback_pallas(
        codes, jnp.asarray(qlen), jnp.asarray(tlen), jnp.asarray(dlo), W,
        rcap=16,
    )
    assert np.asarray(ovf).all()


def test_aligner_end_to_end_uses_device_rle():
    from genomeworks_tpu.aligner import Aligner
    from genomeworks_tpu.aligner.cpu_reference import edit_distance_cpu

    rng = np.random.default_rng(3)
    a = Aligner(max_bandwidth=1024)
    pairs = []
    for i in range(5):
        tg = generate_random_genome(180 + i * 7, rng)
        qs = mutate_sequence(tg, rng, 0.06, 0.06)
        pairs.append((qs, tg))
        a.add_alignment(qs, tg)
    a.align_all()
    alns = a.get_alignments()
    assert len(alns) == 5
    for (qs, tg), aln in zip(pairs, alns):
        dist = edit_distance_cpu(qs, tg)
        got = int((np.asarray(aln.states) != 0).sum())
        assert got == dist, (got, dist)
        assert aln.is_optimal


@pytest.mark.tpu
def test_rle_lockstep_matches_scalar_kernel():
    """The lockstep (128 alignments/lane-group) traceback must be
    bit-identical to the scalar-chain kernel — same walk semantics, run
    boundaries invariant to skip chunking. TPU-marked: the interpret-mode
    XLA-CPU compile of the lockstep program takes >10 min (one-hot
    scatters over (RCAP, 128) inside a while body); compiled on chip it
    runs in seconds, and the CPU-tier interpret parity was verified once
    manually (r5)."""
    import numpy as np
    import jax.numpy as jnp

    from genomeworks_tpu.aligner.banded_nw import band_offset
    from genomeworks_tpu.ops.myers_banded_pallas import (
        myers_banded_forward_pallas,
    )
    from genomeworks_tpu.ops.rle_traceback_pallas import (
        rle_traceback_lockstep_pallas,
        rle_traceback_pallas,
    )

    rng = np.random.default_rng(0)
    B, M, W = 128, 128, 128
    base = rng.integers(0, 4, size=(B, M)).astype(np.uint8)
    t = base.copy()
    mut = rng.random((B, M)) < 0.06
    t[mut] = (t[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
    qlen = rng.integers(M // 2, M + 1, B).astype(np.int32)
    tlen = rng.integers(M // 2, M + 1, B).astype(np.int32)
    q = jnp.asarray(base)
    tj = jnp.asarray(t)
    ql = jnp.asarray(qlen)
    tl = jnp.asarray(tlen)
    dlo = band_offset(ql, tl, W)
    codes, fits = myers_banded_forward_pallas(q, tj, ql, tl, W)
    a = rle_traceback_pallas(codes, ql, tl, dlo, W, rcap=128)
    b = rle_traceback_lockstep_pallas(codes, ql, tl, dlo, W, rcap=128)
    nr = np.asarray(a[1])
    assert np.array_equal(nr, np.asarray(b[1]))
    ra, rb = np.asarray(a[0]), np.asarray(b[0])
    for i in range(B):
        assert np.array_equal(ra[i, : nr[i]], rb[i, : nr[i]]), i
    for x, y in zip(a[2:], b[2:]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
