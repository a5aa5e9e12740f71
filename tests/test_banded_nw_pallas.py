"""Pallas banded-DP kernel vs the XLA scan version (bit parity) and via the
Aligner pallas path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from genomeworks_tpu.aligner.banded_nw import banded_nw_forward, band_offset
from genomeworks_tpu.aligner import align_cpu, create_aligner
from genomeworks_tpu.ops.banded_nw_pallas import (
    banded_nw_forward_pallas,
    traceback_host_packed,
    ROWS_PER_WORD,
)
from genomeworks_tpu.simulators.genomesim import generate_random_genome, mutate_sequence


def _unpack_all(packed, M):
    B, MW, W = packed.shape
    rows = np.arange(M)
    return np.stack(
        [(packed[:, r // ROWS_PER_WORD, :] >> (2 * (r % ROWS_PER_WORD))) & 3 for r in rows],
        axis=1,
    ).astype(np.int8)


def test_pallas_matches_scan():
    rng = np.random.default_rng(7)
    B, M, N, W = 8, 128, 120, 128
    q = rng.integers(0, 4, (B, M)).astype(np.uint8)
    t = rng.integers(0, 4, (B, N)).astype(np.uint8)
    ql = rng.integers(1, M + 1, B).astype(np.int32)
    tl = rng.integers(1, N + 1, B).astype(np.int32)
    d1, c1, f1 = banded_nw_forward(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql), jnp.asarray(tl), W)
    c2, f2 = banded_nw_forward_pallas(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql), jnp.asarray(tl), W)
    c1 = np.transpose(np.asarray(c1), (1, 0, 2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(c1, _unpack_all(np.asarray(c2), M))

    # packed traceback gives identical paths to oracle on fitting bands
    dlo = np.asarray(band_offset(jnp.asarray(ql), jnp.asarray(tl), W))
    paths, edge = traceback_host_packed(np.asarray(c2), ql, tl, dlo, W)
    for b in range(B):
        qs = "".join("ACGT"[c] for c in q[b, : ql[b]])
        ts_ = "".join("ACGT"[c] for c in t[b, : tl[b]])
        if not edge[b]:
            np.testing.assert_array_equal(paths[b], align_cpu(qs, ts_))


def test_aligner_pallas_path():
    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(5):
        ref = generate_random_genome(int(rng.integers(50, 200)), rng)
        pairs.append((ref, mutate_sequence(ref, rng, snv_rate=0.06, indel_rate=0.05)))
    a = create_aligner(max_bandwidth=512, use_pallas=True)
    for qv, tv in pairs:
        a.add_alignment(qv, tv)
    a.align_all()
    for (qv, tv), aln in zip(pairs, a.get_alignments()):
        np.testing.assert_array_equal(aln.states, align_cpu(qv, tv))
