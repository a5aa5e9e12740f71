"""Banded POA NW tests (reference: cudapoa_nw_banded.cuh semantics
including adaptive band sizing and the band-shift rerun protocol)."""

import numpy as np
import pytest

from genomeworks_tpu.poa.banded import (
    ADAPTIVE_STORAGE_FAILED,
    SHIFT_LEFT,
    SHIFT_RIGHT,
    _band_start_for_row,
    nw_align_banded,
    nw_align_banded_with_rerun,
)
from genomeworks_tpu.poa.cpu_reference import (
    PoaGraph,
    build_backbone,
    nw_align,
    poa_consensus,
)
from genomeworks_tpu.poa.batch import BandMode, BatchConfig, OutputType, PoaBatch, StatusType
from genomeworks_tpu.simulators.genomesim import generate_random_genome, mutate_sequence


def _graph(seq):
    e = np.frombuffer(seq.encode(), np.uint8)
    g = PoaGraph(3 * len(e))
    build_backbone(g, e, np.ones(len(e), np.int32))
    return g


def test_band_start_alignment_and_clamp():
    # start is 4-aligned and clamped so the band always reaches max_column
    assert _band_start_for_row(10, 1.0, 128, 64, 100) == 0
    s = _band_start_for_row(500, 1.0, 128, 64, 501)
    assert s % 4 == 0
    assert s + 128 >= 501


@pytest.mark.parametrize("adaptive", [False, True])
def test_wide_band_matches_full_band_alignment(adaptive):
    rng = np.random.default_rng(2)
    for _ in range(6):
        t = generate_random_genome(int(rng.integers(40, 100)), rng)
        g = _graph(t)
        read = np.frombuffer(
            mutate_sequence(t, rng, 0.1, 0.1).encode(), np.uint8
        )
        full = nw_align(g, read, -8, -6, 8)
        banded = nw_align_banded_with_rerun(g, read, -8, -6, 8, 256, adaptive)
        assert not isinstance(banded, int)
        np.testing.assert_array_equal(banded[0], full[0])
        np.testing.assert_array_equal(banded[1], full[1])


def test_banded_consensus_modes_match_full_on_easy_windows():
    rng = np.random.default_rng(4)
    for _ in range(4):
        t = generate_random_genome(int(rng.integers(50, 120)), rng)
        w = [t] + [mutate_sequence(t, rng, 0.08, 0.08) for _ in range(4)]
        full = poa_consensus(w)
        for mode in ("static_band", "adaptive_band"):
            got = poa_consensus(w, band_mode=mode, band_width=256)
            assert got[0] == full[0]
            np.testing.assert_array_equal(got[1], full[1])


def test_adaptive_band_grows_for_skewed_aspect_ratio():
    # very long read vs short graph triggers ad-hoc rule 1 (band growth)
    rng = np.random.default_rng(5)
    t = generate_random_genome(60, rng)
    g = _graph(t)
    long_read = np.frombuffer(
        (t + generate_random_genome(500, rng)).encode(), np.uint8
    )
    r = nw_align_banded_with_rerun(g, long_read, -8, -6, 8, 128, adaptive=True)
    assert not isinstance(r, int)
    # alignment consumes the full read
    assert int(np.sum(np.asarray(r[1]) != -1)) == len(long_read)


def test_adaptive_storage_limit():
    rng = np.random.default_rng(6)
    t = generate_random_genome(100, rng)
    g = _graph(t)
    read = np.frombuffer(t.encode(), np.uint8)
    r = nw_align_banded(g, read, -8, -6, 8, 128, adaptive=True, rerun=0,
                        max_buffer_size=10.0)
    assert r == ADAPTIVE_STORAGE_FAILED


def test_strict_banded_batch_and_cli_flag():
    rng = np.random.default_rng(7)
    t = generate_random_genome(80, rng)
    w = [t] + [mutate_sequence(t, rng, 0.06, 0.06) for _ in range(3)]
    cfg = BatchConfig(max_sequence_size=256, band_width=128,
                      band_mode=BandMode.adaptive_band)
    b = PoaBatch(cfg, strict_banded=True)
    b.add_poa_group(w)
    b.generate_poa()
    cons, cov, st = b.get_consensus()
    assert st == [StatusType.success]
    want = poa_consensus(w, band_mode="adaptive_band", band_width=128)
    assert cons[0] == want[0]
    np.testing.assert_array_equal(cov[0], want[1])
    # strict banded MSA
    bm = PoaBatch(cfg, output_mask=OutputType.msa, strict_banded=True)
    bm.add_poa_group(w)
    bm.generate_poa()
    msa, mst = bm.get_msa()
    assert mst == [StatusType.success]
    for s, row in zip(w, msa[0]):
        assert row.replace("-", "") == s


@pytest.mark.tpu
def test_banded_msa_on_device_parity_tpu():
    """poa_batch_msa_banded: the banded NW kernel phases composed with
    the in-kernel racon sort/emission (the reference instantiates MSA x
    every band mode on device, cudapoa_kernels.cuh:613-1053). Parity vs
    the host banded chain."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs TPU")
    import numpy as np

    from genomeworks_tpu.poa.cpu_reference import poa_msa
    from genomeworks_tpu.poa.jax_poa import poa_batch_msa_banded
    from genomeworks_tpu.simulators.genomesim import (
        generate_random_genome,
        mutate_sequence,
    )

    rng = np.random.default_rng(2)
    windows = []
    for _ in range(6):
        t = generate_random_genome(120, rng)
        windows.append(
            [t] + [mutate_sequence(t, rng, 0.05, 0.05) for _ in range(3)]
        )
    for mode in ("static_band", "adaptive_band"):
        msa, st = poa_batch_msa_banded(windows, band_width=128,
                                       band_mode=mode)
        for b, w in enumerate(windows):
            ref = poa_msa(w, band_mode=mode, band_width=128)
            assert st[b] == 0
            assert msa[b] == ref
