"""Long-window POA on the device banded path (VERDICT r5 #7).

Measured device ceiling (this repo, v5e): the per-window banded kernel
plan admits windows up to ~2.5 kb (graph state lives in SMEM, 1 MB/core:
_pallas_banded_plan returns (S, L=2560, N=2502, E=16, G=1) at 2.5 kb and
None at 3 kb). Longer windows keep CORRECT via the host banded chain
(cpu_reference poa_consensus band_mode=...) — the documented fallback
tier. The reference's adaptive band targets ~30k-node graphs
(cudapoa_nw_banded.cuh:436-462 adaptive width from the graph/read
ratio); matching that scale on device needs HBM-resident, topologically
streamed graph state — recorded as future work in PROGRESS.md.
"""

import numpy as np
import pytest

import jax

from genomeworks_tpu.poa.cpu_reference import poa_consensus
from genomeworks_tpu.poa.jax_poa import (
    _pallas_banded_plan,
    poa_batch_consensus_banded,
)
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)


def _long_windows(B, S, Lb, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(B):
        t = generate_random_genome(Lb, rng)
        out.append(
            [t] + [mutate_sequence(t, rng, 0.03, 0.03) for _ in range(S - 1)]
        )
    return out


def test_banded_plan_length_ceiling_documented():
    # the documented device ceiling must hold: ~2.5 kb fits, 3 kb does not
    w25 = [["A" * 2500] * 4]
    w30 = [["A" * 3000] * 4]
    assert _pallas_banded_plan(w25, None, 50, 50, 256) is not None
    assert _pallas_banded_plan(w30, None, 50, 50, 256) is None


@pytest.mark.tpu
def test_long_window_banded_kernel_parity_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("needs TPU")
    windows = _long_windows(3, 4, 2000, seed=4)
    for mode in ("static_band", "adaptive_band"):
        cons, cov, st = poa_batch_consensus_banded(
            windows, band_width=256, band_mode=mode
        )
        for b, w in enumerate(windows):
            rc, rv = poa_consensus(w, band_mode=mode, band_width=256)
            assert st[b] == 0
            assert cons[b] == rc
            np.testing.assert_array_equal(cov[b], rv)


def test_beyond_ceiling_windows_fall_back_correctly():
    # 5 kb windows exceed the device plan; the driver must still return
    # the exact host-chain result (graceful degradation, not an error)
    windows = _long_windows(1, 3, 5000, seed=6)
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=256, band_mode="adaptive_band"
    )
    rc, rv = poa_consensus(
        windows[0], band_mode="adaptive_band", band_width=256
    )
    assert st[0] == 0
    assert cons[0] == rc
