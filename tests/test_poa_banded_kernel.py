"""Static-band POA kernel vs the exact banded CPU chain (poa/banded.py,
the bit-faithful port of cudapoa_nw_banded.cuh static mode).

CPU tier runs the kernel in interpret mode on small windows; the
tpu-marked test compiles it on the real chip at scale, including long
(>640 bp) windows that the full-band kernel cannot hold on-chip."""

import numpy as np
import pytest

from genomeworks_tpu.poa.cpu_reference import poa_consensus
from genomeworks_tpu.poa.jax_poa import poa_batch_consensus_banded
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)


def _windows(n, lo, hi, smax, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        t = generate_random_genome(int(rng.integers(lo, hi)), rng)
        k = int(rng.integers(1, smax))
        out.append(
            [t] + [mutate_sequence(t, rng, 0.08, 0.08) for _ in range(k)]
        )
    return out


def _host_banded(w, band_width):
    try:
        c, v = poa_consensus(
            w, None, -8, -6, 8, None, band_mode="static_band",
            band_width=band_width,
        )
        return c, v, 0
    except Exception:
        return None


def test_banded_kernel_parity_small():
    windows = _windows(4, 60, 160, 4, seed=11) + [["ACGTACGTACGT"]]
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=128, use_pallas=True
    )
    for b, w in enumerate(windows):
        ref = _host_banded(w, 128)
        assert ref is not None
        assert st[b] == 0, f"window {b}: status {st[b]}"
        assert cons[b] == ref[0], f"window {b}"
        np.testing.assert_array_equal(cov[b], ref[1])


def _diverging_windows(n, seed=0, L=600):
    """Windows whose second read carries a mid-deletion of L/2 — the
    optimal path leaves a 128-band (verified: banded.py differs from the
    full-band alignment on every such window)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        t = generate_random_genome(L, rng)
        out.append([t, t[: L // 4] + t[3 * L // 4 :]])
    return out


def test_banded_differs_from_full_band():
    # sanity: the banded chain is genuinely banded on these constructions
    from genomeworks_tpu.poa import banded
    from genomeworks_tpu.poa.cpu_reference import (
        PoaGraph,
        build_backbone,
        nw_align,
    )

    w = _diverging_windows(1, seed=2)[0]
    enc_t = np.frombuffer(w[0].encode(), dtype=np.uint8)
    enc_r = np.frombuffer(w[1].encode(), dtype=np.uint8)
    g = PoaGraph(3 * len(w[0]))
    build_backbone(g, enc_t, np.ones(len(w[0]), np.int32))
    full = nw_align(g, enc_r, -8, -6, 8)
    b = banded.nw_align_banded_with_rerun(
        g, enc_r, -8, -6, 8, 128, adaptive=False
    )
    assert isinstance(b, int) or not (
        np.array_equal(full[0], b[0]) and np.array_equal(full[1], b[1])
    )


def test_banded_kernel_parity_on_band_leaving_paths():
    """The kernel must match the banded chain on windows where banding
    demonstrably changes the alignment (proves the kernel is banded, not
    a full-band impostor passing vacuously)."""
    windows = _diverging_windows(2, seed=7, L=360)
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=128, use_pallas=True
    )
    checked = 0
    for b, w in enumerate(windows):
        ref = _host_banded(w, 128)
        if ref is None:
            continue
        assert st[b] == ref[2]
        if st[b] == 0:
            assert cons[b] == ref[0], f"window {b}"
            np.testing.assert_array_equal(cov[b], ref[1])
            checked += 1
    assert checked > 0


def _host_adaptive(w, band_width):
    try:
        c, v = poa_consensus(
            w, None, -8, -6, 8, None, band_mode="adaptive_band",
            band_width=band_width,
        )
        return c, v, 0
    except Exception:
        return None


def test_adaptive_kernel_parity_small():
    """Adaptive banding in-kernel (rules 1-8 + shift rerun) must match
    the host adaptive chain exactly."""
    windows = _windows(3, 60, 160, 4, seed=21) + _diverging_windows(
        2, seed=13, L=300
    )
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=128, use_pallas=True, band_mode="adaptive_band"
    )
    checked = 0
    for b, w in enumerate(windows):
        ref = _host_adaptive(w, 128)
        if ref is None:
            continue
        assert st[b] == ref[2], f"window {b}: {st[b]} vs {ref[2]}"
        if st[b] == 0:
            assert cons[b] == ref[0], f"window {b}"
            np.testing.assert_array_equal(cov[b], ref[1])
            checked += 1
    assert checked >= 3


def test_adaptive_kernel_gradient_rules():
    """Windows with skewed read/graph length ratios exercise rules 1-2
    (band auto-widening)."""
    rng = np.random.default_rng(7)
    t = generate_random_genome(400, rng)
    # short second read (gradient < 0.8 once the graph holds the backbone)
    windows = [[t, t[:90]], [t, t + t[:150]]]
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=128, use_pallas=True, band_mode="adaptive_band"
    )
    for b, w in enumerate(windows):
        ref = _host_adaptive(w, 128)
        if ref is None:
            continue
        assert st[b] == ref[2]
        if st[b] == 0:
            assert cons[b] == ref[0], f"window {b}"


@pytest.mark.tpu
def test_adaptive_kernel_parity_tpu_scale():
    windows = _windows(32, 100, 250, 8, seed=17)
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=256, use_pallas=True, band_mode="adaptive_band"
    )
    for b, w in enumerate(windows):
        ref = _host_adaptive(w, 256)
        if ref is None:
            continue
        assert st[b] == ref[2]
        if st[b] == 0:
            assert cons[b] == ref[0], f"window {b}"
            np.testing.assert_array_equal(cov[b], ref[1])


@pytest.mark.tpu
def test_banded_kernel_parity_tpu_scale():
    windows = _windows(48, 100, 250, 8, seed=5)
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=256, use_pallas=True
    )
    for b, w in enumerate(windows):
        ref = _host_banded(w, 256)
        if ref is None:
            continue
        assert st[b] == ref[2]
        if st[b] == 0:
            assert cons[b] == ref[0], f"window {b}"
            np.testing.assert_array_equal(cov[b], ref[1])


@pytest.mark.tpu
def test_banded_kernel_long_windows_tpu():
    """Windows beyond the full-band kernel's ~640 bp cap run in-kernel
    under banding (reference: adaptive/static band is how cudapoa handles
    long reads, cudapoa_nw_banded.cuh)."""
    windows = _windows(8, 900, 1400, 5, seed=9)
    cons, cov, st = poa_batch_consensus_banded(
        windows, band_width=256, use_pallas=True
    )
    ok = 0
    for b, w in enumerate(windows):
        ref = _host_banded(w, 256)
        if ref is None or ref[2] != 0:
            continue
        assert st[b] == 0
        assert cons[b] == ref[0], f"window {b}"
        ok += 1
    assert ok >= 6
