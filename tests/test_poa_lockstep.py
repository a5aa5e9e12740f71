"""Lockstep POA tier (ops/poa_lockstep_pallas.py via poa/lockstep.py).

Parity target: the XLA lockstep chain (poa.jax_poa), itself bit-parity
tested against poa/cpu_reference.py and the reference's golden data
(cudapoa generatePOAKernel full-band chain, cudapoa_kernels.cuh:78).
Interpret-mode tests exercise the exact kernel logic on any backend; the
tpu-marked test compiles the real chain on chip at a small shape.
"""

import numpy as np
import pytest

import jax

from genomeworks_tpu.poa.jax_poa import poa_batch_consensus
from genomeworks_tpu.poa.lockstep import (
    lockstep_plan,
    poa_batch_consensus_lockstep,
)
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)


def _make_windows(B, S, Lb, seed=0, sub=0.05, indel=0.05):
    rng = np.random.default_rng(seed)
    windows = []
    for _ in range(B):
        t = generate_random_genome(Lb, rng)
        windows.append(
            [t] + [mutate_sequence(t, rng, sub, indel) for _ in range(S - 1)]
        )
    return windows, rng


def _assert_parity(windows, out, ref, max_overflow=0):
    c1, v1, _ = ref
    c2, v2, s2 = out
    overflow = 0
    for b in range(len(windows)):
        if s2[b] != 0:
            overflow += 1
            continue
        assert c2[b] == c1[b], b
        assert np.array_equal(v2[b], v1[b]), b
    assert overflow <= max_overflow


def test_lockstep_interpret_parity_unit_weights():
    windows, _ = _make_windows(128, 5, 60, seed=7)
    # vary reads/window so the active-mask paths are exercised
    for i in range(0, 128, 7):
        windows[i] = windows[i][: 2 + (i % 4)]
    ref = poa_batch_consensus(windows, use_pallas=False, use_lockstep=False)
    out = poa_batch_consensus_lockstep(windows, interpret=True)
    assert out is not None
    _assert_parity(windows, out, ref)


def test_lockstep_interpret_parity_weighted():
    # ADVICE r4: the weighted path (wpl shift, wb backbone, dw edge
    # accumulation) needs its own parity coverage
    windows, rng = _make_windows(128, 4, 50, seed=11)
    weights = [
        [rng.integers(1, 5, size=len(s)).astype(np.int32) for s in w]
        for w in windows
    ]
    ref = poa_batch_consensus(
        windows, weights=weights, use_pallas=False, use_lockstep=False
    )
    out = poa_batch_consensus_lockstep(windows, weights=weights,
                                       interpret=True)
    assert out is not None
    _assert_parity(windows, out, ref)


def test_lockstep_plan_budget():
    # every plan the planner can emit must fit the per-kernel VMEM budget
    from genomeworks_tpu.poa.lockstep import _chain_vmem, _VMEM_BUDGET

    for L in (32, 64, 128, 256, 320, 512, 760):
        pln = lockstep_plan(L)
        if pln is None:
            continue
        N, D, Lp = pln
        assert N >= L + 2
        K = ((N + L + 2 + 7) // 8) * 8
        assert _chain_vmem(N, D, Lp, K) <= _VMEM_BUDGET
        assert _chain_vmem(N, D, Lp, K, weighted=True) <= _VMEM_BUDGET + \
            4 * 128 * Lp
    # the covid shape (L = 299 -> bucket 320) must keep a plan with a
    # distance ring covering the workload's p99 pred distance (71)
    N, D, Lp = lockstep_plan(320)
    assert N >= 512 and D >= 64


def test_lockstep_respects_max_nodes():
    # ADVICE r4: caller caps stricter than the plane caps must clamp N
    pln = lockstep_plan(60, max_nodes=128)
    assert pln is not None and pln[0] <= 128
    assert lockstep_plan(200, max_nodes=128) is None


@pytest.mark.tpu
def test_lockstep_compiled_parity_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("needs TPU")
    windows, _ = _make_windows(192, 4, 40, seed=3)
    ref = poa_batch_consensus(windows, use_pallas=False, use_lockstep=False)
    out = poa_batch_consensus_lockstep(windows, interpret=False)
    assert out is not None
    _assert_parity(windows, out, ref, max_overflow=2)
