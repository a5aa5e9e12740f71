"""Large-scale POA golden end-to-end test.

Reference analogue: Test_CudapoaBatchEnd2End.cu:36-80 — 5500 real windows
through MultiBatch, assembled consensus asserted equal to
sample-golden-value.txt. The reference's window data is git-lfs-absent
from this checkout, so the committed workload here is built from the
bundled covid reads (map → racon-style windows — see
experiments/make_poa_golden.py) with the CPU-reference consensus as the
committed golden (tests/data/poa_golden_covid.txt).

CPU tier runs a prefix of the workload through the full PoaBatch loop;
the tpu-marked test runs every window through the Pallas kernel path on
the real chip.
"""

import gzip
import os

import pytest

from genomeworks_tpu.poa.batch import (
    BandMode,
    OutputType,
    PoaBatch,
    StatusType,
)
from genomeworks_tpu.poa.windows import get_multi_batch_sizes

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _load_workload(limit=None):
    windows = []
    with gzip.open(os.path.join(DATA, "poa_windows_covid.txt.gz"), "rt") as f:
        remaining = 0
        for line in f:
            line = line.rstrip("\n")
            if remaining == 0:
                remaining = int(line)
                windows.append([])
            else:
                windows[-1].append(line)
                remaining -= 1
            if limit and len(windows) > limit and remaining == 0:
                break
    with open(os.path.join(DATA, "poa_golden_covid.txt")) as f:
        golden = [line.rstrip("\n") for line in f]
    if limit:
        windows = windows[:limit]
        golden = golden[:limit]
    return windows, golden


def _run_batches(windows):
    # the committed golden is the full-band CPU-reference chain; pin the
    # mode (the reference golden test's MultiBatch likewise fixes its mode)
    from genomeworks_tpu.poa.batch import BandMode as _BM

    configs, groups_per_config = get_multi_batch_sizes(
        windows, band_mode=_BM.full_band
    )
    results = {}
    for cfg, wids in zip(configs, groups_per_config):
        batch = PoaBatch(cfg, OutputType.consensus)
        for wid in wids:
            status, _ = batch.add_poa_group(windows[wid])
            assert status == StatusType.success, f"add window {wid}: {status}"
        batch.generate_poa()
        cons, _, st = batch.get_consensus()
        for wid, c, s in zip(wids, cons, st):
            assert s == StatusType.success, f"window {wid}: {s}"
            results[wid] = c
    return [results[i] for i in range(len(windows))]


def test_poa_golden_prefix():
    """Every backend: the first 48 windows bit-equal the committed golden."""
    windows, golden = _load_workload(limit=48)
    cons = _run_batches(windows)
    for i, (c, g) in enumerate(zip(cons, golden)):
        assert c == g, f"window {i}"


@pytest.mark.tpu
def test_poa_golden_full_scale():
    """Real chip: the full committed workload (reference-test scale)
    through the PoaBatch kernel path; assembled consensus must equal the
    golden exactly (Test_CudapoaBatchEnd2End semantics)."""
    windows, golden = _load_workload()
    assert len(windows) >= 5000, "workload should be reference-test scale"
    cons = _run_batches(windows)
    mismatches = [i for i, (c, g) in enumerate(zip(cons, golden)) if c != g]
    assert not mismatches, f"{len(mismatches)} windows differ, first: {mismatches[:5]}"
    assert "".join(cons) == "".join(golden)
