"""Native scalar CPU POA baseline vs the Python reference — bit parity
(both implement cudapoa's full-band chain; the native one is the honest
single-core benchmark baseline)."""

import numpy as np
import pytest

from genomeworks_tpu.poa import native_baseline
from genomeworks_tpu.poa.cpu_reference import poa_consensus
from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
)

pytestmark = pytest.mark.skipif(
    not native_baseline.available(), reason="native baseline not built"
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_reference(seed):
    rng = np.random.default_rng(seed)
    for _ in range(6):
        t = generate_random_genome(int(rng.integers(30, 260)), rng)
        n = int(rng.integers(1, 9))
        w = [t] + [mutate_sequence(t, rng, 0.08, 0.08) for _ in range(n)]
        ref_c, ref_v = poa_consensus(w)
        nat_c, nat_v = native_baseline.poa_consensus_native(w)
        assert nat_c == ref_c
        np.testing.assert_array_equal(nat_v, ref_v)


def test_native_single_sequence():
    c, v = native_baseline.poa_consensus_native(["ACGTACGT"])
    assert c == "ACGTACGT"
    np.testing.assert_array_equal(v, np.ones(8, np.int32))
