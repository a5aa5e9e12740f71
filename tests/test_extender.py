"""X-drop extender tests, including exact golden parity with the
reference's end-to-end test data
(cudaextender/tests/Test_CudaextenderEnd2End.cu)."""

import numpy as np
import pytest

from genomeworks_tpu.extender import (
    UngappedXDrop,
    create_extender,
    encode_sequence,
    parse_seed_pairs,
    parse_scored_segment_pairs,
    DEFAULT_SCORE_MATRIX,
)
from genomeworks_tpu.io import create_fasta_parser

DATA = "/root/reference/cudaextender/data"


def test_encode_sequence():
    np.testing.assert_array_equal(encode_sequence("ACGT"), [0, 1, 2, 3])
    np.testing.assert_array_equal(encode_sequence("acgt"), [4, 4, 4, 4])
    np.testing.assert_array_equal(encode_sequence("N&Z"), [5, 7, 6])


def test_simple_extension():
    # perfect match region bounded by mismatching tails
    q = encode_sequence("TTTT" + "ACGTACGTACGTACGTACGTACGTACGTACGT" + "TTTT")
    t = encode_sequence("GGGG" + "ACGTACGTACGTACGTACGTACGTACGTACGT" + "GGGG")
    ex = create_extender(xdrop_threshold=200, no_entropy=True)
    # seed in the middle of the matching region, threshold low
    ex.extend_async(q, t, 500, [(16, 16)])
    ssps = ex.get_scored_segment_pairs()
    assert len(ssps) == 1
    s = ssps[0]
    # segment should span the 32-base match region
    assert s.query_position_in_read == 4
    assert s.target_position_in_read == 4
    assert s.length >= 30


def test_below_threshold_dropped():
    q = encode_sequence("ACGTACGT")
    t = encode_sequence("ACGTACGT")
    ex = create_extender(no_entropy=True)
    ex.extend_async(q, t, 100000, [(2, 2)])
    assert ex.get_scored_segment_pairs() == []


def test_golden_end2end_parity():
    """Bit-exact vs cudaextender/data/sample_scored_segment_pairs.csv:
    143670 seeds -> 1337 SSPs, ordered equality like the reference test."""
    parser = create_fasta_parser(f"{DATA}/sample.fa")
    enc = encode_sequence(parser.get_sequence_by_id(0).seq)
    seeds = parse_seed_pairs(f"{DATA}/sample_seed_pairs.csv")
    golden = parse_scored_segment_pairs(f"{DATA}/sample_scored_segment_pairs.csv")

    ex = create_extender(DEFAULT_SCORE_MATRIX, xdrop_threshold=910, no_entropy=False)
    ex.extend_async(enc, enc, 3000, seeds)
    ex.sync()
    got = ex.get_scored_segment_pairs()
    assert len(got) == len(golden)
    for a, b in zip(got, golden):
        assert a.astuple() == b.astuple()


def test_device_array_inputs():
    """Reference parity: the device-pointer extend_async overload
    (extender.hpp:120) — device-resident jnp sequences are accepted
    without a host round-trip and give identical SSPs."""
    import jax.numpy as jnp

    q = encode_sequence("TTTT" + "ACGTACGTACGTACGTACGTACGTACGTACGT" + "TTTT")
    t = encode_sequence("GGGG" + "ACGTACGTACGTACGTACGTACGTACGTACGT" + "GGGG")
    ex = create_extender(xdrop_threshold=200, no_entropy=True)
    ex.extend_async(q, t, 500, [(16, 16)])
    host_ssps = ex.get_scored_segment_pairs()
    ex.reset()
    ex.extend_async(jnp.asarray(q), jnp.asarray(t), 500, [(16, 16)])
    assert ex.get_scored_segment_pairs() == host_ssps
