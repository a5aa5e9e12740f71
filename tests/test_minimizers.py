"""Minimizer sketch parity with the reference's hand-computed unit tests
(cudamapper/tests/Test_CudamapperMinimizer.cpp)."""

import numpy as np
import jax.numpy as jnp

from genomeworks_tpu.core.sequence import encode_bases
from genomeworks_tpu.mapper.minimizers import compute_sketch, sketch_to_numpy, wang_hash32


def _sketch(seqs, k, w, hashed):
    L = max(len(s) for s in seqs)
    B = len(seqs)
    reads = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        c = encode_bases(s)
        reads[i, : len(c)] = c
        lens[i] = len(c)
    out = compute_sketch(jnp.asarray(reads), jnp.asarray(lens), k, w, hashed)
    return sketch_to_numpy(*out)


def test_gatt_4_1():
    reps, rids, poss, dirs = _sketch(["GATT"], k=4, w=1, hashed=False)
    np.testing.assert_array_equal(reps, [0b00001101])
    np.testing.assert_array_equal(rids, [0])
    np.testing.assert_array_equal(poss, [0])
    np.testing.assert_array_equal(dirs, [1])


def test_gatt_2_3():
    reps, rids, poss, dirs = _sketch(["GATT"], k=2, w=3, hashed=False)
    np.testing.assert_array_equal(reps, [0b1000, 0b0011, 0b0000])
    np.testing.assert_array_equal(poss, [0, 1, 2])
    np.testing.assert_array_equal(dirs, [0, 0, 1])


def test_gatt_2_3_hashed():
    reps, rids, poss, dirs = _sketch(["GATT"], k=2, w=3, hashed=True)
    np.testing.assert_array_equal(reps, [1023180699, 2797583197, 3255840626])
    np.testing.assert_array_equal(poss, [0, 1, 2])
    np.testing.assert_array_equal(dirs, [0, 0, 0])


def test_cccatacc_2_7():
    reps, rids, poss, dirs = _sketch(["CCCATACC"], k=2, w=7, hashed=False)
    np.testing.assert_array_equal(reps, [0b0101, 0b0101, 0b0100, 0b0011, 0b0001, 0b0101])
    np.testing.assert_array_equal(poss, [0, 1, 2, 3, 5, 6])
    np.testing.assert_array_equal(dirs, [0, 0, 0, 0, 0, 0])


def test_cccatacc_2_7_hashed():
    reps, rids, poss, dirs = _sketch(["CCCATACC"], k=2, w=7, hashed=True)
    np.testing.assert_array_equal(reps, [2515151312, 2515151312, 1582582417, 2515151312])
    np.testing.assert_array_equal(poss, [0, 1, 2, 6])


def test_catcaag_aagcta_3_2():
    reps, rids, poss, dirs = _sketch(["CATCAAG", "AAGCTA"], k=3, w=2, hashed=False)
    np.testing.assert_array_equal(
        reps, [0b001110, 0b001101, 0b010000, 0b000010, 0b000010, 0b001001, 0b011100]
    )
    np.testing.assert_array_equal(rids, [0, 0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(poss, [0, 1, 3, 4, 0, 2, 3])
    np.testing.assert_array_equal(dirs, [1, 0, 0, 0, 0, 1, 0])


def test_catcaag_aagcta_3_2_hashed():
    reps, rids, poss, dirs = _sketch(["CATCAAG", "AAGCTA"], k=3, w=2, hashed=True)
    np.testing.assert_array_equal(
        reps,
        [549100223, 447855090, 1279515286, 1865025060, 1865025060, 4103259927, 357458314],
    )
    np.testing.assert_array_equal(rids, [0, 0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(poss, [0, 1, 2, 4, 0, 2, 3])
    np.testing.assert_array_equal(dirs, [0, 1, 0, 0, 0, 1, 0])


def test_short_read_skipped():
    # read shorter than w + k - 1 emits nothing (index_gpu.cuh:835)
    reps, rids, poss, dirs = _sketch(["GATTACA", "GAT"], k=3, w=4, hashed=False)
    assert (rids == 1).sum() == 0
    assert (rids == 0).sum() > 0
