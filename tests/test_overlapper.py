"""Overlapper chaining tests ported from the reference's hand-built anchor
cases (cudamapper/tests/Test_CudamapperOverlapperTriggered.cu)."""

import numpy as np

from genomeworks_tpu.mapper.matcher import Anchors
from genomeworks_tpu.mapper.overlapper import (
    Overlap,
    get_overlaps,
    post_process_overlaps,
)


def _anchors(rows):
    a = np.array(rows, dtype=np.uint32)
    return Anchors(a[:, 0], a[:, 1], a[:, 2], a[:, 3])


def test_one_anchor_no_overlaps():
    ov = get_overlaps(_anchors([(1, 2, 100, 1000)]), False, 0, 0, 1000)
    assert ov == []


def test_four_anchors_one_overlap():
    ov = get_overlaps(
        _anchors([(1, 2, 100, 1000), (1, 2, 200, 1100), (1, 2, 300, 1200), (1, 2, 400, 1300)]),
        False, 0, 0, 1000,
    )
    assert len(ov) == 1
    o = ov[0]
    assert (o.query_read_id, o.target_read_id) == (1, 2)
    assert (o.query_start_position_in_read, o.query_end_position_in_read) == (100, 400)
    assert (o.target_start_position_in_read, o.target_end_position_in_read) == (1000, 1300)
    assert o.relative_strand == "+"


def test_four_anchors_no_overlap():
    ov = get_overlaps(
        _anchors([(1, 2, 100, 1000), (3, 4, 200, 1100), (5, 6, 300, 1200), (8, 9, 400, 1300)]),
        False, 0, 0, 1000,
    )
    assert ov == []


def test_four_colinear_anchors_one_overlap():
    # anchors too far apart (>=150) never chain
    ov = get_overlaps(
        _anchors(
            [(1, 2, 100, 1000), (1, 2, 2000, 11000), (1, 2, 3000, 12000), (1, 2, 4000, 13000)]
        ),
        False, 0, 0, 1000,
    )
    assert ov == []


def test_four_anchors_last_not_in_overlap():
    ov = get_overlaps(
        _anchors([(1, 2, 100, 1000), (1, 2, 200, 1100), (1, 2, 300, 1200), (1, 2, 2400, 3300)]),
        False, 0, 0, 1000,
    )
    assert len(ov) == 1
    o = ov[0]
    assert (o.query_start_position_in_read, o.query_end_position_in_read) == (100, 300)
    assert (o.target_start_position_in_read, o.target_end_position_in_read) == (1000, 1200)


def test_reverse_strand():
    ov = get_overlaps(
        _anchors([(1, 2, 100, 1300), (1, 2, 200, 1200), (1, 2, 300, 1100), (1, 2, 400, 1000)]),
        False, 0, 0, 1000,
    )
    assert len(ov) == 1
    o = ov[0]
    assert o.relative_strand == "-"
    assert o.target_end_position_in_read > o.target_start_position_in_read
    assert (o.target_start_position_in_read, o.target_end_position_in_read) == (1000, 1300)


def test_self_mapping_filtered_in_all_to_all():
    rows = [(1, 1, 100, 100), (1, 1, 200, 200), (1, 1, 300, 300), (1, 1, 400, 400)]
    assert get_overlaps(_anchors(rows), True, 0, 0, 1000) == []
    assert len(get_overlaps(_anchors(rows), False, 0, 0, 1000)) == 1


def test_min_residues_filter():
    rows = [(1, 2, 100, 1000), (1, 2, 200, 1100), (1, 2, 300, 1200)]
    assert len(get_overlaps(_anchors(rows), False, 3, 0, 1000)) == 1
    assert get_overlaps(_anchors(rows), False, 4, 0, 1000) == []


def test_post_processing_fuses_adjacent():
    # two overlaps with a short gap (< 500) on both query and target: fused
    # copy appended (overlapper.cpp:136-236)
    o1 = Overlap(1, 2, 100, 400, 1000, 1300, "+", 4)
    o2 = Overlap(1, 2, 500, 800, 1400, 1700, "+", 4)
    out = post_process_overlaps([o1, o2])
    assert len(out) == 3
    fused = out[2]
    assert (fused.query_start_position_in_read, fused.query_end_position_in_read) == (100, 800)
    assert (fused.target_start_position_in_read, fused.target_end_position_in_read) == (1000, 1700)
    assert fused.num_residues == 8

    # drop_fused_overlaps removes the constituents
    out2 = post_process_overlaps([o1, o2], drop_fused_overlaps=True)
    assert len(out2) == 1
    assert out2[0].num_residues == 8


def test_post_processing_reverse_fusion():
    # reverse-strand fusion: target coordinates decrease along the query
    o1 = Overlap(1, 2, 100, 400, 1400, 1700, "-", 4)
    o2 = Overlap(1, 2, 500, 800, 1000, 1300, "-", 4)
    out = post_process_overlaps([o1, o2])
    assert len(out) == 3
    fused = out[2]
    assert (fused.query_start_position_in_read, fused.query_end_position_in_read) == (100, 800)
    assert (fused.target_start_position_in_read, fused.target_end_position_in_read) == (1000, 1700)


def test_post_processing_not_fusable():
    o1 = Overlap(1, 2, 100, 400, 1000, 1300, "+", 4)
    o2 = Overlap(1, 3, 500, 800, 1400, 1700, "+", 4)  # different target
    out = post_process_overlaps([o1, o2])
    assert len(out) == 2
