"""Minimizer-based all-vs-all read overlapping (reference: cudamapper).

Pipeline: minimizer sketch (TPU kernel) -> sorted index -> anchor matching
-> chaining into overlaps -> host post-processing -> PAF/SAM output.
"""

from genomeworks_tpu.mapper.minimizers import compute_sketch, wang_hash32
from genomeworks_tpu.mapper.index import Index, build_index
from genomeworks_tpu.mapper.matcher import Anchors, generate_anchors
from genomeworks_tpu.mapper.overlapper import Overlap, get_overlaps, post_process_overlaps
from genomeworks_tpu.mapper.pipeline import (
    MapperParams,
    map_reads,
    align_overlaps,
    overlaps_to_paf,
    group_reads_into_index_ranges,
)
