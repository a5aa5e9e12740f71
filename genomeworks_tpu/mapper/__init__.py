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
from genomeworks_tpu.mapper.batcher import (
    IndexDescriptor,
    IndexBatch,
    BatchOfIndices,
    group_reads_into_indices,
    group_into_batches,
    generate_batches_of_indices,
)
from genomeworks_tpu.mapper.overlapper import (
    filter_overlaps,
    rescue_overlap_ends,
)
from genomeworks_tpu.mapper.kmers import (
    split_into_kmers,
    sequence_jaccard_similarity,
)
