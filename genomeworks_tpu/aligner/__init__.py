"""Batched banded pairwise global alignment with CIGARs.

Reference: GenomeWorks ``cudaaligner`` (Myers bit-vector / banded / Ukkonen
global aligners). TPU design: fixed-shape length buckets + a banded
wavefront DP (``lax.scan`` rows, prefix-min closure for in-row gaps) with
reference-exact traceback tie-breaking.
"""

from genomeworks_tpu.aligner.types import (
    Alignment,
    AlignmentState,
    CigarFormat,
    StatusType,
    states_to_cigar,
)
from genomeworks_tpu.aligner.aligner import (
    Aligner,
    FixedBandAligner,
    create_aligner,
)
from genomeworks_tpu.aligner.banded_nw import banded_nw_forward, band_offset
from genomeworks_tpu.aligner.cpu_reference import (
    align_cpu,
    edit_distance_cpu,
    nw_score_matrix,
    nw_backtrace,
)
from genomeworks_tpu.aligner.myers import (
    myers_edit_distance_cpu,
    myers_edit_distance_batched,
)
from genomeworks_tpu.aligner.ukkonen import ukkonen_cpu, ukkonen_edit_distance_cpu
from genomeworks_tpu.aligner.aligner import DeviceAlignments
