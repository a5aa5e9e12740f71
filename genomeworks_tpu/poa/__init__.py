"""Batched partial-order alignment: consensus + MSA (reference: cudapoa)."""

from genomeworks_tpu.poa.cpu_reference import (
    poa_consensus,
    poa_msa,
    PoaGraph,
    PoaError,
    build_backbone,
    nw_align,
    add_alignment,
    topological_sort,
    racon_topological_sort,
    generate_consensus,
    generate_msa,
)
from genomeworks_tpu.poa.jax_poa import poa_batch_consensus, poa_batch_msa
from genomeworks_tpu.poa.batch import (
    BandMode,
    BatchConfig,
    OutputType,
    PoaBatch,
    StatusType,
    create_batch,
    decode_error,
)
from genomeworks_tpu.poa.windows import (
    get_multi_batch_sizes,
    parse_cudapoa_file,
    parse_fasta_files,
    parse_golden_value_file,
    resize_windows,
)
