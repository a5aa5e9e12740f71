"""Batched partial-order alignment: consensus + MSA (reference: cudapoa)."""

from genomeworks_tpu.poa.cpu_reference import (
    poa_consensus,
    PoaGraph,
    PoaError,
    build_backbone,
    nw_align,
    add_alignment,
    topological_sort,
    generate_consensus,
)
