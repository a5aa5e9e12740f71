"""Genome/read simulators (reference: pygenomeworks/genomeworks/simulators)."""

from genomeworks_tpu.simulators.genomesim import (
    generate_random_genome,
    mutate_sequence,
    PoissonGenomeSimulator,
    MarkovGenomeSimulator,
)
