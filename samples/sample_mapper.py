"""Sample: all-vs-all overlap mapping to PAF.

Reference analogue: cudamapper/samples/sample_cudamapper.cpp
(index -> matcher -> overlapper -> PAF).
"""

import sys

from genomeworks_tpu.io import create_fasta_parser
from genomeworks_tpu.mapper import MapperParams, map_reads, overlaps_to_paf

fasta = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/cudamapper/data/covid-reads.fasta.gz"

parser = create_fasta_parser(fasta, min_sequence_length=24)
# the reference sample's parameters: k=15, w=5
params = MapperParams(kmer_size=15, window_size=5)
overlaps = map_reads(parser, parser, params, all_to_all=True)
for line in overlaps_to_paf(overlaps, parser, parser, params.kmer_size):
    print(line)
print(f"{len(overlaps)} overlaps", file=sys.stderr)
