"""Sample: ungapped X-drop seed extension with golden-data round trip.

Reference analogue: cudaextender/samples/sample_cudaextender.cpp
(FASTA + seed-pair CSV -> extend -> scored segment pairs).
"""

from genomeworks_tpu.extender import create_extender, encode_sequence, parse_seed_pairs
from genomeworks_tpu.io import create_fasta_parser

DATA = "/root/reference/cudaextender/data"

target = create_fasta_parser(f"{DATA}/sample.fa").get_sequence_by_id(0).seq
query = target  # the sample extends the genome against itself

seeds = parse_seed_pairs(f"{DATA}/sample_seed_pairs.csv")
extender = create_extender()
extender.extend_async(encode_sequence(query), encode_sequence(target), 3000, seeds)
extender.sync()
ssps = extender.get_scored_segment_pairs()
for s in ssps[:10]:
    print(s)
print(f"{len(ssps)} scored segment pairs")
