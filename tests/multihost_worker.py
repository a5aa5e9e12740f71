"""Worker for the 2-process jax.distributed multihost mapping test.

Run (per process):
    python multihost_worker.py <pid> <nproc> <port> <fasta> <out_prefix>

Each process initializes the distributed runtime (CPU backend), maps its
round-robin share of index-range pairs through map_reads_multihost, and
writes the MERGED result plus its own work stats. Every process holds the
identical merged overlap list after the DCN allgather, so outputs must be
byte-identical across processes AND equal to a single-process run.
"""

import sys
import time

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
fasta, out_prefix = sys.argv[4], sys.argv[5]

from genomeworks_tpu.io.fasta import create_fasta_parser
from genomeworks_tpu.mapper.pipeline import MapperParams
from genomeworks_tpu.parallel.multihost import (
    initialize_distributed,
    map_reads_multihost,
)

if nproc > 1:
    assert initialize_distributed(f"localhost:{port}", nproc, pid)

parser = create_fasta_parser(fasta)
# tiny per-range budget so the round-robin actually splits the work
params = MapperParams(index_size_mb=0.01, target_index_size_mb=0.01,
                      filtering_parameter=1.0)

t0 = time.perf_counter()
overlaps = map_reads_multihost(parser, parser, params)
wall = time.perf_counter() - t0

with open(f"{out_prefix}.p{pid}.txt", "w") as f:
    for o in overlaps:
        f.write(
            f"{o.query_read_id}\t{o.target_read_id}\t"
            f"{o.query_start_position_in_read}\t{o.query_end_position_in_read}\t"
            f"{o.target_start_position_in_read}\t{o.target_end_position_in_read}\t"
            f"{o.relative_strand}\t{o.num_residues}\n"
        )
print(f"WALL {wall:.3f} OVERLAPS {len(overlaps)}")
