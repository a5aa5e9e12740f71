"""Sample: POA consensus + MSA through the Batch API.

Reference analogue: cudapoa/samples/sample_cudapoa.cpp (windows ->
create_batch -> add_poa_group -> generate_poa -> get_consensus).
"""

from genomeworks_tpu.poa import BatchConfig, OutputType, PoaBatch, StatusType

windows = [
    ["ACGTACGTAA", "ACGCACGTAA", "ACGTACGTA", "ACGTTACGTAA"],
    ["TTGGCCAA", "TTGGCCAA", "TTGACCAA"],
]

batch = PoaBatch(
    BatchConfig(max_sequence_size=1024),
    output_mask=OutputType.consensus | OutputType.msa,
)
for w in windows:
    status, per_seq = batch.add_poa_group(w)
    assert status == StatusType.success, status

batch.generate_poa()

consensus, coverage, status = batch.get_consensus()
for i, (c, cov) in enumerate(zip(consensus, coverage)):
    print(f"window {i} consensus: {c}  coverage: {[int(x) for x in cov]}")

msa, mstatus = batch.get_msa()
for i, rows in enumerate(msa):
    print(f"window {i} MSA:")
    for r in rows:
        print(f"  {r}")
