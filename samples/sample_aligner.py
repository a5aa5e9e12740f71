"""Sample: batched pairwise global alignment with CIGARs.

Reference analogue: cudaaligner/samples/sample_cudaaligner.cpp
(create_aligner -> add_alignment -> align_all -> print alignments).
"""

from genomeworks_tpu.aligner import CigarFormat, create_aligner

pairs = [
    ("AAAAAAAAA", "AAATAAAAA"),
    ("ACGTACGTACGT", "ACGTACTTACGGT"),
    ("GATTACA", "GATCA"),
]

aligner = create_aligner(max_bandwidth=256)
for query, target in pairs:
    aligner.add_alignment(query, target)
aligner.align_all()

for (query, target), aln in zip(pairs, aligner.get_alignments()):
    print(f"{query} x {target}")
    print(f"  cigar: {aln.convert_to_cigar()}  "
          f"extended: {aln.convert_to_cigar(CigarFormat.extended)}  "
          f"edit distance: {aln.get_edit_distance()}")
    q_row, pairing, t_row = aln.format_alignment()
    print(f"  {q_row}\n  {pairing}\n  {t_row}")
