"""Generate the committed large-scale POA golden workload.

Reference analogue: Test_CudapoaBatchEnd2End.cu runs 5500 real windows
(cudapoa/data sample-windows.txt, absent from this checkout — git-lfs) and
asserts the assembled consensus equals sample-golden-value.txt. This
script builds an equivalent-scale workload from the bundled covid reads:

  map covid all-vs-all (host pipeline, F=0.001) → racon-style windows
  (each read chopped into fixed segments; overlapping partner fragments
  cut by linear interpolation of overlap coordinates) → CPU-reference
  consensus per window (the bit-parity oracle) → committed files:

  tests/data/poa_windows_covid.txt.gz   (cudapoa '<n>\\nseq...' format)
  tests/data/poa_golden_covid.txt       (one consensus line per window)

Deterministic end to end. Run from the repo root:
  GW_TEST_CPU=1 python experiments/make_poa_golden.py
"""

import gzip
import multiprocessing as mp
import os
import sys

SEG_LEN = 150
MAX_SEQS = 16
MIN_SEQS = 2
MAX_WINDOW_LEN = 320  # drop pathological fragments (indel pileups)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_windows():
    from genomeworks_tpu.io.fasta import create_fasta_parser
    from genomeworks_tpu.mapper.pipeline import MapperParams, map_reads

    parser = create_fasta_parser(
        "/root/reference/cudamapper/data/covid-reads.fasta.gz"
    )
    params = MapperParams(filtering_parameter=0.001, device_pipeline=False)
    overlaps = map_reads(parser, parser, params, all_to_all=True)
    print(f"overlaps: {len(overlaps)}", flush=True)

    reads = [parser.get_sequence_by_id(i).seq for i in range(len(parser))]
    # windows[rid][seg] = [fragments]; backbone segment is prepended later
    nseg = [max(1, len(r) // SEG_LEN) for r in reads]
    frags = [[[] for _ in range(s)] for s in nseg]

    def add(rid, r_start, r_end, p_seq, p_start, p_end, rev):
        """Cut partner fragment [p_start,p_end) of p_seq onto backbone
        rid's segments covering [r_start, r_end)."""
        if r_end <= r_start or p_end <= p_start:
            return
        p = p_seq[p_start:p_end]
        if rev:
            from genomeworks_tpu.core.sequence import reverse_complement

            p = reverse_complement(p)
        span = r_end - r_start
        for seg in range(r_start // SEG_LEN, min((r_end - 1) // SEG_LEN + 1, nseg[rid])):
            s0 = max(seg * SEG_LEN, r_start)
            s1 = min((seg + 1) * SEG_LEN, r_end)
            if seg == nseg[rid] - 1:
                s1 = min(r_end, len(reads[rid]))
            if s1 <= s0:
                continue
            f0 = (s0 - r_start) * len(p) // span
            f1 = (s1 - r_start) * len(p) // span
            if f1 - f0 >= 20:
                frags[rid][seg].append(p[f0:f1])

    for o in overlaps:
        q, t = o.query_read_id, o.target_read_id
        rev = o.relative_strand == "-"
        add(
            q, o.query_start_position_in_read, o.query_end_position_in_read,
            reads[t], o.target_start_position_in_read,
            o.target_end_position_in_read, rev,
        )
        add(
            t, o.target_start_position_in_read, o.target_end_position_in_read,
            reads[q], o.query_start_position_in_read,
            o.query_end_position_in_read, rev,
        )

    windows = []
    for rid in range(len(reads)):
        for seg in range(nseg[rid]):
            s0 = seg * SEG_LEN
            s1 = len(reads[rid]) if seg == nseg[rid] - 1 else (seg + 1) * SEG_LEN
            backbone = reads[rid][s0:s1]
            fr = [f for f in frags[rid][seg] if len(f) <= MAX_WINDOW_LEN]
            if len(fr) + 1 < MIN_SEQS or len(backbone) < 20:
                continue
            windows.append([backbone] + fr[: MAX_SEQS - 1])
    print(f"windows: {len(windows)}", flush=True)
    return windows


def _consensus(window):
    from genomeworks_tpu.poa.cpu_reference import poa_consensus

    cons, _cov = poa_consensus(window)
    return cons


def main():
    data_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data",
    )
    os.makedirs(data_dir, exist_ok=True)
    windows_path = os.path.join(data_dir, "poa_windows_covid.txt.gz")
    golden_path = os.path.join(data_dir, "poa_golden_covid.txt")

    if os.path.exists(windows_path):
        from genomeworks_tpu.poa.windows import parse_cudapoa_file

        # gzip-transparent reparse for resume
        import tempfile

        with gzip.open(windows_path, "rt") as f, tempfile.NamedTemporaryFile(
            "w", suffix=".txt", delete=False
        ) as tmp:
            tmp.write(f.read())
        windows = parse_cudapoa_file(tmp.name)
        os.unlink(tmp.name)
        print(f"resume: {len(windows)} windows from {windows_path}", flush=True)
    else:
        windows = build_windows()
        with gzip.open(windows_path, "wt") as f:
            for w in windows:
                f.write(f"{len(w)}\n")
                for s in w:
                    f.write(s + "\n")

    done = 0
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            done = sum(1 for _ in f)
        print(f"resume: {done} goldens already written", flush=True)

    ncpu = os.cpu_count() or 1
    if ncpu > 1:
        ctx = mp.get_context("spawn")
        with ctx.Pool(min(16, ncpu)) as pool:
            consensuses = pool.map(_consensus, windows[done:], chunksize=16)
        with open(golden_path, "a") as f:
            for c in consensuses:
                f.write(c + "\n")
    else:
        # single-core container: sequential with append-resume
        with open(golden_path, "a") as f:
            for i, w in enumerate(windows[done:], start=done):
                f.write(_consensus(w) + "\n")
                if (i + 1) % 200 == 0:
                    f.flush()
                    print(f"golden {i + 1}/{len(windows)}", flush=True)
    print("written", len(windows), "windows; goldens complete", flush=True)


if __name__ == "__main__":
    main()
