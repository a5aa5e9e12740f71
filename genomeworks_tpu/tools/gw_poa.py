"""gw-poa — consensus / MSA generation from POA windows.

TPU-native counterpart of the `cudapoa` application
(cudapoa/src/main.cpp + application_parameters.cpp): reads windows from
cudapoa-format text files or FASTA files, bins them into batches by
length, runs batched POA per bin, and prints consensus (default) or MSA
rows to stdout. Optional DOT/GFA graph output per window.
"""

from __future__ import annotations

import argparse
import sys

from genomeworks_tpu.poa.batch import (
    BandMode,
    BatchConfig,
    OutputType,
    PoaBatch,
    StatusType,
    decode_error,
)
from genomeworks_tpu.poa.windows import (
    get_multi_batch_sizes,
    parse_cudapoa_file,
    parse_fasta_files,
)


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gw-poa",
        description="consensus/MSA from POA windows (reference: cudapoa tool)",
    )
    p.add_argument(
        "-i", "--input", action="append", required=True,
        help="input file (cudapoa windows .txt, or FASTA; repeatable)",
    )
    p.add_argument("-a", "--msa", action="store_true", help="output MSA instead of consensus")
    p.add_argument(
        "-b", "--band-mode", type=int, default=int(BandMode.adaptive_band),
        choices=range(5),
        help="0 full, 1 static, 2 adaptive, 3/4 static/adaptive with traceback",
    )
    p.add_argument("-w", "--band-width", type=int, default=256)
    p.add_argument("-s", "--adaptive-storage", type=float, default=2.0)
    p.add_argument("-l", "--graph-length", type=float, default=3.0)
    p.add_argument("-D", "--pred-distance", type=int, default=0)
    p.add_argument("-d", "--graph-output", default="", help="write POA graphs as DOT")
    p.add_argument("-G", "--gfa-output", default="", help="write POA graphs as GFA")
    p.add_argument("-M", "--max-groups", type=int, default=-1, help="process at most N windows")
    p.add_argument("-m", "--match", type=int, default=8)
    p.add_argument("-n", "--mismatch", type=int, default=-6)
    p.add_argument("-g", "--gap", type=int, default=-8)
    p.add_argument(
        "--strict-banded", action="store_true",
        help="run banded modes with exact cudapoa banded-NW semantics "
        "(host path) instead of treating them as a performance hint for "
        "the full-band TPU kernel",
    )
    return p


def load_windows(input_paths: list[str], max_groups: int) -> list[list[str]]:
    fasta_exts = (".fa", ".fasta", ".fa.gz", ".fasta.gz", ".fq", ".fastq", ".fastq.gz")
    if all(p.endswith(fasta_exts) for p in input_paths):
        return parse_fasta_files(input_paths, max_groups)
    windows: list[list[str]] = []
    for p in input_paths:
        windows.extend(parse_cudapoa_file(p, -1))
    if max_groups >= 0:
        windows = windows[:max_groups]
    return windows


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    try:
        windows = load_windows(args.input, args.max_groups)
    except OSError as e:
        print(f"gw-poa: cannot read input: {e}", file=sys.stderr)
        return 1
    if not windows:
        print("no windows parsed", file=sys.stderr)
        return 1

    output_mask = OutputType.msa if args.msa else OutputType.consensus
    want_graphs = bool(args.graph_output or args.gfa_output)

    configs, groups_per_config = get_multi_batch_sizes(
        windows,
        msa_flag=args.msa,
        band_width=args.band_width,
        band_mode=BandMode(args.band_mode),
        adaptive_storage_factor=args.adaptive_storage,
        graph_length_factor=args.graph_length,
        max_pred_distance=args.pred_distance,
    )

    results: dict[int, list[str]] = {}
    graph_chunks: dict[int, str] = {}
    for cfg, wids in zip(configs, groups_per_config):
        batch = PoaBatch(
            cfg, output_mask,
            gap_score=args.gap, mismatch_score=args.mismatch,
            match_score=args.match, strict_banded=args.strict_banded,
        )
        for wid in wids:
            status, _ = batch.add_poa_group(windows[wid])
            if status != StatusType.success:
                msg, hint = decode_error(status)
                print(f"window {wid}: {msg} {hint}", file=sys.stderr)
        batch.generate_poa()
        if args.msa:
            msa, st = batch.get_msa()
            for wid, rows, s in zip(wids, msa, st):
                if s != StatusType.success:
                    msg, hint = decode_error(s)
                    print(f"Error generating MSA for POA group {wid}", file=sys.stderr)
                    print(f"{msg}\n{hint}", file=sys.stderr)
                    results[wid] = []
                else:
                    results[wid] = rows
        else:
            cons, _, st = batch.get_consensus()
            for wid, c, s in zip(wids, cons, st):
                if s != StatusType.success:
                    msg, hint = decode_error(s)
                    print(
                        f"Error generating consensus for POA group {wid}",
                        file=sys.stderr,
                    )
                    print(f"{msg}\n{hint}", file=sys.stderr)
                    results[wid] = []
                else:
                    results[wid] = [c]
        if want_graphs:
            graphs, gst = batch.get_graphs()
            for wid, g, s in zip(wids, graphs, gst):
                if s == StatusType.success:
                    graph_chunks[wid] = (
                        g.serialize_to_gfa() if args.gfa_output else g.serialize_to_dot()
                    )

    for wid in range(len(windows)):
        for line in results.get(wid, []):
            print(line)

    if want_graphs:
        path = args.gfa_output or args.graph_output
        with open(path, "w") as f:
            for wid in range(len(windows)):
                if wid in graph_chunks:
                    f.write(graph_chunks[wid])
                    f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
