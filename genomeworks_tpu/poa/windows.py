"""Window-file parsing and batch binning for POA.

Mirrors cudapoa/include/.../utils.hpp: parse_cudapoa_file (:117),
parse_fasta_files (:152), resize_windows (:78), parse_golden_value_file,
and get_multi_batch_sizes (:55, impl src/utils.cu) — the reference's
length-binning that groups windows into per-BatchConfig bins so short
windows aren't padded to the longest window in the run.
"""

from __future__ import annotations

from genomeworks_tpu.io.fasta import create_fasta_parser
from genomeworks_tpu.poa.batch import BandMode, BatchConfig


def resize_windows(windows: list[list[str]], total_windows: int) -> list[list[str]]:
    """utils.hpp:78 — truncate, or cyclically repeat windows to reach
    total_windows. total_windows < 0 leaves windows untouched."""
    if total_windows < 0:
        return windows
    if len(windows) > total_windows:
        return windows[:total_windows]
    windows_read = len(windows)
    if windows_read == 0:
        raise ValueError("cannot resize an empty window list")
    while len(windows) != total_windows:
        windows.append(windows[len(windows) - windows_read])
    return windows


def parse_cudapoa_file(filename: str, total_windows: int = -1) -> list[list[str]]:
    """utils.hpp:117 — '<num_seqs>\\n seq...' window format."""
    windows: list[list[str]] = []
    num_sequences = 0
    with open(filename) as f:
        for line in f:
            line = line.rstrip("\n")
            if num_sequences == 0:
                num_sequences = int(line.split()[0])
                windows.append([])
            else:
                windows[-1].append(line)
                num_sequences -= 1
    return resize_windows(windows, total_windows)


def parse_fasta_files(
    input_paths: list[str], total_windows: int = -1
) -> list[list[str]]:
    """utils.hpp:152 — one window per FASTA record index across files
    (window i = i-th read of every input file)."""
    parsers = [create_fasta_parser(p) for p in input_paths]
    counts = [p.get_num_seqences() for p in parsers]
    windows = [
        [str(p.get_sequence_by_id(i).seq) for p in parsers if i < p.get_num_seqences()]
        for i in range(max(counts))
    ]
    return resize_windows(windows, total_windows)


def parse_golden_value_file(filename: str) -> str:
    """cudapoa/include/.../utils.hpp parse_golden_value_file — single-line
    golden assembly string."""
    with open(filename) as f:
        return f.readline().rstrip("\n")


def get_multi_batch_sizes(
    windows: list[list[str]],
    msa_flag: bool = False,
    band_width: int = 256,
    band_mode: BandMode = BandMode.adaptive_band,
    adaptive_storage_factor: float = 2.0,
    graph_length_factor: float = 3.0,
    max_pred_distance: int = 0,
    bins_capacity: list[int] | None = None,
) -> tuple[list[BatchConfig], list[list[int]]]:
    """utils.hpp:55 / src/utils.cu — bin windows by their longest sequence
    so each bin gets a BatchConfig sized to it. Default bins are the
    reference's 9 powers-of-two-ish capacities. Returns (configs,
    window-id lists per config), dropping empty bins."""
    if bins_capacity is None:
        bins_capacity = [35, 64, 128, 256, 512, 1024, 2048, 4096, 8192]
    bins: list[list[int]] = [[] for _ in bins_capacity]
    for wid, w in enumerate(windows):
        longest = max(len(s) for s in w)
        for i, cap in enumerate(bins_capacity):
            if longest <= cap or i == len(bins_capacity) - 1:
                bins[i].append(wid)
                break
    configs: list[BatchConfig] = []
    groups: list[list[int]] = []
    for cap, members in zip(bins_capacity, bins):
        if not members:
            continue
        configs.append(
            BatchConfig(
                max_sequence_size=cap,
                max_sequences_per_poa=max(len(windows[w]) for w in members),
                band_width=min(band_width, cap),
                band_mode=band_mode,
                adaptive_storage_factor=adaptive_storage_factor,
                graph_length_factor=graph_length_factor,
                max_pred_distance=max_pred_distance,
            )
        )
        groups.append(members)
    return configs, groups
