"""Length bucketing — the TPU-native replacement for the reference's dynamic
memory planning (cudapoa allocate_block.hpp BatchBlock / get_multi_batch_sizes,
cudapoa/include/.../utils.hpp:55).

XLA compiles one program per shape, so instead of sizing device buffers to
free memory at runtime we pad problems into a small set of static shape
buckets; each bucket compiles once and is reused.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence


def pad_to_multiple(n: int, m: int) -> int:
    """Round n up to a multiple of m (reference: mathutils.hpp
    roundup_next_multiple)."""
    return ((n + m - 1) // m) * m


def next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


@dataclasses.dataclass(frozen=True)
class Bucket:
    """A static-shape bucket: item indices + the padded size they share."""

    indices: tuple[int, ...]
    padded_length: int


def bucket_by_length(
    lengths: Sequence[int],
    min_bucket: int = 128,
    growth: int = 2,
    max_items_per_bucket: int | None = None,
) -> list[Bucket]:
    """Group item indices into power-of-`growth` length buckets.

    Items are sorted by length inside each bucket (the load-balance move that
    replaces the reference's device-side scheduling atomic, myers_gpu.cu:66,
    and its deterministic input shuffle, kseqpp_fasta_parser.cpp:66-70).
    """
    by_bucket: dict[int, list[int]] = {}
    for i, ln in enumerate(lengths):
        b = min_bucket
        while b < ln:
            b *= growth
        by_bucket.setdefault(b, []).append(i)
    buckets: list[Bucket] = []
    for b in sorted(by_bucket):
        idxs = sorted(by_bucket[b], key=lambda i: lengths[i])
        if max_items_per_bucket is None:
            buckets.append(Bucket(tuple(idxs), b))
        else:
            for s in range(0, len(idxs), max_items_per_bucket):
                buckets.append(Bucket(tuple(idxs[s : s + max_items_per_bucket]), b))
    return buckets
