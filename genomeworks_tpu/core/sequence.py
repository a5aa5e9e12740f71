"""Sequence encoding utilities (host side, NumPy).

Reference semantics: GenomeWorks packs bases with A=0, C=1, G=2, T=3 via the
ASCII trick ``0b11 & (bp >> 2 ^ bp >> 1)`` (cudamapper/src/minimizer.cu:197)
and complements via 3 - code (A<->T, C<->G, minimizer.cu:159-166).
"""

from __future__ import annotations

import numpy as np

# 256-entry LUT: ASCII byte -> 2-bit code; non-ACGT map like the reference's
# ASCII formula (we additionally accept lowercase).
_LUT = np.zeros(256, dtype=np.uint8)
for _i in range(256):
    _LUT[_i] = 0b11 & ((_i >> 2) ^ (_i >> 1))

BASE_TO_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}
CODE_TO_BASE = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode_bases(seq: str | bytes) -> np.ndarray:
    """Encode an ASCII sequence into 2-bit codes (uint8 array)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _LUT[raw]


def decode_bases(codes: np.ndarray) -> str:
    """Decode 2-bit codes back to an ACGT string."""
    return CODE_TO_BASE[np.asarray(codes, dtype=np.uint8) & 3].tobytes().decode("ascii")


def complement_codes(codes: np.ndarray) -> np.ndarray:
    """Complement in code space: A<->T, C<->G (i.e. 3 - code)."""
    return (3 - codes.astype(np.int32)).astype(codes.dtype)


def reverse_complement(seq: str) -> str:
    """Reverse complement of an ACGT string.

    Reference: common/base/include/.../utils/genomeutils.hpp:144.
    """
    codes = encode_bases(seq)
    return decode_bases(complement_codes(codes)[::-1])


def pack_reads(
    seqs: list[str] | list[bytes],
    max_len: int | None = None,
    pad_code: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length reads into a fixed-shape (n, max_len) uint8 code
    matrix plus a length vector. The TPU-native replacement for the
    reference's merged-basepair device buffer (index_gpu.cuh:873-890).
    """
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    if max_len is None:
        max_len = int(lengths.max()) if len(seqs) else 0
    out = np.full((len(seqs), max_len), pad_code, dtype=np.uint8)
    for i, s in enumerate(seqs):
        codes = encode_bases(s)
        out[i, : len(codes)] = codes[:max_len]
    return out, lengths
