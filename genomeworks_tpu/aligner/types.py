"""Alignment result types.

Reference: cudaaligner/include/.../cudaaligner.hpp:50-65 (AlignmentState,
CigarFormat), alignment.hpp:55 (Alignment interface),
src/alignment_impl.cpp (CIGAR conversion, edit distance, formatting).

State encoding (kept identical to the reference enum):
  0 = match, 1 = mismatch,
  2 = insertion (absent in query, present in target -> consumes target, 'I'),
  3 = deletion  (present in query, absent in target -> consumes query,  'D').
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum

import numpy as np


class AlignmentState(IntEnum):
    match = 0
    mismatch = 1
    insertion = 2  # absent in query, present in target
    deletion = 3  # present in query, absent in target


class CigarFormat(IntEnum):
    basic = 0  # M, I, D
    extended = 1  # =, X, I, D


class StatusType(IntEnum):
    success = 0
    uninitialized = 1
    exceeded_max_alignments = 2
    exceeded_max_length = 3
    exceeded_max_alignment_difference = 4
    generic_error = 5


_BASIC_CHARS = {0: "M", 1: "M", 2: "I", 3: "D"}
_EXTENDED_CHARS = {0: "=", 1: "X", 2: "I", 3: "D"}


def states_to_cigar(states: np.ndarray, fmt: CigarFormat = CigarFormat.basic) -> str:
    """Run-length encode alignment states into a CIGAR string
    (reference: alignment_impl.cpp convert_to_cigar)."""
    chars = _BASIC_CHARS if fmt == CigarFormat.basic else _EXTENDED_CHARS
    states = np.asarray(states, dtype=np.int8)
    if states.size == 0:
        return ""
    symbols = np.array([chars[int(s)] for s in states])
    # RLE boundaries
    change = np.nonzero(symbols[1:] != symbols[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(symbols)]))
    return "".join(f"{e - s}{symbols[s]}" for s, e in zip(starts, ends))


@dataclasses.dataclass
class Alignment:
    """One pairwise global alignment result (reference: alignment.hpp:55)."""

    query: str
    target: str
    states: np.ndarray  # forward-order AlignmentState codes
    status: StatusType = StatusType.success
    is_optimal: bool = True

    def convert_to_cigar(self, fmt: CigarFormat = CigarFormat.basic) -> str:
        return states_to_cigar(self.states, fmt)

    def get_alignment(self) -> np.ndarray:
        return self.states

    def get_edit_distance(self) -> int:
        """Number of non-match states (alignment_impl.cpp:218-233)."""
        return int(np.count_nonzero(self.states != AlignmentState.match))

    def format_alignment(self) -> tuple[str, str, str]:
        """Pretty-print triple (query_row, pairing_row, target_row)
        (reference: alignment_impl.cpp format_alignment)."""
        q_row, pair, t_row = [], [], []
        qi = ti = 0
        for s in self.states:
            if s == AlignmentState.match:
                q_row.append(self.query[qi]); qi += 1
                t_row.append(self.target[ti]); ti += 1
                pair.append("|")
            elif s == AlignmentState.mismatch:
                q_row.append(self.query[qi]); qi += 1
                t_row.append(self.target[ti]); ti += 1
                pair.append("x")
            elif s == AlignmentState.deletion:
                q_row.append(self.query[qi]); qi += 1
                t_row.append("-")
                pair.append(" ")
            else:  # insertion
                q_row.append("-")
                t_row.append(self.target[ti]); ti += 1
                pair.append(" ")
        return "".join(q_row), "".join(pair), "".join(t_row)
