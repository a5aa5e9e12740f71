"""CPU/NumPy reference implementation of global edit-distance alignment.

Golden oracle for the TPU kernels, re-implementing the semantics of the
reference's own CPU oracles:
- score matrix: cudaaligner/src/needleman_wunsch_cpu.cpp
  needleman_wunsch_build_score_matrix_naive (unit-cost edit distance;
  rows = query+1, cols = target+1)
- backtrace: needleman_wunsch_backtrace_old / myers_gpu.cu:257-316
  (tie-break priority: left/insertion, then above/deletion, then diagonal).
"""

from __future__ import annotations

import numpy as np

from genomeworks_tpu.aligner.types import AlignmentState


def nw_score_matrix(query: str, target: str) -> np.ndarray:
    """Full unit-cost NW (edit distance) matrix, shape (len(q)+1, len(t)+1)."""
    q = np.frombuffer(query.encode(), dtype=np.uint8)
    t = np.frombuffer(target.encode(), dtype=np.uint8)
    m, n = len(q), len(t)
    scores = np.zeros((m + 1, n + 1), dtype=np.int32)
    scores[:, 0] = np.arange(m + 1)
    scores[0, :] = np.arange(n + 1)
    sub = (q[:, None] != t[None, :]).astype(np.int32)
    for i in range(1, m + 1):
        # vectorized over j except the left-dependency; do the classic
        # row-wise loop (oracle code, clarity over speed)
        row = scores[i]
        prev = scores[i - 1]
        row[1:] = np.minimum(prev[1:] + 1, prev[:-1] + sub[i - 1])
        for j in range(1, n + 1):
            if row[j - 1] + 1 < row[j]:
                row[j] = row[j - 1] + 1
    return scores


def nw_backtrace(scores: np.ndarray) -> np.ndarray:
    """Backtrace with the reference's exact tie-break priority
    (needleman_wunsch_cpu.cpp:74-113): insertion(left) > deletion(above) >
    diagonal(match/mismatch). Returns forward-order AlignmentState codes."""
    i = scores.shape[0] - 1
    j = scores.shape[1] - 1
    path = []
    myscore = scores[i, j]
    while i > 0 and j > 0:
        above = scores[i - 1, j]
        diag = scores[i - 1, j - 1]
        left = scores[i, j - 1]
        if left + 1 == myscore:
            path.append(AlignmentState.insertion)
            myscore = left
            j -= 1
        elif above + 1 == myscore:
            path.append(AlignmentState.deletion)
            myscore = above
            i -= 1
        else:
            path.append(
                AlignmentState.match if diag == myscore else AlignmentState.mismatch
            )
            myscore = diag
            i -= 1
            j -= 1
    path.extend([AlignmentState.deletion] * i)
    path.extend([AlignmentState.insertion] * j)
    return np.array(path[::-1], dtype=np.int8)


def align_cpu(query: str, target: str) -> np.ndarray:
    """Optimal global alignment path (forward order), reference semantics."""
    return nw_backtrace(nw_score_matrix(query, target))


def edit_distance_cpu(query: str, target: str) -> int:
    return int(nw_score_matrix(query, target)[-1, -1])
