"""Ungapped X-drop seed extension — TPU re-design of cudaextender
(cudaextender/src/ungapped_xdrop.cu, ungapped_xdrop_kernels.cu).

Semantics (bit parity with find_high_scoring_segment_pairs):
- per seed, extend right from (qpos, tpos) inclusive and left from
  (qpos-1, tpos-1), accumulating substitution scores along the diagonal;
- the running maximum prefers the EARLIEST position on ties (warp max-scan
  with shfl_up and >=, kernels.cu:200-216);
- extension stops at the first position where
  (running_max - cumulative) > xdrop_threshold, or when the current tile's
  last position crosses a sequence boundary; the reported extent is the
  position of the running maximum at the stop point;
- total score = right max + left max; if the total is within
  [score_threshold, 3*score_threshold] and entropy is enabled, an entropy
  factor over the matched A/C/G/T pairs inside the final segment rescales
  the score (kernels.cu:455-474; computed in float64 on host);
- SSPs below score_threshold are dropped; survivors are sorted by
  (diagonal, target_start, -length, -score) (scored_segment_pair_comp) and
  consecutive same-diagonal containments are deduplicated
  (scored_segment_pair_diagonal_overlap, thrust::unique_copy semantics).

The reference assigns one warp per seed with a device-wide work list; the
TPU formulation advances ALL seeds through 128-position chunks in lockstep
(lax.while_loop), each chunk being one batched gather + cumsum + masked
running-max — results are invariant to the chunk width (out-of-bounds
positions score 0 and the max never lands on them).

Sequence encoding: A=0 C=1 G=2 T=3 L(a/c/g/t)=4 N=5 X=6 E(&)=7
(cudaextender utils.hpp:36-48).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

NUC = 8
NUC2 = 64

#: scoring matrix used by the reference sample & end-to-end test
#: (samples/sample_cudaextender.cpp:102-110)
DEFAULT_SCORE_MATRIX = np.array(
    [
        [91, -114, -31, -123, -1000, -1000, -100, -9100],
        [-114, 100, -125, -31, -1000, -1000, -100, -9100],
        [-31, -125, 100, -114, -1000, -1000, -100, -9100],
        [-123, -31, -114, 91, -1000, -1000, -100, -9100],
        [-1000, -1000, -1000, -1000, -1000, -1000, -1000, -9100],
        [-1000, -1000, -1000, -1000, -1000, -1000, -1000, -9100],
        [-100, -100, -100, -100, -1000, -1000, -100, -9100],
        [-9100, -9100, -9100, -9100, -9100, -9100, -9100, -9100],
    ],
    dtype=np.int32,
)

_ENC = np.full(256, 6, dtype=np.int8)  # X_NT default
for _c, _v in [("A", 0), ("C", 1), ("G", 2), ("T", 3), ("&", 7), ("N", 5), ("n", 5)]:
    _ENC[ord(_c)] = _v
for _c in "acgt":
    _ENC[ord(_c)] = 4  # L_NT


def encode_sequence(seq: str | bytes) -> np.ndarray:
    """cudaextender 8-letter encoding (utils.hpp:108-146)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    return _ENC[np.frombuffer(seq, dtype=np.uint8)]


@dataclasses.dataclass
class ScoredSegmentPair:
    """reference: extender.hpp:45."""

    target_position_in_read: int
    query_position_in_read: int
    length: int
    score: int

    def astuple(self):
        return (
            self.target_position_in_read,
            self.query_position_in_read,
            self.length,
            self.score,
        )


_CHUNK = 128
_NEG = np.int32(-(1 << 30))


def _earliest_max_scan(vals, poss):
    """Running (max value, earliest position) along axis 1."""

    def combine(a, b):
        av, ap = a
        bv, bp = b
        take_b = bv > av  # ties keep the earlier (left) element
        return jnp.where(take_b, bv, av), jnp.where(take_b, bp, ap)

    return jax.lax.associative_scan(combine, (vals, poss), axis=1)


def _make_chunk_body(query, target, qpos, tpos, sub_flat, xdrop,
                     is_left: bool):
    """One 128-position lockstep step shared by the fixed phase-1 sweep
    and the compacted phase-2 while_loop."""
    Lq = query.shape[0]
    Lt = target.shape[0]
    offs0 = jnp.arange(_CHUNK, dtype=jnp.int32)

    def body(state):
        prev_score, prev_max, prev_max_pos, done, c = state
        base = c * _CHUNK
        if is_left:
            pos_offset = base + offs0[None, :] + 1  # 1-based leftward offset
            tp = tpos[:, None] - pos_offset
            qp = qpos[:, None] - pos_offset
            inb = (tp >= 0) & (qp >= 0)
        else:
            pos_offset = base + offs0[None, :]
            tp = tpos[:, None] + pos_offset
            qp = qpos[:, None] + pos_offset
            inb = (tp < Lt) & (qp < Lq)

        tch = target[jnp.clip(tp, 0, Lt - 1)]
        qch = query[jnp.clip(qp, 0, Lq - 1)]
        sc = jnp.where(inb, sub_flat[tch * NUC + qch], 0)
        cum = prev_score[:, None] + jnp.cumsum(sc, axis=1)

        pos_b = jnp.broadcast_to(pos_offset, cum.shape).astype(jnp.int32)
        mc, pc = _earliest_max_scan(cum, pos_b)
        # carried previous max wins ties (thread takes own only if >)
        better = mc > prev_max[:, None]
        rm = jnp.where(better, mc, prev_max[:, None])
        rmpos = jnp.where(better, pc, prev_max_pos[:, None])

        drop = (rm - cum) > xdrop
        dropped = jnp.cumsum(drop.astype(jnp.int32), axis=1) > 0  # prefix OR
        any_drop = dropped[:, -1]
        # boundary: the chunk's last position out of bounds
        edge = ~inb[:, -1]

        # value/pos at the last not-dropped index (rm is monotone)
        valid = ~dropped
        n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
        last_idx = jnp.clip(n_valid - 1, 0, _CHUNK - 1)
        onehot = offs0[None, :] == last_idx[:, None]
        rm_last = jnp.sum(jnp.where(onehot, rm, 0), axis=1)
        rmpos_last = jnp.sum(jnp.where(onehot, rmpos, 0), axis=1)
        # all positions dropped -> revert fully to the carried max
        rm_fin = jnp.where(n_valid > 0, rm_last, prev_max)
        rmpos_fin = jnp.where(n_valid > 0, rmpos_last, prev_max_pos)

        finished_now = ~done & (any_drop | edge)
        new_max = jnp.where(finished_now, rm_fin, prev_max)
        new_max_pos = jnp.where(finished_now, rmpos_fin, prev_max_pos)
        # continue: carry the chunk-final state
        cont = ~done & ~finished_now
        new_score = jnp.where(cont, cum[:, -1], prev_score)
        new_max = jnp.where(cont, rm[:, -1], new_max)
        new_max_pos = jnp.where(cont, rmpos[:, -1], new_max_pos)

        return (new_score, new_max, new_max_pos, done | finished_now, c + 1)

    return body


def _init_state(S, is_left):
    init_pos = jnp.full((S,), 0 if is_left else -1, jnp.int32)
    return (
        jnp.zeros((S,), jnp.int32),  # prev_score (cumulative)
        jnp.zeros((S,), jnp.int32),  # prev_max
        init_pos,  # prev_max_pos
        jnp.zeros((S,), jnp.bool_),  # done
        jnp.int32(0),  # chunk index
    )


@functools.partial(jax.jit, static_argnames=("is_left", "n_chunks"))
def _extend_fixed(query, target, qpos, tpos, sub_flat, xdrop,
                  is_left: bool, n_chunks: int):
    """Phase 1: a fixed number of chunks for every seed (no while_loop
    sync); returns the full state for host-side compaction + resume."""
    body = _make_chunk_body(query, target, qpos, tpos, sub_flat, xdrop,
                            is_left)
    return jax.lax.fori_loop(
        0, n_chunks, lambda i, s: body(s), _init_state(qpos.shape[0], is_left)
    )


@functools.partial(jax.jit, static_argnames=("is_left",))
def _extend_resume(query, target, qpos, tpos, sub_flat, xdrop,
                   is_left: bool, prev_score, prev_max, prev_max_pos, done,
                   c0):
    """Phase 2: while_loop until every (compacted) straggler finishes."""
    body = _make_chunk_body(query, target, qpos, tpos, sub_flat, xdrop,
                            is_left)
    state = (prev_score, prev_max, prev_max_pos, done, c0)
    _, max_score, max_pos, _, _ = jax.lax.while_loop(
        lambda s: ~jnp.all(s[3]), body, state
    )
    return max_score, max_pos


#: chunks every seed runs before straggler compaction (512 bp covers the
#: ~90th extent percentile of the golden workload)
_PHASE1_CHUNKS = 4


def _pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def _extend_direction(query, target, qpos, tpos, sub_flat, xdrop,
                      is_left: bool):
    """Run one direction for all seeds, two-tier: a fixed 512 bp lockstep
    sweep for everyone, then straggler compaction (host-indexed, padded to
    a power of two) and a while_loop on the survivors only. The reference
    keeps warps busy with a device-wide work list (ungapped_xdrop.cu); the
    lockstep formulation instead pays max-extension chunks for ALL seeds
    unless compacted — on the golden workload the straggler tail is ~10%
    of seeds but ~70% of the chunks. Returns (max_score, max_pos) as
    NumPy arrays; max_pos = -1 (right) / 0 (left) when no positive
    extension exists."""
    st = _extend_fixed(query, target, qpos, tpos, sub_flat, xdrop,
                       is_left, _PHASE1_CHUNKS)
    prev_score, prev_max, prev_max_pos, done, c = st
    done_np = np.asarray(done)
    max_score = np.array(prev_max)  # writable copies
    max_pos = np.array(prev_max_pos)
    if done_np.all():
        return max_score, max_pos
    idx = np.nonzero(~done_np)[0]
    m = _pow2(len(idx))
    idxp = np.concatenate([idx, np.zeros(m - len(idx), np.int64)])
    idxp_j = jnp.asarray(idxp, jnp.int32)
    pad_done = jnp.asarray(np.arange(m) >= len(idx))
    ms, mp = _extend_resume(
        query, target, jnp.take(qpos, idxp_j), jnp.take(tpos, idxp_j),
        sub_flat, xdrop, is_left,
        jnp.take(prev_score, idxp_j), jnp.take(prev_max, idxp_j),
        jnp.take(prev_max_pos, idxp_j),
        jnp.take(done, idxp_j) | pad_done, c,
    )
    max_score[idx] = np.asarray(ms)[: len(idx)]
    max_pos[idx] = np.asarray(mp)[: len(idx)]
    return max_score, max_pos


@jax.jit
def _count_matches(query, target, qpos, tpos, left_extent, right_extent, max_span):
    """count[c] = matched A/C/G/T pairs inside the final segment
    [pos-left_extent, pos+right_extent] (entropy bookkeeping,
    kernels.cu:246-268)."""
    S = qpos.shape[0]
    Lq = query.shape[0]
    Lt = target.shape[0]
    counts = jnp.zeros((S, 4), jnp.int32)

    def body(c, counts):
        offs = c * _CHUNK + jnp.arange(_CHUNK, dtype=jnp.int32)[None, :]
        rel = offs - left_extent[:, None]  # relative position from segment start
        tp = tpos[:, None] - left_extent[:, None] + offs
        qp = qpos[:, None] - left_extent[:, None] + offs
        span = left_extent[:, None] + right_extent[:, None]
        inb = (offs <= span) & (tp >= 0) & (qp >= 0) & (tp < Lt) & (qp < Lq)
        tch = target[jnp.clip(tp, 0, Lt - 1)]
        qch = query[jnp.clip(qp, 0, Lq - 1)]
        m = inb & (tch == qch) & (tch < 4)
        upd = jnp.stack(
            [jnp.sum(m & (tch == i), axis=1) for i in range(4)], axis=1
        ).astype(jnp.int32)
        return counts + upd

    n_chunks = (max_span + _CHUNK) // _CHUNK + 1
    counts = jax.lax.fori_loop(0, n_chunks, body, counts)
    return counts


class UngappedXDrop:
    """Batched ungapped X-drop extender (reference: UngappedXDrop,
    ungapped_xdrop.cuh:39; lifecycle extend_async -> sync ->
    get_scored_segment_pairs, extender.hpp:62-154)."""

    def __init__(
        self,
        score_matrix: np.ndarray = DEFAULT_SCORE_MATRIX,
        xdrop_threshold: int = 910,
        no_entropy: bool = False,
        batch_max_extensions: int = 1 << 22,
    ):
        m = np.asarray(score_matrix, dtype=np.int32)
        if m.size != NUC2:
            raise ValueError("score matrix must have 64 entries")
        self.sub_flat = m.reshape(-1)
        self.xdrop = int(xdrop_threshold)
        self.no_entropy = no_entropy
        self.batch_max = batch_max_extensions
        self._ssps: list[ScoredSegmentPair] = []

    # -- public API ---------------------------------------------------------
    def extend_async(
        self,
        query: np.ndarray,
        target: np.ndarray,
        score_threshold: int,
        seed_pairs: list[tuple[int, int]] | np.ndarray,
    ) -> None:
        """seed_pairs: (query_position, target_position) pairs."""
        seeds = np.asarray(seed_pairs, dtype=np.int64).reshape(-1, 2)
        self._ssps = []
        for start in range(0, len(seeds), self.batch_max):
            chunk = seeds[start : start + self.batch_max]
            self._ssps.extend(
                self._extend_batch(query, target, score_threshold, chunk)
            )

    def sync(self) -> None:
        pass  # JAX blocks on np.asarray inside _extend_batch

    def get_scored_segment_pairs(self) -> list[ScoredSegmentPair]:
        return self._ssps

    def reset(self) -> None:
        self._ssps = []

    # -- internals ----------------------------------------------------------
    def _extend_batch(self, query, target, score_threshold, seeds):
        qpos = jnp.asarray(seeds[:, 0], jnp.int32)
        tpos = jnp.asarray(seeds[:, 1], jnp.int32)
        q = jnp.asarray(query, jnp.int32)
        t = jnp.asarray(target, jnp.int32)
        sub = jnp.asarray(self.sub_flat)
        xd = jnp.int32(self.xdrop)

        r_score, r_pos = _extend_direction(q, t, qpos, tpos, sub, xd, False)
        l_score, l_pos = _extend_direction(q, t, qpos, tpos, sub, xd, True)
        r_score = r_score.astype(np.int64)
        r_pos = r_pos.astype(np.int64)
        l_score = l_score.astype(np.int64)
        l_pos = l_pos.astype(np.int64)

        total = r_score + l_score
        extent = r_pos + l_pos  # reported length (kernels.cu:401,452)

        entropy = np.ones(len(total), dtype=np.float64)
        if not self.no_entropy:
            need = (total >= score_threshold) & (total <= 3 * score_threshold)
            if need.any():
                # entropy is only read for the `need` seeds — compact them
                # (host-indexed, pow2-padded) so the match-count sweep runs
                # over the needed spans only, not every seed at the global
                # max span
                nz = np.nonzero(need)[0]
                m = _pow2(len(nz))
                nzp = np.concatenate([nz, np.zeros(m - len(nz), np.int64)])
                nzp_j = jnp.asarray(nzp, jnp.int32)
                l_sub = l_pos[nzp]
                r_sub = r_pos[nzp]
                max_span = int((l_sub + r_sub).max(initial=0))
                counts_sub = np.asarray(
                    _count_matches(
                        q,
                        t,
                        jnp.take(qpos, nzp_j),
                        jnp.take(tpos, nzp_j),
                        jnp.asarray(l_sub, jnp.int32),
                        jnp.asarray(r_sub, jnp.int32),
                        max_span,
                    )
                )
                counts = np.zeros((len(total), 4), dtype=np.float64)
                counts[nz] = counts_sub[: len(nz)].astype(np.float64)
                csum = counts.sum(axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    p = counts / (extent + 1)[:, None].astype(np.float64)
                    ln = np.where(counts > 0, p * np.log(p, where=counts > 0), 0.0)
                    ent = -ln.sum(axis=1) / math.log(4.0)
                entropy = np.where(need & (csum >= 20), ent, 1.0)

        final = (total.astype(np.float64) * entropy).astype(np.int64)
        keep = final >= score_threshold
        out_score = np.where(entropy > 0, (total * entropy), 0).astype(np.int64)

        ssps = []
        for i in np.nonzero(keep)[0]:
            ssps.append(
                ScoredSegmentPair(
                    target_position_in_read=int(seeds[i, 1] - l_pos[i]),
                    query_position_in_read=int(seeds[i, 0] - l_pos[i]),
                    length=int(extent[i]),
                    score=int(out_score[i]),
                )
            )
        return _sort_and_dedup(ssps)


def _sort_and_dedup(ssps: list[ScoredSegmentPair]) -> list[ScoredSegmentPair]:
    """scored_segment_pair_comp sort + diagonal-containment unique_copy
    (ungapped_xdrop_kernels.cuh:65-120, ungapped_xdrop.cu:158-170)."""
    if not ssps:
        return []
    t = np.array([s.target_position_in_read for s in ssps], dtype=np.uint32)
    qv = np.array([s.query_position_in_read for s in ssps], dtype=np.uint32)
    ln = np.array([s.length for s in ssps], dtype=np.int64)
    sc = np.array([s.score for s in ssps], dtype=np.int64)
    diag = (t - qv).astype(np.uint32)  # unsigned wraparound like the reference
    order = np.lexsort((-sc, -ln, t, diag))

    out: list[ScoredSegmentPair] = []
    last = None
    for i in order:
        cur = (int(diag[i]), int(t[i]), int(ln[i]), int(sc[i]))
        if last is not None:
            same_diag = cur[0] == last[0]
            contains = (
                (cur[1] >= last[1] and cur[1] + cur[2] <= last[1] + last[2])
                or (last[1] >= cur[1] and last[1] + last[2] <= cur[1] + cur[2])
            )
            if same_diag and contains:
                continue
        out.append(ssps[i])
        last = cur
    return out


def create_extender(
    score_matrix=DEFAULT_SCORE_MATRIX,
    xdrop_threshold: int = 910,
    no_entropy: bool = False,
) -> UngappedXDrop:
    """Factory (reference: create_extender, cudaextender/src/extender.cpp)."""
    return UngappedXDrop(score_matrix, xdrop_threshold, no_entropy)


def parse_seed_pairs(path: str) -> np.ndarray:
    """CSV rows 'target_position,query_position' (utils.hpp:55-70).
    Returns (query_position, target_position) pairs."""
    raw = np.loadtxt(path, delimiter=",", dtype=np.int64).reshape(-1, 2)
    return raw[:, ::-1]  # file order is target,query; we return query,target


def parse_scored_segment_pairs(path: str) -> list[ScoredSegmentPair]:
    raw = np.loadtxt(path, delimiter=",", dtype=np.int64).reshape(-1, 4)
    return [ScoredSegmentPair(int(a), int(b), int(c), int(d)) for a, b, c, d in raw]
