"""Anchor matching — re-design of cudamapper's MatcherGPU
(cudamapper/src/matcher_gpu.cu).

For every unique query representation, find the equal target representation
(binary search over the target's unique representations,
find_query_target_matches_kernel, matcher_gpu.cuh:204), count the
(query occurrences x target occurrences) cross product (prefix sum,
compute_anchor_starting_indices, matcher_gpu.cuh:117), then materialize all
anchors ordered by query-representation index with query occurrence outer /
target occurrence inner (generate_anchors_kernel, matcher_gpu.cu:176-249),
and finally sort anchors by (query_read_id, target_read_id,
query_position, target_position) — the reference's compound-key sort.

Vectorized NumPy host implementation (the expansion is one repeat + one
cumsum-offset gather); a device pallas expansion is a planned optimization.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from genomeworks_tpu.mapper.index import Index


@dataclasses.dataclass
class Anchors:
    """SoA anchor arrays (reference: Anchor POD, cudamapper types.hpp:36)."""

    query_read_ids: np.ndarray  # uint32
    target_read_ids: np.ndarray  # uint32
    query_positions: np.ndarray  # uint32
    target_positions: np.ndarray  # uint32

    def __len__(self) -> int:
        return len(self.query_read_ids)


def generate_anchors(query_index: Index, target_index: Index) -> Anchors:
    """All (query occurrence, target occurrence) pairs of equal
    representations, sorted by (qrid, trid, qpos, tpos)."""
    q_uniq = query_index.unique_representations
    t_uniq = target_index.unique_representations
    q_first = query_index.first_occurrence_of_representations.astype(np.int64)
    t_first = target_index.first_occurrence_of_representations.astype(np.int64)

    if len(q_uniq) == 0 or len(t_uniq) == 0:
        z = np.zeros(0, np.uint32)
        return Anchors(z, z, z, z)

    # binary search each query unique representation in the target uniques
    found = np.searchsorted(t_uniq, q_uniq)
    found_c = np.clip(found, 0, len(t_uniq) - 1)
    matched = t_uniq[found_c] == q_uniq
    found_c[~matched] = 0

    q_counts = np.diff(q_first)
    t_counts = np.diff(t_first)
    n_pairs = np.where(matched, q_counts * t_counts[found_c], 0)
    starts = np.concatenate([[0], np.cumsum(n_pairs)])
    total = int(starts[-1])
    if total == 0:
        z = np.zeros(0, np.uint32)
        return Anchors(z, z, z, z)

    # expand: for each anchor slot, which representation does it belong to
    rep_idx = np.repeat(np.arange(len(q_uniq)), n_pairs)
    rel = np.arange(total, dtype=np.int64) - starts[rep_idx]
    n_t = t_counts[found_c][rep_idx]
    q_idx = q_first[rep_idx] + rel // n_t
    t_idx = t_first[found_c[rep_idx]] + rel % n_t

    qrid = query_index.read_ids[q_idx]
    trid = target_index.read_ids[t_idx]
    qpos = query_index.positions_in_reads[q_idx]
    tpos = target_index.positions_in_reads[t_idx]

    # compound-key sort (matcher_gpu.cuh:176 sort by query_read ->
    # target_read -> query_pos -> target_pos); packing the four u32 keys
    # into two u64 halves the stable-sort passes on large anchor sets
    key_hi = (qrid.astype(np.uint64) << np.uint64(32)) | trid.astype(np.uint64)
    key_lo = (qpos.astype(np.uint64) << np.uint64(32)) | tpos.astype(np.uint64)
    order = np.lexsort((key_lo, key_hi))
    return Anchors(qrid[order], trid[order], qpos[order], tpos[order])


def generate_anchors_device(query_index: Index, target_index: Index) -> Anchors:
    """Device-side anchor generation: the expansion and the compound-key
    sort run as XLA ops on the accelerator (the TPU counterpart of
    MatcherGPU's generate_anchors_dispatcher + CUB sort,
    matcher_gpu.cuh:176), with only the final anchor arrays copied back.
    Bit-identical to :func:`generate_anchors`. Note: recompiles per anchor
    count — production batching should pad totals to buckets."""
    import jax
    import jax.numpy as jnp

    q_uniq = query_index.unique_representations
    t_uniq = target_index.unique_representations
    q_first = query_index.first_occurrence_of_representations.astype(np.int64)
    t_first = target_index.first_occurrence_of_representations.astype(np.int64)

    if len(q_uniq) == 0 or len(t_uniq) == 0:
        z = np.zeros(0, np.uint32)
        return Anchors(z, z, z, z)

    found = np.searchsorted(t_uniq, q_uniq)
    found_c = np.clip(found, 0, len(t_uniq) - 1)
    matched = t_uniq[found_c] == q_uniq
    found_c[~matched] = 0
    q_counts = np.diff(q_first)
    t_counts = np.diff(t_first)
    n_pairs = np.where(matched, q_counts * t_counts[found_c], 0)
    starts = np.concatenate([[0], np.cumsum(n_pairs)])
    total = int(starts[-1])
    if total == 0:
        z = np.zeros(0, np.uint32)
        return Anchors(z, z, z, z)

    @jax.jit
    def _expand_sort(rep_idx, starts, q_first, t_first_f, n_t, qread, tread, qpos_a, tpos_a):
        rel = jnp.arange(rep_idx.shape[0], dtype=jnp.int64) - starts[rep_idx]
        q_idx = q_first[rep_idx] + rel // n_t[rep_idx]
        t_idx = t_first_f[rep_idx] + rel % n_t[rep_idx]
        qrid = qread[q_idx]
        trid = tread[t_idx]
        qpos = qpos_a[q_idx]
        tpos = tpos_a[t_idx]
        # lexicographic sort on the four u32 keys (lax.sort num_keys)
        qrid, trid, qpos, tpos = jax.lax.sort(
            (qrid, trid, qpos, tpos), num_keys=4, is_stable=False
        )
        return qrid, trid, qpos, tpos

    rep_idx = np.repeat(np.arange(len(q_uniq)), n_pairs)
    out = _expand_sort(
        jnp.asarray(rep_idx),
        jnp.asarray(starts),
        jnp.asarray(q_first),
        jnp.asarray(t_first[found_c]),
        jnp.asarray(t_counts[found_c]),
        jnp.asarray(query_index.read_ids.astype(np.uint32)),
        jnp.asarray(target_index.read_ids.astype(np.uint32)),
        jnp.asarray(query_index.positions_in_reads.astype(np.uint32)),
        jnp.asarray(target_index.positions_in_reads.astype(np.uint32)),
    )
    qrid, trid, qpos, tpos = (np.asarray(x) for x in out)
    return Anchors(qrid, trid, qpos, tpos)
