"""Multi-chip end-to-end overlap mapping — the SPMD re-design of the
reference's multi-GPU worker loop (cudamapper/src/main.cu:453-594: one CPU
thread + stream pair per GPU pulling index-pair batches off a shared
queue).

TPU formulation: shard the *query read-batch* over the mesh data axis and
replicate the target index (the BASELINE north-star's hash-sharded index
is the scale-out variant; replication is exact and optimal while the
target index fits per-chip HBM). Every device runs the identical fused
expand → compound-sort → chain program (mapper.device_pipeline) on its
query shard via ``shard_map``; overlap chains never span query reads, so
shard outputs are independent and their in-order concatenation is
bit-identical to the single-device run (shards own ascending read-id
ranges and anchors sort query-read-major).

Host↔device traffic per shard: count scalars down + final overlap rows
down — same as single-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genomeworks_tpu.mapper.device_overlapper import chain_and_filter
from genomeworks_tpu.mapper.device_pipeline import (
    DeviceIndex,
    _match_counts,
    _pow2,
    build_index_device,
)
from genomeworks_tpu.mapper.overlapper import Overlap
from genomeworks_tpu.parallel.mesh import DATA_AXIS


def _expand_sort_chain_body(
    q_rids, q_poss, q_first, starts, t_first_m, t_counts, total,
    t_rids, t_poss,
    *, cap, all_to_all, min_residues, min_overlap_len,
    min_bases_per_residue, min_overlap_fraction,
):
    """Per-shard body: identical math to device_pipeline._expand_sort_chain
    (shapes carry a leading length-1 shard dim inside shard_map)."""
    q_rids, q_poss, q_first = q_rids[0], q_poss[0], q_first[0]
    starts, t_first_m, t_counts = starts[0], t_first_m[0], t_counts[0]
    total = total[0]

    # occurrence-base expansion — same division-free scheme as
    # device_pipeline._expand_sort_chain (t_counts arrives masked for
    # unmatched reps from _match_counts)
    j = jnp.arange(cap, dtype=jnp.int32)
    in_range = j < total
    nocc = q_rids.shape[0]
    io = jnp.arange(nocc, dtype=jnp.int32)
    ir = jnp.arange(starts.shape[0], dtype=jnp.int32)
    rep_of_occ = jax.lax.cummax(
        jnp.zeros(nocc, jnp.int32).at[q_first[:-1]].max(ir)
    )
    n_t_occ = t_counts[rep_of_occ]
    tfm_occ = t_first_m[rep_of_occ]
    bases_occ = (jnp.cumsum(n_t_occ) - n_t_occ).astype(jnp.int32)
    occ_idx = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[bases_occ].max(io)
    )
    base_at = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[bases_occ].max(bases_occ)
    )
    t_idx = jnp.clip(tfm_occ[occ_idx] + (j - base_at), 0,
                     t_rids.shape[0] - 1)

    qrid = jnp.where(in_range, q_rids[occ_idx], jnp.uint32(0xFFFFFFFF))
    trid = jnp.where(in_range, t_rids[t_idx], jnp.uint32(0xFFFFFFFF))
    qpos = jnp.where(in_range, q_poss[occ_idx], jnp.uint32(0xFFFFFFFF))
    tpos = jnp.where(in_range, t_poss[t_idx], jnp.uint32(0xFFFFFFFF))

    qrid, trid, qpos, tpos = jax.lax.sort(
        (qrid, trid, qpos, tpos), num_keys=4, is_stable=False
    )
    count, rows = chain_and_filter(
        qrid.astype(jnp.int32), trid.astype(jnp.int32),
        qpos.astype(jnp.int32), tpos.astype(jnp.int32),
        total, cap, all_to_all, min_residues, min_overlap_len,
        min_bases_per_residue, min_overlap_fraction,
    )
    return count[None], tuple(r[None] for r in rows)


def split_read_ranges(n_reads: int, n_shards: int) -> list[tuple[int, int]]:
    """Contiguous, ascending query-read ranges, one per device."""
    bounds = np.linspace(0, n_reads, n_shards + 1).astype(int)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_shards)]


def map_reads_sharded(
    query_parser,
    target_parser,
    mesh: Mesh,
    all_to_all: bool,
    kmer_size: int = 15,
    window_size: int = 10,
    hash_representations: bool = True,
    filtering_parameter: float = 1.0,
    min_residues: int = 3,
    min_overlap_len: int = 250,
    min_bases_per_residue: int = 1000,
    min_overlap_fraction: float = 0.8,
    target_index: DeviceIndex | None = None,
) -> list[Overlap]:
    """Overlap query reads against target reads across the mesh; output is
    bit-identical to the single-device device pipeline (and therefore to
    the host pipeline)."""
    n_dev = mesh.devices.size
    n_q = len(query_parser)
    if target_index is None:
        target_index = build_index_device(
            target_parser, 0, len(target_parser),
            kmer_size=kmer_size, window_size=window_size,
            hash_representations=hash_representations,
            filtering_parameter=filtering_parameter,
        )
    if target_index.n == 0 or n_q == 0:
        return []

    ranges = split_read_ranges(n_q, n_dev)
    shards = []
    for first, past in ranges:
        shards.append(
            build_index_device(
                query_parser, first, past,
                kmer_size=kmer_size, window_size=window_size,
                hash_representations=hash_representations,
                filtering_parameter=filtering_parameter,
            )
            if past > first
            else None
        )

    # common query-shard buckets so every device compiles one program
    nq_cap = _pow2(max((s.representations.shape[0] for s in shards if s), default=1))
    uq_cap = _pow2(max((max(s.u, 1) for s in shards if s), default=1))
    ut_b = _pow2(max(target_index.u, 1))

    def pad_to(x, size, fill):
        pad = size - x.shape[0]
        if pad <= 0:
            return x[:size]
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])

    per_shard = []
    totals = []
    for s in shards:
        if s is None or s.n == 0:
            z32 = jnp.zeros(uq_cap, jnp.int32)
            per_shard.append(
                (
                    jnp.zeros(nq_cap, jnp.uint32), jnp.zeros(nq_cap, jnp.uint32),
                    jnp.zeros(uq_cap + 1, jnp.int32), z32, z32, z32,
                    jnp.zeros((), jnp.int32),
                )
            )
            totals.append(0)
            continue
        q_uniq = pad_to(s.unique_representations[: max(s.u, 1)], uq_cap,
                        np.uint32(0xFFFFFFFF))
        q_first = pad_to(s.first_occurrence[: s.u + 1], uq_cap + 1,
                         np.int32(s.n)).astype(jnp.int32)
        starts, t_first_m, t_counts, total = _match_counts(
            q_uniq, q_first,
            target_index.unique_representations[:ut_b],
            target_index.first_occurrence[: ut_b + 1],
            jnp.int32(s.u), jnp.int32(target_index.u),
        )
        per_shard.append(
            (
                pad_to(s.read_ids, nq_cap, np.uint32(0)),
                pad_to(s.positions_in_reads, nq_cap, np.uint32(0)),
                q_first, starts, t_first_m, t_counts, total,
            )
        )
        totals.append(int(total))

    if max(totals) == 0:
        return []
    cap = _pow2(max(totals))

    stacked = tuple(
        jnp.stack([ps[i] for ps in per_shard]) for i in range(7)
    )
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())
    stacked = tuple(jax.device_put(x, sharded) for x in stacked)
    t_rids = jax.device_put(target_index.read_ids, replicated)
    t_poss = jax.device_put(target_index.positions_in_reads, replicated)

    body = functools.partial(
        _expand_sort_chain_body,
        cap=cap, all_to_all=all_to_all, min_residues=min_residues,
        min_overlap_len=min_overlap_len,
        min_bases_per_residue=min_bases_per_residue,
        min_overlap_fraction=min_overlap_fraction,
    )
    fn = jax.jit(
        shard_map(
            body, mesh=mesh,
            in_specs=tuple([P(DATA_AXIS)] * 7 + [P(), P()]),
            out_specs=(P(DATA_AXIS), tuple([P(DATA_AXIS)] * 8)),
        )
    )
    counts, rows = fn(*stacked, t_rids, t_poss)
    counts = np.asarray(counts)

    overlaps: list[Overlap] = []
    for d in range(n_dev):
        c = int(counts[d])
        if c == 0:
            continue
        o_qr, o_tr, o_qs, o_qe, t_lo, t_hi, rev, res = (
            np.asarray(r[d, :c]) for r in rows
        )
        overlaps.extend(
            Overlap(
                query_read_id=int(o_qr[i]),
                target_read_id=int(o_tr[i]),
                query_start_position_in_read=int(o_qs[i]),
                query_end_position_in_read=int(o_qe[i]),
                target_start_position_in_read=int(t_lo[i]),
                target_end_position_in_read=int(t_hi[i]),
                relative_strand="-" if rev[i] else "+",
                num_residues=int(res[i]),
            )
            for i in range(c)
        )
    return overlaps
