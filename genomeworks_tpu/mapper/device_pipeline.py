"""Device-resident mapper pipeline: sketch → index sort/filter/unique →
anchor expansion → compound-key sort → chaining, all on the accelerator.

TPU re-design of the reference's device mapper path:

- index sort/filter/unique: IndexGPU's CUB ``sort_by_two_keys`` +
  ``find_first_occurrences_of_representations`` +
  ``filter_out_most_common_representations``
  (cudamapper/src/index_gpu.cuh:226,438,931);
- matcher: ``find_query_target_matches_kernel`` binary search +
  ``generate_anchors_dispatcher`` + compound-key sort
  (cudamapper/src/matcher_gpu.cuh:117-249);
- overlapper: OverlapperTriggered's RLE→scan→reduce chain
  (cudamapper/src/overlapper_triggered.cu:250-441), shared with
  :mod:`genomeworks_tpu.mapper.device_overlapper`.

Everything runs in a handful of fused XLA programs with static (bucketed)
shapes; the only host↔device traffic is the packed reads up (2-bit-scale),
a few count scalars down, and the final overlap rows down. Measured on the
target platform: H2D collapses to ~15 MB/s for large buffers, 1-D gathers
run at ~125 Melem/s, and ``lax.sort`` is the dominant cost unit — hence
gather-based expansion and a single 4-key anchor sort, exactly one big
sort per stage.

Output is bit-identical to the host pipeline (``build_index`` +
``generate_anchors`` + ``get_overlaps``): same sort keys, same filtering
threshold semantics (host-computed from the downloaded count, so the
reference's ``int(total * fp + 0.001)`` float64 arithmetic is exact), same
chain/fuse/filter rules.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomeworks_tpu.core.profiling import annotate
from genomeworks_tpu.core.sequence import pack_reads
from genomeworks_tpu.io.fasta import FastaParser
from genomeworks_tpu.mapper.device_overlapper import chain_and_filter
from genomeworks_tpu.mapper.minimizers import INVALID_REP, compute_sketch
from genomeworks_tpu.mapper.overlapper import Overlap


def _pow2(n: int) -> int:
    return 1 << max(0, int(n) - 1).bit_length() if n > 1 else 1


def _carry_fwd(flag, vals):
    """Last-flagged carry (forward, inclusive) — cummax of flagged indices
    + gathers (see device_overlapper._carry for the rationale)."""
    from genomeworks_tpu.mapper.device_overlapper import _carry

    return _carry(flag, vals)


def _carry_bwd_excl(flag, vals):
    """First-flagged carry strictly after each position."""
    from genomeworks_tpu.mapper.device_overlapper import _carry

    return _carry(flag, vals, reverse=True, exclusive=True)


@dataclasses.dataclass
class DeviceIndex:
    """Sorted, filtered sketch-element index living on the accelerator.

    Arrays are capacity-padded; the valid prefix lengths are ``n`` (sketch
    elements) and ``u`` (unique representations). ``first_occurrence`` is
    padded with ``n`` so ``diff`` gives zero counts beyond ``u`` (the host
    Index appends total the same way)."""

    representations: jax.Array  # (cap,) uint32, sorted, [:n] valid
    read_ids: jax.Array  # (cap,) uint32
    positions_in_reads: jax.Array  # (cap,) uint32
    directions_of_reads: jax.Array  # (cap,) uint32
    unique_representations: jax.Array  # (cap,) uint32, [:u] valid
    first_occurrence: jax.Array  # (cap+1,) int32, [u]==n, padding==n
    n: int
    u: int
    number_of_reads: int
    first_read_id: int
    kmer_size: int
    window_size: int
    number_of_basepairs_in_longest_read: int
    read_id_to_read_names: list[str] = dataclasses.field(default_factory=list)
    read_id_to_read_lengths: np.ndarray | None = None

    def to_host(self):
        """Materialize as a host Index (for parity tests / host fallback)."""
        from genomeworks_tpu.mapper.index import Index

        first = np.asarray(self.first_occurrence[: self.u + 1]).astype(np.uint32)
        return Index(
            representations=np.asarray(self.representations[: self.n]),
            read_ids=np.asarray(self.read_ids[: self.n]),
            positions_in_reads=np.asarray(self.positions_in_reads[: self.n]),
            directions_of_reads=np.asarray(
                self.directions_of_reads[: self.n]
            ).astype(np.uint8),
            unique_representations=np.asarray(
                self.unique_representations[: self.u]
            ),
            first_occurrence_of_representations=first,
            number_of_reads=self.number_of_reads,
            first_read_id=self.first_read_id,
            kmer_size=self.kmer_size,
            window_size=self.window_size,
            number_of_basepairs_in_longest_read=self.number_of_basepairs_in_longest_read,
            read_id_to_read_names=self.read_id_to_read_names,
            read_id_to_read_lengths=self.read_id_to_read_lengths,
        )


@jax.jit
def _sort_sketch(reps, rids, poss, dirs, valid):
    """Sort flattened sketch slots by (validity, rep, rid, pos); returns
    sorted arrays + valid count. Padding (valid=False) sorts to the end
    regardless of rep value (collision-safe vs hashed rep 0xFFFFFFFF)."""
    inv = (~valid).astype(jnp.uint32)
    inv_s, rep_s, rid_s, pos_s, dir_s = jax.lax.sort(
        (inv, reps, rids, poss, dirs), num_keys=4, is_stable=False
    )
    n = jnp.sum(valid.astype(jnp.int32))
    return rep_s, rid_s, pos_s, dir_s, n


@functools.partial(jax.jit, static_argnames=("apply_filter",))
def _filter_and_unique(rep_s, rid_s, pos_s, dir_s, n, threshold, apply_filter):
    """Drop over-frequent representations (count >= threshold) and compute
    the unique/first-occurrence compression, on sorted input."""
    cap = rep_s.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    valid = idx < n

    if apply_filter:
        prev_rep = jnp.concatenate([rep_s[:1], rep_s[:-1]])
        firstf = valid & ((idx == 0) | (rep_s != prev_rep))
        _, (seg_start,) = _carry_fwd(firstf, [idx])
        nf, (next_start,) = _carry_bwd_excl(firstf, [idx])
        next_start = jnp.where(nf, next_start, n)
        seg_len = next_start - seg_start
        keep = valid & (seg_len < threshold)
        drop = (~keep).astype(jnp.uint32)
        # stable single-key compaction preserves (rep, rid, pos) order
        _, rep_s, rid_s, pos_s, dir_s = jax.lax.sort(
            (drop, rep_s, rid_s, pos_s, dir_s), num_keys=1, is_stable=True
        )
        n = jnp.sum(keep.astype(jnp.int32))
        valid = idx < n

    prev_rep = jnp.concatenate([rep_s[:1], rep_s[:-1]])
    firstf = valid & ((idx == 0) | (rep_s != prev_rep))
    u = jnp.sum(firstf.astype(jnp.int32))
    nonfirst = (~firstf).astype(jnp.uint32)
    _, uniq, first = jax.lax.sort(
        (nonfirst, rep_s, idx), num_keys=1, is_stable=True
    )
    uniq = jnp.where(jnp.arange(cap) < u, uniq, INVALID_REP)
    first = jnp.where(jnp.arange(cap) < u, first, n)
    first = jnp.concatenate([first, n[None]])
    return rep_s, rid_s, pos_s, dir_s, n, uniq, first, u


def build_index_device(
    parser: FastaParser,
    first_read_id: int,
    past_the_last_read_id: int,
    kmer_size: int = 15,
    window_size: int = 10,
    hash_representations: bool = True,
    filtering_parameter: float = 1.0,
    batch_size: int = 2048,
) -> DeviceIndex:
    """Build a device-resident index over reads [first, past_last).

    Same semantics as :func:`genomeworks_tpu.mapper.index.build_index`
    (reads shorter than w+k-1 skipped, lexicographic (rep, rid, pos) order,
    reference filtering formula) with the sort/filter/unique stages on
    device (reference: generate_index, index_gpu.cuh:803-981)."""
    names, lengths_all, seqs = [], [], []
    for rid in range(first_read_id, past_the_last_read_id):
        s = parser.get_sequence_by_id(rid)
        names.append(s.name)
        lengths_all.append(len(s.seq))
        seqs.append(s.seq)

    min_len = window_size + kmer_size - 1
    longest = 0
    flat_reps, flat_rids, flat_poss, flat_dirs, flat_valid = [], [], [], [], []
    for start in range(0, len(seqs), batch_size):
        chunk = seqs[start : start + batch_size]
        longest = max(longest, max((len(s) for s in chunk), default=0))
        max_len = max(max((len(s) for s in chunk), default=1), min_len)
        bucket = _pow2(max_len)
        mat, lens = pack_reads(chunk, max_len=bucket)
        # 2-bit packed upload: 4x fewer H2D bytes (tunnel-bound platform)
        from genomeworks_tpu.mapper.minimizers import pack_2bit

        reps, poss, dirs, emit = compute_sketch(
            jnp.asarray(pack_2bit(mat)), jnp.asarray(lens), kmer_size,
            window_size, hash_representations, packed=True,
        )
        B, Pw = reps.shape
        rid0 = first_read_id + start
        rid_mat = jnp.broadcast_to(
            (jnp.arange(B, dtype=jnp.uint32) + np.uint32(rid0))[:, None], (B, Pw)
        )
        flat_reps.append(reps.reshape(-1))
        flat_rids.append(rid_mat.reshape(-1))
        flat_poss.append(poss.astype(jnp.uint32).reshape(-1))
        flat_dirs.append(dirs.astype(jnp.uint32).reshape(-1))
        flat_valid.append(emit.reshape(-1))

    if not flat_reps:
        z = jnp.zeros(1, jnp.uint32)
        return DeviceIndex(
            z, z, z, z, z, jnp.zeros(2, jnp.int32), 0, 0,
            past_the_last_read_id - first_read_id, first_read_id,
            kmer_size, window_size, 0, names,
            np.array(lengths_all, dtype=np.int64),
        )

    reps = jnp.concatenate(flat_reps)
    rids = jnp.concatenate(flat_rids)
    poss = jnp.concatenate(flat_poss)
    dirs = jnp.concatenate(flat_dirs)
    valid = jnp.concatenate(flat_valid)

    with annotate("mapper/index_sort"):
        rep_s, rid_s, pos_s, dir_s, n_dev = _sort_sketch(
            reps, rids, poss, dirs, valid
        )
        total = int(n_dev)
    # reference threshold formula, computed on host in float64 for exact
    # parity with the host index (index_gpu.cuh:468)
    apply_filter = filtering_parameter < 1.0 and total > 0
    threshold = (
        int(total * filtering_parameter + 0.001) if apply_filter else 0
    )
    with annotate("mapper/index_filter_unique"):
        rep_s, rid_s, pos_s, dir_s, n_dev, uniq, first, u_dev = _filter_and_unique(
            rep_s, rid_s, pos_s, dir_s, jnp.int32(total), jnp.int32(threshold),
            apply_filter,
        )
    return DeviceIndex(
        representations=rep_s,
        read_ids=rid_s,
        positions_in_reads=pos_s,
        directions_of_reads=dir_s,
        unique_representations=uniq,
        first_occurrence=first,
        n=int(n_dev),
        u=int(u_dev),
        number_of_reads=past_the_last_read_id - first_read_id,
        first_read_id=first_read_id,
        kmer_size=kmer_size,
        window_size=window_size,
        number_of_basepairs_in_longest_read=longest,
        read_id_to_read_names=names,
        read_id_to_read_lengths=np.array(lengths_all, dtype=np.int64),
    )


@jax.jit
def _match_counts(q_uniq, q_first, t_uniq, t_first, uq_n, ut_n):
    """Binary-search each query unique rep in the target uniques and count
    the anchor cross products (find_query_target_matches_kernel +
    compute_anchor_starting_indices, matcher_gpu.cuh:117-249)."""
    cap_q = q_uniq.shape[0]
    iq = jnp.arange(cap_q, dtype=jnp.int32)
    found = jnp.searchsorted(t_uniq, q_uniq).astype(jnp.int32)
    found_c = jnp.clip(found, 0, t_uniq.shape[0] - 1)
    matched = (iq < uq_n) & (found < ut_n) & (t_uniq[found_c] == q_uniq)
    found_c = jnp.where(matched, found_c, 0)
    q_counts = q_first[1:] - q_first[:-1]
    t_counts_all = t_first[1:] - t_first[:-1]
    t_counts = t_counts_all[found_c]
    n_pairs = jnp.where(matched, q_counts * t_counts, 0)
    starts = jnp.cumsum(n_pairs) - n_pairs  # exclusive
    total = jnp.sum(n_pairs)
    t_first_m = jnp.where(matched, t_first[:-1][found_c], 0)
    # masked counts: unmatched reps contribute zero pairs. The expansion
    # derives per-occurrence pair counts from this directly, so the mask
    # must live here (the old rep_idx+division math never read unmatched
    # entries; the occurrence-base math does).
    t_counts = jnp.where(matched, t_counts, 0)
    return starts, t_first_m, t_counts, total


@functools.partial(
    jax.jit,
    static_argnames=("cap", "ocap", "all_to_all", "min_residues",
                     "min_overlap_len", "min_bases_per_residue",
                     "min_overlap_fraction", "pack16"),
)
def _expand_sort_chain(
    q_rids, q_poss,  # (cap_nq,) uint32 — filtered, sorted index arrays
    t_rids, t_poss,  # (cap_nt,) uint32
    q_first,         # (cap_uq+1,) int32
    starts, t_first_m, t_counts,  # (cap_uq,) int32
    total,           # scalar int32
    cap: int,
    ocap: int,
    all_to_all: bool,
    min_residues: int,
    min_overlap_len: int,
    min_bases_per_residue: int,
    min_overlap_fraction: float,
    pack16: bool = False,
):
    """Materialize all anchors (query-occurrence outer, target-occurrence
    inner, matcher_gpu.cu:176-249), sort by the compound key, and chain
    into overlaps — one fused device program.

    The expansion is division-free and gather-minimal (round 4; 2.0x on
    the covid workload, experiments/expand_v2.py): per-QUERY-OCCURRENCE
    anchor bases (exclusive cumsum of the matched target counts) are
    scattered and forward-filled with ``cummax`` — the rightmost-tie
    searchsorted trick — so the per-anchor occurrence index and base come
    from two cummaxes instead of rep-level gathers plus ``rel // n_t`` /
    ``rel % n_t`` (the VPU has no integer divide; XLA's expansion of it
    at anchor scale was a major cost). Only occurrence-level (index-size)
    gathers plus one monotone q-side and one t-side anchor-scale gather
    remain; with ``pack16`` the (read id, position) pairs ride one u32
    each, halving the anchor-scale gathers. Bit-identical anchors: same
    (j -> anchor) mapping, same compound-key sort."""
    j = jnp.arange(cap, dtype=jnp.int32)
    in_range = j < total
    nocc = q_rids.shape[0]
    io = jnp.arange(nocc, dtype=jnp.int32)
    ir = jnp.arange(starts.shape[0], dtype=jnp.int32)

    # --- occurrence level (index-size arrays, cheap gathers) ---
    # rep of each query occurrence: rightmost rep with q_first <= p
    rep_of_occ = jax.lax.cummax(
        jnp.zeros(nocc, jnp.int32).at[q_first[:-1]].max(ir)
    )
    n_t_occ = t_counts[rep_of_occ]  # 0 for unmatched reps (masked)
    tfm_occ = t_first_m[rep_of_occ]
    bases_occ = (jnp.cumsum(n_t_occ) - n_t_occ).astype(jnp.int32)

    # --- anchor level ---
    # occurrence of each anchor: rightmost occurrence with base <= j
    # (zero-pair occurrences tie on base and lose to the live one, like
    # the duplicate-starts rightmost-tie searchsorted)
    occ_idx = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[bases_occ].max(io)
    )
    base_at = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[bases_occ].max(bases_occ)
    )
    t_off = j - base_at
    ones = jnp.uint32(0xFFFFFFFF)
    if pack16:
        qpk = ((q_rids << 16) | (q_poss & jnp.uint32(0xFFFF)))[occ_idx]
        t_idx = jnp.clip(tfm_occ[occ_idx] + t_off, 0, t_rids.shape[0] - 1)
        tpk = ((t_rids << 16) | (t_poss & jnp.uint32(0xFFFF)))[t_idx]
        qrid = jnp.where(in_range, qpk >> 16, ones)
        qpos = jnp.where(in_range, qpk & jnp.uint32(0xFFFF), ones)
        trid = jnp.where(in_range, tpk >> 16, ones)
        tpos = jnp.where(in_range, tpk & jnp.uint32(0xFFFF), ones)
    else:
        t_idx = jnp.clip(tfm_occ[occ_idx] + t_off, 0, t_rids.shape[0] - 1)
        qrid = jnp.where(in_range, q_rids[occ_idx], ones)
        qpos = jnp.where(in_range, q_poss[occ_idx], ones)
        trid = jnp.where(in_range, t_rids[t_idx], ones)
        tpos = jnp.where(in_range, t_poss[t_idx], ones)

    # the reference's compound-key anchor sort (matcher_gpu.cuh:176)
    qrid, trid, qpos, tpos = jax.lax.sort(
        (qrid, trid, qpos, tpos), num_keys=4, is_stable=False
    )

    count, sorted_out = chain_and_filter(
        qrid.astype(jnp.int32), trid.astype(jnp.int32),
        qpos.astype(jnp.int32), tpos.astype(jnp.int32),
        total, cap, all_to_all, min_residues, min_overlap_len,
        min_bases_per_residue, min_overlap_fraction, ocap=ocap,
        pack16=pack16,
    )
    return count, sorted_out


def get_overlaps_device_pipeline(
    q_index: DeviceIndex,
    t_index: DeviceIndex,
    all_to_all: bool,
    min_residues: int = 3,
    min_overlap_len: int = 250,
    min_bases_per_residue: int = 1000,
    min_overlap_fraction: float = 0.8,
    as_arrays: bool = False,
) -> "list[Overlap] | OverlapArrays":
    """Anchors + overlaps for one index pair, device-resident end-to-end;
    bit-identical to generate_anchors + get_overlaps on the host copies.
    ``as_arrays`` returns the columnar OverlapArrays (the production hot
    path: at covid scale, building 200k Python Overlap objects costs more
    than the device pipeline itself)."""
    from genomeworks_tpu.mapper.overlapper import OverlapArrays

    empty = (
        OverlapArrays(*(np.zeros(0, np.int64) for _ in range(8)))
        if as_arrays else []
    )
    if q_index.n == 0 or t_index.n == 0:
        return empty
    uq_b = _pow2(max(q_index.u, 1))
    ut_b = _pow2(max(t_index.u, 1))
    with annotate("mapper/match_counts"):
        starts, t_first_m, t_counts, total = _match_counts(
            q_index.unique_representations[:uq_b],
            q_index.first_occurrence[: uq_b + 1],
            t_index.unique_representations[:ut_b],
            t_index.first_occurrence[: ut_b + 1],
            jnp.int32(q_index.u),
            jnp.int32(t_index.u),
        )
        total_i = int(total)
    if total_i == 0:
        return empty
    cap = _pow2(total_i)
    ocap = max(1024, cap // 32)
    # 16-bit field packing for the chain carries: valid when every read
    # id and position fits 16 bits (known statically from the indexes)
    ids_max = max(
        q_index.first_read_id + len(q_index.read_id_to_read_names),
        t_index.first_read_id + len(t_index.read_id_to_read_names),
    )
    pos_max = max(
        q_index.number_of_basepairs_in_longest_read,
        t_index.number_of_basepairs_in_longest_read,
    )
    pack16 = ids_max <= 0xFFFF and pos_max <= 0xFFFF
    with annotate("mapper/expand_sort_chain"):
        while True:
            count, sorted_out = _expand_sort_chain(
                q_index.read_ids, q_index.positions_in_reads,
                t_index.read_ids, t_index.positions_in_reads,
                q_index.first_occurrence[: uq_b + 1],
                starts, t_first_m, t_counts,
                total,
                cap=cap, ocap=min(ocap, cap), all_to_all=all_to_all,
                min_residues=min_residues, min_overlap_len=min_overlap_len,
                min_bases_per_residue=min_bases_per_residue,
                min_overlap_fraction=min_overlap_fraction,
                pack16=pack16,
            )
            count_i = int(count)
            if count_i <= ocap or ocap >= cap:
                break
            ocap = min(cap, ocap * 4)  # rare: widen the result window
    if count_i == 0:
        return empty
    o_qr, o_tr, o_qs, o_qe, t_lo, t_hi, rev, res = (
        np.asarray(x[:count_i]) for x in sorted_out
    )
    if as_arrays:
        return OverlapArrays(
            query_read_id=o_qr, target_read_id=o_tr,
            query_start=o_qs, query_end=o_qe,
            target_start=t_lo, target_end=t_hi,
            rev=rev != 0, num_residues=res,
        )
    return [
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
        for i in range(count_i)
    ]
