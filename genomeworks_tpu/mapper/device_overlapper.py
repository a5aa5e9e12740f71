"""Device-side anchor chaining — the TPU counterpart of cudamapper's
OverlapperTriggered (cudamapper/src/overlapper_triggered.cu:250-441).

The reference chains anchors on the GPU with CUB RunLengthEncode ->
exclusive scan -> copy_if -> ReduceByKey -> transform. On this TPU
platform scatter updates serialize per element and batched gathers lower
to one-hot contractions (measured), so every segment operation here is
expressed as an *associative carry scan* instead:

- ``last-valid-carry``  (combine: keep the later element if it is marked)
  propagates, to every anchor, the values at the most recent flagged
  anchor at-or-before it;
- the same combine under ``reverse=True`` propagates values from the
  first flagged anchor at-or-after;
- per-chain / per-group aggregates become differences of prefix sums
  carried between flag positions;
- the final compaction is a 2-key ``lax.sort`` (ok-first, stable order),
  not a scatter.

The result is bit-identical to the host ``get_overlaps`` (same chain RLE
rule, >= 3 tail, fuse rule, CreateOverlap fields, FilterOverlapOp), with
anchors staying on device end-to-end: D2H is ``ocap`` overlap rows, not
the anchor arrays (16 B x anchors through a ~50 MB/s tunnel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomeworks_tpu.mapper.overlapper import TAIL_LENGTH_FOR_CHAIN, Overlap


def _carry(flag, vals, reverse=False, exclusive=False):
    """Last-valid carry: for each i, the values at the most recent flagged
    position <= i (or >= i when reverse). Returns (found, carried_vals).
    ``exclusive`` shifts by one (strictly </>).

    Implemented as a cummax/cummin of flagged indices + one gather per
    carried array (a generic multi-array associative_scan unrolls ~23
    stages per array at anchor scale — enormous HLO and slow compiles;
    single-array cumulative extrema + 125 Melem/s gathers are both
    smaller and faster on this platform)."""
    n = flag.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    if not reverse:
        last = jax.lax.cummax(jnp.where(flag, iota, -1))
        if exclusive:
            last = jnp.concatenate([jnp.full(1, -1, jnp.int32), last[:-1]])
        found = last >= 0
    else:
        last = jax.lax.cummin(jnp.where(flag, iota, n), reverse=True)
        if exclusive:
            last = jnp.concatenate([last[1:], jnp.full(1, n, jnp.int32)])
        found = last < n
    idx = jnp.clip(last, 0, n - 1)
    return found, [v[idx] for v in vals]


def chain_and_filter(
    qrid, trid, qpos, tpos,  # (cap,) int32, sorted anchors (padded)
    n,                       # scalar int32: valid anchor count
    cap: int,
    all_to_all: bool,
    min_residues: int,
    min_overlap_len: int,
    min_bases_per_residue: int,
    min_overlap_fraction: float,
    ocap: int | None = None,
    pack16: bool = False,
):
    """Traceable chaining body: sorted anchors → (count, sorted overlap
    arrays with the ok rows first, truncated to ``ocap`` rows). Shared by
    the standalone device overlapper and the fused device pipeline.
    Callers must re-run with a larger ocap if count > ocap. ``pack16``:
    the caller guarantees read ids and positions fit 16 bits."""
    if ocap is None:
        ocap = cap
    idx = jnp.arange(cap, dtype=jnp.int32)
    valid = idx < n

    # 1. chain RLE (overlapper_triggered.cu:47-60)
    pq = jnp.concatenate([qrid[:1], qrid[:-1]])
    pt = jnp.concatenate([trid[:1], trid[:-1]])
    pqp = jnp.concatenate([qpos[:1], qpos[:-1]])
    ptp = jnp.concatenate([tpos[:1], tpos[:-1]])
    same = (
        (qrid == pq) & (trid == pt)
        & ((qpos - pqp) < 150) & (jnp.abs(tpos - ptp) < 150)
    )
    same = same & (idx > 0)
    f = valid & ~same  # chain-start flag

    # chain start index and chain end (= next start) per element — carried
    # values ARE the index, so the scans' extrema are the answers directly
    # (no gather; gathers from anchor-scale tables run from HBM)
    start_i = jnp.clip(jax.lax.cummax(jnp.where(f, idx, -1)), 0, None)
    nxt = jax.lax.cummin(
        jnp.where(f, idx, cap), reverse=True
    )
    next_start = jnp.concatenate([nxt[1:], jnp.full(1, cap, jnp.int32)])
    next_start = jnp.where(next_start < cap, next_start, n)
    clen = next_start - start_i

    # 2. surviving chains (>= 3 anchors), flagged at their start element
    s = f & (clen >= TAIL_LENGTH_FOR_CHAIN)

    # 3. fuse with the previous surviving chain (cuOverlapKey ==,
    # overlapper_triggered.cu:89-103). With pack16 (ids and positions
    # < 2^16, known statically by the caller) the carried fields ride two
    # packed words instead of four arrays — the carry gathers run from
    # HBM at anchor scale, so halving them matters.
    if pack16:
        kid = (qrid << 16) | trid
        kpos = (qpos << 16) | tpos

        def unpack(v):
            return (v >> 16) & 0xFFFF, v & 0xFFFF

        pv, (pkid, pkpos) = _carry(s, [kid, kpos], exclusive=True)
        pqr, ptr2 = unpack(pkid)
        pqs, pts = unpack(pkpos)
    else:
        pv, (pqr, ptr2, pqs, pts) = _carry(
            s, [qrid, trid, qpos, tpos], exclusive=True
        )
    dq = jnp.abs(qpos - pqs)
    dt = jnp.abs(tpos - pts)
    fuse = s & pv & (qrid == pqr) & (trid == ptr2) & (jnp.abs(dq - dt) < 300)
    gs = s & ~fuse  # group (overlap) start flag

    # chain-last values carried to the chain start (for end-anchor fields)
    is_last = valid & (
        jnp.concatenate([f[1:], jnp.ones(1, jnp.bool_)]) | (idx + 1 >= n)
    )
    if pack16:
        _, (lkid, lkpos) = _carry(is_last, [kid, kpos], reverse=True)
    else:
        _, (lq, lt, lqp, ltp) = _carry(
            is_last, [qrid, trid, qpos, tpos], reverse=True
        )

    # residues prefix over surviving chains
    cum_excl = jnp.cumsum(jnp.where(s, clen, 0)) - jnp.where(s, clen, 0)
    cum_incl = cum_excl + jnp.where(s, clen, 0)

    # last surviving start of each group: the next surviving start either
    # doesn't exist or starts a new group (~fuse). The fuse bit rides in
    # the scanned value (idx*2 + fuse) — no gather.
    packed = jnp.where(s, idx * 2 + fuse.astype(jnp.int32), 2 * cap)
    nsp = jax.lax.cummin(packed, reverse=True)
    nsp = jnp.concatenate([nsp[1:], jnp.full(1, 2 * cap, jnp.int32)])
    nsv = nsp < 2 * cap
    ls = s & (~nsv | ((nsp & 1) == 0))

    # carry group-last info back to the group start
    if pack16:
        _, (g_cum, g_lkid, g_lkpos) = _carry(
            ls, [cum_incl, lkid, lkpos], reverse=True
        )
        g_lq, g_lt = unpack(g_lkid)
        g_lqp, g_ltp = unpack(g_lkpos)
    else:
        _, (g_cum, g_lq, g_lt, g_lqp, g_ltp) = _carry(
            ls, [cum_incl, lq, lt, lqp, ltp], reverse=True
        )

    # 4. overlap fields at group starts (CreateOverlap,
    # overlapper_triggered.cu:196-238)
    residues = g_cum - cum_excl
    o_qr, o_tr = g_lq, g_lt          # ids from the end anchor
    o_qs, o_qe = qpos, g_lqp
    o_ts, o_te = tpos, g_ltp
    reverse_s = o_ts > o_te
    t_lo = jnp.where(reverse_s, o_te, o_ts)
    t_hi = jnp.where(reverse_s, o_ts, o_te)

    # 5. FilterOverlapOp (overlapper_triggered.cu:151-190)
    t_len = t_hi - t_lo
    q_len = o_qe - o_qs
    ov_len = jnp.maximum(t_len, q_len)
    self_map = (o_qr == o_tr) if all_to_all else jnp.zeros(cap, jnp.bool_)
    res_safe = jnp.maximum(residues, 1)
    ok = (
        gs
        & (residues >= min_residues)
        & ((ov_len // res_safe) < min_bases_per_residue)
        & (q_len >= min_overlap_len)
        & (t_len >= min_overlap_len)
        & ~self_map
        & ((t_len.astype(jnp.float32) / jnp.maximum(ov_len, 1))
           > min_overlap_fraction)
        & ((q_len.astype(jnp.float32) / jnp.maximum(ov_len, 1))
           > min_overlap_fraction)
    )

    # compact: sort only (ok, idx) and gather the payload for the first
    # ``ocap`` rows — sorting all eight payload arrays at anchor scale
    # cost ~10x the 2-array sort, and callers only read `count` rows
    count = jnp.sum(ok.astype(jnp.int32))
    key = jnp.where(ok, 0, 1).astype(jnp.int32)
    _, idx_s = jax.lax.sort((key, idx), num_keys=2, is_stable=False)
    take = idx_s[:ocap] if ocap < cap else idx_s
    return count, tuple(
        v[take]
        for v in (o_qr, o_tr, o_qs, o_qe, t_lo, t_hi,
                  reverse_s.astype(jnp.int32), residues)
    )


@functools.partial(
    jax.jit, static_argnames=("cap", "ocap", "all_to_all", "min_residues",
                              "min_overlap_len", "min_bases_per_residue",
                              "min_overlap_fraction"),
)
def _overlaps_device(
    qrid, trid, qpos, tpos, n,
    cap: int,
    ocap: int,
    all_to_all: bool,
    min_residues: int,
    min_overlap_len: int,
    min_bases_per_residue: int,
    min_overlap_fraction: float,
):
    count, full = chain_and_filter(
        qrid, trid, qpos, tpos, n, cap, all_to_all, min_residues,
        min_overlap_len, min_bases_per_residue, min_overlap_fraction,
        ocap=ocap,
    )
    return count, full


def get_overlaps_device(
    anchors_dev: tuple,   # (qrid, trid, qpos, tpos) device int32, sorted
    n_anchors: int,
    all_to_all: bool,
    min_residues: int = 3,
    min_overlap_len: int = 250,
    min_bases_per_residue: int = 1000,
    min_overlap_fraction: float = 0.8,
) -> list[Overlap]:
    """Chain device-resident anchors into overlaps, entirely on device;
    bit-identical to :func:`genomeworks_tpu.mapper.overlapper.get_overlaps`.
    Anchor arrays must be padded to a static bucket (pow2) with any
    content beyond ``n_anchors`` (padding is masked)."""
    qrid, trid, qpos, tpos = anchors_dev
    cap = int(qrid.shape[0])
    if n_anchors == 0 or cap == 0:
        return []
    ocap = max(1024, cap // 8)
    while True:
        count, out = _overlaps_device(
            qrid.astype(jnp.int32), trid.astype(jnp.int32),
            qpos.astype(jnp.int32), tpos.astype(jnp.int32),
            jnp.int32(n_anchors),
            cap=cap, ocap=min(ocap, cap), all_to_all=all_to_all,
            min_residues=min_residues, min_overlap_len=min_overlap_len,
            min_bases_per_residue=min_bases_per_residue,
            min_overlap_fraction=min_overlap_fraction,
        )
        count = int(count)
        if count <= ocap or ocap >= cap:
            break
        ocap = min(cap, ocap * 4)  # rare: widen the download window
    o_qr, o_tr, o_qs, o_qe, t_lo, t_hi, rev, res = (
        np.asarray(x[:ocap]) for x in out
    )
    out_list = []
    for i in range(count):
        out_list.append(
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
        )
    return out_list
