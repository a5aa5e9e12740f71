"""Pallas TPU kernels: lockstep POA — 128 windows per grid step, one
window per vector lane.

This is the round-4 architectural successor to ops/poa_pallas.py (G = 8
windows per grid step, scalar SMEM graph walks). The per-window kernel is
issue-bound on the scalar unit: every pointer-chase step costs ~40 scalar
ops per window. Here the whole chain is reformulated so that 128 windows
advance in lockstep with graph state held as (N, 128) VMEM planes
(window = lane), and every per-window "pointer chase" becomes a one-hot
gather/scatter over a plane — ~64-130 VPU ops serving 128 windows at
once (~1-2 ops/window vs ~40 scalar ops/window).

Layout and algorithm per phase (reference files cited per kernel):

- NW row sweep (cudapoa_nw.cuh, full band): DP rows live along SUBLANES
  ((Lp, 128) planes, sublane j = column j); the last D rows ride a VMEM
  ring. Predecessor rows are fetched by DISTANCE (row - pred row in
  topological order) with a dynamic loop bound = the max distance across
  the 128 windows at that row (p50 distance is 1; the bound makes the
  common row cost ~2 ring slots, not D). Max values and traceback codes
  are tracked in one packed (score << 5 | 31 - edge) running max,
  reproducing the reference's re-derivation priority (diagonal <
  vertical by edge order, then horizontal) exactly like
  poa.jax_poa.nw_batched_fast, the parity-tested XLA formulation this
  kernel is ported from. The horizontal closure is a logarithmic
  prefix-max along sublanes. Traceback codes are packed 4 bits/cell
  (requires E <= 7), 8 rows per i32 word, and streamed to an HBM buffer
  chunk-by-chunk via async DMA.
- Traceback walk: a descending sweep over 32-row code chunks DMA'd back
  from HBM; within a chunk all windows whose cursor row is inside the
  chunk step in lockstep (rows only decrease, so one descending pass
  suffices; i == 0 horizontal tail steps are chunk-independent).
- Add-alignment (cudapoa_add_alignment.cuh): the exact sequential walk
  of poa.jax_poa.add_alignment_batched_seq, lockstep across windows,
  with all slot loops (aligned lists, edge lists) bounded dynamically by
  the max count across windows (p99 counts are 1-3).
- Topological sort (cudapoa_topsort.cuh:46): seed ranks via a
  logarithmic prefix-sum along sublanes, then the Kahn expansion with
  the FIFO head as the (uniform) loop index and appends as one-hot
  scatters.
- Consensus (cudapoa_generate_consensus.cuh): heaviest-edge predecessor
  pass + branch completion + backward emission, port of
  poa.jax_poa.consensus_batched.

Capacity caps are chosen from measured covid-workload distributions
(in-edges p99 = 3, max 6; out-edges max 7; aligned nodes max 3; pred
distance per window p50 = 24, p99 = 71): E = 7 in-edges (4-bit codes),
EO = 8 out-edges, A = 8 aligned nodes, ring D = 64. Windows exceeding
any cap set a distinct error code and are re-run by the caller through
the per-window kernel / XLA chain (the same tiered-fallback protocol as
_poa_batch_consensus_pallas).

Error codes (shared with jax_poa): 0 ok, 1 node-count overflow, 3 NW
traceback failure, plus lockstep-specific 5 (ring distance exceeded) and
6 (edge/aligned-node plane cap exceeded) which the caller treats as
"retry on the bigger-cap tier".
"""

from __future__ import annotations

import functools
import zlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128          # windows per group (vector lanes)
NEG = -(1 << 24)           # score sentinel (fits packed << 5 in i32)
NEGP = NEG << 5            # packed sentinel

# source-version tag baked into kernel programs: the persistent XLA cache
# does not key on Mosaic custom-call payloads (see ops/poa_pallas.py)
with open(__file__, "rb") as _f:
    _SRC_TAG = zlib.crc32(_f.read()) & 0x7FFFFFFF


def _iota(n, width=W):
    return jax.lax.broadcasted_iota(jnp.int32, (n, width), 0)


def _og(plane, idx, n):
    """One-hot gather: plane (n, W), idx (1, W) -> (1, W) = plane[idx[w], w].
    Out-of-range idx gathers 0."""
    m = _iota(n) == idx
    return jnp.sum(jnp.where(m, plane, 0), axis=0, keepdims=True)


def _sc(plane, idx, val, cond, n):
    """One-hot scatter: plane[idx[w], w] = val[w] where cond[w]."""
    m = (_iota(n) == idx) & cond
    return jnp.where(m, val, plane)


def _cummax_sub(x, n):
    """Prefix max along sublanes of (n, W)."""
    sh = 1
    while sh < n:
        x = jnp.maximum(
            x,
            jnp.concatenate(
                [jnp.full((sh, W), NEG, x.dtype), x[:-sh, :]], axis=0
            ),
        )
        sh *= 2
    return x


def _shift_down1(x, n, fill=NEG):
    """y[j] = x[j-1], y[0] = fill, along sublanes of (n, W)."""
    return jnp.concatenate(
        [jnp.full((1, W), fill, x.dtype), x[:-1, :]], axis=0
    )


def _excl_cumsum_sub(x, n):
    """Exclusive prefix sum along sublanes of (n, W) i32."""
    sh = 1
    y = x
    while sh < n:
        y = y + jnp.concatenate(
            [jnp.zeros((sh, W), jnp.int32), y[:-sh, :]], axis=0
        )
        sh *= 2
    return y - x


# =========================================================================
# NW row sweep (cudapoa_nw.cuh via jax_poa.nw_batched_fast)
# =========================================================================


def _nw_kernel(
    # inputs (per-group blocks)
    sortp_ref,     # (1, N, W) i32 topological order -> node id
    nodes_ref,     # (1, N, W) i32 node base codes
    in_count_ref,  # (1, N, W)
    pos_ref,       # (1, N, W) node id -> topological position
    out_count_ref,  # (1, N, W)
    in_e_ref,      # (1, E, N, W)
    nc_ref,        # (1, 1, W) node_count
    act_ref,       # (1, 1, W) i32 active mask
    read_ref,      # (1, Lp, W) read char at sublane j = read[j-1]
    rl_ref,        # (1, 1, W) read length
    # outputs
    codes_ref,     # HBM (NG, N//8, Lp, W) i32 (or VMEM block when INTERP)
    besti_ref,     # (1, 1, W) traceback start row
    err_ref,       # (1, 1, W) error accumulator (0 ok / 5 / 6)
    # scratch
    ring,          # VMEM (D, Lp, W) i32 packed rows (score << 5)
    ev,            # VMEM (D, W) i32 per-distance edge values (32 - e; 0 = none)
    stage,         # VMEM (4, Lp, W) i32 packed code words
    sem,
    *, N: int, E: int, Lp: int, D: int,
    gap: int, mismatch: int, match: int, INTERP: bool,
):
    g = pl.program_id(0)
    act = act_ref[0, pl.ds(0, 1), :] != 0
    nc = nc_ref[0, pl.ds(0, 1), :]
    rl = rl_ref[0, pl.ds(0, 1), :]
    ncm = jnp.where(act, nc, 0)
    max_nc = jnp.max(ncm)
    # full 32-row chunks so every stage buffer DMA'd out is fully written
    r_loop = ((max_nc + 31) // 32) * 32

    iota_lp = _iota(Lp)
    slope = gap * iota_lp  # (Lp, W), sublane j = gap * j
    slope_p = (slope << 5) | 31  # packed boundary row 0 (edge 0)

    HOR = 2 * E    # 14
    NONE = 2 * E + 1  # 15
    read_pl = read_ref[0]
    sm = jnp.int32(_SRC_TAG)  # cache-key versioning

    def row_body(gp, carry):
        best_s, best_i, errv, wacc, _tag = carry
        row = gp + 1
        actr = act & (gp < ncm)
        nidr = sortp_ref[0, pl.ds(gp, 1), :]  # FIFO order: uniform row read
        nid = jnp.clip(jnp.where(actr, nidr, 0), 0, N - 1)
        gbase = _og(nodes_ref[0], nid, N)
        pc = _og(in_count_ref[0], nid, N)
        ocs = _og(out_count_ref[0], nid, N)
        # cap guard: pc > E cannot be represented in 4-bit codes
        errv = jnp.where(actr & (pc > E) & (errv == 0), 6, errv)
        pcc = jnp.minimum(pc, E)
        max_pc = jnp.max(jnp.where(actr, pcc, 0))

        # ---- distance mask build ---------------------------------------
        ev[...] = jnp.zeros((D, W), jnp.int32)

        def pred_body(e, c):
            dmax, errv = c
            pe = _og(in_e_ref[0, e], nid, N)
            pi = _og(pos_ref[0], jnp.clip(pe, 0, N - 1), N) + 1
            dist = row - pi
            vme = (e < pcc) & actr & (pc > 0)
            bad = vme & ((dist < 1) | (dist > D))
            errv = jnp.where(bad & (errv == 0), 5, errv)
            distc = jnp.where(vme & ~bad, dist, 0)
            # min-e on collision == max of (32 - e)
            ev[...] = jnp.maximum(
                ev[...],
                jnp.where(
                    (_iota(D) == distc - 1) & vme & ~bad, 32 - e, 0
                ),
            )
            dmax = jnp.maximum(dmax, jnp.max(distc))
            return dmax, errv

        dmax, errv = jax.lax.fori_loop(
            0, max_pc, pred_body, (jnp.int32(0), errv)
        )

        # ---- packed max over predecessor rows --------------------------
        bnd = actr & (pc == 0)
        m = jnp.where(bnd, slope_p, NEGP)

        def ring_body(t, m):
            slot = (row - 1 - t) & (D - 1)
            rr = ring[slot]  # (Lp, W)
            evv = ev[pl.ds(t, 1), :]  # (1, W): 32 - e, or 0
            return jnp.maximum(
                m, jnp.where(evv > 0, rr + (evv - 1), NEGP)
            )

        m = jax.lax.fori_loop(0, dmax, ring_body, m)

        # ---- diagonal / vertical / closure / codes ----------------------
        sub = jnp.where(read_pl == gbase, match, mismatch)
        diag_p = _shift_down1(m, Lp, NEGP) + (sub << 5)
        vert_p = m + (gap << 5)
        ds = diag_p >> 5
        vs = vert_p >> 5
        take_d = ds >= vs
        val = jnp.maximum(ds, vs)
        code_pre = jnp.where(
            take_d, 31 - (diag_p & 31), E + (31 - (vert_p & 31))
        )
        # column 0 is vertical-only (cudapoa_nw.cuh:190-215)
        col0 = iota_lp == 0
        val = jnp.where(col0, vs, val)
        code_pre = jnp.where(col0, E + (31 - (vert_p & 31)), code_pre)

        rowm = _cummax_sub(val - slope, Lp) + slope
        prev = _shift_down1(rowm, Lp, NEG)
        horiz = (rowm == prev + gap) & ~col0
        fin = jnp.where(rowm == val, code_pre, NONE)
        fin = jnp.minimum(fin, jnp.where(horiz, HOR, NONE))

        # ---- ring store + code word accumulation ------------------------
        ring[row & (D - 1)] = rowm << 5
        t8 = gp & 7
        wacc = jnp.where(t8 == 0, fin, wacc | (fin << (4 * t8)))

        @pl.when(t8 == 7)
        def _():
            stage[(gp >> 3) & 3] = wacc

        if INTERP:
            @pl.when(t8 == 7)
            def _():
                codes_ref[0, (gp >> 3), :, :] = wacc
        else:
            @pl.when((gp & 31) == 31)
            def _():
                cp = pltpu.make_async_copy(
                    stage, codes_ref.at[g, pl.ds((gp >> 5) * 4, 4)], sem
                )
                cp.start()
                cp.wait()

        # ---- traceback-start tracking (first max among sink rows) -------
        colv = jnp.sum(jnp.where(iota_lp == rl, rowm, 0), axis=0,
                       keepdims=True)
        upd = actr & (ocs == 0) & (best_s < colv)
        best_s = jnp.where(upd, colv, best_s)
        best_i = jnp.where(upd, row, best_i)
        return best_s, best_i, errv, wacc, _tag

    best_s0 = jnp.full((1, W), NEG, jnp.int32)
    best_i0 = jnp.zeros((1, W), jnp.int32)
    err0 = jnp.zeros((1, W), jnp.int32)
    wacc0 = jnp.zeros((Lp, W), jnp.int32)
    _, best_i, errv, _, _ = jax.lax.fori_loop(
        0, r_loop, row_body, (best_s0, best_i0, err0, wacc0, sm)
    )
    besti_ref[0, pl.ds(0, 1), :] = jnp.where(act, best_i, 0)
    err_ref[0, pl.ds(0, 1), :] = jnp.where(act, errv, 0)


def nw_lockstep(state, read_pl, rl, act, *, E: int, D: int,
                gap: int, mismatch: int, match: int,
                interpret: bool = False):
    """Run the NW sweep for every group. ``state`` is the plane-layout
    graph state (see poa.lockstep). Returns (codes, best_i, err_nw)."""
    NG, N, _ = state["sortp"].shape
    Lp = read_pl.shape[1]
    b1 = lambda *s: pl.BlockSpec((1,) + s, lambda g: (g,) + (0,) * len(s))
    kern = functools.partial(
        _nw_kernel, N=N, E=E, Lp=Lp, D=D,
        gap=gap, mismatch=mismatch, match=match, INTERP=interpret,
    )
    codes_spec = (
        b1(N // 8, Lp, W) if interpret
        else pl.BlockSpec(memory_space=pltpu.ANY)
    )
    return pl.pallas_call(
        kern,
        grid=(NG,),
        in_specs=[
            b1(N, W), b1(N, W), b1(N, W), b1(N, W), b1(N, W),
            b1(E, N, W), b1(1, W), b1(1, W), b1(Lp, W), b1(1, W),
        ],
        out_specs=(codes_spec, b1(1, W), b1(1, W)),
        out_shape=(
            jax.ShapeDtypeStruct((NG, N // 8, Lp, W), jnp.int32),
            jax.ShapeDtypeStruct((NG, 1, W), jnp.int32),
            jax.ShapeDtypeStruct((NG, 1, W), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, Lp, W), jnp.int32),
            pltpu.VMEM((D, W), jnp.int32),
            pltpu.VMEM((4, Lp, W), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        state["sortp"], state["nodes"], state["in_count"], state["pos"],
        state["out_count"], state["in_e"], state["node_count"], act,
        read_pl, rl,
    )


# =========================================================================
# Traceback walk (descending chunk sweep over the HBM code buffer)
# =========================================================================


def _tb_kernel(
    sortp_ref, in_count_ref, pos_ref, in_e_ref,
    besti_ref, rl_ref, act_ref, err_ref,  # err from NW (5/6 already set)
    codes_ref,     # HBM (NG, N//8, Lp, W) (or VMEM block when INTERP)
    ag_ref,        # (1, K, W) out: graph node per alignment slot (-1 = gap)
    ar_ref,        # (1, K, W) out: read pos per slot (-1 = gap)
    klen_ref,      # (1, 1, W)
    erro_ref,      # (1, 1, W)
    buf,           # VMEM (4, Lp, W) code-word chunk
    sem,
    *, N: int, E: int, Lp: int, K: int, INTERP: bool,
):
    g = pl.program_id(0)
    act = (act_ref[0, pl.ds(0, 1), :] != 0) & (
        err_ref[0, pl.ds(0, 1), :] == 0
    )
    rl = rl_ref[0, pl.ds(0, 1), :]
    HOR = 2 * E
    iota_lp = _iota(Lp)
    iota_k = _iota(K)

    i0 = jnp.where(act, besti_ref[0, pl.ds(0, 1), :], 0)
    j0 = jnp.where(act, rl, 0)
    ag_ref[0] = jnp.full((K, W), -1, jnp.int32)
    ar_ref[0] = jnp.full((K, W), -1, jnp.int32)

    start_c = (jnp.maximum(jnp.max(i0) - 1, 0)) >> 5
    n_chunks = start_c + 1

    def step(c, cr, has_chunk):
        """One lockstep walk step for windows inside chunk c (or at i == 0).
        cr = (i, j, k, steps)."""
        i, j, k, steps = cr
        alive = (i != 0) | (j != 0)
        instep = alive & (has_chunk & (((i - 1) >> 5) == c) | (i == 0))

        # code fetch from the chunk buffer
        crow = jnp.clip(i - 1 - c * 32, 0, 31)
        wplane = crow >> 3
        colw = [
            jnp.sum(jnp.where(iota_lp == j, buf[p], 0), axis=0,
                    keepdims=True)
            for p in range(4)
        ]
        word = colw[0]
        for p in range(1, 4):
            word = jnp.where(wplane == p, colw[p], word)
        code = (word >> ((crow & 7) * 4)) & 15
        code = jnp.where(i == 0, HOR, code)

        is_h = code == HOR
        is_d = code < E
        e = jnp.where(is_d, code, code - E)
        e = jnp.where(is_h, 0, e)
        nid = jnp.clip(_og(sortp_ref[0], jnp.clip(i - 1, 0, N - 1), N),
                       0, N - 1)
        pc = _og(in_count_ref[0], nid, N)
        max_e = jnp.max(jnp.where(instep & ~is_h, e, 0))

        def e_body(ee, pred):
            pv = _og(in_e_ref[0, ee], nid, N)
            return jnp.where(e == ee, pv, pred)

        pred = jax.lax.fori_loop(0, max_e + 1, e_body,
                                 jnp.zeros((1, W), jnp.int32))
        pi = jnp.where(
            pc == 0, 0, _og(pos_ref[0], jnp.clip(pred, 0, N - 1), N) + 1
        )
        prev_i = jnp.where(is_h, i, pi)
        prev_j = jnp.where(is_h | is_d, j - 1, j)
        agv = jnp.where(prev_i == i, -1, nid)
        arv = jnp.where(prev_j == j, -1, j - 1)
        mk = (iota_k == k) & instep
        ag_ref[0] = jnp.where(mk, agv, ag_ref[0])
        ar_ref[0] = jnp.where(mk, arv, ar_ref[0])
        i = jnp.where(instep, prev_i, i)
        j = jnp.where(instep, prev_j, j)
        k = k + instep.astype(jnp.int32)
        return i, j, k, steps + 1

    def chunk_body(t, cr):
        c = start_c - t
        if INTERP:
            buf[...] = codes_ref[0, pl.ds(c * 4, 4), :, :]
        else:
            cp = pltpu.make_async_copy(
                codes_ref.at[g, pl.ds(c * 4, 4)], buf, sem
            )
            cp.start()
            cp.wait()

        def w_cond(cr):
            i, j, k, steps = cr
            alive = (i != 0) | (j != 0)
            inc = alive & ((((i - 1) >> 5) == c) | (i == 0))
            return jnp.any(inc) & (steps < K + 2)

        def w_body(cr):
            return step(c, cr, jnp.bool_(True))

        return jax.lax.while_loop(w_cond, w_body, cr)

    cr = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (i0, j0, jnp.zeros((1, W), jnp.int32), jnp.int32(0)),
    )
    i, j, k, steps = cr
    failed = act & ((i != 0) | (j != 0))
    erro_ref[0, pl.ds(0, 1), :] = jnp.where(
        failed & (err_ref[0, pl.ds(0, 1), :] == 0),
        3,
        err_ref[0, pl.ds(0, 1), :],
    )
    klen_ref[0, pl.ds(0, 1), :] = jnp.where(act & ~failed, k, 0)


def tb_lockstep(state, codes, best_i, rl, act, err_nw, *, E: int, K: int,
                Lp: int, interpret: bool = False):
    NG, N, _ = state["sortp"].shape
    b1 = lambda *s: pl.BlockSpec((1,) + s, lambda g: (g,) + (0,) * len(s))
    kern = functools.partial(_tb_kernel, N=N, E=E, Lp=Lp, K=K,
                             INTERP=interpret)
    codes_spec = (
        b1(N // 8, Lp, W) if interpret
        else pl.BlockSpec(memory_space=pltpu.ANY)
    )
    return pl.pallas_call(
        kern,
        grid=(NG,),
        in_specs=[
            b1(N, W), b1(N, W), b1(N, W), b1(E, N, W),
            b1(1, W), b1(1, W), b1(1, W), b1(1, W), codes_spec,
        ],
        out_specs=(b1(K, W), b1(K, W), b1(1, W), b1(1, W)),
        out_shape=(
            jax.ShapeDtypeStruct((NG, K, W), jnp.int32),
            jax.ShapeDtypeStruct((NG, K, W), jnp.int32),
            jax.ShapeDtypeStruct((NG, 1, W), jnp.int32),
            jax.ShapeDtypeStruct((NG, 1, W), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, Lp, W), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        state["sortp"], state["in_count"], state["pos"], state["in_e"],
        best_i, rl, act, err_nw, codes,
    )
