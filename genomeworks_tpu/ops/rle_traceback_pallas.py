"""Pallas TPU kernel: in-band traceback -> RLE runs, on device.

Replaces the host traceback of the banded aligner: previously the packed
2-bit code tensor (B, M/16, W) — ~134 MB at the bench shape — was copied
D2H through a ~50 MB/s tunnel and walked in NumPy. This kernel walks each
alignment's codes in SMEM (3 ns scalar loads) and emits run-length-encoded
(state, length) pairs, so D2H is proportional to the CIGAR length
(rcap * 4 bytes per alignment).

Reference analogue: cudaaligner/src/myers_gpu.cu:444-530 — the banded
backtrace appends RLE CIGAR runs into a shared device result buffer; same
contract here (runs + per-alignment counts + is_optimal-style edge flag),
minus the atomics (fixed-capacity slots per alignment instead).

Design notes (measured on v5e):
- G alignments are walked per grid step; interleaving G independent scalar
  chains pipelines the ~3-8 ns dependent SMEM loads.
- Match-run skipping: a diagonal run keeps the same band column k, so its
  2-bit codes are consecutive groups of the SAME packed word (16 rows per
  word). When every group below the cursor is 0 (match), the walk jumps a
  whole word; otherwise the highest non-zero group is located via the f32
  exponent trick (bitcast >> 23) — a conservative (never unsafe) skip.
- The walk is branchless: finished alignments freeze their carry, writes
  are read-modify-preserve.

Run encoding: (state << 28) | length, state = AlignmentState (0 match,
1 mismatch, 2 insertion, 3 deletion), runs in BACKWARD path order (the
walk goes end -> start); hosts reverse. ``overflow`` marks alignments with
more than rcap runs (host falls back to the D2H walk for those).
"""

from __future__ import annotations

import functools
import zlib

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_WORD = 16

# cache-key versioning: see ops/poa_pallas.py _SRC_TAG
with open(__file__, "rb") as _f:
    _SRC_TAG = zlib.crc32(_f.read()) & 0x7FFFFFFF


def _maxs(xs):
    import functools as _ft

    return _ft.reduce(jnp.maximum, xs)


def _anys(xs):
    import functools as _ft

    return _ft.reduce(jnp.logical_or, xs)


def _rle_kernel(
    qlen_ref,   # SMEM (G, 1, 1)
    tlen_ref,   # SMEM (G, 1, 1)
    dlo_ref,    # SMEM (G, 1, 1)
    codes_ref,  # SMEM (G, M16, W) packed 2-bit codes
    runs_ref,   # SMEM (G, 1, RCAP) out
    nruns_ref,  # SMEM (G, 1, 1) out
    dist_ref,   # SMEM (G, 1, 1) out
    edge_ref,   # SMEM (G, 1, 1) out
    ovf_ref,    # SMEM (G, 1, 1) out
    *,
    M: int, W: int, RCAP: int, G: int,
):
    M16 = (M + ROWS_PER_WORD - 1) // ROWS_PER_WORD
    rg = range(G)
    qls = [qlen_ref[g, 0, 0] for g in rg]
    tls = [tlen_ref[g, 0, 0] for g in rg]
    dlos = [dlo_ref[g, 0, 0] for g in rg]
    nruns_ref[0, 0, 0] = jnp.int32(_SRC_TAG) * 0  # cache-key versioning

    def cond(c):
        iis, jjs = c[0], c[1]
        return _anys([(iis[g] > 0) | (jjs[g] > 0) for g in rg])

    def body(c):
        iis, jjs, ns, ops, lens, dists, edges, ovfs = c
        nis, njs, nns, nops, nlens, ndis, neds, novs = (
            [], [], [], [], [], [], [], []
        )
        for g in rg:
            i, j = iis[g], jjs[g]
            n, op, ln = ns[g], ops[g], lens[g]
            alive = (i > 0) | (j > 0)
            in_main = (i > 0) & (j > 0)
            k = j - i - dlos[g]
            kc = jnp.clip(k, 0, W - 1)
            r0 = jnp.clip(i - 1, 0, M - 1)
            word = codes_ref[g, r0 // ROWS_PER_WORD, kc]
            rr = r0 % ROWS_PER_WORD
            code = (word >> (2 * rr)) & 3
            # match-run skip: groups 0..rr of this word cover rows down the
            # same band column (diagonal moves keep k). below==0 -> all are
            # matches; else skip the zero groups above the highest set bit.
            mask = jnp.where(
                rr >= 15, jnp.int32(-1), (jnp.int32(1) << (2 * rr + 2)) - 1
            )
            below = word & mask
            # coarse msb of `below`: 2 binary-search steps (byte, then
            # nibble granularity) + conservative round-up. The walk body
            # is scalar-ISSUE-bound (~40 ops/step), so the exact 5-step
            # search cost more than its extra skip distance bought; the
            # coarse skip keeps whole-word jumps exact and partial-word
            # jumps within 1 row of exact.
            vu = below.astype(jnp.uint32)
            ex = jnp.int32(0)
            for sh in (16, 8):
                c = (vu >> sh) != 0
                ex = ex + jnp.where(c, sh, 0)
                vu = jnp.where(c, vu >> sh, vu)
            # msb is in [ex, ex+7]; round up -> never skip past it
            run0 = jnp.where(below == 0, rr + 1, rr - (ex + 7) // 2)
            can_skip = in_main & (code == 0)
            skip = jnp.clip(run0, 1, jnp.minimum(i, j))
            r = jnp.where(in_main, code, jnp.where(i > 0, 3, 2))
            count = jnp.where(can_skip, skip, 1)
            # RLE emit on state change (read-modify-preserve writes)
            emit = alive & (op != -1) & (r != op)
            slot = jnp.clip(n, 0, RCAP - 1)
            runs_ref[g, 0, slot] = jnp.where(
                emit, (op << 28) | ln, runs_ref[g, 0, slot]
            )
            n2 = n + emit.astype(jnp.int32)
            ov = ovfs[g] | (emit & (n >= RCAP))
            ln2 = jnp.where(
                alive, jnp.where(emit | (op == -1), count, ln + count), ln
            )
            op2 = jnp.where(alive, r, op)
            d2 = dists[g] + jnp.where(alive & (r != 0), count, 0)
            e2 = edges[g] | (in_main & ((k == 0) | (k == W - 1)))
            di = jnp.where(r == 2, 0, count) * alive.astype(jnp.int32)
            dj = jnp.where(r == 3, 0, count) * alive.astype(jnp.int32)
            nis.append(i - di)
            njs.append(j - dj)
            nns.append(n2)
            nops.append(op2)
            nlens.append(ln2)
            ndis.append(d2)
            neds.append(e2)
            novs.append(ov)
        return (
            tuple(nis), tuple(njs), tuple(nns), tuple(nops), tuple(nlens),
            tuple(ndis), tuple(neds), tuple(novs),
        )

    init = (
        tuple(qls), tuple(tls),
        tuple(jnp.int32(0) for _ in rg),
        tuple(jnp.int32(-1) for _ in rg),
        tuple(jnp.int32(0) for _ in rg),
        tuple(jnp.int32(0) for _ in rg),
        tuple(jnp.bool_(False) for _ in rg),
        tuple(jnp.bool_(False) for _ in rg),
    )
    def body2(c):
        return body(body(c))

    iis, jjs, ns, ops, lens, dists, edges, ovfs = jax.lax.while_loop(
        cond, body2, init
    )
    for g in rg:
        # flush the final run
        has = ops[g] != -1
        slot = jnp.clip(ns[g], 0, RCAP - 1)
        runs_ref[g, 0, slot] = jnp.where(
            has, (ops[g] << 28) | lens[g], runs_ref[g, 0, slot]
        )
        nf = ns[g] + has.astype(jnp.int32)
        nruns_ref[g, 0, 0] = nf
        dist_ref[g, 0, 0] = dists[g]
        edge_ref[g, 0, 0] = edges[g].astype(jnp.int32)
        ovf_ref[g, 0, 0] = (ovfs[g] | (has & (ns[g] >= RCAP))).astype(jnp.int32)


LANES = 128      # alignments per lockstep group (vector lanes)
CHUNK_WORDS = 4  # code words per DMA'd row chunk (64 rows)


def _rle_lockstep_kernel(
    qlen_ref, tlen_ref, dlo_ref,   # blocked (1, 1, LANES) i32
    codes_h,                       # ANY (NGRP, M16, Wb, LANES); blocked INTERP
    runs_ref,                      # out (1, RCAP, LANES)
    nruns_ref, dist_ref, edge_ref, ovf_ref,  # out (1, 1, LANES)
    buf,                           # VMEM (CHUNK_WORDS, Wb, LANES)
    sem,
    *, M: int, Wb: int, RCAP: int, INTERP: bool,
):
    """Lockstep RLE traceback: one alignment per vector lane, 128 per grid
    step. The r4 kernel walked G = 2-3 interleaved SCALAR chains per step
    (~40 scalar-issue-bound ops per walk step per alignment) and made the
    full aligner pipeline traceback-bound (12.8 vs 44 Gcells/s forward,
    VERDICT r5 #4). Here the walk is vectorized exactly like the POA
    lockstep traceback (ops/poa_lockstep_pallas._tb_kernel): rows only
    decrease, so a descending sweep over 64-row code chunks DMA'd from
    HBM lets every lane whose cursor is inside the chunk step in
    lockstep; the per-lane code fetch is a one-hot gather over the band
    columns (~3 cycles/alignment/step). Match-run skipping and the RLE
    emission semantics are IDENTICAL to _rle_kernel — run boundaries are
    invariant to skip chunking, so outputs are bit-equal."""
    g = pl.program_id(0)
    CW = CHUNK_WORDS
    rows_per_chunk = CW * ROWS_PER_WORD

    def iota2(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)

    iota_wb = iota2(Wb)
    iota_rcap = iota2(RCAP)
    i0 = qlen_ref[0, pl.ds(0, 1), :]
    j0 = tlen_ref[0, pl.ds(0, 1), :]
    dlo = dlo_ref[0, pl.ds(0, 1), :]
    runs_ref[0] = jnp.zeros((RCAP, LANES), jnp.int32)
    sm = jnp.int32(_SRC_TAG)  # cache-key versioning

    start_c = jnp.maximum(jnp.max((i0 - 1) // rows_per_chunk), 0)
    n_chunks = start_c + 1

    def step(c, carry):
        i, j, n, op, ln, dist, edge, ovf, steps = carry
        alive = (i > 0) | (j > 0)
        r0 = jnp.clip(i - 1, 0, M - 1)
        inchunk = alive & (((r0 // rows_per_chunk) == c) | (i == 0))
        k = j - i - dlo
        kc = jnp.clip(k, 0, Wb - 1)
        crow = jnp.clip(r0 - c * rows_per_chunk, 0, rows_per_chunk - 1)
        wplane = crow // ROWS_PER_WORD
        colw = [
            jnp.sum(jnp.where(iota_wb == kc, buf[p], 0), axis=0,
                    keepdims=True)
            for p in range(CW)
        ]
        word = colw[0]
        for p in range(1, CW):
            word = jnp.where(wplane == p, colw[p], word)
        rr = r0 % ROWS_PER_WORD
        code = (word >> (2 * rr)) & 3
        in_main = (i > 0) & (j > 0)
        # match-run skip (same coarse-msb logic as _rle_kernel, but
        # elementwise on (1, LANES))
        mask = jnp.where(
            rr >= 15, jnp.int32(-1), (jnp.int32(1) << (2 * rr + 2)) - 1
        )
        below = word & mask
        vu = below.astype(jnp.uint32)
        ex = jnp.zeros_like(i)
        for sh in (16, 8):
            cset = (vu >> sh) != 0
            ex = ex + jnp.where(cset, sh, 0)
            vu = jnp.where(cset, vu >> sh, vu)
        run0 = jnp.where(below == 0, rr + 1, rr - (ex + 7) // 2)
        can_skip = in_main & (code == 0)
        skip = jnp.clip(run0, 1, jnp.minimum(i, j))
        r = jnp.where(in_main, code, jnp.where(i > 0, 3, 2))
        count = jnp.where(can_skip, skip, 1)
        act = inchunk & alive
        emit = act & (op != -1) & (r != op)
        slot = jnp.clip(n, 0, RCAP - 1)
        runs_ref[0] = jnp.where(
            (iota_rcap == slot) & emit, (op << 28) | ln, runs_ref[0]
        )
        ovf = ovf | (emit & (n >= RCAP)).astype(jnp.int32)
        n = n + emit.astype(jnp.int32)
        ln = jnp.where(act, jnp.where(emit | (op == -1), count, ln + count),
                       ln)
        op = jnp.where(act, r, op)
        dist = dist + jnp.where(act & (r != 0), count, 0)
        edge = edge | (act & in_main & ((k == 0) | (k == Wb - 1))).astype(
            jnp.int32
        )
        di = jnp.where(r == 2, 0, count) * act.astype(jnp.int32)
        dj = jnp.where(r == 3, 0, count) * act.astype(jnp.int32)
        return (i - di, j - dj, n, op, ln, dist, edge, ovf, steps + 1)

    def chunk_body(t, carry):
        c = start_c - t
        if INTERP:
            buf[...] = codes_h[0, pl.ds(c * CW, CW), :, :]
        else:
            cp = pltpu.make_async_copy(
                codes_h.at[g, pl.ds(c * CW, CW)], buf, sem
            )
            cp.start()
            cp.wait()

        def w_cond(carry):
            i, j = carry[0], carry[1]
            steps = carry[8]
            alive = (i > 0) | (j > 0)
            r0 = jnp.clip(i - 1, 0, M - 1)
            inc = alive & (((r0 // rows_per_chunk) == c) | (i == 0))
            return jnp.any(inc) & (steps < 2 * M + 4)

        return jax.lax.while_loop(w_cond, lambda cr: step(c, cr), carry)

    z = jnp.zeros((1, LANES), jnp.int32)
    # flags ride the loop carry as int32: Mosaic fails to legalize
    # scf.for with i1-vector carries ("failed to legalize 'scf.for'")
    carry = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (i0, j0, z, jnp.full((1, LANES), -1, jnp.int32), z, z + sm * 0,
         z, z, jnp.int32(0)),
    )
    i, j, n, op, ln, dist, edge, ovf, _ = carry
    has = op != -1
    slot = jnp.clip(n, 0, RCAP - 1)
    runs_ref[0] = jnp.where(
        (iota_rcap == slot) & has, (op << 28) | ln, runs_ref[0]
    )
    nruns_ref[0, pl.ds(0, 1), :] = n + has.astype(jnp.int32)
    dist_ref[0, pl.ds(0, 1), :] = dist
    edge_ref[0, pl.ds(0, 1), :] = edge
    ovf_ref[0, pl.ds(0, 1), :] = ovf | (has & (n >= RCAP)).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("band_width", "rcap", "interpret")
)
def rle_traceback_lockstep_pallas(
    codes: jnp.ndarray,   # (B, M/16, W) int32 packed codes (device-resident)
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    dlo: jnp.ndarray,
    band_width: int,
    # the RLE emit is a one-hot scatter over rcap sublanes (rcap/8 vregs
    # per emitting step) and the runs D2H is rcap*4 B/alignment, so the
    # default is sized to realistic CIGARs (~2x mismatches + 1 runs);
    # overflowing alignments fall back to the host walk per the ovf flag
    rcap: int = 512,
    interpret: bool | None = None,
):
    """Lockstep (128 alignments/group) device RLE traceback. Same contract
    and bit-identical outputs to rle_traceback_pallas; preferred at batch
    scale (the scalar-chain kernel stays for small batches)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, M16, Wb = codes.shape
    if Wb != band_width:
        raise ValueError("codes width != band_width")
    assert M16 % CHUNK_WORDS == 0
    M = M16 * ROWS_PER_WORD
    pad = (-B) % LANES
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, M16, Wb), codes.dtype)]
        )
        zi = jnp.zeros((pad,), jnp.int32)
        qlen = jnp.concatenate([qlen.astype(jnp.int32), zi])
        tlen = jnp.concatenate([tlen.astype(jnp.int32), zi])
        dlo = jnp.concatenate([dlo.astype(jnp.int32), zi])
    Bp = B + pad
    NGRP = Bp // LANES
    # lane-last plane layout (alignment = lane), one XLA transpose
    codes_pl = jnp.transpose(
        codes.reshape(NGRP, LANES, M16, Wb), (0, 2, 3, 1)
    )
    col = lambda v: jnp.transpose(
        v.astype(jnp.int32).reshape(NGRP, LANES, 1), (0, 2, 1)
    )
    b1 = lambda *s: pl.BlockSpec((1,) + s, lambda b: (b,) + (0,) * len(s))
    codes_spec = (
        b1(M16, Wb, LANES) if interpret
        else pl.BlockSpec(memory_space=pl.ANY)
    )
    kernel = functools.partial(
        _rle_lockstep_kernel, M=M, Wb=Wb, RCAP=rcap, INTERP=interpret
    )
    runs, nruns, dist, edge, ovf = pl.pallas_call(
        kernel,
        grid=(NGRP,),
        in_specs=[b1(1, LANES), b1(1, LANES), b1(1, LANES), codes_spec],
        out_specs=(
            b1(rcap, LANES), b1(1, LANES), b1(1, LANES), b1(1, LANES),
            b1(1, LANES),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NGRP, rcap, LANES), jnp.int32),
            jax.ShapeDtypeStruct((NGRP, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((NGRP, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((NGRP, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((NGRP, 1, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK_WORDS, Wb, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(col(qlen), col(tlen), col(dlo), codes_pl)
    runs = jnp.transpose(runs, (0, 2, 1)).reshape(Bp, rcap)
    flat = lambda v: jnp.transpose(v, (0, 2, 1)).reshape(Bp)
    return (
        runs[:B], flat(nruns)[:B], flat(dist)[:B],
        flat(edge)[:B] != 0, flat(ovf)[:B] != 0,
    )


def rle_traceback_fits(M: int, W: int) -> bool:
    """Whether one alignment's packed codes fit the kernel's SMEM block
    (long-sequence buckets fall back to the host walk over sliced codes)."""
    M16 = (M + ROWS_PER_WORD - 1) // ROWS_PER_WORD
    return M16 * W * 4 * 2 <= 800 * 1024


@functools.partial(
    jax.jit, static_argnames=("band_width", "rcap", "interpret")
)
def rle_traceback_pallas(
    codes: jnp.ndarray,   # (B, M/16, W) int32 packed codes (device-resident)
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    dlo: jnp.ndarray,
    band_width: int,
    rcap: int = 1024,
    interpret: bool | None = None,
):
    """Device-side RLE traceback over packed 2-bit codes. Returns
    (runs (B, rcap) int32 = (state << 28)|len in BACKWARD path order,
    nruns (B,), dist (B,), edge (B,) bool, overflow (B,) bool)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, M16, W = codes.shape
    if W != band_width:
        raise ValueError("codes width != band_width")
    M = M16 * ROWS_PER_WORD
    # G alignments walk per grid step; the codes SMEM block (G, M16, W)
    # is the constraint (1 MB SMEM total)
    blk = M16 * W * 4
    if not rle_traceback_fits(M, W):
        raise ValueError(
            "codes block exceeds SMEM; use the host traceback for this "
            "shape (Aligner does this automatically)"
        )
    G = 1
    for cand in (3, 2):
        if cand * blk * 2 <= 800 * 1024:  # x2 input buffering
            G = cand
            break
    pad = (-B) % G
    if pad:
        # grid padding: qlen == 0 rows finish their walk immediately
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, M16, W), codes.dtype)]
        )
        zi = jnp.zeros((pad,), jnp.int32)
        qlen = jnp.concatenate([qlen.astype(jnp.int32), zi])
        tlen = jnp.concatenate([tlen.astype(jnp.int32), zi])
        dlo = jnp.concatenate([dlo.astype(jnp.int32), zi])
    Bp = B + pad

    kernel = functools.partial(
        _rle_kernel, M=M, W=W, RCAP=rcap, G=G
    )
    col = lambda v: v.astype(jnp.int32).reshape(Bp, 1, 1)
    runs, nruns, dist, edge, ovf = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (G, M16, W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((G, 1, rcap), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1, rcap), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(col(qlen), col(tlen), col(dlo), codes)
    return (
        runs[:B, 0, :], nruns[:B, 0, 0], dist[:B, 0, 0],
        edge[:B, 0, 0] != 0, ovf[:B, 0, 0] != 0,
    )
