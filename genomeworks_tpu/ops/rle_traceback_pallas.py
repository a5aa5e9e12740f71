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
