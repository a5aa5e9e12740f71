"""Pallas TPU kernel: bit-parallel banded Myers forward pass.

32 DP cells per int32 op (Hyyrö bit-vectors), the TPU re-design of the
reference's warp-cooperative banded Myers (cudaaligner/src/myers_gpu.cu:
78-132 bit blocks, :629-862 banded kernel). Semantics are defined by —
and bit-identical to — aligner/myers_banded_model.py (windowed=True),
which in turn yields traceback paths identical to the full-matrix NW
oracle whenever the path stays off the band edge (the Aligner's existing
edge-retry protocol covers the rest).

Layout: the serial grid loop runs over query rows (transposed Myers);
state words PV/MV live in VMEM as (words, 128-batch) with the 32-bit word
dimension on sublanes; per row the kernel slices the live word window
(band width/32 + 3 words), computes Eq from pre-shifted target bit tables
(band offset dlo absorbed host-side, so all in-kernel scheduling is
batch-uniform), performs the multi-word add with a Kogge-Stone carry
prefix over sublanes, and emits 2-bit AlignmentState codes column-major.
An XLA repack (pure vector ops) shears the column-major planes into the
row-major packed layout of banded_nw_forward_pallas, so the device RLE
traceback (ops/rle_traceback_pallas.py) and the whole Aligner pipeline
run unchanged.
"""

from __future__ import annotations

import functools
import zlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomeworks_tpu.aligner.banded_nw import band_offset

with open(__file__, "rb") as _f:
    _SRC_TAG = zlib.crc32(_f.read()) & 0x7FFFFFFF

ROWS_PER_WORD = 16  # output plane packing (2-bit codes)
WBITS = 32
R_BLOCK = 128
B_BLOCK = 128


def _roundup8(x):
    return ((x + 7) // 8) * 8


def _shift_down(x, s, fill=0):
    """Shift words toward higher index by s sublanes (word w reads w-s)."""
    if s == 0:
        return x
    pad = jnp.full((s, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([pad, x[:-s, :]], axis=0)


def _srl(x, n):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _kernel(
    qT_ref,    # (R_BLOCK, 128) query chars, transposed block
    qlen_ref,  # (1, 128)
    tb0_ref, tb1_ref, val_ref, pv0_ref,  # (NW, 128) word tables
    c0_ref, c1_ref,  # out (R_BLOCK, WWS, 128) column-major code bit planes
    pv_s, mv_s,      # scratch (NW, B_BLK)
    *, WWS: int, NW: int, B_BLK: int,
):
    mi = pl.program_id(1)
    mone = jnp.int32(-1)

    @pl.when(mi == 0)
    def _init():
        pv_s[:, :] = pv0_ref[:, :] | (jnp.int32(_SRC_TAG) & jnp.int32(0))
        mv_s[:, :] = jnp.zeros((NW, B_BLK), jnp.int32)

    i0 = mi * R_BLOCK
    qlen = qlen_ref[:, :]  # (1, 128)

    # The word window advances one word every WBITS rows, so the block's
    # rows split into R_BLOCK//WBITS + 1 segments with a CONSTANT window
    # base each. The dynamic sublane slices (6 loads + 2 stores) are
    # hoisted out of the row loop, the window state lives in registers
    # across a segment, and the working window is padded to a sublane-tile
    # multiple (WWP = roundup(WWS, 8)) so every per-row vector op is
    # tile-aligned. Segment seg covers rows i with i // WBITS ==
    # R_BLOCK//WBITS * mi + seg; base = max(that - 1, 0) (the per-row
    # formula). Table/state buffers are allocated NW + tile padding deep,
    # so the padded slices never run past the buffer.
    WWP = _roundup8(WWS)
    q0 = (R_BLOCK // WBITS) * mi
    seg_rows = [range(0, WBITS - 1)] + [
        range(WBITS * t - 1, min(WBITS * (t + 1) - 1, R_BLOCK))
        for t in range(1, R_BLOCK // WBITS + 1)
    ]
    for seg, rows in enumerate(seg_rows):
        wb = jnp.maximum(q0 + seg - 1, 0)
        sl = pl.ds(wb, WWP)
        tb0 = tb0_ref[sl, :]
        tb1 = tb1_ref[sl, :]
        val = val_ref[sl, :]
        pv = pv_s[sl, :]
        mv = mv_s[sl, :]

        for r in rows:
            i = i0 + r + 1  # 1-based DP row

            qrow = qT_ref[pl.ds(r, 1), :]  # (1, 128)
            s0 = jnp.int32(0) - (qrow & 1)
            s1 = jnp.int32(0) - ((qrow >> 1) & 1)
            rv = jnp.int32(0) - (i <= qlen).astype(jnp.int32)  # row valid

            eq = (~(tb0 ^ s0)) & (~(tb1 ^ s1)) & val & rv

            xv = eq | mv
            a = eq & pv
            s = a + pv  # per-word sum (wraps)
            # carry generate/propagate, Kogge-Stone prefix over words
            g = (s.astype(jnp.uint32) < a.astype(jnp.uint32)).astype(jnp.int32)
            p = (s == mone).astype(jnp.int32)
            G, P = g, p
            step = 1
            while step < WWS:
                G = G | (P & _shift_down(G, step))
                P = P & _shift_down(P, step)
                step *= 2
            carry = _shift_down(G, 1)  # carry into word w from below
            s = s + carry
            xh = (s ^ pv) | eq
            ph = mv | ~(xh | pv)
            mh = pv & xh

            # (x << 1) across words; shift-in bits at the window base are
            # the off-band steady state: Ph_in = 1, Mh_in = 0
            ph_lo = _shift_down(_srl(ph, 31), 1, fill=1)
            mh_lo = _shift_down(_srl(mh, 31), 1, fill=0)
            phs = ((ph << 1) | ph_lo).astype(jnp.int32)
            mhs = ((mh << 1) | mh_lo).astype(jnp.int32)

            pv = mhs | ~(xv | phs)
            mv = phs & xv

            # 2-bit codes: 2=insertion (PVn), 3=deletion (Ph), 1=mismatch.
            # c1 = ins|del ; c0 = del&~ins | ~ins&~del&~eq
            ins = pv
            c1 = ins | ph
            c0 = (ph & ~ins) | (~ins & ~ph & ~eq)
            c0_ref[pl.ds(r, 1), :, :] = c0[None, :, :]
            c1_ref[pl.ds(r, 1), :, :] = c1[None, :, :]

        # only the live WWS words are written back: the padded tail words
        # were updated prematurely (their correct state is still the
        # off-band steady state until the window reaches them)
        pv_s[pl.ds(wb, WWS), :] = pv[:WWS, :]
        mv_s[pl.ds(wb, WWS), :] = mv[:WWS, :]


def _pack_bits_words(bits, NW):
    """(B, XS) bool -> (B, NW) int32 words, bit z at word z//32 bit z%32.

    log-tree combine (5 halving passes) instead of a 32-way shift/sum —
    ~2 full-array passes of VPU work instead of ~60."""
    B, XS = bits.shape
    b = jnp.pad(bits, ((0, 0), (0, NW * WBITS - XS))).astype(jnp.int32)
    x = b
    sh = 1
    while sh < WBITS:
        x = x.reshape(B, -1, 2)
        x = x[:, :, 0] | (x[:, :, 1] << sh)
        sh *= 2
    return x.reshape(B, NW)


@functools.partial(jax.jit, static_argnames=("band_width", "interpret"))
def myers_banded_forward_pallas(
    q: jnp.ndarray,  # (B, M) base codes
    t: jnp.ndarray,  # (B, N)
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    band_width: int,
    interpret: bool | None = None,
):
    """Bit-parallel banded Myers. Returns (packed codes (B, M/16, W) int32
    — same layout/contract as banded_nw_forward_pallas — and fits).

    Constraints: B % 128 == 0, W % 128 == 0, M % 128 == 0."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, M = q.shape
    N = t.shape[1]
    W = band_width
    if W % 128 or M % R_BLOCK or B % 128:
        raise ValueError("B % 128, W % 128 and M % 128 must all be 0")

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    dlo = band_offset(qlen, tlen, W).astype(jnp.int32)
    fits = W >= jnp.abs(tlen - qlen) + 1

    XS = M + W + 2 * WBITS
    NW = (XS + WBITS - 1) // WBITS
    WWS = W // WBITS + 3
    # tile-aligned working window + table padding (see _kernel); the
    # output planes are WWP deep, the repack reads only the WWS live words
    WWP = ((WWS + 7) // 8) * 8
    NWP = NW + (WWP - WWS)

    # pre-shifted target bit tables over xs = j - dlo (j = target column).
    # Built in the WORD domain: the target's base bits are packed once at
    # fixed alignment, then funnel-shifted per alignment by dlo-1 bits
    # (word gather of NW words + two shifts) — the naive per-bit
    # take_along_axis gather over XS columns was ~23 ms/1024 alignments,
    # ~2.5x the DP kernel itself. Validity masks (j in [1, tlen]) have a
    # closed word form, no bit packing at all. Bits outside [0, N) are 0
    # here and masked by `val` in the kernel (as before).
    NWT = (N + WBITS - 1) // WBITS
    tb = t.astype(jnp.int32)
    T0 = _pack_bits_words((tb & 1) != 0, NWT)
    T1 = _pack_bits_words(((tb >> 1) & 1) != 0, NWT)
    s = dlo - 1  # target-bit position of word 0 bit 0: p = 32w + z + s
    qw = jnp.floor_divide(s, WBITS)
    rb = (s - qw * WBITS)[:, None]  # 0..31
    w_ids = jnp.arange(NW, dtype=jnp.int32)[None, :] + qw[:, None]

    def gword(T, ids):
        ok = (ids >= 0) & (ids < NWT)
        g = jnp.take_along_axis(T, jnp.clip(ids, 0, NWT - 1), axis=1)
        return jnp.where(ok, g, 0)

    def funnel(T):
        lo = gword(T, w_ids)
        hi = gword(T, w_ids + 1)
        lo_s = jax.lax.shift_right_logical(lo, jnp.broadcast_to(rb, lo.shape))
        hi_s = jnp.where(rb == 0, 0, hi << (WBITS - rb))
        return lo_s | hi_s

    TB0 = funnel(T0)
    TB1 = funnel(T1)
    # closed-form validity: bit z of word w covers j = 32w + z + dlo
    wv = (jnp.arange(NW, dtype=jnp.int32) * WBITS)[None, :]
    a = jnp.clip(1 - dlo[:, None] - wv, 0, WBITS)
    b2 = jnp.clip(tlen[:, None] - dlo[:, None] - wv + 1, 0, WBITS)
    m_ge = jnp.where(a >= WBITS, 0, (-1) << a)       # bits z >= a
    m_le = jnp.where(b2 >= WBITS, -1, (1 << b2) - 1)  # bits z < b2
    VAL = m_ge & m_le
    PV0 = m_ge

    # pad to NWP: tables with 0 (eq never set in the discarded tail), the
    # initial PV with the all-ones off-band steady state
    pad = ((0, 0), (0, NWP - NW))
    TB0 = jnp.pad(TB0, pad)
    TB1 = jnp.pad(TB1, pad)
    VAL = jnp.pad(VAL, pad)
    PV0 = jnp.pad(PV0, pad, constant_values=-1)

    # lanes = batch: transpose tables to (NWP, B) and q to (M, B)
    TB0t, TB1t, VALt, PV0t = (x.T for x in (TB0, TB1, VAL, PV0))
    qT = q.astype(jnp.int32).T  # (M, B)

    B_blk = B_BLOCK if B % B_BLOCK == 0 else 128
    grid = (B // B_blk, M // R_BLOCK)
    kernel = functools.partial(_kernel, WWS=WWS, NW=NWP, B_BLK=B_blk)
    c0, c1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R_BLOCK, B_blk), lambda bi, mi: (mi, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_blk), lambda bi, mi: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NWP, B_blk), lambda bi, mi: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NWP, B_blk), lambda bi, mi: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NWP, B_blk), lambda bi, mi: (0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NWP, B_blk), lambda bi, mi: (0, bi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_BLOCK, WWP, B_blk),
                         lambda bi, mi: (mi, 0, bi), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_BLOCK, WWP, B_blk),
                         lambda bi, mi: (mi, 0, bi), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, WWP, B), jnp.int32),
            jax.ShapeDtypeStruct((M, WWP, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NWP, B_blk), jnp.int32),
            pltpu.VMEM((NWP, B_blk), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qT, qlen[None, :], TB0t, TB1t, VALt, PV0t)

    codes = _repack_rowmajor(c0, c1, M, W, WWS)
    return codes, fits


def _repack_rowmajor(c0, c1, M: int, W: int, WWS: int):
    """Shear + transpose the column-major code bit planes (M, WWS, B) into
    the row-major packed layout (B, M/16, W). Chunked over M so the
    (B, Mc, W) unpack intermediate stays bounded (long-sequence support:
    a 128k-row alignment repacks in 512-row slices instead of
    materializing a (B, 128k, W) tensor)."""
    CHUNK = 512
    if M > CHUNK:
        parts = [
            _repack_chunk(
                jax.lax.slice_in_dim(c0, m, m + CHUNK, axis=0),
                jax.lax.slice_in_dim(c1, m, m + CHUNK, axis=0),
                m, CHUNK, W, WWS,
            )
            for m in range(0, M, CHUNK)
        ]
        return jnp.concatenate(parts, axis=1)
    return _repack_chunk(c0, c1, 0, M, W, WWS)


def _repack_chunk(c0, c1, i0: int, Mc: int, W: int, WWS: int):
    WB = W // WBITS
    i = i0 + jnp.arange(1, Mc + 1, dtype=jnp.int32)
    # window base word of row i in global words: max(i//32 - 1, 0)
    wbase = jnp.maximum(i // WBITS - 1, 0)
    # bit position of k=0 within the window: i - 32*wbase
    off = i - WBITS * wbase  # in [32, 63] (and [1,32] for early rows)
    osub = off // WBITS  # 0..2: word offset of k=0's word
    sh = off % WBITS

    def shear(c):  # (M, WWS, B) -> (M, WB, B) funnel to k-aligned words
        c = jnp.moveaxis(c, 2, 0)  # (B, M, WWS)
        # select starting word per row: osub in {0,1,2} -> static rolls
        outs = []
        for o in range(3):
            lo = c[:, :, o : o + WB]
            hi = c[:, :, o + 1 : o + 1 + WB]
            if lo.shape[2] < WB:
                lo = jnp.pad(lo, ((0, 0), (0, 0), (0, WB - lo.shape[2])))
            if hi.shape[2] < WB:
                hi = jnp.pad(hi, ((0, 0), (0, 0), (0, WB - hi.shape[2])))
            outs.append((lo, hi))
        osel = osub[None, :, None]
        lo = jnp.where(
            osel == 0, outs[0][0], jnp.where(osel == 1, outs[1][0], outs[2][0])
        )
        hi = jnp.where(
            osel == 0, outs[0][1], jnp.where(osel == 1, outs[1][1], outs[2][1])
        )
        shv = sh[None, :, None]
        lo_u = lo.astype(jnp.uint32)
        hi_u = hi.astype(jnp.uint32)
        win = jnp.where(
            shv == 0,
            lo_u,
            (lo_u >> shv.astype(jnp.uint32))
            | (hi_u << (WBITS - shv).astype(jnp.uint32)),
        )
        return win  # (B, M, WB) uint32, bit k%32 of word k//32 = cell k

    w0 = shear(c0)
    w1 = shear(c1)
    # word-domain 16x32 bit transpose + Morton interleave: output word
    # (b, m16, k) packs the 2-bit codes of rows 16*m16..+15 at column k.
    # The old path unpacked every CELL to an int32 ((B, Mc, WB, 32)
    # intermediates — ~0.5 GB per chunk at the bench shape); the masked
    # swap network runs entirely on the word arrays (32x smaller).
    B = w0.shape[0]
    M16 = Mc // ROWS_PER_WORD

    def transpose32(a):
        # (..., 32, WB): output bit r of row j = input bit j of row r
        for j, m in ((16, 0x0000FFFF), (8, 0x00FF00FF), (4, 0x0F0F0F0F),
                     (2, 0x33333333), (1, 0x55555555)):
            sh = a.shape
            g = a.reshape(sh[:-2] + (32 // (2 * j), 2, j) + sh[-1:])
            lo, hi = g[..., 0, :, :], g[..., 1, :, :]
            t = ((lo >> j) ^ hi) & jnp.uint32(m)
            a = jnp.stack(
                [lo ^ (t << j), hi ^ t], axis=-3
            ).reshape(sh)
        return a

    def spread16(x):
        x = x & jnp.uint32(0xFFFF)
        x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
        x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
        x = (x | (x << 2)) & jnp.uint32(0x33333333)
        x = (x | (x << 1)) & jnp.uint32(0x55555555)
        return x

    def tp(w):
        g = w.reshape(B, M16, ROWS_PER_WORD, WB)
        g = jnp.concatenate([g, jnp.zeros_like(g)], axis=2)
        return transpose32(g)

    out = spread16(tp(w0)) | (spread16(tp(w1)) << 1)
    out = jnp.moveaxis(out, 2, 3).reshape(B, M16, W)
    return out.astype(jnp.int32)
