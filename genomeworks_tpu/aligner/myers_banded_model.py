"""Bit-parallel banded Myers — NumPy word model (the semantic reference
for the Pallas kernel in ops/myers_banded_pallas.py).

Transposed Myers (Hyyrö bit-vectors with pattern = TARGET, text = QUERY):
the serial loop runs over query rows i, and the bit dimension runs over
band-shifted target positions xs = j - dlo, so

- after processing row i, ``PV``/``MV`` hold the horizontal deltas
  D(i, j) - D(i, j-1) in {+1, -1}-bit form — exactly the "insertion"
  condition cur == left + 1 of the banded DP;
- ``Ph`` during row i holds the vertical deltas D(i, j) - D(i-1, j) —
  exactly the "deletion" condition cur == up + 1;

so the 2-bit AlignmentState codes (priority insertion > deletion >
diagonal, identical to aligner.banded_nw) fall out of the bit vectors:
code = PV ? 2 : Ph ? 3 : (Eq ? 0 : 1). Codes are emitted for band
positions k = xs - i in [0, W) and packed into the SAME row-major
(B, M/16, W) plane layout as banded_nw_forward_pallas, so the device RLE
traceback and the whole Aligner retry protocol run unchanged.

Boundary semantics: virtual cells (j < 1, j > tlen, rows past qlen) carry
Eq = 0, which makes them behave as the classic NW boundaries (D(0,j)=j by
PV init, D(i,0)=i by the carry-in 1) — a full-matrix-exact unit-cost DP,
not the INF-clamped band of banded_nw. Inside the band the two agree
wherever the band covers the optimal path's dependency cone; paths that
touch the band edge set the edge flag and retry wider (the Aligner's
existing protocol), identical to the reference's approximate banded Myers
(cudaaligner myers_gpu.cu banded kernel + is_optimal metadata).

Reference analogue: cudaaligner/src/myers_gpu.cu:78-132 (bit-vector
blocks), :629-862 (banded kernel). 32 cells per int32 word op.
"""

from __future__ import annotations

import numpy as np

from genomeworks_tpu.aligner.banded_nw import band_offset

ROWS_PER_WORD = 16  # 2-bit codes packed per int32 plane word (output)
WBITS = 32


def _add_carry(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Multi-word addition a + b over uint32 word arrays (..., NW) with
    word 0 = least significant. Ripple carry (vectorized over leading
    dims)."""
    out = np.zeros_like(a)
    carry = np.zeros(a.shape[:-1], dtype=np.uint64)
    for w in range(a.shape[-1]):
        s = a[..., w].astype(np.uint64) + b[..., w].astype(np.uint64) + carry
        out[..., w] = (s & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        carry = s >> np.uint64(32)
    return out


def _shl1(x: np.ndarray, carry_in: np.ndarray | int) -> np.ndarray:
    """(x << 1) across words with carry_in into bit 0 of word 0."""
    out = np.empty_like(x)
    out[..., 0] = (x[..., 0] << np.uint32(1)) | np.uint32(0)
    if x.shape[-1] > 1:
        out[..., 1:] = (x[..., 1:] << np.uint32(1)) | (
            x[..., :-1] >> np.uint32(31)
        )
    cin = np.asarray(carry_in, dtype=np.uint32)
    out[..., 0] |= cin
    return out


def myers_banded_codes(
    q: np.ndarray,  # (B, M) base codes, 0-padded
    t: np.ndarray,  # (B, N)
    qlen: np.ndarray,
    tlen: np.ndarray,
    band_width: int,
    windowed: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Forward pass; returns (packed codes (B, M16, W) int32 — identical
    layout/semantics contract to banded_nw_forward_pallas — and fits)."""
    B, M = q.shape
    W = band_width
    qlen = qlen.astype(np.int64)
    tlen = tlen.astype(np.int64)
    dlo = np.asarray(band_offset(qlen, tlen, W)).astype(np.int64)
    fits = W >= np.abs(tlen - qlen) + 1

    # bit axis: xs = j - dlo in [0, XS); j = xs + dlo
    XS = M + W + 2 * WBITS
    NW = (XS + WBITS - 1) // WBITS

    xs = np.arange(XS, dtype=np.int64)
    j = xs[None, :] + dlo[:, None]  # (B, XS)
    jvalid = (j >= 1) & (j <= tlen[:, None])
    tchar = np.take_along_axis(
        t.astype(np.int64), np.clip(j - 1, 0, t.shape[1] - 1), axis=1
    )
    tb0 = ((tchar & 1) != 0) & jvalid
    tb1 = ((tchar >> 1) & 1 != 0) & jvalid

    def pack_bits(bits):  # (B, XS) bool -> (B, NW) uint32
        pad = NW * WBITS - XS
        b = np.pad(bits, ((0, 0), (0, pad)))
        b = b.reshape(B, NW, WBITS)
        return (b.astype(np.uint32) << np.arange(WBITS, dtype=np.uint32)).sum(
            axis=2, dtype=np.uint32
        )

    TB0 = pack_bits(tb0)
    TB1 = pack_bits(tb1)
    VAL = pack_bits(jvalid)
    PV = pack_bits(j >= 1)  # D(0, j) - D(0, j-1) = +1 for j >= 1
    MV = np.zeros_like(PV)

    M16 = (M + ROWS_PER_WORD - 1) // ROWS_PER_WORD
    planes = np.zeros((B, M16, W), dtype=np.uint32)

    k_idx = np.arange(W, dtype=np.int64)
    ones = np.uint32(0xFFFFFFFF)

    for i in range(1, M + 1):
        qc = q[:, i - 1].astype(np.uint32)
        s0 = np.where((qc & 1) != 0, ones, 0).astype(np.uint32)[:, None]
        s1 = np.where((qc >> 1) & 1 != 0, ones, 0).astype(np.uint32)[:, None]
        Eq = (~(TB0 ^ s0) & ~(TB1 ^ s1)) & VAL
        row_valid = i <= qlen
        Eq = np.where(row_valid[:, None], Eq, 0).astype(np.uint32)

        Xv = Eq | MV
        Xh = (_add_carry(Eq & PV, PV) ^ PV) | Eq
        Ph = MV | ~(Xh | PV)
        Mh = PV & Xh
        PhS = _shl1(Ph, 1)  # carry-in 1: left boundary D(i,0)-D(i-1,0)=+1
        MhS = _shl1(Mh, 0)
        PVn = MhS | ~(Xv | PhS)
        MVn = PhS & Xv

        # 2-bit codes for band positions k = xs - i in [0, W)
        ins = PVn
        dele = Ph
        eq = Eq
        # extract band window bits [i, i+W) from the word arrays
        w0 = i // WBITS
        sh = i % WBITS
        nsel = W // WBITS + 1

        def window(bits):
            lo = bits[:, w0 : w0 + nsel]
            hi = bits[:, w0 + 1 : w0 + 1 + nsel]
            if hi.shape[1] < nsel:
                hi = np.pad(hi, ((0, 0), (0, nsel - hi.shape[1])))
            if sh == 0:
                win = lo
            else:
                win = (lo >> np.uint32(sh)) | (hi << np.uint32(WBITS - sh))
            win = win[:, : W // WBITS]
            # unpack to (B, W) bools
            return (
                (win[:, :, None] >> np.arange(WBITS, dtype=np.uint32)) & 1
            ).reshape(B, W).astype(bool)

        insb = window(ins)
        delb = window(dele)
        eqb = window(eq)
        code = np.where(insb, 2, np.where(delb, 3, np.where(eqb, 0, 1)))
        code = np.where(row_valid[:, None], code, 0).astype(np.uint32)
        planes[:, (i - 1) // ROWS_PER_WORD, :] |= code << np.uint32(
            2 * ((i - 1) % ROWS_PER_WORD)
        )

        PV, MV = PVn, MVn

        if windowed:
            # kernel window semantics: words outside the live window are
            # replaced by the off-band steady states — ABOVE (right of the
            # band): PV=1, MV=0 (horizontal +1 region); BELOW (left):
            # PV=0, MV=1 (horizontal -1 region; crucially generates no add
            # carries, so the carry entering the window is deterministic).
            # One slack word below + two above keep the injected boundary
            # >= 32 bits away from the band.
            BELOW = 1
            WW = W // WBITS + 2 + BELOW
            wlo = max(0, (i + 1) // WBITS - BELOW)  # next row's window
            mask = np.zeros(NW, dtype=bool)
            mask[wlo : wlo + WW] = True
            above = np.zeros(NW, dtype=bool)
            above[wlo + WW :] = True
            PV = np.where(
                mask[None, :], PV, np.where(above[None, :], ones, 0)
            ).astype(np.uint32)
            MV = np.where(
                mask[None, :], MV, np.where(above[None, :], 0, ones)
            ).astype(np.uint32)

    return planes.astype(np.int32), fits
