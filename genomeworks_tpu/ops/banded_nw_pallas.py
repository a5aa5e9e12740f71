"""Pallas TPU kernel for the batched banded edit-distance wavefront.

Same math and tie-breaking as genomeworks_tpu.aligner.banded_nw (the XLA
scan version) — see that module for the band-coordinate derivation — but
with the DP state held in VMEM across the whole row sweep:

- grid = (batch_blocks, row_blocks); row blocks iterate fastest, so the
  band row vector (``prev``) lives in a VMEM scratch carried across row
  blocks of the same batch block;
- per row, the in-row insertion closure ``cur[k]=min(base[k],cur[k-1]+1)``
  is computed as a logarithmic shift-min doubling (prefix min of
  ``base[k]-k``), 100% VPU work, no gathers;
- traceback move codes are 2 bits per cell, PACKED 16 rows per int32 plane
  (pure int32 kernel: native (8,128) tiling, no relayouts, 4x less HBM
  traffic than an int8 code tensor), streamed out one row block at a time;
- batch block of 128 puts 32 vregs under every op of the serial dependency
  chain (row r+1 needs row r), which is what hides VPU latency — measured
  ~4.5x over an 8-sublane block;
- the target is pre-windowed outside the kernel into (M/R, B, R+W) via
  static slices so all VMEM loads are block-aligned (Mosaic requires
  provably 128-aligned dynamic lane offsets).

The edit distance is not computed in-kernel: it equals the number of
non-match moves on the traceback path, which the host extracts anyway.

Reference analogue: cudaaligner/src/myers_gpu.cu ``myers_banded_kernel``
(banded DP + in-band traceback bit-vectors); the TPU design replaces warps
and per-thread bit-words with lane-parallel band vectors. A bit-parallel
Myers variant (32 cells per int32 op) is the planned next optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomeworks_tpu.aligner.banded_nw import INF, band_offset

# cache-key versioning: see ops/poa_pallas.py _SRC_TAG
import zlib as _zlib
with open(__file__, "rb") as _f:
    _SRC_TAG = _zlib.crc32(_f.read()) & 0x7FFFFFFF

ROWS_PER_WORD = 16  # 2-bit codes, 16 rows packed per int32
R_BLOCK = 128  # rows per grid step
B_BLOCK = 128  # batch items per grid step


def _kernel(tlen_ref, dlo_ref, q_ref, win_ref, codes_ref, prev_ref, *, W: int, B_blk: int):
    mi = pl.program_id(1)
    R = R_BLOCK

    k_idx = jax.lax.broadcasted_iota(jnp.int32, (B_blk, W), 1)
    tlen = tlen_ref[:, :1]
    dlo = dlo_ref[:, :1]
    inf32 = jnp.int32(INF)

    @pl.when(mi == 0)
    def _init():
        j0 = dlo + k_idx + jnp.int32(_SRC_TAG) * 0  # cache-key versioning
        prev_ref[:, :] = jnp.where((j0 >= 0) & (j0 <= tlen), j0, inf32)

    i0 = mi * R
    window = win_ref[0]  # (B_blk, R+W): col r+k = t[j-1] for row i0+r+1
    qblk = q_ref[:, :]  # (B_blk, R)

    prev = prev_ref[:, :]
    acc = jnp.zeros((B_blk, W), jnp.int32)

    for r in range(R):
        i = i0 + r + 1  # 1-based DP row
        j = i + dlo + k_idx
        qi = qblk[:, r : r + 1]
        tj = window[:, r : r + W]
        sub = jnp.where(qi != tj, 1, 0)

        up = (
            jnp.concatenate([prev[:, 1:], jnp.full((B_blk, 1), inf32, jnp.int32)], axis=1)
            + 1
        )
        base = jnp.minimum(prev + sub, up)
        base = jnp.where(j == 0, i, base)
        base = jnp.where((j < 0) | (j > tlen), inf32, base)

        # prefix-min closure for in-row insertions (shift-min doubling)
        x = base - k_idx
        s = 1
        while s < W:
            shifted = jnp.concatenate(
                [jnp.full((B_blk, s), inf32, jnp.int32), x[:, : W - s]], axis=1
            )
            x = jnp.minimum(x, shifted)
            s *= 2
        cur = jnp.minimum(x + k_idx, inf32)

        left_p1 = (
            jnp.concatenate([jnp.full((B_blk, 1), inf32, jnp.int32), cur[:, :-1]], axis=1)
            + 1
        )
        # AlignmentState codes: 0=match 1=mismatch 2=insertion 3=deletion,
        # reference tie-break priority insertion > deletion > diagonal
        code = jnp.where(cur == left_p1, 2, jnp.where(cur == up, 3, sub))
        acc = acc | (code << (2 * (r % ROWS_PER_WORD)))
        if (r + 1) % ROWS_PER_WORD == 0:
            codes_ref[:, r // ROWS_PER_WORD, :] = acc
            acc = jnp.zeros((B_blk, W), jnp.int32)

        prev = cur

    prev_ref[:, :] = prev


@functools.partial(jax.jit, static_argnames=("band_width", "interpret"))
def banded_nw_forward_pallas(
    q: jnp.ndarray,  # (B, M) base codes
    t: jnp.ndarray,  # (B, N)
    qlen: jnp.ndarray,
    tlen: jnp.ndarray,
    band_width: int,
    interpret: bool | None = None,
):
    """Pallas banded DP. Returns (packed codes (B, M/16, W) int32 — 2-bit
    AlignmentState codes, DP row i stored in word (i-1)//16 at bits
    2*((i-1)%16) —, fits (B,) bool).

    Constraints: B % 8 == 0, W % 128 == 0, M % 128 == 0. Callers pad.
    ``interpret=None`` auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, M = q.shape
    N = t.shape[1]
    W = band_width
    if W % 128 != 0:
        raise ValueError(f"band_width must be a multiple of 128, got {W}")
    if M % R_BLOCK != 0:
        raise ValueError(f"M must be a multiple of {R_BLOCK}, got {M}")
    B_blk = B_BLOCK if B % B_BLOCK == 0 else 8
    if B % B_blk != 0:
        raise ValueError(f"B must be a multiple of 8, got {B}")

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    dlo = band_offset(qlen, tlen, W)
    fits = W >= jnp.abs(tlen - qlen) + 1

    # band-shifted target: ts[b, x] = t[b, x + dlo_b] (single gather), then
    # pre-windowed per row block with static slices (block-aligned loads)
    x_idx = jnp.arange(M + W, dtype=jnp.int32)
    ts = jnp.take_along_axis(
        t.astype(jnp.int32), jnp.clip(dlo[:, None] + x_idx[None, :], 0, N - 1), axis=1
    )
    R = R_BLOCK
    wins = jnp.stack(
        [jax.lax.slice_in_dim(ts, m * R, m * R + R + W, axis=1) for m in range(M // R)],
        axis=0,
    )  # (M/R, B, R+W)
    q32 = q.astype(jnp.int32)

    col = lambda v: v[:, None]
    grid = (B // B_blk, M // R)
    kernel = functools.partial(_kernel, W=W, B_blk=B_blk)
    MW = M // ROWS_PER_WORD

    codes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_blk, 1), lambda bi, mi: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_blk, 1), lambda bi, mi: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_blk, R), lambda bi, mi: (bi, mi), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, B_blk, R + W), lambda bi, mi: (mi, bi, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B_blk, R // ROWS_PER_WORD, W),
            lambda bi, mi: (bi, mi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, MW, W), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B_blk, W), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            # mid-sized launches otherwise get their whole output placed in
            # scoped VMEM and overflow the default 16MB accounting limit
            # (observed at B=128, M=512, W=128)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(col(tlen), col(dlo), q32, wins)

    return codes, fits


def traceback_host_packed(
    packed: np.ndarray,  # (B, M/16, W) int32
    qlen: np.ndarray,
    tlen: np.ndarray,
    dlo: np.ndarray,
    band_width: int,
) -> tuple[list[np.ndarray], np.ndarray]:
    """Vectorized host traceback over packed 2-bit codes. Same walk and
    edge detection as aligner.banded_nw.traceback_host."""
    B = packed.shape[0]
    W = band_width
    M16 = packed.shape[1]
    i = qlen.astype(np.int64).copy()
    j = tlen.astype(np.int64).copy()
    L = int((qlen + tlen).max(initial=0))
    out = np.zeros((B, max(L, 1)), dtype=np.int8)
    pos = np.zeros(B, dtype=np.int64)
    edge = np.zeros(B, dtype=bool)
    batch_idx = np.arange(B)

    active = (i > 0) | (j > 0)
    while active.any():
        k = j - i - dlo
        in_main = (i > 0) & (j > 0)
        kc = np.clip(k, 0, W - 1).astype(np.int64)
        row0 = np.clip(i - 1, 0, M16 * ROWS_PER_WORD - 1).astype(np.int64)
        word = packed[batch_idx, row0 // ROWS_PER_WORD, kc]
        code = (word >> (2 * (row0 % ROWS_PER_WORD))) & 3
        r = np.where(in_main, code, np.where(i > 0, 3, 2)).astype(np.int8)
        edge |= in_main & ((k == 0) | (k == W - 1))
        out[batch_idx[active], pos[active]] = r[active]
        di = np.where(r == 2, 0, 1) * active
        dj = np.where(r == 3, 0, 1) * active
        i -= di
        j -= dj
        pos += active
        active = (i > 0) | (j > 0)

    paths = [out[b, : pos[b]][::-1].copy() for b in range(B)]
    return paths, edge
