"""Batched banded global alignment (unit-cost edit distance) — TPU-native.

This is the TPU re-design of the reference's banded Myers aligner
(cudaaligner/src/myers_gpu.cu:629-862 ``myers_banded_kernel``): same problem
(banded global edit-distance DP + in-band traceback + band-exceeded
detection), different architecture. Instead of warp-cooperative bit-vector
blocks with a device-side scheduling atomic, we run a fixed-shape wavefront:

- batch dimension B in sublanes, band dimension W in lanes;
- ``lax.scan`` over query rows; the within-row insertion dependency
  (``cur[k] = min(base[k], cur[k-1]+1)``) is solved in closed form as a
  prefix-min: ``cur[k] = k + cummin_k(base[k] - k)`` — an associative scan
  the VPU executes in one pass instead of a sequential loop;
- per-cell 2-bit move codes are emitted with the reference's exact traceback
  tie-break priority (myers_gpu.cu:281-299: insertion/left, then
  deletion/above, then diagonal), so backtraces are bit-identical to the
  reference whenever the band contains the optimal path;
- band-exceeded alignments are detected (path touches the band edge) and
  retried by the caller at a wider band, replacing the in-kernel
  widen-and-retry loop (myers_gpu.cu:56,988).

Band coordinates: k = j - i - dlo, with per-alignment diagonal offset
``dlo = min(0, tlen-qlen) - extra`` so both endpoints of the global path are
in-band whenever W >= |tlen-qlen| + 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomeworks_tpu.aligner.types import AlignmentState

INF = np.int32(1 << 24)

_MATCH = np.int8(AlignmentState.match)
_MISMATCH = np.int8(AlignmentState.mismatch)
_INSERTION = np.int8(AlignmentState.insertion)
_DELETION = np.int8(AlignmentState.deletion)


def band_offset(qlen: jnp.ndarray, tlen: jnp.ndarray, band_width: int) -> jnp.ndarray:
    """Per-alignment lowest band diagonal dlo (traced values, static W)."""
    diff = tlen - qlen
    extra = (band_width - 1 - jnp.abs(diff)) // 2
    return jnp.minimum(0, diff) - extra


@functools.partial(jax.jit, static_argnames=("band_width",))
def banded_nw_forward(
    q: jnp.ndarray,  # (B, M) uint8 base codes (padded)
    t: jnp.ndarray,  # (B, N) uint8 base codes (padded)
    qlen: jnp.ndarray,  # (B,) int32
    tlen: jnp.ndarray,  # (B,) int32
    band_width: int,
):
    """Run the banded DP. Returns (edit_distance (B,), move codes (M, B, W),
    fits_band (B,) bool). Move codes encode AlignmentState values chosen with
    the reference's tie-break priority."""
    B, M = q.shape
    W = band_width
    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    N = t.shape[1]

    dlo = band_offset(qlen, tlen, W)  # (B,)
    fits = W >= jnp.abs(tlen - qlen) + 1

    k_idx = jnp.arange(W, dtype=jnp.int32)  # (W,)

    # Row 0: scores(0, j) = j
    j0 = dlo[:, None] + k_idx[None, :]
    row0 = jnp.where((j0 >= 0) & (j0 <= tlen[:, None]), j0, INF).astype(jnp.int32)

    k_end = tlen - qlen - dlo  # final cell's band coordinate

    # Pre-shift targets into band coordinates ONCE (one gather), so each DP
    # row reads a contiguous slice: ts[b, x] = t[b, x + dlo_b]. Per-row
    # dynamic gathers scalarize on TPU; a batch-uniform dynamic_slice does
    # not. Out-of-range entries are masked via the j-bounds below.
    x_idx = jnp.arange(M + W, dtype=jnp.int32)
    ts = jnp.take_along_axis(
        t, jnp.clip(dlo[:, None] + x_idx[None, :], 0, N - 1), axis=1
    )  # (B, M+W)

    def row_step(carry, i):
        prev, final = carry  # prev: (B, W) int32 scores of row i-1
        j = i + dlo[:, None] + k_idx[None, :]  # (B, W)
        qi = jax.lax.dynamic_slice_in_dim(q, i - 1, 1, axis=1)  # (B, 1)
        tj = jax.lax.dynamic_slice_in_dim(ts, i - 1, W, axis=1)  # (B, W) = t[b, j-1]
        sub = (qi != tj).astype(jnp.int32)  # (B, W)

        diag = prev + sub
        up = jnp.concatenate([prev[:, 1:], jnp.full((B, 1), INF, jnp.int32)], axis=1) + 1
        base = jnp.minimum(diag, up)
        base = jnp.where(j == 0, i, base)
        base = jnp.where((j < 0) | (j > tlen[:, None]), INF, base)

        # insertion (left) closure: cur[k] = k + cummin(base[k] - k)
        cur = k_idx[None, :] + jax.lax.cummin(base - k_idx[None, :], axis=1)
        cur = jnp.minimum(cur, INF)

        left_p1 = (
            jnp.concatenate([jnp.full((B, 1), INF, jnp.int32), cur[:, :-1]], axis=1) + 1
        )
        code = jnp.where(
            cur == left_p1,
            _INSERTION,
            jnp.where(cur == up, _DELETION, jnp.where(sub == 0, _MATCH, _MISMATCH)),
        ).astype(jnp.int8)

        at_final = i == qlen  # (B,)
        # one-hot masked reduction instead of a per-item gather (gathers
        # scalarize on TPU; this is a pure VPU op)
        final_val = jnp.sum(
            jnp.where(k_idx[None, :] == k_end[:, None], cur, 0), axis=1
        )
        final = jnp.where(at_final, final_val, final)

        return (cur, final), code

    init_final = jnp.where(qlen == 0, tlen, INF)  # qlen==0 -> distance = tlen
    (_, final), codes = jax.lax.scan(
        row_step,
        (row0, init_final),
        jnp.arange(1, M + 1, dtype=jnp.int32),
        unroll=8,
    )
    final = jnp.where(fits, final, INF)
    return final, codes, fits


def traceback_host(
    codes: np.ndarray,  # (M, B, W) int8
    qlen: np.ndarray,
    tlen: np.ndarray,
    dlo: np.ndarray,
    band_width: int,
) -> tuple[list[np.ndarray], np.ndarray]:
    """Vectorized host traceback over the batch. Returns per-alignment
    forward-order state arrays and a bool array `hit_band_edge` (True means
    the path touched the band boundary -> result may be suboptimal;
    reference analogue: the is_optimal metadata bit, aligner.hpp:67)."""
    M, B, W = codes.shape
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
        ic = np.clip(i - 1, 0, M - 1).astype(np.int64)
        code = codes[ic, batch_idx, kc]
        r = np.where(in_main, code, np.where(i > 0, _DELETION, _INSERTION)).astype(np.int8)
        edge |= in_main & ((k == 0) | (k == W - 1))
        out[batch_idx[active], pos[active]] = r[active]
        di = np.where(r == _INSERTION, 0, 1) * active
        dj = np.where(r == _DELETION, 0, 1) * active
        i -= di
        j -= dj
        pos += active
        active = (i > 0) | (j > 0)

    paths = [out[b, : pos[b]][::-1].copy() for b in range(B)]
    return paths, edge
