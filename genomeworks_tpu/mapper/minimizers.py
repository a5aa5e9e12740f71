"""(k,w)-minimizer sketching — TPU-native re-design of
cudamapper/src/minimizer.cu.

Reference semantics reproduced exactly (bit parity with the reference unit
tests in cudamapper/tests/Test_CudamapperMinimizer.cpp):

- base codes A=0 C=1 G=2 T=3 (minimizer.cu:197), complement = 3-code;
- forward k-mer packs bases MSB-first, reverse complement packs complement
  codes LSB-first (minimizer.cu:232-233);
- optional wang_hash64 with a 32-bit mask (minimizer.cu:67-78) — pure
  uint32 arithmetic, reproduced verbatim;
- representation = min(forward, reverse), direction = 1 iff reverse < fwd
  (minimizer.cu:242-250);
- windows: front-end windows over k-mer prefixes of lengths 1..w-1,
  all central windows of w k-mers, back-end windows over suffixes of the
  last w-1..1 k-mers (minimizer.cu kernels; unified here as a single
  sliding w-window over the k-mer array padded with w-1 sentinels on each
  side);
- per window the *rightmost* minimal representation wins
  (minimizer.cu:280-286 uses <=);
- consecutive windows sharing the same minimizer position emit one sketch
  element (minimizer.cu:293-335).

Instead of three shared-memory kernels, the TPU formulation is w shifted
vector passes (keep-if-<=) over the padded k-mer array, vectorized across a
read batch — pure VPU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: sentinel for invalid/padding representations (see module docstring for
#: the pathological-collision safety net in sketch extraction)
INVALID_REP = np.uint32(0xFFFFFFFF)


def wang_hash32(key: jnp.ndarray) -> jnp.ndarray:
    """wang_hash64 with 32-bit mask (minimizer.cu:67-78) == uint32 math."""
    key = key.astype(jnp.uint32)
    key = (~key) + (key << 21)
    key = key ^ (key >> 24)
    key = (key + (key << 3)) + (key << 8)
    key = key ^ (key >> 14)
    key = (key + (key << 2)) + (key << 4)
    key = key ^ (key >> 28)
    key = key + (key << 31)
    return key


def _u32_to_ordered_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Map uint32 to int32 preserving order (for argmin-style comparisons)."""
    return jax.lax.bitcast_convert_type(x ^ jnp.uint32(0x80000000), jnp.int32)


def pack_2bit(reads: np.ndarray) -> np.ndarray:
    """(B, L) uint8 base codes -> (B, L/4) packed bytes (base i at bits
    2*(i%4)). Uploading packed reads quarters H2D traffic; the sketch
    unpacks on device."""
    B, L = reads.shape
    if L % 4:
        reads = np.pad(reads, ((0, 0), (0, 4 - L % 4)))
    r = reads.reshape(B, -1, 4).astype(np.uint16)
    return (
        r[:, :, 0] | (r[:, :, 1] << 2) | (r[:, :, 2] << 4) | (r[:, :, 3] << 6)
    ).astype(np.uint8)


@functools.partial(
    jax.jit, static_argnames=("k", "w", "hash_representations", "packed")
)
def compute_sketch(
    reads: jnp.ndarray,  # (B, L) uint8 base codes, or (B, L/4) packed 2-bit
    lengths: jnp.ndarray,  # (B,) int32
    k: int,
    w: int,
    hash_representations: bool = True,
    packed: bool = False,
):
    """Compute minimizer sketch elements for a batch of reads.

    Returns fixed-shape per-read arrays of length Pw = L-k+1 + (w-1):
      reps (B, Pw) uint32, positions (B, Pw) int32, directions (B, Pw) int32,
      valid (B, Pw) bool — one slot per window, True where that window
      emits a (deduplicated) sketch element.

    Reads shorter than w+k-1 emit nothing (reference skips them,
    index_gpu.cuh:835).
    """
    if packed:
        # unpack 2-bit bytes to base codes on device (VPU shifts)
        B, L4 = reads.shape
        r16 = reads.astype(jnp.uint8)
        parts = [((r16 >> (2 * i)) & 3) for i in range(4)]
        reads = jnp.stack(parts, axis=2).reshape(B, 4 * L4)
    B, L = reads.shape
    P = L - k + 1  # number of k-mer start positions (padded)
    if P <= 0:
        raise ValueError(f"reads too short for k={k}")
    lengths = lengths.astype(jnp.int32)
    n_kmers = lengths - (k - 1)  # valid k-mers per read

    r32 = reads.astype(jnp.uint32)
    fwd = jnp.zeros((B, P), jnp.uint32)
    rev = jnp.zeros((B, P), jnp.uint32)
    for i in range(k):
        base = jax.lax.slice_in_dim(r32, i, i + P, axis=1)
        fwd = fwd | (base << jnp.uint32(2 * (k - 1 - i)))
        rev = rev | ((jnp.uint32(3) - base) << jnp.uint32(2 * i))

    if hash_representations:
        fwd = wang_hash32(fwd)
        rev = wang_hash32(rev)

    use_fwd = fwd <= rev
    rep = jnp.where(use_fwd, fwd, rev)
    direction = jnp.where(use_fwd, 0, 1).astype(jnp.int32)

    pos_idx = jnp.arange(P, dtype=jnp.int32)[None, :]
    kmer_valid = pos_idx < n_kmers[:, None]
    rep = jnp.where(kmer_valid, rep, INVALID_REP)

    # pad w-1 sentinel k-mers at each side; window ω covers padded positions
    # [ω, ω+w-1], i.e. k-mer positions [ω-(w-1), ω]
    pad = jnp.full((B, w - 1), INVALID_REP, jnp.uint32)
    rep_p = jnp.concatenate([pad, rep, pad], axis=1) if w > 1 else rep
    pad_d = jnp.zeros((B, w - 1), jnp.int32)
    dir_p = jnp.concatenate([pad_d, direction, pad_d], axis=1) if w > 1 else direction
    Pw = P + w - 1  # number of windows (padded)

    # carry (rep, dir) alongside the argmin so no post-hoc row gather is
    # needed (take_along_axis lowers to one-hot contractions on TPU)
    key_p = _u32_to_ordered_i32(rep_p)
    best_key = jnp.full((B, Pw), np.int32(0x7FFFFFFF), jnp.int32)
    best_pos = jnp.full((B, Pw), -1, jnp.int32)
    best_rep = jnp.full((B, Pw), INVALID_REP, jnp.uint32)
    best_dir = jnp.zeros((B, Pw), jnp.int32)
    for i in range(w):
        cand = jax.lax.slice_in_dim(key_p, i, i + Pw, axis=1)
        cand_rep = jax.lax.slice_in_dim(rep_p, i, i + Pw, axis=1)
        cand_dir = jax.lax.slice_in_dim(dir_p, i, i + Pw, axis=1)
        cand_pos = jnp.arange(Pw, dtype=jnp.int32)[None, :] + (i - (w - 1))
        take = cand <= best_key  # rightmost tie-break
        best_key = jnp.where(take, cand, best_key)
        best_pos = jnp.where(take, cand_pos, best_pos)
        best_rep = jnp.where(take, cand_rep, best_rep)
        best_dir = jnp.where(take, cand_dir, best_dir)

    # a window is valid if its index < n_kmers + w - 1 and the read is long
    # enough for one full window
    win_idx = jnp.arange(Pw, dtype=jnp.int32)[None, :]
    read_ok = lengths[:, None] >= (w + k - 1)
    win_valid = read_ok & (win_idx < (n_kmers[:, None] + w - 1))
    # safety net: chosen position must be a valid k-mer
    win_valid = win_valid & (best_pos >= 0) & (best_pos < n_kmers[:, None])

    # dedupe consecutive windows with the same minimizer position
    prev_pos = jnp.concatenate(
        [jnp.full((B, 1), -2, jnp.int32), best_pos[:, :-1]], axis=1
    )
    emit = win_valid & (best_pos != prev_pos)

    positions = jnp.clip(best_pos, 0, P - 1)
    return best_rep, positions, best_dir, emit


def sketch_to_numpy(reps, positions, directions, emit, first_read_id: int = 0):
    """Flatten a device sketch to host arrays in (read, window) order —
    the same order the reference's generate_sketch_elements emits before
    sorting. Returns (reps, read_ids, positions, directions) 1-D arrays."""
    reps = np.asarray(reps)
    positions = np.asarray(positions)
    directions = np.asarray(directions)
    emit = np.asarray(emit)
    B, Pw = reps.shape
    rid = np.broadcast_to(
        np.arange(B, dtype=np.uint32)[:, None] + np.uint32(first_read_id), (B, Pw)
    )
    m = emit.reshape(-1)
    return (
        reps.reshape(-1)[m],
        rid.reshape(-1)[m],
        positions.reshape(-1)[m].astype(np.uint32),
        directions.reshape(-1)[m].astype(np.uint8),
    )
