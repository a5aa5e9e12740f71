"""Multi-chip execution of the compute pipelines.

The reference scales out with one CPU worker thread per GPU pulling index
pairs from a shared queue (cudamapper/src/main.cu:453-594) and has no
collective-communication layer. The TPU-native equivalent is SPMD over a
``jax.sharding.Mesh``:

- POA / alignment / extension batches are data-parallel: the window or
  alignment batch dim is sharded over the mesh axis, each device runs the
  full kernel on its shard (``shard_map`` around the Pallas kernel on real
  slices; GSPMD partitioning of the XLA path elsewhere);
- mapper anchor statistics are merged with ICI collectives
  (``psum``/``all_gather``) instead of the reference's host-side mutex'd
  writer threads.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genomeworks_tpu.parallel.mesh import DATA_AXIS, make_mesh


def _pad_windows(windows, n_shards):
    """Pad the window list so the batch splits evenly over the mesh.
    Padding entries are masked out by zeroing nseqs after packing (the
    kernel skips nseqs == 0 windows), so they cost no kernel slots."""
    pad = (-len(windows)) % n_shards
    return windows + [["A"]] * pad, len(windows)


def poa_batch_consensus_sharded(
    windows: list[list[str]],
    mesh: Mesh | None = None,
    gap: int = -8,
    mismatch: int = -6,
    match: int = 8,
) -> tuple[list[str], list, list[int]]:
    """Data-parallel POA consensus over a device mesh: each device runs the
    per-window Pallas kernel (or its interpreter on hosts without TPU) on
    its shard of the window batch via ``shard_map``."""
    from genomeworks_tpu.ops.poa_pallas import poa_consensus_pallas
    from genomeworks_tpu.poa.jax_poa import _pack_windows

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    windows_p, n_real = _pad_windows(windows, n_dev)

    Lmax = max(max(len(s) for s in w) for w in windows_p)
    Smax = max(len(w) for w in windows_p)
    L = ((Lmax + 63) // 64) * 64
    S = max(2, ((Smax + 1) // 2) * 2)
    N = 3 * L
    seqs, wts, lens, nseqs = _pack_windows(windows_p, None, S, L)
    if wts is None:  # unit weights are no longer materialized (r5)
        wts = np.ones((len(windows_p), S, L), dtype=np.int32)
    nseqs[n_real:] = 0  # mask padding windows (kernel skips nseqs == 0)

    interpret = jax.default_backend() == "cpu"
    run = functools.partial(
        poa_consensus_pallas,
        S=S, L=L, N=N, E=50, A=50,
        gap=gap, mismatch=mismatch, match=match, interpret=interpret,
    )

    spec = P(DATA_AXIS)
    sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None, None), P(DATA_AXIS, None, None),
            P(DATA_AXIS, None), spec,
        ),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), spec, spec),
        check_vma=False,
    )
    cons, cov, length, err = sharded(
        jnp.asarray(seqs), jnp.asarray(wts), jnp.asarray(lens), jnp.asarray(nseqs)
    )
    cons = np.asarray(cons)
    cov = np.asarray(cov)
    length = np.asarray(length)
    err = np.asarray(err)

    out_c, out_v, out_s = [], [], []
    for b in range(n_real):
        if err[b] != 0:
            out_c.append("")
            out_v.append(np.zeros(0, np.int32))
            out_s.append(int(err[b]))
        else:
            k = int(length[b])
            out_c.append(bytes(cons[b, :k][::-1].astype(np.uint8)).decode("latin1"))
            out_v.append(cov[b, :k][::-1].copy())
            out_s.append(0)
    return out_c, out_v, out_s


def aligner_step_sharded(mesh: Mesh, q, t, qlen, tlen, band_width: int):
    """Banded alignment forward step, batch sharded over the mesh
    (the multi-chip path of the Aligner)."""
    from genomeworks_tpu.aligner.banded_nw import banded_nw_forward
    from genomeworks_tpu.parallel.mesh import shard_batch

    q, t, qlen, tlen = shard_batch(mesh, q, t, qlen, tlen)
    fn = jax.jit(
        functools.partial(banded_nw_forward, band_width=band_width),
        out_shardings=(
            NamedSharding(mesh, P(DATA_AXIS)),
            NamedSharding(mesh, P(None, DATA_AXIS, None)),
        ),
    )
    return fn(q, t, qlen, tlen)


def anchor_count_allreduce(mesh: Mesh, per_shard_counts):
    """Merge per-device anchor counts with an ICI all-reduce — the
    collective replacing the reference's host-side result merging."""

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
        check_vma=False,
    )
    def _reduce(x):
        return jax.lax.psum(jnp.sum(x, keepdims=True), DATA_AXIS)

    return _reduce(per_shard_counts)


def matcher_sharded_counts(mesh: Mesh, q_reps, t_reps):
    """Sharded anchor-match counting: query minimizer representations are
    sharded over the mesh, target representations replicated; each device
    searchsorts its shard and the total match count is psum'd over ICI.
    (The device-sharded analogue of find_query_target_matches_kernel,
    cudamapper/src/matcher_gpu.cuh:204.)"""

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(DATA_AXIS), P()), out_specs=P(),
        check_vma=False,
    )
    def _count(q, t):
        lo = jnp.searchsorted(t, q, side="left")
        hi = jnp.searchsorted(t, q, side="right")
        return jax.lax.psum(jnp.sum(hi - lo, keepdims=True), DATA_AXIS)

    return _count(q_reps, t_reps)
