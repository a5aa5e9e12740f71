"""Multi-chip sharding tests: data-parallel POA via shard_map around the
per-window kernel, sharded matcher counting with ICI psum, and the
aligner's sharded forward step. The full 8-device virtual CPU mesh runs
in a subprocess (see conftest.mesh_subprocess_env — the axon tunnel
exposes one chip and its sitecustomize overrides JAX_PLATFORMS in-process);
in-process mesh tests skip unless multiple devices are visible."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genomeworks_tpu.parallel.mesh import make_mesh, shard_batch
from genomeworks_tpu.parallel.sharded import (
    aligner_step_sharded,
    anchor_count_allreduce,
    matcher_sharded_counts,
    poa_batch_consensus_sharded,
)
from genomeworks_tpu.poa.cpu_reference import poa_consensus
from genomeworks_tpu.simulators.genomesim import generate_random_genome, mutate_sequence

_needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


def test_multichip_dryrun_subprocess():
    """Always runnable: exercise the full multi-chip dryrun (sharded POA +
    aligner + collectives) in a subprocess on an 8-device virtual CPU mesh
    (this environment pins JAX_PLATFORMS=axon, a single-chip tunnel, so
    the mesh needs a forced-CPU child process)."""
    import os
    import subprocess
    import sys

    from tests.conftest import mesh_subprocess_env

    env = mesh_subprocess_env(8)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun ok" in r.stdout


@_needs_mesh
def test_sharded_poa_parity_uneven_batch():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    windows = []
    for _ in range(len(jax.devices()) + 3):  # not a multiple of the mesh
        t = generate_random_genome(40, rng)
        windows.append([t] + [mutate_sequence(t, rng, 0.06, 0.06) for _ in range(3)])
    cons, cov, st = poa_batch_consensus_sharded(windows, mesh)
    assert len(cons) == len(windows)
    for b, w in enumerate(windows):
        rc, rv = poa_consensus(w)
        assert st[b] == 0
        assert cons[b] == rc
        np.testing.assert_array_equal(cov[b], rv)


@_needs_mesh
def test_sharded_matcher_counts():
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    q = jnp.sort(jnp.asarray(rng.integers(0, 500, 8 * len(jax.devices())), jnp.int32))
    t = jnp.sort(jnp.asarray(rng.integers(0, 500, 256), jnp.int32))
    got = int(np.asarray(matcher_sharded_counts(mesh, q, t))[0])
    lo = np.searchsorted(np.asarray(t), np.asarray(q), "left")
    hi = np.searchsorted(np.asarray(t), np.asarray(q), "right")
    assert got == int((hi - lo).sum())


@_needs_mesh
def test_anchor_count_allreduce():
    mesh = make_mesh()
    n = 4 * len(jax.devices())
    counts = jnp.arange(n, dtype=jnp.int32)
    assert int(np.asarray(anchor_count_allreduce(mesh, counts))[0]) == n * (n - 1) // 2


@_needs_mesh
def test_aligner_step_sharded_matches_single():
    from genomeworks_tpu.aligner.banded_nw import banded_nw_forward

    mesh = make_mesh()
    rng = np.random.default_rng(2)
    B, M, W = 2 * len(jax.devices()), 64, 32
    q = rng.integers(0, 4, size=(B, M)).astype(np.uint8)
    t = rng.integers(0, 4, size=(B, M)).astype(np.uint8)
    ql = np.full(B, M, np.int32)
    tl = np.full(B, M, np.int32)
    dist_s, codes_s = aligner_step_sharded(
        mesh, q, t, ql, tl, band_width=W
    )[:2]
    dist_1, codes_1 = jax.jit(
        lambda *a: banded_nw_forward(*a, band_width=W)
    )(q, t, ql, tl)[:2]
    np.testing.assert_array_equal(np.asarray(dist_s), np.asarray(dist_1))
    np.testing.assert_array_equal(np.asarray(codes_s), np.asarray(codes_1))


def test_multihost_degenerate_single_process():
    """map_reads_multihost with one process equals plain map_reads (the
    multi-host path's CI tier; real DCN runs differ only in the gather)."""
    from genomeworks_tpu.io.fasta import create_fasta_parser
    from genomeworks_tpu.mapper.pipeline import MapperParams, map_reads
    from genomeworks_tpu.parallel.multihost import map_reads_multihost

    p = create_fasta_parser(
        "/root/reference/cudamapper/data/20_reads.fasta"
    )
    params = MapperParams(kmer_size=3, window_size=2,
                          filtering_parameter=1.0)
    ref = map_reads(p, p, params)
    got = map_reads_multihost(p, p, params)
    assert got == ref
