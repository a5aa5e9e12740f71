"""Device overlapper (associative-carry chaining) vs host get_overlaps."""

import numpy as np
import jax.numpy as jnp
import pytest

from genomeworks_tpu.mapper.matcher import Anchors
from genomeworks_tpu.mapper.overlapper import get_overlaps
from genomeworks_tpu.mapper.device_overlapper import get_overlaps_device


def _random_anchors(n, n_reads=6, seed=0, clustered=True):
    rng = np.random.default_rng(seed)
    if clustered:
        # runs of nearby anchors so chains/fusions actually form
        qr, tr, qp, tp = [], [], [], []
        while sum(len(x) for x in qp) < n:
            a, b = sorted(rng.integers(0, n_reads, 2))
            ln = int(rng.integers(1, 12))
            q0 = int(rng.integers(0, 5000))
            t0 = int(rng.integers(0, 5000))
            step_q = rng.integers(1, 200, ln)
            step_t = rng.integers(-199, 200, ln)
            qp.append(q0 + np.cumsum(step_q))
            tp.append(np.abs(t0 + np.cumsum(step_t)))
            qr.append(np.full(ln, a))
            tr.append(np.full(ln, b))
        qrid = np.concatenate(qr)
        trid = np.concatenate(tr)
        qpos = np.concatenate(qp)
        tpos = np.concatenate(tp)
    else:
        qrid = rng.integers(0, n_reads, n)
        trid = rng.integers(0, n_reads, n)
        qpos = rng.integers(0, 8000, n)
        tpos = rng.integers(0, 8000, n)
    key = (qrid.astype(np.uint64) << np.uint64(48)) \
        | (trid.astype(np.uint64) << np.uint64(32)) \
        | (qpos.astype(np.uint64) << np.uint64(16)) | tpos.astype(np.uint64)
    order = np.argsort(key, kind="stable")
    return Anchors(
        qrid[order].astype(np.uint32), trid[order].astype(np.uint32),
        qpos[order].astype(np.uint32), tpos[order].astype(np.uint32),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("a2a", [True, False])
def test_device_matches_host(seed, a2a):
    anchors = _random_anchors(3000, seed=seed)
    host = get_overlaps(anchors, all_to_all=a2a, min_overlap_len=100)
    n = len(anchors)
    cap = 1 << (n - 1).bit_length()
    pad = cap - n
    dev_arrays = tuple(
        jnp.asarray(np.concatenate([x.astype(np.int32), np.zeros(pad, np.int32)]))
        for x in (anchors.query_read_ids, anchors.target_read_ids,
                  anchors.query_positions, anchors.target_positions)
    )
    dev = get_overlaps_device(dev_arrays, n, all_to_all=a2a, min_overlap_len=100)
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        assert h == d


def test_empty():
    z = jnp.zeros(16, jnp.int32)
    assert get_overlaps_device((z, z, z, z), 0, all_to_all=True) == []
