"""Multi-host overlap mapping — the DCN-scale story.

The reference scales to N GPUs in ONE host with worker threads + device
caches (cudamapper/src/main.cu:453-594) and has no multi-node story. The
TPU-native design extends the single-host mesh pipeline across hosts:

- **Process topology**: one JAX process per host
  (``jax.distributed.initialize``); each host owns its local chips. The
  global mesh is 2-D ("host", "device") but this pipeline only needs the
  flattened data axis.
- **Work decomposition**: query index RANGES (the two-level batcher's
  outer unit, ~30 Mbp each) are assigned round-robin to hosts —
  coarse-grained so all heavy traffic (reads H2D, anchors, chains) stays
  within a host and rides PCIe/ICI, never DCN. The target index ranges
  are built per-host from the local copy of the input (shared filesystem
  or object store), trading a little duplicate CPU sketch work for zero
  index movement over DCN.
- **DCN traffic**: only the final per-host overlap arrays
  (``process_allgather``, a few MB per covid-scale batch) — the same
  "results funnel to host 0" shape as the reference's single-writer PAF
  printer.
- **Determinism**: ranges are merged in range order, and within a range
  the pipeline is bit-deterministic, so the merged PAF equals the
  single-host run's byte-for-byte.

With one process (no ``jax.distributed``) the code path degenerates to
the plain device pipeline — which is how the single-chip CI tier
exercises it.
"""

from __future__ import annotations

import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-host runtime. Returns True when a distributed
    setup is active (more than one process). Safe to call single-process:
    it is then a no-op returning False."""
    if not num_processes or num_processes <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def map_reads_multihost(
    query_parser,
    target_parser,
    params=None,
    all_to_all: bool | None = None,
):
    """Overlap mapping across hosts: each process maps its round-robin
    share of the (query-range x target-range) pairs through the local
    device pipeline, results gather over DCN, merge is deterministic.

    Single-process (the CI tier) this reduces to ``map_reads`` with an
    identity gather — asserted equal by ``tests/test_sharded.py``."""
    import jax

    from genomeworks_tpu.mapper.pipeline import (
        MapperParams,
        group_reads_into_index_ranges,
        map_reads,
    )

    params = params or MapperParams()
    if all_to_all is None:
        all_to_all = query_parser is target_parser

    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc == 1:
        return map_reads(query_parser, target_parser, params, all_to_all)

    # round-robin the pair list; each process runs EXACTLY its share
    # locally (r4 passed per-process range SETS which _map_reads_device
    # re-expanded to the full cross product — duplicated pairs)
    from genomeworks_tpu.mapper.pipeline import _map_reads_device

    q_ranges = group_reads_into_index_ranges(
        query_parser, params.index_size_mb * 1_000_000
    )
    t_ranges = group_reads_into_index_ranges(
        target_parser, params.target_index_size_mb * 1_000_000
    )
    pairs = [
        (i, qr, tr)
        for i, (qr, tr) in enumerate(
            (q, t)
            for q in q_ranges
            for t in t_ranges
            if not (all_to_all and t[0] < q[0])
        )
    ]
    mine = pairs[pid::nproc]
    local, pair_ids = _map_reads_device(
        query_parser, target_parser, params, all_to_all,
        params.filtering_parameter or 1e-5,
        None, None, pairs=mine, return_pair_ids=True,
    )
    # gather per-host results over DCN. process_allgather needs equal
    # shapes, so gather the counts first and pad to the max; each row
    # carries its global pair index so the merge can restore the
    # single-process pair order exactly (stable sort keeps the in-pair
    # pipeline order) — the merged list is byte-identical to map_reads.
    from jax.experimental import multihost_utils

    fields = np.array(
        [
            [
                o.query_read_id, o.target_read_id,
                o.query_start_position_in_read,
                o.query_end_position_in_read,
                o.target_start_position_in_read,
                o.target_end_position_in_read,
                1 if o.relative_strand == "-" else 0,
                o.num_residues,
                g,
            ]
            for o, g in zip(local, pair_ids)
        ],
        dtype=np.int64,
    ).reshape(-1, 9)
    counts = np.asarray(
        multihost_utils.process_allgather(
            np.array([fields.shape[0]], dtype=np.int64)
        )
    ).reshape(-1)
    cap = int(counts.max()) if counts.size else 0
    padded = np.full((cap, 9), -1, dtype=np.int64)
    padded[: fields.shape[0]] = fields
    gathered = np.asarray(
        multihost_utils.process_allgather(padded)
    ).reshape(nproc, cap, 9)
    rows = np.concatenate(
        [gathered[p, : int(counts[p])] for p in range(nproc)], axis=0
    )
    rows = rows[np.argsort(rows[:, 8], kind="stable")]
    from genomeworks_tpu.mapper.overlapper import Overlap

    out = []
    for r in rows:
        out.append(
            Overlap(
                query_read_id=int(r[0]),
                target_read_id=int(r[1]),
                query_start_position_in_read=int(r[2]),
                query_end_position_in_read=int(r[3]),
                target_start_position_in_read=int(r[4]),
                target_end_position_in_read=int(r[5]),
                relative_strand="-" if r[6] else "+",
                num_residues=int(r[7]),
            )
        )
    return out
