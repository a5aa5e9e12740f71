"""Index caches — recompute-avoidance across index-pair batches.

Reference: cudamapper's IndexHostCopy / HostIndexCache / DeviceIndexCache
(src/index_host_copy.cuh:33, src/index_cache.cuh:46-160): indices built
once per batch run are kept on the host and re-staged to the device as
batches need them, with separate query/target cache types.

On TPU the host/device split collapses: index arrays are NumPy on host
and uploaded implicitly at kernel-call time, so one cache with an LRU
capacity plays both roles. ``CacheType`` is kept for API parity.
"""

from __future__ import annotations

import collections
import enum
from typing import Callable

from genomeworks_tpu.mapper.batcher import IndexDescriptor
from genomeworks_tpu.mapper.index import Index


class CacheType(enum.Enum):
    """index_cache.cuh:46 — query_cache / target_cache."""

    query_cache = 0
    target_cache = 1


class HostIndexCache:
    """LRU cache of built indices keyed by IndexDescriptor
    (HostIndexCache::generate_content / get_index_from_cache semantics,
    index_cache.cuh:132)."""

    def __init__(
        self,
        cache_type: CacheType,
        build_fn: Callable[[IndexDescriptor], Index],
        capacity: int | None = None,
    ) -> None:
        self.cache_type = cache_type
        self._build = build_fn
        self._capacity = capacity
        self._store: collections.OrderedDict[IndexDescriptor, Index] = (
            collections.OrderedDict()
        )
        self.hits = 0
        self.misses = 0

    def generate_content(self, descriptors: list[IndexDescriptor]) -> None:
        """Pre-build (or refresh) the given descriptors' indices."""
        for d in descriptors:
            self.get_index(d)

    def get_index(self, descriptor: IndexDescriptor) -> Index:
        idx = self._store.get(descriptor)
        if idx is not None:
            self.hits += 1
            self._store.move_to_end(descriptor)
            return idx
        self.misses += 1
        idx = self._build(descriptor)
        self._store[descriptor] = idx
        if self._capacity is not None:
            while len(self._store) > self._capacity:
                self._store.popitem(last=False)
        return idx

    def __len__(self) -> int:
        return len(self._store)


class DeviceIndexCache:
    """Device-resident index cache — the reference's DeviceIndexCache
    (index_cache.cuh:55) staged host copies into device memory per batch;
    here ``get_index`` uploads the host index's arrays once (async
    dispatch starts the H2D immediately) and returns a cached
    :class:`~genomeworks_tpu.mapper.device_pipeline.DeviceIndex` whose
    jax arrays live in HBM for downstream device-pipeline calls.
    ``wait_for_data_to_be_ready`` blocks on the uploads (the reference's
    copy-event wait, index_cache.cuh:96)."""

    def __init__(
        self, host_cache: HostIndexCache, capacity: int | None = None
    ) -> None:
        self._host = host_cache
        self._capacity = capacity
        self._store: collections.OrderedDict = collections.OrderedDict()

    def get_index(self, descriptor: IndexDescriptor):
        dev = self._store.get(descriptor)
        if dev is not None:
            self._store.move_to_end(descriptor)
            return dev
        import jax.numpy as jnp
        import numpy as np

        from genomeworks_tpu.mapper.device_pipeline import DeviceIndex, _pow2
        from genomeworks_tpu.mapper.minimizers import INVALID_REP

        idx = self._host.get_index(descriptor)
        n = int(idx.representations.shape[0])
        u = int(idx.unique_representations.shape[0])
        cap = _pow2(max(n, u, 1))

        def padded(a, fill, width=cap):
            a = np.asarray(a)
            out = np.full(width, fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        first = padded(
            idx.first_occurrence_of_representations.astype(np.int32),
            n, cap + 1,
        )
        dev = DeviceIndex(
            representations=jnp.asarray(padded(idx.representations, 0)),
            read_ids=jnp.asarray(padded(idx.read_ids, 0)),
            positions_in_reads=jnp.asarray(
                padded(idx.positions_in_reads, 0)
            ),
            directions_of_reads=jnp.asarray(
                padded(idx.directions_of_reads.astype(np.uint32), 0)
            ),
            unique_representations=jnp.asarray(
                padded(idx.unique_representations, INVALID_REP)
            ),
            first_occurrence=jnp.asarray(first),
            n=n,
            u=u,
            number_of_reads=idx.number_of_reads,
            first_read_id=idx.first_read_id,
            kmer_size=idx.kmer_size,
            window_size=idx.window_size,
            number_of_basepairs_in_longest_read=(
                idx.number_of_basepairs_in_longest_read
            ),
            read_id_to_read_names=idx.read_id_to_read_names,
            read_id_to_read_lengths=idx.read_id_to_read_lengths,
        )
        self._store[descriptor] = dev
        if self._capacity is not None:
            while len(self._store) > self._capacity:
                self._store.popitem(last=False)
        return dev

    def wait_for_data_to_be_ready(self) -> None:
        import jax

        for dev in self._store.values():
            jax.block_until_ready(dev.representations)

    def __len__(self) -> int:
        return len(self._store)
