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
    """API-parity shim for the reference's DeviceIndexCache
    (index_cache.cuh:55): on TPU, staging to the device is implicit at
    dispatch time, so this simply resolves through the host cache
    (wait_for_data_to_be_ready is a no-op under XLA's async dispatch)."""

    def __init__(self, host_cache: HostIndexCache) -> None:
        self._host = host_cache

    def get_index(self, descriptor: IndexDescriptor) -> Index:
        return self._host.get_index(descriptor)

    def wait_for_data_to_be_ready(self) -> None:
        return None
