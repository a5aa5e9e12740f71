"""Index descriptor / batcher tests (reference:
Test_CudamapperIndexBatcher.cu, Test_CudamapperIndexDescriptor.cpp
semantics: greedy basepair grouping, two-level batching, all-to-all
upper-triangle symmetry skip)."""

import pytest

from genomeworks_tpu.mapper.batcher import (
    BatchOfIndices,
    IndexBatch,
    IndexDescriptor,
    generate_batches_of_indices,
    group_into_batches,
    group_reads_into_indices,
)


class _FakeSeq:
    def __init__(self, seq):
        self.seq = seq


class _FakeParser:
    def __init__(self, lens):
        self._s = [_FakeSeq("A" * l) for l in lens]

    def get_num_seqences(self):
        return len(self._s)

    def get_sequence_by_id(self, i):
        return self._s[i]


def test_group_reads_into_indices_greedy():
    parser = _FakeParser([100, 100, 100, 250, 50, 300])
    descs = group_reads_into_indices(parser, 300)
    assert descs == [
        IndexDescriptor(0, 3),   # 100+100+100
        IndexDescriptor(3, 2),   # 250+50
        IndexDescriptor(5, 1),   # 300
    ]
    # an oversized single read still gets its own index
    descs = group_reads_into_indices(_FakeParser([500]), 300)
    assert descs == [IndexDescriptor(0, 1)]


def test_group_into_batches_symmetry_skip():
    descs = [IndexDescriptor(i, 1) for i in range(4)]
    sym = group_into_batches(descs, descs, 1, 1, True)
    # upper triangle of a 4x4 tile matrix = 10 batches
    assert len(sym) == 10
    pairs = {(b.query_indices[0].first_read, b.target_indices[0].first_read) for b in sym}
    assert pairs == {(q, t) for q in range(4) for t in range(4) if t >= q}
    full = group_into_batches(descs, descs, 1, 1, False)
    assert len(full) == 16


def test_group_into_batches_mismatched_sizes_raises():
    descs = [IndexDescriptor(0, 1)]
    with pytest.raises(ValueError):
        group_into_batches(descs, descs, 1, 2, True)


def test_generate_batches_two_level():
    parser = _FakeParser([10] * 8)  # 8 reads -> 8 descriptors at 10bp each
    batches = generate_batches_of_indices(
        4, 2, 4, 2, parser, parser, 10, 10, True
    )
    # host level: 8 descs / 4 per batch -> upper triangle of 2x2 = 3
    assert len(batches) == 3
    # diagonal host batches keep symmetry at device level (3 batches),
    # off-diagonal ones do all-to-all (4 batches)
    sizes = sorted(len(b.device_batches) for b in batches)
    assert sizes == [3, 3, 4]
    # total coverage: every (q_desc, t_desc) pair with t >= q appears once
    covered = set()
    for b in batches:
        for db in b.device_batches:
            for q in db.query_indices:
                for t in db.target_indices:
                    covered.add((q.first_read, t.first_read))
    # host batching already skips mirrored pairs; the covered set is the
    # upper triangle at descriptor granularity (first_read = read id here)
    assert {(q, t) for q, t in covered if t >= q} == {
        (q, t) for q in range(8) for t in range(8) if t >= q
    }


def test_host_index_cache_lru_and_hits():
    from genomeworks_tpu.mapper.cache import CacheType, HostIndexCache

    built = []

    def build(desc):
        built.append(desc)
        return f"index-{desc.first_read}"

    cache = HostIndexCache(CacheType.query_cache, build, capacity=2)
    d = [IndexDescriptor(i, 1) for i in range(3)]
    cache.generate_content([d[0], d[1]])
    assert cache.get_index(d[0]) == "index-0"
    assert cache.hits == 1 and cache.misses == 2
    # capacity 2: inserting d2 evicts the LRU (d1, since d0 was just used)
    cache.get_index(d[2])
    assert len(cache) == 2
    cache.get_index(d[1])  # rebuilt -> a new miss
    assert cache.misses == 4


def test_device_index_cache_stages_usable_device_index():
    """DeviceIndexCache uploads a host index once and the staged
    DeviceIndex runs the device overlap pipeline bit-identically to a
    directly-built device index (reference: DeviceIndexCache staging,
    index_cache.cuh:55-160)."""
    from genomeworks_tpu.io.fasta import create_fasta_parser
    from genomeworks_tpu.mapper.batcher import IndexDescriptor
    from genomeworks_tpu.mapper.cache import (
        CacheType,
        DeviceIndexCache,
        HostIndexCache,
    )
    from genomeworks_tpu.mapper.device_pipeline import (
        build_index_device,
        get_overlaps_device_pipeline,
    )
    from genomeworks_tpu.mapper.index import build_index

    path = "/root/reference/cudamapper/data/20_reads.fasta"
    p = create_fasta_parser(path)
    n = len(p)

    host_cache = HostIndexCache(
        CacheType.query_cache,
        lambda d: build_index(p, d.first_read, d.number_of_reads,
                              kmer_size=5, window_size=3),
    )
    dev_cache = DeviceIndexCache(host_cache)
    desc = IndexDescriptor(0, n)
    staged = dev_cache.get_index(desc)
    dev_cache.wait_for_data_to_be_ready()
    assert dev_cache.get_index(desc) is staged  # cached, no re-upload

    direct = build_index_device(p, 0, n, kmer_size=5, window_size=3)
    ov_staged = get_overlaps_device_pipeline(staged, staged, all_to_all=True)
    ov_direct = get_overlaps_device_pipeline(direct, direct, all_to_all=True)
    assert ov_staged == ov_direct
