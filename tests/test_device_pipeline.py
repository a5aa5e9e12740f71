"""Device-resident mapper pipeline vs host pipeline — bit parity.

The device path (mapper.device_pipeline: sketch → device sort/filter/
unique → device anchor expansion + compound sort → device chaining) must
produce the identical index content and identical overlaps to the host
path on every fixture (reference contract: IndexGPU/MatcherGPU/
OverlapperTriggered are THE implementation; here both paths coexist and
must agree)."""

import numpy as np
import pytest

from tests.conftest import reference_path

from genomeworks_tpu.io.fasta import create_fasta_parser
from genomeworks_tpu.mapper.device_pipeline import (
    build_index_device,
    get_overlaps_device_pipeline,
)
from genomeworks_tpu.mapper.index import build_index
from genomeworks_tpu.mapper.matcher import generate_anchors
from genomeworks_tpu.mapper.overlapper import get_overlaps
from genomeworks_tpu.mapper.pipeline import MapperParams, map_reads
from genomeworks_tpu.simulators.genomesim import generate_random_genome
from genomeworks_tpu.simulators.readsim import NoisyReadSimulator


class _ListParser:
    def __init__(self, seqs):
        self._seqs = seqs

    def __len__(self):
        return len(self._seqs)

    def get_sequence_by_id(self, rid):
        import types

        return types.SimpleNamespace(name=f"r{rid}", seq=self._seqs[rid])

    def sequences(self):
        for i in range(len(self)):
            yield self.get_sequence_by_id(i)


def _sim_reads(n_reads=40, genome_len=8000, read_len=900, seed=0):
    import random

    random.seed(seed)
    rng = np.random.default_rng(seed)
    genome = generate_random_genome(genome_len, rng)
    sim = NoisyReadSimulator()
    reads = []
    for _ in range(n_reads):
        read, _, _ = sim.generate_read(genome, read_len)
        reads.append(read)
    return reads


@pytest.mark.parametrize("filtering", [1.0, 0.02])
def test_index_parity_simulated(filtering):
    reads = _sim_reads()
    parser = _ListParser(reads)
    host = build_index(parser, 0, len(reads), filtering_parameter=filtering)
    dev = build_index_device(
        parser, 0, len(reads), filtering_parameter=filtering
    ).to_host()
    np.testing.assert_array_equal(host.representations, dev.representations)
    np.testing.assert_array_equal(host.read_ids, dev.read_ids)
    np.testing.assert_array_equal(host.positions_in_reads, dev.positions_in_reads)
    np.testing.assert_array_equal(
        host.directions_of_reads, dev.directions_of_reads
    )
    np.testing.assert_array_equal(
        host.unique_representations, dev.unique_representations
    )
    np.testing.assert_array_equal(
        host.first_occurrence_of_representations,
        dev.first_occurrence_of_representations,
    )


def test_overlaps_parity_simulated():
    reads = _sim_reads(n_reads=60, seed=3)
    parser = _ListParser(reads)
    host_idx = build_index(parser, 0, len(reads))
    anchors = generate_anchors(host_idx, host_idx)
    host = get_overlaps(anchors, all_to_all=True, min_overlap_len=100)
    dev_idx = build_index_device(parser, 0, len(reads))
    dev = get_overlaps_device_pipeline(
        dev_idx, dev_idx, all_to_all=True, min_overlap_len=100
    )
    assert len(host) > 0
    assert dev == host


def test_map_reads_paths_agree_fixture():
    parser = create_fasta_parser(
        reference_path("cudamapper", "data", "20_reads.fasta")
    )
    p_host = MapperParams(device_pipeline=False, min_overlap_len=50,
                          min_residues=2)
    p_dev = MapperParams(device_pipeline=True, min_overlap_len=50,
                         min_residues=2)
    host = map_reads(parser, parser, p_host)
    dev = map_reads(parser, parser, p_dev)
    assert dev == host


def test_device_pipeline_empty_inputs():
    parser = _ListParser(["ACGT"])  # too short to sketch
    dev_idx = build_index_device(parser, 0, 1)
    assert dev_idx.n == 0
    assert (
        get_overlaps_device_pipeline(dev_idx, dev_idx, all_to_all=True) == []
    )


def test_overlap_arrays_path_matches_objects():
    """The columnar (OverlapArrays) pipeline result and vectorized
    post-processing are bit-identical to the Overlap-object path."""
    import dataclasses

    from genomeworks_tpu.io.fasta import create_fasta_parser
    from genomeworks_tpu.mapper.device_pipeline import (
        build_index_device,
        get_overlaps_device_pipeline,
    )
    from genomeworks_tpu.mapper.overlapper import (
        post_process_overlaps,
        post_process_overlaps_arrays,
    )

    p = create_fasta_parser(
        "/root/reference/cudamapper/data/covid-reads.fasta.gz"
    )
    n = min(len(p), 120)
    idx = build_index_device(p, 0, n, filtering_parameter=0.001)
    objs = get_overlaps_device_pipeline(idx, idx, all_to_all=True)
    arrs = get_overlaps_device_pipeline(idx, idx, all_to_all=True,
                                        as_arrays=True)
    assert arrs.to_overlaps() == objs
    for drop in (False, True):
        ref = post_process_overlaps(objs, drop)
        got = post_process_overlaps_arrays(arrs, drop).to_overlaps()
        assert got == ref
