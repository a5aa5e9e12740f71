"""Mesh sharding / multi-host scaling.

Replaces the reference's parallelism machinery (CUDA streams + one CPU
worker thread per GPU + threadsafe work queues, cudamapper/src/main.cu:
453-594) with JAX device meshes: batches of alignments/windows/seeds are
sharded data-parallel over a ``jax.sharding.Mesh``, collectives ride ICI.
"""

from genomeworks_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    shard_batch,
    pad_batch_to_multiple,
)
