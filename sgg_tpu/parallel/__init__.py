"""Parallelism: device meshes, shardings, collectives."""

from sgg_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicate, replicated, shard_batch,
)
