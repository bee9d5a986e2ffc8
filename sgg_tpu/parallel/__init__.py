"""Parallelism: device meshes, shardings, collectives."""

from sgg_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicate, replicated, shard_batch,
)
from sgg_tpu.parallel.mesh import make_mesh_2d, shard_batch_edges  # noqa: F401,E402
from sgg_tpu.parallel.distributed import (  # noqa: F401,E402
    global_batch, host_mean, initialize, process_local_indices,
)
