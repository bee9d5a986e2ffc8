"""Device mesh and data-parallel sharding.

The reference supports no multi-device training at all (single-GPU asserts,
``/root/reference/config.py:71``, ``rel_model_stanford.py:121``; SURVEY.md
§2.11). The TPU build scales data-parallel from the start: a 1-D ``Mesh``
over all devices, batches sharded on the leading axis, parameters/optimizer
state replicated, and XLA inserting the ``psum`` gradient reduction over ICI
when the jitted train step consumes sharded inputs. Multi-host pods extend
the same mesh over DCN via ``jax.distributed.initialize`` — no code change.

Edge-axis sharding (the CP analogue for giant graphs, SURVEY.md §2.11) can be
layered on the same mesh by sharding ``(B, E)`` arrays on a second axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices.

    ``num_devices`` None or 0 = all visible devices (matching the config
    convention, ``Config.num_devices`` "0 = all")."""
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one JAX process."""
    return any(d.process_index != jax.process_index()
               for d in mesh.devices.flat)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a GraphBatch with the leading axis sharded over the mesh.

    Works on a multi-host mesh too: every process passes the same full
    (host-replicated) batch and ``make_array_from_callback`` materializes
    only the shards its devices own (``device_put`` cannot target
    non-addressable devices)."""
    sharding = batch_sharding(mesh, axis_name)
    if is_multiprocess(mesh):
        def place(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding,
                                                lambda idx: x[idx])
        return jax.tree_util.tree_map(place, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh (multi-host: same
    full value passed on every process)."""
    sharding = replicated(mesh)
    if is_multiprocess(mesh):
        def place(x):
            if not hasattr(x, "shape"):
                return x
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding,
                                                lambda idx: x[idx])
        return jax.tree_util.tree_map(place, tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree)


# ---------------------------------------------------------------------------
# edge-axis sharding — the context-parallel analogue for giant graphs
# (SURVEY.md §2.11): the "sequence" of this workload is the per-image edge
# set; the union-feature extraction, edge FC heads, and the incidence
# contraction of message passing are all shardable along E. XLA/GSPMD
# inserts the psum over the edge axis for the incidence einsums.

def make_mesh_2d(data: int, edge: int,
                 axis_names=("data", "edge")) -> Mesh:
    """2-D mesh: batch axis x edge axis."""
    devices = np.asarray(jax.devices()[:data * edge]).reshape(data, edge)
    return Mesh(devices, axis_names)


def shard_batch_edges(batch, mesh: Mesh, data_axis: str = "data",
                      edge_axis: str = "edge"):
    """GraphBatch placement: images/nodes sharded on the batch axis only;
    edge arrays sharded on (batch, edge).

    Multi-host meshes take the ``make_array_from_callback`` path (every
    process passes the same host-replicated batch), like ``shard_batch`` —
    ``device_put`` cannot target non-addressable devices."""
    dp = NamedSharding(mesh, P(data_axis))
    dp_edge = NamedSharding(mesh, P(data_axis, edge_axis))
    multi = is_multiprocess(mesh)

    def put(x, sharding):
        if multi:
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding,
                                                lambda idx: x[idx])
        return jax.device_put(x, sharding)

    def place(name, x):
        if x is None:
            return None
        if name in ("rels", "rel_mask"):
            return put(x, dp_edge)
        return put(x, dp)

    import dataclasses
    return dataclasses.replace(
        batch,
        **{f.name: place(f.name, getattr(batch, f.name))
           for f in dataclasses.fields(batch)})
