"""Multi-host (pod-slice) wiring: process init + global batch assembly.

The reference's only distributed machinery is torch DDP utilities in the
detector-pretraining path (``/root/reference/detector/utils.py:258-330``,
NCCL env-var init, pickled-tensor all_gather). The TPU equivalent is
process-level: ``jax.distributed.initialize`` joins the hosts, each host
loads its shard of every batch, and ``make_array_from_process_local_data``
assembles the global sharded arrays — gradients then reduce over ICI/DCN
inside the jitted step via XLA collectives, with no user-level communication
code.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job (no-op for single-process runs).

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; pass them explicitly elsewhere (reference analogue:
    ``init_distributed_mode``, detector/utils.py:302-324).
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # tolerate ONLY the already-initialized case; a connect failure /
        # bad coordinator must be loud — swallowing it would degrade the
        # pod into N independent single-process runs that silently train
        # diverging model copies
        if "already initialized" in str(e).lower():
            print(f"jax.distributed.initialize skipped: {e}")
            return
        raise


def sync_processes(name: str, timeout_s: int = 600) -> None:
    """Align all processes at a named point WITHOUT a device collective.

    XLA:CPU's gloo contexts are created lazily at the first collective
    with a hardcoded 30 s key-exchange deadline — if one process reaches a
    program dispatch >30 s before its peers (e.g. process 0 just spent a
    minute extracting the feature cache, or compile times diverge on a
    loaded host), the whole job dies with "Gloo context initialization
    failed: DEADLINE_EXCEEDED". This barrier rides the coordination
    service's gRPC channel instead (arbitrary timeout, no device programs),
    so callers place it right before compile/dispatch-heavy collective
    regions. No-op single-process.
    """
    if jax.process_count() == 1:
        return
    try:
        # private API (no public coordination-service barrier exists as of
        # jax 0.9); guarded so a jax upgrade that moves it fails with a
        # clear message instead of an AttributeError deep in an epoch loop
        from jax._src import distributed as _dist
        client = _dist.global_state.client
    except Exception as e:  # pragma: no cover - version drift guard
        raise RuntimeError(
            "sync_processes needs jax's coordination-service client "
            "(jax._src.distributed.global_state.client), which jax "
            f"{jax.__version__} no longer exposes at that path — update "
            "this accessor. The barrier prevents gloo's 30s lazy-context "
            "deadline from killing multi-host runs; do not remove it."
        ) from e
    if client is None:  # initialized by an external launcher we can't see
        return
    # barrier IDs are one-shot; a PER-NAME counter keeps repeat calls
    # unique while staying identical across processes. Keying on the name
    # (not one global sequence) means a divergent call sequence in one
    # subsystem (e.g. an exception swallowed on one process) can only
    # desync barriers of that name, not every later barrier in the job.
    _barrier_seq[name] = _barrier_seq.get(name, 0) + 1
    client.wait_at_barrier(f"sgg_{name}_{_barrier_seq[name]}",
                           timeout_in_ms=timeout_s * 1000)


_barrier_seq: dict = {}


def process_local_indices(n: int, batch_size: int) -> np.ndarray:
    """The slice of each global batch this host is responsible for.

    ``batch_size`` must divide evenly across processes — a silent
    floor-division would shrink the global batch below the jitted step's
    shape. Indices wrap modulo ``n`` only for datasets smaller than the
    batch (tiny smoke runs)."""
    assert batch_size % jax.process_count() == 0, (
        f"batch_size {batch_size} not divisible by "
        f"{jax.process_count()} processes")
    per_host = batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return np.arange(start, start + per_host) % max(n, 1)


def global_batch(local_batch, mesh: Mesh, axis_name: str = "data"):
    """Assemble a globally-sharded GraphBatch from per-host local shards.

    Each host passes its local (B/num_hosts, ...) batch; the result is a
    global (B, ...) batch sharded over the mesh's data axis (single-process:
    equivalent to ``shard_batch``).
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def place(x):
        if x is None:
            return None
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(place, local_batch)


def host_mean(value: float, axis_name: str = "data") -> float:
    """Cross-host scalar mean for metric aggregation (replaces the
    reference's pickled-tensor all_gather, detector/utils.py:75-143)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    arr = multihost_utils.process_allgather(np.asarray([value]))
    return float(np.mean(arr))
