"""Worker process for the 2-process multi-host CPU test.

Usage: python multihost_worker.py <process_id> <num_processes> <port> \
           [shared_ckpt_dir]
Each worker owns 4 virtual CPU devices (XLA_FLAGS set by the parent), joins
the coordinator, builds its LOCAL half of the global batch, assembles the
globally-sharded batch via ``global_batch`` and runs one DP train step.
With a ``shared_ckpt_dir`` it additionally runs data-parallel evaluation
(``val_epoch(mesh=...)``) over the 2-process mesh and an Orbax
save/restore of the train state across processes.
Prints ``MHLOSS <value>`` (+ ``MHEVAL``/``MHCKPT`` lines) on success.
"""

import sys


def main():
    proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sgg_tpu.parallel import distributed as dist
    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=n_proc, process_id=proc_id)
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 4 * n_proc, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models import RelModelIMP
    from sgg_tpu.parallel import make_mesh, replicate
    from sgg_tpu.train.assign import sample_edges
    from sgg_tpu.train.state import create_train_state
    from sgg_tpu.train.step import make_train_step

    B, N, E, IMG = 8, 8, 16, 48
    config = Config(batch_size=B, max_nodes=N, max_edges=E, mode="sgcls",
                    loss="dnorm", compute_dtype="float32")
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    ds = SyntheticSGGDataset(num_images=B, num_classes=9, num_predicates=5,
                             max_objects=5, image_size=IMG,
                             with_images=True, seed=0)

    # this host's local shard of the global batch
    local_idx = dist.process_local_indices(B, B)
    local = ds.batch(list(local_idx), max_nodes=N, max_edges=E)

    mesh = make_mesh()
    batch = dist.global_batch(local, mesh)

    # init must be identical on all hosts: same key, HOST-LOCAL plain batch
    init_gb = ds.batch(list(range(B)), max_nodes=N, max_edges=E)
    sampled, pm = sample_edges(jax.random.key(0), init_gb.rels,
                               init_gb.rel_mask, init_gb.node_mask,
                               max_out=E)
    variables = model.init(jax.random.key(0), init_gb.images, init_gb.boxes,
                           init_gb.classes, sampled[..., :2], pm,
                           train=False)
    # trunk fmaps for the cached-step check (computed BEFORE the donating
    # train step: donation may invalidate buffers aliased with
    # ``variables``)
    import dataclasses

    from sgg_tpu.models.backbone import VGG16Trunk
    trunk = VGG16Trunk(dtype=jnp.float32)
    local_fmaps = np.asarray(jax.jit(lambda v, x: trunk.apply(v, x))(
        {"params": variables["params"]["trunk"]}, local.images))
    state_c = replicate(create_train_state(config, variables), mesh)

    state = replicate(create_train_state(config, variables), mesh)

    step = make_train_step(model, config)
    state, metrics = step(state, batch, jax.random.key(1))
    total = float(metrics["total"])
    mean = dist.host_mean(total)
    assert np.isfinite(total)
    assert abs(mean - total) < 1e-6, (mean, total)  # same loss on all hosts
    print(f"MHLOSS {total:.10f}", flush=True)

    # ---- frozen-trunk cached step across the process-spanning mesh:
    # each host computed its LOCAL shard's trunk fmaps above (as the
    # per-process cache reader would), global_batch shards the fmaps
    # leaf, and the cached DP step must agree across hosts and with the
    # image step
    local_cached = dataclasses.replace(local, images=None,
                                       fmaps=local_fmaps)
    batch_c = dist.global_batch(local_cached, mesh)
    _, metrics_c = step(state_c, batch_c, jax.random.key(1))
    total_c = float(metrics_c["total"])
    assert np.isfinite(total_c)
    assert abs(dist.host_mean(total_c) - total_c) < 1e-6
    assert abs(total_c - total) < 1e-4, (total_c, total)
    print(f"MHCACHED {total_c:.10f}", flush=True)

    if ckpt_dir is None:
        return

    # ---- data-parallel evaluation over the 2-process mesh: outputs are
    # gathered on every host (val_epoch's process_allgather path), so each
    # host computes metrics over ALL images and they must agree
    from sgg_tpu.eval.driver import val_epoch
    from test_trainer import _to_sggdataset

    eval_ds = _to_sggdataset(
        SyntheticSGGDataset(num_images=8, num_classes=9, num_predicates=5,
                            min_objects=3, max_objects=5, image_size=IMG,
                            seed=5), "test")
    res = val_epoch(model, variables, eval_ds, config, "test",
                    eval_batch_size=8, with_images=False, verbose=False,
                    mesh=mesh)
    avg = float(res["avg/test_R"])
    assert np.isfinite(avg)
    # host_mean roundtrips through float32 — the exact cross-process
    # equality is asserted by the parent on the MHEVAL lines
    assert abs(dist.host_mean(avg) - avg) < 1e-6, avg
    print(f"MHEVAL {avg:.10f}", flush=True)

    # ---- Orbax checkpoint across processes: save the (replicated,
    # process-spanning) train state to the shared dir, restore it, and
    # verify the restored step reproduces the saved state's next loss
    from sgg_tpu.train import checkpoint as ckpt

    ckpt.save_payload(ckpt_dir, {"params": state.params,
                                 "batch_stats": state.batch_stats,
                                 "step": state.step}, 0)
    restored, epoch = ckpt.restore_payload(
        ckpt_dir, {"params": state.params,
                   "batch_stats": state.batch_stats, "step": state.step})
    assert epoch == 0
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        state.params, restored["params"]))
    assert same, "restored params differ from saved"
    state2 = state.replace(params=restored["params"],
                           batch_stats=restored["batch_stats"])
    _, metrics2 = step(state2, batch, jax.random.key(2))
    total2 = float(metrics2["total"])
    assert np.isfinite(total2)
    assert abs(dist.host_mean(total2) - total2) < 1e-6
    print(f"MHCKPT {total2:.10f}", flush=True)


if __name__ == "__main__":
    main()
