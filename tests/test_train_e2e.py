"""End-to-end slice: train the IMP model on synthetic data under jit,
evaluate through the full Recall@K pipeline, and run data-parallel on the
8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.eval import SGGEvaluator, filter_dets
from sgg_tpu.models import RelModelIMP
from sgg_tpu.parallel import make_mesh, replicate, shard_batch
from sgg_tpu.train.assign import sample_edges
from sgg_tpu.train.state import create_train_state, param_labels
from sgg_tpu.train.step import make_eval_step, make_train_step
import pytest

pytestmark = pytest.mark.slow

N_CLS, N_PRED = 10, 6


def _setup(batch_size=2, img=64, n=8, e=16, mode="sgcls", seed=0):
    config = Config(batch_size=batch_size, max_nodes=n, max_edges=e,
                    mode=mode, loss="dnorm", lr=1e-3, compute_dtype="float32")
    ds = SyntheticSGGDataset(num_images=batch_size * 2, num_classes=N_CLS,
                             num_predicates=N_PRED, max_objects=6,
                             image_size=img, with_images=True, seed=seed)
    model = RelModelIMP(num_classes=N_CLS, num_predicates=N_PRED, mode=mode,
                        hidden_dim=32, obj_dim=64, dtype=jnp.float32)
    gb = ds.batch(list(range(batch_size)), max_nodes=n, max_edges=e)
    sampled, pmask = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                                  gb.node_mask, max_out=e)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes, gb.classes,
                           sampled[..., :2], pmask, train=False)
    state = create_train_state(config, variables)
    return config, ds, model, gb, state


def test_train_step_runs_and_loss_decreases():
    config, ds, model, gb, state = _setup()
    step = make_train_step(model, config)
    losses = []
    for i in range(8):
        state, metrics = step(state, gb, jax.random.key(i))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    # overfitting a single tiny batch must reduce the loss
    assert losses[-1] < losses[0], losses


def test_param_partition_labels():
    _, _, _, _, state = _setup()
    labels = param_labels(state.params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    seen = {l for _, l in flat}
    assert seen == {"frozen", "fc", "main"}
    for path, l in flat:
        name = jax.tree_util.keystr(path)
        if "trunk" in name:
            assert l == "frozen", name
        elif "roi_fmap" in name:
            assert l == "fc", name


def test_frozen_trunk_unchanged_after_steps():
    config, ds, model, gb, state = _setup()
    step = make_train_step(model, config)
    trunk_before = jax.tree_util.tree_map(
        np.asarray, state.params["trunk"])
    state, _ = step(state, gb, jax.random.key(0))
    trunk_after = state.params["trunk"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        trunk_before, trunk_after)
    # but other params moved
    changed = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["imp"], state.params["imp"])
    del changed


def test_eval_pipeline_end_to_end():
    config, ds, model, gb, state = _setup(mode="predcls")
    eval_step = make_eval_step(model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = eval_step(variables, gb)
    ev = SGGEvaluator("predcls", multiple_preds=True)
    node_mask = np.asarray(gb.node_mask)
    for b in range(gb.batch_size):
        n = int(node_mask[b].sum())
        n_rel = int(np.asarray(gb.rel_mask[b]).sum())
        if n_rel == 0:
            continue
        entry = filter_dets(gb.boxes[b][:n], out["obj_scores"][b][:n],
                            out["obj_preds"][b][:n], out["pairs"][b],
                            out["rel_dists"][b], out["pair_mask"][b])
        gt = {"gt_relations": np.asarray(gb.rels[b][:n_rel]),
              "gt_boxes": np.asarray(gb.boxes[b][:n]),
              "gt_classes": np.asarray(gb.classes[b][:n])}
        ev.add_image(gt, entry)
    res = ev.results()
    # untrained model: recall must be a valid number in [0, 1]; with all
    # pairs enumerated and top-300 > n_pairs, R@300 counts every candidate
    # predicate choice
    assert 0.0 <= res["R@300"] <= 1.0
    assert len(ev.recalls[20]) >= 1


def test_data_parallel_8_devices():
    assert len(jax.devices()) == 8
    config, ds, model, gb, state = _setup(batch_size=8)
    mesh = make_mesh()
    step = make_train_step(model, config)

    state_r = replicate(state, mesh)
    batch_s = shard_batch(gb, mesh)
    state2, metrics = step(state_r, batch_s, jax.random.key(0))
    assert np.isfinite(float(metrics["total"]))

    # parity: sharded step == single-device step (same batch, same key)
    _, _, _, _, state_single = _setup(batch_size=8)
    state3, metrics_single = step(state_single, gb, jax.random.key(0))
    np.testing.assert_allclose(float(metrics["total"]),
                               float(metrics_single["total"]), rtol=2e-4)
