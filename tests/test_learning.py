"""Quality signal: training actually improves Recall@K, not just the loss.

Overfits the tiny IMP model on a handful of synthetic images and checks that
train-set PredCls recall climbs well above the untrained baseline — the
whole chain (features → message passing → losses → optimizer → eval
protocol) must cooperate for this to pass.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.eval import SGGEvaluator, filter_dets
from sgg_tpu.models.relhead import RelModelIMP
from sgg_tpu.train.assign import sample_edges
from sgg_tpu.train.state import create_train_state
from sgg_tpu.train.step import make_eval_step, make_train_step
import pytest

pytestmark = pytest.mark.slow


def _recall(model, variables, gb, ds, n_images):
    eval_step = make_eval_step(model, mode="predcls")
    out = eval_step(variables, gb)
    ev = SGGEvaluator("predcls", multiple_preds=False)
    node_mask = np.asarray(gb.node_mask)
    for i in range(n_images):
        n = int(node_mask[i].sum())
        entry = filter_dets(gb.boxes[i][:n], out["obj_scores"][i][:n],
                            out["obj_preds"][i][:n], out["pairs"][i],
                            out["rel_dists"][i], out["pair_mask"][i])
        gt = {"gt_relations": ds.relationships[i],
              "gt_boxes": np.asarray(gb.boxes[i][:n]),
              "gt_classes": ds.gt_classes[i]}
        ev.add_image(gt, entry)
    return ev.mean_recalls()[100]


def test_overfit_improves_recall():
    B, N, E, IMG = 4, 8, 24, 64
    config = Config(batch_size=B, max_nodes=N, max_edges=E, mode="predcls",
                    loss="dnorm", lr=8e-3, compute_dtype="float32",
                    clip=5.0, l2=0.0)
    ds = SyntheticSGGDataset(num_images=B, num_classes=10, num_predicates=6,
                             max_objects=5, image_size=IMG,
                             with_images=True, seed=0)
    gb = ds.batch(list(range(B)), max_nodes=N, max_edges=E)
    model = RelModelIMP(num_classes=10, num_predicates=6, mode="predcls",
                        hidden_dim=32, obj_dim=64, dtype=jnp.float32)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=E)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, sampled[..., :2], pm, train=False)
    state = create_train_state(config, variables)

    r_before = _recall(model, variables, gb, ds, B)

    step = make_train_step(model, config)
    # 350 steps: the reference-faithful stride-16 union conv (a 1x1
    # broadcast edge feature, see models/union_features.py) learns slower
    # than the stride-2 motifs-intent variant this budget was tuned for.
    for i in range(350):
        state, metrics = step(state, gb, jax.random.key(i))
    assert np.isfinite(float(metrics["total"]))
    # gradient watching analogue (reference wandb.watch, main.py:93-97)
    assert np.isfinite(float(metrics["grad_norm"]))

    trained = {"params": state.params, "batch_stats": state.batch_stats}
    r_after = _recall(model, trained, gb, ds, B)
    # graph-constrained recall: the argmax predicate of each GT pair must
    # be right. Untrained sits near chance; 150 overfit steps must push it
    # far above (full overfit to ~1.0 needs ~10x more steps than this
    # CPU-budgeted test runs).
    assert r_before < 0.6, r_before
    assert r_after > max(1.8 * r_before, 0.6), (r_before, r_after)
