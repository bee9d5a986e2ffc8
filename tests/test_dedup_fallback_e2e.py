"""Dedup-fallback WIRING, end-to-end (round-3 ADVICE #2).

``test_dedup_unions.py`` pins the ``ok`` flag of ``unordered_union_index``;
these tests drive the fallback *branches* that consume it — the
``eval_dedup_fallback`` loop in ``eval/driver.val_epoch`` and the
``sgdet_dedup_fallback`` escalation in ``models/sgdet.
sgdet_eval_with_retry`` — by monkeypatching the index to report
``ok=False`` (simulating a non-swap-closed pair set), asserting the
fallback fires (counter bumped) and the final outputs are EXACTLY the
dedup=False path's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sgg_tpu.train.assign as assign_mod
from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.data.datasets import SGGDataset
from sgg_tpu.models import RelModelIMP
from sgg_tpu.utils import counters

pytestmark = pytest.mark.slow


def _failing_index(orig):
    def failing(pairs, pair_mask, max_unique, num_nodes=None):
        u, g, ok, n = orig(pairs, pair_mask, max_unique,
                           num_nodes=num_nodes)
        return u, g, jnp.zeros_like(ok), n
    return failing


def _sgg_dataset(n=4, seed=0):
    ds = SyntheticSGGDataset(num_images=n, num_classes=9, num_predicates=5,
                             max_objects=5, image_size=300, seed=seed)
    return SGGDataset(name="stanford", mode="test", filenames=[],
                      images_dir="", gt_boxes=ds.gt_boxes,
                      gt_classes=ds.gt_classes,
                      relationships=ds.relationships,
                      ind_to_classes=ds.ind_to_classes,
                      ind_to_predicates=ds.ind_to_predicates,
                      box_coordinates="native")


def test_val_epoch_dedup_fallback_fires_and_is_exact(monkeypatch):
    """val_epoch with a failing dedup index must bump the counter and
    return metrics identical to a dedup-disabled evaluation."""
    from sgg_tpu.eval.driver import val_epoch
    import sgg_tpu.train.step as step_mod

    dataset = _sgg_dataset()
    config = Config(batch_size=4, max_nodes=8, max_edges=12, mode="sgcls",
                    compute_dtype="float32")
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    ds0 = SyntheticSGGDataset(num_images=1, num_classes=9, num_predicates=5,
                              max_objects=5, image_size=300, seed=9,
                              with_images=True)
    gb = ds0.batch([0], max_nodes=8, max_edges=12)
    from sgg_tpu.train.assign import all_pairs
    pairs, pm = all_pairs(gb.node_mask)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, pairs, pm, train=False)

    # reference run: dedup force-disabled at step construction
    orig_make = step_mod.make_eval_step

    def make_no_dedup(model, mode=None, max_pairs=None, dedup=True):
        return orig_make(model, mode=mode, max_pairs=max_pairs, dedup=False)

    monkeypatch.setattr(step_mod, "make_eval_step", make_no_dedup)
    res_plain = val_epoch(model, variables, dataset, config, "test_alls",
                          with_images=False, verbose=False)
    monkeypatch.setattr(step_mod, "make_eval_step", orig_make)

    # fallback run: dedup path reports ok=False -> driver must fall back
    monkeypatch.setattr(assign_mod, "unordered_union_index",
                        _failing_index(assign_mod.unordered_union_index))
    before = counters.snapshot()
    res_fb = val_epoch(model, variables, dataset, config, "test_alls",
                       with_images=False, verbose=False)
    fired = counters.delta(before)
    assert fired.get("eval_dedup_fallback", 0) >= 1, fired

    keys = {k for k in res_plain if not k.startswith("_")}
    assert keys == {k for k in res_fb if not k.startswith("_")}
    for k in sorted(keys):
        assert res_fb[k] == res_plain[k], (k, res_fb[k], res_plain[k])


def test_sgdet_retry_dedup_fallback_fires_and_is_exact(monkeypatch):
    """sgdet_eval_with_retry with a failing dedup index must bump
    ``sgdet_dedup_fallback`` and return the dedup=False step's outputs
    byte-exactly."""
    from sgg_tpu.models.detector import FasterRCNNVGG
    from sgg_tpu.models.sgdet import (detection_pairs,
                                      make_sgdet_retry_eval_step,
                                      sgdet_eval_with_retry)

    B, N = 2, 8
    ds = SyntheticSGGDataset(num_images=B, num_classes=12, num_predicates=7,
                             max_objects=5, image_size=96, with_images=True,
                             seed=3)
    gb = ds.batch(list(range(B)), max_nodes=N, max_edges=16)
    det = FasterRCNNVGG(num_classes=12, rpn_pre_nms_top_n=64,
                        rpn_post_nms_top_n=24, detections_per_img=8,
                        obj_dim=48, dtype=jnp.float32, score_thresh=0.01)
    det_vars = det.init(jax.random.key(0), gb.images, gb.im_hw, train=False)
    rel = RelModelIMP(num_classes=12, num_predicates=7, mode="sgdet",
                      hidden_dim=32, obj_dim=64, dtype=jnp.float32)
    dout = det.apply(det_vars, gb.images, gb.im_hw, train=False)
    pairs, pm = detection_pairs(dout["boxes"], dout["mask"], True)
    rel_vars = rel.init(jax.random.key(1), None, dout["boxes"],
                        dout["labels"], pairs, pm, fmap=dout["fmap"],
                        train=False, mode="sgdet")

    out_plain = make_sgdet_retry_eval_step(det, rel, max_pairs=56,
                                           dedup=False)(
        (det_vars, rel_vars), gb)

    monkeypatch.setattr(assign_mod, "unordered_union_index",
                        _failing_index(assign_mod.unordered_union_index))
    before = counters.snapshot()
    out_fb = sgdet_eval_with_retry(det, rel, (det_vars, rel_vars), gb,
                                   max_pairs=56)
    fired = counters.delta(before)
    assert fired.get("sgdet_dedup_fallback", 0) >= 1, fired

    for k in ("det_boxes", "det_mask", "obj_preds", "obj_scores",
              "rel_dists", "pairs", "pair_mask"):
        np.testing.assert_array_equal(np.asarray(out_fb[k]),
                                      np.asarray(out_plain[k]), err_msg=k)
