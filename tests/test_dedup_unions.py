"""Unordered-union dedup: half-budget union RoIAlign/fc6 parity.

Union boxes are symmetric in the pair order (``ops/boxes.union_boxes``) and
every eval enumeration is swap-closed, so the relation head can pool each
unordered pair once and gather (``train/assign.unordered_union_index``,
``RelModelIMP(dedup_unions=True)``). These tests pin (a) the index
structure itself, (b) model-level parity dedup-vs-dense, (c) the eval-step
and sgdet-retry integrations including the ``dedup_ok`` fallback.

Reference protocol being accelerated: the all-ordered-pairs eval
enumeration of ``/root/reference/sgg_models/rel_model_base.py:148-163``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.models import RelModelIMP
from sgg_tpu.train.assign import (all_pairs, compact_pairs,
                                  unordered_union_index)


def _gather_union_boxes(boxes, pairs):
    from sgg_tpu.ops.boxes import union_boxes
    return np.asarray(union_boxes(jnp.asarray(boxes),
                                  jnp.asarray(pairs[..., 0]),
                                  jnp.asarray(pairs[..., 1])))


def test_unordered_union_index_reconstructs_union_boxes():
    rng = np.random.RandomState(0)
    B, N = 3, 7
    node_mask = np.zeros((B, N), bool)
    for b, n in enumerate((7, 4, 2)):
        node_mask[b, :n] = True
    pairs, pm = all_pairs(jnp.asarray(node_mask))
    boxes = np.sort(rng.rand(B, N, 2, 2) * 100,
                    axis=2).reshape(B, N, 4)[..., [0, 2, 1, 3]]
    E = pairs.shape[1]
    uni, gidx, ok, n_uni = unordered_union_index(pairs, pm, E // 2)
    assert bool(np.all(np.asarray(ok)))
    # unique count = valid / 2 exactly (swap closure)
    np.testing.assert_array_equal(np.asarray(n_uni),
                                  np.asarray(pm.sum(1)) // 2)
    ub = _gather_union_boxes(boxes, np.asarray(pairs))
    ub_u = np.take_along_axis(ub, np.asarray(uni)[..., None], 1)
    recon = np.take_along_axis(ub_u, np.asarray(gidx)[..., None], 1)
    m = np.asarray(pm)
    np.testing.assert_array_equal(recon[m], ub[m])


def test_unordered_union_index_on_compacted_pairs():
    node_mask = jnp.asarray(np.array([[True] * 5 + [False] * 3]))
    pairs, pm = all_pairs(node_mask)
    cp, cpm, cnt = compact_pairs(pairs, pm, 24)  # 5*4=20 valid, fits
    uni, gidx, ok, n_uni = unordered_union_index(cp, cpm, 12)
    assert bool(np.all(np.asarray(ok)))
    assert int(np.asarray(n_uni)[0]) == 10
    # every ordered edge's representative has the same unordered key
    cp_np, uni_np, g_np = map(np.asarray, (cp, uni, gidx))
    rep_pairs = cp_np[0][uni_np[0][g_np[0]]]
    key = np.sort(cp_np[0], axis=1)
    np.testing.assert_array_equal(np.sort(rep_pairs, axis=1)[np.asarray(cpm)[0]],
                                  key[np.asarray(cpm)[0]])


def test_unordered_union_index_overflow_flag():
    # a NON-swap-closed set: 4 pairs with 4 distinct unordered keys but a
    # unique budget of 2 -> ok must be False
    pairs = jnp.asarray([[[0, 1], [2, 3], [4, 5], [6, 7]]], jnp.int32)
    pm = jnp.ones((1, 4), bool)
    _, _, ok, n_uni = unordered_union_index(pairs, pm, 2)
    assert int(np.asarray(n_uni)[0]) == 4
    assert not bool(np.asarray(ok)[0])


def _tiny(B=2, N=8, img=64, seed=0, **kw):
    ds = SyntheticSGGDataset(num_images=B, num_classes=12, num_predicates=7,
                             max_objects=6, image_size=img, with_images=True,
                             seed=seed)
    gb = ds.batch(list(range(B)), max_nodes=N, max_edges=12)
    defaults = dict(num_classes=12, num_predicates=7, mode="sgcls",
                    hidden_dim=32, obj_dim=64, dtype=jnp.float32)
    defaults.update(kw)
    return gb, RelModelIMP(**defaults)


def _apply(model, params, gb, pairs, pm, dedup, **kw):
    return model.apply(params, gb.images, gb.boxes, gb.classes, pairs, pm,
                       train=False, dedup_unions=dedup, **kw)


def test_relmodel_dedup_matches_dense():
    gb, model = _tiny()
    pairs, pm = all_pairs(gb.node_mask)
    params = model.init(jax.random.key(0), gb.images, gb.boxes, gb.classes,
                        pairs, pm, train=False)
    ref = _apply(model, params, gb, pairs, pm, False)
    out = _apply(model, params, gb, pairs, pm, True)
    assert bool(np.all(np.asarray(out["dedup_ok"])))
    m = np.asarray(pm)
    # f32: only the split fc6 rects routing changes rounding
    np.testing.assert_allclose(np.asarray(out["rel_logits"])[m],
                               np.asarray(ref["rel_logits"])[m],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["obj_logits"]),
                               np.asarray(ref["obj_logits"]),
                               rtol=1e-4, atol=1e-4)


def test_relmodel_dedup_return_feats_pools_match():
    # return_feats gathers the deduped raw union pools back to ordered
    # slots: per-union RoIAlign math is identical, so valid entries agree
    # to numerical noise (the GAN "real" edge features, main.py:184-190)
    gb, model = _tiny()
    pairs, pm = all_pairs(gb.node_mask)
    params = model.init(jax.random.key(1), gb.images, gb.boxes, gb.classes,
                        pairs, pm, train=False)
    ref = _apply(model, params, gb, pairs, pm, False, return_feats=True)
    out = _apply(model, params, gb, pairs, pm, True, return_feats=True)
    m = np.asarray(pm)
    np.testing.assert_allclose(np.asarray(out["edge_pool"])[m],
                               np.asarray(ref["edge_pool"])[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rel_logits"])[m],
                               np.asarray(ref["rel_logits"])[m],
                               rtol=1e-4, atol=1e-4)


def test_eval_step_dedup_matches():
    from sgg_tpu.train.step import make_eval_step
    gb, model = _tiny()
    pairs, pm = all_pairs(gb.node_mask)
    params = model.init(jax.random.key(0), gb.images, gb.boxes, gb.classes,
                        pairs, pm, train=False)
    # budgets must cover every image's valid pairs (6 nodes -> 30), the
    # driver's rung-selection invariant; an under-sized rung is exercised
    # below via the truncation case
    for budget in (32, None):
        out_d = make_eval_step(model, mode="sgcls", max_pairs=budget,
                               dedup=True)(params, gb)
        out_r = make_eval_step(model, mode="sgcls", max_pairs=budget,
                               dedup=False)(params, gb)
        assert bool(np.all(np.asarray(out_d["dedup_ok"])))
        m = np.asarray(out_d["pair_mask"])
        np.testing.assert_array_equal(m, np.asarray(out_r["pair_mask"]))
        np.testing.assert_allclose(np.asarray(out_d["rel_dists"])[m],
                                   np.asarray(out_r["rel_dists"])[m],
                                   rtol=1e-4, atol=1e-5)


def test_sgdet_retry_dedup_matches():
    from sgg_tpu.models.detector import FasterRCNNVGG
    from sgg_tpu.models.sgdet import make_sgdet_retry_eval_step

    B, N, img = 2, 8, 96
    ds = SyntheticSGGDataset(num_images=B, num_classes=12, num_predicates=7,
                             max_objects=5, image_size=img, with_images=True,
                             seed=3)
    gb = ds.batch(list(range(B)), max_nodes=N, max_edges=16)
    det = FasterRCNNVGG(num_classes=12, rpn_pre_nms_top_n=64,
                        rpn_post_nms_top_n=24, detections_per_img=8,
                        obj_dim=48, dtype=jnp.float32, score_thresh=0.01)
    det_vars = det.init(jax.random.key(0), gb.images, gb.im_hw, train=False)
    rel = RelModelIMP(num_classes=12, num_predicates=7, mode="sgdet",
                      hidden_dim=32, obj_dim=64, dtype=jnp.float32)
    dout = det.apply(det_vars, gb.images, gb.im_hw, train=False)
    from sgg_tpu.models.sgdet import detection_pairs
    pairs, pm = detection_pairs(dout["boxes"], dout["mask"], True)
    rel_vars = rel.init(jax.random.key(1), None, dout["boxes"],
                        dout["labels"], pairs, pm, fmap=dout["fmap"],
                        train=False, mode="sgdet")

    out_d = make_sgdet_retry_eval_step(det, rel, max_pairs=56, dedup=True)(
        (det_vars, rel_vars), gb)
    out_r = make_sgdet_retry_eval_step(det, rel, max_pairs=56, dedup=False)(
        (det_vars, rel_vars), gb)
    assert bool(np.all(np.asarray(out_d["dedup_ok"])))
    m = np.asarray(out_d["pair_mask"])
    np.testing.assert_array_equal(m, np.asarray(out_r["pair_mask"]))
    np.testing.assert_allclose(np.asarray(out_d["rel_dists"]),
                               np.asarray(out_r["rel_dists"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_d["det_boxes"]),
                                  np.asarray(out_r["det_boxes"]))
