import numpy as np

from sgg_tpu.eval import (MeanRecallEvaluator, SGGEvaluator, filter_dets,
                          rank_predicted_rels, recall_at_ks, evaluate_recall)


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def _brute_recall_at_k(gt_rels, gt_boxes, gt_classes, ranked_rels, pred_boxes,
                       pred_classes, k, iou_thresh=0.5):
    """Independent brute-force oracle for union-semantics Recall@K."""
    matched = set()
    for s, o, p in ranked_rels[:k]:
        for gi, (gs, go, gp) in enumerate(gt_rels):
            if (gt_classes[gs] == pred_classes[s] and gp == p
                    and gt_classes[go] == pred_classes[o]
                    and _iou(gt_boxes[gs], pred_boxes[s]) >= iou_thresh
                    and _iou(gt_boxes[go], pred_boxes[o]) >= iou_thresh):
                matched.add(gi)
    return len(matched) / len(gt_rels)


def _random_scene(rng, n_obj=8, n_gt=5, n_classes=10, n_preds=6):
    boxes = rng.rand(n_obj, 4) * 100
    boxes[:, 2:] = boxes[:, :2] + rng.rand(n_obj, 2) * 60 + 5
    classes = rng.randint(1, n_classes, n_obj)
    pairs = [(i, j) for i in range(n_obj) for j in range(n_obj) if i != j]
    sel = rng.choice(len(pairs), n_gt, replace=False)
    gt_rels = np.asarray([(pairs[s][0], pairs[s][1], rng.randint(1, n_preds))
                          for s in sel])
    gt = {"gt_relations": gt_rels, "gt_boxes": boxes, "gt_classes": classes}
    # predictions over all pairs with random predicate distributions
    pred_rel_inds = np.asarray(pairs)
    rel_scores = rng.rand(len(pairs), n_preds)
    rel_scores /= rel_scores.sum(1, keepdims=True)
    obj_scores = rng.rand(n_obj)
    pred = {"pred_rel_inds": pred_rel_inds, "rel_scores": rel_scores,
            "pred_classes": classes, "obj_scores": obj_scores,
            "pred_boxes": boxes}
    return gt, pred


def test_predcls_perfect_prediction_gives_recall_1():
    rng = np.random.RandomState(0)
    gt, pred = _random_scene(rng)
    # craft rel_scores so GT pairs' GT predicate has the max score
    inds = pred["pred_rel_inds"]
    scores = np.full((len(inds), 6), 0.01)
    for s, o, p in gt["gt_relations"]:
        row = np.nonzero((inds[:, 0] == s) & (inds[:, 1] == o))[0][0]
        scores[row, p] = 0.9
    # evaluator consumes filter_dets order: rank pairs by score first
    order = np.argsort(-scores[:, 1:].max(1))
    pred = dict(pred, rel_scores=scores[order], pred_rel_inds=inds[order])
    ev = SGGEvaluator("predcls")
    ev.add_image(gt, pred)
    res = ev.results()
    assert res["R@20"] == 1.0 and res["R@300"] == 1.0


def test_matches_brute_force_oracle_gc_and_nogc():
    rng = np.random.RandomState(1)
    for trial in range(5):
        gt, pred = _random_scene(rng, n_obj=7, n_gt=6)
        for multiple_preds in (False, True):
            ev = SGGEvaluator("predcls", multiple_preds=multiple_preds)
            ev.add_image(gt, pred)
            # oracle: build the same ranked list, then brute-force match
            obj_scores = np.ones(len(gt["gt_classes"]))
            # predcls ranks with obj_scores=1
            ranked, _ = rank_predicted_rels(pred["pred_rel_inds"],
                                            pred["rel_scores"], obj_scores,
                                            multiple_preds)
            for k in (20, 50, 100):
                want = _brute_recall_at_k(
                    gt["gt_relations"], gt["gt_boxes"], gt["gt_classes"],
                    ranked, gt["gt_boxes"], gt["gt_classes"], k)
                got = ev.recalls[k][0]
                assert abs(got - want) < 1e-9, (trial, multiple_preds, k)


def test_nogc_beats_or_equals_gc():
    rng = np.random.RandomState(2)
    gt, pred = _random_scene(rng, n_obj=9, n_gt=8)
    gc = SGGEvaluator("predcls", multiple_preds=False)
    nogc = SGGEvaluator("predcls", multiple_preds=True)
    gc.add_image(gt, pred)
    nogc.add_image(gt, pred)
    # with all pairs present, top-300 covers everything here
    assert nogc.results()["R@300"] >= gc.results()["R@300"]


def test_sgdet_iou_gating():
    # one GT rel; predicted boxes shifted: IoU controls the match
    gt = {"gt_relations": np.asarray([[0, 1, 2]]),
          "gt_boxes": np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], float),
          "gt_classes": np.asarray([3, 4])}
    rel_scores = np.zeros((1, 5))
    rel_scores[0, 2] = 1.0
    base = {"pred_rel_inds": np.asarray([[0, 1]]), "rel_scores": rel_scores,
            "pred_classes": np.asarray([3, 4]),
            "obj_scores": np.asarray([0.9, 0.8])}

    good = dict(base, pred_boxes=np.asarray(
        [[0, 0, 10, 9], [20, 20, 30, 29]], float))  # IoU 0.9
    bad = dict(base, pred_boxes=np.asarray(
        [[0, 0, 10, 4], [20, 20, 30, 30]], float))  # subj IoU 0.4
    ev = SGGEvaluator("sgdet")
    ev.add_image(gt, good)
    assert ev.recalls[20][-1] == 1.0
    ev.add_image(gt, bad)
    assert ev.recalls[20][-1] == 0.0
    # class-mismatch also blocks the match
    wrong_cls = dict(good, pred_classes=np.asarray([3, 5]))
    ev.add_image(gt, wrong_cls)
    assert ev.recalls[20][-1] == 0.0


def test_one_prediction_matches_multiple_gt():
    # duplicate GT relations: one prediction matches both (union semantics)
    gt = {"gt_relations": np.asarray([[0, 1, 2], [0, 1, 2]]),
          "gt_boxes": np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], float),
          "gt_classes": np.asarray([3, 4])}
    rel_scores = np.zeros((1, 5))
    rel_scores[0, 2] = 1.0
    pred = {"pred_rel_inds": np.asarray([[0, 1]]), "rel_scores": rel_scores,
            "pred_classes": np.asarray([3, 4]),
            "obj_scores": np.asarray([1.0, 1.0])}
    ev = SGGEvaluator("predcls")
    ev.add_image(gt, pred)
    assert ev.recalls[20][0] == 1.0


def test_recall_at_ks_union_semantics():
    pred_to_gt = [[0], [], [0, 1], [2]]
    r = recall_at_ks(pred_to_gt, num_gt=4, ks=(1, 2, 3, 4))
    assert r == {1: 0.25, 2: 0.25, 3: 0.5, 4: 0.75}


def test_mean_recall_counts_absent_predicates_as_zero():
    rng = np.random.RandomState(3)
    gt, pred = _random_scene(rng, n_obj=6, n_gt=4, n_preds=6)
    # perfect predictions
    inds = pred["pred_rel_inds"]
    scores = np.full((len(inds), 6), 0.001)
    for s, o, p in gt["gt_relations"]:
        row = np.nonzero((inds[:, 0] == s) & (inds[:, 1] == o))[0][0]
        scores[row, p] = 0.99
    pred = dict(pred, rel_scores=scores)
    names = ["bg"] + [f"p{i}" for i in range(1, 6)]
    mr = MeanRecallEvaluator("predcls", names)
    mr.add_image(gt, pred)
    present = len(set(gt["gt_relations"][:, 2]))
    res = mr.results()
    # each present predicate has R=1, absent ones contribute 0
    assert abs(res["mR@100"] - present / 5) < 1e-9


def test_filter_dets_ranking_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.RandomState(4)
    n, e, R = 6, 12, 7
    obj_scores = rng.rand(n).astype(np.float32)
    pair_inds = np.stack([rng.randint(0, n, e), rng.randint(0, n, e)], 1)
    rel_dists = rng.rand(e, R).astype(np.float32)
    mask = np.ones(e, bool)
    mask[-3:] = False
    entry = filter_dets(jnp.asarray(rng.rand(n, 4)), jnp.asarray(obj_scores),
                        jnp.asarray(rng.randint(1, 5, n)),
                        jnp.asarray(pair_inds), jnp.asarray(rel_dists),
                        jnp.asarray(mask))
    score = rel_dists[:, 1:].max(1) * obj_scores[pair_inds[:, 0]] * \
        obj_scores[pair_inds[:, 1]]
    score[~mask] = -np.inf
    want_order = np.argsort(-score)[:mask.sum()]
    np.testing.assert_array_equal(entry["pred_rel_inds"],
                                  pair_inds[want_order])
    np.testing.assert_array_equal(entry["rel_scores"], rel_dists[want_order])
    assert len(entry["pred_rel_inds"]) == mask.sum()


def test_per_triplet_ranks_simple():
    # two objects, one GT rel; the GT predicate ranked 2nd among predicates
    gt = {"gt_relations": np.asarray([[0, 1, 2]]),
          "gt_boxes": np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], float),
          "gt_classes": np.asarray([3, 4])}
    rel_scores = np.zeros((2, 5))
    rel_scores[0, 1] = 0.6   # wrong predicate scored higher
    rel_scores[0, 2] = 0.4
    rel_scores[1, 3] = 0.9   # reverse pair
    pred = {"pred_rel_inds": np.asarray([[0, 1], [1, 0]]),
            "rel_scores": rel_scores,
            "pred_classes": gt["gt_classes"],
            "obj_scores": np.asarray([1.0, 1.0])}
    counts = {"3_2_4": 7}
    ev = SGGEvaluator("predcls", per_triplet=True, triplet_counts=counts)
    ev.add_image(gt, pred)
    # ranking over the same box pair (either order): scores 0.9, 0.6, 0.4...
    # the GT triplet (3,2,4) on pair (0,1) with score 0.4 sits at rank 2
    assert ev.ranks == [2.0]
    res = ev.results()
    assert res["tripletR@5"] == 1.0
    assert res["meanrank_triplet"] == 2.0


def test_evaluate_recall_empty_predictions():
    p2g = evaluate_recall(np.asarray([[0, 1, 2]]),
                          np.zeros((2, 4)), np.asarray([1, 2]),
                          np.zeros((0, 3), int), np.zeros((2, 4)),
                          np.asarray([1, 2]))
    assert p2g == [[]]


def test_evaluator_save_roundtrip(tmp_path):
    """SGGEvaluator.save dumps reloadable state (reference
    BasicSceneGraphEvaluator.save, sgg_eval.py:57-58)."""
    import numpy as np
    from sgg_tpu.eval.sgg_eval import SGGEvaluator
    ev = SGGEvaluator("predcls")
    ev.recalls[20].append(0.5)
    fn = str(tmp_path / "state.npy")
    ev.save(fn)
    state = np.load(fn, allow_pickle=True).item()
    assert state["mode"] == "predcls"
    assert state["recalls"][20] == [0.5]
