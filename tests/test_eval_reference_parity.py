"""Differential test: our evaluator vs the reference evaluator (oracle).

Imports the reference implementation read-only from /root/reference and runs
both evaluators on identical random scenes. Skipped automatically when the
reference checkout or torch is unavailable.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"


def _load_reference_evaluator():
    # shared stubs + path setup (tests/reference_utils.py) — keeps the
    # torchvision stub consistent with the model-parity tests, which need
    # the detection submodules too
    from reference_utils import load_reference
    load_reference()
    try:
        from lib.sgg_eval import BasicSceneGraphEvaluator  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference evaluator unavailable: {e}")
    return BasicSceneGraphEvaluator


def _random_scene(rng, n_obj, n_gt, n_classes=12, n_preds=7):
    boxes = rng.rand(n_obj, 4) * 200
    boxes[:, 2:] = boxes[:, :2] + rng.rand(n_obj, 2) * 80 + 5
    classes = rng.randint(1, n_classes, n_obj)
    pairs = [(i, j) for i in range(n_obj) for j in range(n_obj) if i != j]
    sel = rng.choice(len(pairs), n_gt, replace=False)
    gt_rels = np.asarray([(pairs[s][0], pairs[s][1], rng.randint(1, n_preds))
                          for s in sel])
    gt = {"gt_relations": gt_rels, "gt_boxes": boxes, "gt_classes": classes}
    pred_rel_inds = np.asarray(pairs)
    rel_scores = rng.rand(len(pairs), n_preds)
    rel_scores /= rel_scores.sum(1, keepdims=True)
    obj_scores = rng.rand(n_obj)
    # emulate filter_dets ordering (the contract both evaluators assume)
    score = rel_scores[:, 1:].max(1) * obj_scores[pred_rel_inds[:, 0]] * \
        obj_scores[pred_rel_inds[:, 1]]
    order = np.argsort(-score)
    # detection-style jittered boxes for sgdet
    pred_boxes = boxes + rng.randn(n_obj, 4) * 8
    pred_boxes[:, 2:] = np.maximum(pred_boxes[:, 2:], pred_boxes[:, :2] + 1)
    pred = {"pred_rel_inds": pred_rel_inds[order],
            "rel_scores": rel_scores[order],
            "pred_classes": classes.copy(),
            "obj_scores": obj_scores,
            "pred_boxes": pred_boxes}
    # flip some predicted classes so sgcls/sgdet recall < 1
    flip = rng.rand(n_obj) < 0.3
    pred["pred_classes"][flip] = rng.randint(1, n_classes, flip.sum())
    return gt, pred


@pytest.mark.parametrize("mode", ["predcls", "sgcls", "sgdet"])
@pytest.mark.parametrize("multiple_preds", [False, True])
def test_recall_parity_with_reference(mode, multiple_preds):
    RefEval = _load_reference_evaluator()
    from sgg_tpu.eval import SGGEvaluator

    rng = np.random.RandomState(42)
    ref = RefEval(mode, multiple_preds=multiple_preds)
    ours = SGGEvaluator(mode, multiple_preds=multiple_preds)
    for _ in range(6):
        gt, pred = _random_scene(rng, n_obj=rng.randint(4, 10),
                                 n_gt=rng.randint(2, 8))
        ref.evaluate_scene_graph_entry(gt, pred)
        ours.add_image(gt, pred)
    ref_res = {k: float(np.mean(v))
               for k, v in ref.result_dict[mode + "_recall"].items()}
    our_res = ours.mean_recalls()
    for k in (20, 50, 100, 200, 300):
        assert abs(ref_res[k] - our_res[k]) < 1e-9, (mode, multiple_preds, k)


def test_per_triplet_parity_with_reference():
    RefEval = _load_reference_evaluator()
    from sgg_tpu.eval import SGGEvaluator

    rng = np.random.RandomState(7)
    # triplet counts covering some random keys
    counts = {f"{a}_{p}_{b}": int(c) for a, p, b, c in
              rng.randint(1, 12, size=(40, 4))}
    # per_triplet is only exercised with multiple_preds=True in the reference
    # (lib/eval.py:40-41); the GC+per_triplet combination crashes there
    # (sgg_eval.py:239 uses overall_scores defined only in the no-GC branch).
    ref = RefEval("predcls", multiple_preds=True, triplet_counts=counts,
                  per_triplet=True)
    ours = SGGEvaluator("predcls", multiple_preds=True,
                        triplet_counts=counts, per_triplet=True)
    for _ in range(4):
        gt, pred = _random_scene(rng, n_obj=6, n_gt=4)
        ref.evaluate_scene_graph_entry(gt, pred)
        ours.add_image(gt, pred)
    np.testing.assert_allclose(
        np.asarray(ref.result_dict["predcls_rank"], float),
        np.asarray(ours.ranks, float))
    np.testing.assert_allclose(
        np.asarray(ref.result_dict["predcls_counts"], float),
        np.asarray(ours.rank_counts, float))


@pytest.mark.parametrize("mode", ["phrdet", "preddet"])
def test_vrd_modes_parity(mode):
    """phrdet (union-box IoU matching) and preddet (GT-pair ranking) are
    the reference's VRD-protocol modes (sgg_eval.py:47-49,160-191); both
    run with multiple_preds=True there."""
    RefEval = _load_reference_evaluator()
    from sgg_tpu.eval import SGGEvaluator

    rng = np.random.RandomState(11)
    ref = RefEval(mode, multiple_preds=True)
    ours = SGGEvaluator(mode, multiple_preds=True)
    for _ in range(5):
        gt, pred = _random_scene(rng, n_obj=rng.randint(4, 8),
                                 n_gt=rng.randint(2, 6))
        ref.evaluate_scene_graph_entry(gt, pred)
        ours.add_image(gt, pred)
    ref_res = {k: float(np.mean(v))
               for k, v in ref.result_dict[mode + "_recall"].items()}
    our_res = ours.mean_recalls()
    for k in (20, 50, 100, 200, 300):
        assert abs(ref_res[k] - our_res[k]) < 1e-9, (mode, k)


def test_objcls_mode_parity():
    """objcls: object classification quality assuming perfect predicates
    (sgg_eval.py:150-158)."""
    RefEval = _load_reference_evaluator()
    from sgg_tpu.eval import SGGEvaluator

    rng = np.random.RandomState(13)
    ref = RefEval("objcls", multiple_preds=False)
    ours = SGGEvaluator("objcls", multiple_preds=False)
    for _ in range(4):
        gt, pred = _random_scene(rng, n_obj=6, n_gt=4)
        ref.evaluate_scene_graph_entry(gt, pred)
        ours.add_image(gt, pred)
    ref_res = {k: float(np.mean(v))
               for k, v in ref.result_dict["objcls_recall"].items()}
    our_res = ours.mean_recalls()
    for k in (20, 50, 100):
        assert abs(ref_res[k] - our_res[k]) < 1e-9, k


@pytest.mark.parametrize("multiple_preds", [False, True])
def test_mean_recall_parity_with_reference(multiple_preds):
    """MeanRecallEvaluator vs the reference's own KERN-style pipeline
    (eval_entry per-predicate filtering + calculate_mR_from_evaluator_list,
    sgg_eval.py:420-501): identical mR@K on identical scenes, including the
    nan-at-R@100 skip and the full-predicate denominator."""
    RefEval = _load_reference_evaluator()
    from lib.sgg_eval import calculate_mR_from_evaluator_list, eval_entry

    from sgg_tpu.eval.sgg_eval import MeanRecallEvaluator

    n_classes, n_preds = 12, 7
    names = ["__bg__"] + [f"p{i}" for i in range(1, n_preds)]
    evaluator_list = [
        (i, names[i], {"predcls": RefEval("predcls")})
        for i in range(1, n_preds)]
    mp_list = [
        (i, names[i], {"predcls": RefEval("predcls", multiple_preds=True)})
        for i in range(1, n_preds)]
    ours = MeanRecallEvaluator("predcls", names,
                               multiple_preds=multiple_preds)

    rng = np.random.RandomState(7)
    for _ in range(6):
        gt, pred = _random_scene(rng, rng.randint(4, 9), rng.randint(2, 8),
                                 n_classes=n_classes, n_preds=n_preds)
        eval_entry("predcls", gt, pred, evaluator_list, mp_list)
        ours.add_image(gt, pred)

    ref_mr = calculate_mR_from_evaluator_list(
        mp_list if multiple_preds else evaluator_list, "predcls")
    our_mr = ours.results()
    for k in (20, 50, 100):
        assert abs(ref_mr[f"R@{k}"] - our_mr[f"mR@{k}"]) < 1e-9, (
            multiple_preds, k, ref_mr, our_mr)
