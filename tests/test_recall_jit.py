"""On-device recall must match the host (reference-parity) evaluator."""

import jax.numpy as jnp
import numpy as np

from sgg_tpu.eval import SGGEvaluator, filter_dets
from sgg_tpu.eval.recall_jit import batch_recall


def _scene(rng, n, n_cls=8, n_pred=5, jitter=0.0):
    boxes = rng.rand(n, 4).astype(np.float32) * 80
    boxes[:, 2:] += boxes[:, :2] + 10
    classes = rng.randint(1, n_cls, n)
    pairs = np.asarray([(i, j) for i in range(n) for j in range(n) if i != j])
    rel_scores = rng.rand(len(pairs), n_pred).astype(np.float32)
    rel_scores /= rel_scores.sum(1, keepdims=True)
    obj_scores = rng.rand(n).astype(np.float32)
    n_gt = rng.randint(1, 5)
    sel = rng.choice(len(pairs), n_gt, replace=False)
    gt_rels = np.asarray([(pairs[s][0], pairs[s][1], rng.randint(1, n_pred))
                          for s in sel])
    pred_boxes = boxes + rng.randn(n, 4).astype(np.float32) * jitter
    pred_classes = classes.copy()
    flip = rng.rand(n) < 0.3
    pred_classes[flip] = rng.randint(1, n_cls, flip.sum())
    return (boxes, classes, gt_rels, pairs, rel_scores, obj_scores,
            pred_boxes, pred_classes)


def test_matches_host_evaluator_gc():
    rng = np.random.RandomState(0)
    B, N = 4, 7
    E = N * (N - 1)
    E_GT = 6
    host_recalls = {20: [], 50: []}

    b_boxes = np.zeros((B, N, 4), np.float32)
    b_cls = np.zeros((B, N), np.int32)
    b_scores = np.zeros((B, N), np.float32)
    b_pairs = np.zeros((B, E, 2), np.int32)
    b_pmask = np.zeros((B, E), bool)
    b_dists = np.zeros((B, E, 5), np.float32)
    b_gtb = np.zeros((B, N, 4), np.float32)
    b_gtc = np.zeros((B, N), np.int32)
    b_gtr = np.zeros((B, E_GT, 3), np.int32)
    b_gtm = np.zeros((B, E_GT), bool)

    for b in range(B):
        n = rng.randint(4, N + 1)
        (gt_boxes, gt_classes, gt_rels, pairs, rel_scores, obj_scores,
         pred_boxes, pred_classes) = _scene(rng, n, jitter=3.0)
        # host evaluator (sgdet mode exercises boxes+classes matching)
        entry = filter_dets(jnp.asarray(pred_boxes), jnp.asarray(obj_scores),
                            jnp.asarray(pred_classes), jnp.asarray(pairs),
                            jnp.asarray(rel_scores),
                            jnp.ones(len(pairs), bool))
        ev = SGGEvaluator("sgdet", ks=(20, 50))
        ev.add_image({"gt_relations": gt_rels, "gt_boxes": gt_boxes,
                      "gt_classes": gt_classes}, entry)
        for k in (20, 50):
            host_recalls[k].append(ev.recalls[k][0])

        e = len(pairs)
        b_boxes[b, :n] = pred_boxes
        b_cls[b, :n] = pred_classes
        b_scores[b, :n] = obj_scores
        b_pairs[b, :e] = pairs
        b_pmask[b, :e] = True
        b_dists[b, :e] = rel_scores
        b_gtb[b, :n] = gt_boxes
        b_gtc[b, :n] = gt_classes
        g = len(gt_rels)
        b_gtr[b, :g] = gt_rels
        b_gtm[b, :g] = True

    dev = batch_recall(jnp.asarray(b_boxes), jnp.asarray(b_cls),
                       jnp.asarray(b_scores), jnp.asarray(b_pairs),
                       jnp.asarray(b_pmask), jnp.asarray(b_dists),
                       jnp.asarray(b_gtb), jnp.asarray(b_gtc),
                       jnp.asarray(b_gtr), jnp.asarray(b_gtm), ks=(20, 50))
    for k in (20, 50):
        np.testing.assert_allclose(np.asarray(dev[k]),
                                   np.asarray(host_recalls[k]), atol=1e-6)


def test_perfect_predictions_give_recall_one():
    rng = np.random.RandomState(1)
    n = 5
    (gt_boxes, gt_classes, gt_rels, pairs, rel_scores, obj_scores,
     _, _) = _scene(rng, n)
    # craft scores: GT predicate max for GT pairs
    rel_scores = np.full((len(pairs), 5), 0.01, np.float32)
    for s, o, p in gt_rels:
        row = np.nonzero((pairs[:, 0] == s) & (pairs[:, 1] == o))[0][0]
        rel_scores[row, p] = 0.9
    dev = batch_recall(
        jnp.asarray(gt_boxes[None]), jnp.asarray(gt_classes[None]),
        jnp.ones((1, n), jnp.float32), jnp.asarray(pairs[None]),
        jnp.ones((1, len(pairs)), bool), jnp.asarray(rel_scores[None]),
        jnp.asarray(gt_boxes[None]), jnp.asarray(gt_classes[None]),
        jnp.asarray(gt_rels[None]), jnp.ones((1, len(gt_rels)), bool),
        ks=(20,))
    np.testing.assert_allclose(np.asarray(dev[20]), 1.0)
