"""On-device Recall@K for the fast validation loop.

The reporting-grade evaluator (``sgg_tpu.eval.sgg_eval``) is numpy on the
host with exact reference semantics; this module is the TPU-resident tier
(SURVEY.md §7.1): a fully vectorized, fixed-shape graph-constrained
Recall@K usable inside the training loop without host round trips. It
matches the host evaluator exactly for the GC protocol on GT-box modes
(predcls/sgcls): prediction ranked list = pairs sorted by
``max_nonbg_rel * obj0 * obj1``; match = exact (subj_cls, pred, obj_cls)
triplet + both-box IoU >= 0.5; union counting over the top-K.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from sgg_tpu.constants import RECALL_KS
from sgg_tpu.ops.boxes import box_iou


@functools.partial(jax.jit, static_argnames=("ks",))
def batch_recall(
    boxes: jnp.ndarray, pred_classes: jnp.ndarray, obj_scores: jnp.ndarray,
    pairs: jnp.ndarray, pair_mask: jnp.ndarray, rel_dists: jnp.ndarray,
    gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray, gt_rels: jnp.ndarray,
    gt_rel_mask: jnp.ndarray, ks: Sequence[int] = RECALL_KS,
) -> Dict[int, jnp.ndarray]:
    """Graph-constrained Recall@K over a padded batch.

    Args:
      boxes/pred_classes/obj_scores: (B, N, 4)/(B, N)/(B, N) predictions.
      pairs/pair_mask/rel_dists: (B, E, 2)/(B, E)/(B, E, R) candidates.
      gt_*: (B, N, 4)/(B, N)/(B, E_gt, 3)/(B, E_gt) ground truth.

    Returns {k: (B,) per-image recalls} (nan-free; images with no GT rels
    report 0 — mask them out when averaging).
    """
    # GC predicate choice + ranking score (surgery.py:40-47)
    pred_p = jnp.argmax(rel_dists[..., 1:], axis=-1) + 1     # (B, E)
    pred_score = jnp.max(rel_dists[..., 1:], axis=-1)
    s0 = jnp.take_along_axis(obj_scores, pairs[..., 0], 1)
    s1 = jnp.take_along_axis(obj_scores, pairs[..., 1], 1)
    score = jnp.where(pair_mask, pred_score * s0 * s1, -jnp.inf)
    order = jnp.argsort(-score, axis=-1)                      # (B, E)
    rank = jnp.zeros_like(order).at[
        jnp.arange(order.shape[0])[:, None], order].set(
        jnp.broadcast_to(jnp.arange(order.shape[1]), order.shape))

    # triplet match matrix (B, E, E_gt)
    def take(x, idx):
        return jnp.take_along_axis(x, idx, 1)

    p_sub_cls = take(pred_classes, pairs[..., 0])
    p_obj_cls = take(pred_classes, pairs[..., 1])
    g_sub_cls = take(gt_classes, gt_rels[..., 0])
    g_obj_cls = take(gt_classes, gt_rels[..., 1])

    cls_match = ((p_sub_cls[:, :, None] == g_sub_cls[:, None, :])
                 & (p_obj_cls[:, :, None] == g_obj_cls[:, None, :])
                 & (pred_p[:, :, None] == gt_rels[..., 2][:, None, :]))

    iou = box_iou(boxes, gt_boxes)  # (B, N, N)
    sub_iou = jnp.take_along_axis(
        jnp.take_along_axis(iou, pairs[..., 0:1], 1).swapaxes(1, 2),
        gt_rels[..., 0:1], 1).swapaxes(1, 2)  # (B, E, E_gt)
    obj_iou = jnp.take_along_axis(
        jnp.take_along_axis(iou, pairs[..., 1:2], 1).swapaxes(1, 2),
        gt_rels[..., 1:2], 1).swapaxes(1, 2)

    match = (cls_match & (sub_iou >= 0.5) & (obj_iou >= 0.5)
             & pair_mask[:, :, None] & gt_rel_mask[:, None, :])

    n_gt = jnp.maximum(gt_rel_mask.sum(-1), 1).astype(jnp.float32)
    out = {}
    for k in ks:
        topk = match & (rank[:, :, None] < k)
        matched_gt = topk.any(axis=1)  # union semantics over predictions
        out[k] = matched_gt.sum(-1) / n_gt
    return out
