"""Faster R-CNN detector (VGG16 trunk, single-scale anchors) — jit-native.

Rebuild of the torchvision ``FasterRCNN`` assembly the reference wraps
(``/root/reference/sgg_models/rel_model_base.py:83-117``): VGG16 stride-16
features, single-level anchors (sizes 32–512, ratios 0.5/1/2), an RPN with
3x3 conv head, RoIAlign 7x7 + TwoMLPHead 4096-d box head, class-specific box
regression, score threshold 0.2 and 50 detections per image.

TPU-native design: everything is fixed-shape — proposal generation keeps a
static top-k before and after the masked-loop NMS (``sgg_tpu.ops.nms``);
detections are padded ``(B, D)`` sets with validity masks; training target
assignment and sampling are vectorized masked ops inside jit (torchvision
does all of this in C++/Python with dynamic shapes).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sgg_tpu.constants import POOL_SIZE, STRIDE, VGG_OBJ_DIM
from sgg_tpu.models.backbone import RoiHead, VGG16Trunk
from sgg_tpu.ops.boxes import box_iou, clip_boxes
from sgg_tpu.ops.nms import decode_boxes, encode_boxes, nms
from sgg_tpu.ops.roi_align import roi_align

ANCHOR_SIZES = (32, 64, 128, 256, 512)  # rel_model_base.py:94
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
ROI_WEIGHTS = (10.0, 10.0, 5.0, 5.0)  # torchvision roi-head box coder


def make_anchors(fh: int, fw: int, stride: int = STRIDE,
                 sizes=ANCHOR_SIZES, ratios=ANCHOR_RATIOS) -> np.ndarray:
    """(fh*fw*A, 4) anchors, torchvision AnchorGenerator semantics
    (zero-centered cell anchors shifted by stride)."""
    cell = []
    for size in sizes:
        area = float(size) ** 2
        for r in ratios:
            h = np.sqrt(area / r)
            w = r * h
            cell.append([-w / 2, -h / 2, w / 2, h / 2])
    cell = np.asarray(cell, np.float32)  # (A, 4)
    ys = (np.arange(fh, dtype=np.float32)) * stride
    xs = (np.arange(fw, dtype=np.float32)) * stride
    shift_x, shift_y = np.meshgrid(xs, ys)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y],
                      axis=-1).reshape(-1, 1, 4)
    return (shifts + cell[None]).reshape(-1, 4)


class RPNHead(nn.Module):
    """3x3 conv -> objectness + 4-delta per anchor (torchvision RPNHead)."""

    num_anchors: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, fmap: jnp.ndarray):
        t = nn.relu(nn.Conv(fmap.shape[-1], (3, 3), padding=1,
                            dtype=self.dtype, name="conv")(fmap))
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="cls_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         name="bbox_pred")(t)
        B, H, W, _ = obj.shape
        return (obj.reshape(B, H * W * self.num_anchors).astype(jnp.float32),
                deltas.reshape(B, H * W * self.num_anchors,
                               4).astype(jnp.float32))


def generate_proposals(anchors, obj_logits, deltas, im_hw, *,
                       pre_nms_top_n: int, post_nms_top_n: int,
                       nms_thresh: float = 0.7, min_size: float = 1e-3,
                       nms_method: str = "sequential", nms_rounds: int = 16):
    """Per-batch proposal generation (torchvision RPN filter_proposals).

    anchors (K, 4); obj_logits (B, K); deltas (B, K, 4); im_hw (B, 2).
    Returns (proposals (B, P, 4), scores (B, P), mask (B, P),
    nms_converged (B,) — always True except for method="rounds" with a
    deeper-than-budget suppression chain; see ops/nms.py).
    """
    boxes = decode_boxes(anchors[None], deltas)
    boxes = clip_boxes(boxes, im_hw)

    def one(b, s, hw):
        ws = b[:, 2] - b[:, 0]
        hs = b[:, 3] - b[:, 1]
        valid = (ws > min_size) & (hs > min_size)
        k = min(pre_nms_top_n, s.shape[0])
        # top_k at a 128-lane-aligned width with ranks >= k masked
        # invalid: identical to top_k(k) (the top k of the sorted k_pad
        # ARE the top k), but keeps every downstream gather/NMS shape
        # aligned — this toolchain kernel-faults on the unaligned
        # k=1000 candidate arrays composed with the rounds NMS
        # (bisected 2026-08: k=1000 crashes, k=1024 runs).
        k_pad = min(-(-k // 128) * 128, s.shape[0])
        top_s, top_i = jax.lax.top_k(jnp.where(valid, s, -jnp.inf), k_pad)
        nms_valid = (top_s > -jnp.inf) & (jnp.arange(k_pad) < k)
        idx, mask, conv = nms(b[top_i], top_s, nms_valid, nms_thresh,
                              post_nms_top_n, method=nms_method,
                              rounds=nms_rounds, with_converged=True)
        # compose indices instead of chaining gathers: a gather-of-gather
        # output (b[top_i][idx]) generates code that crashes this
        # toolchain's TPU worker (kernel fault, bisected 2026-08)
        return b[top_i[idx]], top_s[idx], mask, conv

    return jax.vmap(one)(boxes, obj_logits, im_hw)


def postprocess_detections(class_logits, box_deltas, proposals, prop_mask,
                           im_hw, *, score_thresh: float, nms_thresh: float,
                           detections_per_img: int,
                           nms_candidates: int = 1024,
                           nms_method: str = "sequential",
                           nms_rounds: int = 16):
    """torchvision RoIHeads.postprocess_detections, fixed shapes.

    class_logits (B, P, C); box_deltas (B, P, C*4); proposals (B, P, 4).
    Returns dict with boxes (B, D, 4), labels (B, D), scores (B, D),
    mask (B, D).

    ``nms_candidates`` caps the per-image (proposal, class) candidate set
    entering NMS to the top-M scores: the fixed-shape greedy NMS needs an
    (M, M) IoU matrix, and the raw P*(C-1) grid (512*150 = 76800 at the
    reference's VG settings) would need 23 GB of IoU — torchvision avoids
    this with a data-dependent ``scores > score_thresh`` gather that has no
    static shape. The cap is exact whenever at most M candidates clear
    ``score_thresh``; at low thresholds (the sgdet retry floor of 0.01)
    softmax tails can push many (proposal, class) cells over the line, so
    the output carries ``n_candidates`` (per-image count of candidates
    clearing the threshold, computed BEFORE the cap) — callers detect
    ``n_candidates > nms_candidates`` and re-run with a larger M
    (``sgdet_eval_with_retry`` does this automatically).
    """
    B, P, C = class_logits.shape
    D = detections_per_img
    scores = jax.nn.softmax(class_logits, axis=-1)
    boxes_all = decode_boxes(proposals[:, :, None, :],
                             box_deltas.reshape(B, P, C, 4),
                             weights=ROI_WEIGHTS)
    boxes_all = clip_boxes(boxes_all.reshape(B, P * C, 4),
                           im_hw).reshape(B, P, C, 4)

    def one(boxes_pc, scores_pc, pmask, hw):
        # drop background column; flatten (P, C-1)
        b = boxes_pc[:, 1:].reshape(-1, 4)
        s = scores_pc[:, 1:].reshape(-1)
        lbl = jnp.tile(jnp.arange(1, C, dtype=jnp.int32)[None], (P, 1))
        lbl = lbl.reshape(-1)
        valid = s > score_thresh
        valid &= jnp.repeat(pmask, C - 1)
        # min box size (torchvision min_size=1e-2 after regression)
        valid &= ((b[:, 2] - b[:, 0]) > 1e-2) & ((b[:, 3] - b[:, 1]) > 1e-2)
        n_cand = valid.sum()  # pre-cap count: the overflow signal
        # top-M candidate cap (see docstring)
        M = min(nms_candidates, s.shape[0])
        cs, ci = jax.lax.top_k(jnp.where(valid, s, -jnp.inf), M)
        clbl = lbl[ci]
        cvalid = cs > -jnp.inf
        # per-class NMS via the coordinate-offset trick
        offset = clbl.astype(jnp.float32)[:, None] * (
            jnp.max(hw) + 1000.0)
        idx, mask, conv = nms(b[ci] + offset, cs, cvalid, nms_thresh, D,
                              method=nms_method, rounds=nms_rounds,
                              with_converged=True)
        # composed indices, not chained gathers (see generate_proposals)
        fi = ci[idx]
        return (b[fi], lbl[fi], jnp.where(mask, cs[idx], 0.0), mask,
                n_cand, conv)

    boxes, labels, det_scores, mask, n_candidates, converged = jax.vmap(one)(
        boxes_all, scores, prop_mask, im_hw)
    return {"boxes": boxes, "labels": labels, "scores": det_scores,
            "mask": mask, "n_candidates": n_candidates,
            "nms_converged": converged}


class FasterRCNNVGG(nn.Module):
    """Single-scale VGG16 Faster R-CNN with padded outputs."""

    num_classes: int
    pool_size: int = POOL_SIZE
    stride: int = STRIDE
    obj_dim: int = VGG_OBJ_DIM
    score_thresh: float = 0.2   # rel_model_base.py:108
    nms_thresh: float = 0.5
    detections_per_img: int = 50  # rel_model_base.py:107
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 512
    rpn_nms_thresh: float = 0.7
    # top-M candidate cap ahead of the detection NMS (see
    # postprocess_detections). The RPN side needs no extra cap here:
    # generate_proposals' pre_nms_top_n IS its candidate cap.
    nms_candidates: int = 1024
    # NMS algorithm (ops/nms.py): "rounds" breaks the greedy scalar chain
    # into monotone vector rounds (~5x on v5e) and reports per-image
    # convergence in dets["nms_converged"]; callers escalate to
    # nms_method="sequential" on a False flag (sgdet_eval_with_retry does).
    nms_method: str = "rounds"
    nms_rounds: int = 16
    dtype: Any = jnp.bfloat16

    def features(self, images):
        return VGG16Trunk(dtype=self.dtype, name="trunk")(images)

    @nn.compact
    def __call__(self, images, im_hw, *, fmap=None, train: bool = False,
                 score_thresh: Optional[float] = None,
                 gt_boxes=None, gt_mask=None):
        if fmap is None:
            fmap = self.features(images)
        B, fh, fw, _ = fmap.shape
        A = len(ANCHOR_SIZES) * len(ANCHOR_RATIOS)
        anchors = jnp.asarray(make_anchors(fh, fw, self.stride))

        obj_logits, rpn_deltas = RPNHead(num_anchors=A, dtype=self.dtype,
                                         name="rpn")(fmap)
        proposals, prop_scores, prop_mask, rpn_conv = generate_proposals(
            anchors, obj_logits, rpn_deltas, im_hw,
            pre_nms_top_n=self.rpn_pre_nms_top_n,
            post_nms_top_n=self.rpn_post_nms_top_n,
            nms_thresh=self.rpn_nms_thresh,
            nms_method=self.nms_method, nms_rounds=self.nms_rounds)
        if gt_boxes is not None:
            # detector-training path only (torchvision add_gt_proposals)
            proposals, prop_mask = append_gt_proposals(
                proposals, prop_mask, gt_boxes, gt_mask)

        pooled = roi_align(fmap, proposals,
                           spatial_scale=1.0 / self.stride,
                           pooled=self.pool_size)
        # torchvision TwoMLPHead semantics: fc6-relu-fc7-relu, no dropout
        feats = RoiHead(out_dim=self.obj_dim, with_final_relu=True,
                        dropout_rate=0.0, dtype=self.dtype,
                        name="box_head")(pooled, train=train)
        class_logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                                name="cls_score")(
            feats.astype(jnp.float32))
        box_deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32,
                              name="bbox_pred")(feats.astype(jnp.float32))

        dets = postprocess_detections(
            class_logits, box_deltas, proposals, prop_mask, im_hw,
            score_thresh=(self.score_thresh if score_thresh is None
                          else score_thresh),
            nms_thresh=self.nms_thresh,
            detections_per_img=self.detections_per_img,
            nms_candidates=self.nms_candidates,
            nms_method=self.nms_method, nms_rounds=self.nms_rounds)
        dets["nms_converged"] = dets["nms_converged"] & rpn_conv
        dets.update({
            "fmap": fmap, "proposals": proposals, "prop_mask": prop_mask,
            "rpn_obj_logits": obj_logits, "rpn_deltas": rpn_deltas,
            "class_logits": class_logits, "box_deltas": box_deltas,
            "anchors": anchors,
        })
        return dets


class FasterRCNNFPN(nn.Module):
    """ResNet50-FPN Faster R-CNN (the reference's ``maskrcnn_resnet50_fpn``
    with the mask head removed, rel_model_base.py:58-81).

    Multi-level anchors (one size per pyramid level x 3 ratios), a shared
    RPN head, per-level top-k proposal selection with level-separated NMS
    (torchvision ``batched_nms`` semantics via the coordinate-offset trick),
    MultiScaleRoIAlign box features, and a 1024-d TwoMLPHead
    (``obj_dim=1024``, rel_model_base.py:59). The relation head consumes the
    LAST pyramid level ('pool', stride 64) as its global feature map
    (rel_model_base.py:239).
    """

    num_classes: int
    pool_size: int = POOL_SIZE
    obj_dim: int = 1024
    score_thresh: float = 0.2
    nms_thresh: float = 0.5
    detections_per_img: int = 50
    rpn_pre_nms_top_n: int = 1000   # per level
    rpn_post_nms_top_n: int = 512
    rpn_nms_thresh: float = 0.7
    # top-M candidate cap ahead of each fixed-shape NMS (see
    # postprocess_detections)
    nms_candidates: int = 1024
    rpn_nms_candidates: int = 2048
    # see FasterRCNNVGG.nms_method
    nms_method: str = "rounds"
    nms_rounds: int = 16
    dtype: Any = jnp.bfloat16

    LEVELS = ("p2", "p3", "p4", "p5", "pool")
    STRIDES = (4, 8, 16, 32, 64)
    SIZES = (32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, images, im_hw, *, pyramid=None, train: bool = False,
                 score_thresh: Optional[float] = None,
                 gt_boxes=None, gt_mask=None):
        from sgg_tpu.models.resnet import (ResNet50FPN,
                                           multiscale_roi_align)
        if pyramid is None:
            pyramid = ResNet50FPN(dtype=self.dtype,
                                  name="backbone")(images, train=train)
        A = len(ANCHOR_RATIOS)
        rpn = RPNHead(num_anchors=A, dtype=self.dtype, name="rpn")

        all_boxes, all_scores, all_lvl = [], [], []
        anchors_per_level = {}
        obj_logits_lvl, deltas_lvl = {}, {}
        for lvl, stride, size in zip(self.LEVELS, self.STRIDES, self.SIZES):
            fmap_l = pyramid[lvl]
            fh, fw = fmap_l.shape[1], fmap_l.shape[2]
            anchors = jnp.asarray(make_anchors(fh, fw, stride,
                                               sizes=(size,)))
            obj, deltas = rpn(fmap_l)
            anchors_per_level[lvl] = anchors
            obj_logits_lvl[lvl] = obj
            deltas_lvl[lvl] = deltas
            boxes = clip_boxes(decode_boxes(anchors[None], deltas), im_hw)
            k = min(self.rpn_pre_nms_top_n, obj.shape[1])
            top_s, top_i = jax.lax.top_k(obj, k)
            all_boxes.append(jnp.take_along_axis(
                boxes, top_i[..., None], axis=1))
            all_scores.append(top_s)
            all_lvl.append(jnp.full(top_s.shape,
                                    float(self.STRIDES.index(stride))))

        cat_boxes = jnp.concatenate(all_boxes, axis=1)
        cat_scores = jnp.concatenate(all_scores, axis=1)
        cat_lvl = jnp.concatenate(all_lvl, axis=1)

        def one(b, s, lv, hw):
            ws = b[:, 2] - b[:, 0]
            hs = b[:, 3] - b[:, 1]
            valid = (ws > 1e-3) & (hs > 1e-3)
            # top-M cap across the concatenated levels: bounds the (M, M)
            # IoU matrix of the fixed-shape NMS (same rationale as
            # postprocess_detections.nms_candidates)
            M = min(self.rpn_nms_candidates, s.shape[0])
            cs, ci = jax.lax.top_k(jnp.where(valid, s, -jnp.inf), M)
            clv = lv[ci]
            # level-separated NMS via coordinate offsets (batched_nms)
            offset = clv[:, None] * (jnp.max(hw) + 1000.0)
            idx, mask, conv = nms(b[ci] + offset, cs, cs > -jnp.inf,
                                  self.rpn_nms_thresh,
                                  self.rpn_post_nms_top_n,
                                  method=self.nms_method,
                                  rounds=self.nms_rounds,
                                  with_converged=True)
            # composed indices, not chained gathers (see generate_proposals)
            return b[ci[idx]], mask, conv

        proposals, prop_mask, rpn_conv = jax.vmap(one)(cat_boxes, cat_scores,
                                                       cat_lvl, im_hw)
        if gt_boxes is not None:
            # detector-training path only (torchvision add_gt_proposals)
            proposals, prop_mask = append_gt_proposals(
                proposals, prop_mask, gt_boxes, gt_mask)

        pooled = multiscale_roi_align(
            [pyramid[l] for l in self.LEVELS[:4]], proposals,
            self.STRIDES[:4], pooled=self.pool_size)
        # torchvision TwoMLPHead semantics: fc6-relu-fc7-relu, no dropout
        feats = RoiHead(out_dim=self.obj_dim, with_final_relu=True,
                        dropout_rate=0.0, dtype=self.dtype,
                        name="box_head")(pooled, train=train)
        class_logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                                name="cls_score")(feats.astype(jnp.float32))
        box_deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32,
                              name="bbox_pred")(feats.astype(jnp.float32))

        dets = postprocess_detections(
            class_logits, box_deltas, proposals, prop_mask, im_hw,
            score_thresh=(self.score_thresh if score_thresh is None
                          else score_thresh),
            nms_thresh=self.nms_thresh,
            detections_per_img=self.detections_per_img,
            nms_candidates=self.nms_candidates,
            nms_method=self.nms_method, nms_rounds=self.nms_rounds)
        dets["nms_converged"] = dets["nms_converged"] & rpn_conv
        dets.update({
            # the relation head's global feature map: last pyramid level
            "fmap": pyramid["pool"], "pyramid": pyramid,
            "proposals": proposals, "prop_mask": prop_mask,
            "rpn_obj_logits": jnp.concatenate(
                [obj_logits_lvl[l] for l in self.LEVELS], axis=1),
            "rpn_deltas": jnp.concatenate(
                [deltas_lvl[l] for l in self.LEVELS], axis=1),
            "anchors": jnp.concatenate(
                [anchors_per_level[l] for l in self.LEVELS], axis=0),
            "rpn_per_level": (obj_logits_lvl, deltas_lvl,
                              anchors_per_level),
            "class_logits": class_logits, "box_deltas": box_deltas,
        })
        return dets


# ---------------------------------------------------------------------------
# training target assignment + losses (torchvision RPN/RoIHeads semantics)

def _smooth_l1(x, beta: float = 1.0 / 9):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def assign_targets(anchors, gt_boxes, gt_mask, hi: float, lo: float,
                   allow_low_quality: bool = True):
    """torchvision Matcher: label 1 if IoU>=hi, 0 if <lo, -1 between; every
    GT's best anchor forced positive. Returns (labels (K,), matched (K,))."""
    iou = box_iou(anchors, gt_boxes)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best = iou.max(axis=1)
    matched = iou.argmax(axis=1)
    labels = jnp.where(best >= hi, 1, jnp.where(best < lo, 0, -1))
    if allow_low_quality:
        gt_best = jnp.where(gt_mask, iou.max(axis=0), -2.0)
        force = (iou == gt_best[None, :]) & gt_mask[None, :] & (iou > 0)
        labels = jnp.where(force.any(axis=1), 1, labels)
    return labels, matched


def _sample_balanced(key, labels, num: int, pos_fraction: float):
    """torchvision BalancedPositiveNegativeSampler: random subsets of
    positives/negatives with fixed totals. Returns (pos_mask, neg_mask)."""
    k_p, k_n = jax.random.split(key)
    n_pos_target = int(num * pos_fraction)
    is_pos = labels == 1
    is_neg = labels == 0
    u_p = jnp.where(is_pos, jax.random.uniform(k_p, labels.shape), 2.0)
    rank_p = jnp.argsort(jnp.argsort(u_p))
    n_pos = jnp.minimum(is_pos.sum(), n_pos_target)
    pos = is_pos & (rank_p < n_pos)
    u_n = jnp.where(is_neg, jax.random.uniform(k_n, labels.shape), 2.0)
    rank_n = jnp.argsort(jnp.argsort(u_n))
    n_neg = jnp.minimum(is_neg.sum(), num - n_pos)
    neg = is_neg & (rank_n < n_neg)
    return pos, neg


def rpn_losses(key, anchors, obj_logits, rpn_deltas, gt_boxes, gt_mask,
               batch_per_image: int = 256, pos_fraction: float = 0.5):
    """RPN objectness BCE + box smooth-L1 (torchvision compute_loss)."""
    import optax

    def one(key, obj, deltas, gtb, gtm):
        labels, matched = assign_targets(anchors, gtb, gtm, 0.7, 0.3)
        pos, neg = _sample_balanced(key, labels, batch_per_image,
                                    pos_fraction)
        sel = pos | neg
        tgt = encode_boxes(anchors, gtb[matched])
        box_l = jnp.where(pos, _smooth_l1(deltas - tgt).sum(-1), 0.0).sum()
        obj_l = jnp.where(
            sel, optax.sigmoid_binary_cross_entropy(
                obj, (labels == 1).astype(jnp.float32)), 0.0).sum()
        denom = jnp.maximum(sel.sum(), 1.0)
        return box_l / denom, obj_l / denom

    keys = jax.random.split(key, obj_logits.shape[0])
    box_l, obj_l = jax.vmap(one)(keys, obj_logits, rpn_deltas, gt_boxes,
                                 gt_mask)
    return {"loss_rpn_box_reg": box_l.mean(),
            "loss_objectness": obj_l.mean()}


def append_gt_proposals(proposals, prop_mask, gt_boxes, gt_mask):
    """Torchvision ``RoIHeads.add_gt_proposals`` in fixed shapes: the GT
    boxes join the RoI-head training proposals (torchvision
    roi_heads.py ``select_training_samples`` does this unconditionally —
    the reference fine-tunes ``maskrcnn_resnet50_fpn`` through it,
    ``/root/reference/pretrain_detector.py:82`` / ``detector/engine.py:31``).

    Without it the RoI classifier sees positives only when a raw RPN
    proposal already clears IoU 0.5, which near-never happens early in
    training — the classifier then collapses to predicting background
    (observed empirically: uniform ~1/C foreground scores after detector
    pretraining on fixtures). With fixed (B, P, 4) proposals, "append"
    becomes overwriting the TRAILING (lowest-score) slots: slot P-N+j
    takes gt_boxes[:, j] where gt_mask[:, j], keeping the original
    proposal (and its mask) in padded GT slots.
    """
    N = gt_boxes.shape[1]
    tail_b = jnp.where(gt_mask[..., None], gt_boxes,
                       proposals[:, -N:].astype(gt_boxes.dtype))
    tail_m = prop_mask[:, -N:] | gt_mask
    proposals = jnp.concatenate(
        [proposals[:, :-N], tail_b.astype(proposals.dtype)], axis=1)
    prop_mask = jnp.concatenate([prop_mask[:, :-N], tail_m], axis=1)
    return proposals, prop_mask


def roi_head_losses(key, proposals, prop_mask, class_logits, box_deltas,
                    gt_boxes, gt_classes, gt_mask,
                    batch_per_image: int = 512, pos_fraction: float = 0.25):
    """RoI-head CE + class-specific box smooth-L1 (torchvision
    fastrcnn_loss). Note: proposals here are post-RPN (fixed P); torchvision
    also appends GT boxes to proposals during training — pass
    ``gt_boxes``/``gt_mask`` to the detector forward (``append_gt_proposals``)
    so the logits cover the GT slots."""
    import optax
    C = class_logits.shape[-1]

    def one(key, props, pmask, cls_lg, box_d, gtb, gtc, gtm):
        labels, matched = assign_targets(props, gtb, gtm, 0.5, 0.5,
                                         allow_low_quality=False)
        labels = jnp.where(pmask, labels, -1)
        pos, neg = _sample_balanced(key, labels, batch_per_image,
                                    pos_fraction)
        sel = pos | neg
        cls_target = jnp.where(pos, gtc[matched], 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(cls_lg,
                                                             cls_target)
        ce = jnp.where(sel, ce, 0.0).sum() / jnp.maximum(sel.sum(), 1.0)
        tgt = encode_boxes(props, gtb[matched], weights=ROI_WEIGHTS)
        box_d = box_d.reshape(-1, C, 4)
        per_cls = jnp.take_along_axis(
            box_d, cls_target[:, None, None].repeat(4, -1), axis=1)[:, 0]
        box_l = jnp.where(pos, _smooth_l1(per_cls - tgt).sum(-1), 0.0)
        box_l = box_l.sum() / jnp.maximum(sel.sum(), 1.0)
        return ce, box_l

    keys = jax.random.split(key, class_logits.shape[0])
    ce, box_l = jax.vmap(one)(keys, proposals, prop_mask, class_logits,
                              box_deltas, gt_boxes, gt_classes, gt_mask)
    return {"loss_classifier": ce.mean(), "loss_box_reg": box_l.mean()}
