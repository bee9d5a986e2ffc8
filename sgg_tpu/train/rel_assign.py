"""SGDet relation target assignment (detections → GT relations), jit-safe.

Rebuild of ``rel_assignments`` (``/root/reference/lib/rel_assignments.py``),
the numpy-per-image CPU loop that matches detections to GT objects (same
class and IoU >= 0.5) and samples FG relation pairs per GT relation weighted
by the IoU product, capped at ``REL_FG_FRACTION * 64 = 16`` FG per image;
background pairs come from overlapping non-FG detection pairs, filling to 64
relations per image; images with nothing get one dummy relation
(``rel_assignments.py:119-121``).

TPU-native design: fully vectorized over padded detection/GT sets inside
jit — per-GT-relation weighted sampling via Gumbel-argmax over the masked
candidate-pair grid (the reference's ``npr.choice`` with ``num_sample_per_gt
= 1``, the live setting at ``rel_model_stanford.py:140``), FG capping and BG
filling via the same scored-top-k trick as the GT-box sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sgg_tpu.constants import REL_FG_FRACTION
from sgg_tpu.ops.boxes import box_iou

RELS_PER_IMAGE_DET = 64  # rel_assignments.py:109


def _assign_one(key, det_boxes, det_labels, det_mask, gt_boxes, gt_classes,
                gt_rels, gt_rel_mask, max_out: int, fg_thresh: float,
                filter_non_overlap: bool):
    N = det_boxes.shape[0]
    Eg = gt_rels.shape[0]
    max_fg = int(round(REL_FG_FRACTION * max_out))
    k_fg, k_cap, k_bg = jax.random.split(key, 3)

    iou = box_iou(det_boxes, gt_boxes)  # (N, Ng)
    is_match = ((det_labels[:, None] == gt_classes[None])
                & (iou >= fg_thresh) & det_mask[:, None])

    # --- FG: one weighted sample per GT relation (num_sample_per_gt=1)
    ms = is_match[:, gt_rels[:, 0]].T      # (Eg, N) subject matches
    mo = is_match[:, gt_rels[:, 1]].T      # (Eg, N) object matches
    iou_s = iou[:, gt_rels[:, 0]].T        # (Eg, N)
    iou_o = iou[:, gt_rels[:, 1]].T
    off_diag = ~jnp.eye(N, dtype=bool)
    cand = (ms[:, :, None] & mo[:, None, :] & off_diag[None]
            & gt_rel_mask[:, None, None])  # (Eg, N, N)
    w = iou_s[:, :, None] * iou_o[:, None, :]
    logits = jnp.where(cand, jnp.log(jnp.maximum(w, 1e-12)), -jnp.inf)
    gumbel = jax.random.gumbel(k_fg, logits.shape)
    flat = (logits + gumbel).reshape(Eg, N * N)
    pick = flat.argmax(axis=1)
    fg_valid = cand.reshape(Eg, N * N).any(axis=1)
    fg_subj = (pick // N).astype(jnp.int32)
    fg_obj = (pick % N).astype(jnp.int32)
    fg_pred = gt_rels[:, 2].astype(jnp.int32)

    # cap FG at max_fg by random rank (rel_assignments.py:101-102)
    u = jnp.where(fg_valid, jax.random.uniform(k_cap, (Eg,)), jnp.inf)
    rank = jnp.argsort(jnp.argsort(u))
    fg_keep = fg_valid & (rank < max_fg)
    fg_score = jnp.where(fg_keep, 2.0 + u, -jnp.inf)

    # --- BG: overlapping non-FG detection pairs with non-bg labels
    pair_iou = box_iou(det_boxes, det_boxes)
    if filter_non_overlap:
        possible = (pair_iou > 0) & (pair_iou < 1)
    else:
        possible = off_diag
    possible &= det_mask[:, None] & det_mask[None, :]
    possible &= (det_labels[:, None] > 0) & (det_labels[None, :] > 0)
    possible &= off_diag
    # exclude every FG candidate pair (rel_assignments.py:90)
    fg_any = cand.any(axis=0)
    possible &= ~fg_any
    u_bg = jax.random.uniform(k_bg, (N * N,))
    bg_score = jnp.where(possible.reshape(-1), u_bg, -jnp.inf)
    bg_subj = jnp.repeat(jnp.arange(N, dtype=jnp.int32), N)
    bg_obj = jnp.tile(jnp.arange(N, dtype=jnp.int32), N)

    all_score = jnp.concatenate([fg_score, bg_score])
    all_subj = jnp.concatenate([fg_subj, bg_subj])
    all_obj = jnp.concatenate([fg_obj, bg_obj])
    all_pred = jnp.concatenate([fg_pred, jnp.zeros((N * N,), jnp.int32)])
    pad = max(0, max_out - all_score.shape[0])
    if pad:
        all_score = jnp.concatenate([all_score, jnp.full((pad,), -jnp.inf)])
        all_subj = jnp.concatenate([all_subj, jnp.zeros((pad,), jnp.int32)])
        all_obj = jnp.concatenate([all_obj, jnp.zeros((pad,), jnp.int32)])
        all_pred = jnp.concatenate([all_pred, jnp.zeros((pad,), jnp.int32)])

    top_s, top_i = jax.lax.top_k(all_score, max_out)
    mask = top_s > -jnp.inf
    rels = jnp.stack([
        jnp.where(mask, all_subj[top_i], 0),
        jnp.where(mask, all_obj[top_i], 0),
        jnp.where(mask, all_pred[top_i], 0)], axis=1)
    # dummy relation when nothing survives (rel_assignments.py:119-121)
    none = ~mask.any()
    mask = mask.at[0].set(mask[0] | none)
    return rels, mask


@functools.partial(jax.jit, static_argnames=("max_out", "fg_thresh",
                                             "filter_non_overlap"))
def rel_assignments(key, det_boxes, det_labels, det_mask, gt_boxes,
                    gt_classes, gt_rels, gt_rel_mask, *,
                    max_out: int = RELS_PER_IMAGE_DET,
                    fg_thresh: float = 0.5,
                    filter_non_overlap: bool = True):
    """Batched sgdet relation sampling.

    det_*: (B, N, ...) padded detections; gt_*: (B, Ng/Eg, ...) padded GT.
    Returns (rels (B, max_out, 3) int32 over detection indices, mask).
    """
    B = det_boxes.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(lambda k, db, dl, dm, gb, gc, gr, grm: _assign_one(
        k, db, dl, dm, gb, gc, gr, grm, max_out, fg_thresh,
        filter_non_overlap))(keys, det_boxes, det_labels, det_mask,
                             gt_boxes, gt_classes, gt_rels, gt_rel_mask)
