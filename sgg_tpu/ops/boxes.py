"""Box geometry ops (JAX, jit-friendly, fixed shapes).

TPU-native equivalents of the reference box utilities:
``bbox_overlaps`` (``/root/reference/lib/pytorch_misc.py:60-67``, which wraps
``torchvision.ops.box_iou``), the union-box construction inside
``node_edge_features`` (``/root/reference/sgg_models/rel_model_base.py:248-250``)
and the center→corner conversion in the VG loader
(``/root/reference/dataloaders/visual_genome.py:565-567``).

All functions are pure, shape-polymorphic in the leading batch dims, and safe
under ``jit``/``vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of ``[x1, y1, x2, y2]`` boxes; last dim is 4.

    Matches torchvision ``box_iou`` semantics (no +1 offsets), which is what
    the reference uses via ``bbox_overlaps``.
    """
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def union_boxes(boxes: jnp.ndarray, subj: jnp.ndarray, obj: jnp.ndarray) -> jnp.ndarray:
    """Union box of each (subject, object) pair.

    ``boxes``: (..., N, 4); ``subj``/``obj``: (..., E) integer indices into N.
    Returns (..., E, 4) — elementwise min of the top-left corners and max of
    the bottom-right corners, exactly the reference's union-roi construction
    (``rel_model_base.py:248-250``).
    """
    b_s = jnp.take_along_axis(boxes, subj[..., None], axis=-2)
    b_o = jnp.take_along_axis(boxes, obj[..., None], axis=-2)
    return jnp.concatenate(
        [jnp.minimum(b_s[..., :2], b_o[..., :2]),
         jnp.maximum(b_s[..., 2:], b_o[..., 2:])], axis=-1)


def center_to_corner(boxes_cwh: jnp.ndarray) -> jnp.ndarray:
    """``[cx, cy, w, h]`` -> ``[x1, y1, x2, y2]``.

    Mirrors the VG-SGG.h5 box decoding (``visual_genome.py:565-567``): the h5
    stores center format; corners are center ± size/2.
    """
    c = boxes_cwh[..., :2]
    wh = boxes_cwh[..., 2:]
    return jnp.concatenate([c - wh / 2, c + wh / 2], axis=-1)


def scale_boxes_01(boxes: jnp.ndarray, im_hw: jnp.ndarray) -> jnp.ndarray:
    """Scale pixel boxes to [0, 1] by per-image (height, width).

    Reference: ``get_scaled_boxes`` (``rel_model_base.py:263-274``).
    ``boxes``: (..., N, 4); ``im_hw``: (..., 2) as (h, w).
    """
    h = im_hw[..., None, 0:1]
    w = im_hw[..., None, 1:2]
    scale = jnp.concatenate([w, h, w, h], axis=-1)
    return boxes / scale


def clip_boxes(boxes: jnp.ndarray, im_hw: jnp.ndarray) -> jnp.ndarray:
    """Clip boxes to image bounds. ``im_hw``: (..., 2) as (h, w)."""
    h = im_hw[..., None, 0]
    w = im_hw[..., None, 1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
