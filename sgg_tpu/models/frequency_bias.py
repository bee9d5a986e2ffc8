"""Frequency bias: log P(predicate | subj_class, obj_class) lookup.

Rebuild of ``FrequencyBias`` (``/root/reference/lib/sparse_targets.py:7-48``)
and the count-matrix construction ``get_counts`` / ``box_filter``
(``/root/reference/lib/get_dataset_counts.py``): a learnable embedding table
of empirical log predicate distributions per (subject class, object class)
pair, initialized from training-set statistics; background counts come from
overlapping non-annotated pairs (+1 smoothing) and fill predicate 0.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sgg_tpu.eval.sgg_eval import np_box_iou


def count_matrices(gt_boxes, gt_classes, relationships, num_classes: int,
                   num_predicates: int, must_overlap: bool = True):
    """FG triplet counts + BG overlapping-pair counts (host, numpy).

    Args:
      gt_boxes/gt_classes/relationships: per-image lists (dataset contract).

    Returns:
      (fg (C, C, R) int64, bg (C, C) int64) — reference get_dataset_counts.py:10-44.
    """
    fg = np.zeros((num_classes, num_classes, num_predicates), np.int64)
    bg = np.zeros((num_classes, num_classes), np.int64)
    for boxes, classes, rels in zip(gt_boxes, gt_classes, relationships):
        for s, o, p in rels:
            fg[classes[s], classes[o], p] += 1
        for s, o in overlapping_pairs(boxes, must_overlap):
            bg[classes[s], classes[o]] += 1
    return fg, bg


def overlapping_pairs(boxes: np.ndarray, must_overlap: bool = False):
    """Candidate BG pairs: overlapping ordered pairs, falling back to all
    pairs when nothing overlaps (reference box_filter,
    get_dataset_counts.py:47-65)."""
    n = boxes.shape[0]
    off_diag = ~np.eye(n, dtype=bool)
    if must_overlap:
        overlaps = (np_box_iou(boxes.astype(float), boxes.astype(float)) > 0)
        overlaps &= off_diag
        pairs = np.column_stack(np.nonzero(overlaps))
        if pairs.size:
            return pairs
    return np.column_stack(np.nonzero(off_diag))


def log_predicate_distribution(fg: np.ndarray, bg: np.ndarray,
                               eps: float = 1e-3) -> np.ndarray:
    """(C, C, R) log distribution, bg counts+1 into predicate 0
    (reference sparse_targets.py:16-21)."""
    fg = fg.astype(np.float64).copy()
    fg[:, :, 0] = bg + 1
    return np.log(fg / fg.sum(2, keepdims=True) + eps).astype(np.float32)


class FrequencyBias(nn.Module):
    """Embedding over (subj_class * C + obj_class) -> predicate logits."""

    num_classes: int
    num_predicates: int
    init_table: Optional[np.ndarray] = None  # (C, C, R) log distribution
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, subj_cls: jnp.ndarray, obj_cls: jnp.ndarray):
        """(...,) class index pairs -> (..., R) bias logits."""
        C, R = self.num_classes, self.num_predicates
        if self.init_table is not None:
            table = np.asarray(self.init_table, np.float32).reshape(C * C, R)
            init = lambda *_: jnp.asarray(table)
        else:
            init = nn.initializers.zeros
        emb = self.param("table", init, (C * C, R))
        idx = subj_cls.astype(jnp.int32) * C + obj_cls.astype(jnp.int32)
        return jnp.take(emb, idx, axis=0).astype(self.dtype)
