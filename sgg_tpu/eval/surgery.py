"""Model outputs → ranked evaluation entry (reference ``lib/surgery.py``).

``filter_dets`` ranks candidate pairs by
``max_nonbg_predicate_score * obj_score_subj * obj_score_obj`` descending and
returns the ranked pair indices plus the per-predicate score rows in that
order (``/root/reference/lib/surgery.py:40-55``). Here the sort runs on
device (one ``argsort``) over the padded pair set, with invalid (masked)
pairs pushed to the end; the numpy conversion happens once at the host
boundary.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def rank_pairs(obj_scores: jnp.ndarray, pair_inds: jnp.ndarray,
               rel_dists: jnp.ndarray, pair_mask: jnp.ndarray):
    """Rank candidate pairs for evaluation (device side).

    Args:
      obj_scores: (N,) per-object scores.
      pair_inds: (E, 2) candidate pair indices.
      rel_dists: (E, R) per-pair predicate distributions (softmaxed).
      pair_mask: (E,) validity.

    Returns:
      (order (E,) int32 ranking, key (E,) ranking scores) — invalid pairs
      sort last.
    """
    s0 = obj_scores[pair_inds[:, 0]]
    s1 = obj_scores[pair_inds[:, 1]]
    score = rel_dists[:, 1:].max(axis=1) * s0 * s1
    score = jnp.where(pair_mask, score, -jnp.inf)
    order = jnp.argsort(-score)
    return order, score


def filter_dets(boxes, obj_scores, obj_classes, pair_inds, rel_dists,
                pair_mask) -> Dict[str, np.ndarray]:
    """Build the numpy pred_entry consumed by the evaluator.

    Same output contract as the reference ``filter_dets`` (boxes, classes,
    obj scores, ranked pair inds, per-predicate rows), packaged as the dict
    the evaluator's ``add_image`` expects.
    """
    order, score = rank_pairs(obj_scores, pair_inds, rel_dists, pair_mask)
    order = np.asarray(order)
    n_valid = int(np.asarray(pair_mask).sum())
    order = order[:n_valid]
    return {
        "pred_boxes": np.asarray(boxes),
        "pred_classes": np.asarray(obj_classes),
        "obj_scores": np.asarray(obj_scores),
        "pred_rel_inds": np.asarray(pair_inds)[order],
        "rel_scores": np.asarray(rel_dists)[order],
    }
