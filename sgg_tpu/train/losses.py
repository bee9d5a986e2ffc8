"""Node and edge classification losses, including the density-aware (dnorm)
edge loss of "Graph Density-Aware Losses for Novel Compositions in Scene
Graph Generation" (BMVC 2020).

Rebuild of ``/root/reference/lib/losses.py``:

* ``baseline``: mean CE over all M sampled edges, scaled by gamma
  (``losses.py:39-43``);
* ``dnorm``: FG edges weighted ``alpha / M_FG``, BG edges ``beta / M_FG``
  (``losses.py:45-57``) — the hyperparameter-free density normalization;
* ``dnorm-fgbg``: FG ``alpha / M_FG``, BG ``beta / M_BG`` (``losses.py:58-60``);
* node loss: plain CE over object logits (``losses.py:73-74``).

TPU-native difference: batches are padded, so every count (M, M_FG, M_BG)
is a mask-aware sum — padding contributes exactly zero loss and zero count,
preserving the reference's normalization semantics on the valid subset.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import optax


def _masked_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE, zeroed where mask is False."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)
    return jnp.where(mask, ce, 0.0)


def edge_losses(rel_logits: jnp.ndarray, rel_labels: jnp.ndarray,
                rel_mask: jnp.ndarray, loss_type: str = "dnorm",
                loss_weights: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                sfx: str = "") -> Dict[str, jnp.ndarray]:
    """Edge (predicate) classification loss over the whole padded batch.

    Args:
      rel_logits: (B, E, R) predicate logits.
      rel_labels: (B, E) predicate targets; 0 = background.
      rel_mask: (B, E) validity of sampled edges.
      loss_type: {baseline, dnorm, dnorm-fgbg}.
      loss_weights: (alpha, beta, gamma) — reference config.py:186-190.

    Returns {"rel_loss"+sfx: scalar} (summed with the reference's
    normalization, i.e. already averaged).
    """
    alpha, beta, gamma = loss_weights
    ce = _masked_ce(rel_logits, rel_labels, rel_mask)

    is_fg = rel_mask & (rel_labels > 0)
    is_bg = rel_mask & (rel_labels == 0)
    m_fg = is_fg.sum().astype(jnp.float32)
    m_bg = is_bg.sum().astype(jnp.float32)
    m = rel_mask.sum().astype(jnp.float32)

    if loss_type == "baseline":
        assert alpha == beta == 1, (
            "wrong loss is used, use dnorm or dnorm-fgbg", alpha, beta)
        loss = gamma * ce.sum() / jnp.maximum(m, 1.0)
    elif loss_type in ("dnorm", "dnorm-fgbg"):
        fg_w = jnp.where(m_fg > 0, alpha / jnp.maximum(m_fg, 1.0), 1.0)
        if loss_type == "dnorm":
            # reference keeps BG weight 1 when there are no FG edges
            # (losses.py:56-57: only reweighted if M_BG > 0 and M_FG > 0)
            bg_w = jnp.where((m_bg > 0) & (m_fg > 0),
                             beta / jnp.maximum(m_fg, 1.0), 1.0)
        else:
            bg_w = jnp.where(m_bg > 0, beta / jnp.maximum(m_bg, 1.0), 1.0)
        weights = jnp.where(is_fg, fg_w, jnp.where(is_bg, bg_w, 0.0))
        loss = gamma * (ce * weights).sum()
    else:
        raise NotImplementedError(loss_type)

    return {"rel_loss" + sfx: loss}


def node_losses(obj_logits: jnp.ndarray, obj_labels: jnp.ndarray,
                node_mask: jnp.ndarray, sfx: str = "") -> Dict[str, jnp.ndarray]:
    """Mean CE over valid objects (reference losses.py:73-74)."""
    ce = _masked_ce(obj_logits, obj_labels, node_mask)
    n = jnp.maximum(node_mask.sum().astype(jnp.float32), 1.0)
    return {"obj_loss" + sfx: ce.sum() / n}
