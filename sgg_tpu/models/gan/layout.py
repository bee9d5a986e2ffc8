"""Layout composition: paint per-node features into their box locations.

Rebuild of ``boxes_to_layout``/``masks_to_layout``
(``/root/reference/augment/layout.py``, from google/sg2im): each node's
spatial feature is warped into its [0,1] box on an HxW canvas via bilinear
grid sampling, then pooled (sum/avg) over the image's nodes.

TPU-native differences: padded ``(B, N, p, p, D)`` inputs with a node mask;
the reference's per-object ``scatter_add`` image pooling
(``layout.py:139-170``) is a masked sum over the node axis (the batch
dimension already groups nodes by image).
"""

from __future__ import annotations

import jax.numpy as jnp

from sgg_tpu.ops.grid_sample import boxes01_to_grid, grid_sample_2d


def boxes_to_layout(vecs: jnp.ndarray, boxes01: jnp.ndarray,
                    node_mask: jnp.ndarray, H: int, W: int = None,
                    pooling: str = "sum") -> jnp.ndarray:
    """Compose per-node features into per-image canvases.

    Args:
      vecs: (B, N, p, p, D) spatial node features (or (B, N, D), expanded to
        8x8 as in the reference, layout.py:55-57).
      boxes01: (B, N, 4) boxes in [0, 1].
      node_mask: (B, N) validity.
      H, W: canvas size.

    Returns:
      (B, H, W, D).
    """
    if W is None:
        W = H
    if vecs.ndim == 3:
        vecs = jnp.broadcast_to(vecs[:, :, None, None, :],
                                (*vecs.shape[:2], 8, 8, vecs.shape[-1]))
    grid = boxes01_to_grid(boxes01, H, W)          # (B, N, H, W, 2)
    sampled = grid_sample_2d(vecs, grid)           # (B, N, H, W, D)
    m = node_mask.astype(sampled.dtype)[..., None, None, None]
    out = (sampled * m).sum(axis=1)
    if pooling == "avg":
        counts = jnp.maximum(node_mask.sum(axis=1), 1)
        out = out / counts[:, None, None, None].astype(out.dtype)
    elif pooling != "sum":
        raise ValueError(pooling)
    return out


def masks_to_layout(vecs: jnp.ndarray, boxes01: jnp.ndarray,
                    masks: jnp.ndarray, node_mask: jnp.ndarray, H: int,
                    W: int = None, pooling: str = "sum") -> jnp.ndarray:
    """Mask-modulated variant (layout.py:74-99): (B, N, D) vectors times
    (B, N, M, M) binary masks, painted into boxes."""
    img_in = vecs[:, :, None, None, :] * masks[..., None].astype(vecs.dtype)
    return boxes_to_layout(img_in, boxes01, node_mask, H, W, pooling)
