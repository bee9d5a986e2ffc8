"""Layout composition: paint per-node features into their box locations.

Rebuild of ``boxes_to_layout``/``masks_to_layout``
(``/root/reference/augment/layout.py``, from google/sg2im): each node's
spatial feature is warped into its [0,1] box on an HxW canvas via bilinear
grid sampling, then pooled (sum/avg) over the image's nodes.

TPU-native differences: padded ``(B, N, p, p, D)`` inputs with a node mask;
the reference's per-object ``scatter_add`` image pooling
(``layout.py:139-170``) is a masked sum over the node axis (the batch
dimension already groups nodes by image).

The warp itself is NOT a gather here: the sampling grid is affine and
axis-separable (``boxes01_to_grid`` — gx depends only on the output
column, gy only on the row), so painting every node is two interpolation-
weight einsums on the MXU, with the node-sum pooling FUSED into the
second contraction (the (B, N, H, W, D) per-node canvas is never
materialized). The 4-tap-gather ``grid_sample_2d`` formulation costs
62.7 ms/fwd at the GAN step's shapes on v5e (gathers + scatter-add
backward); this runs in ~1 ms and differentiates as plain matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp

from sgg_tpu.ops.grid_sample import box01_extents as _box01_extents
from sgg_tpu.ops.grid_sample import paint_weights as _paint_weights


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
    p, q = vecs.shape[2], vecs.shape[3]
    x0, y0, ww, hh = _box01_extents(boxes01)
    dtype = vecs.dtype
    Wy = _paint_weights(y0, hh, H, p).astype(dtype)    # (B, N, H, p)
    Wx = _paint_weights(x0, ww, W, q).astype(dtype)    # (B, N, W, q)
    # fold the node mask into the column weights so the pooling sum can
    # fuse into the second contraction
    Wx = Wx * node_mask[..., None, None].astype(dtype)
    t = jnp.einsum("bnyp,bnpqc->bnyqc", Wy, vecs,
                   preferred_element_type=jnp.float32).astype(dtype)
    out = jnp.einsum("bnxq,bnyqc->byxc", Wx, t,
                     preferred_element_type=jnp.float32).astype(dtype)
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
