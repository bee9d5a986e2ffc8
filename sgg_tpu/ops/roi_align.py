"""RoIAlign as separable interpolation matmuls (TPU/MXU-native).

Replaces torchvision's C++/CUDA ``roi_align`` / ``MultiScaleRoIAlign`` used by
the reference (``/root/reference/sgg_models/rel_model_base.py:97-99,256-260``,
``/root/reference/lib/get_union_boxes.py:176-179``) with semantics matching
``torchvision.ops.roi_align(aligned=False, sampling_ratio=r)``.

Design: bilinear sampling on the regular RoIAlign grid is *separable* — each
pooled cell is an average of ``ratio × ratio`` bilinear samples, and both the
sampling and the averaging are linear in the feature map rows/columns. So the
whole op per ROI is two small dense matmuls::

    out[p, q, c] = Wy[p, :] @ fmap[:, :, c] @ Wx[q, :]^T

with ``Wy: (P, H)``, ``Wx: (P, W)`` interpolation-weight matrices (≤ 2·ratio
nonzeros per row).

Two MXU mappings of that algebra are provided (both exact):

* ``method="separable"`` (default): the two-einsum scheme above. The
  second einsum is an M=7 sublane-starved batched matmul, but everything
  it touches stays in natural layouts.
* ``method="outer"``: fold both interpolations into one combined per-ROI
  weight matrix ``W2[(p,q), (y,x)] = Wy[p,y]·Wx[q,x]`` and evaluate the
  whole op as ONE large MXU-dense matmul per image chunk,
  ``(chunk·P², H·W) @ (H·W, C)``.

On-device determination (measured, v5e via the remote toolchain, bf16
24×37×37×512 fmaps): **separable wins** — unions (R=256) 8.0 ms vs outer
16.1 ms; nodes (R=40) 3.1 ms vs 4.9 ms. The outer method's matmul is
MXU-shaped (M=chunk·49, K=1369), but materializing ``W2`` requires merging
``(P,P,H,W) → (P², H·W)`` — a physical relayout of a tile-padded 6-D
array, and this backend's layout shuffles run at ~15 GB/s (same finding as
``ops/stem_conv.py``), which more than erases the MXU gain. ``outer``
stays available for toolchains with fast relayouts.

ROIs are processed in fixed-size chunks to bound the intermediates
(``(chunk, P, W, C)`` for separable, ``(chunk·P², H·W)`` for outer). No
scalar gathers, no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _interp_weights(start: jnp.ndarray, extent: jnp.ndarray, dim: int,
                    pooled: int, ratio: int) -> jnp.ndarray:
    """Per-ROI combined (bilinear-sample + bin-average) weight matrix.

    Args:
      start: (...,) ROI start coordinate in feature-map pixels.
      extent: (...,) ROI extent (already floored at 1.0 by the caller).
      dim: feature-map size along this axis (H or W).
      pooled: output bins P.
      ratio: sampling points per bin per axis.

    Returns:
      (..., P, dim) float32 such that ``out = W @ fmap_axis`` equals
      torchvision ``roi_align(aligned=False)`` along this axis.
    """
    S = pooled * ratio
    # Sample i sits at start + extent * (i + 0.5) / S  (uniform subdivision of
    # each bin into `ratio` samples — algebraically identical to torchvision's
    # per-bin formulation).
    i = lax.broadcasted_iota(jnp.float32, (S, 1), 0).squeeze(-1)
    y = start[..., None] + extent[..., None] * (i + 0.5) / S  # (..., S)

    # torchvision bilinear_interpolate edge handling:
    valid = (y >= -1.0) & (y <= dim)
    yc = jnp.clip(y, 0.0, None)
    y_low = jnp.floor(yc).astype(jnp.int32)
    cap = y_low >= dim - 1
    y_low = jnp.where(cap, dim - 1, y_low)
    y_high = jnp.where(cap, dim - 1, y_low + 1)
    frac = jnp.where(cap, 0.0, yc - y_low.astype(jnp.float32))

    w_low = jnp.where(valid, 1.0 - frac, 0.0)
    w_high = jnp.where(valid, frac, 0.0)
    W = (w_low[..., None] * jax.nn.one_hot(y_low, dim, dtype=jnp.float32)
         + w_high[..., None] * jax.nn.one_hot(y_high, dim, dtype=jnp.float32))
    # Fold the bin average: (..., S, dim) -> (..., P, ratio, dim) -> mean.
    W = W.reshape(*W.shape[:-2], pooled, ratio, dim).mean(axis=-2)
    return W


@functools.partial(jax.jit,
                   static_argnames=("pooled", "ratio", "roi_chunk", "method"))
def roi_align(fmap: jnp.ndarray, boxes: jnp.ndarray, *,
              spatial_scale: float, pooled: int = 7, ratio: int = 2,
              roi_chunk: int = 64, method: str = "separable") -> jnp.ndarray:
    """Batched RoIAlign.

    Args:
      fmap: (B, H, W, C) feature maps (NHWC).
      boxes: (B, R, 4) ``[x1, y1, x2, y2]`` in *image* pixels.
      spatial_scale: fmap/image scale (1/stride).
      pooled: output size P (7 in the reference, rel_model_base.py:50).
      ratio: sampling_ratio (2 in the reference, rel_model_base.py:99).
      roi_chunk: ROIs processed per chunk (memory/throughput knob).
      method: ``"separable"`` (two-einsum scheme, default — wins on this
        backend) or ``"outer"`` (one combined matmul); see module
        docstring for the measured determination.

    Returns:
      (B, R, P, P, C) pooled features, dtype = fmap.dtype.
    """
    B, H, W, C = fmap.shape
    R = boxes.shape[1]
    sb = boxes.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = sb[..., 0], sb[..., 1], sb[..., 2], sb[..., 3]
    # aligned=False: extents floored at 1.
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    Wy = _interp_weights(y1, roi_h, H, pooled, ratio)  # (B, R, P, H)
    Wx = _interp_weights(x1, roi_w, W, pooled, ratio)  # (B, R, P, W)

    dtype = fmap.dtype
    P = pooled

    n_chunks = -(-R // roi_chunk)
    pad = n_chunks * roi_chunk - R
    if pad:
        Wy = jnp.pad(Wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Wx = jnp.pad(Wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Wy = Wy.reshape(B, n_chunks, roi_chunk, P, H).transpose(1, 0, 2, 3, 4)
    Wx = Wx.reshape(B, n_chunks, roi_chunk, P, W).transpose(1, 0, 2, 3, 4)

    if method == "outer":
        fm = fmap.reshape(B, H * W, C)

        def chunk_fn(w):
            wy, wx = w  # (B, chunk, P, H), (B, chunk, P, W)  float32
            # combined weights: W2[(p,q),(y,x)] = Wy[p,y] * Wx[q,x].
            # Cast the factors BEFORE the outer product: a float32 W2 at
            # production shapes (B=24, chunk=64, P=7, 37x37 fmap) is a
            # ~412 MB transient if XLA fails to fuse the cast; bf16 factors
            # bound it at half that and match the separable path's rounding
            # (two roundings, one per factor).
            wy = wy.astype(dtype)
            wx = wx.astype(dtype)
            w2 = (wy[:, :, :, None, :, None]
                  * wx[:, :, None, :, None, :])   # (B, r, P, P, H, W)
            w2 = w2.reshape(B, roi_chunk * P * P, H * W)
            out = jnp.einsum("bkl,blc->bkc", w2, fm,
                             preferred_element_type=jnp.float32)
            return out.astype(dtype).reshape(B, roi_chunk, P, P, C)
    else:
        Wy = Wy.astype(dtype)
        Wx = Wx.astype(dtype)

        def chunk_fn(w):
            wy, wx = w  # (B, chunk, P, H), (B, chunk, P, W)
            # rows: (B, chunk, P, H) @ (B, H, W, C) -> (B, chunk, P, W, C)
            t = jnp.einsum("brph,bhwc->brpwc", wy, fmap,
                           preferred_element_type=jnp.float32).astype(dtype)
            # cols: (B, chunk, P, W) @ (B, chunk, P, W, C)
            #       -> (B, chunk, P, P, C)
            out = jnp.einsum("brqw,brpwc->brpqc", wx, t,
                             preferred_element_type=jnp.float32)
            return out.astype(dtype)

    out = lax.map(chunk_fn, (Wy, Wx))  # (n_chunks, B, chunk, P, P, C)
    out = out.transpose(1, 0, 2, 3, 4, 5).reshape(B, n_chunks * roi_chunk,
                                                  pooled, pooled, C)
    return out[:, :R]
