"""Pallas TPU kernel for RoIAlign.

Fused alternative to the XLA separable-matmul implementation in
``sgg_tpu/ops/roi_align.py`` (same math: RoIAlign is two interpolation
matmuls per ROI). The kernel keeps one image's feature map resident in VMEM
across all of its ROI chunks (the grid iterates chunks innermost, so Mosaic
re-uses the block without re-DMA), builds the interpolation-weight matrices
on the fly from the ROI coordinates, and runs the two contractions on the
MXU — HBM traffic is one fmap read + one pooled-output write.

Numerics match ``roi_align`` (torchvision ``aligned=False`` semantics);
parity-tested in ``tests/test_roi_align_pallas.py`` (interpret mode).

Status: the XLA separable path remains the default — it runs within ~2x of
this op's bandwidth bound (~8 ms for 24x256 ROIs over 37x37x512 bf16 maps on
v5e, ~5% of the SGCls step). The Mosaic lowering of this kernel is blocked
by the current remote-compile toolchain (batched ``dot_general`` and
several second-stage formulations are rejected by ``tpu_compile_helper``
with no diagnostics; simpler variants of each piece compile and run).
Kept as the optimization path to land when the toolchain surfaces errors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weights(start, extent, dim: int, pooled: int, ratio: int):
    """(CHUNK, P, dim) combined bilinear+bin-average weights (f32).

    Same construction as roi_align._interp_weights, inlined for the kernel:
    sample i of S=P*ratio sits at start + extent*(i+0.5)/S; bilinear taps
    built by comparing tap indices against a broadcasted iota over ``dim``.
    """
    S = pooled * ratio
    i = lax.broadcasted_iota(jnp.int32, (1, S), 1).astype(jnp.float32)
    y = start[:, None] + extent[:, None] * (i + 0.5) / S  # (CHUNK, S)
    valid = (y >= -1.0) & (y <= dim)
    yc = jnp.clip(y, 0.0, None)
    y_low = jnp.floor(yc)
    cap = y_low >= dim - 1
    y_low = jnp.where(cap, dim - 1.0, y_low)
    y_high = jnp.where(cap, dim - 1.0, y_low + 1.0)
    frac = jnp.where(cap, 0.0, yc - y_low)
    w_low = jnp.where(valid, 1.0 - frac, 0.0)
    w_high = jnp.where(valid, frac, 0.0)

    d = lax.broadcasted_iota(jnp.int32, (1, 1, dim), 2).astype(jnp.float32)
    W = (w_low[..., None] * (y_low[..., None] == d)
         + w_high[..., None] * (y_high[..., None] == d))  # (CHUNK, S, dim)
    C = W.shape[0]
    W = W.reshape(C, pooled, ratio, dim).sum(axis=2) / ratio
    return W


def _kernel(rois_ref, fmap_ref, out_ref, *, pooled, ratio, chunk):
    H, W, Cc = fmap_ref.shape[1], fmap_ref.shape[2], fmap_ref.shape[3]
    rois = rois_ref[0]  # (chunk, 4) f32, already in fmap coords
    x1, y1 = rois[:, 0], rois[:, 1]
    rw = jnp.maximum(rois[:, 2] - x1, 1.0)
    rh = jnp.maximum(rois[:, 3] - y1, 1.0)

    Wy = _weights(y1, rh, H, pooled, ratio)  # (chunk, P, H)

    fmap = fmap_ref[0].astype(jnp.float32)   # (H, W, C)
    # rows: (chunk*P, H) @ (H, W*C) — one MXU matmul for the whole chunk
    t = jnp.dot(Wy.reshape(chunk * pooled, H), fmap.reshape(H, W * Cc),
                preferred_element_type=jnp.float32)
    # keep the intermediate in the output dtype (the XLA path does the same)
    t = t.astype(out_ref.dtype).reshape(chunk, pooled, W, Cc)
    # cols: contraction over W, unrolled over the P output columns.
    # Mosaic neither lowers batched dot_general nor likes slicing a
    # computed (chunk, P, W) weight tensor, so build each column's weight
    # row directly (bin q spans [x1 + rw*q/P, x1 + rw*(q+1)/P]).
    for q in range(pooled):
        wq = _weights(x1 + rw * (q / pooled), rw / pooled, W, 1,
                      ratio)[:, 0, :].astype(t.dtype)  # (chunk, W)
        col = (t * wq[:, None, :, None]).sum(axis=2)  # (chunk, P, C)
        out_ref[0, :, :, q, :] = col.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pooled", "ratio", "chunk",
                                             "interpret"))
def roi_align_pallas(fmap: jnp.ndarray, boxes: jnp.ndarray, *,
                     spatial_scale: float, pooled: int = 7, ratio: int = 2,
                     chunk: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas replacement for ``roi_align``.

    fmap (B, H, W, C); boxes (B, R, 4) in image pixels ->
    (B, R, pooled, pooled, C).
    """
    B, H, W, C = fmap.shape
    R = boxes.shape[1]
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R
    rois = boxes.astype(jnp.float32) * spatial_scale
    if pad:
        rois = jnp.pad(rois, ((0, 0), (0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, pooled=pooled, ratio=ratio, chunk=chunk),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, 4), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, pooled, pooled, C),
                               lambda b, r: (b, r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_chunks * chunk, pooled, pooled,
                                        C), fmap.dtype),
        interpret=interpret,
    )(rois, fmap)
    return out[:, :R]
