"""Pallas TPU kernel for RoIAlign (VMEM-fused hybrid MXU/VPU design).

Fused alternative to the XLA separable-matmul implementation in
``sgg_tpu/ops/roi_align.py`` (same math — RoIAlign is two interpolation
matmuls per ROI; replaces torchvision's C++/CUDA ``roi_align`` used by the
reference at ``/root/reference/sgg_models/rel_model_base.py:97-99,256-260``
and ``/root/reference/lib/get_union_boxes.py:176-179``).

Why the XLA path leaves time on the table: its second contraction is a
per-ROI batched matmul with M = P = 7 (sublane-starved, ~5% MXU) and its
``(chunk, P, W, C)`` intermediate round-trips HBM. The obvious fix — one
combined per-ROI weight matrix — needs a minor-dim-merging reshape that
this backend's Mosaic rejects and XLA relayouts at ~15 GB/s (see
``roi_align.py`` docstring).

This kernel instead keeps everything in VMEM and splits the work by unit:

* grid ``(B, C-blocks, ROI-chunks)``; the feature-map block
  ``(H, W, C_blk)`` is re-DMA'd only when (b, c) changes.
* interpolation weights are built on the fly from ROI coordinates with
  broadcasted iotas (no gathers; coordinates arrive pre-split as
  ``(chunk, 1)`` arrays because lane-slicing an int-indexed ref block
  trips Mosaic's gather lowering).
* stage 1 (rows) runs on the MXU as ONE multi-free-dim ``dot_general``
  with the P axis stacked p-major into M: ``(P·chunk, H) @ (H, W, C_blk)``
  — M = 112 at chunk 16 instead of 7.
* stage 2 (cols) runs on the VPU as 49 unrolled multiply-reduces over W
  (total ~11 GFLOP for the SGCls union load — cheaper than starving the
  MXU), assembled with ``jnp.stack`` (leading-dim concats only; every op
  here was individually probe-verified to lower through the remote
  toolchain, unlike the previous revision of this file whose batched
  ``dot_general``/reshape formulation tpu_compile_helper rejected).

Numerics match ``roi_align`` (torchvision ``aligned=False`` semantics);
parity-tested in ``tests/test_roi_align_pallas.py`` (interpret mode on CPU;
also verified compiled on the real chip, max |err| 2e-2 in f32 — TPU
relaxed-matmul precision). Gradients: forward is the kernel; the backward
w.r.t. ``fmap`` (needed by the GAN generator path, reference
``main.py:141-145``) is a custom VJP implemented with the same XLA
einsums as the separable path.

Status — on-device determination (measured, v5e via the remote toolchain):
this kernel now LOWERS AND RUNS (round 1's formulation was rejected
outright), but the toolchain's Mosaic codegen executes it ~2 ms per grid
step regardless of body: an ablation with the body reduced to just the
weight build + output write already costs 822 ms for a 384-step grid
(24x256 ROIs), vs 7.8 ms for the whole XLA separable path; the full
kernel lands at ~2 s. The XLA path therefore remains the default
(``roi_align.roi_align``). Every constituent op was probe-isolated:
dots, iota weight builds, leading-dim reshapes and stacks all compile —
the slowness is uniform per-step overhead, not one bad op. Revisit when
the toolchain's Mosaic backend generates performant code; the kernel and
its parity tests are ready.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(y1_ref, rh_ref, x1_ref, rw_ref, fmap_ref, out_ref, *,
            pooled: int, ratio: int, chunk: int, H: int, W: int):
    P, S = pooled, pooled * ratio
    f32 = jnp.float32
    fm = fmap_ref[0]  # (H, W, C_blk)
    dtype = fm.dtype

    def weights(start_ref, extent_ref, dim):
        """(P, chunk, dim) combined bilinear+bin-average weights, f32.

        Same construction as roi_align._interp_weights: sample i of S sits
        at start + extent*(i+0.5)/S; torchvision edge handling.
        """
        start = start_ref[0, 0]    # (chunk, 1)
        extent = extent_ref[0, 0]  # (chunk, 1)
        i = lax.broadcasted_iota(jnp.int32, (S, 1, 1), 0).astype(f32)
        y = start[None] + extent[None] * ((i + 0.5) / S)  # (S, chunk, 1)
        valid = (y >= -1.0) & (y <= dim)
        yc = jnp.clip(y, 0.0, None)
        y_low = jnp.floor(yc)
        cap = y_low >= dim - 1
        y_low = jnp.where(cap, dim - 1.0, y_low)
        y_high = jnp.where(cap, dim - 1.0, y_low + 1.0)
        frac = jnp.where(cap, 0.0, yc - y_low)
        w_low = jnp.where(valid, 1.0 - frac, 0.0)
        w_high = jnp.where(valid, frac, 0.0)
        d = lax.broadcasted_iota(jnp.int32, (1, 1, dim), 2).astype(f32)
        Wd = (w_low * (y_low == d).astype(f32)
              + w_high * (y_high == d).astype(f32))  # (S, chunk, dim)
        Wd = Wd.reshape(P, ratio, chunk, dim).sum(axis=1) * (1.0 / ratio)
        return Wd  # (P, chunk, dim)

    Wy = weights(y1_ref, rh_ref, H)  # (P, chunk, H)
    Wx = weights(x1_ref, rw_ref, W)  # (P, chunk, W)

    # Stage 1 (MXU): rows for all (p, roi) pairs in one dot, M = P*chunk.
    t = lax.dot_general(Wy.reshape(P * chunk, H).astype(dtype), fm,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32)  # (P*chunk, W, C_blk)
    t = t.reshape(P, chunk, W, -1)

    # Stage 2 (VPU): 49 multiply-reduces over W; stacks are leading-dim
    # concats (no minor-dim reshapes).
    rows = []
    for p in range(P):
        tp = t[p]  # (chunk, W, C_blk) f32
        cols = []
        for q in range(P):
            wq = Wx[q][:, :, None]  # (chunk, W, 1) f32
            cols.append(jnp.sum(wq * tp, axis=1))  # (chunk, C_blk) f32
        rows.append(jnp.stack(cols, axis=1))  # (chunk, P, C_blk)
    full = jnp.stack(rows, axis=1)  # (chunk, P, P, C_blk)
    out_ref[:] = full.astype(dtype).reshape(1, 1, chunk, P, P, -1)


def _pallas_forward(fmap, boxes, *, spatial_scale, pooled, ratio, chunk,
                    interpret):
    B, H, W, C = fmap.shape
    R = boxes.shape[1]
    c_block = 256 if (C % 256 == 0 and C > 256) else C
    n_cblk = C // c_block
    n_chunks = -(-R // chunk)
    Rp = n_chunks * chunk

    sb = boxes.astype(jnp.float32) * spatial_scale
    x1, y1 = sb[..., 0], sb[..., 1]
    rw = jnp.maximum(sb[..., 2] - x1, 1.0)  # aligned=False: floor extents
    rh = jnp.maximum(sb[..., 3] - y1, 1.0)

    def prep(a):  # (B, R) -> (B, n_chunks, chunk, 1)
        a = jnp.pad(a, ((0, 0), (0, Rp - R)))
        return a.reshape(B, n_chunks, chunk, 1)

    coord_spec = pl.BlockSpec((1, 1, chunk, 1), lambda b, c, k: (b, k, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, pooled=pooled, ratio=ratio, chunk=chunk,
                          H=H, W=W),
        grid=(B, n_cblk, n_chunks),
        in_specs=[coord_spec, coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((1, H, W, c_block),
                               lambda b, c, k: (b, 0, 0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, 1, chunk, pooled, pooled, c_block),
            lambda b, c, k: (b, k, 0, 0, 0, c),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_chunks, chunk, pooled, pooled, C), fmap.dtype),
        interpret=interpret,
    )(prep(y1), prep(rh), prep(x1), prep(rw), fmap)
    return out.reshape(B, Rp, pooled, pooled, C)[:, :R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _roi_align_pallas(fmap, boxes, spatial_scale, pooled, ratio, chunk,
                      interpret):
    return _pallas_forward(fmap, boxes, spatial_scale=spatial_scale,
                           pooled=pooled, ratio=ratio, chunk=chunk,
                           interpret=interpret)


def roi_align_pallas(fmap: jnp.ndarray, boxes: jnp.ndarray, *,
                     spatial_scale: float, pooled: int = 7, ratio: int = 2,
                     chunk: int = 16, interpret: bool = False) -> jnp.ndarray:
    """RoIAlign via the fused Pallas kernel.

    Same contract as ``roi_align.roi_align``: (B, H, W, C) NHWC fmaps +
    (B, R, 4) image-pixel boxes -> (B, R, P, P, C), torchvision
    ``aligned=False`` semantics. Differentiable w.r.t. ``fmap`` (custom
    VJP); boxes are data.
    """
    return _roi_align_pallas(fmap, boxes, spatial_scale, pooled, ratio,
                             chunk, interpret)


def _fwd(fmap, boxes, spatial_scale, pooled, ratio, chunk, interpret):
    out = _pallas_forward(fmap, boxes, spatial_scale=spatial_scale,
                          pooled=pooled, ratio=ratio, chunk=chunk,
                          interpret=interpret)
    # Residuals must be a pytree of JAX values; the backward needs the
    # static H/W/dtype of fmap, so carry them as the shape/dtype METADATA
    # of a tiny zero array (a dtype object or raw shape ints in the
    # residual tuple would be rejected / traced at the custom_vjp
    # boundary).
    shape_token = jnp.zeros(fmap.shape[1:3], fmap.dtype)
    return out, (boxes, shape_token)


def _bwd(spatial_scale, pooled, ratio, chunk, interpret, res, g):
    """grad_fmap[y,x,c] = sum_{r,p,q} Wy[r,p,y] Wx[r,q,x] g[r,p,q,c].

    XLA einsums (the transpose of the separable formulation); runs once
    per backward so the M=7 inefficiency is irrelevant here.
    """
    from sgg_tpu.ops.roi_align import _interp_weights

    boxes, shape_token = res
    H, W = shape_token.shape
    fdtype = shape_token.dtype
    sb = boxes.astype(jnp.float32) * spatial_scale
    x1, y1 = sb[..., 0], sb[..., 1]
    rw = jnp.maximum(sb[..., 2] - x1, 1.0)
    rh = jnp.maximum(sb[..., 3] - y1, 1.0)
    Wy = _interp_weights(y1, rh, H, pooled, ratio)  # (B, R, P, H)
    Wx = _interp_weights(x1, rw, W, pooled, ratio)  # (B, R, P, W)
    g32 = g.astype(jnp.float32)
    # (B,R,P,W) x (B,R,P,P,C) -> (B,R,P,W,C); then (B,R,P,H) x ... -> BHWC
    gy = jnp.einsum("brqw,brpqc->brpwc", Wx, g32)
    grad = jnp.einsum("brph,brpwc->bhwc", Wy, gy)
    return grad.astype(fdtype), None


_roi_align_pallas.defvjp(_fwd, _bwd)
