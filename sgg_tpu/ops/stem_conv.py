"""Space-to-depth reformulation of the MXU-starved 3-channel stem conv.

The first VGG16 conv (3->64 at 592x592, reference torchvision
``vgg16.features[0]`` inside the frozen trunk,
``/root/reference/sgg_models/rel_model_base.py:310-321``) is the one trunk
layer XLA runs badly on TPU: a 3-channel contraction starves the 128-lane
MXU and XLA's conv layout pads the input channel dim to the lane width in
HBM, inflating input traffic ~40x (measured ~10 ms of a ~100 ms SGCls step
for ~1.2 GFLOP/img). A Pallas kernel for it exists but does not lower
through the current toolchain (``ops/vgg_stem_pallas.py``).

This module instead rewrites the conv as an EXACTLY equivalent
space-to-depth convolution that XLA compiles well:

  pad(1, 1) -> space-to-depth b x b -> conv (2, 2) VALID over block space
  -> depth-to-space

For block size b, the (3, 3, C, F) kernel is rearranged (statically, at
trace time — a few-hundred-element gather on the weights) into a
(2, 2, b*b*C, b*b*F) kernel whose input/output channels enumerate the b*b
spatial phases. The contraction width grows from 9C to 4*b*b*C (>= 128-lane
friendly at b=2, C=3 -> K=48 with 4x fewer spatial positions) and the HBM
input inflation drops by b*b.

On-device determination (measured, v5e via the remote toolchain, bf16
24x592x592x3 -> 64): the rewrite LOSES to the direct conv on this backend
— direct 12.7 ms; s2d b=2 30.2 ms (input shuffle 6.4 ms at ~16 GB/s,
block conv 6 ms, depth-to-space ~18 ms at ~60 GB/s effective); a
strided-phase-kernel variant that skips the input shuffle 28.4 ms; a
9-shifted-slice einsum accumulation 37.2 ms. XLA's layout shuffles
(space-to-depth / depth-to-space transposes) run far below HBM bandwidth
here, so every reformulation pays more in data movement than the starved
conv pays in MXU idle time. The trunk therefore keeps the direct conv;
this op stays as the ready alternative for toolchains with fast
relayouts (it is the standard fix for low-channel stems).

Equivalence is exact (same taps, same zero padding); parity-tested against
``lax.conv_general_dilated`` in ``tests/test_stem_conv.py``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def s2d_kernel(kernel: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Rearrange a (3, 3, C, F) SAME-conv kernel for block-space conv.

    Output (2, 2, block*block*C, block*block*F): entry
    [by, bx, (qy*b+qx)*C+c, (py*b+px)*F+f] equals kernel[dy, dx, c, f]
    where dy = block*by + qy - py (and same for x), zero when the tap
    falls outside the 3x3 window.
    """
    b = block
    kh, kw, C, F = kernel.shape
    assert kh == 3 and kw == 3, "stem rewrite is specific to 3x3 kernels"
    # static index tensors over (by, qy, py) — numpy, resolved at trace time
    by, qy, py = np.meshgrid(np.arange(2), np.arange(b), np.arange(b),
                             indexing="ij")
    d = b * by + qy - py                       # (2, b, b)
    ok = (d >= 0) & (d < 3)
    dc = np.clip(d, 0, 2)
    # gather taps: (2, b, b)[y] x (2, b, b)[x] -> (2,b,b, 2,b,b, C, F)
    g = kernel[dc[:, :, :, None, None, None], dc[None, None, None]]
    mask = (ok[:, :, :, None, None, None] & ok[None, None, None]).astype(
        kernel.dtype)
    g = g * mask[..., None, None]
    # (by, qy, py, bx, qx, px, C, F) -> (by, bx, qy, qx, C, py, px, F)
    g = g.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return g.reshape(2, 2, b * b * C, b * b * F)


def stem_conv_s2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  block: int = 2) -> jnp.ndarray:
    """3x3 stride-1 SAME conv computed in space-to-depth block space.

    Args:
      x: (B, H, W, C) input.
      kernel: (3, 3, C, F) HWIO weights (the ordinary conv parameter).
      bias: (F,) or None.
      block: space-to-depth factor (2 fits the 592x592 RGB stem).

    Returns (B, H, W, F), bit-equivalent to
    ``lax.conv_general_dilated(x, kernel, (1,1), 'SAME')`` + bias up to
    float reassociation.
    """
    b = block
    B, H, W, C = x.shape
    F = kernel.shape[-1]
    # pad 1 on top/left for the 3x3 halo, then enough on the bottom/right
    # that ceil(H/b) output block rows each see a full 2-block window
    Hb = -(-H // b) + 1
    Wb = -(-W // b) + 1
    xp = jnp.pad(x, ((0, 0), (1, Hb * b - H - 1), (1, Wb * b - W - 1),
                     (0, 0)))
    xb = xp.reshape(B, Hb, b, Wb, b, C).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(B, Hb, Wb, b * b * C)
    k2 = s2d_kernel(kernel, block=b)
    out = lax.conv_general_dilated(
        xb, k2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    # block space back to pixels; crop the alignment padding
    Ho, Wo = Hb - 1, Wb - 1
    out = out.reshape(B, Ho, Wo, b, b, F).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, Ho * b, Wo * b, F)[:, :H, :W]
    if bias is not None:
        out = out + bias
    return out
