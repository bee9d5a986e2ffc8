"""Union-box edge features: rasterized box-pair masks + pooled fmap features.

Rebuild of ``UnionBoxesAndFeats`` (``/root/reference/lib/get_union_boxes.py:17-101``):
the subject/object boxes of each candidate edge are rasterized into a
``(2, 27, 27)`` anti-aliased mask pair ("rects", shifted by -0.5), passed
through a small conv net (2 -> dim/2 7x7 conv -> maxpool -> dim 3x3 conv,
each with BatchNorm momentum 0.01), and **added** to the RoIAligned
union-box features.

Conv strides — faithful to the reference's runtime behavior: the reference's
``conv_layer`` lambda (``get_union_boxes.py:41-44``) names its stride
parameter ``stide`` but passes ``stride=stride``, which closes over the
module's feature-map stride (16). Both convs therefore actually run at
stride 16, collapsing the 27x27 rects to a single 1x1 feature that is
broadcast-added over the 7x7 union pools (verified empirically against the
reference module). ``conv_strides`` defaults to that behavior; ``(2, 1)``
restores the neural-motifs intent (a 7x7 spatial rects map).

TPU-native differences: the rasterizer is the closed-form XLA op
(``sgg_tpu/ops/rects.py``) fused into this module — the reference round-trips
to CPU Cython per step (``get_union_boxes.py:66-67``); layout is NHWC; the
conv runs over ``B*E`` fixed-shape masks under jit.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from sgg_tpu.constants import BATCHNORM_MOMENTUM
from sgg_tpu.ops.rects import draw_union_rects


class UnionBoxFeats(nn.Module):
    """rects conv branch; call with pair boxes, add result to union pools.

    ``edge_model='motifs'``: union-frame anti-aliased rasterization (the
    Cython kernel's semantics). ``'raw_boxes'``: each box rasterized in the
    whole-image [0,1] frame via grid sampling (reference
    ``draw_union_boxes_grid``, get_union_boxes.py:105-116) — requires
    ``im_hw`` for the [0,1] scaling (get_union_boxes.py:68-78).
    """

    dim: int = 512
    pooling_size: int = 7
    edge_model: str = "motifs"
    # (conv1, conv2) strides. (16, 16) = the reference's actual behavior
    # (the ``stide`` closure typo, see module docstring); (2, 1) = the
    # neural-motifs intent.
    conv_strides: tuple = (16, 16)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pair_boxes: jnp.ndarray, *, im_hw=None,
                 train: bool = False) -> jnp.ndarray:
        """pair_boxes: (B, E, 8) subject+object boxes in image pixels.

        Returns (B, E, h, w, dim) conv features of the rasterized masks,
        broadcast-addable to the (B, E, pool, pool, dim) RoIAligned union
        features (h = w = 1 under the reference-faithful strides).
        """
        P = self.pooling_size * 4 - 1  # 27 (get_union_boxes.py:67)
        if self.edge_model == "raw_boxes":
            assert im_hw is not None, "raw_boxes needs per-image (h, w)"
            from sgg_tpu.ops.grid_sample import box01_extents, paint_weights
            from sgg_tpu.ops.boxes import scale_boxes_01
            boxes = pair_boxes.reshape(*pair_boxes.shape[:-1], 2, 4)
            boxes01 = scale_boxes_01(
                boxes.reshape(boxes.shape[0], -1, 4), im_hw)
            # grid_sample of a CONSTANT ones image separates into per-axis
            # coverage row-sums (same tap math, no gathers):
            x0, y0, ww, hh = box01_extents(boxes01)
            vy = paint_weights(y0, hh, P, P).sum(-1)   # (B, 2E, P)
            vx = paint_weights(x0, ww, P, P).sum(-1)
            masks = vy[..., :, None] * vx[..., None, :]
            rects = masks.reshape(*pair_boxes.shape[:-1], 2, P, P) - 0.5
        else:
            rects = draw_union_rects(pair_boxes, P) - 0.5  # (B, E, 2, P, P)
        B, E = rects.shape[:2]
        x = rects.reshape(B * E, 2, P, P).transpose(0, 2, 3, 1)  # NHWC
        x = x.astype(self.dtype)

        s1, s2 = self.conv_strides
        x = nn.Conv(self.dim // 2, (7, 7), strides=(s1, s1), padding=3,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - BATCHNORM_MOMENTUM,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = nn.Conv(self.dim, (3, 3), strides=(s2, s2), padding=1,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - BATCHNORM_MOMENTUM,
                         dtype=self.dtype, name="bn2")(x)
        # faithful strides: 27 -> conv s16 -> 2 -> maxpool s2 -> 1 -> 1
        # motifs intent: 27 -> conv s2 -> 14 -> maxpool s2 -> 7 -> 7
        return x.reshape(B, E, x.shape[1], x.shape[2], self.dim)
