"""Union-box edge features: rasterized box-pair masks + pooled fmap features.

Rebuild of ``UnionBoxesAndFeats`` (``/root/reference/lib/get_union_boxes.py:17-101``):
the subject/object boxes of each candidate edge are rasterized into a
``(2, 27, 27)`` anti-aliased mask pair ("rects", shifted by -0.5), passed
through a small conv net (2 -> dim/2 stride-2 7x7 conv -> maxpool ->
dim 3x3 conv, each with BatchNorm momentum 0.01), and **added** to the
RoIAligned union-box features.

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
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pair_boxes: jnp.ndarray, *, im_hw=None,
                 train: bool = False) -> jnp.ndarray:
        """pair_boxes: (B, E, 8) subject+object boxes in image pixels.

        Returns (B, E, pool, pool, dim) conv features of the rasterized
        masks (to be added to RoIAligned union features).
        """
        P = self.pooling_size * 4 - 1  # 27 (get_union_boxes.py:67)
        if self.edge_model == "raw_boxes":
            assert im_hw is not None, "raw_boxes needs per-image (h, w)"
            from sgg_tpu.ops.grid_sample import (boxes01_to_grid,
                                                 grid_sample_2d)
            from sgg_tpu.ops.boxes import scale_boxes_01
            boxes = pair_boxes.reshape(*pair_boxes.shape[:-1], 2, 4)
            boxes01 = scale_boxes_01(
                boxes.reshape(boxes.shape[0], -1, 4), im_hw)
            grid = boxes01_to_grid(boxes01, P, P)
            ones = jnp.ones((*boxes01.shape[:-1], P, P, 1), jnp.float32)
            masks = grid_sample_2d(ones, grid)[..., 0]
            rects = masks.reshape(*pair_boxes.shape[:-1], 2, P, P) - 0.5
        else:
            rects = draw_union_rects(pair_boxes, P) - 0.5  # (B, E, 2, P, P)
        B, E = rects.shape[:2]
        x = rects.reshape(B * E, 2, P, P).transpose(0, 2, 3, 1)  # NHWC
        x = x.astype(self.dtype)

        x = nn.Conv(self.dim // 2, (7, 7), strides=(2, 2), padding=3,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - BATCHNORM_MOMENTUM,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - BATCHNORM_MOMENTUM,
                         dtype=self.dtype, name="bn2")(x)
        # 27 -> conv s2 -> 14 -> maxpool s2 -> 7
        return x.reshape(B, E, self.pooling_size, self.pooling_size, self.dim)
