"""Backbone feature extractors (Flax, NHWC, bf16-friendly).

TPU-native counterpart of the reference's torchvision backbone assembly
(``/root/reference/sgg_models/rel_model_base.py:83-117``): a VGG16
convolutional trunk with the final maxpool removed (stride-16 feature maps,
512 channels) and the two 4096-d fully-connected RoI heads (``roi_fmap`` for
edges, ``roi_fmap_obj`` for nodes) cloned from the VGG classifier
(``rel_model_base.py:110-111``, ``load_vgg`` ``:310-321``).

The ResNet50-FPN alternative (``rel_model_base.py:58-81``) is layered on the
detector module (sgdet path) and shares this file's head contract.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side ImageNet normalization for raw uint8 batches.

    Float inputs are assumed pre-normalized by the host pipeline; uint8
    inputs (the low-bandwidth transfer format, see
    sgg_tpu.data.pipeline) are normalized here, fused into the first conv
    by XLA."""
    if x.dtype != jnp.uint8:
        return x
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (x.astype(jnp.float32) - mean) / std


# torchvision vgg16.features channel plan; 'M' = 2x2 maxpool
# (the final 'M' of VGG16 is removed, rel_model_base.py:312).
VGG16_CFG: Sequence[Any] = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                            512, 512, 512, "M", 512, 512, 512)


class VGG16Trunk(nn.Module):
    """VGG16 conv trunk -> (B, H/16, W/16, 512) feature maps."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = normalize_images(x).astype(self.dtype)
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype)(x)
                x = nn.relu(x)
        return x


class RoiHead(nn.Module):
    """VGG classifier head over flattened 7x7x512 RoI features.

    ``with_final_relu=True`` replicates ``roi_fmap_obj`` (full VGG classifier
    minus the class layer: fc6-relu-drop-fc7-relu-drop); ``False`` replicates
    ``roi_fmap`` for edges (fc6-relu-drop-fc7, rel_model_base.py:310-321 via
    ``load_vgg(use_dropout=False, use_relu=False)``).

    The extra kwargs serve the unordered-union dedup of the relation head
    (``train/assign.unordered_union_index``): ``gather_idx`` expands a
    deduplicated fc6 output back to every ordered edge slot right after the
    big (P·P·C → out) matmul, and ``broadcast_add`` routes a per-edge
    feature that is spatially CONSTANT over the pool window (the faithful
    stride-16 rects conv output, a (…, C) vector broadcast over P×P)
    through the algebraically-equivalent low-rank matmul
    ``v @ sum_spatial(fc6.kernel)`` instead of the full fc6 — fc6 is linear
    before its ReLU, so ``fc6(pool + bcast(v)) == fc6(pool) + v @ K_sum``.
    """

    out_dim: int = 4096
    with_final_relu: bool = False
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 gather_idx: jnp.ndarray = None,
                 broadcast_add: jnp.ndarray = None) -> jnp.ndarray:
        x = x.reshape(*x.shape[:-3], -1).astype(self.dtype)  # flatten RoI
        fc6 = nn.Dense(self.out_dim, dtype=self.dtype, name="fc6")
        x = fc6(x)
        if gather_idx is not None:  # dedup: (B, U, out) -> (B, E, out)
            x = jnp.take_along_axis(x, gather_idx[..., None], axis=1)
        if broadcast_add is not None:
            kernel = fc6.variables["params"]["kernel"]  # (P*P*C, out)
            c = broadcast_add.shape[-1]
            k_sum = kernel.reshape(-1, c, self.out_dim).sum(0)
            x = x + broadcast_add.astype(self.dtype) @ k_sum.astype(
                self.dtype)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc7")(x)
        if self.with_final_relu:
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x
