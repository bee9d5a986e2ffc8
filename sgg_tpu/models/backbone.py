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
    """

    out_dim: int = 4096
    with_final_relu: bool = False
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = x.reshape(*x.shape[:-3], -1).astype(self.dtype)  # flatten RoI
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc7")(x)
        if self.with_final_relu:
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x
