"""ResNet50 + Feature Pyramid Network backbone (NHWC, Flax).

Rebuild of the torchvision ``maskrcnn_resnet50_fpn`` backbone the reference
uses for non-VG splits (``/root/reference/sgg_models/rel_model_base.py:58-81``
— mask head removed, so effectively Faster R-CNN R50-FPN): a standard
bottleneck ResNet50 producing C2–C5, an FPN neck with 256-channel lateral
1x1 convs, top-down nearest upsampling, 3x3 output convs (P2–P5), and the
extra stride-64 ``pool`` level (P6) used by the RPN — which is also the map
the reference feeds the relation head (``rel_model_base.py:239`` takes the
*last* pyramid level; at min_size 1333 that is the 21x21 stride-64 map,
matching ``fmap_sz=21``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

FPN_CHANNELS = 256
RESNET50_BLOCKS = (3, 4, 6, 3)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with BN and projection shortcut."""

    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, dtype=self.dtype,
                                       name=name)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample")(x)
            residual = bn("bn_down")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Returns {'c2': s4, 'c3': s8, 'c4': s16, 'c5': s32} feature maps."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        from sgg_tpu.models.backbone import normalize_images
        x = normalize_images(x).astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype,
                                 name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        out = {}
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, w) in enumerate(zip(RESNET50_BLOCKS, widths)):
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(features=w, strides=strides,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train=train)
            out[f"c{stage + 2}"] = x
        return out


class FPN(nn.Module):
    """Lateral 1x1 + top-down + 3x3 output convs; extra maxpool level."""

    channels: int = FPN_CHANNELS
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        import jax
        names = ["c2", "c3", "c4", "c5"]
        laterals = [nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                            name=f"lateral_{n}")(feats[n]) for n in names]
        # top-down pathway
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(laterals[i + 1],
                                  laterals[i].shape, method="nearest")
            laterals[i] = laterals[i] + up
        outs = {}
        for i, n in enumerate(names):
            outs[f"p{i + 2}"] = nn.Conv(self.channels, (3, 3), padding=1,
                                        dtype=self.dtype,
                                        name=f"output_{n}")(laterals[i])
        # p6 = stride-2 maxpool of p5 (torchvision LastLevelMaxPool)
        outs["pool"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2))
        return outs


class ResNet50FPN(nn.Module):
    """Full backbone: images -> {'p2'..'p5', 'pool'} 256-ch pyramid."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = ResNet50(dtype=self.dtype, name="body")(x, train=train)
        return FPN(dtype=self.dtype, name="fpn")(feats)


def roi_level_assignment(boxes: jnp.ndarray, k_min: int = 2, k_max: int = 5,
                         canonical_scale: float = 224.0,
                         canonical_level: int = 4) -> jnp.ndarray:
    """FPN paper eqn. 1 (torchvision LevelMapper): level index (0-based
    relative to k_min) per box."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    s = jnp.sqrt(w * h)
    k = jnp.floor(canonical_level + jnp.log2(
        jnp.maximum(s, 1e-6) / canonical_scale + 1e-8))
    k = jnp.clip(k, k_min, k_max)
    return (k - k_min).astype(jnp.int32)


def multiscale_roi_align(pyramid: Sequence[jnp.ndarray],
                         boxes: jnp.ndarray, strides: Sequence[int],
                         pooled: int = 7, ratio: int = 2) -> jnp.ndarray:
    """MultiScaleRoIAlign over P2-P5: pool every level, select per-ROI by
    the FPN level assignment (fixed shapes; the 4x pooling cost is the
    price of staying jit-static — each pool is cheap).

    pyramid: list of (B, Hl, Wl, C); boxes (B, R, 4) in image pixels.
    """
    from sgg_tpu.ops.roi_align import roi_align
    levels = roi_level_assignment(boxes)  # (B, R)
    out = None
    for lvl, (fmap, stride) in enumerate(zip(pyramid, strides)):
        pooled_l = roi_align(fmap, boxes, spatial_scale=1.0 / stride,
                             pooled=pooled, ratio=ratio)
        sel = (levels == lvl)[..., None, None, None].astype(pooled_l.dtype)
        out = pooled_l * sel if out is None else out + pooled_l * sel
    return out
