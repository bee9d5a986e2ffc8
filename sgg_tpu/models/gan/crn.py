"""Cascaded Refinement Network (Chen & Koltun, ICCV 2017), NHWC/Flax.

Rebuild of ``RefinementNetwork``/``RefinementModule``
(``/root/reference/augment/crn.py``, from google/sg2im): a stack of modules,
each upsampling the running features 2x (nearest) and conv-refining them
conditioned on the layout downsampled to the current resolution; a final
3x3 output conv. Used by the GAN generator to blow the composed layout up
into full-resolution fake feature maps.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(n_in: int, n_out: int):
    """Row i averages input bin [floor(i*In/Out), ceil((i+1)*In/Out)) —
    exactly torch ``adaptive_avg_pool2d`` binning."""
    P = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        s = (i * n_in) // n_out
        e = -(-((i + 1) * n_in) // n_out)
        P[i, s:e] = 1.0 / (e - s)
    return P


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch ``adaptive_avg_pool2d`` on NHWC, as two bin-average matmuls
    (exact parity with the reference, and MXU-friendly)."""
    H, W = out_hw
    if x.shape[-3] == H and x.shape[-2] == W:
        return x
    ph = jnp.asarray(_adaptive_pool_matrix(x.shape[-3], H), x.dtype)
    pw = jnp.asarray(_adaptive_pool_matrix(x.shape[-2], W), x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", ph, x)
    return jnp.einsum("pw,...owc->...opc", pw, x)


def upsample_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch legacy-nearest upsampling: out[i] = in[floor(i * In / Out)]
    (``F.upsample(mode='nearest')``; differs from jax.image.resize's
    half-pixel-centered nearest for non-integer scales)."""
    H, W = out_hw
    ih = (np.arange(H) * x.shape[-3]) // H
    iw = (np.arange(W) * x.shape[-2]) // W
    x = jnp.take(x, jnp.asarray(ih), axis=-3)
    return jnp.take(x, jnp.asarray(iw), axis=-2)


class RefinementModule(nn.Module):
    """conv-BN-LReLU x2 over [downsampled layout, upsampled feats]
    (crn.py:64-94)."""

    output_dim: int
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layout, feats, *, train: bool = False):
        h, w = feats.shape[-3], feats.shape[-2]
        layout = adaptive_avg_pool(layout, (h, w))
        x = jnp.concatenate([layout, feats], axis=-1)
        for i in range(2):
            x = nn.Conv(self.output_dim, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=nn.initializers.kaiming_normal(),
                        name=f"conv{i}")(x)
            # torch BatchNorm2d default momentum 0.1 == flax momentum 0.9
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.leaky_relu(x, self.negative_slope)
        return x


class RefinementNetwork(nn.Module):
    """CRN cascade (crn.py:97-143); dims[0] is the layout dim, dims[1:] the
    per-stage output channels."""

    dims: Sequence[int] = (64, 128, 256, 512)
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layout, *, train: bool = False):
        H, W = layout.shape[-3], layout.shape[-2]
        n_stages = len(self.dims) - 1
        in_h, in_w = H, W
        for _ in range(n_stages):
            in_h //= 2
            in_w //= 2
        assert in_h > 0 and in_w > 0, (H, W, n_stages)

        feats = jnp.zeros((*layout.shape[:-3], in_h, in_w, 1), layout.dtype)
        for i in range(n_stages):
            if i == n_stages - 1:
                feats = upsample_nearest(feats, (H, W))
            else:
                feats = upsample_nearest(
                    feats, (feats.shape[-3] * 2, feats.shape[-2] * 2))
            feats = RefinementModule(output_dim=self.dims[i + 1],
                                     negative_slope=self.negative_slope,
                                     dtype=self.dtype,
                                     name=f"mod{i}")(layout, feats,
                                                     train=train)
        out = nn.Conv(self.dims[-1], (3, 3), padding=1, dtype=self.dtype,
                      kernel_init=nn.initializers.kaiming_normal(),
                      name="output_conv")(feats)
        return out
