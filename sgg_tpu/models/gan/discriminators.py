"""GAN discriminators: class-conditional patch Ds + global fmap D.

Rebuild of the discriminator stack in ``/root/reference/augment/gan.py:69-104``:
all convs spectral-normalized; ``D_nodes``/``D_edges`` are class-conditional
7x7 patch discriminators (one-hot class planes concatenated to the features);
``D_global`` judges whole feature maps with LeakyReLU(0.2) convs, avg-pools,
and an optional ``largeD`` widening (extra 1x1 convs).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def avg_pool_ceil(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """torch ``AvgPool2d(k, ceil_mode=True)``: border windows average only
    the valid elements."""
    H, W = x.shape[-3], x.shape[-2]
    pad_h = (-H) % window
    pad_w = (-W) % window
    dims = (1,) * (x.ndim - 3) + (window, window, 1)
    strides = dims
    padding = [(0, 0)] * (x.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, padding)
    counts = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, dims, strides,
                               padding)
    return summed / counts


class SNConv(nn.Module):
    """Spectral-normalized conv (reference gan.py:69-70)."""

    features: int
    kernel: int
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        conv = nn.SpectralNorm(nn.Conv(self.features,
                                       (self.kernel, self.kernel),
                                       padding=self.padding,
                                       dtype=self.dtype))
        return conv(x, update_stats=train)


class CondPatchDiscriminator(nn.Module):
    """Class-conditional 7x7 patch discriminator (gan.py:74-82).

    Input (..., 7, 7, n_ch + n_classes) -> (..., 1) logits.
    """

    n_ch: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.n_ch
        x = nn.relu(SNConv(c // 2, 3, 0, self.dtype)(x, train=train))  # 5x5
        x = nn.relu(SNConv(c // 4, 3, 0, self.dtype)(x, train=train))  # 3x3
        x = nn.relu(SNConv(c // 8, 1, 0, self.dtype)(x, train=train))  # 3x3
        x = SNConv(1, 3, 0, self.dtype)(x, train=train)                # 1x1
        return x.reshape(*x.shape[:-3], 1)


class GlobalDiscriminator(nn.Module):
    """Whole-fmap discriminator (gan.py:87-103)."""

    n_ch: int = 512
    large: bool = False
    fmap_sz: int = 37
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.n_ch
        act = lambda v: nn.leaky_relu(v, 0.2)

        def conv3(v, ch):
            # valid 3x3 when the spatial size allows it; 'same' otherwise
            # (identical to the reference at its fmap sizes 38/21, but
            # robust to the small feature maps used in tests)
            pad = 0 if v.shape[-3] >= 3 else 1
            return SNConv(ch, 3, pad, self.dtype)(v, train=train)

        # only the FIRST (fmap_sz>24) pool is ceil-mode in the reference;
        # the later two are plain AvgPool2d(2) = floor mode
        # (gan.py:91,96,101) — they differ at odd sizes (e.g. the resnet50
        # fmap trace 21: ...17 ->floor 8 ->6 ->3 ->1)
        def pool_floor(v):
            return (nn.avg_pool(v, (2, 2), strides=(2, 2))
                    if v.shape[-3] >= 6 else v)

        x = act(conv3(x, c // 2))
        if self.large:
            x = act(SNConv(c // 2, 1, 0, self.dtype)(x, train=train))
        if self.fmap_sz > 24:
            x = avg_pool_ceil(x, 2) if x.shape[-3] >= 6 else x
        x = act(conv3(x, c // 2))
        if self.large:
            x = act(SNConv(c // 2, 1, 0, self.dtype)(x, train=train))
        x = pool_floor(x)
        x = act(conv3(x, c // 4))
        if self.large:
            x = act(SNConv(c // 4, 1, 0, self.dtype)(x, train=train))
        x = pool_floor(x)
        x = conv3(x, 1)
        # 1x1 at the reference sizes; mean is then the identity
        return x.mean(axis=(-3, -2))


def conditioned_features(feats: jnp.ndarray, labels: jnp.ndarray,
                         n_classes: int) -> jnp.ndarray:
    """Concat one-hot class planes to (…, p, p, C) patch features
    (reference gan.py:226-242)."""
    p = feats.shape[-3]
    onehot = jax.nn.one_hot(labels, n_classes, dtype=feats.dtype)
    planes = jnp.broadcast_to(onehot[..., None, None, :],
                              (*onehot.shape[:-1], p, p, n_classes))
    return jnp.concatenate([feats, planes], axis=-1)
