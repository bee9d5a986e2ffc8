"""Scene-graph triple convolution (sg2im-style) over padded batches.

Rebuild of ``GraphTripleConv``/``GraphTripleConvNet``
(``/root/reference/augment/graphconv.py``, itself from google/sg2im): each
layer runs a per-triplet MLP over ``[subj, pred, obj]`` concatenations,
splits the output into subject/predicate/object updates, and pools the
subject/object updates back onto nodes.

TPU-native differences: inputs are padded ``(B, N, D)`` nodes / ``(B, E, D)``
predicates with masks; the reference's ``scatter_add`` pooling
(``graphconv.py:97-106``) becomes a per-image one-hot incidence matmul on
the MXU; BatchNorm statistics are computed over *valid* elements only
(masked), since padding would otherwise bias them.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over masked (B, T, C) elements."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if train:
            m = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / n
            var = (((x - mean) ** 2) * m).sum(
                axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                # torch BatchNorm1d tracks the UNBIASED (n-1) variance in
                # its running stats (normalization itself stays biased)
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class TripleMLP(nn.Module):
    """build_mlp equivalent (graphconv.py:157-176) with masked BN."""

    dims: Sequence[int]
    batch_norm: bool = False
    final_nonlinearity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype,
                         kernel_init=nn.initializers.kaiming_normal())(x)
            final = i == len(self.dims) - 1
            if not final or self.final_nonlinearity:
                if self.batch_norm:
                    x = MaskedBatchNorm(dtype=self.dtype)(x, mask,
                                                          train=train)
                x = nn.relu(x)
        return x


class GraphTripleConv(nn.Module):
    """One scene-graph conv layer (graphconv.py:17-119)."""

    output_dim: int
    hidden_dim: int = 512
    pooling: str = "avg"
    batch_norm: bool = False
    final_nonlinearity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, node_mask, edge_mask, *,
                 train: bool = False):
        """obj_vecs (B,N,Din), pred_vecs (B,E,Dp), edges (B,E,2)."""
        B, N, _ = obj_vecs.shape
        H, Dout = self.hidden_dim, self.output_dim
        s_idx, o_idx = edges[..., 0], edges[..., 1]

        s_vecs = jnp.take_along_axis(obj_vecs, s_idx[..., None], axis=1)
        o_vecs = jnp.take_along_axis(obj_vecs, o_idx[..., None], axis=1)
        t_vecs = jnp.concatenate([s_vecs, pred_vecs, o_vecs], axis=-1)
        new_t = TripleMLP(dims=(H, 2 * H + Dout),
                          batch_norm=self.batch_norm,
                          final_nonlinearity=self.final_nonlinearity,
                          dtype=self.dtype, name="net1")(
            t_vecs, edge_mask, train=train)

        new_s = new_t[..., :H]
        new_p = new_t[..., H:H + Dout]
        new_o = new_t[..., H + Dout:]
        if not self.final_nonlinearity:
            # the reference still ReLUs s/o updates on the last layer
            # (graphconv.py:86-88)
            new_s = nn.relu(new_s)
            new_o = nn.relu(new_o)

        # incidence pooling: scatter_add -> one-hot matmul (MXU)
        m = edge_mask.astype(self.dtype)[..., None]
        s_inc = jax.nn.one_hot(s_idx, N, dtype=self.dtype) * m
        o_inc = jax.nn.one_hot(o_idx, N, dtype=self.dtype) * m
        pooled = (jnp.einsum("ben,beh->bnh", s_inc, new_s)
                  + jnp.einsum("ben,beh->bnh", o_inc, new_o))
        if self.pooling == "avg":
            counts = s_inc.sum(axis=1) + o_inc.sum(axis=1)  # (B, N)
            pooled = pooled / jnp.maximum(counts, 1.0)[..., None]

        new_obj = TripleMLP(dims=(H, Dout), batch_norm=self.batch_norm,
                            final_nonlinearity=self.final_nonlinearity,
                            dtype=self.dtype, name="net2")(
            pooled, node_mask, train=train)
        return new_obj, new_p


class GraphTripleConvNet(nn.Module):
    """Stack of graph conv layers (graphconv.py:122-154)."""

    output_dim: int
    num_layers: int = 5
    hidden_dim: int = 512
    pooling: str = "avg"
    batch_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, node_mask, edge_mask, *,
                 train: bool = False):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            obj_vecs, pred_vecs = GraphTripleConv(
                output_dim=self.output_dim if last else self.hidden_dim,
                hidden_dim=self.hidden_dim, pooling=self.pooling,
                batch_norm=self.batch_norm, final_nonlinearity=not last,
                dtype=self.dtype, name=f"gconv_{i}")(
                obj_vecs, pred_vecs, edges, node_mask, edge_mask,
                train=train)
        return obj_vecs, pred_vecs
