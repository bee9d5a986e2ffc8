"""GAN for compositional augmentation (ICCV 2021) — padded-batch TPU build.

Rebuild of ``/root/reference/augment/gan.py``: the generator embeds object
and predicate classes (200-d), runs a 5-layer ``GraphTripleConvNet`` over
``[embedding, box]`` node inputs, reshapes node outputs to spatial 32x7x7
features, conv-"spatializes" them, optionally concatenates real per-class
visual features (the ``vis_cond`` feature bank), projects, paints them into
a layout (``boxes_to_layout``) and refines it into a fake global feature map
with a CRN. Three spectral-normed discriminators judge node patches, edge
patches, and whole fmaps.

TPU-native differences: everything operates on padded ``(B, N)/(B, E)``
graphs; the per-image "dummy node" that the reference appends mid-batch
(``gan.py:262-289``) becomes a static extra node slot ``N`` with statically
enumerated two-way edges to every (masked) node — no ragged concatenation.
The feature bank lookup (random per-class h5 reads per step,
``gan.py:192-199``) moves to the host-side ``sgg_tpu.augment.feature_bank``
prefetcher; the generator takes the sampled features as a tensor input.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sgg_tpu.models.gan.crn import RefinementNetwork
from sgg_tpu.models.gan.discriminators import (CondPatchDiscriminator,
                                               GlobalDiscriminator)
from sgg_tpu.models.gan.graphconv import GraphTripleConvNet
from sgg_tpu.models.gan.layout import boxes_to_layout


def add_dummy_nodes(classes, boxes01, rels, node_mask, rel_mask):
    """Append the per-image background "dummy node" + two-way edges.

    Reference ``dummy_nodes`` (gan.py:262-289): one class-0 node with box
    [0,0,1,1] per image, connected to every object in both directions with
    predicate 0. Here the dummy is the static slot ``N``; the 2N extra edges
    are masked by node validity.

    Returns (classes (B,N+1), boxes01 (B,N+1,4), edges (B,E+2N,3),
    node_mask (B,N+1), edge_mask (B,E+2N)).
    """
    B, N = classes.shape
    classes_d = jnp.concatenate(
        [classes, jnp.zeros((B, 1), classes.dtype)], axis=1)
    dummy_box = jnp.tile(jnp.asarray([[0., 0., 1., 1.]], boxes01.dtype),
                         (B, 1))[:, None]
    boxes_d = jnp.concatenate([boxes01, dummy_box], axis=1)
    node_mask_d = jnp.concatenate(
        [node_mask, jnp.ones((B, 1), bool)], axis=1)

    idx = jnp.arange(N, dtype=rels.dtype)
    dummy = jnp.full((N,), N, rels.dtype)
    zeros = jnp.zeros((N,), rels.dtype)
    # (i -> dummy) then (dummy -> i), matching gan.py:277-279
    extra = jnp.concatenate([
        jnp.stack([idx, dummy, zeros], axis=1),
        jnp.stack([dummy, idx, zeros], axis=1),
    ], axis=0)
    extra = jnp.broadcast_to(extra[None], (B, 2 * N, 3))
    edges = jnp.concatenate([rels, extra], axis=1)
    edge_mask = jnp.concatenate(
        [rel_mask, node_mask, node_mask], axis=1)
    return classes_d, boxes_d, edges, node_mask_d, edge_mask


class Generator(nn.Module):
    """SG -> fake global feature map (reference GAN.forward, gan.py:174-208)."""

    num_classes: int
    num_predicates: int
    embed_dim: int = 200
    hidden_dim: int = 64
    n_ch: int = 512
    pool_sz: int = 7
    fmap_sz: int = 37
    n_layers: int = 5
    batch_norm: bool = True
    vis_cond: bool = False
    # optional GloVe initialization of the class/predicate embeddings
    # (reference -init_embed, gan.py:146-159)
    init_embed_objs: Optional[Any] = None
    init_embed_rels: Optional[Any] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, classes, boxes01, rels, node_mask, rel_mask, *,
                 vis_features: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """classes (B,N) int, boxes01 (B,N,4) in [0,1], rels (B,E,3).

        vis_features: optional (B, N, p, p, n_ch) real per-class features
        sampled from the feature bank.

        Returns fake fmaps (B, fmap_sz, fmap_sz, n_ch).
        """
        B, N = classes.shape
        p = self.pool_sz
        classes_d, boxes_d, edges, node_mask_d, edge_mask = add_dummy_nodes(
            classes, boxes01, rels, node_mask, rel_mask)

        def embed_init(table):
            if table is None:
                return nn.initializers.normal(stddev=1.0)
            import numpy as onp
            arr = onp.asarray(table, onp.float32)
            return lambda *_: jnp.asarray(arr)

        obj_vecs = nn.Embed(self.num_classes, self.embed_dim,
                            dtype=self.dtype,
                            embedding_init=embed_init(self.init_embed_objs),
                            name="obj_embed")(classes_d)
        pred_vecs = nn.Embed(self.num_predicates, self.embed_dim,
                             dtype=self.dtype,
                             embedding_init=embed_init(self.init_embed_rels),
                             name="rel_embed")(edges[..., 2])

        node_in = jnp.concatenate(
            [obj_vecs, boxes_d.astype(self.dtype)], axis=-1)
        nodes, _ = GraphTripleConvNet(
            output_dim=self.hidden_dim // 2 * p * p,
            num_layers=self.n_layers, hidden_dim=self.hidden_dim,
            pooling="avg", batch_norm=self.batch_norm, dtype=self.dtype,
            name="gcn")(node_in, pred_vecs, edges[..., :2], node_mask_d,
                        edge_mask, train=train)

        # drop the dummy slot; spatialize (gan.py:182-190)
        nodes = nodes[:, :N].reshape(B, N, self.hidden_dim // 2, p, p)
        nodes = nodes.transpose(0, 1, 3, 4, 2)  # (B, N, p, p, h/2)
        for i in range(2):
            nodes = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                                    dtype=self.dtype,
                                    name=f"node_conv{i}")(nodes))

        if self.vis_cond:
            assert vis_features is not None
            nodes = jnp.concatenate(
                [vis_features.astype(self.dtype), nodes], axis=-1)
        nodes = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                        name="proj")(nodes)

        layout = boxes_to_layout(nodes, boxes01, node_mask, self.fmap_sz,
                                 self.fmap_sz, pooling="sum")
        fmap = RefinementNetwork(
            dims=(self.hidden_dim, self.n_ch // 4, self.n_ch // 2,
                  self.n_ch),
            dtype=self.dtype, name="refine")(layout, train=train)
        return nn.relu(fmap)


class GANModel(nn.Module):
    """Bundles G and the three Ds under one param tree with ``G_``/``D_``
    prefixes (the reference partitions optimizers by name prefix,
    pytorch_misc.py:100-114)."""

    num_classes: int
    num_predicates: int
    embed_dim: int = 200
    hidden_dim: int = 64
    n_ch: int = 512
    pool_sz: int = 7
    fmap_sz: int = 37
    n_layers_G: int = 5
    batch_norm: bool = True
    vis_cond: bool = False
    largeD: bool = False
    init_embed_objs: Optional[Any] = None
    init_embed_rels: Optional[Any] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.G = Generator(num_classes=self.num_classes,
                           num_predicates=self.num_predicates,
                           embed_dim=self.embed_dim,
                           hidden_dim=self.hidden_dim, n_ch=self.n_ch,
                           pool_sz=self.pool_sz, fmap_sz=self.fmap_sz,
                           n_layers=self.n_layers_G,
                           batch_norm=self.batch_norm,
                           vis_cond=self.vis_cond,
                           init_embed_objs=self.init_embed_objs,
                           init_embed_rels=self.init_embed_rels,
                           dtype=self.dtype)
        self.D_nodes = CondPatchDiscriminator(n_ch=self.n_ch,
                                              dtype=self.dtype)
        self.D_edges = CondPatchDiscriminator(n_ch=self.n_ch,
                                              dtype=self.dtype)
        self.D_global = GlobalDiscriminator(n_ch=self.n_ch,
                                            large=self.largeD,
                                            fmap_sz=self.fmap_sz,
                                            dtype=self.dtype)

    def __call__(self, classes, boxes01, rels, node_mask, rel_mask, *,
                 vis_features=None, train: bool = False):
        return self.generate(classes, boxes01, rels, node_mask, rel_mask,
                             vis_features=vis_features, train=train)

    def init_all(self, classes, boxes01, rels, node_mask, rel_mask, *,
                 vis_features=None, train: bool = False):
        """Traces G and all three Ds so ``init`` creates every parameter."""
        fmaps = self.generate(classes, boxes01, rels, node_mask, rel_mask,
                              vis_features=vis_features, train=train)
        p = self.pool_sz
        B, N = classes.shape
        E = rels.shape[1]
        zeros_n = jnp.zeros((B, N, p, p, self.n_ch), fmaps.dtype)
        zeros_e = jnp.zeros((B, E, p, p, self.n_ch), fmaps.dtype)
        self.disc_nodes(zeros_n, classes, train=train)
        self.disc_edges(zeros_e, rels[..., 2], train=train)
        self.disc_global(fmaps, train=train)
        return fmaps

    def generate(self, classes, boxes01, rels, node_mask, rel_mask, *,
                 vis_features=None, train: bool = False):
        return self.G(classes, boxes01, rels, node_mask, rel_mask,
                      vis_features=vis_features, train=train)

    def disc_nodes(self, feats, labels, *, train: bool = False):
        from sgg_tpu.models.gan.discriminators import conditioned_features
        x = conditioned_features(feats, labels, self.num_classes)
        return self.D_nodes(x, train=train)

    def disc_edges(self, feats, labels, *, train: bool = False):
        from sgg_tpu.models.gan.discriminators import conditioned_features
        x = conditioned_features(feats, labels, self.num_predicates)
        return self.D_edges(x, train=train)

    def disc_global(self, fmaps, *, train: bool = False):
        return self.D_global(fmaps, train=train)

    def update_disc_stats(self, node_feats, node_labels, edge_feats,
                          edge_labels, fmaps):
        """One train-mode pass through all three Ds to advance the
        spectral-norm power-iteration vectors (call with
        ``mutable=['batch_stats']``)."""
        self.disc_nodes(node_feats, node_labels, train=True)
        self.disc_edges(edge_feats, edge_labels, train=True)
        self.disc_global(fmaps, train=True)
