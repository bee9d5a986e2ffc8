"""GAN-augmented training step: F (SGG) / G / D updates in one jitted program.

Rebuild of the reference's GAN training choreography
(``/root/reference/main.py:100-200``):

1. **F phase** — the main SGG classification losses update the SGG model.
2. **G phase** — the generator synthesizes fake global feature maps from the
   (optionally perturbed) scene graph; adversarial losses against all three
   discriminators (targets = real) plus reconstruction losses (SGG losses on
   predictions from the fake features) update G — and also the SGG model
   when ``rec`` is enabled (``main.py:152-178``).
3. **D phase** — BCE real-vs-fake on node patches, edge patches, and global
   fmaps updates the three discriminators (``main.py:181-194``).

The reference's ``.detach()`` map becomes explicit ``stop_gradient``
placement: fake features feeding the SGG predictions are detached unless
``attachG`` (``main.py:144-149``); D-phase inputs are all detached. Scene
graph perturbation and feature-bank sampling happen on the host
(``sgg_tpu.augment``) and enter as tensors.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from sgg_tpu.config import Config
from sgg_tpu.data.graph_batch import GraphBatch
from sgg_tpu.train.assign import sample_edges
from sgg_tpu.train.losses import edge_losses, node_losses
from sgg_tpu.train.state import TrainState


@struct.dataclass
class GANTrainState:
    sgg: TrainState
    gan_params: Any
    gan_stats: Any
    g_opt_state: Any
    d_opt_state: Any
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _gan_partition_label(path, _):
    top = str(getattr(path[0], "key", path[0]))
    return "G" if top.startswith("G") else "D"


def create_gan_state(config: Config, sgg_state: TrainState,
                     gan_variables) -> GANTrainState:
    """Two Adam optimizers over the G_/D_ partition
    (reference get_optim_gan, pytorch_misc.py:98-127)."""
    params = gan_variables["params"]
    labels = jax.tree_util.tree_map_with_path(_gan_partition_label, params)
    adam = lambda lr: optax.adam(lr, b1=config.beta1, b2=config.beta2)
    g_tx = optax.multi_transform(
        {"G": adam(config.lrG), "D": optax.set_to_zero()}, labels)
    d_tx = optax.multi_transform(
        {"G": optax.set_to_zero(), "D": adam(config.lrD)}, labels)
    return GANTrainState(
        sgg=sgg_state, gan_params=params,
        gan_stats=gan_variables.get("batch_stats", {}),
        g_opt_state=g_tx.init(params), d_opt_state=d_tx.init(params),
        g_tx=g_tx, d_tx=d_tx)


def _masked_bce(logits: jnp.ndarray, target: float,
                mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean BCE-with-logits against a constant 0/1 target over valid slots
    (reference loss_fn, gan.py:162-171)."""
    t = jnp.full_like(logits, target)
    per = optax.sigmoid_binary_cross_entropy(logits, t)
    if mask is None:
        return per.mean()
    m = mask.astype(per.dtype).reshape(per.shape[:-1] + (1,))
    return (per * m).sum() / jnp.maximum(m.sum(), 1.0)


def make_gan_train_step(model, gan, config: Config):
    """Returns jitted
    ``step(state, batch, fake_classes, vis_features, key) -> (state, metrics)``.

    ``fake_classes``: (B, N) possibly-perturbed object classes (host side,
    ``SceneGraphPerturb``); pass ``batch.classes`` when not perturbing.
    ``vis_features``: (B, N, p, p, n_ch) feature-bank samples or None.
    """
    loss_weights = (config.alpha, config.beta, config.gamma)
    use_D = "D" in config.ganlosses
    use_G = "G" in config.ganlosses
    use_rec = "rec" in config.ganlosses
    ganw = config.ganw

    def step(state: GANTrainState, batch: GraphBatch, fake_classes,
             vis_features, key):
        k_sample, k_dropout, k_drop2 = jax.random.split(key, 3)
        # relation budget = min(bucket, rels_per_img) — see train/step.py
        sampled, pair_mask = sample_edges(
            k_sample, batch.rels, batch.rel_mask, batch.node_mask,
            max_out=min(batch.max_edges, config.rels_per_img))
        pairs, rel_labels = sampled[..., :2], sampled[..., 2]
        metrics = {}

        # ---------------- phase 1: SGG (F) update -----------------------
        def sgg_loss_fn(params):
            # batch.fmaps: frozen-trunk feature cache (the trunk is frozen
            # even under -gan, main.py:62-63) — the "real" fmap the
            # discriminators judge is then the cached one, identically
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.sgg.batch_stats},
                batch.images, batch.boxes, batch.classes, pairs, pair_mask,
                fmap=batch.fmaps, train=True, rngs={"dropout": k_dropout},
                mutable=["batch_stats"], return_feats=True)
            losses = {}
            losses.update(node_losses(out["obj_logits"], batch.classes,
                                      batch.node_mask))
            losses.update(edge_losses(out["rel_logits"], rel_labels,
                                      pair_mask, config.loss, loss_weights))
            total = sum(jnp.asarray(v) for v in losses.values())
            return total, (losses, mutated, out)

        (_, (losses, mutated, real_out)), grads = jax.value_and_grad(
            sgg_loss_fn, has_aux=True)(state.sgg.params)
        sgg = state.sgg.apply_gradients(grads)
        sgg = sgg.replace(batch_stats=mutated["batch_stats"])
        metrics.update(losses)
        metrics["grad_norm"] = optax.global_norm(grads)

        # Layout frame: normalize by the PADDED canvas side, not the
        # per-image content size. The generator paints [0,1]^2 onto the
        # full fmap canvas while RoIAlign/D_global read the fake fmap in
        # the padded IM_SCALE/stride frame (same as the real trunk fmap,
        # whose content occupies a sub-rectangle of the SquarePad canvas);
        # content-relative normalization would stretch every non-square
        # image's fake content over the whole canvas. The reference's
        # matching pipeline normalizes by the IM_SCALE constant
        # (rel_model_base.py:264-265, vgg16_old = the SquarePad pipeline
        # this framework rebuilds).
        if batch.images is not None:
            canvas = max(batch.images.shape[1], batch.images.shape[2])
        else:  # feature-cache batches: canvas = fmap extent * stride
            from sgg_tpu.constants import STRIDE
            canvas = max(batch.fmaps.shape[1], batch.fmaps.shape[2]) * STRIDE
        boxes01 = batch.boxes / canvas

        # ---------------- phase 2: G update -----------------------------
        def g_loss_fn(gan_params, sgg_params):
            gan_vars = {"params": gan_params,
                        "batch_stats": state.gan_stats}
            fmaps_fake, g_mut = gan.apply(
                gan_vars, fake_classes, boxes01, batch.rels,
                batch.node_mask, batch.rel_mask,
                vis_features=vis_features, train=True,
                mutable=["batch_stats"], method=gan.generate)

            g_losses = {}
            sgg_vars = {"params": sgg_params,
                        "batch_stats": sgg.batch_stats}
            # fake node/edge pools for the adversarial losses stay attached
            # to G; the SGG predictions detach them unless attachG
            # (main.py:144-149)
            fmap_for_pred = fmaps_fake if config.attachG else \
                jax.lax.stop_gradient(fmaps_fake)
            out_fake, sgg_mut = model.apply(
                sgg_vars, None, batch.boxes, fake_classes, pairs, pair_mask,
                fmap=fmaps_fake, train=True, rngs={"dropout": k_drop2},
                mutable=["batch_stats"], return_feats=True)
            nodes_fake = out_fake["node_pool"]
            edges_fake = out_fake["edge_pool"]

            if use_G:
                d_n = gan.apply(gan_vars, nodes_fake, fake_classes,
                                method=gan.disc_nodes)
                d_e = gan.apply(gan_vars, edges_fake, rel_labels,
                                method=gan.disc_edges)
                d_g = gan.apply(gan_vars, fmaps_fake,
                                method=gan.disc_global)
                g_losses["G_obj"] = ganw * _masked_bce(d_n, 1.0,
                                                       batch.node_mask)
                g_losses["G_rel"] = ganw * _masked_bce(d_e, 1.0, pair_mask)
                g_losses["G_fmap"] = ganw * _masked_bce(d_g, 1.0, None)

            if use_rec:
                if not config.attachG:
                    out_rec, _ = model.apply(
                        sgg_vars, None, batch.boxes, fake_classes, pairs,
                        pair_mask, fmap=fmap_for_pred, train=True,
                        rngs={"dropout": k_drop2},
                        mutable=["batch_stats"], return_feats=False)
                else:
                    out_rec = out_fake
                g_losses.update(node_losses(
                    out_rec["obj_logits"], fake_classes, batch.node_mask,
                    sfx="_rec"))
                g_losses.update(edge_losses(
                    out_rec["rel_logits"], rel_labels, pair_mask,
                    config.loss, loss_weights, sfx="_rec"))

            total = sum(jnp.asarray(v) for v in g_losses.values()) \
                if g_losses else jnp.zeros(())
            aux = (g_losses, g_mut,
                   jax.lax.stop_gradient(fmaps_fake),
                   jax.lax.stop_gradient(nodes_fake),
                   jax.lax.stop_gradient(edges_fake),
                   jax.lax.stop_gradient(sgg_mut["batch_stats"]))
            return total, aux

        if use_G or use_rec:
            (_, (g_losses, g_mut, fmaps_fake, nodes_fake, edges_fake,
                 fake_stats)), \
                (g_grads, sgg_grads) = jax.value_and_grad(
                    g_loss_fn, argnums=(0, 1), has_aux=True)(
                        state.gan_params, sgg.params)
            g_updates, g_opt_state = state.g_tx.update(
                g_grads, state.g_opt_state, state.gan_params)
            gan_params = optax.apply_updates(state.gan_params, g_updates)
            # G health: norm over the generator's own gradients — the
            # adversarial losses also produce (discarded-by-multi_transform)
            # gradients on the D params, which would inflate a whole-tree
            # norm
            metrics["grad_norm_G"] = optax.global_norm(
                {k: v for k, v in g_grads.items() if k.startswith("G")})
            gan_stats = g_mut["batch_stats"]
            if use_rec:
                # reconstruction also updates the SGG model (main.py:173-176)
                sgg = sgg.apply_gradients(sgg_grads)
            # BN running stats also advance on the fake-feature forward —
            # the reference's predict() on fakes runs in train mode
            # (main.py:144-149)
            sgg = sgg.replace(batch_stats=fake_stats)
            metrics.update(g_losses)
        else:
            gan_vars = {"params": state.gan_params,
                        "batch_stats": state.gan_stats}
            fmaps_fake, g_mut = gan.apply(
                gan_vars, fake_classes, boxes01, batch.rels,
                batch.node_mask, batch.rel_mask,
                vis_features=vis_features, train=True,
                mutable=["batch_stats"], method=gan.generate)
            out_fake, sgg_mut = model.apply(
                {"params": sgg.params, "batch_stats": sgg.batch_stats},
                None, batch.boxes, fake_classes, pairs, pair_mask,
                fmap=fmaps_fake, train=True, rngs={"dropout": k_drop2},
                mutable=["batch_stats"], return_feats=True)
            sgg = sgg.replace(batch_stats=sgg_mut["batch_stats"])
            nodes_fake = out_fake["node_pool"]
            edges_fake = out_fake["edge_pool"]
            gan_params, g_opt_state = state.gan_params, state.g_opt_state
            gan_stats = g_mut["batch_stats"]

        # ---------------- phase 3: D update -----------------------------
        if use_D:
            real_nodes = jax.lax.stop_gradient(real_out["node_pool"])
            real_edges = jax.lax.stop_gradient(real_out["edge_pool"])
            real_fmap = jax.lax.stop_gradient(real_out["fmap"])

            def d_loss_fn(gan_params_):
                gan_vars = {"params": gan_params_, "batch_stats": gan_stats}
                d_losses = {}
                # nodes: real uses GT labels, fake the perturbed ones
                # (main.py:185-187)
                rn = gan.apply(gan_vars, real_nodes, batch.classes,
                               method=gan.disc_nodes)
                fn_ = gan.apply(gan_vars, nodes_fake, fake_classes,
                                method=gan.disc_nodes)
                d_losses["D_obj"] = ganw * (
                    _masked_bce(rn, 1.0, batch.node_mask)
                    + _masked_bce(fn_, 0.0, batch.node_mask))
                re = gan.apply(gan_vars, real_edges, rel_labels,
                               method=gan.disc_edges)
                fe = gan.apply(gan_vars, edges_fake, rel_labels,
                               method=gan.disc_edges)
                d_losses["D_rel"] = ganw * (
                    _masked_bce(re, 1.0, pair_mask)
                    + _masked_bce(fe, 0.0, pair_mask))
                rg = gan.apply(gan_vars, real_fmap, method=gan.disc_global)
                fg = gan.apply(gan_vars, fmaps_fake,
                               method=gan.disc_global)
                d_losses["D_fmap"] = ganw * (
                    _masked_bce(rg, 1.0, None) + _masked_bce(fg, 0.0, None))
                total = sum(jnp.asarray(v) for v in d_losses.values())
                return total, d_losses

            (_, d_losses), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(gan_params)
            d_updates, d_opt_state = state.d_tx.update(
                d_grads, state.d_opt_state, gan_params)
            gan_params = optax.apply_updates(gan_params, d_updates)
            metrics.update(d_losses)
            metrics["grad_norm_D"] = optax.global_norm(d_grads)
            # advance the spectral-norm power-iteration vectors once per
            # step (torch updates them on every train-mode D forward)
            _, sn_mut = gan.apply(
                {"params": gan_params, "batch_stats": gan_stats},
                real_nodes, batch.classes, real_edges, rel_labels,
                real_fmap, mutable=["batch_stats"],
                method=gan.update_disc_stats)
            gan_stats = sn_mut["batch_stats"]
        else:
            d_opt_state = state.d_opt_state

        metrics["total"] = sum(jnp.asarray(v) for k, v in metrics.items()
                               if not k.startswith("grad_norm"))
        new_state = state.replace(sgg=sgg, gan_params=gan_params,
                                  gan_stats=gan_stats,
                                  g_opt_state=g_opt_state,
                                  d_opt_state=d_opt_state)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
