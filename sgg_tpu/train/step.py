"""Jitted training and evaluation steps.

Rebuild of the reference's training inner loop (``/root/reference/main.py:100-122``
``train_batch`` and the eval branch of ``rel_model_stanford.py:183-207``):
edge sampling, forward, dnorm/baseline losses, grad clip and SGD update all
compile into ONE device program — the reference crosses the host/device
boundary several times per step (Cython rects, numpy samplers;
SURVEY.md §3.1).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from sgg_tpu.config import Config
from sgg_tpu.data.graph_batch import GraphBatch
from sgg_tpu.train.assign import all_pairs, sample_edges
from sgg_tpu.train.losses import edge_losses, node_losses
from sgg_tpu.train.state import TrainState


def make_train_step(model, config: Config):
    """Returns jitted ``train_step(state, batch, key) -> (state, metrics)``.

    Metrics always include ``grad_norm`` (global); with W&B logging enabled
    they also include per-top-level-module gradient norms — the JAX
    analogue of the reference's ``wandb.watch(model, log='all')``
    (main.py:93-97; torch hook-based watching has no jit equivalent, scalar
    norms per module are the compile-friendly counterpart).
    """

    loss_weights = (config.alpha, config.beta, config.gamma)
    watch = getattr(config, "wandb", None) is not None

    def train_step(state: TrainState, batch: GraphBatch, key):
        k_sample, k_dropout = jax.random.split(key)
        # per-image relation budget = min(padded bucket, rels_per_img):
        # the reference samples FG (cap 0.25*RELS_PER_IMG) + all BG
        # candidates up to RELS_PER_IMG per image
        # (proposal_assignments_gtbox.py:47-56); the padded edge bucket
        # additionally bounds it shape-wise (set -max_edges >= the budget
        # for full parity on giant graphs)
        sampled, pair_mask = sample_edges(
            k_sample, batch.rels, batch.rel_mask, batch.node_mask,
            max_out=min(batch.max_edges, config.rels_per_img))
        pairs, rel_labels = sampled[..., :2], sampled[..., 2]

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch.images, batch.boxes, batch.classes, pairs, pair_mask,
                fmap=batch.fmaps, im_hw=batch.im_hw, train=True,
                rngs={"dropout": k_dropout}, mutable=["batch_stats"])
            losses = {}
            losses.update(node_losses(out["obj_logits"], batch.classes,
                                      batch.node_mask))
            losses.update(edge_losses(out["rel_logits"], rel_labels,
                                      pair_mask, config.loss, loss_weights))
            total = sum(jnp.asarray(v) for v in losses.values())
            return total, (losses, mutated)

        (total, (losses, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        metrics = dict(losses)
        metrics["total"] = total
        import optax
        metrics["grad_norm"] = optax.global_norm(grads)
        if watch:
            for mod, sub in grads.items():
                metrics[f"grad/{mod}"] = optax.global_norm(sub)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, mode: str = None, max_pairs: int = None,
                   dedup: bool = True):
    """Returns jitted ``eval_step(variables, batch) -> outputs``.

    Enumerates all ordered pairs (reference rel_model_base.py:148-163) and
    runs the forward in inference mode; downstream host code feeds
    ``filter_dets`` + the evaluator. ``mode`` overrides the model's regime
    per eval pass (reference lib/eval.py:56 ``set_mode``).

    ``max_pairs`` compacts the candidate set to that budget with an
    order-preserving gather (``compact_pairs``): the eval bucket is sized
    to the split's LARGEST graph (driver.py), so the padded N*(N-1)
    enumeration computes mostly masked pairs for typical images. Exact
    iff every image in the batch has <= max_pairs valid pairs — the
    driver guarantees this from host-side node counts.

    ``dedup`` enables the unordered-union dedup (half-budget union
    RoIAlign + fc6, see ``RelModelIMP``): the all-pairs enumeration is
    swap-closed, so it is exact whenever the rung itself is; the output's
    ``dedup_ok`` lets the driver double-check and fall back.
    """
    from sgg_tpu.train.assign import compact_pairs

    def eval_step(variables, batch: GraphBatch):
        pairs, pair_mask = all_pairs(batch.node_mask)
        if max_pairs is not None and max_pairs < pairs.shape[1]:
            pairs, pair_mask, _ = compact_pairs(pairs, pair_mask, max_pairs)
        out = model.apply(variables, batch.images, batch.boxes, batch.classes,
                          pairs, pair_mask, fmap=batch.fmaps,
                          im_hw=batch.im_hw, train=False, mode=mode,
                          dedup_unions=dedup)
        out["pairs"] = pairs
        out["pair_mask"] = pair_mask
        out["rel_dists"] = jax.nn.softmax(out["rel_logits"], axis=-1)
        return out

    return jax.jit(eval_step)
