"""Gradient- and optimizer-step-level differential vs the reference.

Every other differential suite runs the reference under ``torch.no_grad()``
— forward parity plus a correct-looking loss does not guarantee the
*trained* model matches (a wrong stop_gradient, an accumulation-dtype
choice, or the 1/10-LR ``roi_fmap`` partition could silently diverge
training while all forward tests stay green). This suite closes that tier:

* ``test_tail_grad_parity``: with identical imported weights and an
  identical batch, ``jax.grad`` of node+edge losses through our full
  predict tail (RoI heads + union conv/BN + IMP GRU message passing,
  ``rel_model_stanford.py:97-107``) must match torch autograd on the
  reference's own modules, leaf for leaf.
* ``test_sgd_optimizer_step_parity``: three full optimizer steps — SGD
  momentum 0.9 + weight decay, the 1/10-LR ``roi_fmap`` param group, global
  grad-norm clipping, and the MultiStepLR milestone decay
  (``lib/pytorch_misc.py:70-73,130-157,625-664`` + ``main.py:116-120``) —
  asserting the *updated parameters* match at f32 tolerance after every
  step, against the reference's own ``get_optim``/``grad_clip``.
* ``test_multistep_lr_schedule_parity``: our optax schedule vs
  ``torch.optim.lr_scheduler.MultiStepLR`` across epochs incl. milestones.

The torch->flax map (``relmodel_flat_updates``) is pure transposition /
permutation, so pushing torch *gradients* through the same map yields the
exact expected flax gradients (this is why ``models.relhead.GRUCell`` keeps
torch's redundant double-bias parameterization — a folded bias would make
gradient parity unattainable by a factor of 2 on the r/z biases).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sgg_tpu.config import Config  # noqa: E402
from sgg_tpu.train.checkpoint import (optimistic_update,  # noqa: E402
                                      relmodel_flat_updates)
from sgg_tpu.train.losses import edge_losses, node_losses  # noqa: E402
from sgg_tpu.train.state import (create_train_state,  # noqa: E402
                                 multistep_lr)

from reference_utils import load_reference  # noqa: E402
from test_model_reference_parity import (C_CLS, FMAP_C, HID,  # noqa: E402
                                         OBJ_DIM, POOL, R_PRED, _Tail,
                                         _make_ref_model, _scene, _state_np)

pytestmark = pytest.mark.slow

H_IMG, W_IMG = 160, 192
N, E = 8, 14


def _batch(seed):
    """One identical scene in both frameworks' native layouts."""
    rng = np.random.RandomState(seed)
    node_pool = rng.randn(N, FMAP_C, POOL, POOL).astype(np.float32)
    union_pool = rng.randn(E, FMAP_C, POOL, POOL).astype(np.float32)
    boxes = rng.rand(N, 4).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + boxes[:, 2:] * 0.4 + 0.05
    boxes = (np.clip(boxes, 0, 1)
             * [W_IMG, H_IMG, W_IMG, H_IMG]).astype(np.float32)
    _, _, pairs = _scene(rng, N, E)
    obj_labels = rng.randint(0, C_CLS, N).astype(np.int64)
    # mix of fg and bg edges so the dnorm weighting paths both carry grad
    rel_labels = rng.randint(0, R_PRED, E).astype(np.int64)
    rel_labels[rng.rand(E) < 0.4] = 0
    return node_pool, union_pool, boxes, pairs, obj_labels, rel_labels


def _torch_losses(torch, m, batch):
    """Reference predict() + the reference's own loss functions."""
    from lib import losses as ref_losses
    node_pool, union_pool, boxes, pairs, obj_labels, rel_labels = batch
    rois = np.concatenate([np.zeros((N, 1), np.float32), boxes], 1)
    rel_inds = np.concatenate([np.zeros((E, 1), np.int64),
                               pairs.astype(np.int64)], 1)
    obj_dists, rel_dists = m.predict(
        torch.from_numpy(node_pool), torch.from_numpy(union_pool),
        torch.from_numpy(rel_inds), rois=torch.from_numpy(rois),
        im_sizes=[(H_IMG, W_IMG)])
    losses = ref_losses.node_losses(obj_dists,
                                    torch.from_numpy(obj_labels))
    losses.update(ref_losses.edge_losses(
        rel_dists, torch.from_numpy(rel_labels), "dnorm",
        loss_weights=(1.0, 1.0, 1.0)))
    return sum(losses.values())


def _tail_setup(torch, m, batch):
    """Our tail with imported weights + the identical batch in our layout.

    Returns (loss_fn over params, params, batch_stats)."""
    ts = _state_np(torch, m)
    node_pool, union_pool, boxes, pairs, obj_labels, rel_labels = batch
    tail = _Tail()
    np_ = np.transpose(node_pool, (0, 2, 3, 1))[None]
    up_ = np.transpose(union_pool, (0, 2, 3, 1))[None]
    pair_boxes = np.concatenate(
        [boxes[pairs[:, 0]], boxes[pairs[:, 1]]], 1)[None]
    args = (jnp.asarray(np_), jnp.asarray(up_),
            jnp.asarray(pair_boxes.astype(np.float32)),
            jnp.asarray(pairs)[None], jnp.ones((1, E), bool),
            jnp.asarray([[H_IMG, W_IMG]], jnp.float32))
    variables = tail.init(jax.random.key(0), *args)
    variables = optimistic_update(variables, relmodel_flat_updates(ts))
    bs = variables.get("batch_stats", {})
    ol = jnp.asarray(obj_labels)[None]
    rl = jnp.asarray(rel_labels)[None]

    def loss_fn(params):
        obj_logits, rel_logits = tail.apply(
            {"params": params, "batch_stats": bs}, *args)
        l = node_losses(obj_logits, ol, jnp.ones((1, N), bool))["obj_loss"]
        l += edge_losses(rel_logits, rl, jnp.ones((1, E), bool),
                         loss_type="dnorm")["rel_loss"]
        return l

    return loss_fn, variables["params"], bs


def _flat_params(tree, prefix="params"):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        out[f"{prefix}/{name}"] = np.asarray(leaf)
    return out


def test_tail_grad_parity():
    """jax.grad through the full tail == torch autograd, leaf for leaf."""
    torch = load_reference()
    m = _make_ref_model(torch)
    batch = _batch(11)

    m.zero_grad()
    total = _torch_losses(torch, m, batch)
    total.backward()
    tgrads = {n: p.grad.detach().numpy().copy()
              for n, p in m.named_parameters() if p.grad is not None}
    # the mapper is linear (transposes/permutations only), so it maps
    # gradients exactly as it maps weights
    ref_flat = {k: v for k, v in relmodel_flat_updates(tgrads).items()
                if k.startswith("params/")}

    loss_fn, params, _ = _tail_setup(torch, m, batch)
    loss, our_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(total.item()),
                               rtol=1e-5, atol=1e-7)
    ours = _flat_params(our_grads)

    # full coverage both ways: every trainable leaf of the tail has a
    # torch-grad oracle and vice versa
    assert set(ours) == set(ref_flat), (
        sorted(set(ours) ^ set(ref_flat)))
    assert len(ours) >= 40
    for k in sorted(ours):
        np.testing.assert_allclose(
            ours[k], ref_flat[k], rtol=2e-4,
            atol=2e-6 * max(1.0, float(np.abs(ref_flat[k]).max())),
            err_msg=k)


def test_sgd_optimizer_step_parity():
    """Three reference optimizer steps == three of ours, param-exact.

    Exercises: SGD momentum buffers (incl. the first-step init), weight
    decay, the fc 1/10-LR partition, global-norm clipping that actually
    engages, and the MultiStepLR decay firing between steps 1 and 2
    (milestones = steps + 1 with steps=(0,), pytorch_misc.py:151-153)."""
    torch = load_reference()
    from lib.pytorch_misc import get_optim, grad_clip
    m = _make_ref_model(torch)
    lr, clip = 0.05, 0.05  # clip far below typical norms: always engages

    class _Conf:
        l2 = 1e-4
        steps = (0,)
        lr_decay = 0.1

    optimizer, scheduler = get_optim(m, lr, _Conf, -1)

    cfg = Config(lr=lr, batch_size=1, l2=1e-4, clip=clip, steps=(0,),
                 lr_decay=0.1)
    batches = [_batch(s) for s in (21, 22, 23)]
    loss_fns = []
    state = None
    for b in batches:
        loss_fn, params, _ = _tail_setup(torch, m, b)
        loss_fns.append(loss_fn)
        if state is None:
            state = create_train_state(cfg, {"params": params},
                                       steps_per_epoch=1)

    for i, (b, loss_fn) in enumerate(zip(batches, loss_fns)):
        optimizer.zero_grad()
        _torch_losses(torch, m, b).backward()
        grad_clip(m, clip, False)
        optimizer.step()
        scheduler.step()  # reference steps the scheduler per epoch

        grads = jax.grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)

        ref_now = {k: v for k, v in
                   relmodel_flat_updates(_state_np(torch, m)).items()
                   if k.startswith("params/")}
        ours_now = _flat_params(jax.tree_util.tree_map(np.asarray,
                                                       state.params))
        assert set(ours_now) == set(ref_now)
        for k in sorted(ours_now):
            np.testing.assert_allclose(
                ours_now[k], ref_now[k], rtol=1e-5, atol=5e-7,
                err_msg=f"step {i}: {k}")


def test_multistep_lr_schedule_parity():
    """optax piecewise schedule == torch MultiStepLR epoch for epoch."""
    torch = load_reference()
    base, decay, steps, spe = 0.02, 0.1, (2, 5), 3
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    sched_t = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[s + 1 for s in steps], gamma=decay)
    ours = multistep_lr(base, steps, decay, steps_per_epoch=spe)
    for epoch in range(9):
        want = opt.param_groups[0]["lr"]
        for k in range(spe):
            got = float(ours(epoch * spe + k))
            np.testing.assert_allclose(got, want, rtol=1e-6,
                                       err_msg=f"epoch {epoch} update {k}")
        # reference: one scheduler.step() per epoch (main.py:239-241)
        sched_t.step()
