"""Component-time breakdown of the detector-pretraining step on the chip.

Run on TPU: python tools/profile_pretrain.py

Answers VERDICT r4 weak #3 for the `detector_pretrain` bench metric
(0.45 MFU): per-block ms + per-block MFU so the non-MXU half of the step
is accounted for. Same shapes bench.py times (B=8, 592 px, VGG16 Faster
R-CNN, bf16 — reference pretrain_detector.py + detector/engine.py).
"""

import sys
import time

sys.path.insert(0, ".")

import jax

if __name__ == "__main__" and \
        __import__("os").environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon TPU plugin pins the platform and ignores the env var —
    # honor it explicitly so CPU smoke runs stay off the chip
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from pretrain_detector import make_detector_train_step
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.models.backbone import VGG16Trunk
from sgg_tpu.models.detector import (FasterRCNNVGG, roi_head_losses,
                                     rpn_losses)
from sgg_tpu.train.state import TrainState

import os

B = int(os.environ.get("SGG_PROFILE_B", 8))
N = int(os.environ.get("SGG_PROFILE_N", 40))
IMG = int(os.environ.get("SGG_PROFILE_IMG", 592))
PEAK_TFLOPS = 197.0


def _flops_of(jitted, *args, **kw):
    try:
        ca = jitted.lower(*args, **kw).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def timeit(name, fn, *args, iters=10, flops=None):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    mfu = ""
    if flops:
        mfu = (f"  {flops / dt / 1e12:6.1f} TF/s "
               f"({flops / dt / 1e12 / PEAK_TFLOPS * 100:4.1f}% MFU)")
    print(f"{name:40s} {dt * 1000:8.2f} ms  ({B / dt:7.1f} img/s){mfu}")
    return dt


def main():
    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=N, max_edges=1))
    det = FasterRCNNVGG(num_classes=151, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, im, hw: det.init(k, im, hw, train=False))(
        jax.random.key(0), gb.images, gb.im_hw)

    # --- trunk forward ------------------------------------------------------
    trunk = VGG16Trunk(dtype=jnp.bfloat16)
    tvars = {"params": variables["params"]["trunk"]}
    trunk_fn = jax.jit(lambda v, x: trunk.apply(v, x))
    trunk_fn(tvars, gb.images)
    t_trunk = timeit("trunk fwd", trunk_fn, tvars, gb.images,
                     flops=_flops_of(trunk_fn, tvars, gb.images))

    # --- detector full forward (trunk + RPN + NMS + RoI head) -------------
    det_fn = jax.jit(lambda v, im, hw: det.apply(v, im, hw, train=False))
    out = det_fn(variables, gb.images, gb.im_hw)
    t_fwd = timeit("detector fwd (trunk+RPN+NMS+head)", det_fn, variables,
                   gb.images, gb.im_hw,
                   flops=_flops_of(det_fn, variables, gb.images, gb.im_hw))

    # --- loss-only blocks on fixed detector outputs ------------------------
    k = jax.random.key(0)
    rpn_fn = jax.jit(lambda o: rpn_losses(
        k, o["anchors"], o["rpn_obj_logits"], o["rpn_deltas"], gb.boxes,
        gb.node_mask))
    rpn_fn(out)
    timeit("rpn_losses (assign+sample+CE+L1)", rpn_fn, out,
           flops=_flops_of(rpn_fn, out))
    roi_fn = jax.jit(lambda o: roi_head_losses(
        k, o["proposals"], o["prop_mask"], o["class_logits"],
        o["box_deltas"], gb.boxes, gb.classes, gb.node_mask))
    roi_fn(out)
    timeit("roi_head_losses (assign+sample+CE+L1)", roi_fn, out,
           flops=_flops_of(roi_fn, out))

    # --- forward + losses (no grad) -----------------------------------------
    def loss_only(params):
        o = det.apply({"params": params,
                       "batch_stats": variables.get("batch_stats", {})},
                      gb.images, gb.im_hw, train=False)
        losses = {}
        losses.update(rpn_losses(k, o["anchors"], o["rpn_obj_logits"],
                                 o["rpn_deltas"], gb.boxes, gb.node_mask))
        losses.update(roi_head_losses(k, o["proposals"], o["prop_mask"],
                                      o["class_logits"], o["box_deltas"],
                                      gb.boxes, gb.classes, gb.node_mask))
        return sum(jnp.asarray(v) for v in losses.values())

    loss_fn = jax.jit(loss_only)
    loss_fn(variables["params"])
    t_loss = timeit("fwd + losses (no grad)", loss_fn, variables["params"],
                    flops=_flops_of(loss_fn, variables["params"]))

    # --- fwd+bwd -------------------------------------------------------------
    grad_fn = jax.jit(jax.grad(loss_only))
    grad_fn(variables["params"])
    t_grad = timeit("fwd + bwd (grad)", grad_fn, variables["params"],
                    flops=_flops_of(grad_fn, variables["params"]))

    # --- full train step -----------------------------------------------------
    tx = optax.chain(optax.add_decayed_weights(5e-4),
                     optax.sgd(0.005, momentum=0.9))
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    step = make_detector_train_step(det)
    box = {"s": state}

    def run(i):
        box["s"], m = step(box["s"], gb, jax.random.key(i))
        return m

    m = run(0)
    float(m["total"])
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        m = run(i + 1)
    float(m["total"])
    t_full = (time.perf_counter() - t0) / iters
    flops_full = _flops_of(step, box["s"], gb, jax.random.key(0))
    mfu = ""
    if flops_full:
        mfu = (f"  {flops_full / t_full / 1e12:6.1f} TF/s "
               f"({flops_full / t_full / 1e12 / PEAK_TFLOPS * 100:4.1f}% "
               f"MFU)")
    print(f"{'FULL pretrain step':40s} {t_full * 1000:8.2f} ms  "
          f"({B / t_full:7.1f} img/s){mfu}")

    print(f"\nshares: trunk-fwd {100 * t_trunk / t_full:.0f}%  "
          f"det-fwd {100 * t_fwd / t_full:.0f}%  "
          f"losses {100 * (t_loss - t_fwd) / t_full:.0f}%  "
          f"bwd {100 * (t_grad - t_loss) / t_full:.0f}%  "
          f"update+rest {100 * (t_full - t_grad) / t_full:.0f}%")


if __name__ == "__main__":
    main()
