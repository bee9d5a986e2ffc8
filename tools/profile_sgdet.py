"""Component-time breakdown of the sgdet eval path on the real chip.

Run on TPU: python tools/profile_sgdet.py
Mirrors tools/profile_step.py for the sgdet protocol: trunk / detector
(RPN+NMS+RoI head+postprocess) / relation head on the pair budget / full
one-pass retry eval step (models/sgdet.py:make_sgdet_retry_eval_step).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.models import RelModelIMP
from sgg_tpu.models.backbone import VGG16Trunk
from sgg_tpu.models.detector import FasterRCNNVGG
from sgg_tpu.models.sgdet import (SGDET_EVAL_MAX_PAIRS,
                                  make_sgdet_retry_eval_step)
from sgg_tpu.train.assign import all_pairs

B, N, E, IMG = 8, 40, 256, 592


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1000:8.2f} ms  ({B / dt:7.1f} img/s)")
    return dt


def main():
    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=N, max_edges=E))

    det = FasterRCNNVGG(num_classes=151, dtype=jnp.bfloat16)
    det_vars = jax.jit(lambda k, im, hw: det.init(k, im, hw, train=False))(
        jax.random.key(0), gb.images, gb.im_hw)

    trunk = VGG16Trunk(dtype=jnp.bfloat16)
    tvars = {"params": det_vars["params"]["trunk"]}
    trunk_fn = jax.jit(lambda v, x: trunk.apply(v, x))
    fmap = trunk_fn(tvars, gb.images)
    t_trunk = timeit("trunk fwd (B=8)", trunk_fn, tvars, gb.images)

    det_fn = jax.jit(lambda v, im, hw: det.apply(v, im, hw, train=False,
                                                 score_thresh=0.01))
    dout = det_fn(det_vars, gb.images, gb.im_hw)
    t_det = timeit("detector full (trunk+RPN+NMS+head)", det_fn, det_vars,
                   gb.images, gb.im_hw)

    # detector minus trunk: apply with precomputed fmap
    det_nf = jax.jit(lambda v, f, hw: det.apply(
        v, None, hw, fmap=f, train=False, score_thresh=0.01))
    dout2 = det_nf(det_vars, fmap, gb.im_hw)
    timeit("detector sans trunk (fmap given)", det_nf, det_vars, fmap,
           gb.im_hw)

    rel = RelModelIMP(num_classes=151, num_predicates=51, mode="sgdet",
                      dtype=jnp.bfloat16)
    pairs, pm = all_pairs(dout["mask"])
    rel_vars = jax.jit(lambda k: rel.init(
        k, None, dout["boxes"], dout["labels"], pairs, pm,
        fmap=dout["fmap"], train=False))(jax.random.key(0))

    from sgg_tpu.train.assign import compact_pairs
    cp, cpm, _ = compact_pairs(pairs, pm, SGDET_EVAL_MAX_PAIRS)
    rel_fn = jax.jit(lambda v, f, b, l, p, m: rel.apply(
        v, None, b, l, p, m, fmap=f, train=False, mode="sgdet"))
    rel_fn(rel_vars, dout["fmap"], dout["boxes"], dout["labels"], cp, cpm)
    timeit(f"rel head ({SGDET_EVAL_MAX_PAIRS} pairs/img)", rel_fn,
           rel_vars, dout["fmap"], dout["boxes"], dout["labels"], cp, cpm)

    step = make_sgdet_retry_eval_step(det, rel,
                                      max_pairs=SGDET_EVAL_MAX_PAIRS)
    step((det_vars, rel_vars), gb)
    t_full = timeit("full retry eval step", step, (det_vars, rel_vars), gb)

    print(f"\ntrunk share of full step: {100 * t_trunk / t_full:.0f}%  "
          f"detector share: {100 * t_det / t_full:.0f}%")


if __name__ == "__main__":
    main()
