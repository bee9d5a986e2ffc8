"""Step-time breakdown on the real chip: trunk / RoI / rects / IMP / full.

Run on TPU: python tools/profile_step.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.models import RelModelIMP
from sgg_tpu.models.backbone import RoiHead, VGG16Trunk
from sgg_tpu.models.union_features import UnionBoxFeats
from sgg_tpu.ops.boxes import union_boxes
from sgg_tpu.ops.roi_align import roi_align
from sgg_tpu.train.assign import sample_edges
from sgg_tpu.train.state import create_train_state
from sgg_tpu.train.step import make_train_step

B, N, E, IMG = 24, 40, 256, 592


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])
        if hasattr(x, "ravel") else x, out)
    # sync via readback of one scalar
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1000:8.2f} ms  ({B / dt:7.1f} img/s)")
    return dt


def main():
    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=N, max_edges=E))
    config = Config(batch_size=B, max_nodes=N, max_edges=E, mode="sgcls",
                    loss="dnorm")
    model = RelModelIMP(num_classes=151, num_predicates=51, mode="sgcls",
                        dtype=jnp.bfloat16)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=E)
    pairs = sampled[..., :2]
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, pairs, pm, train=False)
    state = create_train_state(config, variables)

    # components
    trunk = VGG16Trunk(dtype=jnp.bfloat16)
    tvars = {"params": variables["params"]["trunk"]}
    trunk_fn = jax.jit(lambda v, x: trunk.apply(v, x))
    fmap = trunk_fn(tvars, gb.images)
    timeit("trunk fwd", trunk_fn, tvars, gb.images)

    ra_nodes = jax.jit(lambda f, b: roi_align(f, b, spatial_scale=1 / 16.0))
    timeit("roi_align nodes (40)", ra_nodes, fmap, gb.boxes)
    ub = union_boxes(gb.boxes, pairs[..., 0], pairs[..., 1])
    timeit("roi_align unions (256)", ra_nodes, fmap, ub)

    uf = UnionBoxFeats(dim=512)
    b_s = jnp.take_along_axis(gb.boxes, pairs[..., 0:1].repeat(4, -1), 1)
    b_o = jnp.take_along_axis(gb.boxes, pairs[..., 1:2].repeat(4, -1), 1)
    pair_boxes = jnp.concatenate([b_s, b_o], -1)
    ufv = uf.init(jax.random.key(0), pair_boxes, train=False)
    uf_fn = jax.jit(lambda v, p: uf.apply(v, p, train=False))
    timeit("rects conv (256 edges)", uf_fn, ufv, pair_boxes)

    rh = RoiHead(out_dim=4096, dtype=jnp.bfloat16)
    rhv = {"params": variables["params"]["roi_fmap"]}
    pool = ra_nodes(fmap, ub)
    rh_fn = jax.jit(lambda v, x: rh.apply(v, x))
    timeit("roi_fmap FC (256 rois)", rh_fn, rhv, pool)

    fwd = jax.jit(lambda v, *a: model.apply(v, *a, train=False))
    timeit("full forward", fwd, variables, gb.images, gb.boxes, gb.classes,
           pairs, pm)

    step = make_train_step(model, config)

    def run_step(state, batch, key):
        return step(state, batch, key)

    # train step without donation reuse issues: time via closure
    s = state
    s, m = step(s, gb, jax.random.key(0))
    float(m["total"])
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        s, m = step(s, gb, jax.random.key(i))
    float(m["total"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{'full train step':28s} {dt * 1000:8.2f} ms  "
          f"({B / dt:7.1f} img/s)")


if __name__ == "__main__":
    main()
