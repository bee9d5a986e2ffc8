"""Component-time breakdown INSIDE the relation head (sgdet shapes).

Run on TPU: python tools/profile_relhead.py
Splits the ~30 ms "rel head on the pair budget" slice from
tools/profile_sgdet.py into: node RoIAlign, union RoIAlign, rects conv
branch, edge RoiHead (fc6/fc7 on 25088-d unions), node RoiHead, IMP
message passing — to target the next optimization.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.models.backbone import RoiHead
from sgg_tpu.models.union_features import UnionBoxFeats
from sgg_tpu.ops.boxes import union_boxes
from sgg_tpu.ops.roi_align import roi_align

B, N, E, HW = 8, 50, 1024, 37  # sgdet eval budget shapes (592px stride 16)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1000:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    fmap = jnp.asarray(rng.rand(B, HW, HW, 512), jnp.bfloat16)
    boxes = jnp.asarray(
        np.sort(rng.rand(B, N, 2, 2) * 560, axis=2).reshape(B, N, 4)
        [..., [0, 2, 1, 3]], jnp.float32)
    pairs = jnp.asarray(rng.randint(0, N, (B, E, 2)), jnp.int32)
    pm = jnp.ones((B, E), bool)

    t_node = timeit("node RoIAlign (N=50)", jax.jit(
        lambda f, b: roi_align(f, b, spatial_scale=1 / 16., pooled=7)),
        fmap, boxes)

    ub = jax.jit(lambda b, p: union_boxes(b, p[..., 0], p[..., 1]))(
        boxes, pairs)
    t_uroi = timeit("union RoIAlign (E=1024)", jax.jit(
        lambda f, b: roi_align(f, b, spatial_scale=1 / 16., pooled=7)),
        fmap, ub)
    timeit("union RoIAlign (E=512, dedup'd)", jax.jit(
        lambda f, b: roi_align(f, b, spatial_scale=1 / 16., pooled=7)),
        fmap, ub[:, :E // 2])

    uf = UnionBoxFeats(dim=512, pooling_size=7, dtype=jnp.bfloat16)
    b_s = jnp.take_along_axis(boxes, pairs[..., 0:1].repeat(4, -1), 1)
    b_o = jnp.take_along_axis(boxes, pairs[..., 1:2].repeat(4, -1), 1)
    pb = jnp.concatenate([b_s, b_o], axis=-1)
    ufv = uf.init(jax.random.key(0), pb)
    t_rects = timeit("rects conv branch (E=1024)", jax.jit(
        lambda v, p: uf.apply(v, p)), ufv, pb)

    upool = jnp.asarray(rng.rand(B, E, 7, 7, 512), jnp.bfloat16)
    eh = RoiHead(out_dim=4096, dtype=jnp.bfloat16, with_final_relu=False)
    ehv = eh.init(jax.random.key(0), upool, train=False)
    t_ehead = timeit("edge RoiHead fc6/fc7 (E=1024)", jax.jit(
        lambda v, x: eh.apply(v, x, train=False)), ehv, upool)

    npool = jnp.asarray(rng.rand(B, N, 7, 7, 512), jnp.bfloat16)
    nh = RoiHead(out_dim=4096, dtype=jnp.bfloat16, with_final_relu=True)
    nhv = nh.init(jax.random.key(0), npool, train=False)
    t_nhead = timeit("node RoiHead fc6/fc7 (N=50)", jax.jit(
        lambda v, x: nh.apply(v, x, train=False)), nhv, npool)

    from sgg_tpu.models.relhead import IMPHead
    imp = IMPHead(num_classes=151, num_predicates=51, dtype=jnp.bfloat16)
    nf = jnp.asarray(rng.rand(B, N, 4096), jnp.bfloat16)
    ef = jnp.asarray(rng.rand(B, E, 4096), jnp.bfloat16)
    iv = imp.init(jax.random.key(0), nf, ef, pairs, pm)
    t_imp = timeit("IMP head (3 iters)", jax.jit(
        lambda v, a, b, p, m: imp.apply(v, a, b, p, m)), iv, nf, ef,
        pairs, pm)

    tot = t_node + t_uroi + t_rects + t_ehead + t_nhead + t_imp
    print(f"{'sum of parts':40s} {tot * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
