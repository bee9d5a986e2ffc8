"""Generated-feature quality metrics (reference ``GAN_features.ipynb``).

Generates fake node features with the GAN, pools real features from the
model, and reports FID + precision/recall/density/coverage
(``sgg_tpu.augment.gan_eval``). Synthetic-data fallback included:

    python examples/gan_feature_quality.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgg_tpu.augment.gan_eval import compute_fid, compute_prdc
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models.gan import GANModel
    from sgg_tpu.models.relhead import RelModelIMP
    from sgg_tpu.ops.boxes import scale_boxes_01
    from sgg_tpu.ops.roi_align import roi_align
    from sgg_tpu.train.assign import sample_edges

    B, N, E, IMG = 4, 8, 16, 128
    ds = SyntheticSGGDataset(num_images=B, num_classes=12, num_predicates=6,
                             max_objects=6, image_size=IMG,
                             with_images=True, seed=0)
    gb = ds.batch(list(range(B)), max_nodes=N, max_edges=E)

    model = RelModelIMP(num_classes=12, num_predicates=6, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=E)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, sampled[..., :2], pm, train=False)
    out = model.apply(variables, gb.images, gb.boxes, gb.classes,
                      sampled[..., :2], pm, train=False, return_feats=True)
    real = np.asarray(out["node_pool"], np.float32)
    mask = np.asarray(gb.node_mask)

    gan = GANModel(num_classes=12, num_predicates=6, hidden_dim=8, n_ch=512,
                   fmap_sz=IMG // 16, n_layers_G=2)
    boxes01 = scale_boxes_01(gb.boxes, gb.im_hw)
    gan_vars = gan.init(jax.random.key(1), gb.classes, boxes01, gb.rels,
                        gb.node_mask, gb.rel_mask, train=False,
                        method=gan.init_all)
    fmaps = gan.apply(gan_vars, gb.classes, boxes01, gb.rels, gb.node_mask,
                      gb.rel_mask, train=False)
    fake = np.asarray(roi_align(fmaps, gb.boxes, spatial_scale=1 / 16.0),
                      np.float32)

    real_flat = real[mask].reshape(mask.sum(), -1)
    fake_flat = fake[mask].reshape(mask.sum(), -1)
    # truncate feature dim for a stable covariance with few samples
    d = min(16, real_flat.shape[1])
    fid = compute_fid(fake_flat, real_flat, truncate=d)
    prdc = compute_prdc(real_flat[:, :d], fake_flat[:, :d],
                        nearest_k=min(3, len(real_flat) - 1))
    print(f"FID (untrained G, {d}-d): {fid:.2f}")
    for k, v in prdc.items():
        print(f"{k}: {v:.3f}")


if __name__ == "__main__":
    main()
