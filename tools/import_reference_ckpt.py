"""Convert reference PyTorch checkpoints into our Orbax payloads.

Usage:
    python tools/import_reference_ckpt.py detector <ckpt.pth> <out_dir> \
        [num_classes]
    python tools/import_reference_ckpt.py vgg <vgg16.pth> <out_dir>
    python tools/import_reference_ckpt.py relmodel <vgrel.pth> <out_dir>
    python tools/import_reference_ckpt.py resnet_fpn <maskrcnn.pth> <out_dir>
    python tools/import_reference_ckpt.py gan <vgrel.pth> <out_dir>

``detector`` maps a torchvision ``FasterRCNN(vgg16)`` state_dict (the
detector checkpoints the reference trains/loads, pytorch_misc.py:183-211)
into a ``FasterRCNNVGG`` parameter payload; ``vgg`` maps a plain torchvision
VGG16 into the SGG model's trunk + RoI heads; ``relmodel`` maps a full
reference ``RelModelStanford`` vgrel.pth (head + RoI heads + union conv +
freq bias + trunk) into ``RelModelIMP``; ``resnet_fpn`` maps a torchvision
maskrcnn/fasterrcnn_resnet50_fpn backbone into ``ResNet50FPN``
(rel_model_base.py:58-81); ``gan`` maps a reference ``GAN`` state (the
``gan`` entry inside a vgrel.pth or a bare GAN state_dict — generator plus
all three spectral-norm discriminators) into ``GANModel``. The resulting
payload restores
with ``sgg_tpu.train.checkpoint.restore_payload`` for apples-to-apples
parity runs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgg_tpu.train.checkpoint import (import_torch_faster_rcnn,
                                          import_torch_relmodel,
                                          import_torch_resnet50_fpn,
                                          import_torch_vgg,
                                          load_torch_state_dict,
                                          save_payload)

    kind, pth_path, out_dir = sys.argv[1:4]
    num_classes = int(sys.argv[4]) if len(sys.argv) > 4 else 151
    sd = load_torch_state_dict(
        pth_path, key="gan" if kind == "gan" else "state_dict")
    print(f"loaded {len(sd)} tensors from {pth_path}")

    if kind == "detector":
        from sgg_tpu.models.detector import FasterRCNNVGG
        det = FasterRCNNVGG(num_classes=num_classes)
        img = jnp.zeros((1, 592, 592, 3), jnp.float32)
        hw = jnp.full((1, 2), 592.0)
        variables = det.init(jax.random.key(0), img, hw, train=False)
        params = import_torch_faster_rcnn(variables["params"], sd,
                                          verbose=True)
        payload = {"step": np.asarray(0), "params": params,
                   "batch_stats": variables.get("batch_stats", {}),
                   "epoch": np.asarray(0)}
    elif kind == "vgg":
        from sgg_tpu.models.relhead import RelModelIMP
        from sgg_tpu.data import SyntheticSGGDataset
        from sgg_tpu.train.assign import sample_edges
        model = RelModelIMP(num_classes=num_classes, num_predicates=51)
        ds = SyntheticSGGDataset(num_images=1, num_classes=num_classes,
                                 num_predicates=51, image_size=592,
                                 with_images=True)
        gb = ds.batch([0], max_nodes=8, max_edges=8)
        s, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                             gb.node_mask, max_out=8)
        variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                               gb.classes, s[..., :2], pm, train=False)
        params = import_torch_vgg(variables["params"], sd, verbose=True)
        payload = {"step": np.asarray(0), "params": params,
                   "batch_stats": variables.get("batch_stats", {}),
                   "epoch": np.asarray(0)}
    elif kind == "relmodel":
        from sgg_tpu.models.relhead import RelModelIMP
        from sgg_tpu.data import SyntheticSGGDataset
        from sgg_tpu.train.assign import sample_edges
        model = RelModelIMP(num_classes=num_classes, num_predicates=51,
                            use_bias="freq_bias.obj_baseline.weight" in sd)
        ds = SyntheticSGGDataset(num_images=1, num_classes=num_classes,
                                 num_predicates=51, image_size=592,
                                 with_images=True)
        gb = ds.batch([0], max_nodes=8, max_edges=8)
        s, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                             gb.node_mask, max_out=8)
        variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                               gb.classes, s[..., :2], pm, train=False)
        variables = import_torch_relmodel(variables, sd, verbose=True)
        payload = {"step": np.asarray(0), "params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {}),
                   "epoch": np.asarray(0)}
    elif kind == "resnet_fpn":
        from sgg_tpu.models.resnet import ResNet50FPN
        model = ResNet50FPN()
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 128, 128, 3)), train=False)
        variables = import_torch_resnet50_fpn(variables, sd, verbose=True)
        payload = {"step": np.asarray(0), "params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {}),
                   "epoch": np.asarray(0)}
    elif kind == "gan":
        from sgg_tpu.models.gan.gan import GANModel
        from sgg_tpu.train.checkpoint import import_torch_gan
        largeD = any(k.startswith("D_global.2.") for k in sd)
        n_gcn = 1 + max((int(k.split(".")[2])
                         for k in sd if k.startswith("G_gcn.gconvs.")),
                        default=4)
        num_cls = int(sd["G_obj_embed.weight"].shape[0])
        num_preds = int(sd["G_rel_embed.weight"].shape[0])
        embed_dim = int(sd["G_obj_embed.weight"].shape[1])
        gk = "G_proj.weight"
        hidden_dim = int(sd[gk].shape[0])
        dg0 = sd.get("D_global.0.weight_orig", sd.get("D_global.0.weight"))
        n_ch = int(dg0.shape[1])
        vis_cond = int(sd[gk].shape[1]) > hidden_dim
        # GCN emits hid/2 * pool^2 per node (reference gan.py:110-115);
        # the last Linear of the last gconv's net2 carries the output dim
        last_lin = max(int(k.split(".")[4]) for k in sd
                       if k.startswith(f"G_gcn.gconvs.{n_gcn - 1}.net2.")
                       and k.endswith(".weight")
                       and sd[k].ndim == 2)
        gcn_out = int(
            sd[f"G_gcn.gconvs.{n_gcn - 1}.net2.{last_lin}.weight"].shape[0])
        pool_sz = int(round((gcn_out / (hidden_dim // 2)) ** 0.5))
        model = GANModel(num_classes=num_cls, num_predicates=num_preds,
                         embed_dim=embed_dim, hidden_dim=hidden_dim,
                         n_ch=n_ch, pool_sz=pool_sz, n_layers_G=n_gcn,
                         vis_cond=vis_cond, largeD=largeD)
        B, N, E = 1, 6, 8
        classes = jnp.ones((B, N), jnp.int32)
        boxes01 = jnp.tile(jnp.asarray([0.1, 0.1, 0.5, 0.5]), (B, N, 1))
        rels = jnp.zeros((B, E, 3), jnp.int32).at[..., 1].set(1)
        nm = jnp.ones((B, N), bool)
        rm = jnp.ones((B, E), bool)
        variables = model.init(jax.random.key(0), classes, boxes01, rels,
                               nm, rm, train=False,
                               method=GANModel.init_all)
        variables = import_torch_gan(variables, sd, num_gcn_layers=n_gcn,
                                     largeD=largeD, verbose=True)
        payload = {"step": np.asarray(0), "params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {}),
                   "epoch": np.asarray(0)}
    else:
        raise SystemExit(f"unknown kind {kind}")

    save_payload(os.path.abspath(out_dir), payload, 0)
    print(f"wrote Orbax payload to {out_dir}")


if __name__ == "__main__":
    main()
