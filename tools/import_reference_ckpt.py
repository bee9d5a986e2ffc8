"""Convert reference PyTorch checkpoints into our Orbax payloads.

Usage:
    python tools/import_reference_ckpt.py detector <ckpt.pth> <out_dir> \
        [num_classes]
    python tools/import_reference_ckpt.py vgg <vgg16.pth> <out_dir>
    python tools/import_reference_ckpt.py relmodel <vgrel.pth> <out_dir>
    python tools/import_reference_ckpt.py resnet_fpn <maskrcnn.pth> <out_dir>

``detector`` maps a torchvision ``FasterRCNN(vgg16)`` state_dict (the
detector checkpoints the reference trains/loads, pytorch_misc.py:183-211)
into a ``FasterRCNNVGG`` parameter payload; ``vgg`` maps a plain torchvision
VGG16 into the SGG model's trunk + RoI heads; ``relmodel`` maps a full
reference ``RelModelStanford`` vgrel.pth (head + RoI heads + union conv +
freq bias + trunk) into ``RelModelIMP``; ``resnet_fpn`` maps a torchvision
maskrcnn/fasterrcnn_resnet50_fpn backbone into ``ResNet50FPN``
(rel_model_base.py:58-81). The resulting payload restores
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
    sd = load_torch_state_dict(pth_path)
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
    else:
        raise SystemExit(f"unknown kind {kind}")

    save_payload(os.path.abspath(out_dir), payload, 0)
    print(f"wrote Orbax payload to {out_dir}")


if __name__ == "__main__":
    main()
