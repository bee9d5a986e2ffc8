import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.models.detector import FasterRCNNFPN
import pytest

from sgg_tpu.models.resnet import (ResNet50FPN, multiscale_roi_align,
                                   roi_level_assignment)

pytestmark = pytest.mark.slow


def test_resnet50_fpn_shapes():
    model = ResNet50FPN(dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["p2"].shape == (1, 32, 32, 256)
    assert out["p3"].shape == (1, 16, 16, 256)
    assert out["p4"].shape == (1, 8, 8, 256)
    assert out["p5"].shape == (1, 4, 4, 256)
    assert out["pool"].shape == (1, 2, 2, 256)
    # parameter count sanity: ResNet50 ~25.6M + FPN laterals/outputs
    n = sum(np.prod(p.shape) for p in
            jax.tree_util.tree_leaves(variables["params"]))
    assert 26e6 < n < 32e6, n


def test_roi_level_assignment():
    boxes = jnp.asarray([[0, 0, 56, 56],      # sqrt area 56 -> level 2 (k=2)
                         [0, 0, 224, 224],    # canonical -> level 4
                         [0, 0, 1000, 1000],  # huge -> level 5
                         [0, 0, 10, 10]])     # tiny -> level 2
    lv = np.asarray(roi_level_assignment(boxes))
    np.testing.assert_array_equal(lv, [0, 2, 3, 0])


def test_multiscale_roi_align_selects_levels():
    rng = np.random.RandomState(0)
    pyr = [jnp.asarray(rng.randn(1, s, s, 4), jnp.float32)
           for s in (32, 16, 8, 4)]
    boxes = jnp.asarray([[[0, 0, 56, 56], [0, 0, 600, 600]]], jnp.float32)
    out = multiscale_roi_align(pyr, boxes, (4, 8, 16, 32), pooled=7)
    assert out.shape == (1, 2, 7, 7, 4)
    # the small box pools exclusively from level 0
    from sgg_tpu.ops.roi_align import roi_align
    only0 = roi_align(pyr[0], boxes, spatial_scale=1 / 4.0)
    np.testing.assert_allclose(np.asarray(out[0, 0]),
                               np.asarray(only0[0, 0]), atol=1e-5)


def test_fpn_detector_forward():
    rng = np.random.RandomState(1)
    det = FasterRCNNFPN(num_classes=7, rpn_pre_nms_top_n=64,
                        rpn_post_nms_top_n=32, detections_per_img=10,
                        obj_dim=64, dtype=jnp.float32, score_thresh=0.01)
    images = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
    im_hw = jnp.full((1, 2), 128.0)
    variables = det.init(jax.random.key(0), images, im_hw, train=False)
    out = det.apply(variables, images, im_hw, train=False)
    assert out["boxes"].shape == (1, 10, 4)
    assert out["fmap"].shape == (1, 2, 2, 256)  # 'pool' level
    assert out["proposals"].shape == (1, 32, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()
    b = np.asarray(out["boxes"])[np.asarray(out["mask"])]
    if len(b):
        assert (b >= -1e-3).all() and (b <= 128 + 1e-3).all()


def test_relmodel_resnet50_backbone():
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models.relhead import RelModelIMP
    from sgg_tpu.train.assign import sample_edges

    ds = SyntheticSGGDataset(num_images=2, num_classes=9, num_predicates=5,
                             max_objects=4, image_size=128,
                             with_images=True, seed=0)
    gb = ds.batch([0, 1], max_nodes=6, max_edges=10)
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, backbone="resnet50",
                        dtype=jnp.float32)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=10)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, sampled[..., :2], pm, train=False)
    out = model.apply(variables, gb.images, gb.boxes, gb.classes,
                      sampled[..., :2], pm, train=False)
    assert out["obj_logits"].shape == (2, 6, 9)
    assert out["rel_logits"].shape == (2, 10, 5)
    assert np.isfinite(np.asarray(out["obj_logits"])).all()
    assert "trunk" in variables["params"]  # frozen partition label applies


def test_fpn_detector_trains():
    """FPN detector works under the pretraining losses (concat RPN)."""
    from sgg_tpu.models.detector import roi_head_losses, rpn_losses
    rng = np.random.RandomState(2)
    det = FasterRCNNFPN(num_classes=7, rpn_pre_nms_top_n=32,
                        rpn_post_nms_top_n=16, detections_per_img=8,
                        obj_dim=48, dtype=jnp.float32, score_thresh=0.01)
    images = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
    im_hw = jnp.full((1, 2), 128.0)
    variables = det.init(jax.random.key(0), images, im_hw, train=False)
    out = det.apply(variables, images, im_hw, train=False)
    gt_boxes = jnp.asarray(rng.rand(1, 3, 4) * 60, jnp.float32)
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 30)
    gt_classes = jnp.asarray(rng.randint(1, 7, (1, 3)))
    gt_mask = jnp.ones((1, 3), bool)
    rl = rpn_losses(jax.random.key(1), out["anchors"],
                    out["rpn_obj_logits"], out["rpn_deltas"], gt_boxes,
                    gt_mask)
    hl = roi_head_losses(jax.random.key(2), out["proposals"],
                         out["prop_mask"], out["class_logits"],
                         out["box_deltas"], gt_boxes, gt_classes, gt_mask)
    for d in (rl, hl):
        for k, v in d.items():
            assert np.isfinite(float(v)), (k, v)


def test_torchvision_resnet50_fpn_import():
    """Every tensor of a torchvision-format resnet50-FPN backbone state_dict
    maps onto our ResNet50FPN tree with matching shapes (so COCO-pretrained
    maskrcnn weights can drive the GQA/VTE trunk, rel_model_base.py:58-81)."""
    import jax.tree_util as tu

    from sgg_tpu.models.resnet import RESNET50_BLOCKS
    from sgg_tpu.train.checkpoint import resnet50_fpn_flat_updates

    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, cin, cout, k):
        # small kernels + ~unit running_var keep the 50-layer forward finite
        sd[f"{name}.weight"] = (rng.randn(cout, cin, k, k) * 0.05).astype(
            np.float32)

    def bnt(name, c):
        for sfx in ("weight", "bias", "running_mean"):
            sd[f"{name}.{sfx}"] = rng.rand(c).astype(np.float32)
        sd[f"{name}.running_var"] = (0.8 + rng.rand(c) * 0.4).astype(
            np.float32)

    conv("backbone.body.conv1", 3, 64, 7)
    bnt("backbone.body.bn1", 64)
    cin = 64
    for stage, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        w = 64 * 2 ** (stage - 1)
        for i in range(n_blocks):
            t = f"backbone.body.layer{stage}.{i}"
            conv(f"{t}.conv1", cin, w, 1)
            conv(f"{t}.conv2", w, w, 3)
            conv(f"{t}.conv3", w, w * 4, 1)
            for b, c in (("bn1", w), ("bn2", w), ("bn3", w * 4)):
                bnt(f"{t}.{b}", c)
            if i == 0:
                conv(f"{t}.downsample.0", cin, w * 4, 1)
                bnt(f"{t}.downsample.1", w * 4)
            cin = w * 4
    for i, cin_l in enumerate((256, 512, 1024, 2048)):
        conv(f"backbone.fpn.inner_blocks.{i}.0", cin_l, 256, 1)
        sd[f"backbone.fpn.inner_blocks.{i}.0.bias"] = rng.rand(256).astype(
            np.float32)
        conv(f"backbone.fpn.layer_blocks.{i}.0", 256, 256, 3)
        sd[f"backbone.fpn.layer_blocks.{i}.0.bias"] = rng.rand(256).astype(
            np.float32)

    model = ResNet50FPN(dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    flat = resnet50_fpn_flat_updates(sd)

    # exact coverage: every model leaf that is a backbone tensor must be
    # updated with a matching shape
    tree_paths = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf.shape
        for path, leaf in tu.tree_flatten_with_path(variables)[0]}
    for key, arr in flat.items():
        assert key in tree_paths, key
        assert tuple(arr.shape) == tuple(tree_paths[key]), (
            key, arr.shape, tree_paths[key])
    # and the update covers the whole tree (no orphan param left random)
    assert set(flat) == set(tree_paths), (
        set(tree_paths) - set(flat), set(flat) - set(tree_paths))

    from sgg_tpu.train.checkpoint import import_torch_resnet50_fpn
    new = import_torch_resnet50_fpn(variables, sd)
    got = np.asarray(new["params"]["body"]["conv1"]["kernel"])
    want = np.transpose(sd["backbone.body.conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    np.testing.assert_allclose(
        np.asarray(new["batch_stats"]["body"]["layer2_0"]["bn_down"]["var"]),
        sd["backbone.body.layer2.0.downsample.1.running_var"])
    # imported trunk still runs
    out = model.apply(new, jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(out["pool"])).all()
