import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgg_tpu.train.checkpoint import (import_torch_vgg, latest_epoch,
                                      optimistic_update, restore_checkpoint,
                                      save_checkpoint, torch_vgg_key_map)


def _tiny_state():
    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models import RelModelIMP
    from sgg_tpu.train.assign import sample_edges
    from sgg_tpu.train.state import create_train_state

    config = Config(batch_size=2, max_nodes=8, max_edges=12, mode="sgcls",
                    compute_dtype="float32")
    ds = SyntheticSGGDataset(num_images=2, num_classes=9, num_predicates=5,
                             max_objects=5, image_size=48, with_images=True)
    model = RelModelIMP(num_classes=9, num_predicates=5, hidden_dim=16,
                        obj_dim=32, dtype=jnp.float32)
    gb = ds.batch([0, 1], max_nodes=8, max_edges=12)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=12)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, sampled[..., :2], pm, train=False)
    return create_train_state(config, variables)


def test_save_restore_roundtrip(tmp_path):
    state = _tiny_state()
    save_dir = str(tmp_path / "ckpt")
    save_checkpoint(save_dir, state, epoch=3)
    assert latest_epoch(save_dir) == 3

    # perturb, then restore
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params),
        step=state.step + 100)
    restored, epoch = restore_checkpoint(save_dir, perturbed)
    assert epoch == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored.params, state.params)
    assert int(restored.step) == int(state.step)


def test_restore_missing_returns_minus_one(tmp_path):
    state = _tiny_state()
    restored, epoch = restore_checkpoint(str(tmp_path / "none"), state)
    assert epoch == -1
    assert restored is state


def test_optimistic_update_skips_mismatches():
    params = {"a": {"w": np.zeros((2, 2))}, "b": {"w": np.zeros(3)}}
    out = optimistic_update(params, {
        "a/w": np.ones((2, 2)),
        "b/w": np.ones(5),          # shape mismatch -> skipped
        "c/w": np.ones(1),          # missing in tree -> skipped
    })
    np.testing.assert_array_equal(out["a"]["w"], 1)
    np.testing.assert_array_equal(out["b"]["w"], 0)


def test_torch_vgg_import():
    torch = pytest.importorskip("torch")
    state = _tiny_state()
    # build a fake torchvision vgg16 state_dict covering the trunk convs
    key_map = torch_vgg_key_map()
    assert len(key_map) == 13  # 13 convs in VGG16
    sd = {}
    rng = np.random.RandomState(0)
    from sgg_tpu.models.backbone import VGG16_CFG
    in_ch = 3
    torch_names = sorted(key_map, key=lambda k: int(k.split(".")[1]))
    chans = [v for v in VGG16_CFG if v != "M"]
    for tname, out_ch in zip(torch_names, chans):
        sd[f"{tname}.weight"] = rng.randn(out_ch, in_ch, 3, 3).astype(
            np.float32)
        sd[f"{tname}.bias"] = rng.randn(out_ch).astype(np.float32)
        in_ch = out_ch
    new_params = import_torch_vgg(state.params, sd)
    got = np.asarray(new_params["trunk"]["Conv_0"]["kernel"])
    want = np.transpose(sd["features.0.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    # conv2 (features.2) -> Conv_1
    got1 = np.asarray(new_params["trunk"]["Conv_1"]["kernel"])
    want1 = np.transpose(sd["features.2.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got1, want1)


def test_torch_faster_rcnn_import():
    """Detector state_dict transplant: shapes map, values arrive transposed."""
    from sgg_tpu.models.detector import FasterRCNNVGG
    from sgg_tpu.train.checkpoint import import_torch_faster_rcnn

    det = FasterRCNNVGG(num_classes=7, rpn_pre_nms_top_n=16,
                        rpn_post_nms_top_n=8, detections_per_img=4,
                        obj_dim=64, dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    hw = jnp.full((1, 2), 64.0)
    variables = det.init(jax.random.key(0), img, hw, train=False)
    rng = np.random.RandomState(0)
    sd = {
        "backbone.0.weight": rng.randn(64, 3, 3, 3).astype(np.float32),
        "backbone.0.bias": rng.randn(64).astype(np.float32),
        "rpn.head.conv.weight": rng.randn(512, 512, 3, 3).astype(np.float32),
        "rpn.head.cls_logits.weight": rng.randn(15, 512, 1, 1).astype(
            np.float32),
        "roi_heads.box_head.fc6.weight": rng.randn(
            64, 512 * 49).astype(np.float32),
        "roi_heads.box_predictor.cls_score.weight": rng.randn(
            7, 64).astype(np.float32),
        "roi_heads.box_predictor.cls_score.bias": rng.randn(7).astype(
            np.float32),
    }
    new = import_torch_faster_rcnn(variables["params"], sd)
    np.testing.assert_allclose(
        np.asarray(new["trunk"]["Conv_0"]["kernel"]),
        np.transpose(sd["backbone.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(new["rpn"]["conv"]["kernel"]),
        np.transpose(sd["rpn.head.conv.weight"], (2, 3, 1, 0)))
    # fc6 consumes flattened pooled RoIs: torch flattens CHW, ours HWC
    from sgg_tpu.train.checkpoint import _fc6_chw_to_hwc
    np.testing.assert_allclose(
        np.asarray(new["box_head"]["fc6"]["kernel"]),
        _fc6_chw_to_hwc(sd["roi_heads.box_head.fc6.weight"]))
    np.testing.assert_allclose(
        np.asarray(new["cls_score"]["bias"]),
        sd["roi_heads.box_predictor.cls_score.bias"])
    # untouched params stay
    np.testing.assert_allclose(
        np.asarray(new["bbox_pred"]["kernel"]),
        np.asarray(variables["params"]["bbox_pred"]["kernel"]))


def test_load_torch_state_dict(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"a.weight": torch.randn(2, 3), "meta": 5}
    path = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": sd}, path)
    from sgg_tpu.train.checkpoint import load_torch_state_dict
    out = load_torch_state_dict(path)
    assert set(out) == {"a.weight"}
    np.testing.assert_allclose(out["a.weight"], sd["a.weight"].numpy())
