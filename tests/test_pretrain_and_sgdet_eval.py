"""Detector pretraining loop + sgdet evaluation through val_epoch."""

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.eval.driver import val_epoch
from sgg_tpu.models.detector import FasterRCNNVGG
from sgg_tpu.models.relhead import RelModelIMP
from test_trainer import _splits
import pytest

pytestmark = pytest.mark.slow


def test_pretrain_detector_smoke(tmp_path):
    from pretrain_detector import pretrain
    splits = _splits()
    det = FasterRCNNVGG(num_classes=9, rpn_pre_nms_top_n=32,
                        rpn_post_nms_top_n=16, detections_per_img=8,
                        obj_dim=32, dtype=jnp.float32)
    detector, state = pretrain(splits, num_epochs=1, batch_size=4,
                               max_nodes=8, detector=det,
                               with_images=False,
                               save_dir=str(tmp_path / "det"),
                               steps_per_print=1)
    assert int(state.step) == 2  # 8 images / batch 4
    from sgg_tpu.train.checkpoint import latest_epoch
    assert latest_epoch(str(tmp_path / "det")) == 0


def test_sgdet_val_epoch():
    splits = _splits()
    config = Config(batch_size=4, max_nodes=8, max_edges=12, mode="sgdet",
                    compute_dtype="float32")
    detector = FasterRCNNVGG(num_classes=9, rpn_pre_nms_top_n=32,
                             rpn_post_nms_top_n=16, detections_per_img=8,
                             obj_dim=32, dtype=jnp.float32,
                             score_thresh=0.01)
    relmodel = RelModelIMP(num_classes=9, num_predicates=5, mode="sgdet",
                           hidden_dim=16, obj_dim=32, dtype=jnp.float32)

    from sgg_tpu.data.pipeline import BatchLoader
    loader = BatchLoader(splits["test_alls"], batch_size=2, max_nodes=8,
                         max_edges=12, with_images=False, shuffle=False)
    gb = next(iter(loader))
    det_vars = detector.init(jax.random.key(0), gb.images, gb.im_hw,
                             train=False)
    det = detector.apply(det_vars, gb.images, gb.im_hw, train=False)
    from sgg_tpu.models.sgdet import detection_pairs
    pairs, pm = detection_pairs(det["boxes"], det["mask"], True)
    rel_vars = relmodel.init(jax.random.key(1), None, det["boxes"],
                             det["labels"], pairs, pm, fmap=det["fmap"],
                             train=False, mode="sgdet")

    res = val_epoch(relmodel, rel_vars, splits["test_alls"], config,
                    "test_alls", train=splits["train"], detector=detector,
                    det_variables=det_vars, with_images=False,
                    eval_batch_size=2, verbose=False)
    assert "sgdet/test_alls_R@100_GC" in res
    assert "sgdet/test_alls_mR@100_NOGC" in res
    for k, v in res.items():
        if not k.startswith("_"):
            assert np.isfinite(v), (k, v)


def test_sgdet_trainer_fit(tmp_path):
    """Full sgdet training program through the Trainer."""
    from sgg_tpu.train.trainer import Trainer
    splits = _splits()
    config = Config(batch_size=4, max_nodes=8, max_edges=12, mode="sgdet",
                    loss="dnorm", num_epochs=1, val_size=0, notest=True,
                    compute_dtype="float32", print_interval=1)
    detector = FasterRCNNVGG(num_classes=9, rpn_pre_nms_top_n=32,
                             rpn_post_nms_top_n=16, detections_per_img=8,
                             obj_dim=32, dtype=jnp.float32,
                             score_thresh=0.01)
    relmodel = RelModelIMP(num_classes=9, num_predicates=5, mode="sgdet",
                           hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    from sgg_tpu.data.pipeline import BatchLoader
    loader = BatchLoader(splits["train"], batch_size=4, max_nodes=8,
                         max_edges=12, with_images=False, shuffle=False)
    gb = next(iter(loader))
    det_vars = detector.init(jax.random.key(0), gb.images, gb.im_hw,
                             train=False)
    trainer = Trainer(config, splits, model=relmodel, detector=detector,
                      det_variables=det_vars, with_images=False)
    losses = trainer.train_epoch(0)
    assert np.isfinite(losses["total"])
    res = trainer.evaluate(("test_alls",), verbose=False)
    assert "sgdet/test_alls_R@100_GC" in res
