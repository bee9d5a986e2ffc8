"""Exported prediction entries carry ORIGINAL-image-scale boxes
(reference rm_box_priors_org, rel_model_base.py:237-240)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.eval.driver import val_epoch
from sgg_tpu.models import RelModelIMP

from test_trainer import _to_sggdataset

pytestmark = pytest.mark.slow


def test_collect_entries_original_scale():
    synth = SyntheticSGGDataset(num_images=2, num_classes=9,
                                num_predicates=5, max_objects=5,
                                image_size=300, seed=2)
    ds = _to_sggdataset(synth, "test")
    config = Config(batch_size=2, max_nodes=8, max_edges=12, mode="predcls",
                    compute_dtype="float32")
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="predcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    from sgg_tpu.data.pipeline import BatchLoader
    gb = next(iter(BatchLoader(ds, batch_size=2, max_nodes=8, max_edges=12,
                               with_images=False, shuffle=False)))
    from sgg_tpu.train.assign import sample_edges
    s, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                         gb.node_mask, max_out=12)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, s[..., :2], pm, train=False)
    res = val_epoch(model, variables, ds, config, "test", eval_batch_size=2,
                    with_images=False, collect_entries=True, verbose=False)
    entries = res["_entries"]
    assert len(entries) == 2
    for i, entry in enumerate(entries):
        # predcls pred boxes == GT boxes; export must be in ORIGINAL pixels
        n = len(ds.gt_boxes[i])
        np.testing.assert_allclose(entry["pred_boxes"][:n], ds.gt_boxes[i],
                                   atol=1.0, err_msg=f"image {i}")
