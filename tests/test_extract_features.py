"""Feature-bank extraction driver (reference ``extract_features.py``).

The bank writer (augment/feature_bank.py) has its own roundtrip tests;
this exercises the extraction pass itself — model forward with
``return_feats`` over the train loader, per-class appends — and the
frozen-trunk-cache variant of it.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from extract_features import extract_features
from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.data.datasets import SGGDataset
from sgg_tpu.models.relhead import RelModelIMP
from sgg_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow


def _splits(n_train=2):
    def mk(seed, n, mode):
        s = SyntheticSGGDataset(num_images=n, num_classes=9,
                                num_predicates=5, max_objects=5,
                                image_size=300, seed=seed)
        return SGGDataset(name="stanford", mode=mode, filenames=[],
                          images_dir="", gt_boxes=s.gt_boxes,
                          gt_classes=s.gt_classes,
                          relationships=s.relationships,
                          ind_to_classes=s.ind_to_classes,
                          ind_to_predicates=s.ind_to_predicates,
                          box_coordinates="native")
    return {"train": mk(0, n_train, "train")}


def _bank_classes(path):
    import h5py
    with h5py.File(path, "r") as f:
        return {k: f[k].shape for k in f.keys()}


def test_extract_features_writes_per_class_bank(tmp_path):
    splits = _splits()
    config = Config(batch_size=2, max_nodes=8, max_edges=12, mode="sgcls",
                    num_epochs=1, val_size=0, notest=True)
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.bfloat16)
    trainer = Trainer(config, splits, model=model, with_images=False)
    path = extract_features(trainer, str(tmp_path / "bank"), n_batches=1,
                            batch_size=2)
    shapes = _bank_classes(path)
    n_objs = sum(len(c) for c in splits["train"].gt_classes)
    assert sum(s[0] for s in shapes.values()) == n_objs
    # bank stores flattened pooled features: (n, P*P*C)
    assert all(len(s) == 2 for s in shapes.values())


def test_extract_features_from_cache_matches(tmp_path):
    """The cached extraction writes the same per-class counts and close
    feature values (bf16 trunk either way; flip draws align because both
    loaders start from the same seed/epoch)."""
    splits = _splits()
    config = Config(batch_size=2, max_nodes=8, max_edges=12, mode="sgcls",
                    num_epochs=1, val_size=0, notest=True)
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.bfloat16)
    trainer = Trainer(config, splits, model=model, with_images=False)
    # num_workers=1 pins the flip-draw order so both runs see the same
    # orientations
    p_img = extract_features(trainer, str(tmp_path / "img"), batch_size=2,
                             num_workers=1)

    config_c = config.replace(feature_cache=str(tmp_path / "fc"))
    trainer_c = Trainer(config_c, splits, model=model, with_images=False)
    p_cached = extract_features(trainer_c, str(tmp_path / "cached"),
                                batch_size=2, num_workers=1)
    a, b = _bank_classes(p_img), _bank_classes(p_cached)
    assert a == b

    import h5py
    with h5py.File(p_img) as fa, h5py.File(p_cached) as fb:
        for k in a:
            np.testing.assert_allclose(np.asarray(fa[k]),
                                       np.asarray(fb[k]),
                                       rtol=0.05, atol=0.05)
