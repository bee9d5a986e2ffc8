"""Full-program test: Trainer.fit on a synthetic dataset (CPU, tiny model)."""

import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.data.datasets import SGGDataset
from sgg_tpu.models.relhead import RelModelIMP
from sgg_tpu.train.trainer import Trainer
import pytest

pytestmark = pytest.mark.slow


def _to_sggdataset(ds: SyntheticSGGDataset, mode: str) -> SGGDataset:
    return SGGDataset(name="stanford", mode=mode, filenames=[],
                      images_dir="", gt_boxes=ds.gt_boxes,
                      gt_classes=ds.gt_classes,
                      relationships=ds.relationships,
                      ind_to_classes=ds.ind_to_classes,
                      ind_to_predicates=ds.ind_to_predicates,
                      box_coordinates="native")


def _splits(n_cls=9, n_pred=5):
    mk = lambda seed, n, mode: _to_sggdataset(
        SyntheticSGGDataset(num_images=n, num_classes=n_cls,
                            num_predicates=n_pred, max_objects=5,
                            image_size=300, seed=seed), mode)
    return {"train": mk(0, 8, "train"), "val_alls": mk(1, 4, "val"),
            "test_alls": mk(2, 4, "test"), "val_zs": mk(3, 2, "val"),
            "test_zs": mk(4, 2, "test")}


def test_fit_end_to_end(tmp_path):
    config = Config(batch_size=4, max_nodes=8, max_edges=12, mode="sgcls",
                    loss="dnorm", num_epochs=2, print_interval=1,
                    val_size=0, compute_dtype="float32",
                    save_dir=str(tmp_path / "run"), use_bias=True,
                    steps=(1,))
    splits = _splits()
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        use_bias=True, hidden_dim=16, obj_dim=32,
                        dtype=jnp.float32)
    trainer = Trainer(config, splits, model=model, with_images=False)
    results = trainer.fit(test_names=("test_zs", "test_alls"))
    # both eval regimes, both GC modes, mean recall on all-shot test
    assert any(k.startswith("predcls/test_alls_R@100") for k in results)
    assert "sgcls/test_alls_R@100_GC" in results
    assert "sgcls/test_alls_mR@100_NOGC" in results
    assert "predcls/test_alls_tripletR@20" in results  # per-triplet stats
    for k, v in results.items():
        if k.startswith("_"):
            continue
        assert np.isfinite(v), (k, v)
        # ranks cap at MAX_RECALL_K+1=301 (+f32 accumulation slack)
        assert 0 <= v <= 301.001, (k, v)
    # checkpoint written per epoch + test results json
    from sgg_tpu.train.checkpoint import latest_epoch
    assert latest_epoch(config.save_dir) == 1
    assert (tmp_path / "run" / "test_results.json").exists()


def test_resume_from_checkpoint(tmp_path):
    config = Config(batch_size=4, max_nodes=8, max_edges=12, mode="predcls",
                    num_epochs=1, val_size=0, notest=True,
                    compute_dtype="float32",
                    save_dir=str(tmp_path / "run2"))
    splits = _splits()
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="predcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    t1 = Trainer(config, splits, model=model, with_images=False)
    t1.fit()
    step_after = int(t1.state.step)
    assert step_after > 0

    # new trainer resumes: start_epoch advances, params match
    t2 = Trainer(config.replace(num_epochs=1), splits, model=model,
                 with_images=False)
    assert t2.start_epoch == 1
    assert int(t2.state.step) == step_after
    a = np.asarray(t1.state.params["imp"]["obj_fc"]["kernel"])
    b = np.asarray(t2.state.params["imp"]["obj_fc"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_trainer_data_parallel_mesh():
    """Trainer shards batches over all 8 virtual devices when num_devices
    allows it."""
    import jax
    assert len(jax.devices()) == 8
    config = Config(batch_size=8, max_nodes=8, max_edges=12, mode="sgcls",
                    num_epochs=1, val_size=0, notest=True,
                    compute_dtype="float32", num_devices=8)
    splits = _splits()
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    trainer = Trainer(config, splits, model=model, with_images=False)
    assert trainer.mesh is not None
    losses = trainer.train_epoch(0)
    assert np.isfinite(losses["total"])
    # params stay replicated across the mesh
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert len(leaf.sharding.device_set) == 8
