"""Frozen-trunk feature cache: storage, pipeline parity, trainer e2e.

The cache (sgg_tpu/data/feature_cache.py) has no reference analogue — it is
the TPU-native answer to the reference recomputing the frozen VGG16 forward
on every image every epoch (/root/reference/main.py:209 ->
rel_model_stanford.py:125-131). These tests pin the exactness contract:
cached batches carry the same boxes/rels/flips as the live image pipeline,
and the stored fmaps match the live trunk output at bfloat16 precision.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg_tpu.data.datasets import SGGDataset
from sgg_tpu.data.feature_cache import (FeatureCache, extract_trunk_cache,
                                        params_fingerprint,
                                        split_cache_path)
from sgg_tpu.data.pipeline import BatchLoader

IM = 64  # tiny canvas so the CPU VGG trunk stays fast


def _write_images(tmp_path, n, rng):
    """Non-square random PNGs (flip-asymmetric content)."""
    from PIL import Image
    names = []
    for i in range(n):
        h, w = int(rng.randint(40, 80)), int(rng.randint(40, 80))
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"img_{i}.png"
        Image.fromarray(arr).save(tmp_path / name)
        names.append(name)
    return names


def _dataset(tmp_path, n=6, mode="train", seed=0):
    rng = np.random.RandomState(seed)
    names = _write_images(tmp_path, n, rng)
    boxes, classes, rels = [], [], []
    for i in range(n):
        k = rng.randint(2, 5)
        xy = rng.rand(k, 2) * 30
        wh = rng.rand(k, 2) * 20 + 4
        boxes.append(np.concatenate([xy, xy + wh], 1).astype(np.float32))
        classes.append(rng.randint(1, 7, size=k).astype(np.int32))
        rels.append(np.asarray([[0, 1, rng.randint(1, 4)]], np.int32))
    return SGGDataset(name="stanford", mode=mode, filenames=names,
                      images_dir=str(tmp_path), gt_boxes=boxes,
                      gt_classes=classes, relationships=rels,
                      ind_to_classes=["bg"] + [f"c{i}" for i in range(6)],
                      ind_to_predicates=["nr", "p1", "p2", "p3"],
                      box_coordinates="native")


def _trunk_fn():
    from sgg_tpu.models.backbone import VGG16Trunk
    trunk = VGG16Trunk(dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, IM, IM, 3), jnp.uint8)
    tvars = trunk.init(jax.random.key(0), x0)
    return jax.jit(lambda x: trunk.apply(tvars, x)), tvars


def test_cache_roundtrip(tmp_path):
    import ml_dtypes
    path = str(tmp_path / "c.h5")
    rng = np.random.RandomState(0)
    cache = FeatureCache.create(path, 3, (4, 4), 8, n_orient=2,
                                fingerprint="abc")
    vals = rng.randn(3, 2, 4, 4, 8).astype(ml_dtypes.bfloat16)
    for i in range(3):
        cache.write(i, vals[i], (37, 53))
    cache.close()

    cache = FeatureCache(path)
    assert cache.complete() and cache.fingerprint == "abc"
    assert cache.n_orient == 2 and cache.channels == 8
    for i in range(3):
        for flip in (False, True):
            got = cache.read(i, flip)
            assert got.dtype == ml_dtypes.bfloat16
            np.testing.assert_array_equal(
                got.view(np.uint16), vals[i, int(flip)].view(np.uint16))
        assert cache.orig_hw(i) == (37, 53)
    cache.close()


def test_incomplete_cache_detected(tmp_path):
    path = str(tmp_path / "c.h5")
    cache = FeatureCache.create(path, 2, (4, 4), 8, n_orient=1)
    cache.write(0, np.zeros((1, 4, 4, 8), np.float32), (10, 10))
    assert not cache.complete()
    with pytest.raises(AssertionError):
        cache.read(1, False)
    cache.close()


def test_extraction_matches_live_pipeline(tmp_path):
    """Cached batches == live batches (boxes/rels/flips bitwise; fmaps =
    live trunk output at bf16 precision), across the flip draw."""
    ds = _dataset(tmp_path, n=6, mode="train")
    trunk_fn, _ = _trunk_fn()
    path = str(tmp_path / "train.h5")
    cache = extract_trunk_cache(path, ds, trunk_fn, batch_size=3,
                                im_scale=IM, image_format="uint8",
                                progress=False)
    assert cache.complete() and cache.n_orient == 2

    common = dict(batch_size=3, max_nodes=8, max_edges=8, num_workers=1,
                  shuffle=False, im_scale=IM, image_format="uint8", seed=7)
    live = list(BatchLoader(ds, **common))
    cached = list(BatchLoader(ds, feature_cache=cache, **common))
    assert len(live) == len(cached) == 2

    for lb, cb in zip(live, cached):
        # identical graph/geometry stream (same rng, same draw order)
        np.testing.assert_array_equal(np.asarray(lb.boxes),
                                      np.asarray(cb.boxes))
        np.testing.assert_array_equal(np.asarray(lb.classes),
                                      np.asarray(cb.classes))
        np.testing.assert_array_equal(np.asarray(lb.rels),
                                      np.asarray(cb.rels))
        np.testing.assert_array_equal(np.asarray(lb.im_hw),
                                      np.asarray(cb.im_hw))
        np.testing.assert_allclose(np.asarray(lb.im_scale_org),
                                   np.asarray(cb.im_scale_org), rtol=1e-6)
        assert cb.images is None and cb.fmaps is not None
        # fmaps match the trunk applied to the live images (bf16 storage)
        want = np.asarray(trunk_fn(np.asarray(lb.images)), np.float32)
        got = np.asarray(cb.fmaps, np.float32)
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    cache.close()


def test_eval_split_single_orientation(tmp_path):
    ds = _dataset(tmp_path, n=3, mode="val")
    trunk_fn, _ = _trunk_fn()
    path = str(tmp_path / "val.h5")
    cache = extract_trunk_cache(path, ds, trunk_fn, batch_size=2,
                                im_scale=IM, image_format="uint8",
                                progress=False)
    assert cache.n_orient == 1
    with pytest.raises(AssertionError):
        cache.read(0, flip=True)
    # eval loader never flips -> works
    batches = list(BatchLoader(ds, feature_cache=cache, batch_size=3,
                               max_nodes=8, max_edges=8, num_workers=1,
                               im_scale=IM, drop_last=False))
    assert batches[0].fmaps is not None
    cache.close()


def test_train_split_single_orientation_mode(tmp_path):
    """config.cache_orientations=1: the train cache stores HALF the bytes
    of the 2-orientation cache, the cached loader pins every flip draw to
    False (flip augmentation off, documented trade), and reading a flipped
    orientation is a loud error."""
    ds = _dataset(tmp_path, n=6, mode="train")
    trunk_fn, _ = _trunk_fn()
    cache = extract_trunk_cache(str(tmp_path / "t1.h5"), ds, trunk_fn,
                                batch_size=3, im_scale=IM,
                                image_format="uint8", progress=False,
                                n_orient=1)
    assert cache.complete() and cache.n_orient == 1
    cache2 = extract_trunk_cache(str(tmp_path / "t2.h5"), ds, trunk_fn,
                                 batch_size=3, im_scale=IM,
                                 image_format="uint8", progress=False)
    assert cache2._f["fmaps"].size == 2 * cache._f["fmaps"].size

    common = dict(batch_size=3, max_nodes=8, max_edges=8, num_workers=1,
                  shuffle=False, im_scale=IM, image_format="uint8")
    for seed in (0, 7):  # several rng streams: the draw is pinned, not lucky
        for b_i, cb in enumerate(BatchLoader(ds, feature_cache=cache,
                                             seed=seed, **common)):
            for j in range(cb.fmaps.shape[0]):
                idx = b_i * 3 + j
                np.testing.assert_array_equal(
                    np.asarray(cb.fmaps[j]).view(np.uint16),
                    cache.read(idx, False).view(np.uint16))
    with pytest.raises(AssertionError):
        cache.read(0, flip=True)

    from sgg_tpu.config import config_from_args
    assert config_from_args(["-cache_orientations", "1"]
                            ).cache_orientations == 1
    cache.close()
    cache2.close()


def test_model_step_from_cached_fmaps(tmp_path):
    """A train step consuming batch.fmaps runs and matches the same step fed
    the identical fmap through the image-free model path."""
    import dataclasses as dc

    from sgg_tpu.config import Config
    from sgg_tpu.models.relhead import RelModelIMP
    from sgg_tpu.train.state import create_train_state
    from sgg_tpu.train.step import make_train_step

    ds = _dataset(tmp_path, n=4, mode="train")
    trunk_fn, _ = _trunk_fn()
    path = str(tmp_path / "t.h5")
    cache = extract_trunk_cache(path, ds, trunk_fn, batch_size=2,
                                im_scale=IM, image_format="uint8",
                                progress=False)
    loader = BatchLoader(ds, feature_cache=cache, batch_size=4, max_nodes=8,
                         max_edges=8, num_workers=1, im_scale=IM, seed=3)
    batch = next(iter(loader))
    assert batch.fmaps.shape == (4, IM // 16, IM // 16, 512)

    config = Config(batch_size=4, max_nodes=8, max_edges=8, mode="sgcls",
                    loss="dnorm", feature_cache=str(tmp_path))
    model = RelModelIMP(num_classes=7, num_predicates=4, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.bfloat16)
    # init needs images once (to create trunk params for extraction paths)
    img0 = jnp.zeros((4, IM, IM, 3), jnp.uint8)
    variables = model.init(jax.random.key(0), img0, batch.boxes,
                           batch.classes, batch.rels[..., :2],
                           batch.rel_mask, train=False)
    # independent buffer copies: the jitted step donates its state
    variables_b = jax.tree_util.tree_map(jnp.array, variables)
    state = create_train_state(config, variables)
    step = make_train_step(model, config)
    state2, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["total"]))

    # determinism: the same cached batch gives the same loss twice
    state_b = create_train_state(config, variables_b)
    _, metrics_b = step(state_b, dc.replace(batch), jax.random.key(0))
    assert float(metrics_b["total"]) == pytest.approx(
        float(metrics["total"]), rel=1e-6)
    cache.close()


@pytest.mark.slow
def test_sharded_cached_eval_matches_single_device(tmp_path):
    """val_epoch from the feature cache over the 8-device DP mesh ==
    single-device cached run (shard_batch must handle the fmaps leaf)."""
    from sgg_tpu.config import Config
    from sgg_tpu.eval.driver import val_epoch
    from sgg_tpu.models.relhead import RelModelIMP
    from sgg_tpu.parallel import make_mesh

    ds = _dataset(tmp_path, n=8, mode="test")
    trunk_fn, _ = _trunk_fn()
    cache = extract_trunk_cache(str(tmp_path / "test.h5"), ds, trunk_fn,
                                batch_size=4, im_scale=IM,
                                image_format="uint8", progress=False)
    model = RelModelIMP(num_classes=7, num_predicates=4, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.bfloat16)
    batches = list(BatchLoader(ds, feature_cache=cache, batch_size=8,
                               max_nodes=8, max_edges=8, num_workers=1,
                               im_scale=IM, drop_last=False))
    b0 = batches[0]
    variables = model.init(jax.random.key(0), None, b0.boxes, b0.classes,
                           b0.rels[..., :2], b0.rel_mask, fmap=b0.fmaps,
                           train=False)
    cfg = Config(batch_size=8, max_nodes=8, max_edges=8, mode="sgcls",
                 feature_cache=str(tmp_path))
    kw = dict(eval_batch_size=8, verbose=False, feature_cache=cache)
    res_sharded = val_epoch(model, variables, ds, cfg, "test",
                            mesh=make_mesh(8), **kw)
    res_single = val_epoch(model, variables, ds, cfg, "test", **kw)
    res_sharded.pop("_counters", None)
    res_single.pop("_counters", None)
    assert res_sharded.keys() == res_single.keys()
    for k in res_sharded:
        np.testing.assert_allclose(res_sharded[k], res_single[k],
                                   atol=1e-6, err_msg=k)
    cache.close()


def test_resnet50_pool_level_cache(tmp_path):
    """The resnet50 backbone caches the stride-64 FPN 'pool' level (the
    only map the relation head consumes, reference rel_model_base.py:239);
    a cached forward runs without trunk params."""
    from sgg_tpu.models.relhead import RelModelIMP
    from sgg_tpu.models.resnet import ResNet50FPN

    ds = _dataset(tmp_path, n=3, mode="train")
    mod = ResNet50FPN(dtype=jnp.bfloat16)
    mvars = mod.init(jax.random.key(0), jnp.zeros((1, IM, IM, 3)),
                     train=False)
    trunk_fn = jax.jit(lambda x: mod.apply(mvars, x, train=False)["pool"])
    cache = extract_trunk_cache(str(tmp_path / "r50.h5"), ds, trunk_fn,
                                batch_size=3, im_scale=IM, stride=64,
                                image_format="uint8", progress=False)
    assert cache.stride == 64 and cache.channels == 256
    loader = BatchLoader(ds, feature_cache=cache, batch_size=3, max_nodes=8,
                         max_edges=8, num_workers=1, im_scale=IM, seed=0)
    batch = next(iter(loader))
    assert batch.fmaps.shape == (3, IM // 64, IM // 64, 256)

    model = RelModelIMP(num_classes=7, num_predicates=4, mode="sgcls",
                        backbone="resnet50", hidden_dim=16, obj_dim=32,
                        dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(1), None, batch.boxes,
                           batch.classes, batch.rels[..., :2],
                           batch.rel_mask, fmap=batch.fmaps, train=False)
    out = model.apply(variables, None, batch.boxes, batch.classes,
                      batch.rels[..., :2], batch.rel_mask,
                      fmap=batch.fmaps, train=False)
    assert np.isfinite(np.asarray(out["rel_logits"],
                                  np.float32)).all()
    cache.close()


@pytest.mark.slow
def test_sgdet_eval_and_train_from_cached_fmap():
    """sgdet consumes the cache too: its detector is frozen, and with
    ``batch.fmaps`` it restarts at the RPN. Cached outputs match the
    image-path outputs (same program family, float32)."""
    import dataclasses as dc

    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models.backbone import VGG16Trunk
    from sgg_tpu.models.detector import FasterRCNNVGG
    from sgg_tpu.models.relhead import RelModelIMP
    from sgg_tpu.models.sgdet import (make_sgdet_train_step,
                                      sgdet_eval_with_retry)
    from sgg_tpu.train.state import create_train_state

    n_cls, n_pred = 8, 5
    config = Config(batch_size=2, max_nodes=8, max_edges=16, mode="sgdet",
                    loss="dnorm", compute_dtype="float32",
                    feature_cache="/tmp/unused")
    ds = SyntheticSGGDataset(num_images=2, num_classes=n_cls,
                             num_predicates=n_pred, max_objects=5,
                             image_size=96, with_images=True, seed=0)
    gb = ds.batch([0, 1], max_nodes=8, max_edges=16)
    detector = FasterRCNNVGG(num_classes=n_cls, rpn_pre_nms_top_n=64,
                             rpn_post_nms_top_n=24, detections_per_img=8,
                             obj_dim=48, dtype=jnp.float32,
                             score_thresh=0.01)
    relmodel = RelModelIMP(num_classes=n_cls, num_predicates=n_pred,
                           mode="sgdet", hidden_dim=16, obj_dim=32,
                           dtype=jnp.float32)
    det_vars = detector.init(jax.random.key(0), gb.images, gb.im_hw,
                             train=False)
    det = detector.apply(det_vars, gb.images, gb.im_hw, train=False)
    from sgg_tpu.models.sgdet import detection_pairs
    pairs, pmask = detection_pairs(det["boxes"], det["mask"], True)
    rel_vars = relmodel.init(jax.random.key(1), None, det["boxes"],
                             det["labels"], pairs, pmask,
                             fmap=det["fmap"], train=False, mode="sgdet")

    trunk = VGG16Trunk(dtype=jnp.float32)
    fmaps = jax.jit(lambda v, x: trunk.apply(v, x))(
        {"params": det_vars["params"]["trunk"]}, gb.images)
    gbc = dc.replace(gb, images=None, fmaps=fmaps)

    out_live = sgdet_eval_with_retry(detector, relmodel,
                                     (det_vars, rel_vars), gb)
    out_cached = sgdet_eval_with_retry(detector, relmodel,
                                       (det_vars, rel_vars), gbc)
    np.testing.assert_array_equal(out_live["det_mask"],
                                  out_cached["det_mask"])
    np.testing.assert_allclose(out_live["det_boxes"],
                               out_cached["det_boxes"], atol=1e-4)
    np.testing.assert_allclose(out_live["rel_dists"],
                               out_cached["rel_dists"], atol=1e-4)

    # training step: cached loss == image loss
    variables_b = jax.tree_util.tree_map(jnp.array, rel_vars)
    step = make_sgdet_train_step(detector, relmodel, config, det_vars)
    _, m_live = step(create_train_state(config, rel_vars), gb,
                     jax.random.key(0))
    _, m_cached = step(create_train_state(config, variables_b), gbc,
                       jax.random.key(0))
    assert float(m_cached["total"]) == pytest.approx(
        float(m_live["total"]), rel=1e-4)


@pytest.mark.slow
def test_trainer_e2e_resnet50_feature_cache(tmp_path):
    """Trainer dispatches extraction to the ResNet50-FPN trunk (params +
    BN statistics fingerprinted) and trains from the cache."""
    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.train.trainer import Trainer

    def to_ds(s, mode):
        return SGGDataset(name="stanford", mode=mode, filenames=[],
                          images_dir="", gt_boxes=s.gt_boxes,
                          gt_classes=s.gt_classes,
                          relationships=s.relationships,
                          ind_to_classes=s.ind_to_classes,
                          ind_to_predicates=s.ind_to_predicates,
                          box_coordinates="native")

    mk = lambda seed, n, mode: to_ds(
        SyntheticSGGDataset(num_images=n, num_classes=9, num_predicates=5,
                            max_objects=5, image_size=300, seed=seed), mode)
    splits = {"train": mk(0, 2, "train")}
    config = Config(batch_size=2, max_nodes=8, max_edges=12, mode="sgcls",
                    backbone="resnet50", num_epochs=1, print_interval=1,
                    val_size=0, notest=True,
                    feature_cache=str(tmp_path / "fc"))
    trainer = Trainer(config, splits, with_images=False)
    losses = trainer.train_epoch(0)
    assert np.isfinite(losses["total"])
    fc = trainer._feature_caches["train"]
    assert fc.stride == 64 and fc.n_orient == 2


@pytest.mark.slow
def test_trainer_e2e_with_feature_cache(tmp_path):
    """Trainer extracts caches for train+eval splits, fits, and reuses the
    cache on a second run (no re-extraction)."""
    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models.relhead import RelModelIMP
    from sgg_tpu.train.trainer import Trainer

    def to_ds(s, mode):
        return SGGDataset(name="stanford", mode=mode, filenames=[],
                          images_dir="", gt_boxes=s.gt_boxes,
                          gt_classes=s.gt_classes,
                          relationships=s.relationships,
                          ind_to_classes=s.ind_to_classes,
                          ind_to_predicates=s.ind_to_predicates,
                          box_coordinates="native")

    mk = lambda seed, n, mode: to_ds(
        SyntheticSGGDataset(num_images=n, num_classes=9, num_predicates=5,
                            max_objects=5, image_size=300, seed=seed), mode)
    splits = {"train": mk(0, 4, "train"), "test_alls": mk(2, 2, "test")}
    cache_dir = str(tmp_path / "fc")
    config = Config(batch_size=2, max_nodes=8, max_edges=12, mode="sgcls",
                    loss="dnorm", num_epochs=1, print_interval=1,
                    val_size=0, feature_cache=cache_dir,
                    save_dir=str(tmp_path / "run"))
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.bfloat16)
    trainer = Trainer(config, splits, model=model, with_images=False)
    results = trainer.fit(test_names=("test_alls",))
    assert "sgcls/test_alls_R@100_GC" in results
    train_cache = split_cache_path(cache_dir, "train")
    test_cache = split_cache_path(cache_dir, "test_alls")
    assert os.path.exists(train_cache) and os.path.exists(test_cache)

    # second trainer reuses the same cache files (fingerprint matches the
    # frozen trunk; mtime unchanged by the new run)
    mtime = os.path.getmtime(train_cache)
    t2 = Trainer(config.replace(num_epochs=1), splits, model=model,
                 with_images=False)
    fc = t2._feature_cache_for("train", splits["train"])
    assert fc is not None and os.path.getmtime(train_cache) == mtime

    # fingerprint guard: different trunk weights -> stale -> re-extract
    fp_now = params_fingerprint(jax.tree_util.tree_map(
        np.asarray, t2.state.params["trunk"]))
    assert fc.fingerprint == fp_now


def test_config_orientations_pin_flips_over_disk_superset(tmp_path):
    """cache_orientations=1 pins flips OFF even when a 2-orientation cache
    exists on disk (the trainer accepts such a cache as a storage superset;
    augmentation must follow the CONFIG, not disk state — ADVICE r4)."""
    ds = _dataset(tmp_path, n=6, mode="train")
    trunk_fn, _ = _trunk_fn()
    cache2 = extract_trunk_cache(str(tmp_path / "sup.h5"), ds, trunk_fn,
                                 batch_size=3, im_scale=IM,
                                 image_format="uint8", progress=False)
    assert cache2.n_orient == 2
    common = dict(batch_size=3, max_nodes=8, max_edges=8, num_workers=1,
                  shuffle=False, im_scale=IM, image_format="uint8")
    for seed in (0, 7):  # several rng streams: pinned, not lucky
        for b_i, cb in enumerate(BatchLoader(ds, feature_cache=cache2,
                                             seed=seed, cache_orientations=1,
                                             **common)):
            for j in range(cb.fmaps.shape[0]):
                idx = b_i * 3 + j
                np.testing.assert_array_equal(
                    np.asarray(cb.fmaps[j]).view(np.uint16),
                    cache2.read(idx, False).view(np.uint16))
    cache2.close()
