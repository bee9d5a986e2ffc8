import numpy as np

from sgg_tpu.data.transforms import (RandomOrder, adjust_brightness,
                                     adjust_contrast, adjust_hue,
                                     adjust_saturation, color_jitter,
                                     hflip_with_boxes, random_crop,
                                     square_pad)
from sgg_tpu.utils.misc import param_count, print_params, set_seed


def test_square_pad():
    img = np.ones((10, 20, 3), np.float32) * 0.5
    out = square_pad(img)
    assert out.shape == (20, 20, 3)
    np.testing.assert_allclose(out[:10, :20], 0.5)
    # fill is the ImageNet mean, not zeros
    assert out[15, 0, 0] != 0.0


def test_random_crop_keeps_boxes_inside():
    import random as _r
    rng = _r.Random(0)
    img = np.zeros((100, 120, 3), np.float32)
    boxes = np.asarray([[30, 30, 60, 60], [50, 40, 90, 80]], np.float32)
    for _ in range(5):
        out, b = random_crop(img, boxes, rng=rng)
        assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
        assert (b[:, 2] <= out.shape[1]).all()
        assert (b[:, 3] <= out.shape[0]).all()


def test_color_ops_bounds():
    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 3).astype(np.float32)
    for f in (lambda i: adjust_brightness(i, 1.5),
              lambda i: adjust_contrast(i, 0.5),
              lambda i: adjust_saturation(i, 2.0),
              lambda i: adjust_hue(i, 0.2)):
        out = f(img)
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 1.0 + 1e-6


def test_random_order_and_jitter():
    img = np.full((4, 4, 3), 0.5, np.float32)
    ro = RandomOrder([lambda i: i * 0.5, lambda i: i + 0.1])
    out = ro(img)
    assert out.shape == img.shape
    cj = color_jitter()
    assert cj(img).shape == img.shape


def test_hflip_with_boxes():
    img = np.zeros((4, 10, 3), np.float32)
    img[:, 0] = 1.0
    boxes = np.asarray([[0, 0, 2, 4]], np.float32)
    out, b = hflip_with_boxes(img, boxes)
    assert out[0, -1, 0] == 1.0
    np.testing.assert_allclose(b, [[8, 0, 10, 4]])


def test_misc_params():
    set_seed(0)
    params = {"a": {"w": np.zeros((3, 4)), "b": np.zeros(4)}}
    assert param_count(params) == 16
    table = print_params(params)
    assert "a/w" in table and "16" in table


def test_dataset_describe():
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.data.datasets import SGGDataset
    syn = SyntheticSGGDataset(num_images=5, seed=0)
    ds = SGGDataset(name="stanford", mode="train", filenames=[],
                    images_dir="", gt_boxes=syn.gt_boxes,
                    gt_classes=syn.gt_classes,
                    relationships=syn.relationships,
                    ind_to_classes=syn.ind_to_classes,
                    ind_to_predicates=syn.ind_to_predicates)
    stats = ds.describe(verbose=False)
    assert stats["images"] == 5
    assert stats["objects_total"] == sum(len(c) for c in syn.gt_classes)
    assert 0 <= stats["density_mean"] <= 100
