"""Native one-pass image prep vs the PIL path: same geometry, same pixels
(within fixed-point rounding of PIL's triangle filter)."""

import numpy as np
import pytest

from sgg_tpu import native
from sgg_tpu.data.pipeline import IMAGENET_MEAN, prepare_example


@pytest.mark.skipif(not native.have_native(), reason="toolchain missing")
@pytest.mark.parametrize("hw", [(768, 1024), (600, 400), (592, 592)])
@pytest.mark.parametrize("flip_seed", [0, 3])
def test_native_prep_matches_pil(hw, flip_seed):
    rng = np.random.RandomState(1)
    h, w = hw
    img_u8 = rng.randint(0, 256, (h, w, 3), np.uint8)
    boxes = rng.rand(6, 4).astype(np.float32) * min(h, w) * 0.8
    boxes[:, 2:] += boxes[:, :2] + 5
    rels = np.asarray([[0, 1, 1]], np.int32)

    # identical flip decision: same rng state on both paths
    c_nat, b_nat, r_nat, hw_nat = prepare_example(
        img_u8, boxes, rels, "native", True,
        np.random.RandomState(flip_seed), im_scale=256, uint8=True)
    c_pil, b_pil, r_pil, hw_pil = prepare_example(
        img_u8.astype(np.float32) / 255.0, boxes, rels, "native", True,
        np.random.RandomState(flip_seed), im_scale=256, uint8=True)

    assert hw_nat == hw_pil
    np.testing.assert_allclose(b_nat, b_pil, atol=1e-4)
    np.testing.assert_array_equal(r_nat, r_pil)
    ch, cw = hw_nat
    # padding is exactly the uint8 ImageNet mean
    mean_u8 = (IMAGENET_MEAN * 255).astype(np.uint8)
    assert (c_nat[ch:] == mean_u8).all() and (c_nat[:, cw:] == mean_u8).all()
    # resampled content matches PIL's fixed-point triangle filter closely
    diff = np.abs(c_nat[:ch, :cw].astype(int) - c_pil[:ch, :cw].astype(int))
    assert diff.max() <= 3, diff.max()
    assert diff.mean() < 0.5, diff.mean()


@pytest.mark.skipif(not native.have_native(), reason="toolchain missing")
def test_native_prep_faster_than_pil():
    import time
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 256, (768, 1024, 3), np.uint8)
    img_f = img_u8.astype(np.float32) / 255.0
    boxes = np.asarray([[10, 10, 100, 100]], np.float32)
    rels = np.zeros((0, 3), np.int32)

    def run(img, n=15):
        t0 = time.perf_counter()
        for i in range(n):
            prepare_example(img, boxes, rels, "native", False,
                            np.random.RandomState(i), im_scale=592,
                            uint8=True)
        return (time.perf_counter() - t0) / n

    run(img_u8, 2), run(img_f, 2)  # warm
    t_nat, t_pil = run(img_u8), run(img_f)
    print(f"native {t_nat*1e3:.2f} ms vs PIL {t_pil*1e3:.2f} ms")
    assert t_nat < t_pil, (t_nat, t_pil)
