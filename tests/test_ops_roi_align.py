import numpy as np
import jax.numpy as jnp

from sgg_tpu.ops.roi_align import roi_align


def _bilinear(fmap, y, x):
    """torchvision bilinear_interpolate semantics (aligned=False)."""
    H, W = fmap.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(fmap.shape[-1])
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= H - 1:
        y_high = y_low = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_high = x_low = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (hy * hx * fmap[y_low, x_low] + hy * lx * fmap[y_low, x_high]
            + ly * hx * fmap[y_high, x_low] + ly * lx * fmap[y_high, x_high])


def _np_roi_align(fmap, rois, spatial_scale, pooled, ratio):
    """Direct numpy port of the torchvision roi_align algorithm (oracle)."""
    R = rois.shape[0]
    C = fmap.shape[-1]
    out = np.zeros((R, pooled, pooled, C))
    for r in range(R):
        x1, y1, x2, y2 = rois[r] * spatial_scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w = roi_w / pooled
        bin_h = roi_h / pooled
        for ph in range(pooled):
            for pw in range(pooled):
                acc = np.zeros(C)
                for iy in range(ratio):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / ratio
                    for ix in range(ratio):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / ratio
                        acc += _bilinear(fmap, yy, xx)
                out[r, ph, pw] = acc / (ratio * ratio)
    return out


def test_matches_torchvision_oracle():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 19, 23, 5
    fmap = rng.randn(B, H, W, C).astype(np.float32)
    rois = rng.rand(B, 6, 4).astype(np.float32) * 250
    rois[..., 2:] = rois[..., :2] + rng.rand(B, 6, 2).astype(np.float32) * 120 + 4

    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois),
                               spatial_scale=1 / 16.0, pooled=7, ratio=2,
                               roi_chunk=4))
    for b in range(B):
        want = _np_roi_align(fmap[b], rois[b], 1 / 16.0, 7, 2)
        np.testing.assert_allclose(got[b], want, atol=1e-4)


def test_outer_method_matches_separable():
    rng = np.random.RandomState(4)
    B, H, W, C = 2, 19, 23, 5
    fmap = rng.randn(B, H, W, C).astype(np.float32)
    rois = rng.rand(B, 9, 4).astype(np.float32) * 250
    rois[..., 2:] = rois[..., :2] + rng.rand(B, 9, 2).astype(np.float32) * 120 + 4
    a = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois),
                             spatial_scale=1 / 16.0, roi_chunk=4,
                             method="outer"))
    b = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois),
                             spatial_scale=1 / 16.0, roi_chunk=4,
                             method="separable"))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_out_of_bounds_and_tiny_rois():
    rng = np.random.RandomState(1)
    fmap = rng.randn(1, 10, 10, 3).astype(np.float32)
    rois = np.asarray([[
        [-40.0, -40.0, -20.0, -20.0],   # fully outside -> zeros
        [0.0, 0.0, 1.0, 1.0],           # tiny -> extent floored at 1
        [0.0, 0.0, 160.0, 160.0],       # full image
        [0.0, 0.0, 0.0, 0.0],           # degenerate (padding)
    ]], dtype=np.float32)
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois),
                               spatial_scale=1 / 16.0))
    want = _np_roi_align(fmap[0], rois[0], 1 / 16.0, 7, 2)
    np.testing.assert_allclose(got[0], want, atol=1e-4)
    assert np.isfinite(got).all()


def test_chunking_is_transparent():
    rng = np.random.RandomState(2)
    fmap = rng.randn(1, 12, 12, 4).astype(np.float32)
    rois = rng.rand(1, 10, 4).astype(np.float32) * 100
    rois[..., 2:] += rois[..., :2] + 8
    a = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois),
                             spatial_scale=1 / 16.0, roi_chunk=3))
    b = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois),
                             spatial_scale=1 / 16.0, roi_chunk=64))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_bf16_path_runs():
    rng = np.random.RandomState(3)
    fmap = jnp.asarray(rng.randn(1, 8, 8, 4), dtype=jnp.bfloat16)
    rois = jnp.asarray(rng.rand(1, 5, 4) * 60 + np.array([0, 0, 30, 30]))
    out = roi_align(fmap, rois, spatial_scale=1 / 16.0)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (1, 5, 7, 7, 4)
