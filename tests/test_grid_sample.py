import numpy as np
import jax.numpy as jnp
import pytest

from sgg_tpu.ops.grid_sample import boxes01_to_grid, grid_sample_2d


def test_identity_grid_reproduces_image():
    rng = np.random.RandomState(0)
    H, W, C = 9, 11, 3
    img = rng.randn(H, W, C).astype(np.float32)
    # identity grid at pixel centers (align_corners=False)
    ys = (np.arange(H) + 0.5) / H * 2 - 1
    xs = (np.arange(W) + 0.5) / W * 2 - 1
    gx, gy = np.meshgrid(xs, ys)
    grid = np.stack([gx, gy], -1).astype(np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_out_of_range_is_zero():
    img = np.ones((4, 4, 1), np.float32)
    grid = np.full((2, 2, 2), 5.0, np.float32)  # far outside
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, 0.0)


def test_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 7, 8, 4
    img = rng.randn(B, H, W, C).astype(np.float32)
    grid = (rng.rand(B, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)
    got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    want = torch.nn.functional.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batched_leading_dims():
    rng = np.random.RandomState(2)
    img = rng.randn(2, 3, 6, 6, 2).astype(np.float32)  # (B, N, H, W, C)
    grid = rng.rand(2, 3, 4, 4, 2).astype(np.float32) * 2 - 1
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    assert out.shape == (2, 3, 4, 4, 2)
    # equals per-element sampling
    for b in range(2):
        for n in range(3):
            single = np.asarray(grid_sample_2d(jnp.asarray(img[b, n]),
                                               jnp.asarray(grid[b, n])))
            np.testing.assert_allclose(out[b, n], single, atol=1e-6)


def test_boxes01_to_grid_paints_into_box():
    # a constant 1-valued 4x4 feature warped into box [0.25,0.25,0.75,0.75]
    # on an 8x8 canvas covers the central region
    feat = np.ones((1, 4, 4, 1), np.float32)
    boxes = jnp.asarray([[0.25, 0.25, 0.75, 0.75]])
    grid = boxes01_to_grid(boxes, 8, 8)
    out = np.asarray(grid_sample_2d(jnp.asarray(feat), grid))[0, ..., 0]
    # corners of the canvas are outside the box -> 0
    assert out[0, 0] == 0 and out[-1, -1] == 0
    # center is inside -> 1
    assert out[4, 4] > 0.99
    torch = pytest.importorskip("torch")
    # cross-check the whole canvas against torch with the same grid
    want = torch.nn.functional.grid_sample(
        torch.ones(1, 1, 4, 4), torch.tensor(np.asarray(grid)),
        align_corners=False).numpy()[0, 0]
    np.testing.assert_allclose(out, want, atol=1e-5)
