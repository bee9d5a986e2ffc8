"""Pallas RoIAlign parity vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from sgg_tpu.ops.roi_align import roi_align
from sgg_tpu.ops.roi_align_pallas import roi_align_pallas


def test_pallas_matches_xla():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 12, 14, 8
    fmap = rng.randn(B, H, W, C).astype(np.float32)
    boxes = rng.rand(B, 9, 4).astype(np.float32) * 150
    boxes[..., 2:] += boxes[..., :2] + 10
    want = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(boxes),
                                spatial_scale=1 / 16.0))
    got = np.asarray(roi_align_pallas(jnp.asarray(fmap), jnp.asarray(boxes),
                                      spatial_scale=1 / 16.0, chunk=4,
                                      interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_grad_matches_xla():
    """The custom VJP w.r.t. fmap (GAN generator path) matches autodiff
    through the XLA separable implementation, including under jit."""
    import jax

    rng = np.random.RandomState(5)
    B, H, W, C = 2, 10, 11, 6
    fmap = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    boxes = rng.rand(B, 5, 4).astype(np.float32) * 120
    boxes[..., 2:] += boxes[..., :2] + 12
    boxes = jnp.asarray(boxes)
    cot = jnp.asarray(rng.randn(B, 5, 7, 7, C).astype(np.float32))

    def loss_pallas(fm):
        out = roi_align_pallas(fm, boxes, spatial_scale=1 / 16.0, chunk=4,
                               interpret=True)
        return jnp.sum(out * cot)

    def loss_xla(fm):
        return jnp.sum(roi_align(fm, boxes, spatial_scale=1 / 16.0) * cot)

    g_pallas = np.asarray(jax.jit(jax.grad(loss_pallas))(fmap))
    g_xla = np.asarray(jax.grad(loss_xla)(fmap))
    np.testing.assert_allclose(g_pallas, g_xla, atol=1e-3, rtol=1e-4)


def test_pallas_degenerate_boxes():
    fmap = jnp.ones((1, 8, 8, 4), jnp.float32)
    boxes = jnp.zeros((1, 5, 4), jnp.float32)
    out = np.asarray(roi_align_pallas(fmap, boxes, spatial_scale=1 / 16.0,
                                      chunk=8, interpret=True))
    assert np.isfinite(out).all()
