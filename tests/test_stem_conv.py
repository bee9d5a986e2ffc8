"""Parity: space-to-depth stem conv vs the direct XLA 3x3 conv.

The rewrite must be tap-for-tap equivalent to
``lax.conv_general_dilated(x, k, (1, 1), 'SAME')`` (the stem of the frozen
VGG16 trunk, reference rel_model_base.py:310-321) for every block size and
for shapes that do and don't align to the block grid.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from sgg_tpu.ops.stem_conv import stem_conv_s2d  # noqa: E402


def _direct(x, k, b):
    out = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


@pytest.mark.parametrize("block", [2, 4])
@pytest.mark.parametrize("hw", [(16, 16), (18, 14), (7, 9)])
def test_stem_conv_parity(block, hw):
    rng = np.random.RandomState(block * 100 + hw[0])
    H, W = hw
    x = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    want = _direct(x, k, b)
    got = stem_conv_s2d(x, k, b, block=block)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_stem_conv_grad_matches():
    """The rewrite sits inside the frozen trunk but must stay differentiable
    (sgdet detector pretraining trains the trunk)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))

    g1 = jax.grad(lambda kk: jnp.sum(_direct(x, kk, b) ** 2))(k)
    g2 = jax.grad(lambda kk: jnp.sum(stem_conv_s2d(x, kk, b) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-3,
                               rtol=1e-4)
