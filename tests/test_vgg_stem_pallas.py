"""Parity of the Pallas VGG-stem kernel vs lax.conv (interpret mode).

The on-device Mosaic lowering is blocked by toolchain layout limits (see the
module docstring of ``sgg_tpu/ops/vgg_stem_pallas.py`` for the bisect); this
pins the formulation's numerics so it is ready when the lowering unblocks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.ops.vgg_stem_pallas import vgg_conv1_pallas


def test_vgg_conv1_interpret_parity():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 48, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 64) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    ref = jax.nn.relu(jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
    got = vgg_conv1_pallas(x, w, b, tile_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
