import numpy as np
import jax.numpy as jnp

from sgg_tpu import native
from sgg_tpu.constants import RECT_SIZE
from sgg_tpu.ops.rects import draw_union_rects


def _rand_pairs(rng, n):
    b = rng.rand(n, 2, 4).astype(np.float32) * 500
    b[..., 2:] = b[..., :2] + rng.rand(n, 2, 2).astype(np.float32) * 200 + 1
    return b.reshape(n, 8)


def test_xla_matches_native_oracle():
    rng = np.random.RandomState(0)
    pairs = _rand_pairs(rng, 32)
    want = native.draw_union_rects_native(pairs, RECT_SIZE)
    got = np.asarray(draw_union_rects(jnp.asarray(pairs), RECT_SIZE))
    assert got.shape == (32, 2, RECT_SIZE, RECT_SIZE)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_native_library_builds():
    # The C++ oracle must actually be the native path on this machine.
    assert native.have_native(), "libsggnative.so failed to build"


def test_full_union_is_all_ones():
    # A box equal to its union covers every pixel fully.
    pairs = np.asarray([[0, 0, 27, 27, 0, 0, 27, 27]], dtype=np.float32)
    got = np.asarray(draw_union_rects(jnp.asarray(pairs), RECT_SIZE))
    np.testing.assert_allclose(got, 1.0)


def test_half_coverage():
    # Subject covers the left half of the union exactly.
    P = RECT_SIZE
    pairs = np.asarray([[0, 0, 50, 100, 0, 0, 100, 100]], dtype=np.float32)
    got = np.asarray(draw_union_rects(jnp.asarray(pairs), P))[0]
    # subject mask: columns [0, P/2) full, column at the boundary partial
    x2_box = 50 * P / 100.0  # 13.5
    col_full = int(np.floor(x2_box))
    np.testing.assert_allclose(got[0, :, :col_full], 1.0, atol=1e-5)
    np.testing.assert_allclose(got[0, :, col_full], x2_box - col_full, atol=1e-5)
    np.testing.assert_allclose(got[0, :, col_full + 1:], 0.0, atol=1e-5)
    # object covers everything
    np.testing.assert_allclose(got[1], 1.0, atol=1e-5)


def test_batched_leading_dims():
    rng = np.random.RandomState(3)
    pairs = _rand_pairs(rng, 12).reshape(3, 4, 8)
    got = np.asarray(draw_union_rects(jnp.asarray(pairs), RECT_SIZE))
    assert got.shape == (3, 4, 2, RECT_SIZE, RECT_SIZE)
    flat = native.draw_union_rects_native(pairs.reshape(12, 8), RECT_SIZE)
    np.testing.assert_allclose(got.reshape(12, 2, RECT_SIZE, RECT_SIZE), flat,
                               atol=1e-4)


def test_degenerate_padded_pairs_do_not_nan():
    pairs = np.zeros((4, 8), dtype=np.float32)
    got = np.asarray(draw_union_rects(jnp.asarray(pairs), RECT_SIZE))
    assert np.isfinite(got).all()
