import numpy as np
import jax.numpy as jnp

from sgg_tpu.ops import boxes as B


def _np_iou(a, b):
    # independent numpy oracle, torchvision box_iou semantics (no +1)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    out = np.zeros((len(a), len(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            x1 = max(a[i, 0], b[j, 0]); y1 = max(a[i, 1], b[j, 1])
            x2 = min(a[i, 2], b[j, 2]); y2 = min(a[i, 3], b[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            u = area_a[i] + area_b[j] - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def test_box_iou_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    a = rng.rand(7, 4) * 100
    a[:, 2:] += a[:, :2]  # ensure x2>x1, y2>y1
    b = rng.rand(5, 4) * 100
    b[:, 2:] += b[:, :2]
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_iou(a, b), atol=1e-5)


def test_box_iou_batched():
    rng = np.random.RandomState(1)
    a = rng.rand(3, 6, 4) * 50
    a[..., 2:] += a[..., :2]
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(a)))
    for i in range(3):
        np.testing.assert_allclose(got[i], _np_iou(a[i], a[i]), atol=1e-5)
        # self-IoU diagonal is 1
        np.testing.assert_allclose(np.diag(got[i]), 1.0, atol=1e-5)


def test_union_boxes():
    boxes = jnp.asarray([[0., 0., 10., 10.],
                         [5., 5., 20., 15.],
                         [2., 8., 4., 12.]])[None]
    subj = jnp.asarray([[0, 1]])
    obj = jnp.asarray([[1, 2]])
    u = np.asarray(B.union_boxes(boxes, subj, obj))[0]
    np.testing.assert_allclose(u[0], [0., 0., 20., 15.])
    np.testing.assert_allclose(u[1], [2., 5., 20., 15.])


def test_center_to_corner_roundtrip():
    cwh = jnp.asarray([[50., 40., 20., 10.]])
    corners = np.asarray(B.center_to_corner(cwh))
    np.testing.assert_allclose(corners, [[40., 35., 60., 45.]])


def test_scale_and_clip():
    boxes = jnp.asarray([[[-5., 2., 120., 90.]]])
    im_hw = jnp.asarray([[80., 100.]])
    clipped = np.asarray(B.clip_boxes(boxes, im_hw))
    np.testing.assert_allclose(clipped, [[[0., 2., 100., 80.]]])
    scaled = np.asarray(B.scale_boxes_01(jnp.asarray(clipped), im_hw))
    assert scaled.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(scaled, [[[0., 0.025, 1.0, 1.0]]])
