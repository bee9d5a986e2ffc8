"""Anti-aliased box-pair rasterization ("rects") for union-box edge features.

TPU-native equivalent of the reference's only native component — the Cython
kernel ``draw_union_boxes_c``
(``/root/reference/lib/draw_rectangles/draw_rectangles.pyx:27-67``), which the
reference calls on CPU with a device→host→device round trip every training
step (``/root/reference/lib/get_union_boxes.py:66-67``).

The rasterization has a closed form: with the subject/object boxes mapped into
the union box's ``[0, P]`` coordinate frame, the coverage of pixel ``(j, k)``
by a box ``(x1, y1, x2, y2)`` is a separable product of clipped 1-D overlaps::

    cov[j, k] = clip(j+1-y1, 0, 1)*clip(y2-j, 0, 1)
              * clip(k+1-x1, 0, 1)*clip(x2-k, 0, 1)

so the whole ``(E, 2, P, P)`` tensor is a broadcasted-iota expression that XLA
fuses into the consumer conv — no scalar loops, no host transfer. A C++
reference implementation lives in ``sgg_tpu/native/rects.cpp`` for parity
testing against the reference's native semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def draw_union_rects(pair_boxes: jnp.ndarray, pooling_size: int) -> jnp.ndarray:
    """Rasterize subject/object box pairs into coverage masks.

    Args:
      pair_boxes: (..., E, 8) — concatenated subject ``[x1 y1 x2 y2]`` and
        object ``[x1 y1 x2 y2]`` boxes, arbitrary (pixel) coordinates.
      pooling_size: output side length P (the reference uses
        ``pool_sz * 4 - 1 = 27``).

    Returns:
      (..., E, 2, P, P) float32 coverage in [0, 1]. Matches
      ``draw_union_boxes_c`` exactly (up to float associativity). The caller
      subtracts 0.5 as in ``get_union_boxes.py:67``.
    """
    P = pooling_size
    boxes = pair_boxes.reshape(*pair_boxes.shape[:-1], 2, 4)  # (..., E, 2, 4)

    # Union box over the pair (min corner of mins, max of maxes).
    x1u = jnp.min(boxes[..., 0], axis=-1, keepdims=True)  # (..., E, 1)
    y1u = jnp.min(boxes[..., 1], axis=-1, keepdims=True)
    x2u = jnp.max(boxes[..., 2], axis=-1, keepdims=True)
    y2u = jnp.max(boxes[..., 3], axis=-1, keepdims=True)
    w = x2u - x1u
    h = y2u - y1u
    # Guard degenerate unions (zero-area padded boxes) against div-by-zero.
    w = jnp.where(w > 0, w, 1.0)
    h = jnp.where(h > 0, h, 1.0)

    # Map each box into the union frame scaled to [0, P].
    sx = P / w
    sy = P / h
    x1 = (boxes[..., 0] - x1u) * sx  # (..., E, 2)
    y1 = (boxes[..., 1] - y1u) * sy
    x2 = (boxes[..., 2] - x1u) * sx
    y2 = (boxes[..., 3] - y1u) * sy

    j = lax.broadcasted_iota(jnp.float32, (P, 1), 0)  # rows (y)
    k = lax.broadcasted_iota(jnp.float32, (1, P), 1)  # cols (x)

    def cov1d(grid, lo, hi):
        # grid: (P,1) or (1,P); lo/hi: (..., E, 2) -> (..., E, 2, P, P)-able
        lo = lo[..., None, None]
        hi = hi[..., None, None]
        return jnp.clip(grid + 1 - lo, 0.0, 1.0) * jnp.clip(hi - grid, 0.0, 1.0)

    y_contrib = cov1d(j, y1, y2)  # (..., E, 2, P, 1)
    x_contrib = cov1d(k, x1, x2)  # (..., E, 2, 1, P)
    return (y_contrib * x_contrib).astype(jnp.float32)
