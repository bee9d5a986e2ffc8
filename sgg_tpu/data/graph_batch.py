"""Fixed-shape padded scene-graph batches.

TPU-native replacement for the reference's ragged ``Blob`` container
(``/root/reference/dataloaders/blob.py``), which concatenates variable-length
per-image tensors with image-index columns. Under XLA everything must have a
static shape, so a batch is ``(B, N, ...)`` nodes and ``(B, E, ...)`` edges
with validity masks; per-image structure is explicit in the leading batch dim
instead of via ``im_inds`` columns. All model code consumes this contract.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from sgg_tpu import native


@struct.dataclass
class GraphBatch:
    """One padded batch of scene graphs.

    Attributes:
      images: (B, H, W, 3) float images, or None when operating on
        precomputed feature maps.
      im_hw: (B, 2) float (height, width) of the valid image content before
        padding — used for box scaling (reference rel_model_base.py:263-274).
      boxes: (B, N, 4) float32 ``[x1, y1, x2, y2]`` in image pixels.
      classes: (B, N) int32 object classes (0 = background/padding).
      node_mask: (B, N) bool validity.
      rels: (B, E, 3) int32 ``(subj_local, obj_local, predicate)``; predicate
        0 = background ("no relation"), ≥1 = annotated predicate.
      rel_mask: (B, E) bool validity.
      im_scale_org: optional (B,) float factor mapping model-frame (IM_SCALE)
        pixels back to ORIGINAL image pixels (= max_side_org / IM_SCALE).
        Carried for exported prediction artifacts — the reference returns
        ``rm_box_priors_org`` in original pixels
        (rel_model_base.py:237-240). None when unknown (factor 1).
      fmaps: optional (B, h, w, C) precomputed trunk feature maps (the
        frozen-trunk feature cache, data/feature_cache.py); when set,
        ``images`` is None and model steps skip the trunk.
    """

    images: Optional[jnp.ndarray]
    im_hw: jnp.ndarray
    boxes: jnp.ndarray
    classes: jnp.ndarray
    node_mask: jnp.ndarray
    rels: jnp.ndarray
    rel_mask: jnp.ndarray
    im_scale_org: Optional[jnp.ndarray] = None
    fmaps: Optional[jnp.ndarray] = None

    @property
    def batch_size(self) -> int:
        return self.boxes.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.boxes.shape[1]

    @property
    def max_edges(self) -> int:
        return self.rels.shape[1]

    def num_nodes(self) -> jnp.ndarray:
        """(B,) valid node counts."""
        return self.node_mask.sum(axis=1)

    def num_edges(self) -> jnp.ndarray:
        """(B,) valid edge counts."""
        return self.rel_mask.sum(axis=1)


def pack_ragged(per_image_boxes, per_image_classes, per_image_rels,
                max_nodes: int, max_edges: int,
                images: Optional[np.ndarray] = None,
                im_hw: Optional[np.ndarray] = None,
                im_scale_org: Optional[np.ndarray] = None) -> GraphBatch:
    """Pack a list of ragged per-image graphs into a GraphBatch (host side).

    The hot loop runs in native code (``sgg_tpu/native/collate.cpp``); this
    wrapper builds the offset arrays and wraps the result. The reference's
    analogue is ``vg_collate`` + ``Blob.reduce``
    (``dataloaders/visual_genome.py:681``, ``blob.py:128-168``).
    """
    B = len(per_image_boxes)
    node_counts = [len(b) for b in per_image_boxes]
    rel_counts = [len(r) for r in per_image_rels]
    node_offsets = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(node_counts, out=node_offsets[1:])
    rel_offsets = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(rel_counts, out=rel_offsets[1:])

    boxes = (np.concatenate(per_image_boxes, axis=0)
             if node_offsets[-1] else np.zeros((0, 4), np.float32))
    classes = (np.concatenate(per_image_classes, axis=0)
               if node_offsets[-1] else np.zeros((0,), np.int32))
    rels = (np.concatenate(per_image_rels, axis=0)
            if rel_offsets[-1] else np.zeros((0, 3), np.int32))

    pb, pc, pnm, pr, prm, _ = native.pack_graph_batch(
        boxes, classes, node_offsets, rels, rel_offsets, max_nodes, max_edges)

    if im_hw is None:
        if images is not None:
            im_hw = np.tile(np.asarray(images.shape[1:3], np.float32), (B, 1))
        else:
            im_hw = np.ones((B, 2), np.float32)

    # HOST-side numpy arrays: device placement is the consumer's job
    # (sgg_tpu.data.pipeline.device_prefetch / jit transfer). Packing must
    # not touch the device — with a tunneled TPU an eager device_put here
    # costs a 100MB round trip per batch.
    return GraphBatch(
        images=images,
        im_hw=np.asarray(im_hw, np.float32),
        boxes=pb,
        classes=pc,
        node_mask=pnm.astype(bool),
        rels=pr,
        rel_mask=prm.astype(bool),
        im_scale_org=(None if im_scale_org is None
                      else np.asarray(im_scale_org, np.float32)),
    )
