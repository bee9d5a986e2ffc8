"""Synthetic in-memory scene-graph dataset.

The reference has no test suite and its loaders require a 60 GB download
(SURVEY.md §4); this module provides a deterministic synthetic dataset
honoring the same per-image contract as the VG loader —
``(boxes, gt_classes, relationships)`` per image
(``/root/reference/dataloaders/visual_genome.py:526-531``) — so every layer
above the data contract (samplers, models, losses, eval) is testable and
benchmarkable without the real datasets.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from sgg_tpu.constants import IM_SCALE
from sgg_tpu.data.graph_batch import GraphBatch, pack_ragged


@dataclasses.dataclass
class SyntheticSGGDataset:
    """Deterministic random scene graphs with plausible statistics.

    num_classes / num_predicates default to the VG-Stanford vocabulary sizes
    (151 object classes incl. background, 51 predicates incl. "no relation",
    reference dataloaders/visual_genome.py).
    """

    num_images: int = 64
    num_classes: int = 151
    num_predicates: int = 51
    min_objects: int = 2
    max_objects: int = 20
    max_rels: int = 30
    image_size: int = IM_SCALE
    with_images: bool = False
    seed: int = 0

    def __post_init__(self):
        rng = np.random.RandomState(self.seed)
        self.gt_boxes: List[np.ndarray] = []
        self.gt_classes: List[np.ndarray] = []
        self.relationships: List[np.ndarray] = []
        for _ in range(self.num_images):
            n = rng.randint(self.min_objects, self.max_objects + 1)
            xy = rng.rand(n, 2) * (self.image_size * 0.8)
            wh = rng.rand(n, 2) * (self.image_size * 0.4) + 8
            boxes = np.concatenate([xy, np.minimum(xy + wh, self.image_size)],
                                   axis=1).astype(np.float32)
            classes = rng.randint(1, self.num_classes, size=n).astype(np.int32)
            # sample distinct ordered pairs for relations
            n_rel = min(rng.randint(1, self.max_rels + 1), n * (n - 1))
            pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
            sel = rng.choice(len(pairs), size=n_rel, replace=False)
            rels = np.asarray(
                [(pairs[s][0], pairs[s][1],
                  rng.randint(1, self.num_predicates)) for s in sel],
                dtype=np.int32).reshape(n_rel, 3)
            self.gt_boxes.append(boxes)
            self.gt_classes.append(classes)
            self.relationships.append(rels)

        self.ind_to_classes = ["__background__"] + [
            f"class_{i}" for i in range(1, self.num_classes)]
        self.ind_to_predicates = ["__no_relation__"] + [
            f"pred_{i}" for i in range(1, self.num_predicates)]

    def __len__(self) -> int:
        return self.num_images

    def image(self, idx: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        return rng.rand(self.image_size, self.image_size, 3).astype(np.float32)

    def batch(self, indices, max_nodes: int, max_edges: int,
              with_images: Optional[bool] = None) -> GraphBatch:
        """Pack the given image indices into a padded GraphBatch."""
        if with_images is None:
            with_images = self.with_images
        images = (np.stack([self.image(i) for i in indices])
                  if with_images else None)
        hw = float(self.image_size)
        return pack_ragged(
            [self.gt_boxes[i] for i in indices],
            [self.gt_classes[i] for i in indices],
            [self.relationships[i] for i in indices],
            max_nodes=max_nodes, max_edges=max_edges, images=images,
            im_hw=np.full((len(indices), 2), hw, np.float32))

    def batches(self, batch_size: int, max_nodes: int, max_edges: int,
                shuffle_seed: Optional[int] = None):
        """Yield padded batches over the dataset (drop_last, like the
        reference train loader, visual_genome.py:725)."""
        order = np.arange(self.num_images)
        if shuffle_seed is not None:
            np.random.RandomState(shuffle_seed).shuffle(order)
        for s in range(0, self.num_images - batch_size + 1, batch_size):
            yield self.batch(order[s:s + batch_size], max_nodes, max_edges)
