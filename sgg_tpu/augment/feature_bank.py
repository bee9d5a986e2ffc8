"""Per-class visual feature bank for GAN conditioning (``-vis_cond``).

Rebuild of the reference's feature-bank machinery: the offline extraction
pass that appends per-class RoIAligned node features to ``features.hdf5``
(``/root/reference/extract_features.py:50-76``) and the per-step random
per-class sampling that conditions the generator
(``/root/reference/augment/gan.py:192-199``).

TPU-native difference: the reference performs random h5 reads inside the
training step (a host stall per object); here the bank keeps bounded
per-class reservoirs in RAM (loaded once) and sampling is a vectorized numpy
gather producing one fixed-shape ``(B, N, p, p, C)`` tensor per step.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


class FeatureBankWriter:
    """Appends per-class features to an hdf5 bank (extract_features.py:50-76)."""

    def __init__(self, path: str, feature_shape: Sequence[int]):
        import h5py
        self.f = h5py.File(path, "a")
        self.feature_shape = tuple(feature_shape)

    def append(self, class_name: str, features: np.ndarray):
        """features: (n, *feature_shape)."""
        features = np.asarray(features, np.float32).reshape(
            -1, int(np.prod(self.feature_shape)))
        if class_name not in self.f:
            self.f.create_dataset(
                class_name, data=features, maxshape=(None, features.shape[1]),
                chunks=True)
        else:
            d = self.f[class_name]
            d.resize(d.shape[0] + features.shape[0], axis=0)
            d[-features.shape[0]:] = features

    def close(self):
        self.f.close()


class FeatureBank:
    """Samples per-class conditioning features for padded batches."""

    def __init__(self, path: str, class_names: Sequence[str],
                 pool_sz: int = 7, n_ch: int = 512,
                 max_per_class: int = 64, seed: int = 0):
        import h5py
        self.pool_sz = pool_sz
        self.n_ch = n_ch
        self.rng = np.random.RandomState(seed)
        self.reservoir: Dict[int, np.ndarray] = {}
        dim = pool_sz * pool_sz * n_ch
        with h5py.File(path, "r") as f:
            for cls_idx, name in enumerate(class_names):
                if name not in f:
                    continue
                d = f[name]
                take = min(len(d), max_per_class)
                idx = np.sort(self.rng.choice(len(d), take, replace=False))
                self.reservoir[cls_idx] = np.asarray(d[idx],
                                                     np.float32).reshape(
                    take, dim)
        self._fallback = np.zeros((1, dim), np.float32)

    def sample(self, classes: np.ndarray,
               node_mask: Optional[np.ndarray] = None) -> np.ndarray:
        """classes (B, N) -> (B, N, p, p, n_ch) random real features of the
        same classes; zeros for classes absent from the bank / padding.

        One gather per class present in the batch (not per node — this
        runs on the host every GAN step)."""
        B, N = classes.shape
        classes = np.asarray(classes)
        dim = self.pool_sz * self.pool_sz * self.n_ch
        out = np.zeros((B, N, dim), np.float32)
        valid = (np.asarray(node_mask, bool) if node_mask is not None
                 else np.ones((B, N), bool))
        for c in np.unique(classes[valid]):
            rows = self.reservoir.get(int(c))
            if rows is None:
                continue
            sel = valid & (classes == c)
            n = int(sel.sum())
            out[sel] = rows[self.rng.randint(len(rows), size=n)]
        return out.reshape(B, N, self.pool_sz, self.pool_sz, self.n_ch)
