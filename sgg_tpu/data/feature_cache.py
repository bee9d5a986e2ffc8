"""Frozen-trunk feature cache: extract once, train the heads many times.

TPU-native acceleration with no reference analogue. In predcls/sgcls the
detector trunk is FROZEN (reference ``main.py:62-63``; our
``models/relhead.py`` stop-gradients its output), yet the reference re-runs
the full VGG16 forward on every one of ~57k images x 20 epochs
(``/root/reference/main.py:209`` -> ``rel_model_stanford.py:125-131``). On
the profiled v5e step the trunk is ~46% of the whole train step
(tools/profile_step.py: 47 ms of 102 ms at B=24), all of it recomputing a
function of frozen weights and deterministic inputs.

This module materializes the trunk output once per image — for BOTH
horizontal-flip orientations when the split is a training split, because
``trunk(flip(image)) != flip(trunk(image))`` for a conv net with
non-symmetric kernels — and the input pipeline then streams feature maps
instead of images. With bfloat16 compute (the default) the cached step
sees the trunk output at full storage precision — features are stored as
raw bfloat16 bits — so losses/gradients match the image step up to XLA
fusion-level rounding; under float32 compute the cache additionally
quantizes the trunk output to bfloat16 (~1e-3 relative). The closest
reference machinery is the
GAN feature bank (``extract_features.py``), which caches RoI-pooled
features for a different purpose.

Storage: one HDF5 file per split; ``(num_images, n_orient, h, w, C)``
bfloat16 stored as uint16 bit patterns (h5py has no bfloat16 dtype).
VG-scale cost: 37x37x512 bf16 = 1.4 MB/orientation, ~160 GB for the 57k
train images x 2 orientations — comparable to the reference's 30 GB GAN
bank and its 60 GB dataset footprint; eval splits store one orientation.
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import numpy as np

try:
    import ml_dtypes
    _BF16 = ml_dtypes.bfloat16
except ImportError as _e:  # pragma: no cover - ml_dtypes ships with jax
    raise ImportError(
        "sgg_tpu.data.feature_cache stores feature maps as raw bfloat16 "
        "bits and requires ml_dtypes (bundled with jax)") from _e

from sgg_tpu.constants import IM_SCALE

_VERSION = 1


def params_fingerprint(params) -> str:
    """Stable hash of a param pytree — guards against training from a cache
    extracted with different trunk weights (a silently-wrong cache would be
    worse than no cache)."""
    import hashlib

    import jax
    h = hashlib.sha1()
    leaves = jax.tree_util.tree_leaves(params)
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(arr.astype(np.float32).tobytes())
    return h.hexdigest()


class FeatureCache:
    """HDF5-backed per-split trunk feature cache.

    Thread-safe reads (one process-wide lock around the h5 handle; the
    BatchLoader's worker threads call :meth:`read` concurrently).
    """

    def __init__(self, path: str, mode: str = "r"):
        import h5py
        self.path = path
        self._f = h5py.File(path, mode)
        self._lock = threading.Lock()
        attrs = self._f.attrs
        assert attrs.get("version") == _VERSION, (
            f"feature cache {path} has version {attrs.get('version')}; "
            f"expected {_VERSION} — re-extract")
        self.im_scale = int(attrs["im_scale"])
        self.stride = int(attrs["stride"])
        self.n_orient = int(attrs["n_orient"])
        self.fingerprint = str(attrs.get("fingerprint", ""))

    # -- creation ------------------------------------------------------
    @classmethod
    def create(cls, path: str, num_images: int, fmap_hw, channels: int,
               *, im_scale: int = IM_SCALE, stride: int = 16,
               n_orient: int = 2, fingerprint: str = "") -> "FeatureCache":
        import h5py
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        h, w = fmap_hw
        with h5py.File(path, "w") as f:
            f.attrs["version"] = _VERSION
            f.attrs["im_scale"] = im_scale
            f.attrs["stride"] = stride
            f.attrs["n_orient"] = n_orient
            f.attrs["fingerprint"] = fingerprint
            f.create_dataset("fmaps",
                             shape=(num_images, n_orient, h, w, channels),
                             dtype=np.uint16,
                             chunks=(1, 1, h, w, channels))
            f.create_dataset("orig_hw", shape=(num_images, 2),
                             dtype=np.int32)
            f.create_dataset("done", shape=(num_images,), dtype=np.uint8)
        return cls(path, "r+")

    # -- properties ----------------------------------------------------
    @property
    def num_images(self) -> int:
        return self._f["fmaps"].shape[0]

    @property
    def fmap_hw(self):
        s = self._f["fmaps"].shape
        return (s[2], s[3])

    @property
    def channels(self) -> int:
        return self._f["fmaps"].shape[4]

    def complete(self) -> bool:
        with self._lock:
            return bool(np.all(np.asarray(self._f["done"][:]) == 1))

    # -- IO ------------------------------------------------------------
    def write(self, idx: int, fmaps: np.ndarray, orig_hw) -> None:
        """Store all orientations for one image.

        ``fmaps``: (n_orient, h, w, C) array of any float dtype; cast to
        bfloat16 and stored as raw bits. ``orig_hw``: original (pre-resize)
        image (height, width).
        """
        bits = np.asarray(fmaps, dtype=_BF16).view(np.uint16)
        assert bits.shape == self._f["fmaps"].shape[1:], (
            bits.shape, self._f["fmaps"].shape)
        with self._lock:
            self._f["fmaps"][idx] = bits
            self._f["orig_hw"][idx] = np.asarray(orig_hw, np.int32)
            self._f["done"][idx] = 1

    def read(self, idx: int, flip: bool = False) -> np.ndarray:
        """(h, w, C) bfloat16 feature map for one image/orientation."""
        o = int(flip)
        assert o < self.n_orient, (
            f"cache {self.path} stores {self.n_orient} orientation(s); "
            f"flip={flip} unavailable (extract with n_orient=2)")
        with self._lock:
            assert self._f["done"][idx], (
                f"feature cache {self.path} has no entry for image {idx}")
            bits = np.asarray(self._f["fmaps"][idx, o])
        return bits.view(_BF16)

    def orig_hw(self, idx: int):
        with self._lock:
            assert self._f["done"][idx], (
                f"feature cache {self.path} has no entry for image {idx}")
            hw = np.asarray(self._f["orig_hw"][idx])
        return int(hw[0]), int(hw[1])

    def flush(self) -> None:
        with self._lock:
            self._f.flush()

    def close(self) -> None:
        with self._lock:
            self._f.close()


def extract_trunk_cache(path: str, dataset, trunk_fn, *,
                        batch_size: int = 8, im_scale: int = IM_SCALE,
                        stride: int = 16, image_format: str = "uint8",
                        fingerprint: str = "", with_images: bool = True,
                        progress: bool = True,
                        n_orient: Optional[int] = None) -> FeatureCache:
    """Run the frozen trunk over every image (both flips for train splits)
    and persist the feature maps.

    ``n_orient``: orientations to store (None = 2 for train splits, 1
    otherwise). 1 on a train split halves disk/extraction cost; the cached
    loader then disables flip augmentation (``config.cache_orientations``).

    Args:
      path: output h5 file.
      dataset: an ``SGGDataset``-contract object (``filenames``/
        ``images_dir``/``gt_boxes``/``is_train``...). Images come from the
        same source logic as ``BatchLoader._make_example`` so cached
        features match the live pipeline exactly.
      trunk_fn: jitted ``(B, S, S, 3) images -> (B, h, w, C)`` feature
        maps; receives canvases in ``image_format`` (uint8 canvases are
        normalized on device by the trunk, the default runtime path).
      image_format: must match the training run's ``config.image_format``
        for bit-exact parity (uint8 canvases are quantized).
      with_images: must match the run's loader setting — a loader with
        ``with_images=False`` synthesizes blank canvases even when the
        dataset has filenames, and the cache must see the same pixels.
    """
    from sgg_tpu.data.pipeline import load_source_image, prepare_example

    n = len(dataset)
    if n_orient is None:
        n_orient = 2 if getattr(dataset, "is_train", False) else 1
    assert n_orient in (1, 2), n_orient
    rng = np.random.RandomState(0)  # never consulted (flip is forced)

    def canvases(idx: int):
        img = load_source_image(dataset, idx, image_format,
                                with_images=with_images)
        outs = []
        for flip in range(n_orient):
            canvas, _, _, _ = prepare_example(
                img, dataset.gt_boxes[idx],
                np.zeros((0, 3), np.int32),
                dataset.box_coordinates, False, rng, im_scale=im_scale,
                filter_duplicates=False, uint8=image_format == "uint8",
                force_flip=bool(flip))
            outs.append(canvas)
        return np.stack(outs), img.shape[:2]

    cache: Optional[FeatureCache] = None
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        per_img = [canvases(i) for i in idxs]
        stack = np.concatenate([c for c, _ in per_img], axis=0)
        pad = batch_size * n_orient - stack.shape[0]
        if pad:
            stack = np.concatenate(
                [stack, np.repeat(stack[-1:], pad, axis=0)], axis=0)
        fmaps = np.asarray(trunk_fn(stack))[:len(idxs) * n_orient]
        if cache is None:
            h, w, c = fmaps.shape[1:]
            cache = FeatureCache.create(
                path, n, (h, w), c, im_scale=im_scale, stride=stride,
                n_orient=n_orient, fingerprint=fingerprint)
        for j, i in enumerate(idxs):
            cache.write(i, fmaps[j * n_orient:(j + 1) * n_orient],
                        per_img[j][1])
        if progress and (start // batch_size) % 50 == 0:
            print(f"[feature_cache] {min(start + batch_size, n)}/{n} "
                  f"images -> {path}", flush=True)
    assert cache is not None, "empty dataset"
    cache.flush()
    return cache


def split_cache_path(cache_dir: str, split_name: str) -> str:
    """Per-split cache file inside the configured cache directory."""
    return os.path.join(cache_dir, f"trunk_{split_name}.h5")


def cached_batch(trunk_params, batch, dtype=None):
    """Device-side shortcut used by benches/tests: run the VGG trunk on a
    batch's images and return the same batch carrying ``fmaps`` instead
    (what the cache-backed loader would deliver, minus the disk trip)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sgg_tpu.models.backbone import VGG16Trunk
    trunk = VGG16Trunk(dtype=dtype if dtype is not None else jnp.bfloat16)
    fmaps = jax.jit(lambda v, x: trunk.apply(v, x))(
        {"params": trunk_params}, batch.images)
    return dataclasses.replace(batch, images=None, fmaps=fmaps)
